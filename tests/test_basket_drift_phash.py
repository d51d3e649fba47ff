"""Planted-case tests for market-basket rules, PSI drift, and image
aHash dedup (oracle parity for the gates lives in test_oracle_parity).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.analytics.drift import psi_by_group
from data_frame_demo_etl_spark.analytics.market_basket import association_rules
from data_frame_demo_etl_spark.multimodal.binary_ops import encode_bmp
from data_frame_demo_etl_spark.multimodal.phash import (
    ahash_near_dup_pairs,
    image_ahash,
)


def _baskets(spark, rows):
    return spark.createDataFrame(rows, "basket_id long, item string")


def test_association_perfect_pair_tops_lift(spark):
    # a and b always co-occur (5 baskets); c floats independently in
    # 10 — the a→b rule's lift must be N/supp_b = 10/5 = 2.0 and rank
    # above anything involving c.
    rows = []
    for i in range(5):
        rows += [(i, "a"), (i, "b"), (i, "c")]
    for i in range(5, 10):
        rows += [(i, "c"), (i, "d" if i % 2 else "e")]
    out = association_rules(_baskets(spark, rows), min_support_pct=10, top=10).collect()
    top = out[0]
    assert {top.antecedent, top.consequent} == {"a", "b"}
    assert top.lift_micro == 2_000_000
    assert top.confidence_micro == 1_000_000


def test_association_directionality(spark):
    # b appears in 4 baskets, a in 2, always together where a appears:
    # conf(a→b)=1.0 but conf(b→a)=0.5; lift is symmetric.
    rows = [(0, "a"), (0, "b"), (1, "a"), (1, "b"), (2, "b"), (3, "b"), (4, "z")]
    out = {
        (r.antecedent, r.consequent): r
        for r in association_rules(_baskets(spark, rows), min_support_pct=10).collect()
    }
    assert out[("a", "b")].confidence_micro == 1_000_000
    assert out[("b", "a")].confidence_micro == 500_000
    assert out[("a", "b")].lift_micro == out[("b", "a")].lift_micro


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, value double")


def test_psi_identical_slices_is_zero(spark):
    rows = [("a", float(i % 7)) for i in range(70)]
    ref, cur = _vals(spark, rows), _vals(spark, rows)
    out = psi_by_group(ref, cur, "g", "value").collect()[0]
    assert out.psi_micro == 0


def test_psi_detects_shift(spark):
    ref = _vals(spark, [("a", float(i % 5)) for i in range(100)])  # 0-4
    cur = _vals(spark, [("a", 5.0 + float(i % 5)) for i in range(100)])  # 5-9
    out = psi_by_group(ref, cur, "g", "value").collect()[0]
    # Disjoint supports: PSI far beyond the 0.25 action line.
    assert out.psi_micro > 250_000
    assert out.n_ref == 100 and out.n_cur == 100


def _asset_df(spark, images):
    rows = [
        (i, "image/bmp", encode_bmp(4, 4, bytes(px)), (4, 4, 3, "t"))
        for i, px in enumerate(images)
    ]
    schema = (
        "asset_id long, media_type string, content binary, "
        "meta struct<width:int, height:int, channels:int, source:string>"
    )
    return spark.createDataFrame(rows, schema)


def test_ahash_planted_near_dup(spark):
    # Image 0: half-dark/half-bright. Image 1: same with one pixel's
    # brightness nudged across the mean (Hamming 1). Image 2: the
    # inverse pattern (Hamming 16) — must NOT pair with 0 or 1.
    base = [0] * 24 + [255] * 24  # pixels 0-7 dark, 8-15 bright
    nudged = list(base)
    nudged[0:3] = [255, 255, 255]  # pixel 0 flips to bright
    inverse = [255] * 24 + [0] * 24
    hashes = image_ahash(_asset_df(spark, [base, nudged, inverse]))
    pairs = ahash_near_dup_pairs(hashes).collect()
    assert [(p.u, p.v, p.hamming) for p in pairs] == [(0, 1, 1)]


def test_ahash_uniform_image_hashes_zero(spark):
    # A flat image has no pixel above the mean: hash 0 (strict >).
    flat = [7] * 48
    row = image_ahash(_asset_df(spark, [flat])).collect()[0]
    assert row.ahash == 0


def test_image_clusters_transitive(spark):
    # 0-1 within hamming 1, 1-2 within hamming 1, but 0-2 at hamming 2:
    # all three must land in ONE cluster labeled by doc 0 (transitive
    # closure beyond the pairwise threshold is the point of clustering).
    from data_frame_demo_etl_spark.dedup.clusters import connected_components
    from data_frame_demo_etl_spark.multimodal.phash import ahash_near_dup_pairs

    hashes = spark.createDataFrame(
        [(0, 0b0000000011111111), (1, 0b0000000011111110), (2, 0b0000000011111100)],
        "asset_id long, ahash long",
    )
    pairs = ahash_near_dup_pairs(hashes).select(
        F.col("u").alias("id_a"), F.col("v").alias("id_b")
    )
    comp = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comp == {0: 0, 1: 0, 2: 0}


def test_image_dedup_pair_cap_and_dropped_mass(spark, tmp_path):
    """max_docs_per_hash bounds the pair expansion to the N lowest
    doc_ids per hash group, and image_dedup_dropped_mass accounts for
    exactly the excluded C(n,2)−C(k,2) within-group pair mass."""
    from data_frame_demo_etl_spark.multimodal.phash import (
        image_dedup_dropped_mass,
        multimodal_image_dedup,
    )

    # group A: 6 identical uniform texts (hash 0); group B: 2 identical
    # half-pattern texts (Hamming 8 from A — never cross-pairs)
    rows = [(i, "z" * 48) for i in range(1, 7)] + [(11, "z" * 24), (12, "z" * 24)]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    uncapped = multimodal_image_dedup(spark, str(tmp_path)).collect()
    assert len(uncapped) == 6 * 5 // 2 + 1

    capped = multimodal_image_dedup(
        spark, str(tmp_path), max_docs_per_hash=3
    ).collect()
    got = {(r.u, r.v) for r in capped}
    assert got == {(1, 2), (1, 3), (2, 3), (11, 12)}

    dropped = image_dedup_dropped_mass(
        spark, str(tmp_path), max_docs_per_hash=3
    ).collect()
    assert len(dropped) == 1
    assert (dropped[0].n_docs, dropped[0].n_kept) == (6, 3)
    assert dropped[0].dropped_within_pairs == 15 - 3
