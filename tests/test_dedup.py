"""Unit tests for near-dup detection: planted duplicates must be
found; sketch methods must agree with exact Jaccard."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from data_frame_demo_etl_spark.dedup.jaccard import jaccard_pairs
from data_frame_demo_etl_spark.dedup.minhash import minhash_near_dup_pairs, signatures
from data_frame_demo_etl_spark.dedup.simhash import simhash_near_dup_pairs, simhash_table
from data_frame_demo_etl_spark.operators.dedupe import dedup_exact


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away into the woods tonight"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base.replace("lazy", "sleepy")),  # near dup of 0
        (3, "completely different text about spark dataframes and distributed query engines today"),
        (4, "yet another unrelated document mentioning parquet files and shuffle partitions in clusters"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup_keeps_min_id(spark, corpus):
    result = dedup_exact(corpus, "text", "doc_id")
    ids = sorted(r.doc_id for r in result.collect())
    assert ids == [0, 2, 3, 4]


def test_jaccard_finds_planted_pair(spark, corpus):
    pairs = jaccard_pairs(corpus, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found  # exact dup → jaccard 1.0
    assert (0, 2) in found and (1, 2) in found  # near dup
    assert all(r.jaccard <= 1.0 for r in pairs)
    exact = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert exact[(0, 1)] == 1.0


def test_minhash_agrees_with_exact_jaccard(spark, corpus):
    pairs = minhash_near_dup_pairs(corpus, threshold=0.5).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (0, 1) in found
    est = {(r.id_a, r.id_b): r.est_jaccard for r in pairs}
    assert est[(0, 1)] == 1.0  # identical docs → identical signatures


def test_minhash_signature_deterministic(spark, corpus):
    s1 = signatures(corpus).collect()
    s2 = signatures(corpus).collect()
    assert sorted(map(repr, s1)) == sorted(map(repr, s2))


def test_simhash_identical_fingerprints(spark, corpus):
    fps = {r.doc: r.fp for r in simhash_table(corpus).collect()}
    assert fps[0] == fps[1]
    pairs = simhash_near_dup_pairs(corpus, max_hamming=3).collect()
    assert (0, 1) in {(r.id_a, r.id_b) for r in pairs}


def test_minhash_hot_bucket_cap_bounds_candidates(spark):
    """A degenerate corpus (1k near-identical docs) must NOT produce
    the ~500k-pair quadratic blowup: with max_bucket_size=50 every
    band bucket is hot, so zero candidate pairs survive — the cap
    bounds the self-join. With the cap disabled the same corpus
    produces the full quadratic pair set."""
    base = "the quick brown fox jumps over the lazy dog and runs far into the woods "
    rows = [(i, base + f"variant token {i % 3}") for i in range(1000)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = minhash_near_dup_pairs(df, threshold=0.5, max_bucket_size=50).count()
    assert capped == 0

    # Sanity on a mixed corpus: the cap must not hurt normal pairs —
    # planted near-dups still meet through their (non-hot) buckets.
    mixed = spark.createDataFrame(
        [(i, base + f"filler {i} " * 3) for i in range(100)]
        + [(1000, base + "twin alpha beta gamma"), (1001, base + "twin alpha beta gamma")],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(mixed, threshold=0.8, max_bucket_size=50).collect()
    }
    assert (1000, 1001) in pairs


def test_portable_minhash_simhash_match_planted(spark, corpus):
    """The md5 portable families must find the same planted dups as
    the xxhash64 fast paths."""
    from data_frame_demo_etl_spark.dedup.minhash import portable_signatures
    from data_frame_demo_etl_spark.dedup.simhash import portable_simhash_near_dup_pairs

    mh = {
        (r.id_a, r.id_b)
        for r in minhash_near_dup_pairs(corpus, threshold=0.5, hash_fn="md5").collect()
    }
    assert (0, 1) in mh
    sh = {(r.id_a, r.id_b) for r in portable_simhash_near_dup_pairs(corpus).collect()}
    assert (0, 1) in sh
    # portable signatures are deterministic
    s1 = portable_signatures(corpus).collect()
    s2 = portable_signatures(corpus).collect()
    assert sorted(map(repr, s1)) == sorted(map(repr, s2))


def test_minhash_recall_on_testdata(spark, sf_dir):
    """On the driver corpus, MinHash must recover the overwhelming
    majority of exact-Jaccard>=0.9 pairs (LSH theory: ~100% at these
    band settings)."""
    from data_frame_demo_etl_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    exact = {(r.id_a, r.id_b) for r in jaccard_pairs(docs, threshold=0.9).collect()}
    approx = {(r.id_a, r.id_b) for r in minhash_near_dup_pairs(docs, threshold=0.5).collect()}
    if exact:
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.9, f"minhash recall {recall} over {len(exact)} true pairs"


def test_band_autotune_theory_and_recall(spark, sf_dir):
    """tune_bands must honor the closed-form recall bound, and the
    auto-tuned operator must actually hit the target recall against
    exact Jaccard on the driver corpus at two thresholds."""
    from data_frame_demo_etl_spark.dedup.minhash import candidate_probability, tune_bands
    from data_frame_demo_etl_spark.sources.catalog import load_table

    for t, p in [(0.5, 0.9), (0.8, 0.95), (0.9, 0.99)]:
        b, r = tune_bands(32, t, p)
        assert b * r == 32
        assert candidate_probability(t, b, r) >= p
        # rows is maximal: the next-larger factorization misses the target
        larger = [rr for rr in range(r + 1, 33) if 32 % rr == 0]
        if larger:
            assert candidate_probability(t, 32 // larger[0], larger[0]) < p

    docs = load_table(spark, "documents", sf_dir)
    for thr in (0.8, 0.9):
        exact = {(r_.id_a, r_.id_b) for r_ in jaccard_pairs(docs, threshold=thr).collect()}
        if not exact:
            continue
        tuned = {
            (r_.id_a, r_.id_b)
            for r_ in minhash_near_dup_pairs(
                docs, bands=None, rows=None, threshold=0.5, target_recall=0.95
            ).collect()
        }
        recall = len(exact & tuned) / len(exact)
        assert recall >= 0.9, f"thr={thr}: tuned recall {recall} over {len(exact)} pairs"


def test_prefix_filter_matches_naive(spark, sf_dir):
    """The prefix-filtered join must return exactly the naive result."""
    from data_frame_demo_etl_spark.dedup.jaccard import jaccard_pairs_naive
    from data_frame_demo_etl_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    # 0.8 is the regression threshold: pairs sitting EXACTLY at t
    # (e.g. an 8-subset of a 10-set) once fell to float truncation in
    # the prefix-length computation.
    for t in (0.7, 0.8):
        fast = {(r.id_a, r.id_b, r.jaccard) for r in jaccard_pairs(docs, threshold=t).collect()}
        naive = {
            (r.id_a, r.id_b, r.jaccard) for r in jaccard_pairs_naive(docs, threshold=t).collect()
        }
        assert fast == naive and len(fast) > 0


def test_connected_components_known_graph(spark):
    from data_frame_demo_etl_spark.dedup.clusters import connected_components, resolve_duplicates

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6), (8, 9), (9, 10), (3, 4)], ["id_a", "id_b"]
    )
    comps = {r.id: r.component for r in connected_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 5, 8: 8, 9: 8, 10: 8}

    corpus = spark.createDataFrame([(i, f"d{i}") for i in range(12)], ["doc_id", "text"])
    kept = sorted(r.doc_id for r in resolve_duplicates(corpus, pairs).collect())
    assert kept == [0, 1, 5, 7, 8, 11]


def test_distributed_components_match_union_find(spark):
    from data_frame_demo_etl_spark.dedup.clusters import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 30, 2)] + [(5, 9), (9, 13), (100, 2)],
        ["id_a", "id_b"],
    )
    fast = {(r.id, r.component) for r in connected_components(pairs).collect()}
    dist = {
        (r.id, r.component)
        for r in connected_components(pairs, driver_threshold=0).collect()
    }
    assert fast == dist and len(fast) > 0


def test_decontaminate_removes_overlapping_docs(spark):
    from data_frame_demo_etl_spark.dedup.contamination import (
        contamination_pairs,
        decontaminate,
    )

    span = "one two three four five six seven eight nine ten"
    train = spark.createDataFrame(
        [
            (1, f"intro text {span} outro words here"),   # contains eval span
            (2, "totally unrelated training document with distinct words only"),
        ],
        ["doc_id", "text"],
    )
    eval_set = spark.createDataFrame([(100, f"benchmark asks about {span} exactly")], ["doc_id", "text"])
    pairs = contamination_pairs(train, eval_set, n=8).collect()
    assert {(r.train_id, r.eval_id) for r in pairs} == {(1, 100)}
    clean = decontaminate(train, eval_set, n=8)
    assert [r.doc_id for r in clean.collect()] == [2]


def test_span_dedup_removes_cross_doc_boilerplate(spark):
    """A 20-word header shared by two docs survives exactly once
    (first occurrence), per-doc counts reconcile, and a doc whose
    every span is boilerplate reduces to empty text."""
    from data_frame_demo_etl_spark.dedup.spans import span_dedup

    hdr = " ".join(f"nav{i}" for i in range(20))
    rows = [
        (1, hdr + " unique body alpha beta gamma"),
        (2, hdr + " different tail body here now"),
        (3, hdr),  # all-boilerplate doc
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r.doc_id: r for r in span_dedup(df).collect()}
    assert out[1].dedup_text.startswith("nav0") and out[1].n_kept == out[1].n_total == 2
    assert not out[2].dedup_text.startswith("nav0") and out[2].n_kept == 1
    assert out[3].dedup_text == "" and out[3].n_kept == 0 and out[3].n_total == 1


def test_star_contraction_long_chain_and_random(spark):
    """The star-contraction path converges on a 400-node chain (where
    min-label propagation would need 400 rounds) and matches driver
    union-find on random graphs."""
    import random

    from data_frame_demo_etl_spark.dedup.clusters import connected_components

    chain = [(i, i + 1) if i % 2 else (i + 1, i) for i in range(400)]
    pairs = spark.createDataFrame(chain, ["id_a", "id_b"])
    dist = {r.id: r.component for r in connected_components(pairs, driver_threshold=0).collect()}
    assert set(dist.values()) == {0} and len(dist) == 401

    rng = random.Random(7)
    rand_edges = [(rng.randrange(150), rng.randrange(150)) for _ in range(120)]
    rand_edges = [(a, b) for a, b in rand_edges if a != b]
    pairs = spark.createDataFrame(rand_edges, ["id_a", "id_b"])
    dist = {(r.id, r.component) for r in connected_components(pairs, driver_threshold=0).collect()}
    ref = {(r.id, r.component) for r in connected_components(pairs).collect()}
    assert dist == ref


def test_doc_novelty_scores_planted_boilerplate(spark):
    """A shared 10-word header across 3 docs marks exactly those
    header shingles as shared; a fully-unique doc scores 0; a doc
    shorter than n has no shingles and scores 0."""
    from data_frame_demo_etl_spark.dedup.novelty import doc_novelty

    header = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (0, header + " uniq0a uniq0b uniq0c uniq0d uniq0e"),
        (1, header + " uniq1a uniq1b uniq1c uniq1d uniq1e"),
        (2, header + " uniq2a uniq2b uniq2c uniq2d uniq2e"),
        (3, "lone wolf document with entirely distinct words here now ok"),
        (4, "too short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for hashed in (False, True):
        got = doc_novelty(docs, n=8, hashed=hashed).orderBy("doc_id").toPandas()
        # 15 words -> 8 distinct 8-gram positions; the first 3 grams sit
        # fully inside the shared header (positions 1-3 of 10-word header)
        assert list(got.n_shingles) == [8, 8, 8, 3, 0]
        assert list(got.n_shared) == [3, 3, 3, 0, 0]
        assert got.boilerplate_share[3] == 0.0 and got.boilerplate_share[4] == 0.0
        assert abs(got.boilerplate_share[0] - 3 / 8) < 1e-9


def test_incremental_dedup_admission(spark):
    """xxhash64 production path: a batch doc near-identical to a
    corpus doc is rejected; a batch doc duplicating an earlier batch
    doc keeps only the earlier one; novel docs are admitted."""
    from data_frame_demo_etl_spark.dedup.incremental import (
        build_lsh_index,
        incremental_dedup_batch,
    )

    base = " ".join(f"tok{i}" for i in range(60))
    corpus = spark.createDataFrame(
        [(0, base), (2, " ".join(f"other{i}" for i in range(60)))],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (11, base + " tail"),                                  # dup of corpus doc 0
            (13, " ".join(f"fresh{i}" for i in range(60))),        # novel
            (15, " ".join(f"fresh{i}" for i in range(60)) + " x"), # dup of 13
        ],
        "doc_id long, text string",
    )
    sig, bb = build_lsh_index(corpus)
    got = (
        incremental_dedup_batch(batch, sig, bb, threshold=0.8)
        .orderBy("doc_id")
        .toPandas()
        .set_index("doc_id")
    )
    assert not got.loc[11, "is_kept"] and got.loc[11, "n_corpus_dups"] >= 1
    assert got.loc[13, "is_kept"]
    assert not got.loc[15, "is_kept"] and got.loc[15, "n_batch_dups"] >= 1
    # the earlier batch doc is not penalized by its later duplicate
    assert got.loc[13, "n_batch_dups"] == 0


def test_blocked_fuzzy_pairs_planted_typos(spark):
    """Soundex blocking + edit-distance verify on realistic names:
    the typo pair links, unrelated names don't, and cross-block
    candidates are never even compared."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.dedup.fuzzy import blocked_fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "jonathan smith"),
            (2, "jonathon smith"),   # 1 edit from #1, same soundex block
            (3, "jane doe"),
            (4, "john smith"),       # same block as 1/2 but >2 edits
        ],
        "id long, name string",
    )
    pairs = blocked_fuzzy_pairs(
        df, id_col="id", name_col="name", block=F.soundex("name"), max_edit=2
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}
    assert pairs[0].edit_distance == 1


def test_blocked_fuzzy_hot_block_cap(spark):
    """Degenerate blocking key (50 identical names → one hot block):
    with a cap the block is dropped entirely (0 pairs) and the
    dropped-blocks audit names it with its exact size; with the cap
    disabled the quadratic C(50,2) pair set comes back. Clean blocks
    are untouched by the cap."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.dedup.fuzzy import (
        blocked_fuzzy_dropped_blocks,
        blocked_fuzzy_pairs,
    )

    rows = [(i, "john smith") for i in range(1, 51)] + [
        (101, "jonathan smith"),
        (102, "jonathon smith"),
    ]
    df = spark.createDataFrame(rows, "id long, name string")
    blk = F.substring("name", 1, 4)  # "john" vs "jona": distinct blocks
    kw = dict(id_col="id", name_col="name", block=blk, max_edit=2)

    capped = blocked_fuzzy_pairs(df, max_block_size=20, **kw).collect()
    # the hot "john smith" block is gone; the clean 2-record block pairs
    assert {(r.id_a, r.id_b) for r in capped} == {(101, 102)}

    dropped = blocked_fuzzy_dropped_blocks(
        df, id_col="id", name_col="name", block=blk, max_block_size=20
    ).collect()
    assert len(dropped) == 1 and dropped[0].n_records == 50

    uncapped = blocked_fuzzy_pairs(df, max_block_size=None, **kw).collect()
    assert len(uncapped) == 50 * 49 // 2 + 1


def test_count_triangles_known_graphs(spark):
    """K4 has exactly 4 triangles; adding a pendant edge changes
    nothing; a square (C4) has none."""
    from data_frame_demo_etl_spark.analytics.triangles import count_triangles

    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    df = spark.createDataFrame(k4 + [(3, 9)], ["u", "v"])
    row = count_triangles(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (5, 7, 4)

    square = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (0, 3)], ["u", "v"])
    assert count_triangles(square).collect()[0].n_triangles == 0


def test_keep_best_prefers_quality_over_lowest_id(spark, tmp_path):
    """Planted cluster for dedup_clusters_keep_best: three near-dup
    docs where the HIGHEST doc_id has the best quality score — the
    Dolma/CCNet winner rule must keep it and drop the others (the
    lowest-id rule the plain cluster gates use would pick doc 1)."""
    from data_frame_demo_etl_spark.dedup.gate import dedup_clusters_keep_best

    base = " ".join(
        "the quick brown fox and the lazy dog are walking with some other animals "
        "over the old wooden bridge near the river where they often rest".split()
    )
    rows = [
        # near-dups: same text; doc 30 doubled -> same shingles + two
        # boundary shingles (jaccard stays ~0.95) but twice the length
        # -> strictly higher quality score.
        (10, base),
        (20, base),
        (30, base + " " + base),
        # unrelated singleton (no pair -> not in the cluster output)
        (99, "completely different content about distributed shuffle hash joins"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    out = dedup_clusters_keep_best(spark, str(tmp_path)).collect()
    by_id = {r.doc_id: r for r in out}
    assert set(by_id) == {10, 20, 30}  # the singleton has no pairs
    assert all(r.cluster == 10 for r in out)  # one component, min-id label
    kept = [r.doc_id for r in out if r.is_kept]
    assert kept == [30]  # best quality wins, NOT lowest id
    assert by_id[30].quality > by_id[10].quality


def test_split_leakage_detects_planted_cross_split_dup(spark, tmp_path):
    """Two near-identical docs whose md5-split labels differ must show
    up as an is_leak row; identical split pairs must not."""
    from data_frame_demo_etl_spark.dedup.gate import split_leakage_check

    base = (
        "the quick brown fox jumps over the lazy dog near the old wooden "
        "bridge while other animals watch from the river bank in the rain"
    )
    # find two doc ids in different splits and two in the same split
    import hashlib

    def split_of(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        return "train" if h < "cccccccc" else ("val" if h < "e6666666" else "test")

    ids = list(range(1, 200))
    cross = next(
        (a, b) for a in ids for b in ids if a < b and split_of(a) != split_of(b)
    )
    same = next(
        (a, b)
        for a in ids
        for b in ids
        if a < b
        and split_of(a) == split_of(b)
        and not {a, b} & set(cross)  # disjoint ids — doc_ids must be unique
    )
    # Identical texts: est_jaccard is exactly 1.0 and the LSH buckets
    # match by construction — the test pins the SPLIT accounting, not
    # the sketch's variance at the threshold.
    rows = [
        (cross[0], base), (cross[1], base),
        (same[0], base.upper()), (same[1], base.upper()),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = split_leakage_check(spark, str(tmp_path)).collect()
    leaks = [r for r in out if r.is_leak]
    clean = [r for r in out if not r.is_leak]
    assert sum(r.n_pairs for r in leaks) == 1
    assert sum(r.n_pairs for r in clean) == 1
    assert all(r.split_a == r.split_b for r in clean)
    assert all(r.split_a != r.split_b for r in leaks)


def test_split_leakage_fast_matches_on_planted_dups(spark, tmp_path):
    """The registered signature-collapsed audit must produce the same
    accounting as the doc-level cross-check form on a small corpus
    (where no bucket cap triggers)."""
    from data_frame_demo_etl_spark.dedup.gate import (
        split_leakage_check,
        split_leakage_check_doclevel,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the old wooden "
        "bridge while other animals watch from the river bank in the rain"
    )
    rows = [(i, base if i % 2 else base.upper()) for i in range(1, 41)]
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    slow = {
        (r.split_a, r.split_b, r.is_leak): r.n_pairs
        for r in split_leakage_check_doclevel(spark, str(tmp_path)).collect()
    }
    fast = {
        (r.split_a, r.split_b, r.is_leak): r.n_pairs
        for r in split_leakage_check(spark, str(tmp_path)).collect()
    }
    assert fast == slow and sum(fast.values()) == 20 * 19 // 2 * 2


def test_split_leakage_fast_exact_past_the_bucket_cap(spark, tmp_path):
    """250 identical docs exceed the doc-level form's hot-bucket cap
    (200): the doc-level cross-check silently DROPS that pair mass,
    while the registered signature-collapsed gate counts the full
    C(250,2) exactly — the regime the round-7 redefinition exists
    for."""
    import hashlib

    from data_frame_demo_etl_spark.dedup.gate import (
        split_leakage_check,
        split_leakage_check_doclevel,
    )

    base = (
        "the quick brown fox jumps over the lazy dog near the old wooden "
        "bridge while other animals watch from the river bank in the rain"
    )
    n = 250
    docs = spark.createDataFrame(
        [(i, base, "en", "s", len(base)) for i in range(1, n + 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    def split_of(i):
        h = hashlib.md5(str(i).encode()).hexdigest()[:8]
        return "train" if h < "cccccccc" else ("val" if h < "e6666666" else "test")

    from collections import Counter

    cnt = Counter(split_of(i) for i in range(1, n + 1))
    want_total = n * (n - 1) // 2
    fast = split_leakage_check(spark, str(tmp_path)).collect()
    assert sum(r.n_pairs for r in fast) == want_total
    # closed-form per-combo check
    by_combo = {(r.split_a, r.split_b): r.n_pairs for r in fast}
    for s, c in cnt.items():
        assert by_combo.get((s, s), 0) == c * (c - 1) // 2
    slow_total = sum(
        r.n_pairs
        for r in split_leakage_check_doclevel(spark, str(tmp_path)).collect()
    )
    assert slow_total < want_total  # the cap dropped pair mass


def test_winnowing_detects_shifted_copy(spark):
    """The winnowing guarantee: a shared substring ≥ w+k−1 chars is
    detected regardless of alignment — a copy embedded at a different
    offset (which defeats fixed non-overlapping span dedup) still
    shares fingerprints."""
    from data_frame_demo_etl_spark.dedup.winnowing import winnow_matches

    block = "the quick brown fox jumps over the lazy dog near the old bridge"
    rows = [
        (1, block),
        (2, "prefix padding words here " + block + " and a suffix"),
        (3, "completely different text with no overlap whatsoever in content"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in winnow_matches(df).collect()}
    assert (1, 2) in got
    assert not any(3 in p for p in got)


def test_winnowing_short_and_subwindow_docs(spark):
    """Shorter than k chars → no fingerprints; ≥k chars but fewer
    than w k-grams → exactly one (the global minimum)."""
    from data_frame_demo_etl_spark.dedup.winnowing import (
        K_CHARS,
        winnow_fingerprints,
    )

    rows = [(1, "tiny"), (2, "x" * K_CHARS), (3, "y" * (K_CHARS + 3))]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    per_doc = {
        r.doc: r.n for r in winnow_fingerprints(df).groupBy("doc").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert 1 not in per_doc          # too short: no k-gram at all
    assert per_doc[2] == 1           # single k-gram: one fingerprint
    assert per_doc[3] == 1           # 4 identical k-grams: one distinct min


def test_winnowing_hot_fingerprint_cap(spark):
    """A boilerplate block shared by more docs than the cap never
    enters the pair join: 60 docs sharing one block (cap 50) produce
    zero pairs, while two docs sharing a rare block still match."""
    from data_frame_demo_etl_spark.dedup.winnowing import winnow_matches

    boiler = "this footer appears on absolutely every page of the site"
    rare = "a genuinely distinctive sentence that only two documents share"
    rows = [(i, f"unique lead {i} " + boiler) for i in range(60)]
    rows += [(100, rare + " alpha"), (101, rare + " beta")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.id_a, r.id_b) for r in winnow_matches(df).collect()}
    assert got == {(100, 101)}


def test_winnowing_unicode_parity_with_oracle(spark, tmp_path):
    """The Karp–Rabin fingerprint must agree bit-for-bit across
    engines on NON-ASCII text too (the shipped corpus is ASCII-only,
    so the contract sweep never exercises codepoints > 127): numpy
    reads codepoints via utf-32, DuckDB via ASCII() — both must see
    the same integers, and SUBSTR must be character-based on both."""
    import duckdb

    from data_frame_demo_etl_spark.dedup.winnowing import (
        DOCS_WINNOWING_MATCHES_SQL,
        winnow_matches,
    )

    base = "überraschungsmoment für die öffentlichkeit—æøå çğş 你好世界再见"
    rows = [
        (1, base + " erste fassung mit ein paar extra worten am ende"),
        (2, "ganz anderer anfang " + base + " und ein anderes ende"),
        (3, "völlig anderer inhalt ohne überlappung irgendwelcher art hier"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "de", "s", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p = str(tmp_path / "documents.parquet")
    docs.write.mode("overwrite").parquet(p)
    got = {
        (r.id_a, r.id_b, r.n_shared)
        for r in winnow_matches(
            spark.read.parquet(p).select("doc_id", "text")
        ).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = set(map(tuple, con.execute(DOCS_WINNOWING_MATCHES_SQL).fetchall()))
    assert got == want
    assert any(a == 1 and b == 2 for a, b, _ in got)  # shared block found


def test_exact_substring_mass_planted_block(spark):
    """Lee-et-al exact substring mass: a boilerplate block ≥ L chars
    planted at DIFFERENT offsets in two docs contributes exactly the
    block's length to each doc's dup_chars; a doc with no shared run
    reports zero."""
    from data_frame_demo_etl_spark.dedup.substring import (
        L_CHARS,
        duplicate_span_mass,
    )

    block = "shared boilerplate block of considerable length here"  # 52 chars
    assert len(block) >= L_CHARS
    rows = [
        (1, block + " unique tail alpha beta gamma delta epsilon zeta"),
        (2, "a shifted prefix before " + block),
        (3, "totally unrelated content with nothing in common at all xyz"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: r.dup_chars for r in duplicate_span_mass(df).collect()}
    assert got == {1: len(block), 2: len(block)}


def test_exact_substring_mass_self_repeat_not_counted(spark):
    """Cross-document sharing only: a phrase repeated twice inside ONE
    document does not count as duplicate mass."""
    from data_frame_demo_etl_spark.dedup.substring import duplicate_span_mass

    phrase = "repeated inside one single document body"
    rows = [
        (1, phrase + " middle filler words " + phrase),
        (2, "entirely different second document with fresh content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert duplicate_span_mass(df).count() == 0


def test_exact_substring_mass_oracle_parity(spark, tmp_path):
    """Spark gate == DuckDB oracle on a synthetic corpus with planted
    overlaps, exact duplicates (collapsed), and short docs."""
    import duckdb

    from data_frame_demo_etl_spark.dedup.substring import (
        DOCS_EXACT_SUBSTRING_MASS_SQL,
        docs_exact_substring_mass,
    )

    block = "one common run that is clearly long enough to be seeded"
    rows = [
        (1, block + " plus tail one", "en", "t"),
        (2, "lead-in words then " + block, "en", "t"),
        (3, "short", "en", "t"),
        (4, block + " plus tail one", "en", "t"),  # exact copy of 1
        (5, "nothing shared here with anyone else in this tiny corpus", "en", "t"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string").withColumn(
        "n_chars", F.length("text").cast("long")
    )
    p = str(tmp_path / "documents.parquet")
    df.write.parquet(p)
    got = {
        (r.doc_id, r.n_chars, r.dup_chars)
        for r in docs_exact_substring_mass(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{p}/*.parquet')")
    want = set(map(tuple, con.execute(DOCS_EXACT_SUBSTRING_MASS_SQL).fetchall()))
    assert got == want
    by_id = {d: (n, m) for d, n, m in got}
    assert by_id[1][1] == len(block) and by_id[2][1] == len(block)
    assert by_id[3][1] == 0 and by_id[5][1] == 0
    assert 4 not in by_id  # exact copy collapsed to representative 1


def test_remove_duplicate_spans_excises_planted_block(spark):
    """The remover excises exactly the shared block (every occurrence,
    documented divergence from Lee et al.'s keep-one) and leaves
    unique prose untouched; n_removed equals the D17 mass."""
    from data_frame_demo_etl_spark.dedup.substring import (
        duplicate_span_mass,
        remove_duplicate_spans,
    )

    block = "shared boilerplate block of considerable length here"
    rows = [
        (1, "alpha beta gamma " + block + " delta epsilon"),
        (2, block + " zeta eta theta iota kappa lambda mu nu xi"),
        (3, "no shared content at all in this third document body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: (r.text_clean, r.n_removed) for r in remove_duplicate_spans(df).collect()}
    # The MAXIMAL shared run is block + the trailing space (both docs
    # follow the block with " "), so 53 chars go — the remover finds
    # the true run extent, not the planted label.
    run = len(block) + 1
    assert got[1] == ("alpha beta gamma " + "delta epsilon", run)
    assert got[2] == ("zeta eta theta iota kappa lambda mu nu xi", run)
    assert got[3] == (rows[2][1], 0)
    mass = {r.doc: r.dup_chars for r in duplicate_span_mass(df).collect()}
    for d, (_, n_removed) in got.items():
        assert mass.get(d, 0) == n_removed


def test_remove_duplicate_spans_fully_duplicated_doc_empties(spark):
    """A document that is entirely one shared run cleans to the empty
    string (and survives the left join with n_removed == n_chars)."""
    from data_frame_demo_etl_spark.dedup.substring import remove_duplicate_spans

    body = "this entire body is duplicated verbatim across documents"
    rows = [(1, body), (2, "prefix " + body + " suffix")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc: (r.text_clean, r.n_removed) for r in remove_duplicate_spans(df).collect()}
    assert got[1] == ("", len(body))
    assert got[2] == ("prefix " + " suffix", len(body))
