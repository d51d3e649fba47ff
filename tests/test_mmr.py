"""MMR diverse rerank (X12): planted-geometry reorder, determinism,
and gate-level consistency with the relevance ranking."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from data_frame_demo_etl_spark.similarity.mmr import embeddings_mmr_rerank, mmr_rerank


def _vec(theta_deg: float) -> list[float]:
    t = math.radians(theta_deg)
    return [math.cos(t), math.sin(t), 0.0, 0.0]


def _planted(spark):
    # q on the x-axis; c1 at +30°, c2 just past it at +30.05° (a near-
    # duplicate of c1), c3 at −31° — the mirror side. Pure relevance
    # ranks (1, 2, 3); MMR must demote the near-duplicate: after c1 is
    # taken, c2's diversity penalty is ~cos(0.05°)≈1 while c3's is
    # cos(61°)≈0.485, so c3 overtakes despite lower relevance.
    corpus = spark.createDataFrame(
        [(1, _vec(30.0)), (2, _vec(30.05)), (3, _vec(-31.0))],
        "vec_id long, embedding array<double>",
    )
    queries = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0])], "query_id long, embedding array<double>"
    )
    return corpus, queries


def test_mmr_demotes_near_duplicate(spark):
    corpus, queries = _planted(spark)
    out = mmr_rerank(corpus, queries, k=3).orderBy("pos").collect()
    assert [r.neighbor_id for r in out] == [1, 3, 2]
    # pos 1 has no diversity term: score10 = 7 * rel_ppm(cos 30°).
    assert out[0].score10_ppm == 7 * round(round(math.cos(math.radians(30.0)), 6) * 1e6)
    # pos 2 (c3): 7·cos(31°) − 3·cos(61°) on the same ppm grid.
    expect3 = 7 * round(round(math.cos(math.radians(31.0)), 6) * 1e6) - 3 * round(
        round(math.cos(math.radians(61.0)), 6) * 1e6
    )
    assert out[1].score10_ppm == expect3


def test_mmr_pure_relevance_at_pos1_matches_topk(spark, sf_dir):
    from data_frame_demo_etl_spark.similarity.gate import ann_cosine_topk

    mmr = embeddings_mmr_rerank(spark, sf_dir).filter(F.col("pos") == 1)
    top = ann_cosine_topk(spark, sf_dir).filter(F.col("rank") == 1)
    got = {(r.query_id, r.neighbor_id) for r in mmr.collect()}
    want = {(r.query_id, r.neighbor_id) for r in top.collect()}
    assert got == want


def test_mmr_gate_shape_and_uniqueness(spark, sf_dir):
    out = embeddings_mmr_rerank(spark, sf_dir)
    assert out.columns == ["query_id", "pos", "neighbor_id", "score10_ppm"]
    rows = out.collect()
    per_q: dict[int, list] = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append(r)
    for q, rs in per_q.items():
        assert sorted(r.pos for r in rs) == list(range(1, len(rs) + 1))
        assert len({r.neighbor_id for r in rs}) == len(rs)


def test_mmr_deterministic(spark):
    corpus, queries = _planted(spark)
    a = sorted(map(tuple, mmr_rerank(corpus, queries, k=3).collect()))
    b = sorted(map(tuple, mmr_rerank(corpus, queries, k=3).collect()))
    assert a == b
