"""Planted HITS (G8): hand-walked integer rounds on a 3-edge graph."""

from __future__ import annotations

from data_frame_demo_etl_spark.analytics.hits import graph_hits, hits


def test_hits_hand_computed_two_rounds(spark):
    """Graph c1→{s1,s2}, c2→{s1}. Walked by hand on the 1e12 L1 grid:
    round 1: a1 = (s1: 666666666666, s2: 333333333333),
             h1 = (c1: 600000000000, c2: 400000000000) — both exact;
    round 2: a2 = (s1: 625e9, s2: 375e9),
             h2 = (c1: 615384615384, c2: 384615384615) (floors of
             1e24/1.625e12 and 6.25e23/1.625e12)."""
    pairs = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101)], "src long, dst long"
    )
    got = {
        (r.side, r.key): r.score_units for r in hits(pairs, n_rounds=2).collect()
    }
    assert got[("hub", 1)] == 615_384_615_384
    assert got[("hub", 2)] == 384_615_384_615
    assert got[("authority", 101)] == 625_000_000_000
    assert got[("authority", 102)] == 375_000_000_000


def test_hits_symmetric_graph_uniform(spark):
    """A complete bipartite 2×2 graph is perfectly symmetric: every
    hub and every authority ends at exactly half the L1 grid."""
    pairs = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (2, 102)], "src long, dst long"
    )
    got = {(r.side, r.key): r.score_units for r in hits(pairs).collect()}
    assert all(v == 500_000_000_000 for v in got.values())


def test_graph_hits_gate_shape(spark, sf_oracle_dir):
    out = graph_hits(spark, sf_oracle_dir).toPandas()
    assert list(out.columns) == ["side", "rk", "key", "score_units"]
    assert len(out) == 20
    assert set(out.side) == {"hub", "authority"}
    # scores are on the grid and ranked descending within side
    for side in ("hub", "authority"):
        s = out[out.side == side].sort_values("rk").score_units.tolist()
        assert s == sorted(s, reverse=True)
