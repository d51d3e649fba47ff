"""G7: personalized PageRank (seeded teleport, exact integer grid)."""

from __future__ import annotations


def _simulate(edges, seeds, n_rounds):
    """Reference integer-grid PPR on plain dicts — mirrors the
    documented update exactly."""
    from data_frame_demo_etl_spark.analytics.pagerank import BASE, DAMP_DEN, DAMP_NUM, SCALE

    nodes = {s for s, _ in edges} | {d for _, d in edges}
    deg = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    r = {n: (SCALE if n in seeds else 0) for n in nodes}
    for _ in range(n_rounds):
        inflow = {n: 0 for n in nodes}
        for s, d in edges:
            inflow[d] += r[s] // deg[s]
        r = {
            n: (BASE if n in seeds else 0) + DAMP_NUM * inflow[n] // DAMP_DEN
            for n in nodes
        }
    return r


def test_ppr_matches_integer_simulation(spark):
    from data_frame_demo_etl_spark.analytics.pagerank import personalized_pagerank

    # bidirected path 1-2-3-4 plus a disconnected pair 8-9
    undirected = [(1, 2), (2, 3), (3, 4), (8, 9)]
    edges = [(a, b) for a, b in undirected] + [(b, a) for a, b in undirected]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank_units
        for r in personalized_pagerank(df, seeds, n_rounds=3).collect()
    }
    want = _simulate(edges, {1}, 3)
    assert got == want
    # proximity ordering holds within a parity class (on a path the
    # odd rounds park most mass on odd-distance nodes): node 2
    # (distance 1) outranks node 4 (distance 3)
    assert got[2] > got[4]
    # the disconnected component never receives mass
    assert got[8] == 0 and got[9] == 0


def test_ppr_mass_diffuses_outward_only(spark):
    from data_frame_demo_etl_spark.analytics.pagerank import personalized_pagerank

    # star: seed 1 at the centre of 2..5
    edges = [(1, k) for k in range(2, 6)] + [(k, 1) for k in range(2, 6)]
    df = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {
        r.node: r.rank_units
        for r in personalized_pagerank(df, seeds, n_rounds=2).collect()
    }
    # all leaves symmetric → identical rank; centre dominates
    leaf_ranks = {got[k] for k in range(2, 6)}
    assert len(leaf_ranks) == 1
    assert got[1] > got[2] > 0
