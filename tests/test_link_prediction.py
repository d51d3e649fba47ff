"""Planted G9 link prediction: hand-checked common-neighbor scores."""

from __future__ import annotations

from data_frame_demo_etl_spark.analytics.triangles import (
    link_prediction,
    supplier_link_prediction,
)


def test_link_prediction_path_graph(spark):
    """Path 1-2-3: the only candidate is (1,3) via 2 — cn=1,
    jaccard = 1/(1+1-1) = 1.0."""
    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    got = link_prediction(edges).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.u, r.v, r.common_neighbors, r.jaccard_ppm) == (1, 3, 1, 1_000_000)


def test_link_prediction_square_and_adjacency_excluded(spark):
    """4-cycle 1-2-3-4-1: candidates are the two diagonals, each with
    cn=2 and jaccard 2/(2+2-2) = 1.0; existing edges never appear."""
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long")
    got = [(r.u, r.v, r.common_neighbors, r.jaccard_ppm) for r in link_prediction(edges).collect()]
    assert got == [(1, 3, 2, 1_000_000), (2, 4, 2, 1_000_000)]


def test_link_prediction_ranking(spark):
    """Star hub 0 with leaves 1..4 plus edge (1,2): diagonals among
    leaves rank by cn then jaccard; (3,4) (deg 1 each, cn=1 via hub,
    jacc=1.0) outranks (1,3) (deg2+deg1, jacc=0.5)."""
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2)], "u long, v long"
    )
    got = link_prediction(edges).collect()
    by_pair = {(r.u, r.v): (r.common_neighbors, r.jaccard_ppm) for r in got}
    assert by_pair[(3, 4)] == (1, 1_000_000)
    assert by_pair[(1, 3)] == (1, 500_000)
    # ranked: (3,4) before (1,3)/(1,4)/(2,3)/(2,4)
    assert (got[0].u, got[0].v) == (3, 4)


def test_knn_cap_noop_below_cap(spark):
    """D20 convention: the sparsification cap is a no-op while every
    degree sits below it — cap-on (default 32) == cap-off (cap larger
    than any degree) on a planted graph, bit-identical."""
    edges = spark.createDataFrame(
        [(1, 2, 9), (2, 3, 7), (3, 4, 5), (1, 4, 3), (1, 3, 1)],
        "u long, v long, c long",
    )
    capped = [tuple(r) for r in link_prediction(edges).collect()]
    uncapped = [tuple(r) for r in link_prediction(edges, knn_cap=10_000).collect()]
    assert capped == uncapped


def test_knn_cap_bites_on_hub(spark):
    """When a center's degree exceeds the cap, only its knn_cap
    STRONGEST ties (c DESC, id ASC) form wedges: star 0-{1,2,3} with
    weights 5/3/1 at knn_cap=2 keeps {1,2}, so (1,2) is the sole
    candidate — (1,3)/(2,3) vanish with the dropped weakest tie."""
    edges = spark.createDataFrame(
        [(0, 1, 5), (0, 2, 3), (0, 3, 1)], "u long, v long, c long"
    )
    got = [(r.u, r.v, r.common_neighbors, r.jaccard_ppm)
           for r in link_prediction(edges, knn_cap=2).collect()]
    assert got == [(1, 2, 1, 1_000_000)]


def test_supplier_link_prediction_gate_shape(spark, sf_oracle_dir):
    out = supplier_link_prediction(spark, sf_oracle_dir).toPandas()
    assert list(out.columns) == ["u", "v", "common_neighbors", "jaccard_ppm"]
    assert len(out) <= 20
    assert (out.common_neighbors > 0).all()


def test_local_clustering_planted(spark):
    """Triangle 1-2-3 plus pendant 3-4: C(1)=C(2)=1.0, C(3)=1/3,
    node 4 (deg 1) excluded."""
    from data_frame_demo_etl_spark.analytics.triangles import local_clustering

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "u long, v long"
    )
    got = [(r.node, r.degree, r.triangles, r.coef_ppm)
           for r in local_clustering(edges).collect()]
    assert got == [(1, 2, 1, 1_000_000), (2, 2, 1, 1_000_000), (3, 3, 1, 333_333)]


def test_assortativity_planted(spark):
    """Path 1-2-3 is perfectly disassortative: r = -1."""
    from data_frame_demo_etl_spark.analytics.triangles import degree_assortativity

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u long, v long")
    r = degree_assortativity(edges).collect()[0]
    assert (r.n_edges, r.assortativity_ppm) == (2, -1_000_000)


def test_assortativity_regular_graph_degenerate(spark):
    """A 4-cycle is degree-regular: zero variance → NULL r."""
    from data_frame_demo_etl_spark.analytics.triangles import degree_assortativity

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4)], "u long, v long"
    )
    r = degree_assortativity(edges).collect()[0]
    assert (r.n_edges, r.assortativity_ppm) == (4, None)
