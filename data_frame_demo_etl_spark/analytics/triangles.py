"""Triangle counting via degree-ordered edge orientation — the third
graph primitive (after connected components and PageRank), and the
canonical example of taming a quadratic wedge join at scale.

Algorithm (Suri & Vassilvitskii's MapReduce formulation): orient each
undirected edge from its lower-(degree, id) endpoint to the higher
one. The oriented graph is a DAG where every node's OUT-degree is
O(√E), so the wedge self-join (u→v, u→w) — the step that explodes if
joined on raw adjacency, where one celebrity node yields deg² wedge
rows — is bounded by Σ outdeg² = O(E^1.5) total. A final semi-join of
wedges against oriented edges closes the triangles; each triangle is
counted exactly once (from its minimum-ordered vertex).

Graph here: supplier co-purchase — two suppliers are adjacent if some
order contains lineitems from both. Built with a per-order self-join
(suppliers-per-order is bounded by lines-per-order, so the pair
explosion is capped by construction).

No reference analog (`/root/reference` has no graph ops);
brief-mandated beyond-reference analytics alongside pagerank.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strong supplier co-purchase pairs (u < v); see `_copurchase_edges`.

    Releases the internal pair cache before returning, so the caller
    gets an uncached plan (one recompute of the pair table on first
    downstream action). `supplier_triangles` uses the cached variant
    and unpersists after its counts materialize."""
    edges, pairs = _copurchase_edges(spark, sf_dir)
    pairs.unpersist()
    return edges


def _copurchase_edges(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """Strong supplier co-purchase pairs (u < v): the top decile of
    pairs by shared-order count (co-occurrence ≥ the exact p90 order
    statistic), so the graph keeps real structure at ANY scale factor
    (a fixed absolute threshold is complete at small SF and empty at
    large SF — measured both ways before choosing this).

    The exact p90 comes from the co-occurrence HISTOGRAM — a
    #distinct-count-values-sized table (dozens of rows at any scale),
    cumulated on the driver — never a global row_number over the full
    pair table (the single-partition window this replaced cost 3× the
    rest of the query combined). Value-identical to the oracle's
    ROW_NUMBER formulation: the order statistic at position
    ceil(0.9·n) lies inside the block of equal counts the cumulative
    histogram identifies.

    Returns (edges, cached_pairs). The pair table stays persisted
    (it feeds both the driver-side histogram and the edge filter);
    the CALLER must unpersist `cached_pairs` once the edges have been
    consumed — leaving it cached accumulates the largest intermediate
    of the query across runs."""
    li = load_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_suppkey")
    # Pair generation: collect the per-order supplier SET (one shuffle,
    # map-side partial), then expand the C(k,2) pairs IN-ROW with two
    # explodes. This replaces the former per-order self-join — which
    # shuffled the lineitem table twice and needed count_distinct to
    # collapse duplicate (order, supplier) lines — with one shuffle and
    # a plain count: the set makes each (order, u, v) unique by
    # construction. Pair explosion stays capped by lines-per-order
    # exactly as before (sets are no larger than line lists). Measured
    # at sf1: 2.9s vs 6.6s for the join formulation, same output.
    per_order = li.groupBy("l_orderkey").agg(F.collect_set("l_suppkey").alias("ss"))
    pairs = (
        per_order.select(F.explode("ss").alias("u"), "ss")
        .select("u", F.explode("ss").alias("v"))
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    hist = sorted(
        (r["c"], r["n"]) for r in pairs.groupBy("c").agg(F.count(F.lit(1)).alias("n")).collect()
    )
    n = sum(cnt for _, cnt in hist)
    if n == 0:
        return pairs.select("u", "v"), pairs
    pos = max(1, -(-90 * n // 100))
    cum, thresh = 0, hist[-1][0]
    for c_val, cnt in hist:
        cum += cnt
        if cum >= pos:
            thresh = c_val
            break
    return pairs.filter(F.col("c") >= thresh).select("u", "v"), pairs


_ADJ_BROADCAST_MIN_EDGES = 150_000  # below: job latency > shuffle saved
_ADJ_BROADCAST_MAX_EDGES = 20_000_000  # above: ~160 MB of ids won't broadcast


def count_triangles(edges: DataFrame) -> DataFrame:
    """One row: (n_nodes, n_edges, n_triangles) for undirected distinct
    edges (u < v).

    Cost-based strategy over the same degree-oriented DAG:

    - **adjacency intersection** (mid-size graphs, the shuffle-bound
      regime): fold the out-neighbor lists (each O(√E) by orientation,
      ΣE ids total ≈ 8·E bytes), BROADCAST them, and count each
      oriented edge's |N⁺(s) ∩ N⁺(d)| map-side — the count runs
      without shuffling a single wedge. Measured at sf1 (477k edges):
      3.3s vs 6.3s for the wedge join.
    - **wedge join** (both tails): the Suri–Vassilvitskii self-join on
      the oriented DAG. Below ~150k edges the E^1.5 wedge shuffle is
      trivial and the adjacency path's two extra broadcast-build jobs
      dominate (measured at sf0.1/47k edges: wedge wins by ~0.5s);
      above the broadcast budget the adjacency no longer fits and the
      all-shuffle form is the one that survives — same reasoning as
      a broadcast-vs-sort-merge join pick.
    """
    nodes = (
        edges.select(F.col("u").alias("n"))
        .unionByName(edges.select(F.col("v").alias("n")))
    )
    deg = nodes.groupBy("n").agg(F.count(F.lit(1)).alias("deg"))
    # orient by (deg, id): lower endpoint keeps the out-edge
    du = deg.select(F.col("n").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("deg").alias("dv"))
    withdeg = edges.join(du, "u").join(dv, "v")
    oriented = withdeg.select(
        F.when(
            (F.col("du") < F.col("dv"))
            | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))),
            F.struct(F.col("u").alias("s"), F.col("v").alias("d")),
        )
        .otherwise(F.struct(F.col("v").alias("s"), F.col("u").alias("d")))
        .alias("e")
    ).select(F.col("e.s").alias("s"), F.col("e.d").alias("d")).persist()

    n_edges = edges.count()
    if _ADJ_BROADCAST_MIN_EDGES <= n_edges <= _ADJ_BROADCAST_MAX_EDGES:
        adj = oriented.groupBy("s").agg(F.collect_list("d").alias("nbrs"))
        adj_d = adj.select(F.col("s").alias("d"), F.col("nbrs").alias("nbrs_d"))
        row = (
            oriented.join(F.broadcast(adj), "s")
            .join(F.broadcast(adj_d), "d")
            .select(F.size(F.array_intersect("nbrs", "nbrs_d")).alias("t"))
            .agg(F.sum("t").alias("tri"))
            .collect()[0]
        )
        tri = int(row["tri"] or 0)
    else:
        w1 = oriented.select(F.col("s"), F.col("d").alias("x"))
        w2 = oriented.select(F.col("s"), F.col("d").alias("y"))
        wedges = (
            w1.join(w2, "s")
            .filter(F.col("x") < F.col("y"))
            .select(F.col("x"), F.col("y"))
        )
        # a wedge (x, y) closes iff the oriented edge x→y or y→x
        # exists; with a total order both directions are possible (the
        # closing edge's orientation depends on degrees), so join
        # against the canonical undirected form.
        closing = oriented.select(
            F.least("s", "d").alias("x"), F.greatest("s", "d").alias("y")
        )
        tri = wedges.join(closing, ["x", "y"]).count()
    n_nodes = deg.count()
    oriented.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(int(n_nodes), int(n_edges), int(tri))],
        "n_nodes long, n_edges long, n_triangles long",
    )


def supplier_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: triangle census of the supplier co-purchase graph."""
    edges, pairs = _copurchase_edges(spark, sf_dir)
    result = count_triangles(edges)
    # count_triangles materialized every count; release the pair cache
    # (the largest intermediate) instead of letting it accumulate
    # across bench/test runs.
    pairs.unpersist()
    return result


SUPPLIER_TRIANGLES_SQL = """
WITH pairs AS (
  SELECT a.l_suppkey AS u, b.l_suppkey AS v, COUNT(DISTINCT a.l_orderkey) AS c
  FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
  WHERE a.l_suppkey < b.l_suppkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, u ASC, v ASC) AS rn FROM pairs
),
thresh AS (
  SELECT c AS t FROM ranked
  WHERE rn = GREATEST(1, CAST(CEIL(90 * (SELECT MAX(rn) FROM ranked) / 100.0) AS BIGINT))
),
edges AS (
  SELECT u, v FROM pairs WHERE c >= (SELECT t FROM thresh)
),
nodes AS (SELECT u AS n FROM edges UNION ALL SELECT v FROM edges),
stats AS (
  SELECT (SELECT COUNT(DISTINCT n) FROM nodes) AS n_nodes,
         (SELECT COUNT(*) FROM edges) AS n_edges
),
tri AS (
  SELECT COUNT(*) AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e2.u = e1.u AND e2.v > e1.v
  JOIN edges e3 ON e3.u = e1.v AND e3.v = e2.v
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST(n_edges AS BIGINT) AS n_edges,
       CAST(n_triangles AS BIGINT) AS n_triangles
FROM stats CROSS JOIN tri
"""
