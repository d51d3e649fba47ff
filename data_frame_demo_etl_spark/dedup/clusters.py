"""Duplicate-cluster resolution: near-dup PAIRS → connected components
→ one survivor per cluster.

``connected_components`` is iterative min-label propagation: each node
repeatedly adopts the smallest label among itself and its neighbors
until no label changes. Each iteration is one join + one min-aggregate
(both map-side combinable); convergence needs O(diameter) rounds —
duplicate clusters are near-cliques, so 2-3 rounds in practice. This
is the standard Spark-shaped formulation of the problem (a GraphX/
Pregel-style loop expressed in DataFrames).

``resolve_duplicates`` then keeps the minimum-id document of every
cluster — turning pair detection into an actual deduplicated corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 20,
    driver_threshold: int = 1_000_000,
) -> DataFrame:
    """(id, component) for every node in `pairs`; component = min node
    id reachable.

    Hybrid execution: near-dup pair graphs are normally tiny relative
    to the corpus, so when the edge count is under
    ``driver_threshold`` the components are solved with an O(E·α)
    union-find on the driver (microseconds) instead of paying
    ~2 Spark jobs per propagation round. Larger graphs fall through to
    the distributed min-label loop below."""
    if driver_threshold:
        # take() both sizes the graph AND fetches it in one pass —
        # never compute the (possibly expensive) pair join twice.
        rows = pairs.select(src, dst).take(driver_threshold + 1)
        if len(rows) <= driver_threshold:
            return _driver_union_find(pairs.sparkSession, rows)
    return _distributed_components(pairs, src, dst, max_iter)


def _driver_union_find(spark, edge_rows) -> DataFrame:
    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    for row in edge_rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the representative IS the component id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    rows = [(node, find(node)) for node in parent]
    return spark.createDataFrame(rows, "id long, component long")


def _distributed_components(
    pairs: DataFrame, src: str, dst: str, max_iter: int
) -> DataFrame:
    """Iterative min-label propagation (the 100 TB path)."""
    edges = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(pairs.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )

    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.v == labels.id)
            .groupBy("u")
            .agg(F.min("component").alias("nbr_component"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.u, "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", F.col("component"))
                ).alias("component"),
            )
            .persist()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    edges.unpersist()
    return labels


def resolve_duplicates(
    df: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Drop all but the minimum-id member of every duplicate cluster."""
    comps = connected_components(pairs)
    losers = comps.filter(F.col("id") != F.col("component")).select(
        F.col("id").alias(id_col)
    )
    return df.join(losers, id_col, "left_anti")
