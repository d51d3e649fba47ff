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
) -> DataFrame:
    """(id, component) for every node in `pairs`; component = min node
    id reachable. Converges early when labels stop changing."""
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
