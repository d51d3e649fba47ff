"""Entity resolution / record linkage: blocked fuzzy matching.

The classic two-phase ER shape (Fellegi-Sunter era onward, same
pattern as Dedoop/Magellan-style systems): a cheap BLOCKING key bounds
the quadratic candidate space to within-block pairs, then an
edit-distance VERIFY pass scores the survivors. Identical in spirit to
the LSH-band/prefix-filter pattern the near-dup dedup family uses —
blocking IS the relational equivalent of bucketing.

Scale shape: one equi-join on the blocking key (shuffle bounded by
block sizes — pick keys that keep blocks ≲10⁴), `levenshtein` runs
JVM-side inside codegen, and the `id_a < id_b` predicate halves the
pair space before the verify. No cartesian anywhere: a degenerate
blocking key (every row in one block) is the ER analog of a hot LSH
bucket — profile with `lineitem_key_skew`'s approach and refine the
key, exactly as you would cap a hot bucket.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_edit: int = 1,
) -> DataFrame:
    """(id_a, id_b, name_a, name_b, edit_distance) for within-block
    pairs whose names are within ``max_edit`` Levenshtein distance."""
    s = df.select(
        F.col(id_col).alias("id"), F.col(name_col).alias("name"), block.alias("blk")
    )
    a = s.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"), "blk")
    b = s.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"), "blk")
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit_distance", F.levenshtein("name_a", "name_b").cast("long"))
        .filter(F.col("edit_distance") <= max_edit)
        .select("id_a", "id_b", "name_a", "name_b", "edit_distance")
        .orderBy("id_a", "id_b")
    )


def supplier_fuzzy_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: near-identical supplier names (≤1 edit) blocked on the
    first 7 digits of the name's numeric suffix — blocks of ≤100
    records at every scale factor, so the verify join is bounded."""
    supplier = load_table(spark, "supplier", sf_dir)
    return blocked_fuzzy_pairs(
        supplier,
        id_col="s_suppkey",
        name_col="s_name",
        block=F.substring("s_name", 10, 7),
        max_edit=1,
    )


SUPPLIER_FUZZY_MATCHES_SQL = """
WITH s AS (
  SELECT s_suppkey AS id, s_name AS name, SUBSTRING(s_name, 10, 7) AS blk
  FROM supplier
)
SELECT a.id AS id_a, b.id AS id_b, a.name AS name_a, b.name AS name_b,
       CAST(LEVENSHTEIN(a.name, b.name) AS BIGINT) AS edit_distance
FROM s a
JOIN s b ON a.blk = b.blk AND a.id < b.id
WHERE LEVENSHTEIN(a.name, b.name) <= 1
ORDER BY id_a, id_b
"""
