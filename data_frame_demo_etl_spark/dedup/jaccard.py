"""Exact n-gram Jaccard near-duplicate pairs.

Set-similarity self-join: explode distinct shingles, equi-join on the
shingle, count intersections per pair, compute |A∩B| / (|A|+|B|-|A∩B|).

Scale notes: the shuffle key is the *shingle*, so hot shingles (stop
n-grams) skew the join — at real scale pair-generation should drop the
most frequent shingles (they contribute little discriminative signal);
``max_shingle_freq`` implements exactly that cutoff.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .shingling import shingles


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc"), F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int | None = None,
) -> DataFrame:
    """(id_a, id_b, jaccard) for all pairs with Jaccard >= threshold."""
    sh = shingle_table(df, id_col, text_col, n)
    # Join/shuffle on a 64-bit hash of the shingle, not the string:
    # ~3× less shuffle bytes, and long equi-join beats string compare.
    # (xxhash64 collisions are ~1e-19 at any realistic shingle count.)
    sh = sh.select("doc", F.xxhash64("shingle").alias("shingle"))
    if max_shingle_freq is not None:
        hot = sh.groupBy("shingle").count().filter(F.col("count") > max_shingle_freq)
        sh = sh.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = sh.groupBy("doc").agg(F.count(F.lit(1)).alias("sz"))

    a = sh.select(F.col("doc").alias("id_a"), "shingle")
    b = sh.select(F.col("doc").alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(F.broadcast(sa), "id_a")
        .join(F.broadcast(sb), "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("inter").cast("double")
                / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
