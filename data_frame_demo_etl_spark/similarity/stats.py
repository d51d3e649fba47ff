"""Distributed second-order statistics and PCA over an embedding
column.

Two paths, as elsewhere in this repo:

- **Scale path** (`covariance_matrix`, `pca_components`,
  `pca_project`): one `mapInPandas` pass emits per-partition
  sufficient statistics (n, Σx, ΣxxT as a flattened d² array) — the
  driver combines the bounded partials (d is a model constant, 64
  here, so partials are partitions × d² doubles, independent of row
  count) and `numpy.linalg.eigh` finishes on the d×d matrix.
  Projection then runs JVM-side: each principal component is embedded
  as a literal array and reduced with `aggregate(zip_with(...))` —
  no Python in the row path.

- **Portable gate path** (`covariance_entries`): the same covariance
  expressed as an exact decimal-summed aggregation over exploded
  (i, j) index pairs, reproducible bit-for-bit by any engine with
  DECIMAL — order-independent because the accumulator is exact, so
  Spark's partial aggregation and DuckDB's serial sum agree. The
  d²-row blow-up makes it the verification variant, not the 100 TB
  one; pytest cross-checks the two paths.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F

_PARTIAL_SCHEMA = "n long, sx array<double>, sxx array<double>"


def _partial_moments(col: str):
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        sx = None
        sxx = None
        for pdf in batches:
            if pdf.empty:
                continue
            x = np.stack(pdf[col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            sx = x.sum(axis=0) + (sx if sx is not None else 0.0)
            sxx = x.T @ x + (sxx if sxx is not None else 0.0)
        if n:
            yield pd.DataFrame({"n": [n], "sx": [sx.tolist()], "sxx": [sxx.ravel().tolist()]})

    return gen


def covariance_matrix(emb: DataFrame, col: str = "embedding") -> tuple[np.ndarray, np.ndarray, int]:
    """(mean, covariance, n) of the embedding column in ONE data pass.

    The per-partition sufficient statistics are bounded by d², so the
    driver-side combine is constant work regardless of corpus size."""
    partials = emb.select(col).mapInPandas(_partial_moments(col), _PARTIAL_SCHEMA).collect()
    if not partials:
        raise ValueError("covariance_matrix: empty input")
    n = sum(p["n"] for p in partials)
    sx = np.sum([np.asarray(p["sx"]) for p in partials], axis=0)
    d = sx.shape[0]
    sxx = np.sum([np.asarray(p["sxx"]).reshape(d, d) for p in partials], axis=0)
    mean = sx / n
    cov = (sxx - np.outer(sx, sx) / n) / (n - 1)
    return mean, cov, n


def pca_components(emb: DataFrame, col: str = "embedding", r: int = 4) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Top-r principal axes via eigh on the distributed covariance.
    Returns (mean, components[r, d], explained_variance[r]).
    Sign convention: each component's largest-|coordinate| entry is
    made positive, so results are deterministic up to eigenvalue ties."""
    mean, cov, _ = covariance_matrix(emb, col)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:r]
    comps = vecs[:, order].T
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1
    return mean, comps, vals[order]


def _dot_literal(col: Column, vec: np.ndarray) -> Column:
    lit = F.array(*[F.lit(float(v)) for v in vec])
    return F.aggregate(
        F.zip_with(col, lit, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_project(emb: DataFrame, mean: np.ndarray, comps: np.ndarray, col: str = "embedding") -> DataFrame:
    """Append `pc0..pc{r-1}` columns: (x - mean)·componentᵀ, fully
    JVM-side (components embedded as literal arrays)."""
    out = emb
    offsets = comps @ mean  # scalar per component: comp·mean
    for i, comp in enumerate(comps):
        out = out.withColumn(f"pc{i}", _dot_literal(F.col(col), comp) - F.lit(float(offsets[i])))
    return out


#: Quantization grid for the portable gate: elements are snapped to
#: multiples of 1e-6 BEFORE any accumulation, making every sum an
#: exact integer. ``floor(x*1e6 + 0.5)`` (not ``round``) because floor
#: of a bit-identical double is unambiguous in every engine, while
#: decimal/round casts differ in half-way rounding mode (observed:
#: Spark vs DuckDB disagreed by 1 ulp on one dimension's sum).
_QUANT = 1_000_000


def covariance_entries(emb: DataFrame, col: str = "embedding", dim: int = 64) -> DataFrame:
    """Portable exact covariance of the 1e-6-quantized embeddings as
    (i, j, cov) rows over the upper triangle. Integer accumulation is
    order-independent, so Spark's partial aggregation and a serial SQL
    engine agree bit-for-bit; the quantization keeps entries within
    ~1e-6 of the float covariance (pytest asserts both bounds)."""
    q = F.transform(
        F.col(col), lambda x: F.floor(x.cast("double") * _QUANT + F.lit(0.5))
    )
    pairs = emb.select(q.alias("q")).select(
        F.explode(
            F.flatten(
                F.transform(
                    F.col("q"),
                    lambda xi, i: F.transform(
                        F.col("q"),
                        lambda xj, j: F.struct(
                            i.alias("i"), j.alias("j"), (xi * xj).alias("p")
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p").filter(F.col("j") >= F.col("i"))
    sums = (
        emb.select(F.posexplode(q).alias("i", "x"))
        .groupBy("i")
        .agg(F.sum(F.col("x").cast("decimal(38,0)")).alias("s"))
    )
    agg = pairs.groupBy("i", "j").agg(
        F.sum(F.col("p").cast("decimal(38,0)")).alias("sxy"),
        F.count("*").alias("n"),
    )
    si = sums.select(F.col("i").alias("ii"), F.col("s").alias("sx_i"))
    sj = sums.select(F.col("i").alias("jj"), F.col("s").alias("sx_j"))
    return (
        agg.join(F.broadcast(si), agg.i == si.ii)
        .join(F.broadcast(sj), agg.j == sj.jj)
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            (
                (
                    F.col("sxy").cast("double")
                    - F.col("sx_i").cast("double") * F.col("sx_j").cast("double") / F.col("n")
                )
                / (F.col("n") - 1)
                / F.lit(float(_QUANT) ** 2)
            ).alias("cov"),
        )
        .orderBy("i", "j")
    )
