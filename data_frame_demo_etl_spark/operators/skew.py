"""Join-key skew diagnostics — the triage you run BEFORE a big join.

At 100 TB the difference between a 10-minute and a 10-hour join is
usually one hot key. This profiler answers the questions that decide
the mitigation (broadcast? salt? AQE skew split? isolate-and-union?):
how many distinct keys, how big is the heaviest, how heavy is the
tail, what share of all rows do the top keys hold.

One groupBy over the key (the same shuffle the join would do, minus
the payload), then bounded aggregates over the (keys-sized) count
table. Exact integer arithmetic throughout: percentile key-counts are
discrete order statistics at integer row positions — no
interpolation, so any engine agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOP_N = 5


def key_skew_profile(df: DataFrame, key_col: str, top_n: int = TOP_N) -> DataFrame:
    """One-row skew report for a prospective join/groupBy key:
    (n_rows, n_keys, max_count, p50_count, p99_count, top_share)
    where top_share = fraction of all rows held by the top_n keys,
    rounded to 6dp from exact integers."""
    counts = df.groupBy(F.col(key_col).alias("k")).agg(F.count(F.lit(1)).alias("c"))
    w = Window.orderBy(F.col("c").asc(), F.col("k").asc())
    ranked = counts.select(
        "c", F.row_number().over(w).alias("rn")
    ).persist()
    n_keys = F.max("rn")
    # discrete order statistics at ceil(q*n) positions (exact, no
    # interpolation) — evaluated via conditional aggregation
    stats = ranked.agg(
        F.sum("c").alias("n_rows"),
        n_keys.alias("n_keys"),
        F.max("c").alias("max_count"),
    ).collect()[0]
    n = int(stats["n_keys"])
    p50_pos, p99_pos = max(1, -(-50 * n // 100)), max(1, -(-99 * n // 100))
    quantiles = ranked.filter(F.col("rn").isin(p50_pos, p99_pos)).collect()
    qmap = {r["rn"]: r["c"] for r in quantiles}
    top_sum = (
        ranked.orderBy(F.col("rn").desc())
        .limit(top_n)
        .agg(F.sum("c").alias("t"))
        .collect()[0]["t"]
    )
    spark = df.sparkSession
    ranked.unpersist()
    return spark.createDataFrame(
        [
            (
                int(stats["n_rows"]),
                n,
                int(stats["max_count"]),
                int(qmap[p50_pos]),
                int(qmap[p99_pos]),
                # FLOOR(x*1e6+0.5)/1e6, not round(): python round()
                # is banker's, SQL ROUND is half-away — the grid
                # idiom sidesteps both
                int(int(top_sum) / int(stats["n_rows"]) * 1_000_000 + 0.5) / 1_000_000,
            )
        ],
        "n_rows long, n_keys long, max_count long, p50_count long, p99_count long, top_share double",
    )


def lineitem_key_skew(spark, sf_dir: str) -> DataFrame:
    """Gate: skew profile of lineitem.l_partkey — the canonical
    fact-table join key."""
    from ..sources.catalog import load_table

    return key_skew_profile(load_table(spark, "lineitem", sf_dir), "l_partkey")


LINEITEM_KEY_SKEW_SQL = f"""
WITH counts AS (
  SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_partkey
),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c ASC, k ASC) AS rn FROM counts
),
tot AS (
  SELECT CAST(SUM(c) AS BIGINT) AS n_rows, CAST(MAX(rn) AS BIGINT) AS n_keys,
         CAST(MAX(c) AS BIGINT) AS max_count
  FROM ranked
),
topn AS (
  SELECT CAST(SUM(c) AS BIGINT) AS t FROM (
    SELECT c FROM ranked ORDER BY rn DESC LIMIT {TOP_N}
  )
)
SELECT t1.n_rows, t1.n_keys, t1.max_count,
  (SELECT CAST(c AS BIGINT) FROM ranked
   WHERE rn = GREATEST(1, CAST(CEIL(50 * t1.n_keys / 100.0) AS BIGINT))) AS p50_count,
  (SELECT CAST(c AS BIGINT) FROM ranked
   WHERE rn = GREATEST(1, CAST(CEIL(99 * t1.n_keys / 100.0) AS BIGINT))) AS p99_count,
  FLOOR(topn.t / CAST(t1.n_rows AS DOUBLE) * 1000000 + 0.5) / 1000000 AS top_share
FROM tot t1 CROSS JOIN topn
"""


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | list[str],
    n_salts: int = 8,
    how: str = "inner",
    salt_col: str | None = None,
) -> DataFrame:
    """Skew-mitigating equi-join for BIG ⋈ BIG shapes where one key is
    hot (the mitigation `key_skew_profile` above tells you to apply —
    and the one AQE's skew-split can't do when the skew is inside a
    single key's hash partition on BOTH sides).

    The `small` side is replicated ``n_salts``× (explode over the salt
    range); the `big` side scatters each row onto ONE deterministic
    salt (xxhash64 of the full row, mod n_salts), so a key holding
    10⁹ rows lands on n_salts reducers instead of one. Joining on
    (key, salt) then yields EXACTLY the rows of the unsalted join:
    every big row still sees every matching small row, once.

    Supported: ``inner`` and ``left`` (each big row carries exactly
    one salt, so multiplicity is preserved). ``right``/``full`` would
    duplicate unmatched small rows n_salts× and are rejected.

    Scale notes: replication costs n_salts × |small| shuffle volume —
    choose n_salts ≈ (hot-key rows / target-partition rows), and keep
    `small` the genuinely smaller side. If `small` fits in memory,
    broadcast it instead; salting is for the band where neither side
    broadcasts but one key dominates.

    Salt-derivation corner: the salt is ``xxhash64`` over the FULL
    big-side row, so BYTE-IDENTICAL duplicate rows all hash to the
    same salt — a degenerate corpus made of one repeated row defeats
    the split (all copies land on one reducer). That shape doesn't
    occur in the fact tables this targets (some column — order key,
    line number, timestamp — always varies); if yours differs, pass
    ``salt_col`` naming a big-side column with distinct-ish values
    (a row id, an offset) and the salt hashes that column alone.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    salts = F.array(*[F.lit(i) for i in range(n_salts)])
    small_rep = small.withColumn("__salt", F.explode(salts))
    salt_src = [F.col(salt_col)] if salt_col else [F.col(c) for c in big.columns]
    big_salted = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*salt_src), F.lit(n_salts)).cast("int"),
    )
    return big_salted.join(small_rep, on=keys + ["__salt"], how=how).drop("__salt")
