"""Mergeable frequency / distinct sketches built from first
principles as plain aggregations — count-min sketch (Cormode &
Muthukrishnan 2005) and KMV bottom-k distinct sketch (Bar-Yossef et
al. 2002) — engine-portable via the repo's md5-prefix integer hash
(operators/sampling.py idiom), so the DuckDB oracle reproduces every
bucket, every estimate, bit-for-bit (no hardcoded-TRUE assertions).

Why these two when exact counts exist (operators/heavy.py) and HLL
exists (sketches.py): both are MERGEABLE summaries whose size is
independent of key cardinality —

- a CMS is a (depth × width) integer grid; the sketch of a union is
  the cell-wise SUM of the parts, so per-partition / per-day partial
  sketches roll up with no re-scan. At 100 TB the sketch (a few KB)
  travels; the keys never shuffle.
- a KMV sketch is the k smallest hash values of the key set; the
  sketch of a union is the k smallest of the concatenation, so it
  merges the same way. Estimate: (k−1) · 2^32 / h_k (the k-th
  smallest 32-bit hash), floored — pure integer arithmetic.

Implementation notes: the CMS grid is built with ONE pass —
posexplode of the per-row depth-bucket array, then a groupBy whose
map-side partial aggregation shrinks the shuffle to ≤ depth·width
rows regardless of input size. Estimates for the probe keys join the
(broadcast, tiny) grid. The estimate-vs-exact comparison is emitted
as data (overcount = est − exact ≥ 0 is a CMS theorem; the oracle
recomputes both sides rather than asserting it).

No reference analog; brief-mandated beyond-reference sketch surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table

CMS_DEPTH = 4
CMS_WIDTH = 256
KMV_K = 32
_TWO32 = 4294967296  # 2^32


def _h32(s: Column, salt: str = "") -> Column:
    """Portable 32-bit non-negative integer hash: first 8 hex chars of
    md5, exactly reproducible as
    CAST(CONCAT('0x', SUBSTR(MD5(x), 1, 8)) AS BIGINT) in DuckDB."""
    prefixed = F.concat(F.lit(salt), s) if salt else s
    return F.conv(F.substring(F.md5(prefixed), 1, 8), 16, 10).cast("long")


def cms_grid(keys: DataFrame, key_col: str = "k") -> DataFrame:
    """The count-min grid: (d, bucket, c) with c = number of input
    rows whose depth-d hash lands in the bucket. One scan, one
    partially-aggregated shuffle of ≤ CMS_DEPTH·CMS_WIDTH groups."""
    s = F.col(key_col).cast("string")
    buckets = F.array(
        *[F.pmod(_h32(s, f"{d}|"), F.lit(CMS_WIDTH)) for d in range(CMS_DEPTH)]
    )
    return (
        keys.select(F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_estimate(grid: DataFrame, probes: DataFrame, key_col: str = "k") -> DataFrame:
    """Point-frequency estimates for ``probes[key_col]``: min over
    depths of the probed cell. The grid is broadcast (≤ depth·width
    rows); probes never shuffle.

    LEFT join + coalesce(c, 0): a sparse grid (groupBy emits no row
    for empty cells) must read as 0 for the canonical CMS estimate —
    an inner join would drop an empty cell from the min and erase an
    all-empty (absent) probe key from the output entirely."""
    s = F.col(key_col).cast("string")
    buckets = F.array(
        *[F.pmod(_h32(s, f"{d}|"), F.lit(CMS_WIDTH)) for d in range(CMS_DEPTH)]
    )
    exploded = probes.select(key_col, F.posexplode(buckets).alias("d", "bucket"))
    return (
        exploded.join(F.broadcast(grid), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0).cast("long"))).alias("est_n"))
    )


def cms_grid_weighted(
    key_counts: DataFrame, key_col: str = "k", weight_col: str = "exact_n"
) -> DataFrame:
    """CMS grid from a pre-aggregated (key, count) table — identical
    to ``cms_grid`` over the raw rows (each key contributes its count
    to the same cells), but the explode runs over #distinct-keys rows
    instead of N. The one-scan formulation for when a per-key count
    already exists."""
    s = F.col(key_col).cast("string")
    buckets = F.array(
        *[F.pmod(_h32(s, f"{d}|"), F.lit(CMS_WIDTH)) for d in range(CMS_DEPTH)]
    )
    return (
        key_counts.select(F.col(weight_col), F.posexplode(buckets).alias("d", "bucket"))
        .groupBy("d", "bucket")
        .agg(F.sum(weight_col).alias("c"))
    )


def events_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: CMS frequency estimates for the 10 most-active users,
    side-by-side with exact counts. ``overcount`` (est − exact) is
    ≥ 0 by the CMS one-sided-error theorem; the oracle recomputes the
    identical grid and estimates rather than pinning the bound.

    ONE scan of the fact table: the per-key count aggregate (persisted
    — it is key-cardinality-sized; the session owner releases caches,
    see operators/packing.py contract) feeds BOTH the weighted grid
    build and the exact top-10, so the grid explode runs over
    #distinct-keys rows, not N."""
    events = load_table(spark, "events", sf_dir)
    per_key = (
        events.select(F.col("user_id").alias("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .persist()
    )
    grid = cms_grid_weighted(per_key)
    top = per_key.orderBy(F.col("exact_n").desc(), F.col("k").asc()).limit(10)
    est = cms_estimate(grid, top.select("k"))
    return (
        top.join(est, "k")
        .select(
            F.col("k").alias("user_id"),
            "exact_n",
            "est_n",
            (F.col("est_n") - F.col("exact_n")).alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), F.col("user_id").asc())
    )


EVENTS_CMS_HEAVY_HITTERS_SQL = f"""
WITH keyed AS (
  SELECT CAST(user_id AS VARCHAR) AS ks, user_id AS k FROM events
),
cells AS (
  SELECT d.d,
         CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(d.d, '|', ks)), 1, 8)) AS BIGINT) % {CMS_WIDTH} AS bucket
  FROM keyed, (SELECT UNNEST(RANGE({CMS_DEPTH})) AS d) d
),
grid AS (
  SELECT d, bucket, COUNT(*) AS c FROM cells GROUP BY d, bucket
),
top AS (
  SELECT k, ks, COUNT(*) AS exact_n
  FROM keyed GROUP BY k, ks
  ORDER BY exact_n DESC, k ASC LIMIT 10
),
probe AS (
  SELECT t.k, t.exact_n, d.d,
         CAST(CONCAT('0x', SUBSTR(MD5(CONCAT(d.d, '|', t.ks)), 1, 8)) AS BIGINT) % {CMS_WIDTH} AS bucket
  FROM top t, (SELECT UNNEST(RANGE({CMS_DEPTH})) AS d) d
),
est AS (
  SELECT p.k, p.exact_n, MIN(g.c) AS est_n
  FROM probe p JOIN grid g USING (d, bucket)
  GROUP BY p.k, p.exact_n
)
SELECT k AS user_id, exact_n, est_n, est_n - exact_n AS overcount
FROM est
ORDER BY exact_n DESC, user_id ASC
"""


N_SALTS = 64


def _kth_smallest(hashed: DataFrame, group_cols: list[str], k: int) -> DataFrame:
    """Per-group k-th smallest ``h`` WITHOUT sorting a whole group in
    one task: stage 1 keeps each (group, h % N_SALTS) sub-partition's
    k smallest (the sketch's own merge law — the true k minima all
    survive, since each salt retains its local k minima), stage 2
    ranks the ≤ k·N_SALTS survivors per group. A group with a billion
    distinct keys sorts N_SALTS ways in parallel; the second window
    touches a bounded candidate set. Returns (group…, hk) with hk
    null when the group holds < k values."""
    from pyspark.sql import Window

    salt = F.pmod(F.col("h"), F.lit(N_SALTS))
    w1 = Window.partitionBy(*group_cols, salt).orderBy(F.col("h").asc())
    cand = (
        hashed.withColumn("__rn1", F.row_number().over(w1))
        .filter(F.col("__rn1") <= k)
        .drop("__rn1")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(F.col("h").asc())
    return (
        cand.withColumn("__rn2", F.row_number().over(w2))
        .groupBy(*group_cols)
        .agg(F.min(F.when(F.col("__rn2") == k, F.col("h"))).alias("hk"))
    )


def kmv_distinct(keys: DataFrame, group_col: str, key_col: str, k: int = KMV_K) -> DataFrame:
    """Per-group KMV distinct-count estimate: keep the k smallest
    32-bit hashes of the DISTINCT keys; estimate (k−1)·2^32/h_k.
    Groups holding < k distinct keys report their exact count (the
    sketch IS the key set there). Pure integer arithmetic throughout.
    The k-th-smallest search is the salted two-stage form
    (`_kth_smallest`) — no per-group single-task sort at any
    cardinality."""
    d = keys.select(group_col, key_col).distinct()
    hashed = d.select(
        group_col, _h32(F.col(key_col).cast("string")).alias("h")
    )
    per_group = (
        d.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("n_distinct"))
        .join(_kth_smallest(hashed, [group_col], k), group_col, "left")
    )
    # GREATEST(hk, 1): h = 0 is a 2^-32 corner, but bare division
    # would split the engines (Spark null vs DuckDB inf) — pin it.
    est = F.when(
        F.col("hk").isNotNull(),
        F.floor(F.lit((k - 1) * _TWO32) / F.greatest(F.col("hk"), F.lit(1))).cast("long"),
    ).otherwise(F.col("n_distinct"))
    return per_group.select(
        group_col,
        F.col("n_distinct").alias("exact_distinct"),
        est.alias("kmv_est"),
    )


def events_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-event-type distinct-user estimate via the KMV
    bottom-k sketch, next to the exact distinct count."""
    events = load_table(spark, "events", sf_dir)
    return kmv_distinct(events, "event_type", "user_id").orderBy("event_type")


EVENTS_KMV_DISTINCT_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
),
hashed AS (
  SELECT event_type,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM d
),
ranked AS (
  SELECT event_type, h,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
  FROM hashed
),
per_group AS (
  SELECT event_type, COUNT(*) AS n_distinct,
         MIN(CASE WHEN rn = {KMV_K} THEN h END) AS hk
  FROM ranked GROUP BY event_type
)
SELECT event_type,
       n_distinct AS exact_distinct,
       CASE WHEN hk IS NOT NULL
            THEN CAST(FLOOR({(KMV_K - 1) * _TWO32} / GREATEST(hk, 1)) AS BIGINT)
            ELSE n_distinct END AS kmv_est
FROM per_group
ORDER BY event_type
"""


def events_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: audience-overlap estimation between event types via KMV
    set algebra — est(A∩B) = est(A) + est(B) − est(A∪B), where the
    union estimate comes from the MERGED sketch (k smallest hashes of
    the concatenation). This is the set operation HLL cannot do
    directly, and the reason bottom-k sketches earn their place next
    to it: intersection/difference cardinalities of segment audiences
    from KB-sized summaries, no raw-data rescans.

    Shape: one distinct + hash pass over (type, user); the per-pair
    union sketch re-ranks the two types' hash streams TOGETHER (rows
    explode by the type-pair vocabulary C(T,2) — bounded by the type
    domain, never by users); exact overlaps ride along from a
    user-keyed self-join of the same distinct table. Estimates clamp
    at 0 (inclusion-exclusion on sketches can go slightly negative).
    Everything is the same portable integer arithmetic as
    ``kmv_distinct``, so the oracle rebuilds it bit-for-bit.
    """
    from pyspark.sql import Window

    events = load_table(spark, "events", sf_dir)
    d = events.select("event_type", "user_id").distinct()
    hashed = d.select(
        "event_type",
        "user_id",
        _h32(F.col("user_id").cast("string")).alias("h"),
    )
    per_type = kmv_distinct(events, "event_type", "user_id")

    # Type-pair spine (vocabulary-sized), then each (type, user, h)
    # row joins into every pair its type belongs to.
    types = d.select("event_type").distinct()
    pairs = (
        types.select(F.col("event_type").alias("ta"))
        .crossJoin(types.select(F.col("event_type").alias("tb")))
        .filter(F.col("ta") < F.col("tb"))
    )
    members = hashed.join(
        pairs, (F.col("event_type") == F.col("ta")) | (F.col("event_type") == F.col("tb"))
    ).select("ta", "tb", "user_id", "h")
    # Union sketch per pair: distinct users first (a user active in
    # BOTH types must count once), then the k-th smallest hash via the
    # salted two-stage search (no per-pair single-task sort).
    unioned = members.select("ta", "tb", "user_id", "h").distinct()
    union_stats = (
        unioned.groupBy("ta", "tb")
        .agg(F.count(F.lit(1)).alias("n_union"))
        .join(_kth_smallest(unioned, ["ta", "tb"], KMV_K), ["ta", "tb"], "left")
        .select(
            "ta",
            "tb",
            F.when(
                F.col("hk").isNotNull(),
                F.floor(
                    F.lit((KMV_K - 1) * _TWO32) / F.greatest(F.col("hk"), F.lit(1))
                ).cast("long"),
            )
            .otherwise(F.col("n_union"))
            .alias("est_union"),
        )
    )
    exact = (
        d.alias("x")
        .join(d.alias("y"), "user_id")
        .filter(F.col("x.event_type") < F.col("y.event_type"))
        .groupBy(
            F.col("x.event_type").alias("ta"), F.col("y.event_type").alias("tb")
        )
        .agg(F.count(F.lit(1)).alias("exact_overlap"))
    )
    ea = per_type.select(
        F.col("event_type").alias("ta"), F.col("kmv_est").alias("est_a")
    )
    eb = per_type.select(
        F.col("event_type").alias("tb"), F.col("kmv_est").alias("est_b")
    )
    return (
        exact.join(union_stats, ["ta", "tb"])
        .join(F.broadcast(ea), "ta")
        .join(F.broadcast(eb), "tb")
        .select(
            F.col("ta").alias("type_a"),
            F.col("tb").alias("type_b"),
            "exact_overlap",
            F.greatest(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), F.lit(0)
            ).alias("kmv_est_overlap"),
        )
        .orderBy("type_a", "type_b")
    )


EVENTS_KMV_OVERLAP_SQL = f"""
WITH d AS (
  SELECT DISTINCT event_type, user_id FROM events
),
hashed AS (
  SELECT event_type, user_id,
         CAST(CONCAT('0x', SUBSTR(MD5(CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
  FROM d
),
per_type AS (
  SELECT event_type,
         COUNT(*) AS n_distinct,
         MIN(CASE WHEN rn = {KMV_K} THEN h END) AS hk
  FROM (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h ASC) AS rn
    FROM hashed
  ) GROUP BY event_type
),
est_type AS (
  SELECT event_type,
         CASE WHEN hk IS NOT NULL
              THEN CAST(FLOOR({(KMV_K - 1) * _TWO32} / GREATEST(hk, 1)) AS BIGINT)
              ELSE n_distinct END AS est
  FROM per_type
),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM (SELECT DISTINCT event_type FROM d) a,
       (SELECT DISTINCT event_type FROM d) b
  WHERE a.event_type < b.event_type
),
members AS (
  SELECT DISTINCT p.ta, p.tb, h.user_id, h.h
  FROM hashed h JOIN pairs p ON h.event_type = p.ta OR h.event_type = p.tb
),
union_stats AS (
  SELECT ta, tb,
         COUNT(*) AS n_union,
         MIN(CASE WHEN rn = {KMV_K} THEN h END) AS hk
  FROM (
    SELECT ta, tb, h,
           ROW_NUMBER() OVER (PARTITION BY ta, tb ORDER BY h ASC) AS rn
    FROM members
  ) GROUP BY ta, tb
),
est_union AS (
  SELECT ta, tb,
         CASE WHEN hk IS NOT NULL
              THEN CAST(FLOOR({(KMV_K - 1) * _TWO32} / GREATEST(hk, 1)) AS BIGINT)
              ELSE n_union END AS est_union
  FROM union_stats
),
exact AS (
  SELECT x.event_type AS ta, y.event_type AS tb, COUNT(*) AS exact_overlap
  FROM d x JOIN d y ON x.user_id = y.user_id AND x.event_type < y.event_type
  GROUP BY 1, 2
)
SELECT e.ta AS type_a, e.tb AS type_b, e.exact_overlap,
       GREATEST(ea.est + eb.est - u.est_union, 0) AS kmv_est_overlap
FROM exact e
JOIN est_union u USING (ta, tb)
JOIN est_type ea ON ea.event_type = e.ta
JOIN est_type eb ON eb.event_type = e.tb
ORDER BY type_a, type_b
"""
