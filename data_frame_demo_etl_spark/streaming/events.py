"""Structured Streaming operators over the `events` schema, plus their
batch-equivalent forms used by the correctness gate.

The batch/streaming split is deliberate: the windowed aggregation is
the same logical plan in both modes (Spark unifies them), so the gate
verifies the batch form against DuckDB while the streaming tests run
the identical transformation through a file-source → memory-sink
stream with a watermark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.temporal import epoch_seconds
from ..sources.catalog import load_table

SESSION_GAP_MIN = 30


def windowed_event_stats(events: DataFrame, window_len: str = "1 hour") -> DataFrame:
    """Tumbling-window counts and value sums per event_type.

    Works identically on a batch DataFrame and a streaming DataFrame
    (add ``with_watermark`` upstream for streams).
    """
    return (
        events.groupBy(F.window("ts", window_len), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def with_watermark(stream: DataFrame, delay: str = "10 minutes") -> DataFrame:
    """Late-data bound: state for windows older than max(ts)-delay is
    finalized and dropped — this is what keeps streaming state finite
    on an unbounded stream."""
    return stream.withWatermark("ts", delay)


def sessionize(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Batch sessionization: a new session starts when the gap from the
    user's previous event exceeds `gap_minutes`. One shuffle (the
    per-user window); the cumulative sum stays within partitions.

    Total ordering via (ts, event_id) makes results reproducible even
    with duplicate timestamps.
    """
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    gap_sec = gap_minutes * 60
    prev_ts = F.lag("ts").over(w)
    # Compare epoch seconds as double (microsecond-exact in IEEE754 at
    # this magnitude) — integer unix_timestamp would truncate subsecond
    # gaps. epoch_seconds handles TIMESTAMP_NTZ inputs too.
    is_new = F.when(
        prev_ts.isNull()
        | ((epoch_seconds(F.col("ts")) - epoch_seconds(prev_ts)) > gap_sec),
        1,
    ).otherwise(0)
    with_session = events.withColumn(
        "session_id",
        F.sum(is_new).over(
            Window.partitionBy("user_id").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("value_sum"),
        )
    )


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream with the events schema (one file = one
    micro-batch in tests).

    The ts physical type varies across dataset generations (legacy
    TIMESTAMP(NANOS) reads as long under nanosAsLong; current files
    carry TIMESTAMP_NTZ), so probe the batch reader's raw schema and
    declare the matching stream schema — a streaming source cannot
    infer it. The nanosAsLong flag is only needed for the schema
    probe, so the previous value is restored afterwards (it would
    otherwise silently turn every later TIMESTAMP(NANOS) parquet read
    in the session into bigint)."""
    _FLAG = "spark.sql.legacy.parquet.nanosAsLong"
    prev = spark.conf.get(_FLAG, None)
    spark.conf.set(_FLAG, "true")
    try:
        raw_ts = dict(spark.read.parquet(f"{sf_dir}/events.parquet").dtypes)["ts"]
    finally:
        if prev is None:
            spark.conf.unset(_FLAG)
        else:
            spark.conf.set(_FLAG, prev)
    if raw_ts == "bigint":
        # The stream itself must read under the flag too; re-set it
        # for the lifetime of this legacy-format stream (documented
        # session-wide effect, legacy datasets only).
        spark.conf.set(_FLAG, "true")
    raw = (
        spark.readStream.schema(
            f"event_id long, ts {raw_ts}, user_id long, event_type string,"
            " value double, props string"
        )
        .format("parquet")
        .option("path", f"{sf_dir}")
        .option("pathGlobFilter", "events.parquet")
        .load()
    )
    if raw_ts == "bigint":
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif raw_ts == "timestamp_ntz":
        # Normalize ts to LTZ for uniform epoch arithmetic and
        # batch/stream type parity (session tz is UTC so wall-clock
        # values are unchanged; watermarks themselves accept NTZ).
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp_ltz"))
    return raw


def user_event_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ordered action sequences (the training-sequence /
    session-modeling primitive): collect each user's event types in
    (ts, event_id) order into a single delimited string.

    `sort_array(collect_list(struct(...)))` keeps ordering inside the
    aggregate — one shuffle, no window pass."""
    events = load_table(spark, "events", sf_dir)
    seq = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("ts", "event_id", "event_type"))),
            lambda x: x["event_type"],
        ),
        ">",
    )
    return (
        events.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), seq.alias("sequence"))
        .orderBy("user_id")
    )


USER_EVENT_SEQUENCES_SQL = """
SELECT user_id, COUNT(*) AS n_events,
       STRING_AGG(event_type, '>' ORDER BY ts, event_id) AS sequence
FROM events
GROUP BY user_id
ORDER BY user_id
"""


def events_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON column processing: extract typed fields from the props
    JSON string with get_json_object (codegen'd JVM path)."""
    events = load_table(spark, "events", sf_dir)
    return (
        events.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .orderBy("event_id")
    )


EVENTS_PROPS_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
ORDER BY event_id
"""


def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing through Spark 4's VARIANT type:
    build a nested JSON document per event, `parse_json` it into a
    variant, then `variant_get` typed paths back out — a nested
    object field, an array index, and a top-level string. The oracle
    states the same identities relationally, proving the whole
    construct → parse → shred loop lossless. (VARIANT is the
    at-scale answer for ragged event payloads: parsed once, shredded
    columnar, no per-query JSON string re-parsing.)"""
    events = load_table(spark, "events", sf_dir)
    doc = F.to_json(
        F.struct(
            F.col("event_type").alias("type"),
            F.struct(F.col("user_id").alias("user_id")).alias("meta"),
            F.array(F.col("event_id"), F.col("event_id") * 2).alias("ids"),
        )
    )
    v = F.parse_json(doc)
    return events.select(
        "event_id",
        F.variant_get(v, "$.meta.user_id", "bigint").alias("meta_user"),
        F.variant_get(v, "$.ids[1]", "bigint").alias("second_id"),
        F.variant_get(v, "$.type", "string").alias("type"),
    ).orderBy("event_id")


EVENTS_VARIANT_EXTRACT_SQL = """
SELECT event_id,
       user_id AS meta_user,
       event_id * 2 AS second_id,
       event_type AS type
FROM events
ORDER BY event_id
"""


# --- gate queries ---------------------------------------------------------

def events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window counts/sums per event_type (streaming-equivalent batch oracle)."""
    events = load_table(spark, "events", sf_dir)
    return windowed_event_stats(events).orderBy("window_start", "event_type")


EVENTS_WINDOWED_SQL = """
SELECT
  TIME_BUCKET(INTERVAL '1 hour', ts) AS window_start,
  TIME_BUCKET(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
  event_type,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity) with per-session aggregates."""
    events = load_table(spark, "events", sf_dir)
    return sessionize(events).orderBy("user_id", "session_id")


EVENTS_SESSIONIZE_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {SESSION_GAP_MIN * 60}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, event_id, ts, value,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM flagged
)
SELECT user_id, session_id,
  COUNT(*) AS n_events,
  MIN(ts) AS session_start,
  MAX(ts) AS session_end,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS value_sum
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


def stream_dedup(
    stream: DataFrame,
    keys: list[str] | None = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps a key's fingerprint only
    until the watermark passes it, so state is O(keys per watermark
    window), not O(all keys ever) — the difference between a pipeline
    that runs forever at 100 TB/day and one that OOMs. Duplicates
    arriving within the watermark delay are suppressed; a re-arrival
    later than the delay is treated as new (the documented trade of
    bounded state).

    Batch equivalent (for oracles/backfills): ``operators.dedupe``.
    """
    keyed = stream.withWatermark("ts", delay)
    return keyed.dropDuplicatesWithinWatermark(keys or ["event_id"])


def sliding_event_stats(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Sliding (hopping) window aggregate: each event lands in
    window/slide overlapping windows (4 here). `F.window` with a
    slide duration is the Structured-Streaming-compatible form — the
    identical expression works under readStream with a watermark.
    Decimal event-value sums keep the aggregate engine-exact."""
    return (
        events.groupBy(F.window("ts", window, slide), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n_events",
            "value_sum",
        )
    )


def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    return sliding_event_stats(events).orderBy("window_start", "event_type")


# Oracle: replicate each event into its ceil(window/slide) = 4
# overlapping windows via an explicit offset series, then aggregate.
EVENTS_SLIDING_WINDOW_SQL = """
WITH replicated AS (
  SELECT
    TIME_BUCKET(INTERVAL '15 minutes', ts) - k * INTERVAL '15 minutes' AS window_start,
    event_type, value
  FROM events,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS k)
)
SELECT window_start,
       window_start + INTERVAL '1 hour' AS window_end,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS value_sum
FROM replicated
GROUP BY 1, 2, 3
ORDER BY window_start, event_type
"""


def enrich_with_dim(stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str) -> DataFrame:
    """Stream-static enrichment join — the standard streaming
    dimension-lookup pattern. The static side is re-read per
    micro-batch by Structured Streaming (so slowly-changing dims pick
    up updates) and explicitly broadcast: no state store, no
    watermark needed for an inner equi-join against a static side,
    and at cluster scale the stream side never shuffles."""
    from pyspark.sql import functions as F

    return stream.join(F.broadcast(dim), stream[stream_key] == dim[dim_key], "inner")


def idempotent_batch_writer(base_path: str):
    """foreachBatch sink with replay-safe (exactly-once) semantics:
    each micro-batch overwrites its OWN ``batch_id=N`` directory, so a
    post-failure replay of the same epoch rewrites identical data
    instead of appending duplicates — the standard parquet
    exactly-once recipe when the sink itself is not transactional.
    Use with ``.writeStream.foreachBatch(idempotent_batch_writer(p))``.
    """

    def write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{base_path}/batch_id={batch_id}")

    return write


def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE `session_window` — the
    built-in counterpart to the lag/cumsum formulation above (and the
    structure `applyInPandasWithState` replaces in streams). Boundary
    semantics differ from `sessionize` by design: a session window is
    [first_ts, last_ts + gap), and windows that TOUCH merge: an event
    landing exactly at a prior window's close continues the session,
    so the split condition is gap > 30 min — measured (test_streaming
    pins the boundary) and identical to the lag formulation; the two
    implementations agree on every input."""
    events = load_table(spark, "events", sf_dir)
    sw = F.session_window("ts", "30 minutes")
    return (
        events.groupBy("user_id", sw.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 4)
            .cast("double")
            .alias("value_sum"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_close"),
            "n_events",
            "value_sum",
        )
        .orderBy("user_id", "session_start")
    )


EVENTS_SESSION_WINDOW_SQL = """
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > 1800
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, value,
    SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
  MIN(ts) AS session_start,
  MAX(ts) + INTERVAL 30 MINUTE AS session_close,
  COUNT(*) AS n_events,
  CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 4) AS DOUBLE) AS value_sum
FROM sessions
GROUP BY user_id, sid
ORDER BY user_id, session_start
"""


def stream_stream_interval_join(
    views: DataFrame,
    purchases: DataFrame,
    max_delay: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """ST11: stream-stream INNER join with event-time interval bounds
    — every (view, purchase) pair of the same user where the purchase
    lands within ``max_delay`` after the view. The genuine two-stream
    join (not the stream-static enrichment of ST6): both sides carry
    watermarks, and the range predicate is what lets Spark BOUND each
    side's join state — a view can be dropped from state once the
    purchase-side watermark passes view_ts + max_delay, a purchase
    once the view-side watermark passes purchase_ts. Without the time
    bound the state is unbounded and Spark (correctly) refuses
    append-mode output.

    ``how="left_outer"`` keeps views with NO purchase in the window
    (purchase columns null) — conversion attribution with explicit
    non-converters. Streaming left-outer emission is WATERMARK-GATED:
    an unmatched view emits only once the watermark passes
    view_ts + max_delay (before that a matching purchase could still
    arrive), so at query stop the trailing views inside the final
    watermark horizon remain unemitted — the exact expectation the
    parity test encodes (batch nulls restricted to
    view_ts + max_delay < max_event_ts − watermark_delay).

    Works identically on batch inputs (the watermark is a no-op
    there; left_outer is a plain left join), which is what the
    oracle-backed batch gate below runs."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("view_ts"),
    )
    if v.isStreaming:
        v = v.withWatermark("view_ts", watermark)
    p = purchases.select(
        F.col("user_id").alias("__p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    if p.isStreaming:
        p = p.withWatermark("purchase_ts", watermark)
    return v.join(
        p,
        (F.col("user_id") == F.col("__p_user"))
        & (F.col("purchase_ts") >= F.col("view_ts"))
        & (F.col("purchase_ts") <= F.col("view_ts") + F.expr(f"INTERVAL {max_delay}")),
        how,
    ).select("user_id", "view_id", "view_ts", "purchase_id", "purchase_ts")


def events_view_purchase_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the batch shape of the ST11 stream-stream interval join —
    all (view, purchase) pairs of one user within 30 minutes, plus the
    integer-seconds delay. The streaming form of the SAME function is
    pinned to this batch result in pytest (file stream → memory sink,
    availableNow)."""
    from ..sources.catalog import load_table

    events = load_table(spark, "events", sf_dir)
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    out = stream_stream_interval_join(views, purchases)
    return out.select(
        "user_id",
        "view_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts"))
        .alias("delay_us")
        .cast("long"),
    ).orderBy("user_id", "view_id", "purchase_id")


EVENTS_VIEW_PURCHASE_INTERVAL_JOIN_SQL = """
SELECT v.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       CAST(EPOCH_US(p.ts) - EPOCH_US(v.ts) AS BIGINT) AS delay_us
FROM events v
JOIN events p
  ON p.user_id = v.user_id
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 30 MINUTE
WHERE v.event_type = 'view' AND p.event_type = 'purchase'
ORDER BY v.user_id, view_id, purchase_id
"""


# ─────────────── ST13: session summary statistics ───────────────


def session_stats(events: DataFrame, gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """One-row corpus summary over `sessionize`'s session table — the
    product-health dashboard numbers (bounce rate, session depth and
    length) a team reads before any per-session drill-down.

    Exact integers: bounce/mean are integral ppm/micro divisions;
    depth and duration quantiles use the cadence convention (smallest
    value whose cumulative count clears q% — exact cross-
    multiplication) over VALUE-DOMAIN tables (distinct depths /
    distinct whole-second durations), whose single-partition ordered
    windows are bounded by the value domain, not the corpus — the
    survival.py duration-table argument.

    Shape: sessionize's one per-user window + session groupBy, then
    two domain-sized aggregations."""
    sess = sessionize(events, gap_minutes).select(
        "n_events",
        F.floor(
            epoch_seconds(F.col("session_end")) - epoch_seconds(F.col("session_start"))
        )
        .cast("long")
        .alias("dur_s"),
    )
    base = sess.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("n_events").alias("total_events"),
        F.count_if(F.col("n_events") == 1).alias("bounces"),
    )

    def _q(dom: DataFrame, col: str, qs: tuple[int, ...]) -> DataFrame:
        cnt = dom.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        w_pre = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, 0)
        laid = cnt.withColumn("cum", F.sum("c").over(w_pre)).withColumn(
            "t", F.sum("c").over(Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing))
        )
        return laid.agg(
            *[
                F.min(F.when(F.col("cum") * 100 >= F.col("t") * q, F.col(col)))
                .cast("long")
                .alias(f"p{q}_{col}")
                for q in qs
            ]
        )

    depth = _q(sess, "n_events", (50, 90))
    dur = _q(sess, "dur_s", (50, 90))
    return (
        base.crossJoin(F.broadcast(depth))
        .crossJoin(F.broadcast(dur))
        .select(
            F.col("n_sessions").cast("long").alias("n_sessions"),
            F.col("total_events").cast("long").alias("total_events"),
            F.expr("cast((bounces * 1000000) div n_sessions as long)").alias("bounce_ppm"),
            F.expr("cast((total_events * 1000000) div n_sessions as long)").alias(
                "mean_events_micro"
            ),
            "p50_n_events",
            "p90_n_events",
            "p50_dur_s",
            "p90_dur_s",
        )
    )


def events_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: corpus session summary (bounce rate, depth/length quantiles)."""
    events = load_table(spark, "events", sf_dir)
    return session_stats(events)


EVENTS_SESSION_STATS_SQL = f"""
WITH flagged AS (
  SELECT user_id, event_id, ts,
    CASE WHEN LAG(ts) OVER w IS NULL
           OR EPOCH(ts) - EPOCH(LAG(ts) OVER w) > {{gap}}
         THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id,
    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_id,
    ts
  FROM flagged
),
sess AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
         CAST(FLOOR(EPOCH(MAX(ts)) - EPOCH(MIN(ts))) AS BIGINT) AS dur_s
  FROM sessions GROUP BY user_id, session_id
),
base AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
         CAST(SUM(n_events) AS BIGINT) AS total_events,
         CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS bounces
  FROM sess
),
dd AS (
  SELECT n_events AS v, COUNT(*) AS c FROM sess GROUP BY 1
),
dl AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS t FROM dd
),
depth AS (
  SELECT CAST(MIN(CASE WHEN cum * 100 >= t * 50 THEN v END) AS BIGINT) AS p50_n_events,
         CAST(MIN(CASE WHEN cum * 100 >= t * 90 THEN v END) AS BIGINT) AS p90_n_events
  FROM dl
),
ud AS (
  SELECT dur_s AS v, COUNT(*) AS c FROM sess GROUP BY 1
),
ul AS (
  SELECT v, SUM(c) OVER (ORDER BY v) AS cum, SUM(c) OVER () AS t FROM ud
),
dur AS (
  SELECT CAST(MIN(CASE WHEN cum * 100 >= t * 50 THEN v END) AS BIGINT) AS p50_dur_s,
         CAST(MIN(CASE WHEN cum * 100 >= t * 90 THEN v END) AS BIGINT) AS p90_dur_s
  FROM ul
)
SELECT n_sessions, total_events,
       CAST((bounces * 1000000) // n_sessions AS BIGINT) AS bounce_ppm,
       CAST((total_events * 1000000) // n_sessions AS BIGINT) AS mean_events_micro,
       p50_n_events, p90_n_events, p50_dur_s, p90_dur_s
FROM base CROSS JOIN depth CROSS JOIN dur
""".replace("{gap}", str(SESSION_GAP_MIN * 60))


def windowed_topk_types(events: DataFrame, k: int = 3) -> DataFrame:
    """Top-k event types per tumbling 1-hour window by count (ties →
    type ASC) — the 'trending now' per-window leaderboard. Batch form
    of the streaming pattern: windowed counts are a supported
    streaming aggregation; the rank is applied per micro-batch (or on
    the complete-mode sink), so stream and batch share this exact
    logical plan up to the rank (pinned stream==batch in pytest).

    Scale: one map-side-combined (window, type) count agg; the rank
    window partitions by window_start over the type vocabulary —
    bounded rows per partition by construction."""
    from pyspark.sql import Window

    counts = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
        )
    )
    rk = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), F.col("event_type").asc()
    )
    return (
        counts.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= k)
        .select("window_start", F.col("rk").cast("int").alias("rk"), "event_type", "n_events")
    )


def events_windowed_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (ST14): hourly top-3 event types by count."""
    events = load_table(spark, "events", sf_dir)
    return windowed_topk_types(events).orderBy("window_start", "rk")


EVENTS_WINDOWED_TOPK_SQL = """
WITH counts AS (
  SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS window_start,
         event_type,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM events
  GROUP BY 1, 2
)
SELECT window_start, rk, event_type, n_events FROM (
  SELECT window_start, event_type, n_events,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY window_start ORDER BY n_events DESC, event_type ASC
         ) AS INTEGER) AS rk
  FROM counts
) WHERE rk <= 3
ORDER BY window_start, rk
"""
