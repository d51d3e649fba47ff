"""Correctness-gate wrappers: each exercises a real operator API from
this package against the synthetic tables, paired with a DuckDB oracle.
These are what the driver runs side-by-side at sf0.01.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from . import combine, dedupe, transform
from .profile import column_stats_df, profile_metrics_df
from .query_builder import Filter, OrGroup, QuerySpec
from .validate import coerce_field_types

# --- T1 unpivot -----------------------------------------------------------

def unpivot_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide->long unpivot/melt of part attributes (native DataFrame.unpivot)."""
    part = load_table(spark, "part", sf_dir)
    return transform.unpivot(
        part.select("p_partkey", "p_name", "p_size", "p_retailprice"),
        id_vars=["p_partkey", "p_name"],
        value_vars=["p_size", "p_retailprice"],
        var_name="metric",
        value_name="value",
    ).orderBy("p_partkey", "metric")


UNPIVOT_PART_SQL = """
SELECT p_partkey, p_name, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
UNION ALL
SELECT p_partkey, p_name, 'p_retailprice' AS metric, CAST(p_retailprice AS DOUBLE) AS value FROM part
ORDER BY p_partkey, metric
"""


# --- T5-T8 cleaning chain -------------------------------------------------

def clean_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build deliberately messy columns from `part`, then run the
    cleaning operators (trim, strip-thousands, date coercion, numeric
    coercion with fill)."""
    part = load_table(spark, "part", sf_dir)
    messy = part.select(
        "p_partkey",
        F.concat(F.lit("  "), F.col("p_name"), F.lit("  ")).alias("name_clean"),
        F.concat(
            F.col("p_partkey").cast("string"),
            F.lit(","),
            F.lpad(F.col("p_size").cast("string"), 2, "0"),
        ).alias("amount"),
        F.concat(
            F.lit("2024-01-"),
            F.lpad(((F.col("p_size") % 28) + 1).cast("string"), 2, "0"),
        ).alias("report_date"),
        F.when(F.col("p_partkey") % 5 == 0, F.lit("not_a_number"))
        .otherwise(F.col("p_retailprice").cast("string"))
        .alias("sales_amount"),
    )
    cleaned = transform.trim_strings(messy, ["name_clean"])
    cleaned = transform.strip_thousands(cleaned, ["amount"])
    cleaned = cleaned.withColumn("amount", F.col("amount").try_cast("double"))
    cleaned = transform.coerce_date(cleaned, "report_date", drop_unparseable=True)
    cleaned = transform.coerce_numeric(cleaned, "sales_amount", fill=0.0)
    return cleaned.orderBy("p_partkey")


CLEAN_TRANSFORM_SQL = """
SELECT
  p_partkey,
  TRIM('  ' || p_name || '  ') AS name_clean,
  TRY_CAST(REGEXP_REPLACE(CAST(p_partkey AS VARCHAR) || ',' || LPAD(CAST(p_size AS VARCHAR), 2, '0'), '[,\\s]', '', 'g') AS DOUBLE) AS amount,
  TRY_CAST('2024-01-' || LPAD(CAST((p_size % 28) + 1 AS VARCHAR), 2, '0') AS TIMESTAMP) AS report_date,
  COALESCE(TRY_CAST(CASE WHEN p_partkey % 5 = 0 THEN 'not_a_number' ELSE CAST(p_retailprice AS VARCHAR) END AS DOUBLE), 0.0) AS sales_amount
FROM part
ORDER BY p_partkey
"""


# --- C1 concat ------------------------------------------------------------

def combine_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-schema concat of two order slices (unionByName parity with combine_runner concat)."""
    l = load_table(spark, "lineitem", sf_dir)
    a = l.filter(F.col("l_returnflag") == "A").select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_quantity"
    )
    # Different column order on purpose: unionByName must align.
    r = l.filter(F.col("l_returnflag") == "R").select(
        "l_quantity", "l_orderkey", "l_returnflag", "l_linenumber"
    )
    return combine.concat_frames([a, r]).orderBy("l_orderkey", "l_linenumber")


COMBINE_CONCAT_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem WHERE l_returnflag = 'A'
UNION ALL
SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity FROM lineitem WHERE l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber
"""


# --- C2 merge -------------------------------------------------------------

def combine_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-join merge of two column subsets with suffix handling (combine_runner merge parity)."""
    orders = load_table(spark, "orders", sf_dir).select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.col("o_orderpriority").alias("name"),
        "o_totalprice",
    )
    customer = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_name").alias("name"),
        "c_mktsegment",
    )
    merged = combine.merge_frames([orders, customer], keys=["custkey"], how="inner")
    return merged.orderBy("o_orderkey")


COMBINE_MERGE_SQL = """
SELECT
  o.o_custkey AS custkey,
  o.o_orderkey,
  o.o_orderpriority AS name,
  o.o_totalprice,
  c.c_name AS name_2,
  c.c_mktsegment
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
ORDER BY o_orderkey
"""


# --- T9 combine_on aggregate ---------------------------------------------

def combine_on_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """combine_on groupby-sum over lineitem (engine.py:199-221 parity at analytical scale)."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey",
        "l_returnflag",
        F.col("l_quantity").cast("decimal(12,2)").alias("l_quantity"),
        F.col("l_extendedprice").cast("decimal(12,2)").alias("l_extendedprice"),
    )
    agg = transform.combine_on_aggregate(l, keys=["l_orderkey", "l_returnflag"])
    return agg.select(
        "l_orderkey",
        "l_returnflag",
        F.round("l_quantity", 2).cast("double").alias("l_quantity"),
        F.round("l_extendedprice", 2).cast("double").alias("l_extendedprice"),
    ).orderBy("l_orderkey", "l_returnflag")


COMBINE_ON_AGG_SQL = """
SELECT
  l_orderkey,
  l_returnflag,
  CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE) AS l_quantity,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS l_extendedprice
FROM lineitem
GROUP BY l_orderkey, l_returnflag
ORDER BY l_orderkey, l_returnflag
"""


# --- T10 dedupe keep-first ------------------------------------------------

def dedupe_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dedupe_on keep=first with an explicit order key (deterministic distributed 'first')."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_quantity"
    )
    # Order by every non-partition output column: even if the data has
    # full-row ties, the surviving tuple is then uniquely determined.
    return dedupe.dedupe_keep_first(
        l, subset=["l_orderkey"], order_by=["l_linenumber", "l_partkey", "l_quantity"]
    ).orderBy("l_orderkey")


DEDUPE_KEEP_FIRST_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_partkey, l_quantity) = 1
ORDER BY l_orderkey
"""


# --- V2 profile metrics ---------------------------------------------------

def profile_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest metrics: rows, duplicate rows, per-column null% in a single aggregation."""
    orders = load_table(spark, "orders", sf_dir)
    return profile_metrics_df(orders)


PROFILE_METRICS_SQL = """
SELECT
  COUNT(*) AS rows,
  COUNT(*) - (SELECT COUNT(*) FROM (SELECT DISTINCT * FROM orders)) AS duplicate_rows,
  ROUND(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS null_pct_o_orderkey,
  ROUND(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS null_pct_o_custkey,
  ROUND(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS null_pct_o_orderstatus,
  ROUND(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS null_pct_o_totalprice,
  ROUND(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS null_pct_o_orderdate,
  ROUND(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) * 100.0 / COUNT(*), 2) AS null_pct_o_orderpriority
FROM orders
"""


# --- N5 column stats ------------------------------------------------------

def profile_column_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column schema-candidate stats (numeric ratio, year-like ratio, avg length) in one agg pass."""
    docs = load_table(spark, "documents", sf_dir)
    return column_stats_df(docs).orderBy("column_name")


PROFILE_COLUMN_STATS_SQL = """
WITH stats AS (
  SELECT 'doc_id' AS column_name,
    ROUND(AVG(CASE WHEN TRY_CAST(CAST(doc_id AS VARCHAR) AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END), 4) AS numeric_ratio,
    ROUND(AVG(CASE WHEN TRY_CAST(CAST(doc_id AS VARCHAR) AS DOUBLE) BETWEEN 1900 AND 2100 THEN 1.0 ELSE 0.0 END), 4) AS year_like_ratio,
    ROUND(AVG(COALESCE(LENGTH(CAST(doc_id AS VARCHAR)), 0)), 2) AS avg_len
  FROM documents
  UNION ALL
  SELECT 'text',
    ROUND(AVG(CASE WHEN TRY_CAST(text AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(CASE WHEN TRY_CAST(text AS DOUBLE) BETWEEN 1900 AND 2100 THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(COALESCE(LENGTH(text), 0)), 2)
  FROM documents
  UNION ALL
  SELECT 'lang',
    ROUND(AVG(CASE WHEN TRY_CAST(lang AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(CASE WHEN TRY_CAST(lang AS DOUBLE) BETWEEN 1900 AND 2100 THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(COALESCE(LENGTH(lang), 0)), 2)
  FROM documents
  UNION ALL
  SELECT 'source',
    ROUND(AVG(CASE WHEN TRY_CAST(source AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(CASE WHEN TRY_CAST(source AS DOUBLE) BETWEEN 1900 AND 2100 THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(COALESCE(LENGTH(source), 0)), 2)
  FROM documents
  UNION ALL
  SELECT 'n_chars',
    ROUND(AVG(CASE WHEN TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) IS NOT NULL THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(CASE WHEN TRY_CAST(CAST(n_chars AS VARCHAR) AS DOUBLE) BETWEEN 1900 AND 2100 THEN 1.0 ELSE 0.0 END), 4),
    ROUND(AVG(COALESCE(LENGTH(CAST(n_chars AS VARCHAR)), 0)), 2)
  FROM documents
)
SELECT * FROM stats ORDER BY column_name
"""


# --- Q1/Q2 query builder --------------------------------------------------

_QB_SPEC = QuerySpec(
    columns=("p_partkey", "p_name", "p_type", "p_size", "p_brand", "p_retailprice"),
    filters=(
        Filter("p_type", "contains", "PROMO"),
        Filter("p_size", "between", (5, 45)),
        Filter("p_brand", "in", ("Brand#11", "Brand#23", "Brand#34", "Brand#45", "Brand#55")),
        OrGroup(
            (
                Filter("p_retailprice", "<", 1200.0),
                Filter("p_size", ">=", 20),
            )
        ),
    ),
    order_by=("p_partkey",),
)


def query_builder_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """QuerySpec select+filter ops (= != > >= < <= contains, IN, BETWEEN, OR-groups) -> Catalyst filters; the generated SQL is the oracle."""
    part = load_table(spark, "part", sf_dir)
    return _QB_SPEC.apply(part)


# The oracle IS the SQL the builder generates (Q2 parity).
QUERY_BUILDER_FILTER_SQL = _QB_SPEC.to_sql("part")


def winsorize_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-returnflag winsorization of extended prices at [p01, p99]
    (exact percentiles match DuckDB quantile_cont bit-for-bit)."""
    l = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice"
    )
    return transform.winsorize(
        l, "l_extendedprice", group_cols=["l_returnflag"]
    ).orderBy("l_orderkey", "l_linenumber", "l_returnflag")


WINSORIZE_PRICES_SQL = """
WITH bounds AS (
  SELECT l_returnflag,
         QUANTILE_CONT(l_extendedprice, 0.01) AS lo,
         QUANTILE_CONT(l_extendedprice, 0.99) AS hi
  FROM lineitem GROUP BY l_returnflag
)
SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag,
       LEAST(GREATEST(l.l_extendedprice, b.lo), b.hi) AS l_extendedprice
FROM lineitem l JOIN bounds b ON l.l_returnflag = b.l_returnflag
ORDER BY l.l_orderkey, l.l_linenumber, l.l_returnflag
"""


# --- CDC merge/upsert -----------------------------------------------------

def cdc_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a deterministic synthetic change stream to `customer`:
    custkey%10==0 → delete, %10==1 → update (acctbal+100, two change
    versions so latest-wins is exercised), plus inserts at key+1e6."""
    from .cdc import apply_changes

    customer = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    deletes = customer.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        F.lit(1).alias("seq"),
        F.lit("delete").alias("op"),
        "c_name",
        "c_acctbal",
    )
    stale_updates = customer.filter(F.col("c_custkey") % 10 == 1).select(
        "c_custkey",
        F.lit(1).alias("seq"),
        F.lit("update").alias("op"),
        "c_name",
        (F.col("c_acctbal") - 999).alias("c_acctbal"),
    )
    updates = customer.filter(F.col("c_custkey") % 10 == 1).select(
        "c_custkey",
        F.lit(2).alias("seq"),
        F.lit("update").alias("op"),
        "c_name",
        F.round(F.col("c_acctbal").cast("decimal(12,2)") + 100, 2)
        .cast("double")
        .alias("c_acctbal"),
    )
    inserts = customer.filter(F.col("c_custkey") % 10 == 2).select(
        (F.col("c_custkey") + 1000000).alias("c_custkey"),
        F.lit(1).alias("seq"),
        F.lit("insert").alias("op"),
        F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
        F.lit(0.0).alias("c_acctbal"),
    )
    changes = deletes.unionByName(stale_updates).unionByName(updates).unionByName(inserts)
    snapshot = apply_changes(customer, changes, key=["c_custkey"], seq_col="seq")
    return snapshot.orderBy("c_custkey")


CDC_APPLY_CHANGES_SQL = """
WITH base AS (SELECT c_custkey, c_name, c_acctbal FROM customer)
SELECT c_custkey, c_name, c_acctbal FROM base
WHERE c_custkey % 10 NOT IN (0, 1)
UNION ALL
SELECT c_custkey, c_name,
       CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)) + 100, 2) AS DOUBLE)
FROM base WHERE c_custkey % 10 = 1
UNION ALL
SELECT c_custkey + 1000000, 'new-' || c_name, 0.0
FROM base WHERE c_custkey % 10 = 2
ORDER BY c_custkey
"""


def scd2_customer_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 versioning over a synthetic customer change stream:
    v1 insert for everyone, v2 balance update for custkey%3==0,
    v3 delete for custkey%9==0."""
    from .cdc import scd2_history

    customer = load_table(spark, "customer", sf_dir).select("c_custkey", "c_acctbal")
    v1 = customer.select(
        "c_custkey", F.lit(1).alias("seq"), F.lit("insert").alias("op"), "c_acctbal"
    )
    v2 = customer.filter(F.col("c_custkey") % 3 == 0).select(
        "c_custkey",
        F.lit(2).alias("seq"),
        F.lit("update").alias("op"),
        F.round(F.col("c_acctbal").cast("decimal(12,2)") * 2, 2).cast("double").alias("c_acctbal"),
    )
    v3 = customer.filter(F.col("c_custkey") % 9 == 0).select(
        "c_custkey", F.lit(3).alias("seq"), F.lit("delete").alias("op"), F.lit(None).cast("double").alias("c_acctbal")
    )
    hist = scd2_history(v1.unionByName(v2).unionByName(v3), key=["c_custkey"], seq_col="seq")
    return hist.orderBy("c_custkey", "valid_from")


SCD2_CUSTOMER_HISTORY_SQL = """
WITH changes AS (
  SELECT c_custkey, 1 AS seq, 'insert' AS op, c_acctbal FROM customer
  UNION ALL
  SELECT c_custkey, 2, 'update',
         CAST(ROUND(CAST(c_acctbal AS DECIMAL(12,2)) * 2, 2) AS DOUBLE)
  FROM customer WHERE c_custkey % 3 = 0
  UNION ALL
  SELECT c_custkey, 3, 'delete', CAST(NULL AS DOUBLE) FROM customer WHERE c_custkey % 9 = 0
),
with_next AS (
  SELECT c_custkey, seq, op, c_acctbal,
         LEAD(seq) OVER (PARTITION BY c_custkey ORDER BY seq) AS next_seq
  FROM changes
)
SELECT c_custkey, c_acctbal, seq AS valid_from, next_seq AS valid_to,
       next_seq IS NULL AS is_current
FROM with_next
WHERE LOWER(op) != 'delete'
ORDER BY c_custkey, valid_from
"""


# --- sampling / capping / packing ----------------------------------------

def cap_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key quota: at most 5 events per user, earliest first."""
    from .sampling import cap_per_key

    events = load_table(spark, "events", sf_dir).select("event_id", "user_id", "ts")
    return cap_per_key(events, key=["user_id"], order_by=["ts", "event_id"], n=5).orderBy(
        "user_id", "ts", "event_id"
    )


CAP_EVENTS_PER_USER_SQL = """
SELECT event_id, user_id, ts
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) <= 5
ORDER BY user_id, ts, event_id
"""


def pack_documents_by_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: bin documents per source into ~2000-char
    bins in doc_id order."""
    from .sampling import pack_by_budget

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "source", "n_chars")
    return pack_by_budget(
        docs, group_col="source", order_by=["doc_id"], size_col="n_chars", budget=2000
    ).orderBy("source", "doc_id")


PACK_DOCUMENTS_BY_BUDGET_SQL = """
SELECT doc_id, source, n_chars,
       CAST(FLOOR((SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                                      ROWS UNBOUNDED PRECEDING) - n_chars) / 2000.0) AS BIGINT) AS bin
FROM documents
ORDER BY source, doc_id
"""


def sample_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 20% content-hash sample of documents via the
    engine-portable md5-prefix key, so DuckDB reproduces the exact row
    set (the xxhash64 `deterministic_sample` stays the in-Spark fast
    path, covered by pytest)."""
    from .sampling import portable_sample

    docs = load_table(spark, "documents", sf_dir)
    return portable_sample(docs, ["doc_id"], 0.2).orderBy("doc_id")


SAMPLE_DOCUMENTS_SQL = """
SELECT doc_id, text, lang, source, n_chars
FROM documents
WHERE SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8) < '33333333'
ORDER BY doc_id
"""


# --- V1 validation coercion metrics --------------------------------------

def validate_coercion_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract validation with typed-coercion failure counts in one pass."""
    docs = load_table(spark, "documents", sf_dir)
    mixed = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("x"))
        .otherwise(F.col("doc_id").cast("string"))
        .alias("mixed"),
        F.col("n_chars").cast("string").alias("n_chars"),
    )
    _, failures = coerce_field_types(mixed, {"mixed": "int", "n_chars": "float"})
    return failures.orderBy("field")


VALIDATE_COERCION_METRICS_SQL = """
WITH src AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'x' ELSE CAST(doc_id AS VARCHAR) END AS mixed,
         CAST(n_chars AS VARCHAR) AS n_chars
  FROM documents
)
SELECT 'mixed' AS field,
       CAST(SUM(CASE WHEN mixed IS NOT NULL AND TRY_CAST(mixed AS BIGINT) IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS failures,
       COUNT(*) AS rows
FROM src
UNION ALL
SELECT 'n_chars',
       CAST(SUM(CASE WHEN n_chars IS NOT NULL AND TRY_CAST(n_chars AS DOUBLE) IS NULL THEN 1 ELSE 0 END) AS BIGINT),
       COUNT(*)
FROM src
ORDER BY field
"""


# --- training-mix sampling ------------------------------------------------

# Target mixture for the gate: source srcN keeps (20-N)/20 of its rows
# (src0 everything, src19 one in twenty) — a monotone re-weighting
# resembling a quality-tiered training mix.
MIX_RATES = {f"src{n}": (20 - n) / 20 for n in range(20)}


def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-weighted corpus mixing via per-stratum md5-integer
    thresholds (see operators/sampling.py:portable_weighted_sample).
    DuckDB reproduces the exact sampled row set from the generated
    CASE ladder below — the thresholds are the same integers."""
    from .sampling import portable_weighted_sample

    docs = load_table(spark, "documents", sf_dir)
    return (
        portable_weighted_sample(docs, "source", MIX_RATES, ["doc_id"])
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


_MIX_CASES = "\n".join(
    f"    WHEN '{s}' THEN {int(r * 2**32)}" for s, r in MIX_RATES.items()
)

CORPUS_MIX_SAMPLE_SQL = f"""
SELECT doc_id, source
FROM documents
WHERE CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) <
  CASE source
{_MIX_CASES}
    ELSE 0
  END
ORDER BY doc_id
"""


# --- exact heavy hitters --------------------------------------------------

def heavy_hitter_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-25 corpus terms via the two-pass candidate-pruned
    counter (operators/heavy.py) — output provably equals the plain
    exact top-k the oracle computes, while shuffling only the bounded
    candidate set at scale."""
    from ..functions.text import words
    from .heavy import top_k_exact

    docs = load_table(spark, "documents", sf_dir)
    terms = docs.select(F.explode(words(F.col("text"))).alias("term"))
    return top_k_exact(terms, "term", k=25).select(
        F.col("item").alias("term"), "cnt"
    ).orderBy(F.col("cnt").desc(), F.col("term").asc())


HEAVY_HITTER_TERMS_SQL = r"""
WITH t AS (
  SELECT UNNEST(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS term
  FROM documents
)
SELECT term, CAST(COUNT(*) AS BIGINT) AS cnt
FROM t
GROUP BY term
ORDER BY cnt DESC, term ASC
LIMIT 25
"""


# --- pruned per-key top-n -------------------------------------------------

def topn_events_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 events per event_type by (value desc, event_id asc) via
    the partition-pruned top-n (operators/topn.py) — provably equal to
    the plain window the oracle runs, while shuffling only the pruned
    survivors."""
    from .topn import pruned_topn

    events = load_table(spark, "events", sf_dir).select("event_type", "event_id", "value")
    return pruned_topn(
        events, ["event_type"], [("value", False), ("event_id", True)], n=3
    ).orderBy("event_type", "rank")


TOPN_EVENTS_PER_TYPE_SQL = """
SELECT event_type, event_id, value, rank
FROM (
  SELECT event_type, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rank
  FROM events
)
WHERE rank <= 3
ORDER BY event_type, rank
"""


# --- skew-mitigating salted join -----------------------------------------

def skew_salted_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand revenue computed through `salted_join`
    (operators/skew.py): lineitem scattered over 8 deterministic
    salts, part replicated 8×, joined on (partkey, salt). The salted
    plan is row-identical to the plain join — which is exactly what
    the plain-join oracle asserts — while spreading any hot partkey
    across 8 reducers instead of one.

    (At this table ratio a broadcast would win; the gate pins the
    SEMANTICS of the mitigation you'd reach for when both sides are
    too big to broadcast and one key dominates.)"""
    from ..analytics.tpch import _disc_price, _money
    from .skew import salted_join

    lineitem = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    part = load_table(spark, "part", sf_dir).select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    return (
        salted_join(lineitem, part, on="l_partkey", n_salts=8)
        .groupBy("p_brand")
        .agg(
            _money(F.sum(_disc_price()), "revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("p_brand")
    )


SKEW_SALTED_BRAND_REVENUE_SQL = """
SELECT
  p_brand,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(5,2)) - CAST(l_discount AS DECIMAL(5,2)))), 2) AS DOUBLE) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


# --- fixed-length sequence packing ---------------------------------------

def docs_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style training-batch packing: documents laid end-to-end in
    doc_id order, cut into 512-token sequences, docs spanning
    boundaries. The Spark side computes the global token offset with
    the distributed two-pass prefix sum (operators/packing.py — no
    single-partition window anywhere); the oracle states the same
    semantics with the naive global window, which DuckDB can afford
    at sf0.01."""
    from .packing import pack_token_sequences

    docs = load_table(spark, "documents", sf_dir)
    return pack_token_sequences(docs, seq_len=512).orderBy("doc_id", "seq_id")


DOCS_SEQUENCE_PACKING_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS BIGINT) AS n_tokens
  FROM documents
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
  FROM toks WHERE n_tokens > 0
),
spans AS (
  SELECT doc_id, n_tokens, start,
         UNNEST(GENERATE_SERIES(CAST(FLOOR(start / 512.0) AS BIGINT),
                                CAST(FLOOR((start + n_tokens - 1) / 512.0) AS BIGINT))) AS seq_id
  FROM placed
)
SELECT doc_id, seq_id,
       GREATEST(CAST(0 AS BIGINT), seq_id * 512 - start) AS tok_start,
       LEAST(n_tokens, (seq_id + 1) * 512 - start) AS tok_end,
       n_tokens
FROM spans
ORDER BY doc_id, seq_id
"""


def docs_sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing on REAL tokenizer counts: learn the corpus BPE
    merges (functions/bpe.py, 5 deterministic rounds), count each
    document's tokens under the merged vocabulary, and cut the token
    stream into 512-token sequences with the same distributed two-pass
    prefix sum as `docs_sequence_packing` — the actual training-batch
    contract (whitespace counts over- or under-fill sequences the
    moment a tokenizer exists).

    The learn step collects 5 (left, right) rules to the driver
    (bounded by N_MERGES, not data); encoding runs over the DISTINCT
    WORD vocabulary and joins counts back (sublinear in corpus size);
    packing adds one range partitioning and a #partitions-row collect.
    """
    from ..functions.bpe import encode_with_merges, learn_bpe_merges
    from .packing import pack_counted_sequences

    docs = load_table(spark, "documents", sf_dir)
    rules = [
        (r["merge_left"], r["merge_right"])
        for r in learn_bpe_merges(docs).orderBy("merge_idx").collect()
    ]
    counted = encode_with_merges(docs, rules).select("doc_id", "n_tokens")
    return pack_counted_sequences(counted, seq_len=512).orderBy("doc_id", "seq_id")


# Oracle: the unrolled-CTE BPE encode (same generator the L12 gate
# uses) feeding the packing CTEs of DOCS_SEQUENCE_PACKING_SQL.
from ..functions.bpe import N_MERGES as _BPE_N, _bpe_round_ctes as _bpe_ctes  # noqa: E402

DOCS_SEQUENCE_PACKING_BPE_SQL = (
    """
WITH words AS (
  SELECT UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w FROM documents
),
wc AS (SELECT w, COUNT(*) AS c FROM words GROUP BY w),
s0 AS (
  SELECT w, c, ' ' || ARRAY_TO_STRING(STRING_SPLIT(w, ''), '  ') || ' ' AS s FROM wc
),
"""
    + ",\n".join(_bpe_ctes(r) for r in range(1, _BPE_N + 1))
    + f""",
vt AS (SELECT w, LEN(STRING_SPLIT(TRIM(s), '  ')) AS nt FROM s{_BPE_N}),
dw AS (
  SELECT doc_id, UNNEST(REGEXP_EXTRACT_ALL(LOWER(text), '[a-z0-9]+')) AS w
  FROM documents
),
toks AS (
  SELECT doc_id, CAST(SUM(nt) AS BIGINT) AS n_tokens
  FROM dw JOIN vt USING (w) GROUP BY doc_id
),
placed AS (
  SELECT doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - n_tokens AS start
  FROM toks WHERE n_tokens > 0
),
spans AS (
  SELECT doc_id, n_tokens, start,
         UNNEST(GENERATE_SERIES(CAST(FLOOR(start / 512.0) AS BIGINT),
                                CAST(FLOOR((start + n_tokens - 1) / 512.0) AS BIGINT))) AS seq_id
  FROM placed
)
SELECT doc_id, seq_id,
       GREATEST(CAST(0 AS BIGINT), seq_id * 512 - start) AS tok_start,
       LEAST(n_tokens, (seq_id + 1) * 512 - start) AS tok_end,
       n_tokens
FROM spans
ORDER BY doc_id, seq_id
"""
)


def corpus_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixing (τ = 0.5), the multilingual-
    sampling rule (Conneau et al. XLM-R; every multilingual LLM
    recipe): per-source keep rate r_s = (n_min / n_s)^τ, so
    over-represented sources are down-sampled toward the tail and the
    rarest source keeps 100%. τ = 0.5 makes the power a SQRT — IEEE
    correctly-rounded in both engines, so the thresholds
    floor(sqrt(n_min/n_s)·2³²) match bit-for-bit WITHOUT driver-side
    rate computation: counts, min, thresholds, and the md5 keep test
    all stay inside the plan (a vocabulary-sized broadcast join), the
    shape that survives 100 TB."""
    docs = load_table(spark, "documents", sf_dir)
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    mn = counts.agg(F.min("n").alias("n_min"))
    hash_int = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long")
    thresh = F.floor(
        F.sqrt(F.col("n_min").cast("double") / F.col("n")) * F.lit(4294967296.0)
    )
    return (
        docs.join(F.broadcast(counts), "source")
        .crossJoin(F.broadcast(mn))
        .filter(hash_int < thresh)
        .select("doc_id", "source")
        .orderBy("doc_id")
    )


CORPUS_TEMPERATURE_MIX_SQL = """
WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY source),
mn AS (SELECT MIN(n) AS n_min FROM counts)
SELECT doc_id, source
FROM documents d
JOIN counts USING (source)
CROSS JOIN mn
WHERE CAST(CONCAT('0x', SUBSTR(MD5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
      < FLOOR(SQRT(CAST(n_min AS DOUBLE) / n) * 4294967296.0)
ORDER BY doc_id
"""
