"""Fixed-length sequence packing — the "make training batches" step
of an LLM data pipeline: lay documents end-to-end in a deterministic
order and cut the token stream into sequences of exactly ``seq_len``
tokens, letting documents SPAN sequence boundaries (GPT-style packing,
no padding waste). Output is one row per (document × sequence) overlap
with the token sub-range each sequence takes from that document.

Scale design — the global running offset is the crux. A naive
``SUM(n) OVER (ORDER BY doc_id)`` is a single-partition window: one
task sees every row, which is the textbook 100 TB scale-killer. This
implementation uses the distributed two-pass prefix sum instead:

1. range-partition by doc_id (Spark's range partitioner keeps the
   global order across partitions);
2. pass 1: per-PARTITION token totals — #partitions rows to the
   driver (bounded, ~KBs);
3. cumulative-sum those totals on the driver → each partition's start
   offset, broadcast back as a join against ``spark_partition_id()``;
4. pass 2: a window cum-sum PARTITIONED BY partition id (fully
   parallel) + the partition offset = the exact global offset.

Every shuffle is bounded (one range partitioning, one tiny broadcast);
no stage ever sees more than one partition's rows.

No reference analog (`/root/reference` has no training-batch ops);
brief-mandated training-data surface alongside token counting
(functions/text.py) and budget packing (operators/gate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

# Whitespace tokenization, identical to functions/text.py token
# counting: count of non-empty \s+-split pieces.
_TOKENS = r"\s+"


def with_token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append ``n_tokens`` = whitespace token count (0 for empty/null)."""
    toks = F.filter(F.split(F.coalesce(F.col(text_col), F.lit("")), _TOKENS), lambda w: w != "")
    return df.withColumn("n_tokens", F.size(toks).cast("long"))


def _global_offsets(df: DataFrame, id_col: str, n_col: str) -> DataFrame:
    """(id, n, start) where start = sum of n over all rows with a
    smaller id — computed with the two-pass prefix sum (no global
    single-partition window)."""
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    laid = (
        df.repartitionByRange(n_parts, F.col(id_col))
        .sortWithinPartitions(id_col)
        .withColumn("__pid", F.spark_partition_id())
    )
    # Persist is load-bearing for CORRECTNESS here, not just cost:
    # repartitionByRange samples its boundaries, so an unpersisted
    # recompute in pass 2 could land rows on different partitions
    # than the offsets collected in pass 1. Per the session cache
    # policy (session.release_all_caches), the persist feeds the
    # returned lazy frame and is released by the session owner.
    laid = laid.persist()
    # pass 1: one row per partition (bounded collect)
    totals = {
        r["__pid"]: r["t"]
        for r in laid.groupBy("__pid").agg(F.sum(n_col).alias("t")).collect()
    }
    running, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = running
        running += totals[pid]
    off_df = spark.createDataFrame(
        [(int(p), int(o)) for p, o in offsets.items()], "__pid int, __off long"
    )
    # pass 2: per-partition cum-sum (parallel across partitions)
    w = (
        Window.partitionBy("__pid")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        laid.join(F.broadcast(off_df), "__pid")
        .withColumn("__cum", F.sum(n_col).over(w) + F.col("__off"))
        .withColumn("start", (F.col("__cum") - F.col(n_col)).alias("start"))
        .drop("__pid", "__off", "__cum")
    )


def pack_token_sequences(
    docs: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, seq_id, tok_start, tok_end, n_tokens): for each
    document (in ascending ``id_col`` order, laid end-to-end), the
    half-open token range [tok_start, tok_end) it contributes to each
    fixed-length sequence ``seq_id`` it overlaps. Zero-token documents
    contribute nothing. sum(tok_end - tok_start) over the output ==
    total corpus tokens, every sequence except the last holds exactly
    ``seq_len`` tokens — both properties pinned in tests."""
    counted = with_token_counts(docs, text_col).select(id_col, "n_tokens")
    return pack_counted_sequences(counted, seq_len, id_col=id_col)


def pack_counted_sequences(
    counted: DataFrame,
    seq_len: int,
    id_col: str = "doc_id",
    n_col: str = "n_tokens",
) -> DataFrame:
    """The packing core over PRE-COMPUTED per-document token counts
    ``(id_col, n_col)`` — the seam that lets any tokenizer (whitespace
    above, learned BPE in operators/gate.py:docs_sequence_packing_bpe)
    feed the same two-pass prefix-sum layout."""
    placed = _global_offsets(
        counted.filter(F.col(n_col) > 0).select(id_col, F.col(n_col).alias("n_tokens")),
        id_col,
        "n_tokens",
    )
    first_seq = F.floor(F.col("start") / seq_len)
    last_seq = F.floor((F.col("start") + F.col("n_tokens") - 1) / seq_len)
    return (
        placed.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
        .select(
            F.col(id_col),
            F.col("seq_id"),
            F.greatest(F.lit(0), F.col("seq_id") * seq_len - F.col("start")).alias(
                "tok_start"
            ),
            F.least(
                F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len - F.col("start")
            ).alias("tok_end"),
            F.col("n_tokens"),
        )
    )
