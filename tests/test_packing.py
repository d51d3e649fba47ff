"""Fixed-length sequence packing (operators/packing.py): conservation,
exact sequence lengths, boundary spanning, and the two-pass prefix sum
against the naive single-window formulation.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from data_frame_demo_etl_spark.operators.packing import (
    pack_token_sequences,
    with_token_counts,
)


def _mk(spark, toks_per_doc):
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(toks_per_doc)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_packing_known_layout(spark):
    # docs of 3,5,4 tokens, seq_len 4: stream = d0[0:3] d1[0:5] d2[0:4]
    docs = _mk(spark, [3, 5, 4])
    out = sorted(
        (r.doc_id, r.seq_id, r.tok_start, r.tok_end)
        for r in pack_token_sequences(docs, seq_len=4).collect()
    )
    assert out == [
        (0, 0, 0, 3),  # tokens 0-2
        (1, 0, 0, 1),  # token 3 completes seq 0
        (1, 1, 1, 5),  # tokens 4-7 fill seq 1
        (2, 2, 0, 4),  # tokens 8-11 fill seq 2
    ]


def test_packing_conservation_and_full_sequences(spark, sf_dir):
    from data_frame_demo_etl_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    seq_len = 128
    packed = pack_token_sequences(docs, seq_len=seq_len).persist()
    total_packed = packed.agg(F.sum(F.col("tok_end") - F.col("tok_start"))).collect()[0][0]
    total_tokens = (
        with_token_counts(docs).agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert total_packed == total_tokens > 0

    per_seq = (
        packed.groupBy("seq_id")
        .agg(F.sum(F.col("tok_end") - F.col("tok_start")).alias("n"))
        .collect()
    )
    last = max(r.seq_id for r in per_seq)
    for r in per_seq:
        assert r.n == seq_len or (r.seq_id == last and 0 < r.n <= seq_len)
    # contiguous sequence ids from 0
    assert sorted(r.seq_id for r in per_seq) == list(range(last + 1))
    packed.unpersist()


def test_packing_matches_naive_global_window(spark, sf_dir):
    from data_frame_demo_etl_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    seq_len = 256
    got = {
        (r.doc_id, r.seq_id, r.tok_start, r.tok_end)
        for r in pack_token_sequences(docs, seq_len=seq_len).collect()
    }
    counted = with_token_counts(docs).filter(F.col("n_tokens") > 0)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    naive = (
        counted.withColumn("start", F.sum("n_tokens").over(w) - F.col("n_tokens"))
        .withColumn(
            "seq_id",
            F.explode(
                F.sequence(
                    F.floor(F.col("start") / seq_len),
                    F.floor((F.col("start") + F.col("n_tokens") - 1) / seq_len),
                )
            ),
        )
        .select(
            "doc_id",
            "seq_id",
            F.greatest(F.lit(0), F.col("seq_id") * seq_len - F.col("start")).alias("ts"),
            F.least(F.col("n_tokens"), (F.col("seq_id") + 1) * seq_len - F.col("start")).alias(
                "te"
            ),
        )
    )
    want = {(r.doc_id, r.seq_id, r.ts, r.te) for r in naive.collect()}
    assert got == want and len(got) > 0


def test_packing_skips_empty_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a b c"), (1, ""), (2, "   "), (3, None), (4, "d e")],
        "doc_id long, text string",
    )
    out = pack_token_sequences(docs, seq_len=4).collect()
    assert sorted({r.doc_id for r in out}) == [0, 4]


def test_packing_one_giant_doc_spans_many_sequences(spark):
    # a single 1000-token doc at seq_len=64 → ceil(1000/64)=16 spans
    docs = _mk(spark, [1000])
    out = sorted(
        (r.seq_id, r.tok_start, r.tok_end)
        for r in pack_token_sequences(docs, seq_len=64).collect()
    )
    assert len(out) == 16
    assert out[0] == (0, 0, 64) and out[-1] == (15, 960, 1000)
    assert sum(e - s for _, s, e in out) == 1000


def test_packing_hypothesis_random_sizes(spark):
    """Random doc-size mixes (incl. zeros and giants) conserve tokens
    and cut exact seq_len boundaries."""
    import random

    rng = random.Random(20240814)
    for trial in range(3):
        sizes = [rng.choice([0, 1, 2, 7, 63, 64, 65, 500]) for _ in range(40)]
        docs = _mk(spark, sizes)
        packed = pack_token_sequences(docs, seq_len=64).collect()
        assert sum(r.tok_end - r.tok_start for r in packed) == sum(sizes)
        per_seq = {}
        for r in packed:
            per_seq[r.seq_id] = per_seq.get(r.seq_id, 0) + (r.tok_end - r.tok_start)
        last = max(per_seq)
        assert all(n == 64 for s, n in per_seq.items() if s != last)


def test_pack_counted_sequences_bpe_counts_conservation(spark, sf_dir):
    """The BPE-count composition (docs_sequence_packing_bpe): packing
    over learned-tokenizer counts preserves the two invariants —
    token conservation and exactly-seq_len interior sequences — and
    its totals differ from the whitespace variant (proving the BPE
    counts actually flowed through)."""
    from data_frame_demo_etl_spark.functions.bpe import (
        encode_with_merges,
        learn_bpe_merges,
    )
    from data_frame_demo_etl_spark.operators.packing import pack_counted_sequences
    from data_frame_demo_etl_spark.sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    rules = [
        (r["merge_left"], r["merge_right"])
        for r in learn_bpe_merges(docs).orderBy("merge_idx").collect()
    ]
    counted = encode_with_merges(docs, rules).select("doc_id", "n_tokens")
    total_bpe = counted.agg(F.sum("n_tokens")).collect()[0][0]

    out = pack_counted_sequences(counted, seq_len=512)
    packed_total = out.agg(F.sum(F.col("tok_end") - F.col("tok_start"))).collect()[0][0]
    assert packed_total == total_bpe  # conservation

    per_seq = out.groupBy("seq_id").agg(
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("n")
    )
    max_seq = per_seq.agg(F.max("seq_id")).collect()[0][0]
    bad = per_seq.filter((F.col("seq_id") < max_seq) & (F.col("n") != 512)).count()
    assert bad == 0  # every interior sequence holds exactly 512

    ws_total = (
        with_token_counts(docs).agg(F.sum("n_tokens")).collect()[0][0]
    )
    assert total_bpe != ws_total  # a real tokenizer changed the stream
