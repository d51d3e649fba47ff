from __future__ import annotations

from data_frame_demo_etl_spark.pipelines_llm import prepare_corpus, prepare_training_set
from data_frame_demo_etl_spark.sources.catalog import load_table


def test_prepare_training_set(spark, sf_oracle_dir):
    docs = load_table(spark, "documents", sf_oracle_dir)
    corpus_n = prepare_corpus(docs).count()
    assert 0 < corpus_n < docs.count()  # filters + dedup actually removed rows

    splits = prepare_training_set(docs, budget=2000)
    ids = {k: {r.doc_id for r in v.collect()} for k, v in splits.items()}
    total = set().union(*ids.values())
    assert len(total) == corpus_n
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"])
    # Packing produced sane bins: bin ids start at 0 per source group.
    sample = splits["train"].filter("bin = 0").count()
    assert sample > 0


def test_prepare_training_set_sequence_packing(spark, sf_oracle_dir):
    """packing='sequence': each split becomes fixed-length training
    sequences; token totals reconcile with the split's documents and
    every non-final sequence is exactly seq_len tokens."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.operators.packing import with_token_counts

    docs = load_table(spark, "documents", sf_oracle_dir)
    splits = prepare_training_set(docs, packing="sequence", seq_len=256)
    train = splits["train"].persist()
    packed_tokens = train.agg(F.sum(F.col("tok_end") - F.col("tok_start"))).collect()[0][0]
    assert packed_tokens and packed_tokens > 0
    per_seq = train.groupBy("seq_id").agg(
        F.sum(F.col("tok_end") - F.col("tok_start")).alias("n")
    ).collect()
    last = max(r.seq_id for r in per_seq)
    assert all(r.n == 256 for r in per_seq if r.seq_id != last)
    train.unpersist()


def test_prepare_corpus_scores_redacted_text(spark):
    """Quality/lang must be computed on the REDACTED text (hygiene →
    scoring), not the original — a single-select with sibling aliases
    silently scores the original column. Regression for ADVICE r1."""
    from pyspark.sql import functions as F

    from data_frame_demo_etl_spark.functions import text as T
    from data_frame_demo_etl_spark.pipelines_llm import prepare_corpus

    filler = "the and is of to in it you that was " * 12
    pii = "reach me at john.doe@example.com or 192.168.1.1 now"
    rows = [
        (1, filler + pii, "web", len(filler + pii)),
        (2, filler + "clean tail", "web", len(filler) + 10),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")

    # The test only has teeth if redaction actually moves the score.
    probe = docs.filter("doc_id = 1").select(
        F.round(T.quality_score(F.col("text")), 6).alias("q_orig"),
        F.round(T.quality_score(T.redact_pii(F.col("text"))), 6).alias("q_red"),
    ).first()
    assert probe.q_orig != probe.q_red

    out = prepare_corpus(docs)
    got = {r.doc_id: r for r in out.collect()}
    assert 1 in got
    assert "[EMAIL]" in got[1].text and "[IPV4]" in got[1].text
    recheck = out.select(
        (F.round(T.quality_score(F.col("text")), 6) == F.col("quality")).alias("q_ok"),
        (T.lang_id(F.col("text")) == F.col("lang_pred")).alias("l_ok"),
    ).collect()
    assert all(r.q_ok and r.l_ok for r in recheck)


def test_prepare_training_set_with_decontamination(spark, sf_oracle_dir):
    from pyspark.sql import functions as F

    docs = load_table(spark, "documents", sf_oracle_dir)
    # Use a handful of corpus docs themselves as the "benchmark":
    # they must disappear from every split.
    eval_set = docs.filter(F.col("doc_id") < 5).select("doc_id", "text")
    splits = prepare_training_set(docs, eval_set=eval_set)
    all_ids = set()
    for df in splits.values():
        all_ids |= {r.doc_id for r in df.collect()}
    assert not (all_ids & {0, 1, 2, 3, 4})


def test_llm_prep_keep_best_winner_differs_from_min_id(spark, tmp_path):
    """Planted corpus where the near-dup cluster's best-quality member
    has the HIGHEST doc_id: prepare_corpus(winner="best_quality") must
    keep it, while the default min_id rule keeps the lowest — proving
    the pipeline actually threads the quality-aware rule (the sf0.01
    corpus has quality-tied clusters, where both rules coincide)."""
    from data_frame_demo_etl_spark.pipelines_llm import prepare_corpus

    base = (
        "the quick brown fox and the lazy dog are walking with some other "
        "animals over the old wooden bridge near the river where they rest"
    )
    rows = [
        (10, base),
        (20, base),
        (30, base + " " + base),  # same shingle set, double length => higher quality
        (99, "the completely different corpus text talks about shuffle "
             "joins and the broadcast strategy that the optimizer picks"),
    ]
    docs = spark.createDataFrame(
        [(i, t, "en", "src0", len(t)) for i, t in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    )

    best = sorted(r.doc_id for r in prepare_corpus(docs, winner="best_quality").collect())
    min_id = sorted(r.doc_id for r in prepare_corpus(docs).collect())
    assert best == [30, 99]
    assert min_id == [10, 99]


def test_prepare_corpus_merges_texts_that_redact_identically(spark):
    """The r10 two-collapse re-plan must keep the old semantics: raw
    texts that differ ONLY inside redacted spans are the same document
    after redaction, and the min doc_id across the MERGED group wins."""
    from data_frame_demo_etl_spark.pipelines_llm import prepare_corpus

    body = (
        "the quick brown fox jumps over the lazy dog and keeps going "
        "with plenty of ordinary english words to pass the quality bar "
    ) * 3
    rows = [
        (7, body + "contact alice@example.com today", "web", 100),
        (3, body + "contact bob@other.org today", "web", 100),  # min id
        (9, body + "contact alice@example.com today", "web", 100),  # exact copy of 7
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string, n_chars long")
    out = prepare_corpus(docs).collect()
    assert [r.doc_id for r in out] == [3]


def test_prepare_corpus_duplicated_corpus_matches_unduplicated(spark):
    """Copies must not change the output at all (the property that
    makes the distinct-first re-plan safe at any duplication factor)."""
    from data_frame_demo_etl_spark.pipelines_llm import prepare_corpus

    base = [
        (1, "alpha beta gamma delta epsilon zeta eta theta " * 5, "a", 50),
        (2, "one two three four five six seven eight nine ten " * 5, "b", 60),
    ]
    copies = base + [(i + 100, t, s, n) for (i, t, s, n) in base for _ in (0,)]
    one = {(r.doc_id, r.quality) for r in prepare_corpus(
        spark.createDataFrame(base, "doc_id long, text string, source string, n_chars long")
    ).collect()}
    many = {(r.doc_id, r.quality) for r in prepare_corpus(
        spark.createDataFrame(copies, "doc_id long, text string, source string, n_chars long")
    ).collect()}
    assert one == many
