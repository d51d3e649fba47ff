"""Text-analysis Column builders for large-scale corpus processing:
token counting, quality scoring, language ID, fingerprinting.

All pure built-in expressions (whole-stage codegen, no Python in the
row path). Designed for the `documents` table but applicable to any
string column.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Deterministic marker-word sets for the 5-language ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "fr": ("le", "la", "les", "et", "de"),
    "es": ("el", "los", "las", "y", "que"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": (),  # handled by CJK codepoint detection
}

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it", "on", "for")

# BPE-ish tokenization: letter runs, single digits, single punctuation.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def words(text: Column) -> Column:
    """Whitespace tokens (empty-string tokens filtered out)."""
    return F.filter(F.split(text, r"\s+"), lambda w: w != "")


def token_count_whitespace(text: Column) -> Column:
    return F.size(words(text))


def token_count_bpe(text: Column) -> Column:
    """Sub-word-ish token count via regexp (approximates BPE token
    budgeting without a vocab)."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def stopword_count(text: Column) -> Column:
    return F.size(F.filter(words(F.lower(text)), lambda w: w.isin(*STOPWORDS)))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = F.regexp_count(text, F.lit(r"[^\w\s]"))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1]:
    rewards mid-length documents and prose-like stopword density,
    penalizes punctuation soup. Deterministic closed form so it can be
    oracle-checked in SQL.
    """
    n = F.length(text).cast("double")
    wc = token_count_whitespace(text).cast("double")
    sw_ratio = F.when(wc > 0, stopword_count(text) / wc).otherwise(F.lit(0.0))
    len_score = F.least(n / F.lit(500.0), F.lit(1.0))
    sw_score = F.least(sw_ratio * 5, F.lit(1.0))
    p_penalty = F.least(punct_ratio(text) * 4, F.lit(1.0))
    return F.round(0.5 * len_score + 0.5 * sw_score - 0.25 * p_penalty, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word hit counts per language + CJK codepoint count."""
    toks = words(F.lower(text))
    scores: dict[str, Column] = {}
    for lang, markers in LANG_MARKERS.items():
        if markers:
            scores[lang] = F.size(F.filter(toks, lambda w: w.isin(*markers)))
    scores["zh"] = F.regexp_count(text, F.lit(r"[一-鿿]"))
    return scores


def lang_id(text: Column) -> Column:
    """Argmax language with deterministic alphabetical tie-break."""
    scores = lang_scores(text)
    ordered = sorted(scores.items())  # alphabetical → ties break to first
    best_lang, best_score = ordered[0]
    result = F.lit(best_lang)
    current = best_score
    for lang, score in ordered[1:]:
        result = F.when(score > current, F.lit(lang)).otherwise(result)
        current = F.greatest(current, score)
    return F.when(current > 0, result).otherwise(F.lit("und"))


# PII patterns kept RE2-compatible (no lookarounds) so the same regex
# semantics hold in Spark (java.util.regex) and DuckDB (RE2) — and in
# any downstream engine a pipeline might verify against.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?[0-9][0-9()\-\s]{7,}[0-9]",
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "credit_card": r"[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def redact_pii(text: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace PII spans with ``[<KIND>]`` tokens (training-data
    hygiene). Order matters: more specific patterns run first."""
    order = [k for k in ("ssn", "credit_card", "email", "ipv4", "phone") if kinds is None or k in kinds]
    out = text
    for kind in order:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind PII hit counts (for filtering/reporting)."""
    return {k: F.regexp_count(text, F.lit(p)) for k, p in PII_PATTERNS.items()}


def repetition_score(text: Column) -> Column:
    """Fraction of lines that duplicate an earlier line — the standard
    boilerplate/repetition signal. 0.0 for ≤1 line; pure array
    expressions (no explode, no shuffle)."""
    lines = F.filter(
        F.transform(F.split(text, r"\n"), lambda s: F.trim(s)), lambda s: s != ""
    )
    n = F.size(lines)
    distinct_n = F.size(F.array_distinct(lines))
    return F.when(n > 1, (n - distinct_n).cast("double") / n).otherwise(F.lit(0.0))


def chunk_text(text: Column, chunk_size: int = 200, overlap: int = 50) -> Column:
    """Split text into overlapping character windows:
    array<struct<chunk_idx:int, chunk:string>>.

    The standard context-window chunking for embedding/training prep;
    pure ``sequence`` + ``transform`` + ``substring`` (explode at the
    call site). Stride = chunk_size − overlap; the final partial chunk
    is kept.
    """
    if overlap >= chunk_size:
        raise ValueError("overlap must be smaller than chunk_size")
    stride = chunk_size - overlap
    n = F.length(text)
    starts = F.sequence(
        F.lit(0), F.greatest((n - F.lit(1)) - ((n - F.lit(1)) % stride), F.lit(0)), F.lit(stride)
    )
    # Drop trailing windows that start at/after the end (short docs).
    valid = F.filter(starts, lambda s: (s == 0) | (s < n))
    return F.transform(
        valid,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.substring(text, s + 1, chunk_size).alias("chunk"),
        ),
    )


def fingerprint(text: Column) -> Column:
    """Stable document fingerprint: md5 over whitespace-normalized,
    lowercased text. Used for exact dedup at scale (hash, not payload,
    crosses the shuffle)."""
    normalized = F.lower(F.trim(F.regexp_replace(text, r"\s+", " ")))
    return F.md5(normalized)


def gopher_quality_flags(text: Column) -> dict[str, Column]:
    """Gopher-style document quality rules (Rae et al. 2021, table A1
    — public heuristics reused across Dolma/RefinedWeb/FineWeb-class
    pipelines), each as a boolean Column:

    - word count in [50, 100_000]
    - mean word length in [3, 10]
    - symbol-to-word ratio (# or ellipsis) <= 0.1
    - < 90% of lines start with a bullet
    - < 30% of lines end with an ellipsis
    - >= 80% of words contain at least one alphabetic character

    All whole-stage-codegen Column expressions — no UDFs — so the
    filter runs at scan speed and pushes into one pass.
    """
    ws = words(text)
    n_words = F.size(ws)
    total_chars = F.aggregate(
        F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_len = F.when(n_words > 0, total_chars / n_words).otherwise(F.lit(0.0))
    symbols = F.regexp_count(text, F.lit(r"(#|\.\.\.|…)"))
    lines = F.filter(F.split(text, r"\n"), lambda l: F.trim(l) != "")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([*\-•]|[0-9]+[.)])"))
    )
    ellipsis_lines = F.size(F.filter(lines, lambda l: F.trim(l).rlike(r"(\.\.\.|…)$")))
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    return {
        "wc_ok": (n_words >= 50) & (n_words <= 100_000),
        "mean_len_ok": (mean_len >= 3.0) & (mean_len <= 10.0),
        "symbol_ok": F.when(
            n_words > 0, (symbols.cast("double") / n_words) <= 0.1
        ).otherwise(F.lit(False)),
        "bullet_ok": (bullet_lines.cast("double") / n_lines) < 0.9,
        "ellipsis_ok": (ellipsis_lines.cast("double") / n_lines) < 0.3,
        "alpha_ok": F.when(
            n_words > 0, (alpha_words.cast("double") / n_words) >= 0.8
        ).otherwise(F.lit(False)),
    }


C4_LINE_MIN_WORDS = 5
C4_MIN_SENTENCES = 3


def c4_kept_lines(text: Column) -> Column:
    """Line-level C4 cleaning rules (Raffel et al. 2020 §2.2 — the
    public heuristics behind the C4 corpus): keep only lines that
    end in terminal punctuation, have at least 5 words, and do not
    mention "javascript" (boilerplate cookie/JS warnings)."""
    lines = F.split(text, r"\n")
    return F.filter(
        lines,
        lambda l: F.trim(l).rlike(r'[.!?"]$')
        & (F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != "")) >= C4_LINE_MIN_WORDS)
        & ~F.lower(l).contains("javascript"),
    )


def c4_clean(text: Column) -> Column:
    """Text rebuilt from the C4-kept lines."""
    return F.array_join(c4_kept_lines(text), "\n")


def c4_document_flags(text: Column) -> dict[str, Column]:
    """Document-level C4 rules over the line-cleaned text: at least 3
    sentences remain, no "lorem ipsum" placeholder, no curly brace
    (code leakage marker). The badword-list rule is omitted (no public
    list shipped here); slot a `F.lower(text).rlike(...)` term in if
    one is provided."""
    cleaned = c4_clean(text)
    return {
        "lines_kept": F.size(c4_kept_lines(text)),
        "n_sentences": F.regexp_count(cleaned, F.lit(r"[.!?]")),
        "sentences_ok": F.regexp_count(cleaned, F.lit(r"[.!?]")) >= C4_MIN_SENTENCES,
        "no_lorem": ~F.lower(text).contains("lorem ipsum"),
        "no_brace": ~text.contains("{"),
    }


def c4_document_pass(text: Column) -> Column:
    """Conjunction of the document-level C4 rules."""
    flags = c4_document_flags(text)
    return flags["sentences_ok"] & flags["no_lorem"] & flags["no_brace"]


def gopher_quality_pass(text: Column) -> Column:
    """Conjunction of all Gopher rules — the keep/drop decision."""
    flags = gopher_quality_flags(text)
    out = F.lit(True)
    for c in flags.values():
        out = out & c
    return out


def nfc_normalize_column(df, text_col: str, out_col: str | None = None):
    """Unicode NFC normalization of a string column — the first step of
    any serious LLM text pipeline (decomposed sequences like
    'a'+U+0300 vs the precomposed 'à' defeat exact dedup, hashing,
    and tokenizer merges unless canonicalized first).

    Spark has no built-in normalizer, so this is the documented
    Arrow-batched slow path: `mapInPandas` applying the vectorized
    pandas `.str.normalize("NFC")` per batch — never row-at-a-time
    Python. Schema passes through unchanged plus the output column.
    DuckDB's `nfc_normalize` implements the same UAX #15 form, which
    is what makes the gate below fully oracle-checkable.
    """
    import pandas as pd  # noqa: F401  (mapInPandas batch type)

    out_col = out_col or f"{text_col}_nfc"
    fields = df.schema.fields

    def batches(it):
        for pdf in it:
            pdf[out_col] = pdf[text_col].astype("string").str.normalize("NFC")
            yield pdf

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in fields)
    return df.mapInPandas(batches, schema=f"{schema}, {out_col} string")


def text_nfc_normalize(spark, sf_dir: str):
    """Gate: plant canonically-decomposed sequences into the (ASCII)
    corpus JVM-side — every 'a' becomes 'a'+COMBINING GRAVE — then
    NFC-normalize back through the Arrow path. Output pins the
    codepoint-length contraction and the md5 of the normalized text,
    both reproducible in DuckDB (`nfc_normalize`). An identity run on
    ASCII would be a vacuous gate; the planted combining marks make
    the normalization load-bearing."""
    from pyspark.sql import functions as F

    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    decomposed = docs.select(
        "doc_id",
        F.regexp_replace("text", "a", "a\u0300").alias("text"),
    )
    out = nfc_normalize_column(decomposed, "text")
    return out.select(
        "doc_id",
        F.length("text").cast("long").alias("len_decomposed"),
        F.length("text_nfc").cast("long").alias("len_nfc"),
        F.md5(F.col("text_nfc")).alias("nfc_md5"),
    ).orderBy("doc_id")


TEXT_NFC_NORMALIZE_SQL = """
WITH planted AS (
  SELECT doc_id, REPLACE(text, 'a', 'a' || CHR(768)) AS text FROM documents
)
SELECT doc_id,
       LENGTH(text) AS len_decomposed,
       LENGTH(nfc_normalize(text)) AS len_nfc,
       MD5(nfc_normalize(text)) AS nfc_md5
FROM planted
ORDER BY doc_id
"""


# ─────────────── L21: Flesch reading-ease scoring ───────────────


def flesch_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-row Flesch reading ease on the exact micro grid:

        206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)

    with the classic heuristics — words = whitespace tokens,
    sentences = maximal [.!?]+ runs (floored at 1 so headless
    fragments still score), syllables = [aeiouy]+ vowel groups with a
    one-per-word floor (the standard cheap proxy). Each rational is
    ONE exact integral division (`div` / `//`, identical truncation
    on non-negatives); the coefficients are integer micro literals —
    no float arithmetic anywhere, so both engines reproduce every
    score bit-for-bit. The score can be negative for dense legalese:
    the two subtractions stay in decimal, only the division operands
    are guaranteed non-negative. NULL when there are no words.

    Adds ``n_words``, ``n_sentences``, ``n_syllables``,
    ``flesch_micro`` to the input. Pure Column expressions —
    whole-stage codegen, no UDFs."""
    t = F.col(text_col)
    out = (
        df.withColumn(
            "n_words",
            F.size(F.filter(F.split(t, r"\s+"), lambda w: w != "")).cast("long"),
        )
        .withColumn(
            "n_sentences",
            F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1)).cast("long"),
        )
        .withColumn(
            "n_syllables",
            F.greatest(
                F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")),
                F.size(F.filter(F.split(t, r"\s+"), lambda w: w != "")),
            ).cast("long"),
        )
    )
    score = F.expr(
        "cast(206835000 as decimal(38,0))"
        " - (cast(1015000 as decimal(38,0)) * n_words)"
        "   div n_sentences"
        " - (cast(84600000 as decimal(38,0)) * n_syllables)"
        "   div n_words"
    )
    return out.withColumn(
        "flesch_micro", F.when(F.col("n_words") > 0, score.cast("long"))
    )


def docs_flesch_readability(spark, sf_dir: str) -> DataFrame:
    """Gate: per-source readability rollup — mean Flesch score (exact
    integral division of the summed per-doc scores), word/sentence
    masses. The quality-filter signal C4/Gopher don't carry: a
    too-hard or too-easy corpus shifts this before it shifts length
    ratios."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    scored = flesch_scores(docs)
    return (
        scored.filter(F.col("flesch_micro").isNotNull())
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_sentences").alias("n_sentences"),
            F.sum(F.col("flesch_micro").cast("decimal(38,0)")).alias("s"),
        )
        .select(
            "source",
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_words").cast("long").alias("n_words"),
            F.col("n_sentences").cast("long").alias("n_sentences"),
            # +1e9-micro offset before the division: per-doc scores (and
            # hence the sum) can be negative on dense text, and Spark
            # `div` truncates where DuckDB `//` floors — the V7 offset
            # trick keeps the integral division on non-negatives.
            (
                F.expr(
                    "(s + cast(1000000000 as decimal(38,0))"
                    " * cast(n_docs as decimal(38,0)))"
                    " div cast(n_docs as decimal(38,0))"
                )
                - F.lit(1_000_000_000)
            )
            .cast("long")
            .alias("mean_flesch_micro"),
        )
        .orderBy("source")
    )


DOCS_FLESCH_READABILITY_SQL = r"""
WITH scored AS (
  SELECT source,
         LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS n_words,
         GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')), 1) AS n_sentences,
         GREATEST(LEN(REGEXP_EXTRACT_ALL(LOWER(text), '[aeiouy]+')),
                  LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != ''))) AS n_syllables
  FROM documents
),
per_doc AS (
  SELECT source, n_words, n_sentences, n_syllables,
         CAST(206835000 AS HUGEINT)
           - (CAST(1015000 AS HUGEINT) * n_words) // n_sentences
           - (CAST(84600000 AS HUGEINT) * n_syllables) // n_words AS flesch_micro
  FROM scored
  WHERE n_words > 0
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_words) AS BIGINT) AS n_words,
       CAST(SUM(n_sentences) AS BIGINT) AS n_sentences,
       CAST((SUM(flesch_micro) + CAST(1000000000 AS HUGEINT) * COUNT(*)) // COUNT(*) - 1000000000 AS BIGINT) AS mean_flesch_micro
FROM per_doc
GROUP BY source
ORDER BY source
"""
