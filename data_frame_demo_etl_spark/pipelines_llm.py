"""End-to-end LLM training-data preparation pipeline: the operators of
this engine composed into the actual product workflow.

    documents
      → text hygiene (PII redaction)
      → quality scoring + filtering (length / stopword / punctuation)
      → language ID + filtering
      → exact dedup (hash winners)
      → near-dup clustering (n-gram Jaccard pairs → connected
        components → keep cluster minimum)
      → deterministic train/val/test split (content hash)
      → token-budget packing per split
      → export with manifest

Everything up to the split is expressible in ANSI SQL, so the gate
runs the whole composed pipeline against a single DuckDB oracle — the
strongest end-to-end correctness statement in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup.clusters import connected_components
from .dedup.jaccard import jaccard_pairs
from .functions import text as T
from .operators.sampling import pack_by_budget, split_by_hash
from .sources.catalog import load_table

QUALITY_MIN = 0.3
JACCARD_THRESHOLD = 0.8
KEEP_LANGS = ("en", "und")


def prepare_corpus(docs: DataFrame, winner: str = "min_id") -> DataFrame:
    """The deterministic (oracle-able) portion: hygiene → filters →
    exact dedup → near-dup cluster resolution.

    ``winner`` picks the cluster-resolution rule: ``"min_id"`` keeps
    the lowest doc_id (stable, cheap); ``"best_quality"`` keeps the
    highest-quality member (the Dolma/CCNet production rule), compared
    on the 1e-6 integer quality grid with doc_id ASC tie-break so the
    choice is engine-exact."""
    # r10 re-plan: on a heavily duplicated corpus (the 1000×-copied
    # sf100 stretch; any real crawl), running the regex-heavy
    # redact/score pass over EVERY copy is duplication-factor × wasted
    # work. Redaction and scoring are TEXT-PURE, so collapse to
    # distinct RAW texts first (struct-min keeps the min-doc_id row's
    # attributes), regex each distinct text once, then collapse again
    # on the REDACTED text — raw-distinct texts whose differences sat
    # inside redacted spans merge here, exactly as the old
    # redact-everything → dedup_exact flow merged them. The min-id
    # winner is preserved bit-for-bit (min over a merged group = min
    # over its subgroup minima; copies share text ⇒ share score ⇒
    # pass the quality filter together), so the ORACLE IS UNCHANGED —
    # regex work drops from Θ(corpus) to Θ(distinct texts) while the
    # corpus-sized work is one hash-collapse scan.
    # (Scoring still happens on the REDACTED text, matching the
    # oracle's `feats FROM redacted` CTE.)
    # Collapse keyed on sha2(text), with the text CARRIED THROUGH the
    # winner aggregation as a struct payload (doc_id leads the struct,
    # so comparisons never touch text bytes). r11 re-plan: the r10
    # shape rejoined the full corpus against the winner table on
    # (hash, doc_id) to recover text — a Θ(corpus-bytes) shuffle that
    # ran this box out of disk on the sf10000 (5B-doc, 54 GB) leg
    # ("No space left on device" in BypassMergeSortShuffleWriter).
    # With text inside the min-struct, map-side partial aggregation
    # collapses every task's local duplicates BEFORE the shuffle, so
    # shuffle volume is ~n_tasks × distinct-corpus-bytes (≈2 GB at
    # sf10000 vs ≥54 GB for the rejoin) and there is NO second join.
    # On an all-unique corpus it degrades to exactly the old plan's
    # one corpus-bytes shuffle — never worse, duplication-factor
    # better. A groupBy on the raw text column would still be wrong
    # (multi-KB grouping KEYS); the 64-byte hash stays the key.
    # The ORACLE IS UNCHANGED: min-struct-by-doc_id picks the same
    # winner row the join recovered.
    winners = (
        docs.select(
            F.sha2(F.col("text"), 256).alias("__h"),
            "doc_id",
            "text",
            "source",
            "n_chars",
        )
        .groupBy("__h")
        .agg(F.min(F.struct("doc_id", "text", "source", "n_chars")).alias("w"))
    )
    # The persist() below is LOAD-BEARING, not a courtesy cache: it is
    # the materialization boundary that keeps the regex-heavy
    # redact/score pass on the Θ(distinct) winner rows (see the r10
    # PushPredicateThroughJoin incident, memory: the filter's regex
    # trees must evaluate ABOVE this boundary; with the agg shape a
    # text predicate cannot be pushed below a non-grouping agg output,
    # but the boundary also stops any future re-plan from re-deriving
    # the collapse per downstream branch).
    first = winners.select("w.doc_id", "w.text", "w.source", "w.n_chars").persist()
    redacted = first.withColumn("text", T.redact_pii(F.col("text")))
    scored = redacted.select(
        "doc_id",
        "text",
        "source",
        "n_chars",
        F.round(T.quality_score(F.col("text")), 6).alias("quality"),
        T.lang_id(F.col("text")).alias("lang_pred"),
    )
    filtered = scored.filter(
        (F.col("quality") >= QUALITY_MIN) & (F.col("lang_pred").isin(*KEEP_LANGS))
    )
    # Persist before the self-joining near-dup stage: every downstream
    # branch (shingling, winner groupBy, final anti-join) would
    # otherwise re-execute the collapse + scoring.
    exact = (
        filtered.groupBy("text")
        .agg(
            F.min(
                F.struct("doc_id", "source", "n_chars", "quality", "lang_pred")
            ).alias("w")
        )
        .select(
            "w.doc_id", "text", "w.source", "w.n_chars", "w.quality", "w.lang_pred"
        )
        .persist()
    )

    pairs = jaccard_pairs(exact, threshold=JACCARD_THRESHOLD)
    comps = connected_components(pairs)
    if winner == "best_quality":

        members = comps.select(F.col("id").alias("doc_id"), "component")
        scored_m = members.join(exact.select("doc_id", "quality"), "doc_id").withColumn(
            "qi", F.round(F.col("quality") * 1_000_000).cast("long")
        )
        # partial-aggregable winner (max struct: highest qi, then
        # smallest doc_id) instead of a per-component row_number sort
        # in one task — same re-plan rationale as
        # dedup_clusters_keep_best (dedup/gate.py).
        winners = (
            scored_m.groupBy("component")
            .agg(
                F.max(
                    F.struct(F.col("qi"), (-F.col("doc_id")).alias("nd"))
                ).alias("w")
            )
            .select("component", (-F.col("w.nd")).alias("win_doc"))
        )
        losers = (
            scored_m.join(winners, "component")
            .filter(F.col("doc_id") != F.col("win_doc"))
            .select("doc_id")
        )
    else:
        losers = comps.filter(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        )
    return exact.join(losers, "doc_id", "left_anti")


def prepare_training_set(
    docs: DataFrame,
    fractions: dict[str, float] | None = None,
    budget: int = 2000,
    eval_set: DataFrame | None = None,
    packing: str = "budget",
    seq_len: int = 2048,
) -> dict[str, DataFrame]:
    """Full pipeline: corpus prep (+ optional benchmark
    decontamination) + hash split + per-split packing.

    ``packing="budget"`` bins documents per source to ~``budget``
    chars (RAG/chunk shape); ``packing="sequence"`` lays each split
    end-to-end and cuts exact ``seq_len``-token training sequences
    (operators/packing.py — GPT-style, docs span boundaries)."""
    corpus = prepare_corpus(docs)
    if eval_set is not None:
        from .dedup.contamination import decontaminate

        corpus = decontaminate(corpus, eval_set)
    splits = split_by_hash(corpus, ["doc_id"], fractions or {"train": 0.9, "val": 0.05, "test": 0.05})
    if packing == "sequence":
        from .operators.packing import pack_token_sequences

        return {
            name: pack_token_sequences(df, seq_len=seq_len) for name, df in splits.items()
        }
    return {
        name: pack_by_budget(df, group_col="source", order_by=["doc_id"], size_col="n_chars", budget=budget)
        for name, df in splits.items()
    }


def llm_prep_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate query: the oracle-able pipeline portion over `documents`."""
    docs = load_table(spark, "documents", sf_dir)
    return prepare_corpus(docs).select(
        "doc_id", "source", "n_chars", "quality", "lang_pred"
    ).orderBy("doc_id")


_SW = "', '".join(T.STOPWORDS)
_EN = "', '".join(T.LANG_MARKERS["en"])
_DE = "', '".join(T.LANG_MARKERS["de"])
_ES = "', '".join(T.LANG_MARKERS["es"])
_FR = "', '".join(T.LANG_MARKERS["fr"])

LLM_PREP_PIPELINE_SQL = rf"""
WITH RECURSIVE redacted AS (
  SELECT doc_id, source, n_chars,
    REGEXP_REPLACE(
      REGEXP_REPLACE(
        REGEXP_REPLACE(
          REGEXP_REPLACE(
            REGEXP_REPLACE(text, '[0-9]{{3}}-[0-9]{{2}}-[0-9]{{4}}', '[SSN]', 'g'),
            '[0-9]{{4}}[ -]?[0-9]{{4}}[ -]?[0-9]{{4}}[ -]?[0-9]{{4}}', '[CREDIT_CARD]', 'g'),
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{{2,}}', '[EMAIL]', 'g'),
        '[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}\.[0-9]{{1,3}}', '[IPV4]', 'g'),
      '\+?[0-9][0-9()\-\s]{{7,}}[0-9]', '[PHONE]', 'g') AS text
  FROM documents
),
feats AS (
  SELECT doc_id, text, source, n_chars,
    CAST(LENGTH(text) AS DOUBLE) AS n,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '')) AS DOUBLE) AS wc,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w IN ('{_SW}'))) AS DOUBLE) AS sw,
    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[^\w\s]')) AS DOUBLE) AS punct,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w IN ('{_DE}'))) AS INTEGER) AS de,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w IN ('{_EN}'))) AS INTEGER) AS en,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w IN ('{_ES}'))) AS INTEGER) AS es,
    CAST(LEN(LIST_FILTER(STRING_SPLIT_REGEX(LOWER(text), '\s+'), w -> w IN ('{_FR}'))) AS INTEGER) AS fr,
    CAST(LEN(REGEXP_EXTRACT_ALL(text, '[一-鿿]')) AS INTEGER) AS zh
  FROM redacted
),
scored AS (
  SELECT doc_id, text, source, n_chars,
    ROUND(
      0.5 * LEAST(n / 500.0, 1.0)
      + 0.5 * LEAST((CASE WHEN wc > 0 THEN sw / wc ELSE 0.0 END) * 5, 1.0)
      - 0.25 * LEAST((CASE WHEN n > 0 THEN punct / n ELSE 0.0 END) * 4, 1.0),
    6) AS quality,
    CASE
      WHEN GREATEST(de, en, es, fr, zh) = 0 THEN 'und'
      WHEN de >= GREATEST(en, es, fr, zh) THEN 'de'
      WHEN en >= GREATEST(es, fr, zh) THEN 'en'
      WHEN es >= GREATEST(fr, zh) THEN 'es'
      WHEN fr >= zh THEN 'fr'
      ELSE 'zh'
    END AS lang_pred
  FROM feats
),
filtered AS (
  SELECT * FROM scored
  WHERE quality >= {QUALITY_MIN} AND lang_pred IN ('en', 'und')
),
exact AS (
  SELECT * FROM filtered
  QUALIFY ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) = 1
),
words AS (
  SELECT doc_id, LIST_FILTER(STRING_SPLIT_REGEX(text, '\s+'), w -> w != '') AS ws FROM exact
),
sh AS (
  SELECT DISTINCT doc_id AS doc, ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] AS shingle
  FROM words, LATERAL (SELECT UNNEST(GENERATE_SERIES(1, GREATEST(LEN(ws) - 2, 0))) AS i)
),
sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
inter AS (
  SELECT a.doc AS id_a, b.doc AS id_b, COUNT(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc < b.doc
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc = id_a
  JOIN sizes sb ON sb.doc = id_b
  WHERE CAST(c AS DOUBLE) / (sa.sz + sb.sz - c) >= {JACCARD_THRESHOLD}
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs UNION SELECT id_b, id_a FROM pairs
),
reach AS (
  SELECT u, u AS r FROM (SELECT DISTINCT u FROM edges)
  UNION
  SELECT e.u, reach.r FROM edges e JOIN reach ON e.v = reach.u
),
clusters AS (
  SELECT u AS doc_id, MIN(r) AS component FROM reach GROUP BY u
)
SELECT e.doc_id, e.source, e.n_chars, e.quality, e.lang_pred
FROM exact e
LEFT JOIN clusters c ON c.doc_id = e.doc_id
WHERE c.doc_id IS NULL OR c.component = e.doc_id
ORDER BY e.doc_id
"""


def llm_prep_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: the same pipeline with the production winner rule —
    near-dup clusters keep their BEST-quality member instead of the
    lowest doc_id (threads operators/gate.py's D11 selection into the
    flagship composition)."""
    docs = load_table(spark, "documents", sf_dir)
    return (
        prepare_corpus(docs, winner="best_quality")
        .select("doc_id", "source", "n_chars", "quality", "lang_pred")
        .orderBy("doc_id")
    )


# Shares every CTE with LLM_PREP_PIPELINE_SQL up to `clusters`; only
# the winner rule in the final projection differs.
_PIPE_PREFIX = LLM_PREP_PIPELINE_SQL[: LLM_PREP_PIPELINE_SQL.rindex("SELECT e.doc_id")]

LLM_PREP_KEEP_BEST_SQL = (
    _PIPE_PREFIX
    + """SELECT e.doc_id, e.source, e.n_chars, e.quality, e.lang_pred
FROM exact e
LEFT JOIN clusters c ON c.doc_id = e.doc_id
WHERE c.doc_id IS NULL OR e.doc_id IN (
  SELECT doc_id FROM (
    SELECT m.doc_id,
           ROW_NUMBER() OVER (
             PARTITION BY m.component
             ORDER BY CAST(ROUND(x.quality * 1000000) AS BIGINT) DESC, m.doc_id ASC
           ) AS rn
    FROM clusters m JOIN exact x ON x.doc_id = m.doc_id
  ) WHERE rn = 1
)
ORDER BY e.doc_id
"""
)
