"""Correctness-gate wrappers for similarity search on `embeddings`.

Every gate here has a full DuckDB oracle:
- brute-force cosine top-k via LIST_COSINE_SIMILARITY;
- the LSH variants by EMBEDDING the deterministic hyperplane floats
  into generated SQL, so the oracle reproduces candidate generation
  (sign-bit buckets) and not just the scores;
- IVF at full probe, where it is exact by construction, against the
  brute-force SQL.
The approximate regimes (nprobe<k, bucket-bounded recall) are
recall-tested against brute force in pytest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..sources.catalog import load_table
from .ann import brute_force_topk, embedding_near_dup_pairs, lsh_topk

N_QUERIES = 10
K = 5
DIM = 64


def _queries(emb: DataFrame) -> DataFrame:
    return emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-5 for the first 10 query vectors (broadcast query set, JVM-side dot products)."""
    emb = load_table(spark, "embeddings", sf_dir)
    return brute_force_topk(emb, _queries(emb), k=K).orderBy("query_id", "rank")


ANN_COSINE_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM q, embeddings e
  WHERE e.vec_id != q.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {K}
ORDER BY query_id, rank
"""


def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN top-k; deterministic plane constants shared with the generated oracle."""
    emb = load_table(spark, "embeddings", sf_dir)
    return lsh_topk(emb, _queries(emb), dim=DIM, k=K).orderBy("query_id", "rank")


def embeddings_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components: posexplode the vectors and
    average each dimension (decimal-exact sums → engine-identical
    results). Covers labelled-vector analytics: class centroids are
    the building block of nearest-class-mean classification and
    per-class drift monitoring."""
    emb = load_table(spark, "embeddings", sf_dir)
    exploded = emb.select(
        "label", F.posexplode("embedding").alias("dim", "val")
    ).select(
        "label", "dim", F.col("val").cast("double").cast("decimal(18,9)").alias("val")
    )
    return (
        exploded.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("val").cast("double") / F.count(F.lit(1)), 6).alias("centroid_val"),
        )
        .filter(F.col("dim") < 8)  # keep the gate output compact
        .orderBy("label", "dim")
    )


EMBEDDINGS_LABEL_STATS_SQL = """
WITH exploded AS (
  SELECT label, i - 1 AS dim,
         CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(18,9)) AS val
  FROM embeddings,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i)
)
SELECT label, CAST(dim AS INTEGER) AS dim, COUNT(*) AS n,
       ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 6) AS centroid_val
FROM exploded
WHERE dim < 8
GROUP BY label, dim
ORDER BY label, dim
"""


def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs. Gate threshold is 0.4 because the
    synthetic embeddings are near-orthogonal random vectors (max pair
    cosine ≈0.5 even at sf0.1) — at the API default of 0.9 the gate
    would pass vacuously on zero rows. Real corpora keep the 0.9
    default of ``embedding_near_dup_pairs``."""
    emb = load_table(spark, "embeddings", sf_dir)
    return embedding_near_dup_pairs(emb, dim=DIM, threshold=0.4).orderBy("id_a", "id_b")


def _lsh_bucket_sql(n_planes: int = 8, seed: int = 42) -> str:
    """DuckDB expression computing the SAME sign-bit LSH bucket as
    ``lsh_assign``: the hyperplanes are deterministic (fixed seed), so
    their float values are embedded as literals (repr → exact double
    round-trip) and the bucket is the bit-packed sum of dot-product
    signs. This is what makes the LSH candidate generation — not just
    the final scores — externally verifiable."""
    from .ann import hyperplanes

    planes = hyperplanes(DIM, n_planes, seed)
    terms = []
    for j, plane in enumerate(planes):
        lits = ", ".join(repr(v) for v in plane)
        terms.append(
            f"(CASE WHEN LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), [{lits}]) > 0"
            f" THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(terms)


ANN_LSH_TOPK_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql()} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) AS cosine
  FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {K}
ORDER BY query_id, rank
"""


def ann_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: measured recall of the LSH-bucketed ANN against the exact
    brute-force top-k, per query — the evaluation layer for the ANN
    family (the X-family analog of `dedup_sketch_eval`): the number a
    rollout reads before replacing the exact scan with the bucketed
    path at corpus scale. (query_id, n_exact, n_lsh, n_hit,
    recall_ppm) with recall on the 1e6 integer grid (`div`/`//`
    truncation on non-negatives — engine-identical). Composition of
    two fully-oracled pipelines; no new approximation is introduced
    by the evaluation itself."""
    exact = ann_cosine_topk(spark, sf_dir).select("query_id", "neighbor_id")
    approx = ann_lsh_topk(spark, sf_dir).select("query_id", "neighbor_id")
    hits = (
        exact.join(approx, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    n_lsh = approx.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_lsh"))
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(n_lsh, "query_id", "left")
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            F.col("n_exact").cast("long").alias("n_exact"),
            F.coalesce(F.col("n_lsh"), F.lit(0)).cast("long").alias("n_lsh"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.expr(
                "cast((coalesce(n_hit, 0) * 1000000) div n_exact as bigint)"
            ).alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


ANN_RECALL_EVAL_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql()} AS bucket FROM embeddings
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id < {N_QUERIES}
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id ASC
           ) AS rank
    FROM q, embeddings e WHERE e.vec_id != q.query_id
  ) WHERE rank <= {K}
),
lsh AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(c.embedding AS DOUBLE[])), 6) DESC,
                      c.vec_id ASC
           ) AS rank
    FROM q JOIN b c ON q.bucket = c.bucket AND c.vec_id != q.query_id
  ) WHERE rank <= {K}
),
hits AS (
  SELECT e.query_id, COUNT(*) AS n_hit
  FROM exact e JOIN lsh l ON e.query_id = l.query_id AND e.neighbor_id = l.neighbor_id
  GROUP BY e.query_id
),
nl AS (SELECT query_id, COUNT(*) AS n_lsh FROM lsh GROUP BY query_id),
ne AS (SELECT query_id, COUNT(*) AS n_exact FROM exact GROUP BY query_id)
SELECT ne.query_id,
       CAST(ne.n_exact AS BIGINT) AS n_exact,
       CAST(COALESCE(nl.n_lsh, 0) AS BIGINT) AS n_lsh,
       CAST(COALESCE(hits.n_hit, 0) AS BIGINT) AS n_hit,
       CAST((COALESCE(hits.n_hit, 0) * 1000000) // ne.n_exact AS BIGINT) AS recall_ppm
FROM ne
LEFT JOIN nl ON ne.query_id = nl.query_id
LEFT JOIN hits ON ne.query_id = hits.query_id
ORDER BY ne.query_id
"""


MATRYOSHKA_DIMS = (8, 16, 32)


def embeddings_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: Matryoshka dimension-truncation recall (Kusupati et al.
    2022 / MRL serving decision) — rank by cosine over only the FIRST
    m dimensions of every vector and measure recall@k against the
    full-dimension exact top-k, per (m, query). This is the number
    that decides how far stored vectors can be truncated (m/64 of the
    memory and bandwidth) before retrieval quality drops: the
    evaluation-layer sibling of `ann_recall_eval` (which varies the
    INDEX; this varies the REPRESENTATION). Both legs reuse the
    oracled brute-force machinery — truncation is F.slice on the
    stored array, so no new approximation enters the evaluation.
    Output (dim, query_id, n_hit, recall_ppm); every (dim, query)
    appears (zero hits included via the spine left-join)."""
    emb = load_table(spark, "embeddings", sf_dir)
    full = brute_force_topk(emb, _queries(emb), k=K).select("query_id", "neighbor_id")
    trunc_parts = []
    for m in MATRYOSHKA_DIMS:
        sliced = emb.select("vec_id", F.slice("embedding", 1, m).alias("embedding"))
        topm = brute_force_topk(sliced, _queries(sliced), k=K).select(
            F.lit(m).cast("int").alias("dim"), "query_id", "neighbor_id"
        )
        trunc_parts.append(topm)
    trunc = trunc_parts[0]
    for t in trunc_parts[1:]:
        trunc = trunc.unionByName(t)
    hits = (
        trunc.join(full, ["query_id", "neighbor_id"])
        .groupBy("dim", "query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    spine = (
        spark.range(N_QUERIES)
        .select(F.col("id").cast("long").alias("query_id"))
        .crossJoin(
            spark.createDataFrame([(m,) for m in MATRYOSHKA_DIMS], "dim int")
        )
    )
    return (
        spine.join(hits, ["dim", "query_id"], "left")
        .select(
            "dim",
            "query_id",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            F.expr(f"cast((coalesce(n_hit, 0) * 1000000) div {K} as bigint)").alias(
                "recall_ppm"
            ),
        )
        .orderBy("dim", "query_id")
    )


def _matryoshka_leg_sql(m: int) -> str:
    return f"""
  SELECT {m} AS dim, query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv[1:{m}] AS DOUBLE[]), CAST(e.embedding[1:{m}] AS DOUBLE[])), 6) DESC,
                      e.vec_id ASC
           ) AS rank
    FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}) q,
         embeddings e
    WHERE e.vec_id != q.query_id
  ) WHERE rank <= {K}"""


EMBEDDINGS_MATRYOSHKA_RECALL_SQL = f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id ASC
           ) AS rank
    FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}) q,
         embeddings e
    WHERE e.vec_id != q.query_id
  ) WHERE rank <= {K}
),
trunc AS ({" UNION ALL ".join(_matryoshka_leg_sql(m) for m in MATRYOSHKA_DIMS)}
),
hits AS (
  SELECT t.dim, t.query_id, COUNT(*) AS n_hit
  FROM trunc t JOIN exact e ON t.query_id = e.query_id AND t.neighbor_id = e.neighbor_id
  GROUP BY t.dim, t.query_id
),
spine AS (
  SELECT d.dim, q.query_id
  FROM (SELECT UNNEST({list(MATRYOSHKA_DIMS)}) AS dim) d,
       (SELECT UNNEST(GENERATE_SERIES(0, {N_QUERIES - 1})) AS query_id) q
)
SELECT CAST(s.dim AS INTEGER) AS dim,
       CAST(s.query_id AS BIGINT) AS query_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST((COALESCE(h.n_hit, 0) * 1000000) // {K} AS BIGINT) AS recall_ppm
FROM spine s LEFT JOIN hits h ON s.dim = h.dim AND s.query_id = h.query_id
ORDER BY dim, query_id
"""


DEDUP_EMBEDDING_SQL = f"""
WITH b AS (
  SELECT vec_id, embedding, {_lsh_bucket_sql()} AS bucket FROM embeddings
),
pairs AS (
  SELECT a.vec_id AS id_a, bb.vec_id AS id_b,
         ROUND(LIST_COSINE_SIMILARITY(CAST(a.embedding AS DOUBLE[]), CAST(bb.embedding AS DOUBLE[])), 6) AS cosine
  FROM b a JOIN b bb ON a.bucket = bb.bucket AND a.vec_id < bb.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4 ORDER BY id_a, id_b
"""


def embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance entries of the embedding column via
    the portable decimal-summed aggregation (similarity/stats.py).
    The mapInPandas sufficient-statistics pass is the 100 TB variant;
    pytest cross-checks the two to 1e-9."""
    from .stats import covariance_entries

    emb = load_table(spark, "embeddings", sf_dir)
    return covariance_entries(emb, dim=DIM)


EMBEDDING_COVARIANCE_SQL = f"""
WITH idx AS (SELECT UNNEST(GENERATE_SERIES(0, {DIM - 1})) AS i),
q AS (
  SELECT vec_id,
         LIST_TRANSFORM(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000000 + 0.5) AS BIGINT)) AS qv
  FROM embeddings
),
prod AS (
  SELECT a.i AS i, b.i AS j,
         SUM(CAST(qv[a.i+1] * qv[b.i+1] AS DECIMAL(38,0))) AS sxy,
         COUNT(*) AS n
  FROM q, idx a, idx b
  WHERE b.i >= a.i
  GROUP BY 1, 2
),
sums AS (
  SELECT i, SUM(CAST(qv[i+1] AS DECIMAL(38,0))) AS s
  FROM q, idx
  GROUP BY i
)
SELECT p.i, p.j,
  (CAST(sxy AS DOUBLE) - CAST(si.s AS DOUBLE) * CAST(sj.s AS DOUBLE) / n) / (n - 1)
    / 1000000000000.0 AS cov
FROM prod p JOIN sums si ON si.i = p.i JOIN sums sj ON sj.i = p.j
ORDER BY p.i, p.j
"""


# ─────────────── X13: hard-negative mining ───────────────


def embeddings_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: top-5 hard negatives (most-similar OTHER-label corpus
    vectors) for the first 10 labeled queries — the contrastive-
    training mining pass; exact cosine, broadcast query panel, one
    corpus scan (similarity/ann.py hard_negative_topk)."""
    from .ann import hard_negative_topk

    emb = load_table(spark, "embeddings", sf_dir)
    queries = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        "embedding",
        F.col("label").alias("query_label"),
    )
    return hard_negative_topk(emb, queries, k=K).orderBy("query_id", "rank")


EMBEDDINGS_HARD_NEGATIVES_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS negative_id, e.label AS negative_label,
         ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM q, embeddings e
  WHERE e.label != q.qlabel
)
SELECT query_id, rank, negative_id, negative_label, cosine FROM (
  SELECT query_id, negative_id, negative_label, cosine,
         CAST(ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, negative_id ASC) AS INTEGER) AS rank
  FROM scored
)
WHERE rank <= {K}
ORDER BY query_id, rank
"""


# ─────────────── X15: random-projection (JL) recall ───────────────

RP_OUT_DIM = 16
RP_SEED = 11


def rp_matrix(dim: int = DIM, out_dim: int = RP_OUT_DIM, seed: int = RP_SEED):
    """Deterministic Gaussian Johnson–Lindenstrauss projection rows,
    scaled 1/√out_dim (data-independent, same policy as the LSH
    hyperplanes and D8 anchor centroids — reproducible in generated
    SQL)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    m = rng.normal(size=(out_dim, dim)) / np.sqrt(out_dim)
    return [[float(v) for v in row] for row in m]


def _project(emb: DataFrame, rows) -> DataFrame:
    from ..functions.vectors import dot

    proj = F.array(
        *[
            dot(
                F.col("embedding").cast("array<double>"),
                F.array(*[F.lit(float(v)) for v in row]),
            )
            for row in rows
        ]
    )
    return emb.select("vec_id", proj.alias("embedding"))


def embeddings_rp_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: recall@5 after a 64→16 Gaussian random projection — the
    ROTATION-based compression eval next to X11's truncation
    (Matryoshka drops trained-to-be-suffix dims; JL projects through
    a random rotation and works on any embedding). Both engines
    compute the projection from the SAME literal matrix, the
    projected dot products fold left-to-right identically, and the
    recall machinery is X10/X11's oracled brute force. Output
    (query_id, n_hit, recall_ppm) per query — the decision table for
    'can we serve at 1/4 the bandwidth?'."""
    emb = load_table(spark, "embeddings", sf_dir)
    rows = rp_matrix()
    full = brute_force_topk(emb, _queries(emb), k=K).select("query_id", "neighbor_id")
    proj = _project(emb, rows)
    topp = brute_force_topk(proj, _queries(proj), k=K).select("query_id", "neighbor_id")
    hits = (
        topp.join(full, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    spine = spark.range(N_QUERIES).select(F.col("id").cast("long").alias("query_id"))
    return (
        spine.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.expr(f"coalesce(n_hit, 0) * 1000000 div {K}").cast("long").alias("recall_ppm"),
        )
        .orderBy("query_id")
    )


def _rp_matrix_sql() -> str:
    legs = []
    for row in rp_matrix():
        lits = ", ".join(repr(v) for v in row)
        legs.append(f"LIST_DOT_PRODUCT(CAST(embedding AS DOUBLE[]), [{lits}])")
    return "[" + ", ".join(legs) + "]"


EMBEDDINGS_RP_RECALL_SQL = f"""
WITH exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id ASC
           ) AS rank
    FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {N_QUERIES}) q,
         embeddings e
    WHERE e.vec_id != q.query_id
  ) WHERE rank <= {K}
),
proj AS (
  SELECT vec_id, {_rp_matrix_sql()} AS pe FROM embeddings
),
approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(q.qv, e.pe), 6) DESC,
                      e.vec_id ASC
           ) AS rank
    FROM (SELECT vec_id AS query_id, pe AS qv FROM proj WHERE vec_id < {N_QUERIES}) q,
         proj e
    WHERE e.vec_id != q.query_id
  ) WHERE rank <= {K}
),
hits AS (
  SELECT a.query_id, COUNT(*) AS n_hit
  FROM approx a JOIN exact x ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
  GROUP BY a.query_id
),
spine AS (SELECT UNNEST(GENERATE_SERIES(0, {N_QUERIES - 1})) AS query_id)
SELECT CAST(s.query_id AS BIGINT) AS query_id,
       CAST(COALESCE(h.n_hit, 0) AS BIGINT) AS n_hit,
       CAST(COALESCE(h.n_hit, 0) * 1000000 // {K} AS BIGINT) AS recall_ppm
FROM spine s LEFT JOIN hits h ON s.query_id = h.query_id
ORDER BY query_id
"""


# ─────────────── X16: per-label centroid-cosine corpus audit ───────────────


def centroid_cosine_audit(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Cosine of each label's centroid to the CORPUS centroid — the
    one-number-per-class separation/drift audit (a class whose mean
    vector points away from the blend is over-represented in a
    direction the rest of the corpus doesn't share; the scalar read
    on top of `embeddings_label_stats`' raw components).

    Exactness: components quantized to 1e-6 integers ONCE (CAST of a
    float to double is exact widening, so both engines quantize the
    same values), per-label sums exact DECIMAL(38,0); cosine is
    scale-invariant so raw SUMS stand in for means; dot/norms fold
    over the dim-bounded centroid table in decimal, with one
    fixed-parenthesization double combination (correctly-rounded
    sqrt/mul/div) onto the ppm grid.

    Shape: one posexplode + map-side-combined (label × dim) agg; the
    corpus centroid re-aggregates that table (no second scan); the
    dim-sized global vector broadcasts back. Nothing downstream of
    the first agg exceeds labels × dims rows."""
    dec = "decimal(38,0)"
    q = emb.select(
        "label", F.posexplode(vec_col).alias("i", "v")
    ).select(
        "label",
        "i",
        F.floor(F.col("v").cast("double") * F.lit(1_000_000.0) + F.lit(0.5))
        .cast(dec)
        .alias("q"),
    )
    sli = q.groupBy("label", "i").agg(F.sum("q").alias("s"))
    n_l = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_vecs"))
    g = sli.groupBy("i").agg(F.sum("s").alias("gi"))
    b2 = g.agg(F.sum(F.col("gi") * F.col("gi")).alias("b2"))
    per_label = (
        sli.join(F.broadcast(g), "i")
        .groupBy("label")
        .agg(
            F.sum(F.col("s") * F.col("gi")).alias("dot"),
            F.sum(F.col("s") * F.col("s")).alias("a2"),
        )
        .crossJoin(F.broadcast(b2))
        .join(F.broadcast(n_l), "label")
    )
    return per_label.select(
        "label",
        F.col("n_vecs").cast("long").alias("n_vecs"),
        F.floor(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("a2").cast("double")) * F.sqrt(F.col("b2").cast("double")))
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cos_to_corpus_ppm"),
    ).orderBy("label")


def embeddings_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: per-label centroid cosine to the corpus centroid."""
    emb = load_table(spark, "embeddings", sf_dir)
    return centroid_cosine_audit(emb)


EMBEDDINGS_CENTROID_DRIFT_SQL = """
WITH q AS (
  SELECT label, i - 1 AS i,
         CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS DECIMAL(38,0)) AS q
  FROM embeddings,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i)
),
sli AS (SELECT label, i, SUM(q) AS s FROM q GROUP BY label, i),
nl AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs FROM embeddings GROUP BY label),
g AS (SELECT i, SUM(s) AS gi FROM sli GROUP BY i),
b2 AS (SELECT SUM(gi * gi) AS b2 FROM g),
per_label AS (
  SELECT label, SUM(s * gi) AS dot, SUM(s * s) AS a2
  FROM sli JOIN g USING (i)
  GROUP BY label
)
SELECT label, n_vecs,
       CAST(FLOOR(CAST(dot AS DOUBLE)
                  / (SQRT(CAST(a2 AS DOUBLE)) * SQRT(CAST(b2 AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS cos_to_corpus_ppm
FROM per_label JOIN nl USING (label) CROSS JOIN b2
ORDER BY label
"""


# ─────────────── X17: inter-label centroid separation matrix ───────────────


def label_separation_matrix(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Pairwise cosine between label CENTROIDS — the confusion-risk
    matrix next to X16's one-number-per-class drift audit (X16 says
    how far each class sits from the blend; this says which class
    PAIRS a nearest-class-mean classifier would confuse: cosine near
    1 = overlapping classes, near 0 = orthogonal).

    Same exactness contract as X16: 1e-6-quantized integer component
    sums in DECIMAL(38,0) (cosine is scale-invariant, raw sums stand
    in for means), dot/norms folded in decimal, one fixed IEEE
    combination per pair onto the ppm grid.

    Shape: one posexplode + (label × dim) agg; the pair matrix is a
    labels²×dims self-equi-join on the dim key of that TINY table —
    bounded by the label vocabulary at any corpus size."""
    dec = "decimal(38,0)"
    sli = (
        emb.select("label", F.posexplode(vec_col).alias("i", "v"))
        .select(
            "label",
            "i",
            F.floor(F.col("v").cast("double") * F.lit(1_000_000.0) + F.lit(0.5))
            .cast(dec)
            .alias("s"),
        )
        .groupBy("label", "i")
        .agg(F.sum("s").alias("s"))
    )
    a2 = sli.groupBy("label").agg(F.sum(F.col("s") * F.col("s")).alias("a2"))
    a = sli.select(F.col("label").alias("la"), "i", F.col("s").alias("sa"))
    b = sli.select(F.col("label").alias("lb"), "i", F.col("s").alias("sb"))
    pairs = (
        a.join(b, "i")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(F.sum(F.col("sa") * F.col("sb")).alias("dot"))
        .join(F.broadcast(a2.select(F.col("label").alias("la"), F.col("a2").alias("n2a"))), "la")
        .join(F.broadcast(a2.select(F.col("label").alias("lb"), F.col("a2").alias("n2b"))), "lb")
    )
    return pairs.select(
        F.col("la").alias("label_a"),
        F.col("lb").alias("label_b"),
        F.floor(
            F.col("dot").cast("double")
            / (F.sqrt(F.col("n2a").cast("double")) * F.sqrt(F.col("n2b").cast("double")))
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("cos_ppm"),
    ).orderBy("label_a", "label_b")


def embeddings_label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate: pairwise label-centroid cosine matrix."""
    emb = load_table(spark, "embeddings", sf_dir)
    return label_separation_matrix(emb)


EMBEDDINGS_LABEL_SEPARATION_SQL = """
WITH sli AS (
  SELECT label, i - 1 AS i,
         SUM(CAST(FLOOR(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5) AS DECIMAL(38,0))) AS s
  FROM embeddings,
       LATERAL (SELECT UNNEST(GENERATE_SERIES(1, LEN(embedding))) AS i)
  GROUP BY label, i - 1
),
a2 AS (SELECT label, SUM(s * s) AS a2 FROM sli GROUP BY label),
pairs AS (
  SELECT a.label AS la, b.label AS lb, SUM(a.s * b.s) AS dot
  FROM sli a JOIN sli b ON a.i = b.i AND a.label < b.label
  GROUP BY 1, 2
)
SELECT la AS label_a, lb AS label_b,
       CAST(FLOOR(CAST(dot AS DOUBLE)
                  / (SQRT(CAST(x.a2 AS DOUBLE)) * SQRT(CAST(y.a2 AS DOUBLE)))
                  * 1000000.0 + 0.5) AS BIGINT) AS cos_ppm
FROM pairs
JOIN a2 x ON x.label = la
JOIN a2 y ON y.label = lb
ORDER BY label_a, label_b
"""


def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate (X18): METADATA-FILTERED exact cosine top-5 — each of the
    first 10 queries searches only corpus vectors sharing its label
    (the "filtered ANN" regime every vector store ships: predicate +
    similarity in one query). Spark-first shape: the label constraint
    is an EQUI-JOIN on the label column, not a post-filter on an
    unfiltered score scan — the corpus shuffles once on the
    (low-cardinality) label key, each partition scores only its
    label's vectors, and at 100 TB label partitioning bounds the
    scored set to the label's share of the corpus. No cross join
    anywhere (contrast ann_cosine_topk, whose unfiltered scan IS the
    broadcast-cross shape)."""
    from ..functions.vectors import dot, norm

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        F.col("embedding").alias("__qv"),
        norm(F.col("embedding")).alias("__qn"),
    )
    denom = F.col("__qn") * norm(F.col("embedding"))
    scored = (
        emb.join(F.broadcast(q), F.col("label") == F.col("qlabel"))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            F.round(
                F.when(denom > 0, dot(F.col("__qv"), F.col("embedding")) / denom)
                .otherwise(F.lit(0.0)),
                6,
            ).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "rank", F.col("vec_id").alias("neighbor_id"), "cosine")
        .orderBy("query_id", "rank")
    )


ANN_FILTERED_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel, CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         ROUND(LIST_COSINE_SIMILARITY(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS cosine
  FROM q JOIN embeddings e ON e.label = q.qlabel
  WHERE e.vec_id != q.query_id
)
SELECT query_id, rank, neighbor_id, cosine FROM (
  SELECT query_id, neighbor_id, cosine,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC
         ) AS INTEGER) AS rank
  FROM scored
) WHERE rank <= {K}
ORDER BY query_id, rank
"""
