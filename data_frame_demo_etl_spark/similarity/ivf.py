"""IVF (inverted-file) approximate nearest neighbor search.

Coarse quantizer: Spark ML KMeans (seeded) over the embedding corpus;
every vector is assigned to its nearest centroid's posting list. A
query scores only the lists of its ``nprobe`` closest centroids —
corpus work drops from O(N) to O(N · nprobe / k) per query while the
centroid table (k × dim) stays driver-small and broadcastable.

This complements the hyperplane-LSH path in ``ann.py``: IVF adapts to
the data distribution (clusters), LSH is data-independent.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window, functions as F

from ..functions.vectors import dot, norm


def _to_ml_vectors(df: DataFrame, vec_col: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    return df.withColumn("__features", array_to_vector(F.col(vec_col).cast("array<double>")))


def fit_ivf(
    corpus: DataFrame,
    k: int = 16,
    seed: int = 42,
    vec_col: str = "embedding",
    max_iter: int = 10,
):
    """Fit the coarse quantizer; returns (assigned_corpus, centroids).

    centroids: list[list[float]] (k × dim, driver-side — tiny)."""
    from pyspark.ml.clustering import KMeans

    ml_df = _to_ml_vectors(corpus, vec_col)
    km = KMeans(k=k, seed=seed, maxIter=max_iter, featuresCol="__features", predictionCol="__cluster")
    model = km.fit(ml_df)
    assigned = model.transform(ml_df).drop("__features").withColumnRenamed("__cluster", "cluster")
    centroids = [c.tolist() for c in model.clusterCenters()]
    return assigned, centroids


def _nearest_centroids(qvec: np.ndarray, centroids: list[list[float]], nprobe: int) -> list[int]:
    c = np.asarray(centroids)
    d = ((c - qvec) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d)[:nprobe]]


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries_pd,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: each query scores only its nprobe nearest
    posting lists. `queries_pd`: pandas frame (query_id, vec_col)."""
    spark = assigned.sparkSession
    probe_rows = []
    for _, row in queries_pd.iterrows():
        qv = np.asarray(row[vec_col], dtype="float64")
        for cl in _nearest_centroids(qv, centroids, nprobe):
            probe_rows.append((int(row[query_id_col]), cl, [float(x) for x in qv]))
    probes = spark.createDataFrame(
        probe_rows, f"{query_id_col} long, cluster int, __qvec array<double>"
    )

    qn = norm(F.col("__qvec"))
    cn = norm(F.col(vec_col))
    denom = qn * cn
    scored = (
        assigned.join(F.broadcast(probes), "cluster")
        .filter(F.col(id_col) != F.col(query_id_col))
        .select(
            query_id_col,
            id_col,
            F.round(
                F.when(denom > 0, dot(F.col("__qvec"), F.col(vec_col)) / denom).otherwise(0.0), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", F.col(id_col).alias("neighbor_id"), "cosine")
    )


def ann_ivf_topk(spark, sf_dir: str) -> DataFrame:
    """Gate query: IVF top-5 for the first 10 vectors at FULL probe
    (nprobe = all 16 posting lists). Full probe makes IVF exact by
    construction, so the brute-force cosine SQL is its oracle — the
    gate proves the entire assignment → probe → rerank machinery
    loses nothing. The approximate regime (nprobe=4) is recall-tested
    against brute force in pytest."""
    from ..sources.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    assigned, centroids = fit_ivf(emb, k=16)
    assigned = assigned.persist()
    queries_pd = (
        emb.filter(F.col("vec_id") < 10)
        .select(F.col("vec_id").alias("query_id"), "embedding")
        .toPandas()
    )
    return ivf_topk(assigned, centroids, queries_pd, k=5, nprobe=len(centroids)).orderBy(
        "query_id", "rank"
    )


# ─────────────── X14: recall-vs-nprobe sweep (fully oracled) ───────────────

#: The sweep's probe counts. nprobe = SWEEP_CENTROIDS makes IVF exact
#: by construction, so the last row is a built-in self-check: its
#: recall is 1e6 ppm or the machinery is broken.
NPROBE_SWEEP = (1, 2, 4, 8)
SWEEP_CENTROIDS = 8
SWEEP_K = 5
SWEEP_QUERIES = 10


def ivf_nprobe_recall_sweep(
    emb: DataFrame,
    centroids: list[list[float]],
    n_queries: int = SWEEP_QUERIES,
    k: int = SWEEP_K,
    sweep: tuple[int, ...] = NPROBE_SWEEP,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Recall@k as a function of nprobe — the table a deployment
    actually reads to pick its speed/recall operating point (FAISS
    calls this the nprobe sweep; the reference exposes the same dial).

    One candidate table serves every sweep point: each corpus vector
    lives in exactly ONE posting list, whose per-query probe rank pr
    is the rank of that centroid by distance to the query — so the
    top-k under nprobe = p is a rank over candidates with pr ≤ p, and
    the sweep is |sweep| windows over ONE persisted frame (the corpus
    is scanned once, not once per sweep point).

    Exactness & oracle: centroids are deterministic literals in both
    engines (the D8 anchor-centroid policy — a KMeans fit is not
    SQL-reproducible, the sweep's MEASUREMENT machinery is); cosine
    rounds to 6dp before ranking with id tiebreak, the same total
    order as X1. Output: (nprobe, n_queries, hits, recall_ppm), hits
    = Σ_q |IVF top-k ∩ exact top-k|, recall on the exact ppm grid.

    Scale shape: assignment is one narrow scan against a k×d literal;
    candidates are ONE broadcast join of Q·k_cent probe rows against
    the corpus (no corpus shuffle); exact baseline is X1's broadcast
    brute force. Q and the sweep are constants, so every window
    partition is per-query-bounded."""
    from .ann import brute_force_topk
    from .semdedup import assign_clusters

    queries = emb.filter(F.col(id_col) < n_queries).select(
        F.col(id_col).alias("query_id"), vec_col
    )
    assigned = assign_clusters(emb, centroids, vec_col=vec_col, id_col=id_col)

    cent_lit = F.array(*[F.array(*[F.lit(float(v)) for v in c]) for c in centroids])
    from ..functions.vectors import l2_distance

    qexp = queries.select(
        "query_id",
        F.col(vec_col).alias("__qvec"),
        F.posexplode(cent_lit).alias("cluster", "__cent"),
    ).select(
        "query_id",
        "__qvec",
        "cluster",
        l2_distance(F.col("__qvec").cast("array<double>"), F.col("__cent")).alias("__d"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("__d").asc(), F.col("cluster").asc())
    qrank = qexp.withColumn("pr", F.row_number().over(wq)).select(
        "query_id", "cluster", "pr", "__qvec"
    )

    qn = norm(F.col("__qvec"))
    cn = norm(F.col(vec_col))
    denom = qn * cn
    cand = (
        assigned.join(F.broadcast(qrank), "cluster")
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col),
            "pr",
            F.round(
                F.when(denom > 0, dot(F.col("__qvec"), F.col(vec_col)) / denom).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("cosine"),
        )
        .persist()
    )

    exact = brute_force_topk(emb, queries, k=k, id_col=id_col, vec_col=vec_col).select(
        "query_id", F.col("neighbor_id").alias(id_col)
    )

    wtop = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    approx = None
    for p in sweep:
        topp = (
            cand.filter(F.col("pr") <= p)
            .withColumn("__rn", F.row_number().over(wtop))
            .filter(F.col("__rn") <= k)
            .select(F.lit(p).alias("nprobe"), "query_id", id_col)
        )
        approx = topp if approx is None else approx.unionByName(topp)

    hits = approx.join(exact, ["query_id", id_col]).groupBy("nprobe").agg(
        F.count(F.lit(1)).alias("hits")
    )
    expected = n_queries * k
    base = emb.sparkSession.createDataFrame([(p,) for p in sweep], "nprobe int")
    return (
        base.join(hits, "nprobe", "left")
        .select(
            F.col("nprobe").cast("long").alias("nprobe"),
            F.lit(n_queries).cast("long").alias("n_queries"),
            F.coalesce(F.col("hits"), F.lit(0)).cast("long").alias("hits"),
            F.expr(f"coalesce(hits, 0) * 1000000 div {expected}")
            .cast("long")
            .alias("recall_ppm"),
        )
        .orderBy("nprobe")
    )


def ann_ivf_nprobe_sweep(spark, sf_dir: str) -> DataFrame:
    """Gate: recall@5 vs nprobe ∈ {1,2,4,8} over 8 anchor centroids
    for the first 10 queries — fully DuckDB-oracled via the D8
    literal-centroid policy (resolves SURVEY §19.2's open question:
    the 100%-oracle-backed invariant holds AND the deployment gets
    its recall dial)."""
    from ..sources.catalog import load_table
    from .semdedup import anchor_centroids

    emb = load_table(spark, "embeddings", sf_dir)
    return ivf_nprobe_recall_sweep(
        emb, anchor_centroids(k=SWEEP_CENTROIDS, seed=7)
    )


def _sweep_centroid_values() -> str:
    from .semdedup import _centroid_sql_values, anchor_centroids

    return _centroid_sql_values(anchor_centroids(k=SWEEP_CENTROIDS, seed=7))


ANN_IVF_NPROBE_SWEEP_SQL = f"""
WITH cent(cluster, cv) AS (VALUES {{CENTS}}),
assigned AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT e.vec_id, e.embedding, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY e.vec_id
             ORDER BY LIST_DISTANCE(CAST(e.embedding AS DOUBLE[]), c.cv) ASC, c.cluster ASC
           ) AS rk
    FROM embeddings e, cent c
  ) WHERE rk = 1
),
q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < {SWEEP_QUERIES}
),
qrank AS (
  SELECT query_id, cluster, qv,
         ROW_NUMBER() OVER (
           PARTITION BY query_id
           ORDER BY LIST_DISTANCE(CAST(qv AS DOUBLE[]), cv) ASC, cluster ASC
         ) AS pr
  FROM q, cent
),
cand AS (
  SELECT r.query_id, a.vec_id, r.pr,
         ROUND(LIST_COSINE_SIMILARITY(CAST(r.qv AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])), 6) AS cosine
  FROM qrank r JOIN assigned a ON a.cluster = r.cluster
  WHERE a.vec_id != r.query_id
),
exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, e.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (
             PARTITION BY q.query_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(q.qv AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])), 6) DESC,
                      e.vec_id ASC
           ) AS rn
    FROM q, embeddings e WHERE e.vec_id != q.query_id
  ) WHERE rn <= {SWEEP_K}
),
sweep(nprobe) AS (VALUES (1), (2), (4), (8)),
approx AS (
  SELECT nprobe, query_id, vec_id FROM (
    SELECT s.nprobe, c.query_id, c.vec_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.nprobe, c.query_id
             ORDER BY c.cosine DESC, c.vec_id ASC
           ) AS rn
    FROM sweep s JOIN cand c ON c.pr <= s.nprobe
  ) WHERE rn <= {SWEEP_K}
),
hits AS (
  SELECT a.nprobe, COUNT(*) AS hits
  FROM approx a JOIN exact x ON a.query_id = x.query_id AND a.vec_id = x.neighbor_id
  GROUP BY a.nprobe
)
SELECT CAST(s.nprobe AS BIGINT) AS nprobe,
       CAST({SWEEP_QUERIES} AS BIGINT) AS n_queries,
       CAST(COALESCE(h.hits, 0) AS BIGINT) AS hits,
       CAST(COALESCE(h.hits, 0) * 1000000 // {SWEEP_QUERIES * SWEEP_K} AS BIGINT) AS recall_ppm
FROM sweep s LEFT JOIN hits h ON h.nprobe = s.nprobe
ORDER BY nprobe
""".replace("{CENTS}", _sweep_centroid_values())


# ─────────────── X20: incremental index admission (no refit) ───────────────

ADMIT_CENTROIDS = 8
ADMIT_SEED = 7  # shares the sweep's anchor-centroid family
ADMIT_BATCH_MAX = 40  # odd vec_ids below this → 20 batch vectors
ADMIT_DUP_COS = 0.4  # the dedup_embedding (D5) near-dup line


def incremental_admit(
    corpus: DataFrame,
    batch: DataFrame,
    centroids: list[list[float]],
    dup_threshold: float = ADMIT_DUP_COS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X20: admit a NEW batch of vectors into a live IVF index without
    refitting — the D9 incremental-dedup pattern applied to the vector
    side (every production vector store runs this loop: assign each
    arrival to an existing posting list, probe that list for
    near-duplicates, admit or reject). The coarse quantizer is NOT
    refit: centroids are the index's frozen anchors, so admission is
    O(batch · k_cent) assignment + one bounded probe join, never a
    corpus re-cluster.

    Per batch vector: (id, cluster, nn_id, nn_cosine, admitted) —
    cluster is its nearest frozen centroid (L2, tie → lowest cluster,
    the assign_clusters convention), nn is the most-similar corpus
    vector in that ONE posting list (cosine rounded to 6dp, tie →
    lowest id, the X1 total order), admitted = no probe hit at or
    above `dup_threshold` (an empty posting list admits — NULL nn).

    Scale: the batch is the small side by definition — it broadcasts
    to the corpus's posting lists, so corpus bytes never shuffle; the
    per-batch-vector candidate set is ONE posting list, not the
    corpus. Assignment of the corpus itself is the index's standing
    state (here recomputed from the frozen anchors because the gate
    must be self-contained; a deployment reads it from the stored
    index)."""
    from .semdedup import assign_clusters

    assigned = assign_clusters(corpus, centroids, vec_col=vec_col, id_col=id_col)
    bassigned = assign_clusters(batch, centroids, vec_col=vec_col, id_col=id_col)
    probes = bassigned.select(
        F.col(id_col).alias("__bid"), F.col(vec_col).alias("__qvec"), "cluster"
    )
    qn = norm(F.col("__qvec"))
    cn = norm(F.col(vec_col))
    denom = qn * cn
    top1 = (
        assigned.join(F.broadcast(probes), "cluster")
        .select(
            "__bid",
            F.col(id_col).alias("__nid"),
            F.round(
                F.when(denom > 0, dot(F.col("__qvec"), F.col(vec_col)) / denom).otherwise(
                    F.lit(0.0)
                ),
                6,
            ).alias("__cos"),
        )
        # max-struct top-1: max cosine, then min id (negated in the
        # struct so the max picks the LOWEST id among ties).
        .groupBy("__bid")
        .agg(F.max(F.struct(F.col("__cos"), (-F.col("__nid")).alias("__negid"))).alias("__t"))
        .select(
            "__bid",
            (-F.col("__t.__negid")).cast("long").alias("nn_id"),
            F.col("__t.__cos").alias("nn_cosine"),
        )
    )
    return (
        bassigned.select(F.col(id_col), "cluster")
        .join(top1, F.col(id_col) == F.col("__bid"), "left")
        .select(
            F.col(id_col),
            F.col("cluster").cast("int").alias("cluster"),
            "nn_id",
            "nn_cosine",
            (F.col("nn_cosine").isNull() | (F.col("nn_cosine") < F.lit(dup_threshold))).alias(
                "admitted"
            ),
        )
        .orderBy(id_col)
    )


def ann_incremental_admit(spark, sf_dir: str) -> DataFrame:
    """Gate (X20): even vec_ids are the standing index, odd vec_ids
    < 40 the arriving batch; 8 anchor centroids (the sweep family), so
    DuckDB replays assignment, the single-list probe, the 6dp-rounded
    top-1 and the admission rule end to end."""
    from ..sources.catalog import load_table
    from .semdedup import anchor_centroids

    emb = load_table(spark, "embeddings", sf_dir)
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    batch = emb.filter((F.col("vec_id") % 2 == 1) & (F.col("vec_id") < ADMIT_BATCH_MAX))
    return incremental_admit(
        corpus, batch, anchor_centroids(k=ADMIT_CENTROIDS, seed=ADMIT_SEED)
    )


def _admit_centroid_values() -> str:
    from .semdedup import _centroid_sql_values, anchor_centroids

    return _centroid_sql_values(anchor_centroids(k=ADMIT_CENTROIDS, seed=ADMIT_SEED))


ANN_INCREMENTAL_ADMIT_SQL = f"""
WITH cent(cluster, cv) AS (VALUES {{CENTS}}),
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
batch AS (
  SELECT vec_id, embedding FROM embeddings
  WHERE vec_id % 2 = 1 AND vec_id < {ADMIT_BATCH_MAX}
),
assigned AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT c0.vec_id, c0.embedding, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY c0.vec_id
             ORDER BY LIST_DISTANCE(CAST(c0.embedding AS DOUBLE[]), c.cv) ASC, c.cluster ASC
           ) AS rk
    FROM corpus c0, cent c
  ) WHERE rk = 1
),
bassigned AS (
  SELECT vec_id, embedding, cluster FROM (
    SELECT b.vec_id, b.embedding, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY LIST_DISTANCE(CAST(b.embedding AS DOUBLE[]), c.cv) ASC, c.cluster ASC
           ) AS rk
    FROM batch b, cent c
  ) WHERE rk = 1
),
top1 AS (
  SELECT bid, nid, cosine FROM (
    SELECT b.vec_id AS bid, a.vec_id AS nid,
           ROUND(LIST_COSINE_SIMILARITY(CAST(b.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])), 6) AS cosine,
           ROW_NUMBER() OVER (
             PARTITION BY b.vec_id
             ORDER BY ROUND(LIST_COSINE_SIMILARITY(CAST(b.embedding AS DOUBLE[]), CAST(a.embedding AS DOUBLE[])), 6) DESC,
                      a.vec_id ASC
           ) AS rn
    FROM bassigned b JOIN assigned a ON a.cluster = b.cluster
  ) WHERE rn = 1
)
SELECT b.vec_id,
       CAST(b.cluster AS INTEGER) AS cluster,
       t.nid AS nn_id,
       t.cosine AS nn_cosine,
       (t.cosine IS NULL OR t.cosine < {ADMIT_DUP_COS}) AS admitted
FROM bassigned b LEFT JOIN top1 t ON t.bid = b.vec_id
ORDER BY b.vec_id
""".replace("{CENTS}", _admit_centroid_values())


# ─────────────── X21: tombstone deletion + compaction audit ───────────────

TOMBSTONE_MOD = 10  # gate: every 10th vec_id is deleted
COMPACT_LIVE_PPM = 500_000  # below half live → rebuild the posting list


def index_delete_compact(
    corpus: DataFrame,
    tombstones: DataFrame,
    centroids: list[list[float]],
    compact_below_ppm: int = COMPACT_LIVE_PPM,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """X21: the other half of index maintenance (X20 admits, this
    deletes): mark `tombstones` ids deleted, report per-posting-list
    occupancy — (cluster, n_before, n_deleted, n_after, live_ppm,
    needs_compaction) — where needs_compaction flags lists whose live
    fraction fell below the rebuild line (the operational read every
    vector store acts on: a half-dead list scans 2× per probe hit).
    Deletion itself is an anti-join against the tombstone set; the
    FROZEN anchor centroids mean compaction never re-clusters, so the
    X20 batch-vs-rebuild equality extends to the deleted index
    (pinned in pytest: a probe of the compacted index never returns a
    tombstoned id and equals a probe of an index built without them).

    Scale: tombstone sets are small by nature — broadcast semi/anti
    joins against the assigned corpus; the report is k_cent rows."""
    from .semdedup import assign_clusters

    assigned = assign_clusters(corpus, centroids, vec_col=vec_col, id_col=id_col)
    t_ids = tombstones.select(F.col(id_col)).distinct()
    flagged = assigned.join(
        F.broadcast(t_ids.withColumn("__dead", F.lit(True))), id_col, "left"
    )
    return (
        flagged.groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.count_if(F.col("__dead")).alias("n_deleted"),
        )
        .select(
            F.col("cluster").cast("int").alias("cluster"),
            F.col("n_before").cast("long").alias("n_before"),
            F.col("n_deleted").cast("long").alias("n_deleted"),
            (F.col("n_before") - F.col("n_deleted")).cast("long").alias("n_after"),
            F.expr(
                "cast((n_before - n_deleted) * 1000000 div n_before as bigint)"
            ).alias("live_ppm"),
            (
                F.expr("(n_before - n_deleted) * 1000000 div n_before")
                < F.lit(compact_below_ppm)
            ).alias("needs_compaction"),
        )
        .orderBy("cluster")
    )


def ann_delete_compact(spark, sf_dir: str) -> DataFrame:
    """Gate (X21): delete every 10th vec_id from the standing even-id
    index (the X20 corpus) and report per-posting-list occupancy over
    the 8 anchor centroids."""
    from ..sources.catalog import load_table
    from .semdedup import anchor_centroids

    emb = load_table(spark, "embeddings", sf_dir)
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    tombstones = corpus.filter(F.col("vec_id") % TOMBSTONE_MOD == 0)
    return index_delete_compact(
        corpus, tombstones, anchor_centroids(k=ADMIT_CENTROIDS, seed=ADMIT_SEED)
    )


ANN_DELETE_COMPACT_SQL = f"""
WITH cent(cluster, cv) AS (VALUES {{CENTS}}),
corpus AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id % 2 = 0),
assigned AS (
  SELECT vec_id, cluster FROM (
    SELECT c0.vec_id, c.cluster,
           ROW_NUMBER() OVER (
             PARTITION BY c0.vec_id
             ORDER BY LIST_DISTANCE(CAST(c0.embedding AS DOUBLE[]), c.cv) ASC, c.cluster ASC
           ) AS rk
    FROM corpus c0, cent c
  ) WHERE rk = 1
),
g AS (
  SELECT cluster,
         CAST(COUNT(*) AS BIGINT) AS n_before,
         CAST(COUNT(*) FILTER (WHERE vec_id % {TOMBSTONE_MOD} = 0) AS BIGINT) AS n_deleted
  FROM assigned GROUP BY cluster
)
SELECT CAST(cluster AS INTEGER) AS cluster, n_before, n_deleted,
       n_before - n_deleted AS n_after,
       CAST((n_before - n_deleted) * 1000000 // n_before AS BIGINT) AS live_ppm,
       (n_before - n_deleted) * 1000000 // n_before < {COMPACT_LIVE_PPM} AS needs_compaction
FROM g
ORDER BY cluster
""".replace("{CENTS}", _admit_centroid_values())
