"""Text retrieval without an external model: feature-hashing TF-IDF
vectors (Spark ML HashingTF + IDF — the classic hashing trick) over
documents or chunks, searched with the cosine ANN machinery.

This closes the loop chunk → vectorize → index → search entirely
inside the engine: the vectorizer is deterministic (hash-based, fixed
seed IDF fit), so retrieval results are reproducible and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .ann import brute_force_topk


def tfidf_vectors(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_features: int = 1024,
    binary: bool = True,
    use_idf: bool = True,
) -> DataFrame:
    """(id_col, embedding: array<double>) — L2-normalized (TF-)IDF via
    the hashing trick. One fit pass (IDF document frequencies) + one
    transform pass.

    ``binary=True`` (default) uses set-presence TF — robust to
    repetition and consistent with set-based (Jaccard) dedup;
    ``binary=False`` weighs term counts. ``use_idf=False`` skips IDF
    weighting — the right call on tiny-vocabulary corpora where
    document frequencies are degenerate (ubiquitous terms get ~zero
    IDF and the vectors collapse onto noise)."""
    from pyspark.ml.feature import IDF, HashingTF, Normalizer, Tokenizer
    from pyspark.ml.functions import vector_to_array

    tokenized = Tokenizer(inputCol=text_col, outputCol="__tokens").transform(
        docs.select(id_col, F.lower(F.col(text_col)).alias(text_col))
    )
    tf = HashingTF(
        inputCol="__tokens", outputCol="__tf", numFeatures=n_features, binary=binary
    ).transform(tokenized)
    if use_idf:
        idf_model = IDF(inputCol="__tf", outputCol="__tfidf").fit(tf)
        tfidf = idf_model.transform(tf)
    else:
        tfidf = tf.withColumnRenamed("__tf", "__tfidf")
    normalized = Normalizer(inputCol="__tfidf", outputCol="__norm", p=2.0).transform(tfidf)
    return normalized.select(
        id_col, vector_to_array("__norm").alias("embedding")
    )


def retrieval_topk(
    corpus: DataFrame,
    query_ids: list[int],
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    n_features: int = 1024,
    binary: bool = True,
    use_idf: bool = True,
) -> DataFrame:
    """Top-k most similar documents for each query id (self excluded):
    (query_id, rank, neighbor_id, cosine)."""
    vecs = tfidf_vectors(corpus, id_col, text_col, n_features, binary, use_idf).persist()
    queries = vecs.filter(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("query_id"), "embedding"
    )
    return brute_force_topk(vecs, queries, k=k, id_col=id_col)


def text_retrieval_topk(spark, sf_dir: str) -> DataFrame:
    """Gate query (rows-only): TF-IDF retrieval for the first 5 docs.
    Validated in pytest: planted near-duplicate documents must
    retrieve their twin at rank 1."""
    from ..sources.catalog import load_table

    docs = load_table(spark, "documents", sf_dir)
    return retrieval_topk(docs, query_ids=[0, 1, 2, 3, 4]).orderBy("query_id", "rank")
