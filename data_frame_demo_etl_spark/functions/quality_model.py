"""Trained document-quality classifier — the learned keep/drop filter
that sits after the heuristic rules in a training-data pipeline
(fasttext-classifier role in CCNet/FineWeb-class pipelines, here a
logistic regression over the engine's own quality features).

Spark-first shape: featurization is pure Column expressions (one scan,
no UDFs) assembled into an ML vector; training is MLlib's distributed
L-BFGS logistic regression (each iteration one pass of gradient
partials — the aggregation tree handles 1000 executors); scoring is a
single model.transform, whole-stage-codegen around the one vector op.
Model coefficients are model state (like PQ codebooks / BPE rules):
driver-held, broadcast with the transform.

No SQL oracle by design: float training is iterative and
seed/partition-order sensitive across engines, so the verification
strategy is behavioral (pytest): planted separable corpora must
train to near-perfect held-out accuracy, scores must be reproducible
within a session, and the feature stage must match the Column-level
oracled queries it reuses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import text as T

FEATURES = [
    "n_chars",
    "n_words",
    "mean_word_len",
    "stopword_ratio",
    "punct_ratio",
    "alpha_word_ratio",
    "dup_word_frac",
]


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality features as plain columns — one scan, Column
    expressions only (the same building blocks the oracled heuristic
    queries use)."""
    t = F.col(text_col)
    ws = T.words(t)
    n_words = F.size(ws)
    total_chars = F.aggregate(
        F.transform(ws, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    alpha_words = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    distinct_words = F.size(F.array_distinct(ws))
    nw = F.greatest(n_words, F.lit(1)).cast("double")
    return docs.withColumns(
        {
            "n_chars": F.length(t).cast("double"),
            "n_words": n_words.cast("double"),
            "mean_word_len": total_chars / nw,
            "stopword_ratio": T.stopword_count(t) / nw,
            "punct_ratio": T.punct_ratio(t),
            "alpha_word_ratio": alpha_words / nw,
            "dup_word_frac": (n_words - distinct_words) / nw,
        }
    )


def train_quality_classifier(
    labeled: DataFrame, label_col: str = "label", text_col: str = "text"
):
    """Fit the keep/drop classifier on (text, label∈{0,1}) rows.
    Returns a fitted PipelineModel (assembler + scaler + LR)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import StandardScaler, VectorAssembler

    pipe = Pipeline(
        stages=[
            VectorAssembler(inputCols=FEATURES, outputCol="__feat_raw"),
            StandardScaler(inputCol="__feat_raw", outputCol="__feat", withMean=True),
            LogisticRegression(
                featuresCol="__feat",
                labelCol=label_col,
                maxIter=50,
                regParam=0.01,
            ),
        ]
    )
    return pipe.fit(featurize(labeled, text_col))


def score_documents(model, docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach keep_probability / keep columns; drops the intermediate
    ML columns so the result is a plain relational frame."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(featurize(docs, text_col))
    return scored.withColumn(
        "keep_probability", F.round(vector_to_array("probability")[1], 6)
    ).withColumn("keep", (F.col("prediction") == 1.0)).drop(
        "__feat_raw", "__feat", "rawPrediction", "probability", "prediction"
    )
