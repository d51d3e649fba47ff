"""Python UDTF (Spark 4 user-defined TABLE function) surface: a
chunking UDTF lateral-joined per document, pinned EQUAL to the
JVM-expression `chunk_text` fast path.

This is deliberately a LIB surface, not a registry gate: the
column-expression formulation (sequence/transform/substring, fully
codegen) is the production path at 100 TB; the UDTF exists to cover
the API for operators that genuinely need imperative per-row
expansion (recursive parsers, stateful tokenizers) and to document
the equivalence so nobody "optimizes" into the slow path by accident.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from data_frame_demo_etl_spark.functions.text import chunk_text


@udtf(returnType="chunk_idx int, chunk string")
class ChunkUDTF:
    def eval(self, text: str, chunk_size: int, overlap: int):  # noqa: D102
        if text is None:
            return
        stride = chunk_size - overlap
        idx = 0
        for start in range(0, max(len(text), 1), stride):
            if start > 0 and start >= len(text):
                break
            yield idx, text[start : start + chunk_size]
            idx += 1


def test_udtf_chunking_matches_column_expression(spark):
    rows = [
        (1, "x" * 450),          # 3 full strides + partial
        (2, "short"),            # single partial chunk
        (3, ""),                 # empty text still yields chunk 0
        (4, "y" * 200),          # exactly one window
        (5, "z" * 201),          # one full + one overlap tail
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    fast = docs.select(
        "doc_id", F.explode(chunk_text(F.col("text"), 200, 50)).alias("c")
    ).select("doc_id", "c.chunk_idx", "c.chunk")

    spark.udtf.register("chunk_udtf", ChunkUDTF)
    docs.createOrReplaceTempView("udtf_docs")
    slow = spark.sql(
        "SELECT d.doc_id, t.chunk_idx, t.chunk "
        "FROM udtf_docs d, LATERAL chunk_udtf(d.text, 200, 50) t"
    )

    assert sorted(map(tuple, fast.collect())) == sorted(map(tuple, slow.collect()))
