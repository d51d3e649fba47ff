"""PySpark-native analytics/ETL engine with the capabilities of the
Data-frame-demo-ETL reference (template-driven ETL, combine, query
builder, engagement analytics, export+profiling) re-architected
Spark-first, plus large-scale training-data operators (dedup,
similarity search, text analysis, multimodal plumbing, streaming).

Everything here is built on the public Apache Spark DataFrame/SQL API.
"""

__version__ = "0.1.0"
