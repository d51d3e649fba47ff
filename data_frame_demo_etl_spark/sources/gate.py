"""Correctness-gate wrappers for template-driven ingestion, rename
normalization, and the end-to-end pipeline. Source files (CSV/JSONL)
are materialized deterministically from the driver parquet into
`.tmp/` inside the repo, so the oracle can read the same rows straight
from parquet.
"""

from __future__ import annotations

import hashlib
from pathlib import Path

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline import run_pipeline
from ..template_config import TemplateConfig
from ..sources.readers import read_with_template, _project_spark
from .catalog import load_table

TMP_ROOT = Path(__file__).resolve().parents[2] / ".tmp"


def _tmp_dir(sf_dir: str, name: str) -> Path:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    d = TMP_ROOT / f"{name}_{tag}"
    d.mkdir(parents=True, exist_ok=True)
    return d


def _materialize_part_csv(sf_dir: str) -> Path:
    """part.parquet → messy CSV: comment line, junk line, header at
    physical line 2, ';' delimited."""
    out = _tmp_dir(sf_dir, "ingest_csv") / "part.csv"
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet").sort_values("p_partkey")
    body = pdf.to_csv(sep=";", index=False)
    out.write_text("# exported by gate\njunk;junk;junk;junk;junk;junk\n" + body, encoding="utf-8")
    return out


_CSV_TEMPLATE = TemplateConfig(
    source_type="csv",
    header_row=1,
    skiprows=[0],
    delimiter=";",
    columns=["p_partkey", "p_name", "p_retailprice"],
    column_mappings={"p_name": "part_name"},
    provider_name="gate",
)


def ingest_csv_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template CSV ingest: header offset + skiprows + delimiter +
    column subset + rename (the pandas-per-file scale path)."""
    csv_path = _materialize_part_csv(sf_dir)
    df = read_with_template(spark, str(csv_path), _CSV_TEMPLATE)
    return df.orderBy("p_partkey")


INGEST_CSV_TEMPLATE_SQL = """
SELECT p_partkey, p_name AS part_name, p_retailprice
FROM part
ORDER BY p_partkey
"""


def ingest_csv_multifile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Many-small-files ingest: part split into 4 CSV shards read as a
    glob through the pandas-per-file path (parallelized file list)."""
    d = _tmp_dir(sf_dir, "ingest_csv_multi")
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet").sort_values("p_partkey")
    for shard in range(4):
        chunk = pdf[pdf["p_partkey"] % 4 == shard]
        body = chunk.to_csv(sep=";", index=False)
        (d / f"part_{shard}.csv").write_text(
            "# shard export\njunk;junk;junk;junk;junk;junk\n" + body, encoding="utf-8"
        )
    df = read_with_template(spark, str(d / "part_*.csv"), _CSV_TEMPLATE)
    return df.orderBy("p_partkey")


INGEST_CSV_MULTIFILE_SQL = INGEST_CSV_TEMPLATE_SQL


def _materialize_part_xlsx(sf_dir: str) -> Path:
    """part.parquet → xlsx workbook with a merged title row, a junk
    row, the header at physical row 3, then data — exercising sheet
    resolution, skiprows/header_row offsets, and the OOXML reader
    (openpyxl-free via sources.xlsx_lite)."""
    from .xlsx_lite import write_xlsx

    out = _tmp_dir(sf_dir, "ingest_xlsx") / "part.xlsx"
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet").sort_values("p_partkey")
    rows: list[list] = [
        ["Part Export", None, None, None, None, None],
        ["junk", "junk", "junk", "junk", "junk", "junk"],
        list(pdf.columns),
    ]
    for rec in pdf.itertuples(index=False):
        rows.append([v.item() if hasattr(v, "item") else v for v in rec])
    write_xlsx(str(out), {"parts": rows}, {"parts": ["A1:C1"]})
    return out


_XLSX_TEMPLATE = TemplateConfig(
    source_type="excel",
    sheet="parts",
    header_row=1,
    skiprows=[0],
    columns=["p_partkey", "p_name", "p_retailprice"],
    column_mappings={"p_name": "part_name"},
    provider_name="gate",
)


def ingest_excel_template(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Template Excel ingest (S4/E4): the same offset/subset/rename
    semantics as the CSV template, through the dependency-free OOXML
    reader — files parallelized per task via mapInPandas, exactly like
    the CSV pandas path (reference templates.py Excel handling)."""
    xlsx_path = _materialize_part_xlsx(sf_dir)
    df = read_with_template(spark, str(xlsx_path), _XLSX_TEMPLATE)
    return df.orderBy("p_partkey")


INGEST_EXCEL_TEMPLATE_SQL = """
SELECT p_partkey, p_name AS part_name, p_retailprice
FROM part
ORDER BY p_partkey
"""


def ingest_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → jsonl (distributed write) → read back: lossless."""
    target = str(_tmp_dir(sf_dir, "jsonl") / "documents.jsonl")
    docs = load_table(spark, "documents", sf_dir)
    docs.write.mode("overwrite").json(target)
    back = spark.read.schema(
        "doc_id long, text string, lang string, source string, n_chars long"
    ).json(target)
    return back.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id")


INGEST_JSONL_ROUNDTRIP_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id
"""


def ingest_jdbc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5: customer → embedded-Derby JDBC sink → PARTITIONED JDBC read
    back (4 parallel range queries on c_custkey). Same operator pair a
    warehouse pull uses; Derby's driver ships with Spark so the path
    runs offline (reference connectors.py parity)."""
    from .readers import DERBY_DRIVER, read_jdbc, write_jdbc

    db_dir = _tmp_dir(sf_dir, "jdbc") / "derbydb"
    url = f"jdbc:derby:{db_dir};create=true"
    props = {"driver": DERBY_DRIVER}
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_acctbal"
    )
    write_jdbc(cust, url, "customer_rt", props)
    lo, hi = cust.agg(F.min("c_custkey"), F.max("c_custkey")).first()
    tpl = TemplateConfig(source_type="sql", sql_table="customer_rt")
    back = read_jdbc(
        spark,
        tpl,
        url=url,
        properties=props,
        partition_options={
            "partitionColumn": "c_custkey",
            "lowerBound": lo,
            "upperBound": hi,
            "numPartitions": 4,
        },
    )
    return back.orderBy("c_custkey")


INGEST_JDBC_ROUNDTRIP_SQL = """
SELECT c_custkey, c_name, c_acctbal FROM customer ORDER BY c_custkey
"""


def normalize_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filter_and_rename parity: subset + canonical renames."""
    tpl = TemplateConfig(
        columns=["c_custkey", "c_name", "c_acctbal"],
        column_mappings={"c_custkey": "customer_id", "c_name": "customer_name"},
    )
    cust = load_table(spark, "customer", sf_dir)
    return _project_spark(cust, tpl).orderBy("customer_id")


NORMALIZE_RENAME_SQL = """
SELECT c_custkey AS customer_id, c_name AS customer_name, c_acctbal
FROM customer
ORDER BY customer_id
"""


def pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full pipeline: messy CSV → template ingest → transforms →
    contract validation → parquet sink; the gate reads the sink."""
    csv_path = _materialize_part_csv(sf_dir)
    out_path = str(_tmp_dir(sf_dir, "pipeline_out") / "part_clean.parquet")
    tpl = TemplateConfig(
        source_type="csv",
        header_row=1,
        skiprows=[0],
        delimiter=";",
        columns=["p_partkey", "p_name", "p_retailprice"],
        column_mappings={"p_name": "part_name"},
        provider_name="gate",
        trim_strings=True,
        required_fields=["part_name"],
        field_types={"p_retailprice": "float"},
    )
    result = run_pipeline(spark, str(csv_path), tpl, out_path, validation_level="contract")
    assert result.success, result.message
    return (
        spark.read.parquet(out_path)
        .select("p_partkey", "part_name", "p_retailprice", "provider_id")
        .orderBy("p_partkey")
    )


PIPELINE_E2E_SQL = """
SELECT p_partkey, p_name AS part_name, p_retailprice, 'gate' AS provider_id
FROM part
ORDER BY p_partkey
"""


def ingest_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC (distributed columnar write, native Spark
    format beside parquet) → read back: lossless. Covers the second
    first-class columnar format a warehouse must speak; same push-
    down/pruning machinery as the parquet scans."""
    target = str(_tmp_dir(sf_dir, "orc") / "documents.orc")
    docs = load_table(spark, "documents", sf_dir)
    docs.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    return back.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id")


INGEST_ORC_ROUNDTRIP_SQL = """
SELECT doc_id, text, lang, source, n_chars FROM documents ORDER BY doc_id
"""


def ingest_excel_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4 via the PySpark 4 Python DataSource API: part split into 3
    xlsx shards, read back with spark.read.format("xlsx_lite") — one
    input partition per workbook, schema inferred from the first
    file's header on the driver — then typed downstream exactly like
    the CSV raw path."""
    from pyspark.sql import functions as F

    from .xlsx_datasource import XlsxLiteDataSource
    from .xlsx_lite import write_xlsx

    shard_dir = _tmp_dir(sf_dir, "ingest_xlsx_ds")
    marker = shard_dir / ".done"
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet").sort_values("p_partkey")
    if not marker.exists():
        cols = list(pdf.columns)
        n = len(pdf)
        for i in range(3):
            chunk = pdf.iloc[i * n // 3 : (i + 1) * n // 3]
            rows: list[list] = [cols]
            for rec in chunk.itertuples(index=False):
                rows.append([v.item() if hasattr(v, "item") else v for v in rec])
            write_xlsx(str(shard_dir / f"part_{i}.xlsx"), {"parts": rows})
        marker.touch()
    # Vanilla sessions default spark.sql.python.filterPushdown.enabled
    # FALSE and PySpark 4.1 then refuses to init a pushFilters-capable
    # reader ([DATA_SOURCE_PUSHDOWN_DISABLED]). reader() runs in a
    # planning worker with no active session, so forward the caller's
    # effective conf as an option — the session conf itself is NOT
    # mutated (a set here would leak pushdown behavior into every later
    # Python DataSource read on the caller's session).
    pushdown = spark.conf.get(
        "spark.sql.python.filterPushdown.enabled", "false"
    )
    spark.dataSource.register(XlsxLiteDataSource)
    raw = (
        spark.read.format("xlsx_lite")
        .option("filter_pushdown", pushdown)
        .load(str(shard_dir / "*.xlsx"))
    )
    return (
        raw.select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.col("p_name").alias("part_name"),
            F.col("p_retailprice").cast("double").alias("p_retailprice"),
        )
        .orderBy("p_partkey")
    )


INGEST_EXCEL_DATASOURCE_SQL = """
SELECT p_partkey, p_name AS part_name, p_retailprice
FROM part
ORDER BY p_partkey
"""


def _materialize_fixed_width(sf_dir: str) -> "Path":
    """part → a fixed-width text file (the mainframe/EDI layout ETL
    stacks still ingest): p_partkey 10 cols right-aligned, p_name 60
    left-padded, p_retailprice as integer cents 12 right-aligned."""
    out = _tmp_dir(sf_dir, "ingest_fixed_width") / "part.txt"
    if out.exists():
        return out
    pdf = pd.read_parquet(f"{sf_dir}/part.parquet").sort_values("p_partkey")
    lines = []
    for rec in pdf.itertuples(index=False):
        key = str(int(rec.p_partkey)).rjust(10)
        name = str(rec.p_name)[:60].ljust(60)
        cents = str(int(float(rec.p_retailprice) * 100 + 0.5)).rjust(12)
        lines.append(key + name + cents)
    out.write_text("\n".join(lines) + "\n", encoding="utf-8")
    return out


FIXED_WIDTH_SPEC = [  # (column, 1-based start, width)
    ("p_partkey", 1, 10),
    ("part_name", 11, 60),
    ("price_cents", 71, 12),
]


def read_fixed_width(spark: SparkSession, path: str, spec) -> DataFrame:
    """Fixed-width reader: `spark.read.text` (splittable, distributed)
    + one substring projection per column — the whole parse stays in
    whole-stage codegen; no Python touches a row. The spec is
    (name, 1-based start, width) triples, trailing spaces trimmed."""
    raw = spark.read.text(path)
    cols = [
        F.trim(F.substring(F.col("value"), start, width)).alias(name)
        for name, start, width in spec
    ]
    return raw.select(*cols)


def ingest_fixed_width(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S-family gate: part → fixed-width text → distributed
    substring-sliced read → typed columns. Covers the fixed-layout
    flat-file format (mainframe exports, EDI) that has no delimiter
    for a CSV reader to find."""
    path = _materialize_fixed_width(sf_dir)
    raw = read_fixed_width(spark, str(path), FIXED_WIDTH_SPEC)
    return (
        raw.select(
            F.col("p_partkey").cast("long").alias("p_partkey"),
            F.col("part_name"),
            (F.col("price_cents").cast("long")).alias("price_cents"),
        )
        .orderBy("p_partkey")
    )


INGEST_FIXED_WIDTH_SQL = """
SELECT p_partkey,
       p_name AS part_name,
       CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents
FROM part
ORDER BY p_partkey
"""
