"""The xlsx_lite Python DataSource (PySpark 4 DataSource API):
spark.read.format("xlsx_lite") over stdlib-written workbooks, one
input partition per file."""

from __future__ import annotations

from data_frame_demo_etl_spark.sources.xlsx_datasource import XlsxLiteDataSource
from data_frame_demo_etl_spark.sources.xlsx_lite import write_xlsx


def _write(path, rows):
    write_xlsx(str(path), {"Data": rows})


def test_xlsx_datasource_reads_single_file(spark, tmp_path):
    _write(tmp_path / "a.xlsx", [["sku", "qty"], ["A-1", 3], ["A-2", 5.5]])
    spark.dataSource.register(XlsxLiteDataSource)
    df = spark.read.format("xlsx_lite").load(str(tmp_path / "a.xlsx"))
    assert df.columns == ["sku", "qty"]
    assert [tuple(r) for r in df.orderBy("sku").collect()] == [
        ("A-1", "3"),
        ("A-2", "5.5"),
    ]
    assert all(t == "string" for _, t in df.dtypes)


def test_xlsx_datasource_directory_is_one_partition_per_file(spark, tmp_path):
    d = tmp_path / "shards"
    d.mkdir()
    for i in range(3):
        _write(d / f"part{i}.xlsx", [["sku", "qty"], [f"S-{i}", i]])
    spark.dataSource.register(XlsxLiteDataSource)
    df = spark.read.format("xlsx_lite").load(str(d))
    assert df.rdd.getNumPartitions() == 3
    assert sorted(tuple(r) for r in df.collect()) == [
        ("S-0", "0"),
        ("S-1", "1"),
        ("S-2", "2"),
    ]


def test_xlsx_datasource_header_row_and_sheet_options(spark, tmp_path):
    write_xlsx(
        str(tmp_path / "b.xlsx"),
        {
            "Ignore": [["x"], [1]],
            "Data": [["Report 2024", None], ["sku", "qty"], ["B-1", 7]],
        },
    )
    spark.dataSource.register(XlsxLiteDataSource)
    df = (
        spark.read.format("xlsx_lite")
        .option("sheet", "Data")
        .option("header_row", "1")
        .load(str(tmp_path / "b.xlsx"))
    )
    assert df.columns == ["sku", "qty"]
    assert [tuple(r) for r in df.collect()] == [("B-1", "7")]


def test_xlsx_datasource_ragged_rows_padded(spark, tmp_path):
    _write(tmp_path / "c.xlsx", [["a", "b", "c"], [1, 2, 3], [4]])
    spark.dataSource.register(XlsxLiteDataSource)
    got = sorted(
        tuple(r)
        for r in spark.read.format("xlsx_lite").load(str(tmp_path / "c.xlsx")).collect()
    )
    assert got == [("1", "2", "3"), ("4", None, None)]


def test_xlsx_datasource_write_roundtrip(spark, tmp_path):
    """df.write.format('xlsx_lite'): one workbook per partition +
    _SUCCESS manifest; read back through the same source."""
    spark.dataSource.register(XlsxLiteDataSource)
    df = spark.createDataFrame(
        [(i, f"name-{i}") for i in range(10)], "id long, name string"
    ).repartition(2)
    out = tmp_path / "sink"
    df.write.format("xlsx_lite").mode("overwrite").save(str(out))
    files = sorted(out.glob("part-*.xlsx"))
    assert len(files) == 2 and (out / "_SUCCESS").exists()
    manifest = (out / "_SUCCESS").read_text().strip().splitlines()
    assert sum(int(l.split("\t")[1]) for l in manifest) == 10

    back = spark.read.format("xlsx_lite").load(str(out))
    assert back.columns == ["id", "name"]
    assert sorted((r.id, r.name) for r in back.collect()) == [
        (str(i), f"name-{i}") for i in range(10)
    ]


def test_xlsx_datasource_write_overwrite_replaces(spark, tmp_path):
    spark.dataSource.register(XlsxLiteDataSource)
    out = tmp_path / "sink2"
    spark.createDataFrame([(1,)], "a long").coalesce(1).write.format(
        "xlsx_lite"
    ).mode("overwrite").save(str(out))
    spark.createDataFrame([(2,), (3,)], "a long").coalesce(1).write.format(
        "xlsx_lite"
    ).mode("overwrite").save(str(out))
    back = spark.read.format("xlsx_lite").load(str(out))
    assert sorted(r.a for r in back.collect()) == ["2", "3"]


def test_xlsx_datasource_reader_honors_success_manifest(spark, tmp_path):
    """An orphan part file from a retried (uncommitted) task must not
    be double-read: with _SUCCESS present, only listed files load."""
    spark.dataSource.register(XlsxLiteDataSource)
    out = tmp_path / "sink3"
    spark.createDataFrame([(1,), (2,)], "a long").coalesce(1).write.format(
        "xlsx_lite"
    ).mode("overwrite").save(str(out))
    # simulate a failed attempt's leftover
    _write(out / "part-99999-deadbeef.xlsx", [["a"], [777]])
    got = sorted(r.a for r in spark.read.format("xlsx_lite").load(str(out)).collect())
    assert got == ["1", "2"]


def test_xlsx_datasource_filter_pushdown(spark, tmp_path):
    """PySpark 4.1 pushFilters: string predicates are applied inside
    the Python reader (before the Arrow boundary) and produce exactly
    the rows Spark would have kept."""
    rows = [["sku", "qty", "note"]] + [
        [f"S-{i:02d}", i, None if i % 3 == 0 else f"n{i}"] for i in range(12)
    ]
    _write(tmp_path / "f.xlsx", rows)
    spark.dataSource.register(XlsxLiteDataSource)
    # reader() runs in a planning worker with no active session, so the
    # driver forwards the conf as an option (the documented pattern)
    assert (
        spark.conf.get("spark.sql.python.filterPushdown.enabled") == "true"
    )
    df = (
        spark.read.format("xlsx_lite")
        .option("filter_pushdown", "true")
        .load(str(tmp_path / "f.xlsx"))
    )

    from pyspark.sql import functions as F

    got = sorted(
        r.sku
        for r in df.filter(
            (F.col("sku") >= "S-03")
            & F.col("sku").startswith("S-0")
            & F.col("note").isNotNull()
        ).collect()
    )
    assert got == ["S-04", "S-05", "S-07", "S-08"]

    # IN + contains + equality
    assert sorted(
        r.sku
        for r in df.filter(F.col("qty").isin("2", "5", "7") & F.col("note").contains("n")).collect()
    ) == ["S-02", "S-05", "S-07"]

    # pushdown visible in the physical plan: the Filter node is GONE
    # (Spark trusts the pushed predicate and does not re-evaluate it;
    # the Python BatchScan renders no PushedFilters label)
    plan = (
        df.filter(F.col("sku") == "S-01")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchScan xlsx_lite" in plan and "Filter " not in plan, plan[:1500]
    # ...while an UNpushable filter stays in the plan
    plan2 = (
        df.filter(F.col("sku") > F.col("note"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Filter " in plan2, plan2[:1500]

    # an unsupported filter (column-to-column) still answers correctly
    assert df.filter(F.col("sku") > F.col("note")).count() == 0


def test_xlsx_datasource_works_with_pushdown_disabled(spark, tmp_path):
    """Vanilla sessions default spark.sql.python.filterPushdown.enabled
    to FALSE, and PySpark 4.1 then refuses to init a pushFilters-capable
    reader. The source must degrade to the plain-scan reader (round-5
    verdict: the driver-side ingest_excel_datasource ERR)."""
    rows = [["sku", "qty"]] + [[f"S-{i:02d}", i] for i in range(6)]
    _write(tmp_path / "f.xlsx", rows)
    spark.dataSource.register(XlsxLiteDataSource)
    old = spark.conf.get("spark.sql.python.filterPushdown.enabled", "false")
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
    try:
        from pyspark.sql import functions as F

        df = spark.read.format("xlsx_lite").load(str(tmp_path / "f.xlsx"))
        # filters still answer correctly — evaluated by Spark above the
        # scan instead of inside the reader
        got = sorted(r.sku for r in df.filter(F.col("sku") >= "S-03").collect())
        assert got == ["S-03", "S-04", "S-05"]
        plan = (
            df.filter(F.col("sku") == "S-01")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchScan xlsx_lite" in plan and "Filter " in plan, plan[:1500]
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", old)
