"""First-class Excel source via the PySpark 4 Python DataSource API:

    spark.dataSource.register(XlsxLiteDataSource)
    df = spark.read.format("xlsx_lite").option("sheet", "Data").load(path)

Built on the dependency-free OOXML reader (`xlsx_lite.read_grid`) that
also backs the template ingest path (sources/readers.py). What the
DataSource frame adds over the mapInPandas helper: schema inference at
plan time, one input partition PER FILE (a thousand workbook shards
scan in parallel with no driver loop), and composition with every
`spark.read` option/feature — the idiomatic Spark-4 shape for a
custom format (reference parity: templates.py:515-588 reads Excel via
pandas.read_excel on the driver; here the driver touches only the
first file's header).

Semantics: raw cell grid, all columns typed string (numbers rendered
via repr-stable formatting), one row per sheet row after
``header_row``; header cells name the columns (None → ``col_<i>``).
Typing/cleaning stays downstream in the template pipeline, same as
the CSV raw path.
"""

from __future__ import annotations

import glob
import os
from typing import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StringType, StructField, StructType

from .xlsx_lite import read_grid


def _expand_paths(path: str) -> list[str]:
    if os.path.isdir(path):
        # A _SUCCESS manifest (written by XlsxLiteWriter.commit) is
        # authoritative: a retried task leaves an orphan part file on
        # disk that never reached commit — globbing would double-read
        # its rows. Only fall back to the glob for plain directories.
        manifest = os.path.join(path, "_SUCCESS")
        if os.path.exists(manifest):
            names = [
                line.split("\t", 1)[0]
                for line in open(manifest, encoding="utf-8").read().splitlines()
                if line.strip()
            ]
            return sorted(os.path.join(path, n) for n in names)
        return sorted(glob.glob(os.path.join(path, "*.xlsx")))
    hits = sorted(glob.glob(path))
    if not hits:
        raise FileNotFoundError(f"xlsx_lite: no files match {path!r}")
    return hits


def _cell_str(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


def _header(grid: list[list], header_row: int) -> list[str]:
    row = grid[header_row] if header_row < len(grid) else []
    return [
        (str(v) if v is not None else f"col_{i}") for i, v in enumerate(row)
    ]


class XlsxLiteDataSource(DataSource):
    """Options: ``sheet`` (name or 0-based index, default first),
    ``header_row`` (0-based grid row holding column names, default 0).
    ``load(path)`` takes a file, a glob, or a directory of .xlsx."""

    @classmethod
    def name(cls) -> str:
        return "xlsx_lite"

    def _sheet(self):
        s = self.options.get("sheet")
        if s is None:
            return None
        return int(s) if isinstance(s, str) and s.isdigit() else s

    def schema(self) -> StructType:
        paths = _expand_paths(self.options["path"])
        grid, _ = read_grid(paths[0], self._sheet())
        hdr = _header(grid, int(self.options.get("header_row", 0)))
        return StructType([StructField(h, StringType(), True) for h in hdr])

    def writer(self, schema: StructType, overwrite: bool) -> "XlsxLiteWriter":
        return XlsxLiteWriter(self.options["path"], schema, overwrite)

    def _pushdown_enabled(self) -> bool:
        """Should this read use the pushFilters-capable reader?
        PySpark 4.1 REFUSES to initialize a reader that overrides
        pushFilters() when ``spark.sql.python.filterPushdown.enabled``
        is false ([DATA_SOURCE_PUSHDOWN_DISABLED], an init-time
        assertion in pyspark/sql/worker/plan_data_source_read.py — not
        a graceful fallback), so the source must choose its reader
        class by the effective conf to merely function on a vanilla
        session.

        ``reader()`` runs inside a planning Python worker where no
        SparkSession is active, so the conf travels as an explicit
        ``filter_pushdown`` OPTION: callers read the conf on the
        driver and forward it (`.option("filter_pushdown", ...)`,
        the ingest_excel_datasource pattern) — options reach the
        planning worker; session internals don't. The active-session
        conf remains as a fallback for direct driver-side
        invocation; the default is the no-pushdown reader, which is
        valid under either conf value."""
        opt = self.options.get("filter_pushdown")
        if opt is not None:
            return str(opt).lower() == "true"
        try:
            from pyspark.sql import SparkSession

            sess = SparkSession.getActiveSession()
            if sess is not None:
                return (
                    str(
                        sess.conf.get(
                            "spark.sql.python.filterPushdown.enabled", "false"
                        )
                    ).lower()
                    == "true"
                )
        except Exception:
            pass
        return False

    def reader(self, schema: StructType) -> "XlsxLiteBasicReader":
        cls: type[XlsxLiteBasicReader] = (
            XlsxLiteReader if self._pushdown_enabled() else XlsxLiteBasicReader
        )
        return cls(
            paths=_expand_paths(self.options["path"]),
            sheet=self._sheet(),
            header_row=int(self.options.get("header_row", 0)),
            columns=[f.name for f in schema.fields],
        )


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class XlsxLiteBasicReader(DataSourceReader):
    """Plain scan (no filter pushdown): the shape Spark requires when
    ``spark.sql.python.filterPushdown.enabled`` is false. Must NOT
    override ``pushFilters`` — PySpark detects the override and
    asserts at reader init when the conf is off."""

    def __init__(self, paths: list[str], sheet, header_row: int, columns: list[str]):
        self.paths = paths
        self.sheet = sheet
        self.header_row = header_row
        self.columns = columns
        self.n_cols = len(columns)
        self.pushed: list = []

    def _predicate(self):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )

        idx = {c: i for i, c in enumerate(self.columns)}
        checks = []
        for f in self.pushed:
            i = idx[f.attribute[0]]
            if isinstance(f, IsNull):
                checks.append(lambda r, i=i: r[i] is None)
            elif isinstance(f, IsNotNull):
                checks.append(lambda r, i=i: r[i] is not None)
            elif isinstance(f, In):
                checks.append(lambda r, i=i, s=set(f.value): r[i] in s)
            elif isinstance(f, EqualTo):
                checks.append(lambda r, i=i, v=f.value: r[i] == v)
            elif isinstance(f, GreaterThan):
                checks.append(lambda r, i=i, v=f.value: r[i] is not None and r[i] > v)
            elif isinstance(f, GreaterThanOrEqual):
                checks.append(lambda r, i=i, v=f.value: r[i] is not None and r[i] >= v)
            elif isinstance(f, LessThan):
                checks.append(lambda r, i=i, v=f.value: r[i] is not None and r[i] < v)
            elif isinstance(f, LessThanOrEqual):
                checks.append(lambda r, i=i, v=f.value: r[i] is not None and r[i] <= v)
            elif isinstance(f, StringStartsWith):
                checks.append(
                    lambda r, i=i, v=f.value: r[i] is not None and r[i].startswith(v)
                )
            elif isinstance(f, StringEndsWith):
                checks.append(
                    lambda r, i=i, v=f.value: r[i] is not None and r[i].endswith(v)
                )
            elif isinstance(f, StringContains):
                checks.append(lambda r, i=i, v=f.value: r[i] is not None and v in r[i])
        return lambda row: all(c(row) for c in checks)

    def partitions(self) -> list[InputPartition]:
        return [_FilePartition(p) for p in self.paths]

    def read(self, partition: _FilePartition):
        """Yields ONE pyarrow.RecordBatch per workbook — the columnar
        fast path of the DataSource API (no per-row pickling between
        the reader and the JVM). Pushed filters are applied on the
        materialized rows before the batch is built."""
        import pyarrow as pa

        keep = self._predicate()
        grid, _ = read_grid(partition.path, self.sheet)
        rows = []
        for row in grid[self.header_row + 1 :]:
            padded = row[: self.n_cols] + [None] * (self.n_cols - len(row))
            out = tuple(_cell_str(v) for v in padded)
            if keep(out):
                rows.append(out)
        arrays = [
            pa.array([r[i] for r in rows], type=pa.string())
            for i in range(self.n_cols)
        ]
        yield pa.RecordBatch.from_arrays(arrays, names=self.columns)


class XlsxLiteReader(XlsxLiteBasicReader):
    """Pushdown-capable reader — the default when
    ``spark.sql.python.filterPushdown.enabled`` is true."""

    def pushFilters(self, filters):  # noqa: N802 — PySpark API name
        """Row-level filter pushdown (PySpark 4.1 DataSource API):
        string-typed comparisons, membership, null tests, and LIKE
        anchors are applied INSIDE the reader, before rows cross the
        Python→JVM Arrow boundary. Spark does not re-evaluate pushed
        filters, so only exactly-reproducible string predicates are
        accepted; everything else is handed back. Lives on the
        SUBCLASS so the base reader stays legal when the session has
        filter pushdown disabled."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            In,
            IsNotNull,
            IsNull,
            LessThan,
            LessThanOrEqual,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )

        str_ops = (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
            StringContains,
            StringEndsWith,
            StringStartsWith,
        )
        for f in filters:
            attr = getattr(f, "attribute", None)
            col_ok = attr is not None and len(attr) == 1 and attr[0] in self.columns
            if not col_ok:
                yield f
            elif isinstance(f, (IsNull, IsNotNull)):
                self.pushed.append(f)
            elif isinstance(f, In) and all(isinstance(v, str) for v in f.value):
                self.pushed.append(f)
            elif isinstance(f, str_ops) and isinstance(f.value, str):
                self.pushed.append(f)
            else:
                yield f


# ───────────────────────────── writer ─────────────────────────────
# df.write.format("xlsx_lite").mode("overwrite").save(dir): one
# workbook per partition written straight from each task (the
# spreadsheet analog of a distributed part-file sink — unlike the
# driver-side toPandas xlsx tail in exporter.py, nothing funnels
# through the driver), a commit manifest on success, written files
# removed on abort.

from dataclasses import dataclass  # noqa: E402

from pyspark.sql.datasource import (  # noqa: E402
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _XlsxCommit(WriterCommitMessage):
    path: str
    rows: int


class XlsxLiteWriter(DataSourceWriter):
    def __init__(self, path: str, schema, overwrite: bool):
        if overwrite and os.path.isdir(path):
            for old in glob.glob(os.path.join(path, "part-*.xlsx")):
                os.remove(old)
        os.makedirs(path, exist_ok=True)
        self.path = path
        self.columns = [f.name for f in schema.fields]

    def write(self, iterator) -> _XlsxCommit:
        import uuid

        from pyspark import TaskContext

        from .xlsx_lite import write_xlsx

        pid = TaskContext.get().partitionId()
        target = os.path.join(self.path, f"part-{pid:05d}-{uuid.uuid4().hex[:8]}.xlsx")
        rows: list[list] = [list(self.columns)]
        for row in iterator:
            rows.append(
                [v if isinstance(v, (int, float, str)) or v is None else str(v) for v in row]
            )
        write_xlsx(target, {"data": rows})
        return _XlsxCommit(path=target, rows=len(rows) - 1)

    def commit(self, messages) -> None:
        manifest = os.path.join(self.path, "_SUCCESS")
        with open(manifest, "w", encoding="utf-8") as f:
            for m in messages:
                f.write(f"{os.path.basename(m.path)}\t{m.rows}\n")

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)
