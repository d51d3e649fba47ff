"""Dataset export with manifest + quality metrics.

Parity: reference src/exporter.py:69-118 (export_dataset writing
xlsx/jsonl/parquet + manifest.json with rows/columns/dtypes/null_pct/
duplicates). Spark-first: parquet and jsonl are distributed writers;
xlsx is a driver-side tail gated on openpyxl and an explicit row cap
(spreadsheets are not a big-data sink).
"""

from __future__ import annotations

import json
import uuid
from datetime import datetime, timezone
from pathlib import Path

from pyspark.sql import DataFrame

from .operators.profile import profile_metrics

XLSX_ROW_CAP = 1_000_000


def export_dataset(
    df: DataFrame,
    out_dir: str | Path,
    formats: tuple[str, ...] = ("parquet", "jsonl"),
    meta: dict | None = None,
    partition_by: tuple[str, ...] = (),
    compression: str | None = None,
    metrics_mode: str = "scan",
) -> dict[str, Path]:
    """``metrics_mode``:

    - ``"scan"`` (default, reference parity): full metrics via one
      dedicated aggregation pass over the INPUT plan, before writes.
    - ``"output"`` — the at-scale path when the input plan is an
      expensive multi-stage DAG: metrics are aggregated over the
      just-written parquet/ORC output instead, so the input plan
      executes exactly once (the write). Cost is one cheap scan of
      fresh columnar files, proportional to output size. Falls back
      to scan mode when no columnar format is among ``formats``.
      Caveat: with ``partition_by``, output-mode metrics describe the
      written representation — nulls in a partition column become
      Hive's default-partition value on disk, so their null% reads 0.

    (``df.observe`` would make metrics literally free, but see the
    note in operators/profile.py: Spark 4.1's ObservationManager has
    no unregister and any Observation poisons later MLlib actions in
    the session — so this exporter never touches that API.)
    """
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)

    manifest: dict = {
        "run_id": str(uuid.uuid4()),
        "run_started_at": datetime.now(timezone.utc).isoformat(),
        "formats": sorted(set(formats)),
    }
    if meta:
        manifest.update(meta)
    columnar = [f for f in ("parquet", "orc") if f in manifest["formats"]]
    defer_metrics = metrics_mode == "output" and bool(columnar)
    if not defer_metrics:
        manifest["metrics"] = profile_metrics(df)

    written: dict[str, Path] = {}
    for fmt in manifest["formats"]:
        fmt = fmt.lower()
        if fmt == "parquet":
            target = out / "data.parquet"
            writer = df.write.mode("overwrite")
            if compression:
                writer = writer.option("compression", compression)
            if partition_by:
                writer = writer.partitionBy(*partition_by)
            writer.parquet(str(target))
        elif fmt == "orc":
            target = out / "data.orc"
            writer = df.write.mode("overwrite")
            if compression:
                writer = writer.option("compression", compression)
            writer.orc(str(target))
        elif fmt == "jsonl":
            target = out / "data.jsonl"
            df.write.mode("overwrite").json(str(target))
        elif fmt == "csv":
            target = out / "data.csv"
            df.write.mode("overwrite").option("header", "true").csv(str(target))
        elif fmt == "xlsx":
            target = out / "data.xlsx"
            _write_xlsx(df, manifest, target)
        else:
            continue
        written[fmt] = target
        # Fill deferred output-mode metrics as soon as the first
        # columnar format lands, not after the loop: formats are
        # sorted, so "xlsx" serializes the manifest meta sheet LAST —
        # but only if the metrics already exist by then. Computing
        # here keeps the workbook's meta sheet consistent with
        # manifest.json.
        if defer_metrics and fmt == columnar[0]:
            spark = df.sparkSession
            back = spark.read.orc(str(target)) if fmt == "orc" else spark.read.parquet(str(target))
            manifest["metrics"] = profile_metrics(back)
            manifest["metrics"]["source"] = f"{fmt} output"

    manifest["run_completed_at"] = datetime.now(timezone.utc).isoformat()
    manifest_path = out / "manifest.json"
    manifest_path.write_text(json.dumps(manifest, indent=2, default=str), encoding="utf-8")
    written["manifest"] = manifest_path
    return written


def _write_xlsx(df: DataFrame, meta: dict, path: Path) -> None:
    n = df.count()
    if n > XLSX_ROW_CAP:
        raise ValueError(f"refusing xlsx export of {n} rows (cap {XLSX_ROW_CAP})")
    pdf = df.toPandas()
    try:
        import pandas as pd

        with pd.ExcelWriter(path) as writer:  # needs openpyxl
            pdf.to_excel(writer, sheet_name="data", index=False)
            pd.DataFrame(
                [{"key": k, "value": str(v)} for k, v in meta.items()]
            ).to_excel(writer, sheet_name="meta", index=False)
    except ImportError:
        # openpyxl absent: built-in OOXML writer.
        from .sources.xlsx_lite import write_xlsx

        def _cell(v):
            if v is None:
                return None
            if hasattr(v, "item"):  # numpy scalar → Python native
                v = v.item()
            if isinstance(v, float) and v != v:  # NaN
                return None
            return v if isinstance(v, (int, float, bool)) else str(v)

        data_rows = [list(pdf.columns)] + [[_cell(v) for v in row] for row in pdf.itertuples(index=False)]
        meta_rows = [["key", "value"]] + [[str(k), str(v)] for k, v in meta.items()]
        write_xlsx(str(path), {"data": data_rows, "meta": meta_rows})


def export_summary_workbook(
    sheets: dict[str, DataFrame], out_dir: str | Path, formats: tuple[str, ...] = ("parquet",)
) -> dict[str, Path]:
    """Multi-sheet summary export (reference youtube summary workbook
    parity): each named frame lands as its own dataset directory."""
    out = Path(out_dir)
    written: dict[str, Path] = {}
    for name, df in sheets.items():
        res = export_dataset(df, out / name, formats=formats)
        written[name] = res.get(formats[0], out / name)
    return written
