"""Minimal versioned parquet tables: append-only JSON log + immutable
data directories — snapshot isolation and time travel for training-data
sets without a table-format dependency.

Layout:

    <table>/
      _versions.json          # the log: one entry per committed version
      _data/v1/ ... v2/ ...   # immutable parquet dirs, one per write

Each log entry lists the data dirs COMPOSING that version, so an
append commits only the new files (copy-on-write at directory
granularity — no rewrite of prior data), while an overwrite starts a
fresh composition. Readers resolve a version (or a timestamp) to its
dir list and load exactly those files; concurrent readers of old
versions are unaffected by later writes. ``vacuum`` deletes dirs no
retained version references.

This is deliberately the 20% of a transaction log that gives
reproducible training snapshots ("train on v12, eval on v12")
at 100 TB layout granularity; it is not a concurrency-safe multi-
writer protocol (single-writer pipelines — the common training-data
case — are the target).
"""

from __future__ import annotations

import json
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_LOG = "_versions.json"
_DATA = "_data"


def _read_log(table: Path) -> list[dict]:
    log = table / _LOG
    if not log.exists():
        return []
    return json.loads(log.read_text(encoding="utf-8"))


def _commit(table: Path, entries: list[dict]) -> None:
    # Atomic single-writer commit: temp file + rename.
    tmp = table / (_LOG + ".tmp")
    tmp.write_text(json.dumps(entries, indent=1), encoding="utf-8")
    tmp.replace(table / _LOG)


def write_version(
    df: DataFrame, path: str, mode: str = "overwrite", ts: float | None = None
) -> int:
    """Commit `df` as a new version; returns the version number.

    mode="overwrite": the new version is exactly `df`.
    mode="append": the new version is the previous composition plus
    `df` (only the new rows are written — copy-on-write).
    """
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    table = Path(path)
    table.mkdir(parents=True, exist_ok=True)
    entries = _read_log(table)
    version = (entries[-1]["version"] + 1) if entries else 1
    data_dir = f"{_DATA}/v{version}"
    df.write.mode("errorifexists").parquet(str(table / data_dir))
    n_new = df.sparkSession.read.parquet(str(table / data_dir)).count()
    dirs = [data_dir]
    rows = n_new
    if mode == "append" and entries:
        prev = entries[-1]
        dirs = prev["dirs"] + dirs
        rows = prev["rows"] + n_new
    entries.append(
        {
            "version": version,
            "ts": ts if ts is not None else time.time(),
            "op": mode,
            "dirs": dirs,
            "rows": rows,
        }
    )
    _commit(table, entries)
    return version


def history(path: str) -> list[dict]:
    return _read_log(Path(path))


def _resolve(table: Path, version: int | None, asof_ts: float | None) -> dict:
    entries = _read_log(table)
    if not entries:
        raise FileNotFoundError(f"no versions committed at {table}")
    if version is not None:
        for e in entries:
            if e["version"] == version:
                return e
        have = [e["version"] for e in entries]
        raise ValueError(f"version {version} not found (available: {have})")
    if asof_ts is not None:
        eligible = [e for e in entries if e["ts"] <= asof_ts]
        if not eligible:
            raise ValueError(f"no version at or before ts={asof_ts}")
        return eligible[-1]
    return entries[-1]


def read_version(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    asof_ts: float | None = None,
) -> DataFrame:
    """Load a committed version (default: latest). `asof_ts` selects
    the last version committed at or before that timestamp."""
    table = Path(path)
    entry = _resolve(table, version, asof_ts)
    return spark.read.parquet(*[str(table / d) for d in entry["dirs"]])


def vacuum(path: str, keep_last: int = 1) -> list[str]:
    """Drop log entries older than the last `keep_last` versions and
    delete data dirs no retained version references. Returns deleted
    dirs. Readers of vacuumed versions break — that is the contract."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    table = Path(path)
    entries = _read_log(table)
    if len(entries) <= keep_last:
        return []
    kept = entries[-keep_last:]
    referenced = {d for e in kept for d in e["dirs"]}
    deleted = []
    for e in entries[:-keep_last]:
        for d in e["dirs"]:
            if d not in referenced and (table / d).exists():
                shutil.rmtree(table / d)
                deleted.append(d)
    _commit(table, kept)
    return sorted(set(deleted))
