"""Cached preview reads (sources/preview.py — reference services/io.py
parity): cache hits on unchanged files, invalidation on mtime change,
and correct slicing."""

from __future__ import annotations

import os

from data_frame_demo_etl_spark.sources.preview import (
    _cached_csv_preview,
    preview_cache_clear,
    preview_csv,
    preview_xlsx,
)
from data_frame_demo_etl_spark.sources.xlsx_lite import write_xlsx


def test_preview_csv_caches_and_invalidates(tmp_path):
    preview_cache_clear()
    p = tmp_path / "d.csv"
    p.write_text("a,b\n1,2\n3,4\n5,6\n")
    df1 = preview_csv(p, nrows=2)
    assert list(df1.columns) == ["a", "b"] and len(df1) == 2
    before = _cached_csv_preview.cache_info().hits
    df2 = preview_csv(p, nrows=2)
    assert _cached_csv_preview.cache_info().hits == before + 1
    assert df2.equals(df1)
    # mutating the returned copy must not poison the cache
    df2["a"] = 0
    assert preview_csv(p, nrows=2)["a"].tolist() == [1, 3]

    # touch the file -> new signature -> fresh read
    p.write_text("a,b\n9,9\n")
    os.utime(p, (1_800_000_000, 1_800_000_000))
    assert preview_csv(p, nrows=2)["a"].tolist() == [9]


def test_preview_xlsx_reads_sheet_and_header(tmp_path):
    preview_cache_clear()
    f = tmp_path / "w.xlsx"
    write_xlsx(str(f), {"S": [["h1", "h2"], [1, 2], [3, 4], [5, 6]]})
    df = preview_xlsx(f, sheet="S", nrows=2)
    assert list(df.columns) == ["h1", "h2"] and len(df) == 2
    assert df.iloc[0].tolist() == [1, 2]
