"""Cached driver-side preview reads — parity with reference
src/services/io.py (lru-cached pandas previews keyed on resolved path
+ mtime, so repeated header-detection / mapping passes over the same
upload don't re-read the file; the cache invalidates itself when the
file changes).

Scope note: previews are a DRIVER-side affordance by design — a
preview is ≤ some small nrows of ONE file for header heuristics
(operators/normalize.guess_header_row) and template authoring. Bulk
reads stay on the distributed template readers (sources/readers.py).
"""

from __future__ import annotations

from functools import lru_cache
from pathlib import Path
from typing import Sequence

import pandas as pd


def _file_sig(path: str | Path) -> tuple[str, float | None]:
    resolved = Path(path).resolve()
    try:
        mtime = resolved.stat().st_mtime
    except OSError:
        mtime = None
    return str(resolved), mtime


@lru_cache(maxsize=32)
def _cached_csv_preview(
    path_str: str,
    _mtime: float | None,
    header_row: int | None,
    skiprows: tuple[int, ...],
    nrows: int | None,
    delimiter: str,
    encoding: str,
) -> pd.DataFrame:
    return pd.read_csv(
        path_str,
        header=header_row,
        skiprows=list(skiprows),
        nrows=nrows,
        sep=delimiter,
        encoding=encoding,
    )


@lru_cache(maxsize=32)
def _cached_xlsx_preview(
    path_str: str,
    _mtime: float | None,
    sheet: str | int | None,
    header_row: int | None,
    nrows: int | None,
) -> pd.DataFrame:
    from .xlsx_lite import read_grid

    grid, _ = read_grid(path_str, sheet)
    hdr = header_row if header_row is not None else 0
    cols = grid[hdr] if hdr < len(grid) else []
    body = grid[hdr + 1 :]
    if nrows is not None:
        body = body[:nrows]
    names = [c if c is not None else f"col_{i}" for i, c in enumerate(cols)]
    return pd.DataFrame(body, columns=names or None)


def preview_csv(
    path: str | Path,
    header_row: int | None = 0,
    skiprows: Sequence[int] | None = None,
    nrows: int | None = 50,
    delimiter: str = ",",
    encoding: str = "utf-8",
) -> pd.DataFrame:
    """Cached CSV preview; a copy is returned so callers can mutate."""
    sig, mtime = _file_sig(path)
    return _cached_csv_preview(
        sig, mtime, header_row, tuple(skiprows or ()), nrows, delimiter, encoding
    ).copy()


def preview_xlsx(
    path: str | Path,
    sheet: str | int | None = None,
    header_row: int | None = 0,
    nrows: int | None = 50,
) -> pd.DataFrame:
    """Cached Excel preview through the stdlib OOXML reader."""
    sig, mtime = _file_sig(path)
    return _cached_xlsx_preview(sig, mtime, sheet, header_row, nrows).copy()


def preview_cache_clear() -> None:
    _cached_csv_preview.cache_clear()
    _cached_xlsx_preview.cache_clear()
