"""Assert every human-readable query-count claim matches the registry.

Counts drifted three rounds in a row when hand-edited (README said
123, SURVEY 124, actual 125) — so the docs carry generated numbers
and this check fails `make docs` on any new drift.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from data_frame_demo_etl_spark import registry


def main() -> int:
    n = len(registry.queries())
    n_oracle = len(registry.oracle_sql())
    root = Path(__file__).resolve().parents[1]
    bad = []

    queries_md = (root / "QUERIES.md").read_text()
    m = re.search(r"(\d+) registered gate queries, (\d+) with DuckDB oracles", queries_md)
    if not m or int(m.group(1)) != n or int(m.group(2)) != n_oracle:
        bad.append(f"QUERIES.md header says {m.groups() if m else None}, registry has {n}/{n_oracle}")
    n_rows = len(re.findall(r"^\| `", queries_md, re.M))
    if n_rows != n:
        bad.append(f"QUERIES.md has {n_rows} table rows, registry has {n}")

    readme = (root / "README.md").read_text()
    m = re.search(r"(\d+) gate queries", readme)
    if m and int(m.group(1)) != n:
        bad.append(f"README.md says {m.group(1)} gate queries, registry has {n}")

    if bad:
        print("COUNT DRIFT:\n  " + "\n  ".join(bad))
        return 1
    print(f"counts OK: {n} registered, {n_oracle} oracle-backed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
