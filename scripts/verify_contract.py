"""Drive the driver contract: every queries() entry vs its oracle at
sf0.01 with TYPED comparison (sorted columns, per-column dtype, sorted
row tuples) — the same signal the external correctness gate records.

Usage: python scripts/verify_contract.py [sf_dir] [name ...]
Prints one line per query: OK/ROWS/SCHEMA/HASH/ERR, then a summary.
"""

from __future__ import annotations

import hashlib
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from data_frame_demo_etl_spark.session import get_spark, release_all_caches  # noqa: E402
from data_frame_demo_etl_spark.sources.catalog import TABLES  # noqa: E402


def typed_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # ns-vs-us timestamp resolution is a pandas-bridge artifact the
        # driver tolerates (r1 passed datetime queries): normalize.
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    h = hashlib.sha256()
    for c in df.columns:
        h.update(f"{c}:{df[c].dtype}".encode())
    body = df.apply(lambda r: tuple(str(v) for v in r), axis=1).tolist() if len(df) else []
    for row in sorted(body):
        h.update(("|".join(row) + "\n").encode())
    return h.hexdigest()


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="verify_contract")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    qs, oracles = E.queries(), E.oracle_sql()
    n_ok = n_bad = n_noracle = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        # Session-owner side of the cache lifecycle contract: operator
        # persists outlive their gate so the caller's action hits the
        # cache; the long-lived checker releases them between queries.
        release_all_caches(spark)
        try:
            sdf = fn(spark, sf).toPandas()
        except Exception:
            print(f"ERR   {name}: spark raised\n{traceback.format_exc(limit=3)}")
            n_bad += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: rows={len(sdf)} (no oracle)")
            n_noracle += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception:
            print(f"ERR   {name}: oracle raised\n{traceback.format_exc(limit=3)}")
            n_bad += 1
            continue
        if len(sdf) != len(odf):
            print(f"ROWS! {name}: spark={len(sdf)} oracle={len(odf)}")
            n_bad += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(f"SCHEMA {name}: spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
            n_bad += 1
            continue
        hs, ho = typed_hash(sdf), typed_hash(odf)
        if hs != ho:
            dt_s = {c: str(sdf[c].dtype) for c in sorted(sdf.columns)}
            dt_o = {c: str(odf[c].dtype) for c in sorted(odf.columns)}
            print(f"HASH! {name}: dtypes spark={dt_s} oracle={dt_o}")
            n_bad += 1
            continue
        print(f"OK    {name} rows={len(sdf)}")
        n_ok += 1
    print(f"\nSUMMARY ok={n_ok} bad={n_bad} rows_only={n_noracle}")
    spark.stop()
    return 1 if n_bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
