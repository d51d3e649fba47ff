"""Versioned parquet tables: snapshot isolation, time travel, vacuum."""

from __future__ import annotations

import pytest

from data_frame_demo_etl_spark.operators.versioned import (
    history,
    read_version,
    vacuum,
    write_version,
)


def _df(spark, lo, hi):
    return spark.createDataFrame([(i, f"r{i}") for i in range(lo, hi)], ["id", "payload"])


def test_versioned_write_append_overwrite_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v1 = write_version(_df(spark, 0, 10), t, ts=100.0)
    v2 = write_version(_df(spark, 10, 15), t, mode="append", ts=200.0)
    v3 = write_version(_df(spark, 100, 103), t, mode="overwrite", ts=300.0)
    assert (v1, v2, v3) == (1, 2, 3)

    # Each version reads exactly its committed composition.
    assert read_version(spark, t, version=1).count() == 10
    ids_v2 = {r.id for r in read_version(spark, t, version=2).collect()}
    assert ids_v2 == set(range(15))  # append = old + new, old files reused
    ids_v3 = {r.id for r in read_version(spark, t).collect()}  # latest
    assert ids_v3 == {100, 101, 102}  # overwrite starts fresh

    # Time travel by timestamp: last version at-or-before ts.
    assert {r.id for r in read_version(spark, t, asof_ts=250.0).collect()} == set(range(15))
    assert read_version(spark, t, asof_ts=100.0).count() == 10
    with pytest.raises(ValueError):
        read_version(spark, t, asof_ts=50.0)
    with pytest.raises(ValueError):
        read_version(spark, t, version=9)

    # History records rows and composition.
    h = history(t)
    assert [e["rows"] for e in h] == [10, 15, 3]
    assert h[1]["dirs"] == ["_data/v1", "_data/v2"]


def test_versioned_vacuum_keeps_referenced_dirs(spark, tmp_path):
    t = str(tmp_path / "tbl")
    write_version(_df(spark, 0, 5), t, ts=1.0)
    write_version(_df(spark, 5, 8), t, mode="append", ts=2.0)
    write_version(_df(spark, 8, 9), t, mode="append", ts=3.0)

    deleted = vacuum(t, keep_last=1)
    # Latest version references v1+v2+v3 dirs, so nothing is deletable.
    assert deleted == []
    assert {r.id for r in read_version(spark, t).collect()} == set(range(9))

    # Overwrite then vacuum: the old composition becomes garbage.
    write_version(_df(spark, 50, 52), t, mode="overwrite", ts=4.0)
    deleted = vacuum(t, keep_last=1)
    assert deleted == ["_data/v1", "_data/v2", "_data/v3"]
    assert {r.id for r in read_version(spark, t).collect()} == {50, 51}
    assert len(history(t)) == 1
    with pytest.raises(ValueError):
        read_version(spark, t, version=1)
