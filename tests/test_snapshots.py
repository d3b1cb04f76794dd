"""Snapshot / time-travel table semantics (sources/snapshots.py)."""

from __future__ import annotations

import pytest

from redmap_spark.sources.snapshots import SnapshotTable


def _counts(df):
    return sorted(r.id for r in df.collect())


def test_append_overwrite_and_time_travel(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    v1 = t.write(spark.range(0, 3), mode="append")
    v2 = t.write(spark.range(3, 5), mode="append")
    v3 = t.write(spark.range(100, 102), mode="overwrite")
    assert (v1, v2, v3) == (1, 2, 3)
    assert _counts(t.read()) == [100, 101]
    assert _counts(t.read(version=1)) == [0, 1, 2]
    assert _counts(t.read(version=2)) == [0, 1, 2, 3, 4]
    # overwrite did not destroy history
    assert [h["op"] for h in t.history()] == ["append", "append", "overwrite"]


def test_time_travel_by_timestamp(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.write(spark.range(0, 2))
    ts_after_v1 = t.history()[-1]["ts"]
    t.write(spark.range(2, 4))
    assert _counts(t.read(as_of_ts=ts_after_v1)) == [0, 1]
    assert _counts(t.read(as_of_ts=ts_after_v1 + 10**6)) == [0, 1, 2, 3]
    with pytest.raises(ValueError, match="no snapshot"):
        t.read(as_of_ts=ts_after_v1 - 10**6)


def test_rollback_is_a_new_commit(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.write(spark.range(0, 2))
    t.write(spark.range(50, 53), mode="overwrite")
    v = t.rollback(1)
    assert v == 3
    assert _counts(t.read()) == [0, 1]
    assert _counts(t.read(version=2)) == [50, 51, 52]  # history intact


def test_commit_point_is_exclusive(spark, tmp_path):
    """Two writers racing for the same version: exactly one manifest
    publish wins (exclusive create), the other raises for retry."""
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.write(spark.range(0, 2))
    head = t.current_version()
    t._commit("append", ["/nonexistent-a"], head)
    with pytest.raises(FileExistsError):
        t._commit("append", ["/nonexistent-b"], head)


def test_expire_collects_unreferenced_dirs(spark, tmp_path):
    t = SnapshotTable(spark, str(tmp_path / "tbl"))
    t.write(spark.range(0, 2))
    t.write(spark.range(2, 4))
    t.write(spark.range(9, 12), mode="overwrite")
    removed = t.expire(keep_last=1)
    # v1+v2 data dirs are gone (2 dirs), head still reads fine
    assert len(removed) == 2
    assert _counts(t.read()) == [9, 10, 11]
    with pytest.raises(ValueError, match="not found"):
        t.read(version=1)
