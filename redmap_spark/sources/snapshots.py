"""Snapshot / time-travel table semantics (SURVEY §2.H-adjacent).

An Iceberg-style versioned table over plain parquet: every write
commits a new immutable SNAPSHOT described by a tiny JSON manifest;
readers resolve a manifest (latest, by version, or by timestamp) and
read exactly the data directories it lists. Data files are never
mutated or deleted by writes — overwrite just starts a new directory
list — so concurrent readers are never torn, and any historical
version stays readable until explicitly expired.

Layout::

    <table>/
      _snapshots/v00000001.json   {version, ts, op, dirs, parent}
      _snapshots/v00000002.json
      data/v00000001-<uuid>/part-*.parquet
      data/v00000002-<uuid>/part-*.parquet

Commit protocol: data is written first, then the manifest is published
with an exclusive create (``open(..., "x")``) — the manifest IS the
commit point. A crash before manifest publish leaves an unreferenced
data directory (garbage, collected by ``expire``), never a partial
snapshot. Two racing writers targeting the same version: exactly one
wins the exclusive create; the loser retries against the new head
(optimistic concurrency, single-table).

At 100 TB the same design holds because manifests are O(#directories)
metadata: reads open one small JSON + the listed parquet dirs (no full
table listing), appends touch only their own new directory, and
time travel is manifest selection, not data movement. (A production
deployment would use Iceberg/Delta proper for cross-table atomicity
and file-level pruning stats; the semantics here are the same.)
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Versioned parquet table with time travel.

    ``write(df, mode)`` commits snapshots; ``read(version=...)`` /
    ``read(as_of_ts=...)`` time-travels; ``history()`` lists commits;
    ``rollback(version)`` commits a new snapshot that restores an old
    directory list (history is never rewritten — a rollback is itself
    a commit, as in Iceberg).
    """

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = Path(path)
        self.snap_dir = self.path / "_snapshots"
        self.data_dir = self.path / "data"
        self.snap_dir.mkdir(parents=True, exist_ok=True)
        self.data_dir.mkdir(parents=True, exist_ok=True)

    # ------------------------------------------------------------ reads

    def _manifests(self) -> list[dict]:
        out = []
        for f in sorted(self.snap_dir.glob("v*.json")):
            out.append(json.loads(f.read_text()))
        return out

    def current_version(self) -> int:
        """0 when the table has no committed snapshot yet."""
        ms = self._manifests()
        return ms[-1]["version"] if ms else 0

    def _resolve(self, version: int | None = None, as_of_ts: float | None = None) -> dict:
        ms = self._manifests()
        if not ms:
            raise FileNotFoundError(f"snapshot table {self.path} has no snapshots")
        if version is not None:
            for m in ms:
                if m["version"] == version:
                    return m
            raise ValueError(f"version {version} not found (have 1..{ms[-1]['version']})")
        if as_of_ts is not None:
            eligible = [m for m in ms if m["ts"] <= as_of_ts]
            if not eligible:
                raise ValueError(f"no snapshot at or before ts={as_of_ts}")
            return eligible[-1]
        return ms[-1]

    def read(self, version: int | None = None, as_of_ts: float | None = None) -> DataFrame:
        """Latest snapshot by default; a historical one by ``version``
        or by ``as_of_ts`` (largest commit ts ≤ as_of_ts)."""
        m = self._resolve(version, as_of_ts)
        if not m["dirs"]:
            raise ValueError(f"version {m['version']} is empty")
        return self.spark.read.parquet(*m["dirs"])

    def history(self) -> list[dict]:
        """Commit log, oldest first: version, ts, op, #dirs."""
        return [
            {"version": m["version"], "ts": m["ts"], "op": m["op"], "n_dirs": len(m["dirs"])}
            for m in self._manifests()
        ]

    # ----------------------------------------------------------- writes

    def _commit(self, op: str, dirs: list[str], expected_parent: int) -> int:
        """Publish a manifest for expected_parent+1; raises
        FileExistsError if another writer committed that version first
        (caller may re-read head and retry)."""
        version = expected_parent + 1
        manifest = {
            "version": version,
            "ts": time.time(),
            "op": op,
            "dirs": dirs,
            "parent": expected_parent,
        }
        target = self.snap_dir / f"v{version:08d}.json"
        with open(target, "x") as fh:  # exclusive create = the commit point
            json.dump(manifest, fh)
        return version

    def write(self, df: DataFrame, mode: str = "append") -> int:
        """Commit ``df`` as a new snapshot; returns its version.
        ``append`` adds a directory to the parent's list; ``overwrite``
        replaces the list (old versions stay readable)."""
        if mode not in ("append", "overwrite"):
            raise ValueError(f"mode must be append|overwrite, got {mode!r}")
        parent = self.current_version()
        new_dir = self.data_dir / f"v{parent + 1:08d}-{uuid.uuid4().hex[:8]}"
        df.write.mode("error").parquet(str(new_dir))
        if mode == "append" and parent > 0:
            dirs = self._resolve(parent)["dirs"] + [str(new_dir)]
        else:
            dirs = [str(new_dir)]
        return self._commit(mode, dirs, parent)

    def rollback(self, version: int) -> int:
        """Commit a new snapshot whose data is exactly ``version``'s."""
        m = self._resolve(version)
        return self._commit(f"rollback({version})", m["dirs"], self.current_version())

    # ------------------------------------------------------ maintenance

    def expire(self, keep_last: int = 1) -> list[str]:
        """Drop all but the last ``keep_last`` manifests and delete data
        directories no surviving manifest references (including
        orphans from crashed writes). Returns removed directories."""
        import shutil

        ms = self._manifests()
        keep = ms[-keep_last:] if keep_last > 0 else []
        live = {d for m in keep for d in m["dirs"]}
        removed = []
        for m in ms[: len(ms) - len(keep)]:
            (self.snap_dir / f"v{m['version']:08d}.json").unlink(missing_ok=True)
        for d in self.data_dir.iterdir():
            if str(d) not in live:
                shutil.rmtree(d, ignore_errors=True)
                removed.append(str(d))
        return removed
