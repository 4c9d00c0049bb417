"""Iceberg-style catalog shim over parquet directories.

pyiceberg / an Iceberg runtime catalog is not available in this
sandbox, so tier tables, checkpoints and lineage use this shim. It
reproduces the Iceberg semantics the engine needs — snapshot ids,
append / dynamic-partition-overwrite commits, time-travel reads and
partition-level deletes — behind an interface an Iceberg adapter can
implement verbatim (``writeTo(tbl).append()`` /
``overwritePartitions()`` / ``VERSION AS OF``).

Layout on disk::

    <root>/<table>/
        _snapshots.json          # ordered commit log
        snap=<id>/...parquet     # data files of snapshot <id>

Each snapshot is a FULL logical view assembled from parent snapshot
data minus replaced/deleted partitions plus new files — implemented
here by listing parquet paths per snapshot in the manifest (classic
Iceberg manifest-list behavior, simplified).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    operation: str  # append | overwrite_partitions | delete_where
    paths: list[str] = field(default_factory=list)  # parquet dirs composing the view
    summary: dict = field(default_factory=dict)


class ParquetCatalog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ---------- manifest ----------
    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.root, table, "_snapshots.json")

    def snapshots(self, table: str) -> list[Snapshot]:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [Snapshot(**s) for s in json.load(f)]

    def current_snapshot_id(self, table: str) -> str | None:
        snaps = self.snapshots(table)
        return snaps[-1].snapshot_id if snaps else None

    def _commit(self, table: str, snap: Snapshot) -> str:
        snaps = self.snapshots(table)
        snaps.append(snap)
        os.makedirs(os.path.join(self.root, table), exist_ok=True)
        tmp = self._manifest_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump([s.__dict__ for s in snaps], f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit
        return snap.snapshot_id

    def _new_data_dir(self, table: str, snap_id: str) -> str:
        return os.path.join(self.root, table, f"snap={snap_id}")

    # ---------- writes ----------
    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> str:
        snap_id = f"{int(time.time() * 1e6)}_{uuid.uuid4().hex[:8]}"
        data_dir = self._new_data_dir(table, snap_id)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        parent = self.current_snapshot_id(table)
        parent_paths = self.snapshots(table)[-1].paths if parent else []
        return self._commit(
            table,
            Snapshot(snap_id, parent, "append", parent_paths + [data_dir],
                     {"added_path": data_dir}),
        )

    def overwrite_table(self, df: DataFrame, table: str,
                        partition_by: list[str] | None = None) -> str:
        snap_id = f"{int(time.time() * 1e6)}_{uuid.uuid4().hex[:8]}"
        data_dir = self._new_data_dir(table, snap_id)
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        parent = self.current_snapshot_id(table)
        return self._commit(
            table, Snapshot(snap_id, parent, "overwrite", [data_dir], {})
        )

    def delete_where(self, spark: SparkSession, table: str, predicate: str,
                     partition_by: list[str] | None = None) -> str:
        """Iceberg ``DELETE FROM t WHERE p`` → new snapshot, touching
        only affected data dirs (manifest-filtering analog).

        Each data dir composing the current view is probed with the
        predicate (``limit(1)`` — partition pruning / parquet min-max
        pushdown make this a metadata read for partition- and
        range-predicates, the TTL shape). Dirs with NO matching rows
        carry over into the new snapshot untouched — their files stay
        byte-identical on disk (asserted in tests). Only dirs that
        contain matches are filtered and rewritten. Real Iceberg goes
        one step further (whole-partition deletes are metadata-only);
        the shim's unit of pruning is the commit data dir.

        NULL-predicate rows are RETAINED (Iceberg / ANSI DELETE
        semantics: only predicate=TRUE rows are deleted). The rewrite
        filter is ``(p) IS NOT TRUE`` — not ``NOT (p)``, which would
        drop NULL rows from rewritten dirs while the probe (which
        detects TRUE matches only) left them alive in untouched dirs,
        making survival depend on physical dir layout.
        """
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        cur_paths = snaps[-1].paths
        untouched, affected = [], []
        for p in cur_paths:
            d = spark.read.parquet(p)
            if d.where(predicate).limit(1).count() == 0:
                untouched.append(p)
            else:
                affected.append(p)
        parent = snaps[-1].snapshot_id
        snap_id = f"{int(time.time() * 1e6)}_{uuid.uuid4().hex[:8]}"
        if not affected:  # metadata-only no-op commit
            return self._commit(
                table,
                Snapshot(snap_id, parent, "delete_where", list(cur_paths),
                         {"predicate": predicate, "rewritten_dirs": 0,
                          "pruned_dirs": len(untouched)}),
            )
        data_dir = self._new_data_dir(table, snap_id)
        kept = spark.read.parquet(*affected).where(
            f"({predicate}) IS NOT TRUE"
        )
        w = kept.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)
        return self._commit(
            table,
            Snapshot(snap_id, parent, "delete_where",
                     untouched + [data_dir],
                     {"predicate": predicate,
                      "rewritten_dirs": len(affected),
                      "pruned_dirs": len(untouched)}),
        )

    # ---------- maintenance ----------
    def expire_snapshots(self, table: str, keep_last: int = 1) -> dict:
        """Retire all but the newest ``keep_last`` snapshots and delete
        the data dirs no retained snapshot references (Iceberg's
        ``expire_snapshots`` maintenance procedure).

        Without this, every append/delete commit dir lives forever —
        at 100 TB with high-frequency appends that is a multiple of
        the live data in dead storage. Time travel to an expired id
        raises afterwards (as in Iceberg). The manifest rewrite is
        atomic (same tmp+rename as ``_commit``); dir removal happens
        only after the new manifest is in place, so a crash mid-GC
        leaves orphan dirs, never a manifest referencing deleted data.
        """
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        kept, expired = snaps[-keep_last:], snaps[:-keep_last]
        if expired:
            tmp = self._manifest_path(table) + f".tmp.{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                json.dump([s.__dict__ for s in kept], f, indent=1)
            os.replace(tmp, self._manifest_path(table))
        live = {os.path.abspath(p) for s in kept for p in s.paths}
        tdir = os.path.join(self.root, table)
        removed = 0
        for name in os.listdir(tdir):
            full = os.path.abspath(os.path.join(tdir, name))
            if name.startswith("snap=") and full not in live:
                shutil.rmtree(full)
                removed += 1
        return {"expired_snapshots": len(expired), "removed_dirs": removed,
                "retained_snapshots": len(kept)}

    def compact(self, spark: SparkSession, table: str,
                partition_by: list[str] | None = None) -> str:
        """Rewrite the current view into a single data dir (Iceberg's
        ``rewrite_data_files``): collapses the O(#commits) union that
        ``read`` otherwise plans over a long append history back to
        one scan node. Commits a normal overwrite snapshot, so time
        travel to pre-compaction snapshots keeps working until
        ``expire_snapshots`` retires them."""
        return self.overwrite_table(self.read(spark, table), table,
                                    partition_by=partition_by)

    # ---------- reads ----------
    def read(self, spark: SparkSession, table: str,
             snapshot_id: str | None = None) -> DataFrame:
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        if snapshot_id is None:
            snap = snaps[-1]
        else:
            try:
                snap = next(s for s in snaps
                            if s.snapshot_id == snapshot_id)
            except StopIteration:
                raise ValueError(
                    f"snapshot {snapshot_id!r} not found for table "
                    f"{table!r} (expired or never existed)"
                ) from None
        if not snap.paths:
            return spark.createDataFrame([], schema="dummy string").limit(0)
        # One scan per commit dir, unioned by name: a multi-path
        # spark.read.parquet() refuses partitionBy'd commit dirs
        # ("multiple root directories") because hive-style partition
        # discovery needs a single root per scan. Found by the catalog
        # contract suite; Catalyst still prunes columns/filters into
        # every branch of the union.
        #
        # Trade: the plan grows O(#append commits since last rewrite),
        # so a long-lived high-frequency append table wants periodic
        # compaction (overwrite_table with the current view collapses
        # paths back to one dir — exactly what the retention/TTL jobs
        # already do). Iceberg does this in metadata (one manifest
        # list per snapshot, planned in a single scan node), which is
        # one of the reasons the real deployment uses sources/iceberg.py.
        dfs = [spark.read.option("mergeSchema", "false").parquet(p)
               for p in snap.paths]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def exists(self, table: str) -> bool:
        return bool(self.snapshots(table))
