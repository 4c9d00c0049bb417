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
        _manifest.lock           # exclusive commit mutex (transient)
        snap=<id>/...parquet     # data files of snapshot <id>

Each snapshot is a FULL logical view assembled from parent snapshot
data minus replaced/deleted partitions plus new files — implemented
here by listing parquet paths per snapshot in the manifest (classic
Iceberg manifest-list behavior, simplified).

Concurrency model (mirrors Iceberg's optimistic commits): data files
are written OUTSIDE any lock (long Spark jobs never serialize); the
manifest read-modify-write is atomic under a per-table lock file.
Appends and full overwrites rebase onto whatever parent is current at
commit time (Iceberg fast-append semantics). ``delete_where`` is a
copy-on-write operation whose probe/rewrite depend on the snapshot it
read — if another commit lands in between it raises
:class:`CommitConflictError` instead of silently dropping that
commit's rows (Iceberg's serializable-isolation validation; the
caller retries). ``expire_snapshots`` deletes ONLY data dirs that the
expired snapshots referenced and no retained snapshot still does —
never "any dir not in the manifest", because a concurrent append
writes its data dir before taking the commit lock. Dirs orphaned by
crashed writers are reclaimed by :meth:`remove_orphan_files` (age-
guarded, exactly like Iceberg's ``remove_orphan_files`` procedure).

The table partition spec is sticky, as in Iceberg: a write that
passes ``partition_by`` sets it; later writes/rewrites that don't
pass one inherit the current spec from the snapshot summary, so
compaction and TTL rewrites keep the hive layout that partition
pruning relies on.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from contextlib import contextmanager
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LOCK_TIMEOUT_S = 60.0


class CommitConflictError(RuntimeError):
    """A concurrent commit invalidated this copy-on-write operation
    (Iceberg validation failure) — re-read and retry."""


@dataclass
class Snapshot:
    snapshot_id: str
    parent_id: str | None
    operation: str  # append | overwrite | delete_where
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

    @contextmanager
    def _lock(self, table: str):
        """Per-table exclusive commit mutex: O_CREAT|O_EXCL lock file
        (atomic on POSIX local FS and NFS; a distributed deployment
        swaps this for the real Iceberg catalog's atomic swap). A
        crashed holder surfaces as a loud TimeoutError, never a silent
        lost update."""
        os.makedirs(os.path.join(self.root, table), exist_ok=True)
        lock = os.path.join(self.root, table, "_manifest.lock")
        deadline = time.time() + _LOCK_TIMEOUT_S
        while True:
            try:
                fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if time.time() > deadline:
                    raise TimeoutError(
                        f"manifest lock {lock!r} held for > "
                        f"{_LOCK_TIMEOUT_S}s (crashed writer? delete the "
                        "lock file after verifying no live commit)"
                    ) from None
                time.sleep(0.05)
        try:
            os.write(fd, f"{os.getpid()} {time.time()}".encode())
            os.close(fd)
            yield
        finally:
            os.unlink(lock)

    def _write_manifest(self, table: str, snaps: list[Snapshot]) -> None:
        tmp = self._manifest_path(table) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump([s.__dict__ for s in snaps], f, indent=1)
        os.replace(tmp, self._manifest_path(table))  # atomic commit

    def _commit(self, table: str,
                make_snap: Callable[[list[Snapshot]], Snapshot]) -> str:
        """Atomic manifest commit: under the table lock, re-read the
        CURRENT snapshot list and let ``make_snap`` build the new
        snapshot against it (rebase) or raise CommitConflictError
        (validate). One manifest parse per commit."""
        with self._lock(table):
            snaps = self.snapshots(table)
            snap = make_snap(snaps)
            self._write_manifest(table, snaps + [snap])
            return snap.snapshot_id

    @staticmethod
    def _new_snap_id() -> str:
        return f"{int(time.time() * 1e6)}_{uuid.uuid4().hex[:8]}"

    def _new_data_dir(self, table: str, snap_id: str) -> str:
        return os.path.join(self.root, table, f"snap={snap_id}")

    def _current_spec(self, table: str) -> list[str] | None:
        """The table's sticky partition spec (latest snapshot summary)."""
        snaps = self.snapshots(table)
        return snaps[-1].summary.get("partition_by") if snaps else None

    def _effective_spec(self, table: str,
                        partition_by: list[str] | None) -> list[str] | None:
        # Iceberg semantics: an explicit partition_by (re)sets the
        # table spec; None follows the current spec — so TTL rewrites
        # and compaction never silently flatten a partitioned table.
        return partition_by if partition_by is not None \
            else self._current_spec(table)

    # ---------- writes ----------
    def _write_data(self, df: DataFrame, data_dir: str,
                    partition_by: list[str] | None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(data_dir)

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> str:
        snap_id = self._new_snap_id()
        data_dir = self._new_data_dir(table, snap_id)
        pb = self._effective_spec(table, partition_by)
        self._write_data(df, data_dir, pb)

        def make(snaps: list[Snapshot]) -> Snapshot:
            # rebase: parent/paths come from the manifest AS OF commit
            # time, not the possibly-stale pre-write read
            parent = snaps[-1].snapshot_id if snaps else None
            parent_paths = snaps[-1].paths if snaps else []
            return Snapshot(snap_id, parent, "append",
                            parent_paths + [data_dir],
                            {"added_path": data_dir, "partition_by": pb,
                             "schema": df.schema.jsonValue()})

        return self._commit(table, make)

    def overwrite_table(self, df: DataFrame, table: str,
                        partition_by: list[str] | None = None) -> str:
        snap_id = self._new_snap_id()
        data_dir = self._new_data_dir(table, snap_id)
        pb = self._effective_spec(table, partition_by)
        self._write_data(df, data_dir, pb)
        return self._commit(
            table,
            lambda snaps: Snapshot(
                snap_id, snaps[-1].snapshot_id if snaps else None,
                "overwrite", [data_dir],
                {"partition_by": pb, "schema": df.schema.jsonValue()},
            ),
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

        Copy-on-write validation: the probe and rewrite are computed
        against the snapshot current at entry; if another commit lands
        before this one, :class:`CommitConflictError` is raised (the
        rewrite would silently drop the concurrent commit's rows
        otherwise). Callers retry — Iceberg serializable isolation.
        """
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        base = snaps[-1]
        pb = partition_by if partition_by is not None \
            else base.summary.get("partition_by")
        snap_id = self._new_snap_id()
        untouched, rewrite_dir, n_affected, schema_json = \
            self._cow_rewrite(spark, base, predicate, pb, table, snap_id)

        def make(op_paths: list[str], summary: dict):
            def _make(cur: list[Snapshot]) -> Snapshot:
                if not cur or cur[-1].snapshot_id != base.snapshot_id:
                    raise CommitConflictError(
                        f"table {table!r} advanced past "
                        f"{base.snapshot_id!r} during delete_where — "
                        "re-run the delete against the new snapshot"
                    )
                return Snapshot(snap_id, base.snapshot_id, "delete_where",
                                op_paths, summary)
            return _make

        summary = {"predicate": predicate, "rewritten_dirs": n_affected,
                   "pruned_dirs": len(untouched), "partition_by": pb,
                   "schema": schema_json}
        if rewrite_dir is None:  # metadata-only no-op commit
            return self._commit(table, make(list(untouched), summary))
        return self._commit(table, make(untouched + [rewrite_dir], summary))

    def _cow_rewrite(self, spark: SparkSession, base: "Snapshot",
                     predicate: str, pb: list[str] | None, table: str,
                     snap_id: str, dir_suffix: str = ""):
        """Copy-on-write core shared by :meth:`delete_where` and
        :meth:`replace_where`: probe every data dir of ``base`` for
        predicate matches, rewrite ONLY the affected dirs filtered to
        ``(p) IS NOT TRUE`` (NULL-predicate rows retained — see
        delete_where's docstring for why not ``NOT (p)``), carry
        untouched dirs over by reference.

        Dirs are probed CONCURRENTLY (Spark job submission is
        thread-safe): each probe is a metadata-cheap limit(1) scan,
        but a long-history table has one dir per un-compacted commit
        and a sequential driver loop would serialize that many tiny
        jobs — the pool bounds latency by ceil(dirs/8) round-trips
        instead of dirs.

        Returns ``(untouched_paths, rewrite_dir_or_None, n_affected,
        schema_json)``.
        """
        base_schema = base.summary.get("schema")

        def _empty(p: str) -> bool:
            d = self._read_dirs(spark, [p], base_schema)
            return d.where(predicate).limit(1).count() == 0

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=max(1, min(8, len(base.paths)))
        ) as ex:
            empties = list(ex.map(_empty, base.paths))
        untouched = [p for p, e in zip(base.paths, empties) if e]
        affected = [p for p, e in zip(base.paths, empties) if not e]
        if not affected:
            return untouched, None, 0, base_schema
        rewrite_dir = self._new_data_dir(table, snap_id) + dir_suffix
        kept = self._read_dirs(spark, affected, base_schema).where(
            f"({predicate}) IS NOT TRUE"
        )
        self._write_data(kept, rewrite_dir, pb)
        return (untouched, rewrite_dir, len(affected),
                base_schema or kept.schema.jsonValue())

    def replace_where(self, spark: SparkSession, df: DataFrame, table: str,
                      predicate: str,
                      partition_by: list[str] | None = None) -> str:
        """Iceberg ``writeTo(t).overwrite(p)`` — dynamic predicate
        overwrite in ONE commit: rows matching ``predicate`` are
        replaced by ``df``; everything else carries over untouched.

        This is the continuous-aggregate refresh primitive: an
        incremental tier refresh replaces ONLY the affected day
        partitions (``day IN (...)``) with freshly merged rows, so
        commit cost scales with the delta, never with table history.

        Same copy-on-write machinery as :meth:`delete_where` (probe
        dirs, rewrite only dirs containing matches, NULL-predicate
        rows retained, CommitConflictError if the table advanced), plus
        the new data as one extra dir in the same snapshot — the
        delete and the insert are atomic together, so a reader never
        sees the gap between them.
        """
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(
                f"no snapshots for table {table!r} — create it with "
                "append()/overwrite_table() first"
            )
        base = snaps[-1]
        pb = partition_by if partition_by is not None \
            else base.summary.get("partition_by")

        snap_id = self._new_snap_id()
        untouched, rewrite_dir, n_affected, schema_json = \
            self._cow_rewrite(spark, base, predicate, pb, table, snap_id,
                              dir_suffix="_rw")
        new_paths = list(untouched)
        if rewrite_dir is not None:
            new_paths.append(rewrite_dir)
        data_dir = self._new_data_dir(table, snap_id)
        self._write_data(df, data_dir, pb)
        new_paths.append(data_dir)

        def make(cur: list[Snapshot]) -> Snapshot:
            if not cur or cur[-1].snapshot_id != base.snapshot_id:
                raise CommitConflictError(
                    f"table {table!r} advanced past {base.snapshot_id!r} "
                    "during replace_where — re-run against the new snapshot"
                )
            return Snapshot(
                snap_id, base.snapshot_id, "replace_where", new_paths,
                {"predicate": predicate, "rewritten_dirs": n_affected,
                 "pruned_dirs": len(untouched), "partition_by": pb,
                 "schema": schema_json or df.schema.jsonValue()},
            )

        return self._commit(table, make)

    def merge_upsert(self, spark: SparkSession, source: DataFrame,
                     table: str, key_cols: list[str],
                     partition_by: list[str] | None = None,
                     broadcast_keys: bool = True) -> str:
        """Iceberg ``MERGE INTO t USING s ON t.k = s.k WHEN MATCHED
        THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`` — the
        keyed upsert, in ONE atomic commit.

        Because the only clauses are update-all and insert-all, the
        post-merge view is exactly ``(target ANTI-JOIN source ON keys)
        ∪ source`` — so the copy-on-write plan is: probe each data dir
        for key matches (left_semi, source side broadcast — the CDC /
        refresh delta is small by construction; pass
        ``broadcast_keys=False`` for a bulk backfill-sized source),
        rewrite ONLY affected dirs with a left_anti filter, carry
        untouched dirs over by reference, and add the source rows as
        one new dir. Commit cost scales with the delta and the dirs it
        touches, never with the 10^12-turn table.

        Semantics pinned to SQL MERGE:

        - a source key matching >1 target row updates them all (the
          target is not required to be key-unique — matching Spark's
          MERGE, where it is the SOURCE side that must not fan out);
        - >1 NON-NULL-key source rows sharing a key raise
          ``ValueError`` (Iceberg/Delta raise "multiple source rows
          matched" at runtime; the shim validates up front);
        - NULL join keys never match (``=``, not ``<=>``): a
          NULL-key source row is an insert, a NULL-key target row
          always survives;
        - source columns must equal the target's by name — MERGE is
          not a schema-evolution path (``allowMissingColumns`` is for
          reads of historic dirs, not new writes).

        Copy-on-write validation as in :meth:`delete_where` /
        :meth:`replace_where`: probe + rewrite are computed against
        the snapshot current at entry; if the table advances before
        commit, :class:`CommitConflictError` — the caller retries
        against the new snapshot. ``read_appended`` correctly refuses
        incremental reads across a merge (operation != append).
        """
        from pyspark.sql import functions as F

        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(
                f"no snapshots for table {table!r} — create it with "
                "append()/overwrite_table() first"
            )
        base = snaps[-1]
        pb = partition_by if partition_by is not None \
            else base.summary.get("partition_by")
        if not key_cols:
            raise ValueError("merge_upsert needs at least one key column")
        missing = [k for k in key_cols if k not in source.columns]
        if missing:
            raise ValueError(f"key columns {missing} not in source "
                             f"columns {source.columns}")
        base_schema = base.summary.get("schema")
        tgt_cols = (
            [f["name"] for f in base_schema["fields"]]
            if base_schema is not None
            else self._read_dirs(spark, base.paths, None).columns
        )
        if set(source.columns) != set(tgt_cols):
            raise ValueError(
                f"merge_upsert source columns {sorted(source.columns)} != "
                f"target columns {sorted(tgt_cols)}: MERGE is not a "
                "schema-evolution path"
            )

        snap_id = self._new_snap_id()
        # materialize the source FIRST: it is the new data dir of the
        # final view, and re-reading it from disk makes the per-dir
        # probes and the anti-join rewrite scan a cheap stable delta
        # instead of recomputing an arbitrary upstream plan per dir
        src_dir = self._new_data_dir(table, snap_id)
        self._write_data(source, src_dir, pb)
        src = self._read_dirs(spark, [src_dir], source.schema.jsonValue())

        dup = (src.dropna(subset=key_cols).groupBy(*key_cols).count()
               .where(F.col("count") > 1).limit(1).count())
        if dup:
            shutil.rmtree(src_dir, ignore_errors=True)
            raise ValueError(
                "merge_upsert source has duplicate rows per key "
                f"{key_cols} — a MERGE target row would match multiple "
                "source rows; de-duplicate the source first"
            )
        keys = src.select(*key_cols)
        kb = F.broadcast(keys) if broadcast_keys else keys

        def _untouched(p: str) -> bool:
            d = self._read_dirs(spark, [p], base_schema)
            return d.join(kb, key_cols, "left_semi").limit(1).count() == 0

        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=max(1, min(8, len(base.paths)))
        ) as ex:
            empties = list(ex.map(_untouched, base.paths))
        untouched = [p for p, e in zip(base.paths, empties) if e]
        affected = [p for p, e in zip(base.paths, empties) if not e]
        new_paths = list(untouched)
        if affected:
            rewrite_dir = src_dir + "_rw"
            kept = self._read_dirs(spark, affected, base_schema).join(
                kb, key_cols, "left_anti")
            self._write_data(kept, rewrite_dir, pb)
            new_paths.append(rewrite_dir)
        new_paths.append(src_dir)

        def make(cur: list[Snapshot]) -> Snapshot:
            if not cur or cur[-1].snapshot_id != base.snapshot_id:
                raise CommitConflictError(
                    f"table {table!r} advanced past {base.snapshot_id!r} "
                    "during merge_upsert — re-run against the new snapshot"
                )
            return Snapshot(
                snap_id, base.snapshot_id, "merge", new_paths,
                {"merge_keys": list(key_cols),
                 "rewritten_dirs": len(affected),
                 "pruned_dirs": len(untouched), "partition_by": pb,
                 "schema": base_schema or source.schema.jsonValue()},
            )

        return self._commit(table, make)

    # ---------- maintenance ----------
    def expire_snapshots(self, table: str, keep_last: int = 1) -> dict:
        """Retire all but the newest ``keep_last`` snapshots and delete
        the data dirs they referenced that no retained snapshot still
        does (Iceberg's ``expire_snapshots`` maintenance procedure).

        Without this, every append/delete commit dir lives forever —
        at 100 TB with high-frequency appends that is a multiple of
        the live data in dead storage. Time travel to an expired id
        raises afterwards (as in Iceberg). The manifest rewrite runs
        under the commit lock, so a commit landing concurrently is
        never erased; deletion targets are ONLY dirs the expired
        snapshots referenced (a concurrent writer's data dir exists on
        disk before its commit — sweeping "unreferenced" dirs would
        destroy it; those are :meth:`remove_orphan_files`'s job, with
        an age guard). Dir removal happens after the new manifest is
        in place, so a crash mid-GC leaves orphan dirs, never a
        manifest referencing deleted data.
        """
        if keep_last < 1:
            raise ValueError(f"keep_last must be >= 1, got {keep_last}")
        with self._lock(table):
            snaps = self.snapshots(table)
            if not snaps:
                raise FileNotFoundError(f"no snapshots for table {table!r}")
            kept, expired = snaps[-keep_last:], snaps[:-keep_last]
            if expired:
                self._write_manifest(table, kept)
            live = {os.path.abspath(p) for s in kept for p in s.paths}
            dead = {os.path.abspath(p) for s in expired
                    for p in s.paths} - live
        removed = 0
        for full in dead:
            if os.path.exists(full):
                shutil.rmtree(full)
                removed += 1
        return {"expired_snapshots": len(expired), "removed_dirs": removed,
                "retained_snapshots": len(kept)}

    def remove_orphan_files(self, table: str,
                            older_than_s: float = 3 * 86400) -> dict:
        """Delete ``snap=`` dirs no snapshot references (Iceberg's
        ``remove_orphan_files``): leftovers of crashed writers and of
        GC interrupted between manifest rewrite and dir removal.

        The age guard is load-bearing, exactly as in Iceberg: an
        in-flight writer's data dir exists on disk BEFORE its manifest
        commit, so only dirs older than ``older_than_s`` (default 3
        days — Iceberg's own default) are eligible. The referenced-set
        snapshot is taken under the commit lock."""
        with self._lock(table):
            snaps = self.snapshots(table)
            referenced = {os.path.abspath(p) for s in snaps for p in s.paths}
            tdir = os.path.join(self.root, table)
            cutoff = time.time() - older_than_s
            orphans = []
            for name in os.listdir(tdir):
                full = os.path.abspath(os.path.join(tdir, name))
                if (name.startswith("snap=") and full not in referenced
                        and os.path.getmtime(full) < cutoff):
                    orphans.append(full)
        for full in orphans:
            shutil.rmtree(full, ignore_errors=True)
        return {"removed_dirs": len(orphans)}

    def compact(self, spark: SparkSession, table: str,
                partition_by: list[str] | None = None) -> str:
        """Rewrite the current view into a single data dir (Iceberg's
        ``rewrite_data_files``): collapses the O(#commits) union that
        ``read`` otherwise plans over a long append history back to
        one scan node. Commits a normal overwrite snapshot — the
        table's sticky partition spec is inherited unless overridden,
        so compaction never flattens a partitioned table — and time
        travel to pre-compaction snapshots keeps working until
        ``expire_snapshots`` retires them."""
        return self.overwrite_table(self.read(spark, table), table,
                                    partition_by=partition_by)

    # ---------- reads ----------
    @staticmethod
    def _read_dirs(spark: SparkSession, paths: list[str],
                   schema_json: dict | None) -> DataFrame:
        """Union of per-commit-dir scans. One scan per dir: a
        multi-path ``spark.read.parquet()`` refuses partitionBy'd
        commit dirs ("multiple root directories") because hive-style
        partition discovery needs a single root per scan. Found by the
        catalog contract suite; Catalyst still prunes columns/filters
        into every branch of the union.

        When the snapshot recorded its schema (``schema_json``), the
        scan applies it explicitly — schema lives in table metadata,
        as in Iceberg, so (a) empty commits (even hive-partitioned
        ones, which write NO parquet footers) stay readable, and
        (b) older dirs null-fill columns added by later commits
        without per-file inference. Legacy manifests without a
        recorded schema fall back to inference + allowMissingColumns.
        """
        def one(p: str) -> DataFrame:
            r = spark.read.option("mergeSchema", "false")
            if schema_json is not None:
                r = r.schema(StructType.fromJson(schema_json))
            return r.parquet(p)

        out = one(paths[0])
        for p in paths[1:]:
            out = out.unionByName(one(p), allowMissingColumns=True)
        return out

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
        schema_json = snap.summary.get("schema")
        if not snap.paths:
            if schema_json is not None:
                return spark.createDataFrame(
                    [], schema=StructType.fromJson(schema_json))
            return spark.createDataFrame([], schema="dummy string").limit(0)
        # Trade: the plan grows O(#append commits since last rewrite),
        # so a long-lived high-frequency append table wants periodic
        # compaction (overwrite_table with the current view collapses
        # paths back to one dir — exactly what the retention/TTL jobs
        # already do). Iceberg does this in metadata (one manifest
        # list per snapshot, planned in a single scan node), which is
        # one of the reasons the real deployment uses sources/iceberg.py.
        return self._read_dirs(spark, snap.paths, schema_json)

    def read_appended(self, spark: SparkSession, table: str,
                      since_snapshot_id: str | None,
                      until_snapshot_id: str | None = None) -> DataFrame:
        """Incremental read: ONLY the rows appended after
        ``since_snapshot_id`` up to ``until_snapshot_id`` (default:
        current). Iceberg's incremental scan
        (``start-snapshot-id``/``end-snapshot-id`` read options);
        ``since`` is EXCLUSIVE, matching Iceberg.

        ``since_snapshot_id=None`` reads the full ``until`` view (first
        refresh of a consumer). Raises ``ValueError`` if any snapshot
        in the range is not an append — an overwrite/delete rewrote
        history, so "rows added since" is undefined and the consumer
        must fall back to a full recompute (Iceberg's incremental scan
        refuses the same way).
        """
        snaps = self.snapshots(table)
        if not snaps:
            raise FileNotFoundError(f"no snapshots for table {table!r}")
        ids = [s.snapshot_id for s in snaps]
        if until_snapshot_id is None:
            until_snapshot_id = ids[-1]
        if until_snapshot_id not in ids:
            raise ValueError(
                f"snapshot {until_snapshot_id!r} not found for table "
                f"{table!r} (expired or never existed)")
        if since_snapshot_id is None:
            return self.read(spark, table, until_snapshot_id)
        if since_snapshot_id not in ids:
            raise ValueError(
                f"snapshot {since_snapshot_id!r} not found for table "
                f"{table!r} (expired or never existed)")
        lo, hi = ids.index(since_snapshot_id), ids.index(until_snapshot_id)
        if hi < lo:
            raise ValueError(
                f"until snapshot {until_snapshot_id!r} predates since "
                f"snapshot {since_snapshot_id!r} for table {table!r}")
        rng = snaps[lo + 1: hi + 1]
        non_append = [s.snapshot_id for s in rng if s.operation != "append"]
        if non_append:
            raise ValueError(
                f"incremental read of table {table!r} is undefined: "
                f"snapshots {non_append} in ({since_snapshot_id!r}, "
                f"{until_snapshot_id!r}] are not appends — fall back to "
                "a full recompute from the current view")
        since_paths = set(snaps[lo].paths)
        new_paths: list[str] = []
        for s in rng:
            for p in s.paths:
                if p not in since_paths and p not in new_paths:
                    new_paths.append(p)
        schema_json = snaps[hi].summary.get("schema")
        if not new_paths:
            if schema_json is not None:
                return spark.createDataFrame(
                    [], schema=StructType.fromJson(schema_json))
            return spark.createDataFrame([], schema="dummy string").limit(0)
        return self._read_dirs(spark, new_paths, schema_json)

    def exists(self, table: str) -> bool:
        return bool(self.snapshots(table))
