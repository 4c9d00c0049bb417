"""Checkpoint / resume + per-partition lineage and rollup metrics.

North-rule component. Reference analog: best/current model
checkpoints + resume via torch.load (SURVEY S4/S5,
/root/reference/Learning/learn_autoencoder.py:135-147,
/root/reference/Testing/lae_anm_detc.py:49).

Model: a run is a list of (stage, partition_key) work units. Each
completed unit commits one row to the ``_checkpoints`` table through
the catalog (atomic snapshot commit). Re-running the same run_id
skips completed units (longest-prefix skip generalized to any-prefix,
since units are independent). Each completed unit also appends
lineage rows: input snapshot id, bucket range, row counts — the
north rule's "per-partition lineage rows and rollup-count metrics".

Run isolation: a unit's ``fn`` may return ``(df, output_snapshot)``
to record the catalog snapshot id its output committed as. On resume,
:meth:`CheckpointedRun.output_snapshot` returns that id so the job
reads ITS OWN committed state via time travel — not "whatever is
latest", which a different run-id sharing the warehouse may have
overwritten with outputs built under different parameters. If the
pinned snapshot has since been expired by maintenance, the catalog
read raises loudly instead of silently mixing runs.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog

CHECKPOINT_TABLE = "_checkpoints"
LINEAGE_TABLE = "_lineage"


def completed_units(catalog: ParquetCatalog, spark: SparkSession,
                    run_id: str) -> dict[tuple[str, str], str | None]:
    """{(stage, partition_key): output_snapshot} for the run's done
    units. ``output_snapshot`` is None for units that did not record
    one (including rows written before the column existed — the shim
    read null-fills missing columns, Iceberg-style schema evolution).
    """
    if not catalog.exists(CHECKPOINT_TABLE):
        return {}
    df = catalog.read(spark, CHECKPOINT_TABLE)
    if "output_snapshot" not in df.columns:
        df = df.withColumn("output_snapshot", F.lit(None).cast("string"))
    rows = (
        df.where(F.col("run_id") == run_id)
        .where(F.col("status") == "done")
        .select("stage", "partition_key", "output_snapshot")
        .collect()
    )
    return {(r["stage"], r["partition_key"]): r["output_snapshot"]
            for r in rows}


def lineage_rows(df: DataFrame, stage: str, run_id: str,
                 input_snapshot: str | None,
                 bucket_col: str = "bucket_start",
                 partition_key: str | None = None) -> DataFrame:
    """One lineage row per output partition-ish slice: bucket range +
    row count keyed by the stage, unit partition key and input
    snapshot."""
    return df.agg(
        F.lit(run_id).alias("run_id"),
        F.lit(stage).alias("stage"),
        # cast: a None literal is VoidType, which parquet stores as
        # BOOLEAN — later string commits would physically mismatch
        F.lit(partition_key).cast("string").alias("partition_key"),
        F.lit(input_snapshot).cast("string").alias("input_snapshot"),
        F.min(bucket_col).alias("bucket_min"),
        F.max(bucket_col).alias("bucket_max"),
        F.count(F.lit(1)).alias("row_count"),
    )


class CheckpointedRun:
    """Idempotent multi-stage run with per-unit checkpoints."""

    def __init__(self, catalog: ParquetCatalog, spark: SparkSession, run_id: str):
        self.catalog = catalog
        self.spark = spark
        self.run_id = run_id
        self._done = completed_units(catalog, spark, run_id)
        self.executed: list[tuple[str, str]] = []
        self.skipped: list[tuple[str, str]] = []

    def _lineage_exists(self, stage: str, partition_key: str) -> bool:
        """True if this run already committed lineage for the unit
        (crash between the lineage append and the checkpoint mark) —
        one tiny probe per EXECUTED unit, nothing on the skip path."""
        if not self.catalog.exists(LINEAGE_TABLE):
            return False
        df = self.catalog.read(self.spark, LINEAGE_TABLE)
        cond = (F.col("run_id") == self.run_id) & (F.col("stage") == stage)
        if "partition_key" in df.columns:
            cond = cond & (F.col("partition_key") == partition_key)
        return df.where(cond).limit(1).count() > 0

    def output_snapshot(self, stage: str,
                        partition_key: str = "all") -> str | None:
        """Snapshot id the unit's output committed as (this run),
        whether executed now or in a previous session."""
        return self._done.get((stage, partition_key))

    def unit(self, stage: str, partition_key: str,
             fn: Callable[[], DataFrame | None | tuple],
             input_snapshot: str | None = None) -> bool:
        """Run one work unit unless already checkpointed.

        ``fn`` performs the work and may return the output DataFrame
        for lineage accounting, or ``(df, output_snapshot_id)`` to
        additionally pin the committed snapshot for resume isolation.
        Returns True if executed."""
        if (stage, partition_key) in self._done:
            self.skipped.append((stage, partition_key))
            return False
        out = fn()
        out_snap: str | None = None
        if isinstance(out, tuple):
            out, out_snap = out
        if out is not None and "bucket_start" in out.columns:
            # lineage lands BEFORE the checkpoint mark, so a crash
            # between the two appends re-executes the unit on resume —
            # the probe keeps that re-execution from double-counting
            # the same (run, stage, unit) in _lineage
            if not self._lineage_exists(stage, partition_key):
                self.catalog.append(
                    lineage_rows(out, stage, self.run_id, input_snapshot,
                                 partition_key=partition_key),
                    LINEAGE_TABLE,
                )
        mark = self.spark.createDataFrame(
            [(self.run_id, stage, partition_key, "done", input_snapshot,
              out_snap)],
            schema="run_id string, stage string, partition_key string, "
                   "status string, input_snapshot string, "
                   "output_snapshot string",
        )
        self.catalog.append(mark, CHECKPOINT_TABLE)
        self._done[(stage, partition_key)] = out_snap
        self.executed.append((stage, partition_key))
        return True


class StageRunner:
    """Shared whole-table stage scaffold for the multi-stage jobs
    (curation / monitor): each stage commits its output through the
    catalog as ONE checkpointed unit, records row counts + wall
    seconds into a metrics dict, releases registry caches after the
    action, and on resume reads back the snapshot THIS run pinned —
    never the table's latest, which another run-id sharing the
    warehouse may have overwritten under different parameters.

    Extracted so the resume-isolation rules live in exactly one
    place; jobs that need per-partition units (rollup/refresh) keep
    calling :class:`CheckpointedRun` directly.
    """

    def __init__(self, run: CheckpointedRun, metrics: dict):
        self.run = run
        self.catalog = run.catalog
        self.spark = run.spark
        self.metrics = metrics

    def read(self, name: str) -> DataFrame:
        """This run's committed output, pinned to its recorded
        snapshot (an expired or missing pin raises loudly)."""
        snap = self.run.output_snapshot(name)
        if snap is None:
            # a done-marked unit with no recorded snapshot (checkpoint
            # row predates snapshot pinning): reading "latest" here
            # would silently mix in another run's overwrites
            raise RuntimeError(
                f"stage {name!r} is checkpointed for run-id "
                f"{self.run.run_id!r} but recorded no output snapshot "
                "— resume isolation cannot be guaranteed; re-run with "
                "a fresh --run-id"
            )
        return self.catalog.read(self.spark, name, snap)

    def stage(self, name: str, build: Callable[[], DataFrame]) -> None:
        import time

        from yahoo_anomaly_detection_spark import caching

        t0 = time.time()

        def unit():
            df = build()
            snap = self.catalog.overwrite_table(df, name)
            out = self.catalog.read(self.spark, name, snap)
            self.metrics["stages"][f"{name}_rows"] = out.count()
            caching.release_all()
            return out, snap

        executed = self.run.unit(name, "all", unit)
        if not executed:
            self.metrics["stages"][f"{name}_rows"] = self.read(name).count()
        self.metrics["stages"][name] = round(time.time() - t0, 2)
