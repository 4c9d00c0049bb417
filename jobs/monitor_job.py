"""End-to-end series-monitoring job — the observability spark-submit
entry point (companion to ``rollup_job.py`` / ``curation_job.py``).

    spark-submit --py-files yads.zip jobs/monitor_job.py \
        --input /path/transcripts_parquet --catalog-root /path/warehouse \
        [--run-id RUN] [--pad-seconds 120] [--absent-k 3]

Pipeline: bronze ingest → per-turn latency series → 1m tier →
majority-vote detector ensemble (z-score + median/MAD + two-sided
CUSUM, flag where ≥2 agree) → flag→episode consolidation → episodes
padded ±``--pad-seconds`` and merged into incident windows (near-
adjacent flaps coalesce) → per-(conversation, day) incident coverage
report — plus the absence channel: heartbeat gaps of ≥``--absent-k``
consecutive empty 1m buckets (the failure mode value detectors are
structurally blind to). Every stage commits through the Iceberg-style
catalog with a per-stage checkpoint: re-running the same --run-id
skips completed stages, and resumed stages read the snapshots THIS
run committed (time travel), never another run's overwrites.

Prints ONE JSON line of metrics (rows + wall seconds per stage,
skipped units on resume).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from yahoo_anomaly_detection_spark.session import get_spark  # noqa: E402
from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog  # noqa: E402
from yahoo_anomaly_detection_spark.operators.checkpoint import (  # noqa: E402
    CheckpointedRun,
    StageRunner,
)


def main(argv: list[str] | None = None) -> dict:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="transcripts parquet dir")
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--run-id", default="mon0")
    ap.add_argument("--pad-seconds", type=int, default=120,
                    help="widen each flag episode by this much on both "
                         "sides before merging, so near-adjacent flaps "
                         "coalesce into one incident window")
    ap.add_argument("--absent-k", type=int, default=3,
                    help="consecutive empty 1m buckets before the "
                         "absence channel fires")
    ap.add_argument("--z-k", type=float, default=3.0)
    ap.add_argument("--mad-k", type=float, default=3.0)
    ap.add_argument("--cusum-h", type=float, default=5.0)
    ap.add_argument("--shuffle-partitions", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    args = ap.parse_args(argv)
    if args.pad_seconds < 0:
        raise ValueError(f"--pad-seconds must be >= 0, got {args.pad_seconds}")

    from pyspark.sql import functions as F

    from yahoo_anomaly_detection_spark.operators import alerting, tsanalytics
    from yahoo_anomaly_detection_spark.operators.rollup import (
        rollup_points, transcripts_latency,
    )
    from yahoo_anomaly_detection_spark.sources.ingest import bronze_transcripts

    spark = get_spark("monitor-job",
                      shuffle_partitions=args.shuffle_partitions)
    catalog = ParquetCatalog(args.catalog_root)
    run = CheckpointedRun(catalog, spark, args.run_id)

    metrics: dict = {"run_id": args.run_id, "stages": {}}
    t_all = time.time()
    bronze = bronze_transcripts(spark.read.parquet(args.input))
    runner = StageRunner(run, metrics)
    stage, stage_read = runner.stage, runner.read

    pad_us = int(args.pad_seconds) * 1_000_000

    stage("mon_tier_1m",
          lambda: rollup_points(transcripts_latency(bronze), "1m"))
    stage("mon_flags",
          lambda: tsanalytics.ensemble_flags(
              stage_read("mon_tier_1m").select(
                  "conv_id", "bucket_start",
                  F.col("mean").alias("mean_v"))
              .where(F.col("mean_v").isNotNull()),
              "mean_v", z_k=args.z_k, mad_k=args.mad_k,
              threshold_h=args.cusum_h))
    stage("mon_incidents",
          lambda: alerting.merge_intervals(
              alerting.flag_intervals(
                  stage_read("mon_flags"), "flag", sample_seconds=60)
              .select(
                  "conv_id",
                  F.timestamp_micros(
                      F.unix_micros(F.col("interval_start"))
                      - F.lit(pad_us)).alias("s"),
                  F.timestamp_micros(
                      F.unix_micros(F.col("interval_end"))
                      + F.lit(pad_us)).alias("e"),
              ),
              keys=("conv_id",), start_col="s", end_col="e"))
    stage("mon_coverage",
          lambda: alerting.interval_coverage(
              stage_read("mon_incidents"), bucket_seconds=86400,
              start_col="interval_start", end_col="interval_end"))
    stage("mon_absent",
          lambda: tsanalytics.absent_flags(
              stage_read("mon_tier_1m").select("conv_id", "bucket_start"),
              k=args.absent_k, tier_seconds=60)
          .where(F.col("absent") == 1))

    metrics["wall_sec"] = round(time.time() - t_all, 2)
    metrics["skipped_units"] = len(run.skipped)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
