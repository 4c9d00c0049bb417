"""Series-diagnostics spark-submit job — deploys the statistical-
testing layer (``operators/statstests.py``) over a transcripts table
as a checkpointed, resumable pipeline (companion to
``monitor_job.py``, which runs the DETECTORS; this job runs the
pre-detector DIAGNOSTICS that say whether those detectors'
assumptions hold).

    spark-submit --py-files yads.zip jobs/profile_job.py \\
        --input /path/transcripts_parquet --catalog-root /path/warehouse \\
        [--run-id RUN] [--fdr-q 0.05] [--corr-threshold 0.6]

Pipeline: bronze ingest → per-turn latency series → per-CONVERSATION
health profile (``series_profile``: trend, memory, regularity,
whiteness, mean-reversion, drawdown, intermittency — two shared
tier scans feeding all seven branches) → fleet-wide BH-FDR day
anomalies (``bh_fdr``) → day-over-day W1 latency drift
(``wasserstein_drift``) → per-ROLE correlation families
(``corr_clusters`` over the role key: Spearman's pair join is
quadratic in the key's cardinality, so the family analysis runs on
the 3-role panel, never per-conversation). Every stage commits
through the Iceberg-style catalog with a per-stage checkpoint:
re-running the same --run-id skips completed stages and reads the
snapshots THIS run committed (time travel), never another run's
overwrites.

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
    ap.add_argument("--run-id", default="prof0")
    ap.add_argument("--fdr-q", type=float, default=0.05,
                    help="Benjamini-Hochberg false-discovery budget")
    ap.add_argument("--corr-threshold", type=float, default=0.6,
                    help="|Spearman rho| edge threshold for the "
                         "role-correlation families")
    ap.add_argument("--shuffle-partitions", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    args = ap.parse_args(argv)
    if not 0.0 < args.fdr_q < 1.0:
        raise ValueError(f"--fdr-q must be in (0,1), got {args.fdr_q}")

    from pyspark.sql import functions as F

    from yahoo_anomaly_detection_spark import caching
    from yahoo_anomaly_detection_spark.operators import statstests
    from yahoo_anomaly_detection_spark.operators.rollup import (
        transcripts_latency,
    )
    from yahoo_anomaly_detection_spark.sources.ingest import bronze_transcripts

    spark = get_spark("profile-job",
                      shuffle_partitions=args.shuffle_partitions)
    catalog = ParquetCatalog(args.catalog_root)
    run = CheckpointedRun(catalog, spark, args.run_id)

    metrics: dict = {"run_id": args.run_id, "stages": {}}
    t_all = time.time()
    bronze = bronze_transcripts(spark.read.parquet(args.input))
    runner = StageRunner(run, metrics)
    stage = runner.stage

    lat = (transcripts_latency(bronze)
           .where(F.col("value").isNotNull()))
    # role-keyed latency for the family stage: same lag-over-turn
    # derivation, keeping the CURRENT turn's role as the series key
    from pyspark.sql.window import Window as W

    _w = W.partitionBy("conv_id").orderBy("turn_idx")
    _us = F.unix_micros(F.col("ts"))
    lat_roles = (bronze.select(
        "role", "ts",
        ((_us - F.lag(_us).over(_w)) / F.lit(1e6)).alias("value"))
        .where(F.col("value").isNotNull()))

    try:
        stage("prof_series",
              lambda: statstests.series_profile(
                  lat, key="conv_id", ts_col="ts",
                  value_col="value"))
        stage("prof_fdr",
              lambda: statstests.bh_fdr(
                  lat, q=args.fdr_q, key="conv_id", ts_col="ts",
                  value_col="value").where(F.col("reject") == 1))
        stage("prof_drift",
              lambda: statstests.wasserstein_drift(
                  lat, key="conv_id", ts_col="ts",
                  value_col="value"))
        stage("prof_families",
              lambda: statstests.corr_clusters(
                  lat_roles, threshold=args.corr_threshold,
                  key="role", ts_col="ts", value_col="value"))
    finally:
        caching.release_all()

    metrics["wall_sec"] = round(time.time() - t_all, 2)
    metrics["skipped_units"] = len(run.skipped)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
