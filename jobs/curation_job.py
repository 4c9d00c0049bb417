"""End-to-end corpus-curation job — the training-data-pipeline
spark-submit entry point (companion to ``rollup_job.py``).

    spark-submit --py-files yads.zip jobs/curation_job.py \
        --input /path/documents_parquet --catalog-root /path/warehouse \
        [--run-id RUN] [--min-quality 0.4] [--rates 0.25,0.5,1.0]

Pipeline: per-doc text digest (the text-equality invariant column) →
quality gate (composite quality + stopword ratio + language) →
canonical near-dup survivors (MinHash+LSH → exact verify → connected
components → keep min-id per cluster) → deterministic stratified
sample → curated corpus = the intersection (two left_semi joins on
doc_id). Every stage commits its id table through the Iceberg-style
catalog with a per-stage checkpoint, so re-running the same --run-id
skips completed stages (resume) and the curated set is reproducible
bit-for-bit (all hashes md5-derived, sampling salted — no RNG state).

Prints ONE JSON line of metrics (rows per stage, wall seconds,
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
    ap.add_argument("--input", required=True, help="documents parquet dir")
    ap.add_argument("--catalog-root", required=True)
    ap.add_argument("--run-id", default="cur0")
    ap.add_argument("--min-quality", type=float, default=0.4)
    ap.add_argument("--min-stop-ratio", type=float, default=0.01)
    ap.add_argument("--langs", default="en")
    ap.add_argument("--rates", default="0.25,0.5,1.0")
    ap.add_argument("--salt", default="s0")
    ap.add_argument("--ngram", type=int, default=3)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--reliable-cc", action="store_true",
                    help="checkpoint each connected-components round "
                         "to the catalog scratch dir (survives "
                         "executor loss on a real cluster)")
    ap.add_argument("--shuffle-partitions", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "64")))
    args = ap.parse_args(argv)

    from pyspark.sql import functions as F

    from yahoo_anomaly_detection_spark.operators import dedup, textstats

    spark = get_spark("curation-job",
                      shuffle_partitions=args.shuffle_partitions)
    catalog = ParquetCatalog(args.catalog_root)
    run = CheckpointedRun(catalog, spark, args.run_id)
    langs = tuple(args.langs.split(","))
    rates = tuple(float(r) for r in args.rates.split(","))
    if len(rates) != 3:
        # fail before any stage runs — stratified_sample indexes three
        # band rates, and a wrong count would otherwise crash (or
        # silently truncate) after the expensive dedup stage committed
        raise ValueError(
            f"--rates needs exactly 3 comma-separated values "
            f"(short,medium,long bands), got {args.rates!r}"
        )
    cc_ckpt_dir = None
    if args.reliable_cc:
        # run-scoped scratch: the CC loop prunes superseded round
        # files itself, and the whole dir is deleted once the run's
        # stages have committed through the catalog (the checkpointed
        # RDDs back no surviving lineage after that) — repeated runs
        # must not accumulate checkpoint files in the warehouse
        import uuid

        cc_ckpt_dir = os.path.join(
            args.catalog_root, "_cc_checkpoints",
            f"{args.run_id}_{uuid.uuid4().hex[:8]}",
        )
        spark.sparkContext.setCheckpointDir(cc_ckpt_dir)

    metrics: dict = {"run_id": args.run_id, "stages": {}}
    t_all = time.time()
    docs = spark.read.parquet(args.input)
    # shared stage scaffold (snapshot-pinned resume isolation) lives
    # in operators/checkpoint.py — same contract as monitor_job
    runner = StageRunner(run, metrics)
    stage, stage_read = runner.stage, runner.read

    try:
        # per-row text-equality invariant column (BASELINE input_hint)
        stage("doc_digest",
              lambda: docs.select(
                  "doc_id", F.sha2(F.col("text"), 256).alias("text_sha")))
        stage("quality_ids",
              lambda: textstats.quality_filter(
                  docs, min_quality=args.min_quality,
                  min_stop_ratio=args.min_stop_ratio, langs=langs))
        stage("canonical_ids",
              lambda: dedup.canonical_corpus(
                  docs, n=args.ngram, threshold=args.threshold,
                  reliable=args.reliable_cc))
        stage("sample_ids",
              lambda: textstats.stratified_sample(
                  docs, rates=rates, salt=args.salt))
        stage("curated_ids",
              lambda: stage_read("quality_ids").select("doc_id")
              .join(stage_read("canonical_ids").select("doc_id"),
                    "doc_id", "left_semi")
              .join(stage_read("sample_ids").select("doc_id"),
                    "doc_id", "left_semi"))
    finally:
        # also on failure: the dir is run-scoped (fresh uuid per run,
        # never resumed from), so a crashed run must not leak its CC
        # round files into the warehouse forever
        if cc_ckpt_dir is not None:
            import shutil

            shutil.rmtree(cc_ckpt_dir, ignore_errors=True)

    metrics["wall_sec"] = round(time.time() - t_all, 2)
    metrics["skipped_units"] = len(run.skipped)
    print(json.dumps(metrics))
    return metrics


if __name__ == "__main__":
    main()
