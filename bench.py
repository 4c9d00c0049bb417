"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the
transcripts-rollup throughput pipeline on deterministic synthetic
transcripts, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "rollup": {...}}

Every query is materialized with the noop sink so all output columns
are computed (count() would let Catalyst prune aggregates).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "rollup_1m",
    "rollup_1h",
    "rollup_1d",
    "latency_1m",
    "rolling_stats",
    "zscore_flags",
    "threshold_sweep",
    "threshold_sweep_raw_lt",
    "detector_lifecycle",
    "residual_cascade",
    "gapfill_1m",
    "topk_buckets",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_hamming",
    "embedding_topk",
    "embedding_near_dups",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "lang_id",
    "quality_score",
    "token_count",
    "doc_fingerprint",
    "multimodal_features",
]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "30000"))

    import __spark_entry__ as entry
    from yahoo_anomaly_detection_spark.session import get_spark
    from yahoo_anomaly_detection_spark.synthgen import gen_transcripts
    from yahoo_anomaly_detection_spark.operators.rollup import (
        rollup_cascade, rollup_points, transcripts_latency,
    )
    from yahoo_anomaly_detection_spark.operators.codec import (
        compress_buckets, decompress_buckets,
    )

    spark = get_spark("bench", cores=cpus,
                      shuffle_partitions=max(cpus * 2, 16))

    from yahoo_anomaly_detection_spark import caching

    qs = entry.queries()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        caching.release_all()  # free operator-internal materializations

    # ---- transcripts rollup throughput (north-rule headline) ----
    tmp = tempfile.mkdtemp(prefix="bench_transcripts_")
    rollup_stats: dict = {}
    try:
        t0 = time.time()
        gen_transcripts(spark, n_convs=n_convs, seed=42,
                        partitions=cpus * 2).write.mode("overwrite").parquet(tmp)
        rollup_stats["gen_sec"] = round(time.time() - t0, 2)

        tr = spark.read.parquet(tmp)
        n_turns = tr.count()
        rollup_stats["n_turns"] = n_turns

        t0 = time.time()
        points = transcripts_latency(tr)
        # scratch-parquet handoff between tiers, mirroring
        # jobs/rollup_job.py: cheaper than the columnar cache build
        # (~3x the tier compute, measured) and the honest cluster
        # analog (each tier is committed to storage and read back)
        t1m_path = os.path.join(tmp, "_tier_1m")
        rollup_points(points, "1m").write.mode("overwrite").parquet(t1m_path)
        t1m = spark.read.parquet(t1m_path)
        t1h = rollup_cascade(t1m, "1h")
        _noop(t1h)
        _noop(rollup_cascade(t1h, "1d"))
        dt = time.time() - t0
        timings["transcripts_rollup"] = round(dt, 3)
        rollup_stats["rollup_sec"] = round(dt, 2)
        rollup_stats["turns_per_sec"] = round(n_turns / dt, 1)

        t0 = time.time()
        enc = compress_buckets(points.where("value is not null"), "hour")
        enc.persist()
        _noop(enc)
        timings["gorilla_encode"] = round(time.time() - t0, 3)
        t0 = time.time()
        _noop(decompress_buckets(enc))
        timings["gorilla_decode"] = round(time.time() - t0, 3)
        enc.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": cpus,
                "rollup": rollup_stats,
            }
        )
    )


if __name__ == "__main__":
    main()
