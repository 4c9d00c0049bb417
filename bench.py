"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] plus the
transcripts-rollup throughput pipeline on deterministic synthetic
transcripts, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec",
     "queries": {...}, "sf": ..., "rollup": {...}}

Every query is materialized with the noop sink so all output columns
are computed (count() would let Catalyst prune aggregates).

Host-noise robustness: the sandbox host has multi-minute contention /
memory-backend episodes (BENCH/BASELINE.md documents first-touch page
faults degrading ~1000x). A single timed pass taken inside such a
window measures the host, not the engine — round 2's committed bench
overstated core queries 2-7x exactly this way. So the harness runs
$SPARK_GRAFT_BENCH_REPEATS (default 2) INTERLEAVED rounds — all
queries once, then all again — and reports best-of-R per query: a
degraded window inflates one round's numbers, not the minimum, and
interleaving means no single query eats the whole bad window. Each
round also records a memory-canary probe (fresh 240 MB numpy
first-touch, healthy < 0.5 s) in `canary_sec` so the committed
artifact carries evidence of host state at measurement time.
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
    "tier_merge_refresh",
    "latency_1m",
    "rolling_stats",
    "zscore_flags",
    "threshold_sweep",
    "threshold_sweep_raw_lt",
    "detector_lifecycle",
    "residual_cascade",
    "gapfill_1m",
    "topk_buckets",
    "sessionize",
    "session_stats",
    "value_percentiles",
    "events_vs_trailing_p95",
    "mad_flags",
    "counter_rate_1m",
    "turn_taking",
    "time_weighted_1h",
    "holt_1m",
    "ar2_flags",
    "candles_1h",
    "seasonal_zscore",
    "stl_lite_1m",
    "lttb_check",
    "cusum_flags",
    "hist_quantile_1d",
    "alert_states",
    "xcorr_1d",
    "breach_intervals",
    "slo_burn",
    "merged_intervals",
    "incident_overlap",
    "incident_overlap_bucketed",
    "m4_1h",
    "changepoint_flags",
    "alert_cooldown",
    "active_users_1d",
    "snaive_eval",
    "psi_drift_1d",
    "funnel_steps",
    "retention_cohorts",
    "holt_winters_1m",
    "event_transitions",
    "type_streaks",
    "depth_hist",
    "next_gap_1d",
    "trend_1d",
    "acf_1d",
    "pacf_1d",
    "theilsen_1d",
    "spectral_power",
    "ensemble_flags",
    "absent_1m",
    "realtime_rollup_1h",
    "incident_coverage_1d",
    "dq_checks_1d",
    "burstiness_1d",
    "asof_snapshot",
    "segment_rollup_1d",
    "stratified_sample",
    "weighted_sample",
    "rolling_actives_7d",
    "topk_per_band",
    "curated_corpus",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_canonical",
    "minhash_lsh_pairs",
    "simhash",
    "simhash_hamming",
    "embedding_topk",
    "embedding_near_dups",
    "ann_lsh_topk",
    "ann_lsh_multiprobe",
    "ann_recall_lsh",
    "ivf_topk",
    "lang_id",
    "quality_score",
    "quality_filter",
    "vocab_topk",
    "tfidf_top3",
    "doc_repetition",
    "decontaminate",
    "pmi_bigrams",
    "unigram_logppl",
    "seq_pack",
    "dup_ngram_spans",
    "heavy_hitters",
    "bpe_pairs",
    "sax_1h",
    "sax_motifs",
    "sigma_clip_1d",
    "leadlag_1h",
    "kalman_1m",
    "hampel_1m",
    "ewma_chart_1m",
    "embedding_outliers",
    "token_count",
    "doc_fingerprint",
    "multimodal_features",
    "cluster_split",
    "mixture_sample",
    "season_strength",
    "ks_drift_1d",
    "char_entropy",
    "rate_5m",
    "bigram_logppl",
    "key_skew",
    "sax_discords",
    "anomaly_movers",
    "ddsketch_1d",
    "fleet_outliers",
    "hll_actives_1d",
    "hll_cascade_7d",
    "cms_heavy_hitters",
    "pagerank_types",
    "benford_dq",
    "trigram_flows",
    "shingle_novelty",
    "zipf_fit",
    "survival_km",
    "apdex_1h",
    "embed_quant_error",
    "grouping_cube_1d",
    "pot_tail",
    "markov_entropy",
    "kmv_overlap",
    "journey_surprise",
    "shesd_flags",
    "did_impact",
    "dominant_period",
    "compaction_plan",
    "label_centroid_qc",
    "weekend_effect",
    "fleet_incidents",
    "props_profile",
    "fuzzy_token_pairs",
    "change_attribution",
    "funnel_latency",
    "pii_scan",
    "ri_audit",
    "fleet_beta",
    "normality_check",
    "bitmap_rolling_7d",
    "backfill_plan",
    "quota_violations",
    "lateness_audit",
    "session_lift",
    "time_folds",
    "touch_attribution",
    "join_size_est",
    "anomalous_days",
    "capacity_forecast",
    "mann_kendall",
    "spearman_corr",
    "bh_fdr",
    "wasserstein_drift",
    "ou_halflife",
    "hurst_exponent",
    "perm_entropy",
    "max_drawdown",
    "winsor_rollup",
    "gini_concentration",
    "ljung_box",
    "croston",
    "corr_clusters",
    "bloom_join",
    "series_profile",
    "variance_decomp",
    "matrix_profile",
    "matrix_profile_banded",
    "spread_monitor",
    "coreset_kcenter",
    "mmr_rerank",
    "granger_1d",
    "seasonal_mk",
    "corr_break",
    "coflag_lift",
]

# stages timed inside the transcripts pipeline (input generated once,
# stages repeated per round like the headline queries)
PIPELINE = ["transcripts_rollup", "gorilla_encode", "gorilla_decode"]


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _canary() -> float:
    """First-touch cost of a fresh 240 MB allocation (seconds).
    Healthy host: ~0.03-0.1 s. Degraded memory-backend episode:
    10-40 s. Mirrors scripts/run_bench_when_healthy.sh."""
    import numpy as np

    t0 = time.time()
    np.arange(30_000_000)
    return round(time.time() - t0, 3)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    n_convs = int(os.environ.get("SPARK_GRAFT_BENCH_CONVS", "30000"))
    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2")))
    # if EVERY planned repeat lands in a degraded-memory window
    # (canary > 5 s; healthy < 0.5 s), run up to this many extra
    # interleaved repeats hoping to catch a healthy window — the
    # best-of-R minimum then measures the engine, not the host
    extra_max = max(0, int(os.environ.get("SPARK_GRAFT_BENCH_EXTRA", "1")))

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
    headline = HEADLINE
    pipeline = PIPELINE
    # ad-hoc subset runs (builder sessions recording bests for new
    # queries); the driver never sets this, so per-round artifacts
    # always carry the full headline set
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        names = [n.strip() for n in only.split(",") if n.strip()]
        unknown = [n for n in names if n not in HEADLINE + PIPELINE]
        if unknown:
            raise SystemExit(f"SPARK_GRAFT_BENCH_ONLY unknown: {unknown}")
        headline = [n for n in HEADLINE if n in names]
        # the pipeline stages are one chained job (rollup feeds the
        # codec), so selecting ANY of them runs and records all three
        pipeline = PIPELINE if any(n in names for n in PIPELINE) else []
    runs: dict[str, list[float]] = {n: [] for n in headline + pipeline}
    canary: list[float] = []

    tmp = tempfile.mkdtemp(prefix="bench_transcripts_")
    rollup_stats: dict = {}
    try:
        if pipeline:
            # generate the transcripts input ONCE (untimed vs the
            # rollup: generation cost is reported separately, never
            # in a query)
            t0 = time.time()
            gen_transcripts(
                spark, n_convs=n_convs, seed=42, partitions=cpus * 2,
            ).write.mode("overwrite").parquet(tmp)
            rollup_stats["gen_sec"] = round(time.time() - t0, 2)
            tr = spark.read.parquet(tmp)
            n_turns = tr.count()
            rollup_stats["n_turns"] = n_turns

        done = 0
        while done < repeats or (
            done < repeats + extra_max and min(canary) > 5.0
        ):
            done += 1
            canary.append(_canary())

            for name in headline:
                t0 = time.time()
                _noop(qs[name](spark, sf_dir))
                runs[name].append(round(time.time() - t0, 3))
                caching.release_all()  # free operator-internal caches
                # sweep localCheckpoint blocks (CC loop) so they don't
                # accumulate across queries and skew later timings
                caching.release_orphan_rdds(spark)

            if not pipeline:
                continue
            # ---- transcripts rollup throughput (north-rule headline)
            t0 = time.time()
            points = transcripts_latency(tr)
            # scratch-parquet handoff between tiers, mirroring
            # jobs/rollup_job.py: cheaper than the columnar cache
            # build (~3x the tier compute, measured) and the honest
            # cluster analog (each tier is committed to the
            # distributed store and read back by the next stage)
            t1m_path = os.path.join(tmp, "_tier_1m")
            rollup_points(points, "1m").write.mode("overwrite").parquet(
                t1m_path)
            t1m = spark.read.parquet(t1m_path)
            t1h = rollup_cascade(t1m, "1h")
            _noop(t1h)
            _noop(rollup_cascade(t1h, "1d"))
            runs["transcripts_rollup"].append(round(time.time() - t0, 3))

            # untimed handoff: materialize the latency series once so
            # the codec stages time the CODEC — `points` is lazy and
            # would otherwise replay the whole lag-window derivation
            # inside the gorilla_encode number (same attribution rule
            # as gen_sec: input production is never in a query)
            pts_path = os.path.join(tmp, "_points")
            points.where("value is not null").write.mode(
                "overwrite").parquet(pts_path)
            pts = spark.read.parquet(pts_path)

            t0 = time.time()
            enc = compress_buckets(pts, "hour")
            enc.persist()
            _noop(enc)
            runs["gorilla_encode"].append(round(time.time() - t0, 3))
            t0 = time.time()
            _noop(decompress_buckets(enc))
            runs["gorilla_decode"].append(round(time.time() - t0, 3))
            enc.unpersist()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)

    timings = {name: min(ts) for name, ts in runs.items()}
    if pipeline:
        dt = timings["transcripts_rollup"]
        rollup_stats["rollup_sec"] = round(dt, 2)
        rollup_stats["turns_per_sec"] = round(n_turns / dt, 1)

    total = round(sum(timings.values()), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    summary = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "cpus": cpus,
        "repeats": repeats,
        "repeats_run": len(canary),
        "canary_sec": canary,
        "rollup": rollup_stats,
    }
    # full artifact (incl. every repeat's timing) goes to a sidecar;
    # stdout carries ONLY the compact summary line, kept well under
    # the driver's 2000-char tail capture (round 3's line embedded
    # all_runs, overflowed the capture, and committed as parsed=null)
    sidecar = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_summary.json"
    )
    with open(sidecar, "w") as f:
        json.dump({**summary, "all_runs": runs}, f, indent=1)
    line = json.dumps(summary, separators=(",", ":"))
    if len(line) > 1900:  # drop per-query detail before losing the line
        slim = dict(summary, queries={"see": "BENCH_summary.json"})
        line = json.dumps(slim, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    main()
