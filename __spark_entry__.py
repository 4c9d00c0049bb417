"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes one entry per implemented operator from
SURVEY.md §2 (plus the training-data-pipeline ops); ``oracle_sql()``
carries the DuckDB-equivalent ANSI SQL for each. Column names and
rounding (4 decimals on all computed doubles) are kept identical on
both sides so the driver's order-insensitive value-hash matches.

Conventions:
- series view over ``events``: conv_id = CAST(user_id AS STRING),
  ts, value (FIXTURES.md F3 — user_id plays conv_id).
- synthetic binary label for sweep/metric queries:
  label = (event_id % 97) < 5  (deterministic, both engines).
- population std everywhere (numpy ddof=0 semantics per SURVEY A2,
  /root/reference/StatsTesting/arma_anm_detc.py:62).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.sources import ingest
from yahoo_anomaly_detection_spark.operators import rollup, stats, gapfill
from yahoo_anomaly_detection_spark.operators import cascade as cascade_op
from yahoo_anomaly_detection_spark.operators import dedup, similarity, textstats
from yahoo_anomaly_detection_spark.operators import multimodal, sessions
from yahoo_anomaly_detection_spark.operators import tsanalytics
from yahoo_anomaly_detection_spark.operators import alerting
from yahoo_anomaly_detection_spark.operators import sketches
from yahoo_anomaly_detection_spark.operators import curation, enrich, journeys
from yahoo_anomaly_detection_spark.operators import refresh as refresh_op
from yahoo_anomaly_detection_spark.operators import layout
from yahoo_anomaly_detection_spark.operators import statstests
from yahoo_anomaly_detection_spark.functions.portable import portable_round

TRAIN_END = "2024-01-15 00:00:00"
VAL_END = "2024-01-23 00:00:00"
GAPFILL_DAY = ("2024-01-05 00:00:00", "2024-01-06 00:00:00")

_R = 4  # rounding decimals for computed doubles (both engines)


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ingest.events_as_series(ingest.load_table(spark, sf_dir, "events"))


def _events_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat scored series with the deterministic synthetic label."""
    ev = ingest.load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("value").cast("double").alias("score"),
        (F.pmod(F.col("event_id"), F.lit(97)) < 5).cast("int").alias("label"),
    )


def _round_cols(df: DataFrame, cols: list[str], nd: int = _R) -> DataFrame:
    out = df
    for c in cols:
        out = out.withColumn(c, portable_round(F.col(c), nd))
    return out


def _tier_select(t: DataFrame) -> DataFrame:
    return _round_cols(
        t.select(
            "conv_id",
            "bucket_start",
            "cnt",
            "vcnt",
            F.col("sum").alias("sum_v"),
            F.col("sum_sq").alias("sum_sq_v"),
            F.col("min").alias("min_v"),
            F.col("max").alias("max_v"),
            F.col("mean").alias("mean_v"),
            F.col("std").alias("std_v"),
            "turn_rate",
        ),
        ["sum_v", "sum_sq_v", "min_v", "max_v", "mean_v", "std_v", "turn_rate"],
    )


# --------------------------------------------------------------- queries
def q_rollup_1m(spark, sf_dir):
    return _tier_select(rollup.rollup_points(_series(spark, sf_dir), "1m"))


def q_rollup_1h(spark, sf_dir):
    """1h tier via exact recombination FROM the 1m tier (cascade) —
    parity vs the oracle's direct-from-raw aggregation proves the
    continuous-aggregate recombination (SURVEY §7.2 step 4)."""
    t1m = rollup.rollup_points(_series(spark, sf_dir), "1m")
    return _tier_select(rollup.rollup_cascade(t1m, "1h"))


def q_rollup_1d(spark, sf_dir):
    t1m = rollup.rollup_points(_series(spark, sf_dir), "1m")
    t1h = rollup.rollup_cascade(t1m, "1h")
    return _tier_select(rollup.rollup_cascade(t1h, "1d"))


def q_tier_merge_refresh(spark, sf_dir):
    """Continuous-aggregate REFRESH math (operators/rollup.merge_tiers,
    the primitive behind jobs/refresh_job.py): the series is split by
    timestamp parity — so nearly every (conv, minute) bucket has points
    in BOTH halves — each half is rolled to 1m partials independently,
    the partials are merged (decomposable-state recombination) and
    cascaded to 1h. Oracle: direct 1h aggregation over the unsplit
    series. Parity proves a delta's partials merge into existing tier
    rows exactly, which is what lets an incremental refresh replace
    only affected day partitions at 10^12-turn scale."""
    ev = _series(spark, sf_dir)
    parity = F.unix_micros("ts") % 2
    halves = [ev.where(parity == i) for i in (0, 1)]
    merged_1m = rollup.merge_tiers(
        [rollup.rollup_points(h, "1m") for h in halves], "1m")
    return _tier_select(rollup.rollup_cascade(merged_1m, "1h"))


def q_latency_1m(spark, sf_dir):
    """lag-based inter-arrival latency per conversation → 1m tier
    (SURVEY §2.5 ranking note; rollup of the latency series)."""
    ev = _series(spark, sf_dir)
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("ts")
    lat = ev.select(
        "conv_id",
        "ts",
        ((F.unix_micros("ts") - F.lag(F.unix_micros("ts")).over(w)) / 1e6).alias(
            "value"
        ),
    )
    return _tier_select(rollup.rollup_points(lat, "1m"))


def q_rolling_stats(spark, sf_dir):
    t1m = rollup.rollup_points(_series(spark, sf_dir), "1m").select(
        "conv_id", "bucket_start", F.col("mean").alias("mean_v")
    )
    r = stats.rolling_stats(t1m, value_col="mean_v", k=10)
    return _round_cols(
        r.select("conv_id", "bucket_start", "mean_v", "rolling_mean",
                 "rolling_std", "residual"),
        ["mean_v", "rolling_mean", "rolling_std", "residual"],
    )


def q_zscore_flags(spark, sf_dir):
    sc = _events_scored(spark, sf_dir)
    flagged = stats.zscore_envelope_flags(sc, "score", y=3.0)
    return _round_cols(
        flagged.select("event_id", "score", "threshold", "pred"),
        ["score", "threshold"],
    )


def q_threshold_sweep(spark, sf_dir):
    sc = _events_scored(spark, sf_dir)
    g = stats.grid(spark, 1.0, 100.0, 1.0)
    sw = stats.threshold_sweep(sc, g, score_col="score", label_col="label")
    return _round_cols(
        sw.select("y", "threshold", "tp", "fp", "fn", "tn", "f1"),
        ["threshold", "f1"],
    )


def q_best_threshold(spark, sf_dir):
    sc = _events_scored(spark, sf_dir)
    g = stats.grid(spark, 1.0, 100.0, 1.0)
    sw = stats.threshold_sweep(sc, g, score_col="score", label_col="label")
    return _round_cols(
        stats.best_threshold(sw).select("y", "threshold", "f1", "tp", "fp",
                                        "fn", "tn"),
        ["threshold", "f1"],
    )


def q_confusion_metrics(spark, sf_dir):
    sc = _events_scored(spark, sf_dir)
    flagged = stats.zscore_envelope_flags(sc, "score", y=3.0)
    m = stats.confusion_metrics(flagged, "pred", "label")
    return _round_cols(
        m,
        ["precision", "recall", "f1", "accuracy", "auroc_binary",
         "auprc_binary"],
    )


def q_pred_value_counts(spark, sf_dir):
    sc = _events_scored(spark, sf_dir)
    flagged = stats.zscore_envelope_flags(sc, "score", y=3.0)
    return stats.pred_value_counts(flagged).withColumnRenamed("count", "n")


def q_gapfill_1m(spark, sf_dir):
    lo, hi = GAPFILL_DAY
    ev = _series(spark, sf_dir).where(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
    )
    t1m = rollup.rollup_points(ev, "1m").select(
        "conv_id", "bucket_start", F.col("mean").alias("mean_v")
    )
    g = gapfill.gapfill_linear(t1m, "1m", value_col="mean_v")
    return _round_cols(
        g.select("conv_id", "bucket_start", "mean_v", "mean_v_filled",
                 F.col("gap_filled").cast("int").alias("gap_filled")),
        ["mean_v", "mean_v_filled"],
    )


def q_absent_1m(spark, sf_dir):
    # Prometheus-absent() heartbeat monitoring over the gap-fill day:
    # every 1m bucket between a conversation's first and last sample,
    # consecutive-miss run counting, absent fires from the 3rd
    # consecutive empty bucket (pure integer logic, engine-exact)
    lo, hi = GAPFILL_DAY
    ev = _series(spark, sf_dir).where(
        (F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi))
    )
    obs = ev.select(
        "conv_id", F.date_trunc("minute", F.col("ts")).alias("bucket_start")
    )
    return tsanalytics.absent_flags(obs, k=3, tier_seconds=60)


def q_realtime_rollup_1h(spark, sf_dir):
    # TimescaleDB real-time continuous aggregate: materialized 1h
    # tier below the (bucket-aligned) watermark ∪ on-the-fly rollup
    # of the raw tail — the oracle is the PLAIN full-scan tier SQL,
    # so the gate proves splice ≡ full recompute
    wm = "2024-01-16 00:00:00"
    ev = _series(spark, sf_dir)
    tier = rollup.rollup_points(ev.where(F.col("ts") < F.lit(wm)), "1h")
    return _tier_select(refresh_op.realtime_splice(tier, ev, "1h", wm))


def q_incident_coverage_1d(spark, sf_dir):
    # SLO coverage rollup: merged (disjoint) incident effect windows
    # exploded to the days they touch, clipped overlap summed per
    # (conversation, day) — downtime seconds + share of day
    mi = alerting.merge_intervals(_event_intervals(spark, sf_dir),
                                  keys=("conv_id",),
                                  start_col="s", end_col="e")
    return alerting.interval_coverage(mi, bucket_seconds=86400)


def q_topk_buckets(spark, sf_dir):
    """top-3 busiest 1m buckets per conversation (SURVEY O1/W8)."""
    from pyspark.sql import Window as W

    t1m = rollup.rollup_points(_series(spark, sf_dir), "1m")
    w = W.partitionBy("conv_id").orderBy(F.desc("cnt"), F.asc("bucket_start"))
    return (
        t1m.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("conv_id", "bucket_start", "cnt", "rk")
    )


def q_tier_parity_1h(spark, sf_dir):
    """Cascade 1m→1h equals direct-from-raw 1h (equality join verify,
    SURVEY §2.3 'tier ⋈ tier')."""
    ev = _series(spark, sf_dir)
    via = rollup.rollup_cascade(rollup.rollup_points(ev, "1m"), "1h")
    direct = rollup.rollup_points(ev, "1h")
    j = via.alias("a").join(
        direct.alias("b"), on=["conv_id", "bucket_start"], how="full_outer"
    )
    mism = (
        F.col("a.cnt").isNull()
        | F.col("b.cnt").isNull()
        | (F.col("a.cnt") != F.col("b.cnt"))
        | (F.abs(F.col("a.mean") - F.col("b.mean")) > 1e-9)
        | (F.abs(F.col("a.std") - F.col("b.std")) > 1e-6)
    )
    return j.agg(
        F.count(F.lit(1)).alias("n_buckets"),
        F.sum(F.when(mism, 1).otherwise(0)).alias("n_mismatch"),
    )


def q_split_counts(spark, sf_dir):
    """train/val/test event-time splits (SURVEY S1)."""
    ev = _series(spark, sf_dir)
    tr, va, te = ingest.split_by_time(ev, TRAIN_END, VAL_END)

    def agg(df, name):
        return df.agg(
            F.lit(name).alias("split"),
            F.count(F.lit(1)).alias("n"),
            portable_round(F.sum("value"), _R).alias("sum_v"),
        )

    return agg(tr, "train").unionByName(agg(va, "val")).unionByName(
        agg(te, "test")
    )


def q_doc_sha(spark, sf_dir):
    """per-row text digest — the text-equality invariant column
    (BASELINE input_hint) applied to the documents table."""
    docs = ingest.load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", F.sha2(F.col("text"), 256).alias("text_sha"))


def q_ewma_1m(spark, sf_dir):
    """EWMA (α=0.3) over the per-conversation 1m mean series — the
    recursive stat (SURVEY W5/W6) via one applyInPandas per key."""
    t1m = rollup.rollup_points(_series(spark, sf_dir), "1m").select(
        "conv_id", "bucket_start", F.col("mean").alias("mean_v")
    )
    e = stats.ewma(t1m, "mean_v", alpha=0.3)
    return _round_cols(
        e.select("conv_id", "bucket_start", "mean_v", "ewma"),
        ["mean_v", "ewma"],
    )


def q_conv_stats_salted(spark, sf_dir):
    """Per-conversation global stats through the salted two-level
    aggregation (hot-key path, SURVEY §4) — must equal a plain
    groupBy, which is exactly what the oracle computes."""
    ev = _series(spark, sf_dir)
    v = F.col("value").cast("double")
    aggs = [
        F.count(F.lit(1)).alias("cnt"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    ]
    out = rollup.salted_agg(ev, "conv_id", aggs, buckets=16)
    return _round_cols(out, ["sum_v", "min_v", "max_v"])


def q_codec_roundtrip(spark, sf_dir):
    """Gorilla XOR + delta-of-delta round-trip self-verification:
    encode per (conv_id, hour) → decode → multiset-compare against the
    original points. n_mismatch must be 0 (bit-exact doubles + µs
    timestamps)."""
    from yahoo_anomaly_detection_spark.operators.codec import (
        compress_buckets, decompress_buckets,
    )

    pts = _series(spark, sf_dir).where(F.col("value").isNotNull())
    dec = decompress_buckets(compress_buckets(pts, "hour"))
    orig_m = pts.groupBy("conv_id", "ts", "value").agg(
        F.count(F.lit(1)).alias("n_o")
    )
    dec_m = dec.groupBy("conv_id", "ts", "value").agg(
        F.count(F.lit(1)).alias("n_d")
    )
    j = orig_m.join(dec_m, on=["conv_id", "ts", "value"], how="full_outer")
    return j.agg(
        F.sum(F.coalesce(F.col("n_o"), F.lit(0))).alias("n_points"),
        F.sum(
            F.when(
                F.coalesce(F.col("n_o"), F.lit(0))
                != F.coalesce(F.col("n_d"), F.lit(0)),
                1,
            ).otherwise(0)
        ).alias("n_mismatch"),
    )


def q_roc_auc(spark, sf_dir):
    """Tie-aware AUROC/AP on continuous scores (SURVEY O3/A9
    generalized beyond binary predictions)."""
    sc = _events_scored(spark, sf_dir)
    return _round_cols(
        stats.roc_auc(sc, "score", "label"),
        ["auroc", "average_precision"],
    )


def q_bof_eval(spark, sf_dir):
    """Bag-of-Functions basis pool (SURVEY §2.8 F1-F21) evaluated over
    x = 0..99 as JVM expressions, checked against DuckDB's math."""
    from yahoo_anomaly_detection_spark.functions import bof

    x = F.col("x").cast("double")
    cols = {
        "f_sin": bof.sin(x, 1.5, 0.2, 0.3),
        "f_cos": bof.cos(x, 1.5, 0.2, 0.3),
        "f_sin_abs": bof.sin_abs(x, 1.5, 0.2, 0.3),
        "f_sawtooth": bof.sawtooth_wave(x, 2.0, 7.0, 0.5),
        "f_si": bof.si(x, 1.0, 0.3, -2.0),
        "f_lin": bof.lin(x, 1.0, 0.5),
        "f_exp_sat": bof.exp_sat(x, 0.5, 2.0, 5.0),
        "f_exp_decay": bof.exp_decay(x, 0.5, 2.0, 5.0),
        "f_sqrt": bof.sqrt_fn(x, 0.0, 1.0, 2.0),
        "f_log10": bof.log10_fn(x, 0.0, 1.0, 1.0),
        "f_tanh": bof.tanh_fn(x, 1.0, 0.1, 50.0),
        "f_sig": bof.sig(x, 1.0, 0.2, -30.0),
        "f_gaus": bof.gaus(x, 2.0, 0.001, 50.0),
        "f_step": bof.step(x, 1.0, 30.0),
        "f_rect": bof.rect(x, 1.0, 20.0, 0.5, tmax=100.0),
        "f_hardlim": bof.hardlim(x, 50.0),
        "f_gauss_pdf": bof.gaussian_pdf(x, 50.0, 10.0),
    }
    df = spark.range(100).select(F.col("id").cast("int").alias("x"))
    out = df.select("x", *[c.alias(n) for n, c in cols.items()])
    return _round_cols(out, list(cols.keys()))


def q_threshold_sweep_raw_lt(spark, sf_dir):
    """Raw-grid less-than sweep — the isofor/VAE detector shape
    (SURVEY P3/A7, /root/reference/StatsTesting/isofor_anm_detc.py:56-76
    sweeps t in -0.10..-0.30 with scores < t;
    /root/reference/Testing/vae_anm_detc.py:91-99 likewise). Scores are
    mapped to the isofor-like negative range [-0.98, 0)."""
    sc = _events_scored(spark, sf_dir).select(
        "event_id", (-F.col("score") / 500.0).alias("score"), "label"
    )
    g = stats.grid(spark, -0.10, -0.30, -0.01)
    sw = stats.threshold_sweep(sc, g, score_col="score", label_col="label",
                               mode="raw", direction="<")
    return _round_cols(
        sw.select(portable_round(F.col("y"), _R).alias("y"),
                  "threshold", "tp", "fp", "fn", "tn", "f1"),
        ["threshold", "f1"],
    )


def q_detector_lifecycle(spark, sf_dir):
    """The reference's 3-phase detector lifecycle as ONE query:
    fit the envelope threshold on the VAL split (sweep y, max F1),
    apply it to the TEST split, report confusion metrics
    (/root/reference/main_stats.py:33-47 via
    /root/reference/StatsTesting/arma_anm_detc.py:56-104). The fitted
    (y, threshold) is a 1-row relation broadcast onto test — no
    driver-side collect."""
    ev = ingest.load_table(spark, sf_dir, "events")
    scored = ev.select(
        "ts",
        F.col("value").cast("double").alias("score"),
        (F.pmod(F.col("event_id"), F.lit(97)) < 5).cast("int").alias("label"),
    )
    _, val, test = ingest.split_by_time(scored, TRAIN_END, VAL_END)
    g = stats.grid(spark, 1.0, 100.0, 1.0)
    sw = stats.threshold_sweep(val, g, score_col="score", label_col="label")
    best = stats.best_threshold(sw).select(
        F.col("y").alias("best_y"), F.col("threshold").alias("fit_threshold")
    )
    applied = test.crossJoin(F.broadcast(best)).withColumn(
        "pred",
        F.when(F.col("score") > F.col("fit_threshold"), 1).otherwise(0),
    )
    m = (
        applied.groupBy("best_y", "fit_threshold")
        .agg(
            F.sum(F.when((F.col("pred") == 1) & (F.col("label") == 1), 1)
                  .otherwise(0)).alias("tp"),
            F.sum(F.when((F.col("pred") == 1) & (F.col("label") == 0), 1)
                  .otherwise(0)).alias("fp"),
            F.sum(F.when((F.col("pred") == 0) & (F.col("label") == 1), 1)
                  .otherwise(0)).alias("fn"),
            F.sum(F.when((F.col("pred") == 0) & (F.col("label") == 0), 1)
                  .otherwise(0)).alias("tn"),
        )
        .withColumn(
            "f1",
            F.when(
                2 * F.col("tp") + F.col("fp") + F.col("fn") > 0,
                2.0 * F.col("tp")
                / (2 * F.col("tp") + F.col("fp") + F.col("fn")),
            ).otherwise(F.lit(0.0)),
        )
    )
    return _round_cols(m, ["fit_threshold", "f1"])


def q_residual_cascade(spark, sf_dir):
    """W4 residual cascade (BoF reconstruct-subtract loop,
    /root/reference/Network/ITF/itf_residual.py:60-65) over the
    per-conversation 1m mean series — const → linear → sine stages as
    closed-form projections (operators/cascade.py)."""
    from yahoo_anomaly_detection_spark.operators.cascade import (
        residual_cascade,
    )

    t1m = rollup.rollup_points(_series(spark, sf_dir), "1m").select(
        "conv_id", "bucket_start", portable_round(F.col("mean"), _R).alias("v")
    )
    out = residual_cascade(t1m, value_col="v")
    return _round_cols(out, ["recon", "residual"])


def q_kl_closed_form(spark, sf_dir):
    """A6: closed-form KL divergence aggregate
    (-0.5·mean(1+logvar−mu²−exp(logvar)),
    /root/reference/Network/var_autoencoder.py:43-45). mu/logvar are
    deterministic projections of the events table so both engines see
    identical inputs."""
    ev = ingest.load_table(spark, sf_dir, "events")
    mu = (F.col("value").cast("double") - 50.0) / 50.0
    logvar = -(F.pmod(F.col("event_id"), F.lit(7)).cast("double") / 7.0)
    kl = -0.5 * F.avg(
        1.0 + logvar - mu * mu - F.exp(logvar)
    )
    return _round_cols(
        ev.agg(kl.alias("kl"), F.count(F.lit(1)).alias("n")), ["kl"]
    )


def q_ocsvm_remap(spark, sf_dir):
    """P5: OCSVM ±1 label remap (−1 → 0,
    /root/reference/StatsTesting/ocsvm_anm_detc.py:45) + value counts
    (A3). The ±1 'prediction' is the 2σ envelope sign."""
    sc = _events_scored(spark, sf_dir)
    st = sc.agg(F.avg("score").alias("_mu"),
                F.stddev_pop("score").alias("_sigma"))
    pm1 = sc.crossJoin(F.broadcast(st)).withColumn(
        "pred_pm1",
        F.when(F.col("score") > F.col("_mu") + 2 * F.col("_sigma"),
               F.lit(-1)).otherwise(F.lit(1)),
    )
    remapped = pm1.withColumn(
        "pred",
        F.when(F.col("pred_pm1") == -1, F.lit(0)).otherwise(
            F.col("pred_pm1")
        ),
    )
    return remapped.groupBy("pred").agg(F.count(F.lit(1)).alias("n"))


def q_best_epoch(spark, sf_dir):
    """A8: best-epoch min_by over an epochs-metrics table
    (/root/reference/Learning/learn_autoencoder.py:119-126 keeps the
    epoch with the lowest test loss). Epochs are a deterministic
    partition of events; selection is a single-pass min_by with
    lowest-epoch tie-break (the reference only replaces on strictly
    better loss)."""
    ev = ingest.load_table(spark, sf_dir, "events")
    epochs = ev.groupBy(
        F.pmod(F.col("event_id"), F.lit(20)).alias("epoch")
    ).agg(
        portable_round(F.avg(F.col("value").cast("double")), _R).alias(
            "test_loss"
        ),
        F.count(F.lit(1)).alias("n_batches"),
    )
    best = epochs.agg(
        F.min_by(
            F.struct("epoch", "test_loss", "n_batches"),
            F.struct("test_loss", "epoch"),
        ).alias("b")
    )
    return best.select("b.*")


# ----------------------------------------------- training-data pipeline ops
def _docs(spark, sf_dir):
    return ingest.load_table(spark, sf_dir, "documents")


def _embs(spark, sf_dir):
    return ingest.load_table(spark, sf_dir, "embeddings")


def _events_raw(spark, sf_dir):
    return ingest.load_table(spark, sf_dir, "events")


def q_sessionize(spark, sf_dir):
    # gap-based sessionization: one user_id shuffle, two pipelined
    # window phases (lag break-detect + running session number)
    return sessions.sessionize(_events_raw(spark, sf_dir),
                               gap_seconds=28800)


def q_session_stats(spark, sf_dir):
    # per-session feature aggregates over the same partitioning
    return sessions.session_stats(_events_raw(spark, sf_dir),
                                  gap_seconds=28800)


def q_events_vs_trailing_p95(spark, sf_dir):
    # TWO-PHASE as-of join (1-day buckets): window within
    # (event_type, day) + carry-in join over the bucket spine, so a
    # low-cardinality key never funnels its full history into one
    # task; same oracle as the single-phase formulation
    return sessions.events_vs_trailing_p95(_events_raw(spark, sf_dir))


def q_value_percentiles(spark, sf_dir):
    # exact interpolated p50/p95/p99 rollup (the oracle path);
    # rel_error= switches to the mergeable approx_percentile sketch
    # (map-side partials, no single-reducer group sort) at scale
    return sessions.value_percentiles(_events_raw(spark, sf_dir))


def q_event_transitions(spark, sf_dir):
    # first-order Markov transition matrix of consecutive event types
    # per user + per-from-state shares; one user-key exchange, share
    # window over the tiny (type x type) relation only
    return journeys.event_transitions(_events_raw(spark, sf_dir))


def q_type_streaks(spark, sf_dir):
    # longest same-type run per user (agent autonomy streak / retry
    # storm): segmented scan + run groupBy over ONE user exchange
    return journeys.type_streaks(_events_raw(spark, sf_dir))


def q_depth_hist(spark, sf_dir):
    # corpus depth profile: per-user event counts in EXACT power-of-
    # two buckets (integer log2 via base-2 digit length, no float)
    return journeys.depth_histogram(_events_raw(spark, sf_dir))


def q_next_gap_1d(spark, sf_dir):
    # re-engagement rollup: time to the same user's next event per
    # (event_type, day); lead window + map-side-combined groupBy
    return journeys.next_gap_1d(_events_raw(spark, sf_dir))


def q_funnel_steps(spark, sf_dir):
    # ordered first-touch funnel view→click→purchase: per-user
    # earliest step-k event strictly after their stage-(k−1) time;
    # per-step filtered scans + shrinking user-key joins, counts
    # unioned JVM-side
    return sessions.funnel(_events_raw(spark, sf_dir))


def q_retention_cohorts(spark, sf_dir):
    # cohort retention matrix: users grouped by first-activity day,
    # per-offset return counts + retention share; corpus touched only
    # by the (user, day) dedup + first-touch aggregates
    return sessions.retention_cohorts(_events_raw(spark, sf_dir))


def q_active_users_1d(spark, sf_dir):
    # exact distinct-cardinality rollup per (event_type, day) — the
    # DAU primitive (oracle path); rsd= switches to the mergeable
    # HyperLogLog++ sketch whose shuffle carries fixed-size sketches
    # instead of id sets
    return sessions.distinct_counts(_events_raw(spark, sf_dir))


def q_rolling_actives_7d(spark, sf_dir):
    # sliding 7-day distinct actives per observed day: corpus crosses
    # ONE (user, day)-dedup exchange, the trailing-window explode runs
    # on the deduped relation; oracle is the range-join formulation,
    # so the gate proves explode ≡ range join (sketch=True switches to
    # mergeable per-day HLL sketches for the 100 TB path)
    return sessions.rolling_actives(_events_raw(spark, sf_dir),
                                    window_days=7)


def q_tfidf_top3(spark, sf_dir):
    # top-3 characteristic terms per doc by smoothed TF-IDF (sklearn
    # formula); exploded corpus crosses ONE map-side-combined
    # exchange, idf is a broadcast vocab-sized relation, the rank
    # window partitions per doc (bounded by a doc's distinct tokens)
    return textstats.tfidf_topk(_docs(spark, sf_dir), m=3)


def q_embedding_outliers(spark, sf_dir):
    # per-label centroid-cosine outlier flags (embedding-space DQ):
    # posexplode centroid avg is the only exchange the component
    # stream crosses; centroids and per-label stats broadcast back —
    # the corpus never shuffles, no low-cardinality window
    return similarity.embedding_outliers(_embs(spark, sf_dir), z_thresh=2.0)


def q_doc_repetition(spark, sf_dir):
    # Gopher repetition rules (type/token ratio, top-2-gram fraction,
    # duplicate-3-gram share + repetitive flag); exploded (1,2,3)-gram
    # stream crosses one map-side-combined (doc, n, gram) exchange,
    # then a shrinking per-doc rollup
    return curation.doc_repetition(_docs(spark, sf_dir))


def q_decontaminate(spark, sf_dir):
    # GPT-3-style benchmark decontamination: training docs flagged on
    # any 4-gram collision with the deterministic eval slice
    # (doc_id % 20 == 0); eval gram set broadcast, corpus never
    # shuffles for the probe
    return curation.decontaminate(_docs(spark, sf_dir), n=4, eval_mod=20)


def q_pmi_bigrams(spark, sf_dir):
    # top-40 PMI collocations (min_count=5): two map-side-combined
    # count exchanges, broadcast unigram vocab, TakeOrderedAndProject
    return curation.pmi_bigrams(_docs(spark, sf_dir), k=40, min_count=5)


def q_unigram_logppl(spark, sf_dir):
    # CCNet-style perplexity quality score under the corpus's own
    # unigram LM; ONE corpus exchange, vocab rollup rides the tf
    # relation, surprisal join is broadcast
    return curation.unigram_logppl(_docs(spark, sf_dir))


def q_seq_pack(spark, sf_dir):
    # next-fit sequence packing into 256-token training sequences,
    # per-source streams ordered by doc_id; one key exchange + one
    # vectorized mapInPandas pass (recursive-CTE oracle)
    out = curation.seq_pack(_docs(spark, sf_dir), capacity=256)
    return out.select("source", "doc_id", "n_tokens", "bin_id", "bin_fill")


def q_dup_ngram_spans(spark, sf_dir):
    # substring-level duplication profile (Lee et al. ExactSubstr at
    # 4-gram granularity): per doc, fraction of distinct 4-grams also
    # present in another doc; hashed-shingle relation shuffles ONCE
    # on the gram key, per-gram doc counts join back on the same
    # partitioning, shrinking per-doc rollup
    return dedup.dup_ngram_spans(_docs(spark, sf_dir), n=4)


def q_heavy_hitters(spark, sf_dir):
    # exact phi-heavy-hitters: per-partition Misra-Gries sketch
    # (bounded P*(k+1) candidate rows) + broadcast-semi-join exact
    # recount; output thresholded at cnt > phi*N
    return textstats.heavy_hitters(_docs(spark, sf_dir), phi=0.01,
                                   counters=400)


def q_bpe_pairs(spark, sf_dir):
    # BPE merge round 0: adjacent char-pair counts over word
    # occurrences, map-side-combined pair rollup (pair-vocab-sized),
    # TakeOrderedAndProject top-30
    return curation.bpe_pair_counts(_docs(spark, sf_dir), k=30)


def q_sax_1h(spark, sf_dir):
    # PAA + SAX per (conv, hour): broadcast per-series stats, ONE
    # map-side-combined (conv, hour, frame) exchange, word assembly
    # on the frame-sized relation
    return tsanalytics.sax_words(
        _series_with_id(spark, sf_dir), n_frames=4, alphabet=4)


def q_sax_motifs(spark, sf_dir):
    # fleet-wide recurring hour-shapes: top-20 complete SAX words
    # with occurrence + distinct-series counts; rides the sax word
    # exchanges, motif rollup is word-vocabulary-sized. 2 half-hour
    # frames — the sparse fixture rarely fills four 15-min frames
    return tsanalytics.sax_motifs(
        _series_with_id(spark, sf_dir), k=20, n_frames=2, alphabet=4)


def q_sigma_clip_1d(spark, sf_dir):
    # masking-aware outliers: 2-round iterative sigma clipping per
    # (conv, day) — round 2 recomputes mean/std over round-1
    # survivors; both rounds chained on ONE key exchange
    return tsanalytics.sigma_clip(
        _series_with_id(spark, sf_dir), k=3.0, rounds=2)


def q_leadlag_1h(spark, sf_dir):
    # lead-lag sweep: Pearson r of (x_t, y_{t+L}) for L in [-3, 3]
    # hours per metric pair, best lag marked; corpus crosses one
    # grid exchange, lag join/rank run on the reduced grid
    return tsanalytics.leadlag_corr(
        _events_raw(spark, sf_dir), tsanalytics.XCORR_METRICS,
        max_lag=3)


def q_weighted_sample(spark, sf_dir):
    # Efraimidis–Spirakis weight-proportional sample (k=50 by
    # n_chars): map-side salted-hash priority + TakeOrderedAndProject
    # — never a global sort
    return textstats.weighted_sample(_docs(spark, sf_dir), k=50,
                                     weight_col="n_chars", salt="w0")


def _t1m_mean(spark, sf_dir):
    """Per-conversation 1m mean series (non-null values only) — the
    shared input of the tsanalytics detectors (mad/holt/ar2); mirrors
    the oracle module's _T1M_BASE CTE."""
    return (
        _series(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("conv_id", F.date_trunc("minute", F.col("ts")).alias(
            "bucket_start"))
        .agg(F.avg(F.col("value").cast("double")).alias("mean_v"))
    )


def _t1h_mean(spark, sf_dir):
    """Hourly sibling of _t1m_mean (theilsen/spectral input); mirrors
    the oracle module's _T1H_BASE CTE."""
    return (
        _series(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("conv_id", F.date_trunc("hour", F.col("ts")).alias(
            "bucket_start"))
        .agg(F.avg(F.col("value").cast("double")).alias("mean_v"))
    )


def q_acf_1d(spark, sf_dir):
    # per-(conversation, day) autocorrelation at lags 1..3 over the 1m
    # mean series — the seasonality/persistence diagnostic; one hash
    # exchange serves the lag window AND the groupBy, unpivot runs on
    # the aggregated (3 rows/group) relation
    return tsanalytics.acf(_t1m_mean(spark, sf_dir), "mean_v",
                           lags=(1, 2, 3))


def q_pacf_1d(spark, sf_dir):
    # partial autocorrelation at lags 1..3 (Yule-Walker via the
    # Durbin-Levinson closed forms) per (conversation, day) — reads
    # the AR order off the same 1m series acf_1d diagnoses; one
    # (key, day) exchange serves both window phases and the groupBy
    return tsanalytics.pacf(_t1m_mean(spark, sf_dir), "mean_v")


def q_hampel_1m(spark, sf_dir):
    # Hampel despiking filter: ±3-sample centered rolling median/MAD
    # via one collect_list window (Spark has no median over a frame);
    # identical array-median formula on both engines
    return tsanalytics.hampel_flags(_t1m_mean(spark, sf_dir), "mean_v",
                                    k=3, nsig=3.0)


def q_ewma_chart_1m(spark, sf_dir):
    # EWMA control chart (Lucas-Saccucci): time-varying limit
    # L·σ·sqrt((1−λ)^2t + λ/(2−λ)(1−(1−λ)^2t)) matching the engine's
    # z0=x0 seed; recursion through the shared mapInPandas scan, the
    # μ/σ window reuses the key exchange
    return tsanalytics.ewma_chart(_t1m_mean(spark, sf_dir), "mean_v",
                                  alpha=0.3, big_l=3.0)


def q_kalman_1m(spark, sf_dir):
    # local-level Kalman filter (q=0.2, r=1.0) per series — adaptive
    # baseline with data-independent gain sequence, so the filter runs
    # as a time-varying-weight block scan; recursive-CTE oracle
    out = tsanalytics.kalman_level(_t1m_mean(spark, sf_dir), "mean_v",
                                   q=0.2, r=1.0)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "level", "gain"),
        ["mean_v", "level", "gain"],
    )


def q_theilsen_1d(spark, sf_dir):
    # Theil–Sen robust trend per (conversation, day) over the HOURLY
    # tier (≤24 points → ≤276 pairs per group by construction): median
    # of pairwise slopes + median intercept — the outlier-immune twin
    # of trend_1d's OLS
    return tsanalytics.theilsen_trend(_t1h_mean(spark, sf_dir), "mean_v")


def q_spectral_power(spark, sf_dir):
    # single-frequency DFT power at candidate periods (24h daily /
    # 168h weekly) per conversation over the hourly series — fraction
    # of variance a P-periodic sinusoid explains; ONE map-side-combined
    # groupBy of six moment sums, no window, no sort
    return tsanalytics.spectral_power(_t1h_mean(spark, sf_dir), "mean_v",
                                      periods_h=(24, 168))


def q_mad_flags(spark, sf_dir):
    """Robust (median/MAD) anomaly envelope over the per-conversation
    1m mean series — the outlier-immune twin of zscore_flags. Exact
    percentiles here (the oracle path); rel_error= switches both
    medians to the mergeable approx_percentile sketch."""
    out = tsanalytics.robust_flags(_t1m_mean(spark, sf_dir), "mean_v", k=3.0)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "med", "mad", "flag"),
        ["mean_v", "med", "mad"],
    )


def q_holt_1m(spark, sf_dir):
    # Holt double-exponential smoothing (level + trend) per series —
    # the two-state recursive scan, one vectorized mapInPandas pass
    # (recursive-CTE oracle)
    out = tsanalytics.holt(_t1m_mean(spark, sf_dir), "mean_v",
                           alpha=0.3, beta=0.1)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "level", "trend"),
        ["mean_v", "level", "trend"],
    )


def q_ar2_flags(spark, sf_dir):
    # distributed AR(2) Yule-Walker fit from lag-product aggregates +
    # one-step residuals + the reference's global envelope on |resid|
    res = tsanalytics.ar2_residuals(_t1m_mean(spark, sf_dir), "mean_v")
    flagged = stats.zscore_envelope_flags(
        res.withColumn("score", F.abs(F.col("resid"))), "score", y=3.0
    )
    return _round_cols(
        flagged.select("conv_id", "bucket_start", "mean_v",
                       "phi1", "phi2", "resid", "pred"),
        ["mean_v", "phi1", "phi2", "resid"],
    )


def _series_with_id(spark, sf_dir):
    """The series view plus event_id — the tie-break column the
    order-sensitive operators (counter_rate, time_weighted_avg) need
    for a total, engine-portable order."""
    return _events_raw(spark, sf_dir).select(
        F.col("user_id").cast("string").alias("conv_id"),
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )


def q_counter_rate_1m(spark, sf_dir):
    # Prometheus-style increase/rate per 1m bucket with counter-reset
    # handling; ONE conv_id shuffle serves the lag window AND the
    # bucket groupBy (plan-audited)
    return tsanalytics.counter_rate(
        _series_with_id(spark, sf_dir), bucket_seconds=60,
        order_cols=("event_id",),
    )


def q_turn_taking(spark, sf_dir):
    # per-conversation turn-taking profile (turns, roles, exact
    # role-switch count, inter-turn gap stats) over the transcript-
    # shaped event log; one user_id shuffle total
    return tsanalytics.turn_taking(_events_raw(spark, sf_dir))


def q_time_weighted_1h(spark, sf_dir):
    # TimescaleDB-style time-weighted average per (conv, hour):
    # trapezoidal integral / observed span, window partitioned by
    # (conv_id, bucket) so per-task input stays bounded
    return tsanalytics.time_weighted_avg(
        _series_with_id(spark, sf_dir), bucket_seconds=3600,
        order_cols=("event_id",),
    )


def q_candles_1h(spark, sf_dir):
    # OHLC candle downsample per (conv, hour): one map-side-combined
    # aggregate, open/close via min_by/max_by on the (ts, event_id)
    # total order — no window, no sort
    return tsanalytics.candles(
        _series_with_id(spark, sf_dir), bucket_seconds=3600,
        order_cols=("event_id",),
    )


def q_snaive_eval(spark, sf_dir):
    # seasonal-naive forecast baseline per series: predict each 1m
    # sample with its previous same-minute-of-hour observation, roll
    # up MAE/SMAPE — the bar any forecasting model must beat
    return tsanalytics.seasonal_naive_eval(
        _t1m_mean(spark, sf_dir), "mean_v", phase="minute_of_hour")


def q_holt_winters_1m(spark, sf_dir):
    # additive Holt-Winters (level+trend+4-periodic seasonal) per
    # series — the 2+m-state recursive scan; oracle = recursive CTE
    # with the seasonal buffer as 4 explicit columns
    out = tsanalytics.holt_winters(_t1m_mean(spark, sf_dir), "mean_v",
                                   alpha=0.3, beta=0.1, gamma=0.2, m=4)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "level",
                   "trend", "seasonal"),
        ["mean_v", "level", "trend", "seasonal"],
    )


def q_psi_drift_1d(spark, sf_dir):
    # Population Stability Index per (event_type, day) vs the
    # previous day: fixed-boundary histogram shares with Laplace
    # smoothing; only the first groupBy touches the raw corpus
    return tsanalytics.psi_drift(
        ingest.load_table(spark, sf_dir, "events"))


def q_seasonal_zscore(spark, sf_dir):
    # seasonal-profile flags: each 1m bucket vs the mean/std of its
    # own minute-of-hour phase across the conversation's history
    out = tsanalytics.seasonal_zscore(
        _t1m_mean(spark, sf_dir), "mean_v", phase="minute_of_hour", k=3.0
    )
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "phase",
                   "phase_mean", "phase_std", "flag"),
        ["mean_v", "phase_mean", "phase_std"],
    )


def q_cusum_flags(spark, sf_dir):
    # two-sided tabular CUSUM drift chart per series: accumulated
    # small same-sign deviations flag sustained level shifts that
    # point-wise envelopes miss (recursive-CTE oracle)
    out = tsanalytics.cusum_flags(_t1m_mean(spark, sf_dir), "mean_v",
                                  slack_k=0.5, threshold_h=5.0)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v",
                   "s_pos", "s_neg", "flag"),
        ["mean_v", "s_pos", "s_neg"],
    )


def q_trend_1d(spark, sf_dir):
    # per-(conversation, day) OLS linear trend: slope per hour,
    # intercept, r² via the mergeable ANSI regr_* moment aggregates —
    # ONE map-side-combined groupBy, nothing sorts
    return tsanalytics.linear_trend(_series(spark, sf_dir),
                                    bucket_seconds=86400)


def q_ensemble_flags(spark, sf_dir):
    # majority-vote anomaly ensemble over the 1m mean series: z-score
    # envelope + median/MAD envelope + two-sided CUSUM, flag where at
    # least two of the three detectors agree
    out = tsanalytics.ensemble_flags(_t1m_mean(spark, sf_dir), "mean_v")
    return _round_cols(out, ["mean_v"])


def q_dq_checks_1d(spark, sf_dir):
    # ingest data-quality audit per (conversation, day) over the
    # events log + deterministically injected dirt (every
    # event_id % 41 == 0 row re-appended with a huge ingest id and a
    # NULL value → duplicate ts, NULL, and an ingest-order regression
    # at each conv's block transition), so all five checks carry
    # signal on the clean fixture
    ev = ingest.load_table(spark, sf_dir, "events").select(
        F.col("user_id").cast("string").alias("conv_id"),
        "event_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    dirty = ev.where(F.pmod(F.col("event_id"), F.lit(41)) == 0).select(
        "conv_id",
        (F.col("event_id") + F.lit(100000000)).alias("event_id"),
        "ts",
        F.lit(None).cast("double").alias("value"),
    )
    return tsanalytics.dq_profile(ev.unionByName(dirty),
                                  bucket_seconds=86400,
                                  lo=1.0, hi=200.0)


def q_asof_snapshot(spark, sf_dir):
    # instant query: every conversation's latest 1m sample at the
    # evaluation time — one map-side-combined max/max_by aggregate
    # (no window, no corpus sort; engine strategy differs from the
    # oracle's row_number formulation on purpose)
    out = tsanalytics.asof_snapshot(
        _t1m_mean(spark, sf_dir), "2024-01-20 12:00:00", ("mean_v",))
    return _round_cols(out, ["mean_v"])


def q_segment_rollup_1d(spark, sf_dir):
    # star/snowflake metrics slice: events broadcast-enriched with
    # customer segment and nation name (facts NEVER shuffle for the
    # dims — two BroadcastHashJoins, plan-audited), then one
    # map-side-combined (segment, nation, day) rollup
    ev = ingest.load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"))
    enriched = enrich.broadcast_enrich(ev, [
        (ingest.load_table(spark, sf_dir, "customer"),
         "user_id", "c_custkey", ("c_mktsegment", "c_nationkey")),
        (ingest.load_table(spark, sf_dir, "nation"),
         "c_nationkey", "n_nationkey", ("n_name",)),
    ])
    return enriched.groupBy(
        "c_mktsegment", "n_name",
        F.date_trunc("day", F.col("ts")).alias("bucket_start"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        portable_round(F.avg("value"), _R).alias("mean_v"),
    )


def q_burstiness_1d(spark, sf_dir):
    # inter-arrival burstiness per (conversation, day): mean gap, CV
    # and the Goh–Barabási B = (σ−μ)/(σ+μ) — the arrival-pattern twin
    # of the value detectors (retry storms move B before any value
    # threshold trips)
    return tsanalytics.burstiness(_series_with_id(spark, sf_dir),
                                  bucket_seconds=86400,
                                  order_cols=("event_id",))


def q_hist_quantile_1d(spark, sf_dir):
    # Prometheus-style histogram_quantile p95 per (event_type, day):
    # fixed cumulative le-buckets in ONE map-side-combined groupBy —
    # the exchange carries histograms, never samples
    return tsanalytics.hist_quantile(_events_raw(spark, sf_dir), q=0.95)


def q_alert_states(spark, sf_dir):
    # flap-free FOR-duration alerting over the 1m mean series: a
    # breach must hold 3 consecutive samples before the alert fires
    # (states ok / pending / firing; sessionize-idiom run-length)
    out = tsanalytics.alert_states(_t1m_mean(spark, sf_dir), "mean_v",
                                   threshold=100.0, for_k=3)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "breach",
                   "run_pos", "state"),
        ["mean_v"],
    )


def q_xcorr_1d(spark, sf_dir):
    # cross-metric co-movement: Pearson r per day for every metric
    # pair, aligned on the hourly fleet-wide grid; r from the six
    # decomposable pair sums (two map-side-combined groupBys)
    return tsanalytics.metric_corr(_events_raw(spark, sf_dir),
                                   tsanalytics.XCORR_METRICS)


def q_breach_intervals(spark, sf_dir):
    # flag→episode consolidation: maximal runs of breached 1m samples
    # become incident intervals (sessionize idiom, one key exchange);
    # same breach rule as alert_states so the layers compose
    flagged = _t1m_mean(spark, sf_dir).withColumn(
        "breach", (F.col("mean_v") > 100.0).cast("int"))
    return alerting.flag_intervals(flagged, "breach", sample_seconds=60)


def q_slo_burn(spark, sf_dir):
    # SRE multi-window burn-rate paging over the 1m mean series: page
    # only when the trailing 5m AND 1h breach ratios both exceed
    # their thresholds; two time-RANGE frames in ONE window operator
    out = alerting.slo_burn(_t1m_mean(spark, sf_dir), "mean_v",
                            threshold=100.0)
    return _round_cols(
        out.select("conv_id", "bucket_start", "breach", "short_ratio",
                   "long_ratio", "page"),
        ["short_ratio", "long_ratio"],
    )


def q_m4_1h(spark, sf_dir):
    # M4 downsample per (conv, hour): first/last/low/high value AND
    # timestamp — the pixel-exact line-chart reduction (VLDB'14) —
    # via one map-side-combined aggregate with composite min_by /
    # max_by orderings; no window, no per-bucket sort
    return tsanalytics.m4(
        _series_with_id(spark, sf_dir), bucket_seconds=3600,
        order_cols=("event_id",),
    )


def q_changepoint_flags(spark, sf_dir):
    # sliding two-window mean-shift changepoint score over the 1m
    # mean series: trailing-10 vs leading-10 Welch statistic, both
    # frames in ONE window operator over one exchange
    out = tsanalytics.changepoints(_t1m_mean(spark, sf_dir), "mean_v",
                                   w=10, k=3.0)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "mean_l",
                   "mean_r", "score", "flag"),
        ["mean_v"],
    )


def q_alert_cooldown(spark, sf_dir):
    # notification rate limiting: threshold alerts on the 1m mean
    # series, then suppress re-pages within 10 minutes of the last
    # NOTIFIED alert (anchor-resetting sequential recursion —
    # recursive-CTE oracle, position-major numpy kernel engine-side)
    flagged = _t1m_mean(spark, sf_dir).withColumn(
        "flag", (F.col("mean_v") > 100.0).cast("int"))
    out = alerting.alert_cooldown(flagged, "flag", cooldown_seconds=600)
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "notify"),
        ["mean_v"],
    )


def _event_intervals(spark, sf_dir):
    """Synthetic per-event effect windows [ts, ts+(60+floor(value))s)
    — deterministic, data-derived; mirrors the oracle's iv CTE."""
    ev = ingest.load_table(spark, sf_dir, "events")
    dur_us = (F.lit(60) + F.floor(F.col("value").cast("double"))) \
        * F.lit(1_000_000)
    ts = F.col("ts").cast("timestamp")
    return ev.where(F.col("value").isNotNull()).select(
        F.col("user_id").cast("string").alias("conv_id"),
        ts.alias("s"),
        F.timestamp_micros(F.unix_micros(ts) + dur_us).alias("e"),
    )


def q_merged_intervals(spark, sf_dir):
    # overlapping-interval union per conversation: running-max-of-end
    # segmented scan, never the O(n²) pairwise-overlap self-join
    return alerting.merge_intervals(_event_intervals(spark, sf_dir),
                                    keys=("conv_id",),
                                    start_col="s", end_col="e")


def _incident_top10(spark, sf_dir):
    mi = alerting.merge_intervals(_event_intervals(spark, sf_dir),
                                  keys=("conv_id",),
                                  start_col="s", end_col="e")
    return (
        mi.orderBy(F.desc("covered_us"), "conv_id", "interval_start")
        .limit(10)
        .withColumnRenamed("conv_id", "incident_conv")
        .select("incident_conv", "interval_start", "interval_end")
    )


def q_incident_overlap(spark, sf_dir):
    # incident attribution: the 10 longest merged effect windows
    # (deterministic tie-break) broadcast against ALL raw events via
    # a point-in-interval BroadcastNestedLoopJoin — the events never
    # shuffle; every top interval contains at least its own events,
    # so the inner join drops no incidents
    ev = ingest.load_table(spark, sf_dir, "events").select("user_id", "ts")
    joined = alerting.point_in_interval_join(
        ev, _incident_top10(spark, sf_dir), ts_col="ts")
    return joined.groupBy("incident_conv", "interval_start",
                          "interval_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_incident_overlap_bucketed(spark, sf_dir):
    # the SAME attribution through the scale path: bucketed equi-join
    # decomposition of the range predicate (for interval tables too
    # big to broadcast) — identical oracle as incident_overlap, so
    # the driver gate proves path equivalence end-to-end
    ev = ingest.load_table(spark, sf_dir, "events").select("user_id", "ts")
    joined = alerting.interval_join_bucketed(
        ev, _incident_top10(spark, sf_dir), ts_col="ts",
        bucket_seconds=3600)
    return joined.groupBy("incident_conv", "interval_start",
                          "interval_end").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_stl_lite_1m(spark, sf_dir):
    # STL-lite decomposition value = trend + seasonal + resid over
    # the 1m mean series: centered rolling-mean trend, minute-of-hour
    # phase seasonal, ONE exchange (phase window reuses the key
    # partitioning)
    out = tsanalytics.stl_lite(_t1m_mean(spark, sf_dir), "mean_v",
                               trend_halfwidth=5, phase="minute_of_hour")
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "trend", "phase",
                   "seasonal", "resid"),
        ["mean_v", "trend", "seasonal", "resid"],
    )


def q_lttb_check(spark, sf_dir):
    # LTTB downsample (n_out=20) + in-plan invariant verification:
    # exactly least(n, 20) points kept per series, endpoints always
    # kept (the sequential pick chain itself is not SQL-expressible;
    # the oracle checks these invariants from the input alone)
    sel = tsanalytics.lttb(_t1m_mean(spark, sf_dir), "mean_v", n_out=20,
                           ts_col="bucket_start")
    return sel.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_in"),
        F.sum(F.col("selected").cast("int")).alias("n_sel"),
        F.min_by(F.col("selected"), F.col("bucket_start")).cast("int")
        .alias("first_sel"),
        F.max_by(F.col("selected"), F.col("bucket_start")).cast("int")
        .alias("last_sel"),
    )


def q_dedup_exact(spark, sf_dir):
    return dedup.exact_dedup(dedup.with_synthetic_dups(_docs(spark, sf_dir)))


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(_docs(spark, sf_dir), n=3, threshold=0.8)


def q_minhash_signatures(spark, sf_dir):
    return dedup.minhash_signatures(_docs(spark, sf_dir), n=3, k=16)


def q_minhash_lsh_pairs(spark, sf_dir):
    return dedup.minhash_lsh_pairs(
        _docs(spark, sf_dir), n=3, k=16, bands=4, threshold=0.5
    )


def q_dup_clusters(spark, sf_dir):
    # connected components (min-label propagation) over n-gram
    # Jaccard pairs on the 3-member chain corpus; oracle = DuckDB
    # recursive-CTE transitive closure
    return dedup.dup_clusters(_docs(spark, sf_dir), n=3, threshold=0.5)


def q_dedup_canonical(spark, sf_dir):
    # the end-to-end dedup operator: chain corpus minus non-canonical
    # cluster members (keep min doc_id per component)
    return dedup.canonical_corpus(_docs(spark, sf_dir), n=3, threshold=0.5)


def q_anomaly_movers(spark, sf_dir):
    # day-over-day anomaly-rate movers: per-series global z-envelope
    # stats broadcast back, one (series, day) corpus exchange, lag +
    # day-rank windows on the tiny rate relation
    return alerting.anomaly_movers(_events_raw(spark, sf_dir), y=3.0)


def q_ddsketch_1d(spark, sf_dir):
    # DDSketch relative-error quantiles per (series, day): the corpus
    # crosses ONE map-side-combined (key, day, log-bucket) exchange —
    # exact mergeable bucket counts, never samples; p50/p95/p99 each
    # guaranteed within 1% relative error of the true rank sample
    return tsanalytics.ddsketch_quantiles(_series(spark, sf_dir))


def _t1d_mean(spark, sf_dir):
    """Per-conversation DAILY mean series — the cross-sectional axis
    input (all conversations share day buckets, so the fleet
    median/MAD at each day carries real signal; minute buckets are
    almost never shared on this fixture)."""
    return (
        _series(spark, sf_dir)
        .where(F.col("value").isNotNull())
        .groupBy("conv_id", F.date_trunc("day", F.col("ts")).alias(
            "bucket_start"))
        .agg(F.avg(F.col("value").cast("double")).alias("mean_v"))
    )


def q_fleet_outliers(spark, sf_dir):
    """Cross-sectional robust envelope: each conversation's daily
    mean vs the FLEET's median/MAD that day — flags who is abnormal
    vs everyone else today (mad_flags is the within-series twin; the
    grouping key flips from conv_id to the day bucket, so per-group
    size is fleet cardinality, not retention length)."""
    out = tsanalytics.robust_flags(
        _t1d_mean(spark, sf_dir), "mean_v", k=3.0,
        keys=("bucket_start",))
    return _round_cols(
        out.select("conv_id", "bucket_start", "mean_v", "med", "mad",
                   "flag"),
        ["mean_v", "med", "mad"],
    )


def q_hll_actives_1d(spark, sf_dir):
    # per-day approx-distinct users via the HLL register file — the
    # sketch crosses ONE (day, reg)-combined exchange (<=2^10 rows per
    # day), never one row per distinct user; exact count alongside
    # for auditability
    return sketches.hll_distinct(_events_raw(spark, sf_dir))


def q_hll_cascade_7d(spark, sf_dir):
    # tier-cascade proof for the non-decomposable aggregate: weekly
    # distinct estimated by MERGING daily registers (max) equals the
    # direct weekly sketch bit-for-bit — distinct rollups can ride
    # the same incremental machinery as sum/cnt tiers
    return sketches.hll_cascade(_events_raw(spark, sf_dir))


def q_cms_heavy_hitters(spark, sf_dir):
    # exact top-20 users probed against a 4x2048 Count-Min counter
    # file: bounded-memory frequency estimates (est >= exact always),
    # integer-exact in both engines
    return sketches.cms_topk_compare(_events_raw(spark, sf_dir),
                                     "user_id", k=20)


def q_pagerank_types(spark, sf_dir):
    # global stationary centrality of the journey graph (8-round
    # power iteration, dangling mass redistributed): each round is
    # one edge-keyed join + map-side-combined groupBy; rank /
    # node-count / dangling relations broadcast — fully lazy, no
    # driver action per round
    return journeys.pagerank_types(_events_raw(spark, sf_dir))


def q_benford_dq(spark, sf_dir):
    # Benford first-digit forensic screen per event_type: integer-
    # exact digit extraction (never floor(log10)), zero-filled digit
    # spine, chi-square per key; ONE corpus (key, digit) exchange
    return tsanalytics.benford_dq(_events_raw(spark, sf_dir))


def q_trigram_flows(spark, sf_dir):
    # top-k order-3 journey paths: two leads over ONE user-key
    # exchange, map-side-combined groupBy to <= |types|^3 rows,
    # TakeOrderedAndProject top-k
    return journeys.trigram_flows(_events_raw(spark, sf_dir), k=25)


def q_shingle_novelty(spark, sf_dir):
    # per-doc marginal-contribution novelty: share of the doc's
    # 3-gram shingles first seen at this doc_id; one shingle-keyed
    # window exchange + one doc-keyed rollup, no self-join
    return curation.shingle_novelty(_docs(spark, sf_dir), n=3)


def q_zipf_fit(spark, sf_dir):
    # corpus Zipf power-law fit: OLS of log-count on log-rank over
    # the top-100 vocab; one map-side-combined token groupBy, heap
    # top-k, then a 100-row moment aggregate
    return textstats.zipf_fit(_docs(spark, sf_dir), k=100)


def q_survival_km(spark, sf_dir):
    # Kaplan-Meier user-lifetime curve, right-censored at the corpus
    # edge: one user-keyed map-side groupBy, broadcast cutoff, then
    # all windows run on the <= |ages| relation
    return journeys.survival_km(_events_raw(spark, sf_dir))


def q_apdex_1h(spark, sf_dir):
    # Apdex SLA-attainment per (type, hour): one map-side-combined
    # groupBy, conditional sums fold in the combiner
    return tsanalytics.apdex(_events_raw(spark, sf_dir), t_sat=50.0)


def q_embed_quant_error(spark, sf_dir):
    # int8 scalar-quantization QC: per-dim scales via one map-side
    # (dim) groupBy broadcast back; quantize/mse/cosine are pure
    # zip_with map work -- the corpus never shuffles
    return similarity.quantization_error(_embs(spark, sf_dir), qmax=127)


def q_bitmap_actives_1d(spark, sf_dir):
    # EXACT distinct users per (type, day) via packed-bitmap partial
    # aggregation (the groupBitmap idiom): 32 ids fold into one long
    # chunk that merges by bit_or, so the exchange carries <=
    # |ids|/32 chunk rows per group -- and the chunk relation is a
    # mergeable tier (week = bit_or of dailies, still exact)
    return sketches.bitmap_actives(_events_raw(spark, sf_dir))


def q_capacity_forecast(spark, sf_dir):
    # days-until-threshold ETA from the fitted daily trend; corpus
    # -> daily tier once, one moment aggregate per series
    return tsanalytics.capacity_forecast(_events_raw(spark, sf_dir))


def q_anomalous_days(spark, sf_dir):
    # day-LEVEL anomaly: RMSD of each day's 24h profile vs the
    # series' weekday template, robust-flagged; corpus -> hourly
    # tier once, everything after is tier-sized
    return tsanalytics.anomalous_days(_events_raw(spark, sf_dir))


def q_join_size_est(spark, sf_dir):
    # optimizer statistic: lineitem x orders join cardinality from
    # CMS inner products (d*w counters per side, never the join);
    # exact branch = per-key count join, the audit path
    return sketches.join_size_est(
        ingest.load_table(spark, sf_dir, "lineitem"),
        ingest.load_table(spark, sf_dir, "orders"),
        "l_orderkey", "o_orderkey")


def q_touch_attribution(spark, sf_dir):
    # linear vs last-touch conversion credit per touch type before
    # each user's FIRST purchase; conditional-min window + user-sized
    # rollups on ONE user-key exchange
    return sessions.touch_attribution(_events_raw(spark, sf_dir))


def q_time_folds(spark, sf_dir):
    # walk-forward CV folds: ntile over the DISTINCT-day relation
    # (metadata-sized global sort), broadcast join back, one rollup
    return curation.time_folds(_events_raw(spark, sf_dir))


def q_session_lift(spark, sf_dir):
    # market-basket lift with sessions as baskets: distinct
    # (user, session, type) relation rides the sessionize exchange;
    # pair self-join fan-out bounded by |types|^2 per session
    return sessions.session_lift(_events_raw(spark, sf_dir))


def q_lateness_audit(spark, sf_dir):
    # watermark sizing from data: p99 positive lateness vs the
    # arrival-order running max; two-phase (key, id-bucket) prefix
    # max + broadcast carry-in -- no per-key single-task funnel
    return tsanalytics.lateness_audit(_events_raw(spark, sf_dir))


def q_backfill_plan(spark, sf_dir):
    # gaps-and-islands work-list of missing HOURS per series: tier
    # -> spine anti-join -> run grouping, all tier-sized
    return gapfill.backfill_plan(_events_raw(spark, sf_dir),
                                 granularity="hour")


def q_quota_violations(spark, sf_dir):
    # sliding-60s rate-limit audit per user: trailing RANGE count +
    # per-user rollup on ONE user-key exchange
    return sessions.quota_violations(_events_raw(spark, sf_dir),
                                     quota=1)


def q_bitmap_rolling_7d(spark, sf_dir):
    # EXACT trailing-7d distinct from the mergeable bitmap tier:
    # chunk windows partitioned by (type, chunk), calendar RANGE
    # frame, tier-sized work after one combined groupBy
    return sketches.bitmap_rolling(_events_raw(spark, sf_dir))


def q_normality_check(spark, sf_dir):
    # Jarque-Bera detector-assumption QC from explicit raw moments
    # (built-in skewness/kurtosis differ sample-vs-population across
    # engines); ONE map-side-combined aggregate
    return tsanalytics.normality_check(_events_raw(spark, sf_dir))


def q_fleet_beta(spark, sf_dir):
    # per-series "market model" vs the fleet hourly mean: corpus ->
    # hourly tier once, tier-sized factor join, ONE moment aggregate
    return tsanalytics.fleet_beta(_events_raw(spark, sf_dir))


def q_ri_audit(spark, sf_dir):
    # referential-integrity expectation suite over the star schema's
    # five FK edges: per edge ONE combined child aggregate + a
    # broadcast left_anti orphan count; edges union JVM-side
    load = lambda t: ingest.load_table(spark, sf_dir, t)  # noqa: E731
    return enrich.ri_audit([
        ("orders->customer", load("orders"), "o_custkey",
         load("customer"), "c_custkey"),
        ("lineitem->orders", load("lineitem"), "l_orderkey",
         load("orders"), "o_orderkey"),
        ("customer->nation", load("customer"), "c_nationkey",
         load("nation"), "n_nationkey"),
        ("supplier->nation", load("supplier"), "s_nationkey",
         load("nation"), "n_nationkey"),
        ("nation->region", load("nation"), "n_regionkey",
         load("region"), "r_regionkey"),
    ])


def q_pii_scan(spark, sf_dir):
    # data-governance audit: per-source PII pattern doc/hit counts;
    # pure map-side regex scan + ONE combined groupBy, no Python
    return curation.pii_scan(_docs(spark, sf_dir))


def q_funnel_latency(spark, sf_dir):
    # time-to-convert view->purchase per conversion day: per-user
    # anchor + conversion on ONE user-key exchange (sessionize
    # idiom), day rollup over <=1 row/converting user
    return sessions.funnel_latency(_events_raw(spark, sf_dir))


def q_change_attribution(spark, sf_dir):
    # Adtributor root-cause decomposition at the corpus midpoint:
    # per-segment explanatory power + JS surprise; same two-scan
    # shape as did_impact (bounds broadcast + ONE conditional agg)
    return tsanalytics.change_attribution(_events_raw(spark, sf_dir))


def q_fuzzy_token_pairs(spark, sf_dir):
    # exact edit-distance-1 vocab pairs via FastSS deletion-
    # neighborhood blocking + levenshtein verify on candidates only
    # -- vocab-sized hash equi-join, never all-pairs
    return textstats.fuzzy_token_pairs(_docs(spark, sf_dir))


def q_props_profile(spark, sf_dir):
    # schema-on-read JSON payload profiling: ONE vectorized
    # from_json parse per row (never per-field get_json_object),
    # one map-side-combined aggregate
    return enrich.props_profile(_events_raw(spark, sf_dir))


def q_fleet_incidents(spark, sf_dir):
    # cross-series alert correlation: breach runs -> bucketed
    # overlap-edge join (never all-pairs) -> reused CC min-label
    # loop -> one row per fleet incident; iv_id is derived from
    # natural keys so both engines agree on incident identity
    flagged = _t1m_mean(spark, sf_dir).withColumn(
        "breach", (F.col("mean_v") > 100.0).cast("int"))
    iv = alerting.flag_intervals(flagged, "breach", sample_seconds=60)
    iv = iv.withColumn(
        "iv_id",
        F.unix_seconds(F.col("interval_start").cast("timestamp"))
        * F.lit(1_000_000) + F.col("conv_id").cast("long"))
    return alerting.fleet_incidents(iv)


def q_weekend_effect(spark, sf_dir):
    # Welch two-sample t per series (weekend vs weekday): six
    # conditional moments fold in ONE map-side combiner
    return tsanalytics.weekend_effect(_events_raw(spark, sf_dir))


def q_label_centroid_qc(spark, sf_dir):
    # embedding cluster-quality audit: broadcast centroids, map-side
    # cross-score collapsing to one row/vector in the combiner,
    # |labels| output rows -- raw vectors never shuffle
    return similarity.label_centroid_qc(_embs(spark, sf_dir))


def q_did_impact(spark, sf_dir):
    # difference-in-differences per series at the corpus midpoint:
    # broadcast bounds + ONE conditional groupBy; control sums via
    # empty-partition window over the |series| relation (global -
    # treated), never a per-series corpus pass
    return tsanalytics.did_impact(_events_raw(spark, sf_dir))


def q_dominant_period(spark, sf_dir):
    # AUTOPERIOD ACF-argmax: corpus -> hourly tier first, lag grid
    # joins tier-vs-tier (bounded by tier size), per-(key, lag) corr
    # map-side-combined, argmax over <=24 rows/key
    return tsanalytics.dominant_period(_events_raw(spark, sf_dir))


def q_compaction_plan(spark, sf_dir):
    # Iceberg-style bin-pack compaction planner on the (type, day)
    # file manifest: metadata-sized window cumsum, raw rows
    # contribute one map-side-combined groupBy only
    return layout.compaction_plan(_events_raw(spark, sf_dir),
                                  target_rows=2_000)


def q_shesd_flags(spark, sf_dir):
    # seasonal-hybrid ESD (Twitter recipe over S5-style series):
    # hour-of-day seasonal-median broadcast back, then 2 masking
    # median/MAD rounds = 4 window phases on ONE (series, day)
    # exchange
    return tsanalytics.shesd_flags(_events_raw(spark, sf_dir))


def q_journey_surprise(spark, sf_dir):
    # per-user mean surprisal (bits/step) under the corpus Markov
    # model -- anomalous TRAJECTORIES, not values; pair subtree
    # serves counts + scoring via ReusedExchange, probs broadcast
    return journeys.journey_surprise(_events_raw(spark, sf_dir))


def q_kmv_overlap(spark, sf_dir):
    # audience-overlap (union/intersection/Jaccard) between event
    # types from bottom-k (KMV/theta) sketches -- the set-algebra
    # sketch HLL can't do; bounded per-partition k-min then a
    # k*P-survivor re-rank, pair math on sketch-sized relations
    return sketches.kmv_overlap(_events_raw(spark, sf_dir), k=64)


def q_grouping_cube_1d(spark, sf_dir):
    # one-pass multi-granularity rollup: cube(type, day) plans as a
    # single Expand (x4 map-side) into ONE map-side-combined hash
    # aggregate -- one shuffle of partials, never four raw scans
    return rollup.grouped_rollup(_events_raw(spark, sf_dir))


def q_pot_tail(spark, sf_dir):
    # EVT peaks-over-threshold tail model per series (SPOT-style):
    # MoM GPD fit on exceedances over the per-series p95, extreme
    # quantile at q=1e-3, breach count; the one-row-per-key model
    # relation broadcasts back -- the raw relation never shuffles
    return tsanalytics.pot_tail(_events_raw(spark, sf_dir))


def q_mann_kendall(spark, sf_dir):
    # nonparametric trend test: corpus -> daily tier once; the pair
    # join is a tier self-join bounded by span-days^2 per series
    return statstests.mann_kendall(_events_raw(spark, sf_dir))


def q_spearman_corr(spark, sf_dir):
    # rank correlation between series pairs: tier rank window +
    # day-keyed tier self-join; one corpus scan
    return statstests.spearman_corr(_events_raw(spark, sf_dir))


def q_bh_fdr(spark, sf_dir):
    # fleet-wide FDR control: tier z-scores -> A&S erf p-values ->
    # BH step-up on a tier-sized (never corpus) global sort
    return statstests.bh_fdr(_events_raw(spark, sf_dir))


def q_wasserstein_drift(spark, sf_dir):
    # binned W1 earth-mover day-over-day drift: one corpus scan to
    # (series, day, bin) counts, everything after is tier-sized
    return statstests.wasserstein_drift(_events_raw(spark, sf_dir))


def q_ou_halflife(spark, sf_dir):
    # AR(1)/OU mean-reversion half-life: hourly tier lag pairs +
    # one moment aggregate per series
    return statstests.ou_halflife(_events_raw(spark, sf_dir))


def q_hurst_exponent(spark, sf_dir):
    # aggregated-variance Hurst: tier x |scales| literal explode,
    # block-mean + variance aggregates, per-series log-log fit
    return statstests.hurst_exponent(_events_raw(spark, sf_dir))


def q_perm_entropy(spark, sf_dir):
    # Bandt-Pompe order-3 permutation entropy, branch-free 3-bit
    # ordinal coding; exchange after the tier carries 6 rows/series
    return statstests.perm_entropy(_events_raw(spark, sf_dir))


def q_max_drawdown(spark, sf_dir):
    # running-peak drawdown profile per series; argmax on ROUNDED
    # drawdown so cross-engine float noise can't flip the trough day
    return statstests.max_drawdown(_events_raw(spark, sf_dir))


def q_winsor_rollup(spark, sf_dir):
    # winsorized + trimmed hourly means; quantile window and final
    # aggregate share one (series, bucket) exchange
    return statstests.winsor_rollup(_events_raw(spark, sf_dir))


def q_gini_concentration(spark, sf_dir):
    # daily load-concentration Gini over per-user counts: corpus ->
    # (day, user) tier once, day-partitioned rank, exact int sums
    return statstests.gini_concentration(_events_raw(spark, sf_dir))


def q_ljung_box(spark, sf_dir):
    # portmanteau whiteness test: one tier sort serves all 5 lag
    # windows; Q fold is one aggregate per series
    return statstests.ljung_box(_events_raw(spark, sf_dir))


def q_croston(spark, sf_dir):
    # intermittent-demand forecast via closed-form SES (no UDF, no
    # recursion): one tier window + two weighted folds per series
    return statstests.croston(_events_raw(spark, sf_dir))


def q_corr_clusters(spark, sf_dir):
    # metric-family grouping: |Spearman| >= 0.6 edges + the dedup
    # layer's min-label CC on the |series|-node graph
    return statstests.corr_clusters(_events_raw(spark, sf_dir))


def q_bloom_join(spark, sf_dir):
    # explicit Bloom runtime filter: filtered orders' key BITS
    # broadcast to prune lineitem map-side before the join exchange;
    # oracle is the plain join (bloom is invisible in the result)
    return enrich.urgent_order_items(
        ingest.load_table(spark, sf_dir, "lineitem"),
        ingest.load_table(spark, sf_dir, "orders"))


def q_series_profile(spark, sf_dir):
    # capstone: one health row per series composing seven
    # individually-oracled diagnostics; final join is |series|
    # single-row relations on the key
    return statstests.series_profile(_events_raw(spark, sf_dir))


def q_variance_decomp(spark, sf_dir):
    # calendar eta^2 attribution (hour-of-day / day-of-week): three
    # map-side tier aggregates, 24- and 7-row relations broadcast
    return statstests.variance_decomp(_events_raw(spark, sf_dir))


def q_matrix_profile(spark, sf_dir):
    # exact z-normalized matrix profile (motif pair + top discord
    # per series): hourly-tier self-join bounded by span-hours^2,
    # deterministic integer-encoded argmin/argmax; SAX candidates
    # are the documented scale path this exact op verifies
    return statstests.matrix_profile(_events_raw(spark, sf_dir))


def q_matrix_profile_banded(spark, sf_dir):
    # the banded scale path: neighbor search restricted to
    # m <= delta <= 48 h via the (series, span-block) EQUI-join —
    # cost ∝ windows·S, never span²; oracle applies the same band
    # as a plain predicate
    return statstests.matrix_profile(
        _events_raw(spark, sf_dir), max_span_hours=48)


def q_coreset_kcenter(spark, sf_dir):
    # greedy k-center diversity coreset over embeddings: one corpus
    # materialization, one map-side aggregate per round, argmax via
    # a single BIGINT encoding mirrored as k chained oracle CTEs
    return similarity.coreset_kcenter(_embs(spark, sf_dir))


def q_mmr_rerank(spark, sf_dir):
    # maximal-marginal-relevance reranking: relevance-vs-redundancy
    # greedy with the same unrolled-argmax determinism as coreset
    return similarity.mmr_rerank(_embs(spark, sf_dir))


def q_granger_1d(spark, sf_dir):
    # directional lagged-predictor F-test per ordered pair: does
    # x's yesterday improve y's AR(1) forecast; one moment agg/pair
    return statstests.granger_1d(_events_raw(spark, sf_dir))


def q_seasonal_mk(spark, sf_dir):
    # Hirsch-Slack seasonal Mann-Kendall (weekday seasons): trend
    # test a weekly cycle can't fool; same-weekday pair join
    return statstests.seasonal_mk(_events_raw(spark, sf_dir))


def q_coflag_lift(spark, sf_dir):
    # empirical alert grouping: co-firing lift of robust day flags
    # per pair — anomalies co-occurring, not values co-moving
    return statstests.coflag_lift(_events_raw(spark, sf_dir))


def q_corr_break(spark, sf_dir):
    # decoupling alarm: Fisher-z test on before/after-midpoint
    # Pearson r per pair; one conditional moment agg over the
    # day-keyed tier self-join
    return statstests.corr_break(_events_raw(spark, sf_dir))


def q_spread_monitor(spark, sf_dir):
    # Engle-Granger-style pair spread: OLS hedge per pair + AR(1)
    # half-life of the residual spread; tier-sized pair relation
    return statstests.spread_monitor(_events_raw(spark, sf_dir))


def q_markov_entropy(spark, sf_dir):
    # journey-predictability profile: conditional next-state entropy
    # per from-state + its pi-weighted share of the chain entropy
    # rate; one user-key exchange, then everything runs on the
    # <=|types|^2 count relation
    return journeys.markov_entropy(_events_raw(spark, sf_dir))


def q_sax_discords(spark, sf_dir):
    # per-series rarest complete hour-shape (HOT-SAX-style discord):
    # rides the sax word exchanges; word counts join back
    # vocab-sized, top-1 window partitions by series. 2 half-hour
    # frames like sax_motifs (sparse fixture)
    return tsanalytics.sax_discords(
        _series_with_id(spark, sf_dir), n_frames=2, alphabet=4)


def q_key_skew(spark, sf_dir):
    # exact hot-key profile via count-of-counts: one corpus exchange,
    # exact Gini + count percentiles computed on the tiny
    # frequency-of-frequencies relation (no corpus/key-relation sort)
    return sessions.key_skew(_events_raw(spark, sf_dir), key="user_id")


def q_bigram_logppl(spark, sf_dir):
    # word-order-sensitive perplexity: mean Laplace-smoothed bigram
    # surprisal under the corpus's own bigram LM; transition relation
    # collapses map-side per doc, LM is a rollup of it, V rides a
    # 1-row broadcast cross join
    return curation.bigram_logppl(_docs(spark, sf_dir), smoothing=0.5)


def q_rate_5m(spark, sf_dir):
    # per-sample trailing 5m reset-corrected counter rate (PromQL
    # rate(m[5m]) at every sample): lag window + half-open RANGE-sum
    # window both ride ONE series-key exchange
    return tsanalytics.rate_range(
        _series_with_id(spark, sf_dir), window_seconds=300,
        order_cols=("event_id",))


def q_char_entropy(spark, sf_dir):
    # order-0 bits/char quality signal: decomposable
    # H = log2(n) - sum(k*log2 k)/n over per-(doc, char) counts —
    # two map-side-combined aggregates, no window/sort/Python
    return textstats.char_entropy(_docs(spark, sf_dir))


def q_ks_drift_1d(spark, sf_dir):
    # exact two-sample KS per (event_type, day) vs previous observed
    # day — binless sibling of psi_drift_1d; pair relation broadcasts,
    # fanned samples cross ONE (key, pair-day) exchange serving both
    # ECDF windows and the max rollup
    return tsanalytics.ks_drift(_events_raw(spark, sf_dir))


def q_season_strength(spark, sf_dir):
    # forecastability triage: trend/seasonal strength (FPP 13.2) from
    # the stl_lite components; the strength rollup groups by the same
    # series key the decomposition windows partition by (no second
    # corpus exchange)
    return tsanalytics.season_strength(
        _t1m_mean(spark, sf_dir), "mean_v",
        trend_halfwidth=5, phase="minute_of_hour")


def q_mixture_sample(spark, sf_dir):
    # token-budget data mixing: per-source sampling fraction
    # min(1, budget*w/T_s) from ONE source-cardinality groupBy,
    # broadcast back, salted-md5 Bernoulli map-side; src0 is
    # deliberately over-asked (caps at frac=1.0)
    return curation.mixture_sample(
        _docs(spark, sf_dir), curation.MIXTURE_WEIGHTS,
        curation.MIXTURE_BUDGET, salt="mx0")


def q_cluster_split(spark, sf_dir):
    # leakage-safe train/val/test split at near-dup-cluster
    # granularity: split key = CC cluster id (own doc_id when
    # unclustered), salted-md5 uniform -> 80/10/10; cluster relation
    # joins back small, split math pure map-side
    return dedup.cluster_split(_docs(spark, sf_dir), ratios=(0.8, 0.1),
                               salt="cs0", n=3, threshold=0.5)


def q_simhash(spark, sf_dir):
    return dedup.simhash32(_docs(spark, sf_dir))


def q_simhash_dups(spark, sf_dir):
    return dedup.simhash_dup_pairs(_docs(spark, sf_dir))


def q_simhash_hamming(spark, sf_dir):
    # 64-bit signatures (the scale default), planted 1-bit twins ON so
    # the oracle can assert every distance-1 pair is found
    return dedup.simhash_hamming_pairs(
        _docs(spark, sf_dir), k=2, bits=64, plant_twins=True
    )


def q_simhash64(spark, sf_dir):
    return dedup.simhash_sig(_docs(spark, sf_dir), bits=64)


def q_ann_lsh_multiprobe(spark, sf_dir):
    return similarity.lsh_multiprobe_topk(
        _embs(spark, sf_dir), n_planes=8, query_mod=50, k=5
    )


def q_embedding_near_dups(spark, sf_dir):
    # plant_twins ON: the oracle asserts perturbed (non-identical)
    # twins are found; production callers leave it off
    return similarity.embedding_near_dups(
        _embs(spark, sf_dir), n_planes=8, threshold=0.9, plant_twins=True
    )


def q_embedding_topk(spark, sf_dir):
    return similarity.brute_force_topk(
        _embs(spark, sf_dir), query_mod=50, k=5
    )


def q_ann_lsh_buckets(spark, sf_dir):
    return similarity.lsh_bucket_assignments(_embs(spark, sf_dir), n_planes=8)


def q_ann_lsh_topk(spark, sf_dir):
    return similarity.lsh_bucketed_topk(
        _embs(spark, sf_dir), n_planes=8, query_mod=50, k=5
    )


def q_ann_recall_lsh(spark, sf_dir):
    # recall@5 of single-bucket LSH against the exact cosine ranking,
    # per query — the evaluation loop that tunes n_planes/nprobe;
    # zero-hit queries appear with recall 0 (left join, not semi)
    embs = _embs(spark, sf_dir)
    return similarity.ann_recall(
        similarity.lsh_bucketed_topk(embs, n_planes=8, query_mod=50, k=5),
        similarity.brute_force_topk(embs, query_mod=50, k=5),
        k=5,
    )


def q_ivf_cells(spark, sf_dir):
    # IVF coarse quantization: nearest-centroid cell per vector —
    # broadcast centroid array, map-side argmax fold, zero shuffle
    return similarity.ivf_assign(_embs(spark, sf_dir), centroid_mod=100)


def q_ivf_topk(spark, sf_dir):
    # IVF ANN: nprobe highest-cosine cells per query, cell-equality
    # join + exact rerank (nprobe = all cells ≡ brute force, tested)
    return similarity.ivf_topk(
        _embs(spark, sf_dir), centroid_mod=100, nprobe=2, query_mod=50, k=5
    )


def q_vocab_topk(spark, sf_dir):
    # corpus vocab build: map-side-combined token counts + distributed
    # top-k (TakeOrderedAndProject, never a global sort)
    return textstats.vocab_topk(_docs(spark, sf_dir), k=100)


def q_quality_filter(spark, sf_dir):
    # end-to-end corpus filter over quality + stopword + language
    return textstats.quality_filter(
        _docs(spark, sf_dir), min_quality=0.4, min_stop_ratio=0.01,
        langs=("en",),
    )


def q_stratified_sample(spark, sf_dir):
    # deterministic salted-hash mixture sampling by length band —
    # pure map-side filter, zero shuffle
    return textstats.stratified_sample(
        _docs(spark, sf_dir), rates=(0.25, 0.5, 1.0), salt="s0"
    )


def q_topk_per_band(spark, sf_dir):
    # best-per-stratum selection: top-20 docs per length band by
    # composite quality — bounded formulation (per-partition
    # mapInPandas heaps; only k·#bands·P survivors ever shuffle)
    return textstats.topk_per_band(_docs(spark, sf_dir), k=20)


def q_curated_corpus(spark, sf_dir):
    # capstone composition — the full curation DAG as one query:
    # quality gate ∩ canonical-dedup survivors ∩ stratified sample.
    # Each stage is an independently-oracled operator; the
    # composition is two left_semi joins on doc_id (the loser/sample
    # sets are small → broadcast-able at scale)
    docs = _docs(spark, sf_dir)
    quality_ids = textstats.quality_filter(
        docs, min_quality=0.4, min_stop_ratio=0.01, langs=("en",)
    ).select("doc_id")
    canon_ids = dedup.canonical_corpus(docs, n=3, threshold=0.5)
    sample_ids = textstats.stratified_sample(
        docs, rates=(0.25, 0.5, 1.0), salt="s0"
    ).select("doc_id")
    return (
        quality_ids.join(canon_ids, "doc_id", "left_semi")
        .join(sample_ids, "doc_id", "left_semi")
    )


def q_lang_id(spark, sf_dir):
    return textstats.lang_id(_docs(spark, sf_dir))


def q_quality_score(spark, sf_dir):
    return textstats.quality_score(_docs(spark, sf_dir))


def q_token_count(spark, sf_dir):
    return textstats.token_count(_docs(spark, sf_dir))


def q_doc_fingerprint(spark, sf_dir):
    return textstats.doc_fingerprint(_docs(spark, sf_dir))


def q_multimodal_meta(spark, sf_dir):
    return multimodal.attach_payload_meta(_docs(spark, sf_dir))


def q_multimodal_features(spark, sf_dir):
    return multimodal.extract_features(
        multimodal.attach_payload(_docs(spark, sf_dir))
    )


def q_multimodal_resize(spark, sf_dir):
    # 2x2 average-pool resize plumbing (real resize slots into the
    # same mapInPandas body)
    return multimodal.resize_pool2x2(
        multimodal.attach_payload(_docs(spark, sf_dir))
    )


def q_multimodal_frames(spark, sf_dir):
    # strided frame sampling: 1-row -> k-row Arrow batch explosion
    return multimodal.frame_sample(
        multimodal.attach_payload(_docs(spark, sf_dir)), stride=2
    )


# ---------------------------------------------------------------- contract
def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full tier cascade on sf0.001 events, return 1m tier."""
    return q_rollup_1m(spark, "/root/testdata/sf0.001")


# Ordering is load-bearing: the driver's correctness gate checks
# exactly the FIRST 50 queries() entries. The round-5 window rotates
# onto the queries that have NEVER received a driver CORRECTNESS row
# (SURVEY §7.5's rotation batches (a) statstests/enrich/similarity,
# (b) sketches/journeys/layout, (c) curation/text — all green on the
# local gate replica at sf0.001 + sf0.01) plus the two correlation
# queries whose centered-sum refactor this round changed their
# operator shape: xcorr_1d (round 4's one red row — the fix must be
# re-gated) and leadlag_1h (same idiom, also never checked). Every
# entry displaced from the round-4 window is driver-green in
# CORRECTNESS_r04 and byte-unchanged since, except coreset_kcenter /
# mmr_rerank / spread_monitor / granger_1d / corr_break /
# ou_halflife / bloom_join which are IN-window precisely because
# round 5 touched them.
_R5_WINDOW = [
    # batch (a): round-4 statstests / enrich / similarity layer
    "mann_kendall", "spearman_corr", "bh_fdr", "wasserstein_drift",
    "ou_halflife", "hurst_exponent", "perm_entropy", "max_drawdown",
    "winsor_rollup", "gini_concentration", "ljung_box", "croston",
    "corr_clusters", "bloom_join", "series_profile",
    "variance_decomp", "matrix_profile", "spread_monitor",
    "coreset_kcenter", "mmr_rerank", "granger_1d", "seasonal_mk",
    "corr_break", "coflag_lift",
    # round-5 refactor re-gates
    "xcorr_1d", "leadlag_1h",
    # batch (b): sketches / journeys / layout
    "hll_actives_1d", "hll_cascade_7d", "cms_heavy_hitters",
    "kmv_overlap", "bitmap_actives_1d", "bitmap_rolling_7d",
    "ddsketch_1d", "pagerank_types", "journey_surprise",
    "markov_entropy", "compaction_plan", "grouping_cube_1d",
    "key_skew",
    # batch (c): curation / text
    "doc_repetition", "decontaminate", "pmi_bigrams",
    "unigram_logppl", "seq_pack", "heavy_hitters", "bpe_pairs",
    "char_entropy", "tfidf_top3", "weighted_sample",
    "fuzzy_token_pairs",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    reg = _registry()
    out = {n: reg[n] for n in _R5_WINDOW}
    out.update((n, f) for n, f in reg.items() if n not in out)
    return out


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # (round-4 window comments below are historical — the gate order
    # is now _R5_WINDOW above; this dict carries the full registry)
    return {
        # -- never driver-checked before round 4
        "stratified_sample": q_stratified_sample,
        "curated_corpus": q_curated_corpus,
        "topk_per_band": q_topk_per_band,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        # -- driver-green only in round 2
        "quality_score": q_quality_score,
        "token_count": q_token_count,
        "doc_fingerprint": q_doc_fingerprint,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_features": q_multimodal_features,
        # -- new in round 4: incremental-refresh merge math
        "tier_merge_refresh": q_tier_merge_refresh,
        # -- new in round 4 (late): timeseries analytics layer
        "mad_flags": q_mad_flags,
        "counter_rate_1m": q_counter_rate_1m,
        "turn_taking": q_turn_taking,
        "time_weighted_1h": q_time_weighted_1h,
        "holt_1m": q_holt_1m,
        "ar2_flags": q_ar2_flags,
        "candles_1h": q_candles_1h,
        "seasonal_zscore": q_seasonal_zscore,
        "stl_lite_1m": q_stl_lite_1m,
        "lttb_check": q_lttb_check,
        "cusum_flags": q_cusum_flags,
        "hist_quantile_1d": q_hist_quantile_1d,
        "alert_states": q_alert_states,
        "xcorr_1d": q_xcorr_1d,
        # -- new in round 4 (late): alerting & incident analytics
        "breach_intervals": q_breach_intervals,
        "slo_burn": q_slo_burn,
        "merged_intervals": q_merged_intervals,
        "incident_overlap": q_incident_overlap,
        "incident_overlap_bucketed": q_incident_overlap_bucketed,
        # -- new in round 4 (final): M4 downsample, changepoints,
        #    alert-cooldown suppression
        "m4_1h": q_m4_1h,
        "changepoint_flags": q_changepoint_flags,
        "alert_cooldown": q_alert_cooldown,
        "active_users_1d": q_active_users_1d,
        "snaive_eval": q_snaive_eval,
        "psi_drift_1d": q_psi_drift_1d,
        "funnel_steps": q_funnel_steps,
        "retention_cohorts": q_retention_cohorts,
        "holt_winters_1m": q_holt_winters_1m,
        # -- new in round 4 (post-verdict): user-journey flow layer
        "event_transitions": q_event_transitions,
        "type_streaks": q_type_streaks,
        "depth_hist": q_depth_hist,
        "next_gap_1d": q_next_gap_1d,
        # -- round-3-green core set: only the entries whose round-4
        #    change altered the OPERATOR SHAPE keep a window slot
        #    (dedup_canonical's CC convergence fold, the two-phase
        #    events_vs_trailing_p95, value_percentiles' sketch param).
        #    rollup_1m / gapfill_1m / ewma_1m / codec_roundtrip cede
        #    their slots to never-driver-checked round-4 entries:
        #    their round-4 deltas are perf-internal (salted_agg
        #    combiner, eager materialize, shared segmented-scan
        #    scaffold; codec.py byte-unchanged), each is green on the
        #    local sf0.001+sf0.01 gate replica and carries dedicated
        #    pytest batteries, and their semantics stay driver-covered
        #    in-window (tier_merge_refresh re-runs the rollup merge
        #    math, holt_1m/holt_winters_1m exercise the same
        #    recursive-scan scaffold as ewma, entry() smoke-runs the
        #    rollup cascade every round). In their place: the three
        #    never-checked operator FAMILIES with no other in-window
        #    representative — realtime_rollup_1h (watermark splice of
        #    sealed tier + live tail), asof_snapshot (instant as-of
        #    state query), segment_rollup_1d (broadcast snowflake
        #    dimension enrichment).
        "trend_1d": q_trend_1d,
        "realtime_rollup_1h": q_realtime_rollup_1h,
        "asof_snapshot": q_asof_snapshot,
        "segment_rollup_1d": q_segment_rollup_1d,
        "value_percentiles": q_value_percentiles,
        "events_vs_trailing_p95": q_events_vs_trailing_p95,
        "dedup_canonical": q_dedup_canonical,
        # ---- past the driver's 50-query window from here down:
        # every entry below was driver-green in round 3 (those
        # displaced by the late-round-4 tsanalytics and alerting
        # blocks included), is UNCHANGED since that green run, and is
        # redundant with or verified alongside an in-window operator
        # (rollup_1d ≡ rollup_1m/1h at day grain and its merge math
        # is tier_merge_refresh's; threshold_sweep_raw_lt is the <
        # variant of threshold_sweep, whose full grid best_threshold
        # re-runs in-window; dup_clusters is composed inside
        # dedup_canonical; doc_sha's digest grouping is dedup_exact's
        # core; split_counts is a trivial union count;
        # topk_buckets is plain TakeOrderedAndProject; zscore_flags /
        # best_threshold / confusion_metrics are round-1-green and
        # unchanged since — rolling_stats computes zscore_flags'
        # window stats in-window, best_threshold is the argmax of the
        # threshold_sweep grid, confusion_metrics' tp/fp counts
        # feed best_threshold's F1, and roc_auc's distributed
        # tie-aware ranks build on the same preds⋈truth relation
        # confusion_metrics checks; latency_1m's lead-lag derivation
        # is re-exercised in-window by tier_merge_refresh's
        # conv-tails math, rolling_stats' window stats feed the
        # in-window residual_cascade and ewma paths, and sessionize
        # is the first phase session_stats runs in-window)
        # rollup_1h's hour-tier semantics are triple-covered in-window
        # (tier_parity_1h verifies the 1h tier against raw points,
        # tier_merge_refresh re-runs the hour merge math, rollup_1m
        # the same bucketing at minute grain)
        # -- newest post-verdict additions: the 50-window is full of
        #    round-4 firsts, so this block rides the local gate
        #    replica (scripts/check_oracle.py — all green at sf0.001
        #    and sf0.01) this round and is first in line to rotate
        #    into the round-5 window. The five left out here all have
        #    independent correctness anchors: absent_1m and
        #    incident_coverage_1d are property-tested against python
        #    reference walks (tests/test_round4_ops.py),
        #    ensemble_flags is a majority vote over three in-window
        #    flag queries' logic, dq_checks_1d / burstiness_1d are
        #    single-pass aggregate profiles with dq_profile pytest
        #    coverage.
        "rollup_1m": q_rollup_1m,
        "gapfill_1m": q_gapfill_1m,
        "ewma_1m": q_ewma_1m,
        "codec_roundtrip": q_codec_roundtrip,
        "ensemble_flags": q_ensemble_flags,
        "absent_1m": q_absent_1m,
        "incident_coverage_1d": q_incident_coverage_1d,
        "dq_checks_1d": q_dq_checks_1d,
        "burstiness_1d": q_burstiness_1d,
        "rollup_1h": q_rollup_1h,
        # displaced by the round-4 journey layer — all four were
        # driver-green in round 3 and are byte-unchanged since:
        # tier_parity_1h (1h tier semantics triple-covered in-window,
        # see rollup_1h note), conv_stats_salted (the salting
        # identity feeds the in-window conv-keyed rollups),
        # detector_lifecycle (composes threshold_sweep/best_epoch
        # pieces verified in-window), session_stats (first phase =
        # sessionize, same _tagged body; its groupBy shape is
        # re-exercised in-window by retention_cohorts/next_gap_1d)
        "tier_parity_1h": q_tier_parity_1h,
        "conv_stats_salted": q_conv_stats_salted,
        "detector_lifecycle": q_detector_lifecycle,
        "session_stats": q_session_stats,
        # residual_cascade's exact recombination math (decomposable
        # count/mean/M2 merge) is what tier_merge_refresh verifies
        # in-window every round
        "residual_cascade": q_residual_cascade,
        "roc_auc": q_roc_auc,
        "zscore_flags": q_zscore_flags,
        "latency_1m": q_latency_1m,
        "rolling_stats": q_rolling_stats,
        "sessionize": q_sessionize,
        "best_threshold": q_best_threshold,
        "confusion_metrics": q_confusion_metrics,
        "threshold_sweep": q_threshold_sweep,
        "split_counts": q_split_counts,
        "doc_sha": q_doc_sha,
        "dedup_exact": q_dedup_exact,
        "topk_buckets": q_topk_buckets,
        "rollup_1d": q_rollup_1d,
        "threshold_sweep_raw_lt": q_threshold_sweep_raw_lt,
        "dup_clusters": q_dup_clusters,
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash64": q_simhash64,
        "simhash_hamming": q_simhash_hamming,
        "embedding_topk": q_embedding_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "ivf_topk": q_ivf_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "lang_id": q_lang_id,
        "vocab_topk": q_vocab_topk,
        "quality_filter": q_quality_filter,
        "pred_value_counts": q_pred_value_counts,
        "bof_eval": q_bof_eval,
        "kl_closed_form": q_kl_closed_form,
        "ocsvm_remap": q_ocsvm_remap,
        "best_epoch": q_best_epoch,
        "minhash_signatures": q_minhash_signatures,
        "simhash": q_simhash,
        "simhash_dups": q_simhash_dups,
        "ann_lsh_buckets": q_ann_lsh_buckets,
        "ivf_cells": q_ivf_cells,
        # round-4 late additions (past the window; local-replica-green
        # at sf0.001 + sf0.01, first in line behind the five leftover
        # firsts for the round-5 rotation)
        "acf_1d": q_acf_1d,
        "theilsen_1d": q_theilsen_1d,
        "spectral_power": q_spectral_power,
        "rolling_actives_7d": q_rolling_actives_7d,
        "weighted_sample": q_weighted_sample,
        "ann_recall_lsh": q_ann_recall_lsh,
        "tfidf_top3": q_tfidf_top3,
        "pacf_1d": q_pacf_1d,
        "kalman_1m": q_kalman_1m,
        "hampel_1m": q_hampel_1m,
        "ewma_chart_1m": q_ewma_chart_1m,
        "embedding_outliers": q_embedding_outliers,
        "doc_repetition": q_doc_repetition,
        "decontaminate": q_decontaminate,
        "pmi_bigrams": q_pmi_bigrams,
        "unigram_logppl": q_unigram_logppl,
        "seq_pack": q_seq_pack,
        # round-4 final wave: substring-span dedup, MG heavy hitters,
        # BPE pair stats, PAA+SAX words (replica-green sf0.001+sf0.01)
        "dup_ngram_spans": q_dup_ngram_spans,
        "heavy_hitters": q_heavy_hitters,
        "bpe_pairs": q_bpe_pairs,
        "sax_1h": q_sax_1h,
        "sax_motifs": q_sax_motifs,
        "sigma_clip_1d": q_sigma_clip_1d,
        "leadlag_1h": q_leadlag_1h,
        "cluster_split": q_cluster_split,
        "mixture_sample": q_mixture_sample,
        "season_strength": q_season_strength,
        "ks_drift_1d": q_ks_drift_1d,
        "char_entropy": q_char_entropy,
        "rate_5m": q_rate_5m,
        "bigram_logppl": q_bigram_logppl,
        "key_skew": q_key_skew,
        "sax_discords": q_sax_discords,
        "anomaly_movers": q_anomaly_movers,
        "ddsketch_1d": q_ddsketch_1d,
        "fleet_outliers": q_fleet_outliers,
        "hll_actives_1d": q_hll_actives_1d,
        "hll_cascade_7d": q_hll_cascade_7d,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "pagerank_types": q_pagerank_types,
        "benford_dq": q_benford_dq,
        "trigram_flows": q_trigram_flows,
        "shingle_novelty": q_shingle_novelty,
        "zipf_fit": q_zipf_fit,
        "survival_km": q_survival_km,
        "apdex_1h": q_apdex_1h,
        "embed_quant_error": q_embed_quant_error,
        "bitmap_actives_1d": q_bitmap_actives_1d,
        "grouping_cube_1d": q_grouping_cube_1d,
        "kmv_overlap": q_kmv_overlap,
        "journey_surprise": q_journey_surprise,
        "shesd_flags": q_shesd_flags,
        "did_impact": q_did_impact,
        "dominant_period": q_dominant_period,
        "compaction_plan": q_compaction_plan,
        "label_centroid_qc": q_label_centroid_qc,
        "weekend_effect": q_weekend_effect,
        "fleet_incidents": q_fleet_incidents,
        "props_profile": q_props_profile,
        "fuzzy_token_pairs": q_fuzzy_token_pairs,
        "change_attribution": q_change_attribution,
        "funnel_latency": q_funnel_latency,
        "pii_scan": q_pii_scan,
        "ri_audit": q_ri_audit,
        "fleet_beta": q_fleet_beta,
        "normality_check": q_normality_check,
        "bitmap_rolling_7d": q_bitmap_rolling_7d,
        "backfill_plan": q_backfill_plan,
        "quota_violations": q_quota_violations,
        "lateness_audit": q_lateness_audit,
        "session_lift": q_session_lift,
        "time_folds": q_time_folds,
        "touch_attribution": q_touch_attribution,
        "join_size_est": q_join_size_est,
        "anomalous_days": q_anomalous_days,
        "capacity_forecast": q_capacity_forecast,
        "pot_tail": q_pot_tail,
        "markov_entropy": q_markov_entropy,
        "mann_kendall": q_mann_kendall,
        "spearman_corr": q_spearman_corr,
        "bh_fdr": q_bh_fdr,
        "wasserstein_drift": q_wasserstein_drift,
        "ou_halflife": q_ou_halflife,
        "hurst_exponent": q_hurst_exponent,
        "perm_entropy": q_perm_entropy,
        "max_drawdown": q_max_drawdown,
        "winsor_rollup": q_winsor_rollup,
        "gini_concentration": q_gini_concentration,
        "ljung_box": q_ljung_box,
        "croston": q_croston,
        "corr_clusters": q_corr_clusters,
        "bloom_join": q_bloom_join,
        "series_profile": q_series_profile,
        "variance_decomp": q_variance_decomp,
        "matrix_profile": q_matrix_profile,
        "matrix_profile_banded": q_matrix_profile_banded,
        "spread_monitor": q_spread_monitor,
        "coreset_kcenter": q_coreset_kcenter,
        "mmr_rerank": q_mmr_rerank,
        "granger_1d": q_granger_1d,
        "seasonal_mk": q_seasonal_mk,
        "corr_break": q_corr_break,
        "coflag_lift": q_coflag_lift,
    }


# --------------------------------------------------------------- oracles
_EV = (
    "SELECT CAST(user_id AS VARCHAR) AS conv_id, ts, value FROM events"
)

_SCORED = (
    "SELECT event_id, CAST(value AS DOUBLE) AS score, "
    "CAST((event_id % 97) < 5 AS INT) AS label FROM events"
)

_TIER_FINISH = """
SELECT conv_id, bucket_start, cnt, vcnt,
       round(sum_v, 4) AS sum_v, round(sum_sq_v, 4) AS sum_sq_v,
       round(min_v, 4) AS min_v, round(max_v, 4) AS max_v,
       round(CASE WHEN vcnt > 0 THEN sum_v / vcnt END, 4) AS mean_v,
       round(CASE WHEN vcnt > 0 THEN
           sqrt(greatest(sum_sq_v / vcnt - (sum_v / vcnt) * (sum_v / vcnt), 0.0))
       END, 4) AS std_v,
       round(cnt / {secs}.0, 4) AS turn_rate
FROM agg
"""


def _tier_sql(trunc: str, secs: int) -> str:
    return f"""
WITH ev AS ({_EV}),
agg AS (
    SELECT conv_id, date_trunc('{trunc}', ts) AS bucket_start,
           count(*) AS cnt, count(value) AS vcnt,
           sum(value) AS sum_v, sum(value * value) AS sum_sq_v,
           min(value) AS min_v, max(value) AS max_v
    FROM ev GROUP BY 1, 2
)
{_TIER_FINISH.format(secs=secs)}
"""


_LATENCY_SQL = f"""
WITH ev AS ({_EV}),
lat AS (
    SELECT conv_id, ts,
           (epoch_us(ts) - lag(epoch_us(ts)) OVER
               (PARTITION BY conv_id ORDER BY ts)) / 1e6 AS value
    FROM ev
),
agg AS (
    SELECT conv_id, date_trunc('minute', ts) AS bucket_start,
           count(*) AS cnt, count(value) AS vcnt,
           sum(value) AS sum_v, sum(value * value) AS sum_sq_v,
           min(value) AS min_v, max(value) AS max_v
    FROM lat GROUP BY 1, 2
)
{_TIER_FINISH.format(secs=60)}
"""

_T1M_MEAN = f"""
t1m AS (
    SELECT conv_id, date_trunc('minute', ts) AS bucket_start,
           sum(value) / count(value) AS mean_v
    FROM ev GROUP BY 1, 2
)
"""

_ROLLING_SQL = f"""
WITH ev AS ({_EV}),
{_T1M_MEAN}
SELECT conv_id, bucket_start, round(mean_v, 4) AS mean_v,
       round(avg(mean_v) OVER w, 4) AS rolling_mean,
       round(stddev_pop(mean_v) OVER w, 4) AS rolling_std,
       round(abs(mean_v - avg(mean_v) OVER w), 4) AS residual
FROM t1m
WINDOW w AS (PARTITION BY conv_id ORDER BY bucket_start
             ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
"""

_ZSCORE_SQL = f"""
WITH sc AS ({_SCORED}),
st AS (SELECT avg(score) AS mu, stddev_pop(score) AS sigma FROM sc)
SELECT event_id, round(score, 4) AS score,
       round(3.0 * mu + sigma, 4) AS threshold,
       CASE WHEN score > 3.0 * mu + sigma THEN 1 ELSE 0 END AS pred
FROM sc, st
"""

_SWEEP_BODY = f"""
WITH sc AS ({_SCORED}),
st AS (SELECT avg(score) AS mu, stddev_pop(score) AS sigma FROM sc),
g AS (SELECT 1.0 + CAST(i AS DOUBLE) AS y
      FROM generate_series(0, 99) AS t(i)),
gt AS (SELECT y, y * mu + sigma AS threshold FROM g, st),
sw AS (
    -- CAST: DuckDB sum() yields HUGEINT; the driver's value-hash
    -- distinguishes it from Spark's int64, so pin BIGINT explicitly
    SELECT y, threshold,
           CAST(sum(CASE WHEN score > threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score > threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score <= threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN score <= threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM sc, gt GROUP BY y, threshold
),
swf AS (
    SELECT *, CASE WHEN 2 * tp + fp + fn > 0
                   THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END AS f1
    FROM sw
)
"""

_SWEEP_SQL = (
    _SWEEP_BODY
    + "SELECT y, round(threshold, 4) AS threshold, tp, fp, fn, tn, "
    "round(f1, 4) AS f1 FROM swf"
)

_BEST_SQL = (
    _SWEEP_BODY
    + "SELECT y, round(threshold, 4) AS threshold, round(f1, 4) AS f1, "
    "tp, fp, fn, tn FROM swf ORDER BY f1 DESC, y ASC LIMIT 1"
)

_CONFUSION_SQL = f"""
WITH sc AS ({_SCORED}),
st AS (SELECT avg(score) AS mu, stddev_pop(score) AS sigma FROM sc),
p AS (SELECT label,
             CASE WHEN score > 3.0 * mu + sigma THEN 1 ELSE 0 END AS pred
      FROM sc, st),
c AS (
    -- CAST AS BIGINT: avoid DuckDB HUGEINT vs Spark int64 hash skew
    SELECT CAST(sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM p
),
m AS (
    SELECT tp, fp, fn, tn,
           CAST(tp AS DOUBLE) AS tpd, CAST(fp AS DOUBLE) AS fpd,
           CAST(fn AS DOUBLE) AS fnd, CAST(tn AS DOUBLE) AS tnd
    FROM c
)
SELECT tp, fp, fn, tn,
       round(CASE WHEN tpd + fpd > 0 THEN tpd / (tpd + fpd) ELSE 0.0 END, 4)
           AS precision,
       round(CASE WHEN tpd + fnd > 0 THEN tpd / (tpd + fnd) ELSE 0.0 END, 4)
           AS recall,
       round(CASE WHEN 2 * tpd + fpd + fnd > 0
                  THEN 2 * tpd / (2 * tpd + fpd + fnd) ELSE 0.0 END, 4) AS f1,
       round((tpd + tnd) / (tpd + fpd + fnd + tnd), 4) AS accuracy,
       round((CASE WHEN tpd + fnd > 0 THEN tpd / (tpd + fnd) ELSE 0.0 END
              + CASE WHEN tnd + fpd > 0 THEN tnd / (tnd + fpd) ELSE 0.0 END)
             / 2, 4) AS auroc_binary,
       round(CASE WHEN tpd + fnd > 0 THEN tpd / (tpd + fnd) ELSE 0.0 END
             * CASE WHEN tpd + fpd > 0 THEN tpd / (tpd + fpd) ELSE 0.0 END
             + (1 - CASE WHEN tpd + fnd > 0 THEN tpd / (tpd + fnd)
                         ELSE 0.0 END)
               * ((tpd + fnd) / (tpd + fpd + fnd + tnd)), 4) AS auprc_binary
FROM m
"""

_VALUE_COUNTS_SQL = f"""
WITH sc AS ({_SCORED}),
st AS (SELECT avg(score) AS mu, stddev_pop(score) AS sigma FROM sc)
SELECT CASE WHEN score > 3.0 * mu + sigma THEN 1 ELSE 0 END AS pred,
       count(*) AS n
FROM sc, st GROUP BY 1 ORDER BY 1
"""

_SEGMENT_ROLLUP_SQL = """
SELECT c.c_mktsegment, n.n_name,
       date_trunc('day', e.ts) AS bucket_start,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(e.value), 4) AS mean_v
FROM events e
JOIN customer c ON e.user_id = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY 1, 2, 3
"""

# absent()-style heartbeat oracle over the same gap-fill day window:
# skeleton via generate_series, gap groups via a cumulative sum of
# the present indicator (each group starts at its present row, so
# row_number − 1 is the consecutive-miss count) — pure integer logic
_ABSENT_SQL = f"""
WITH ev AS (
    SELECT CAST(user_id AS VARCHAR) AS conv_id, ts FROM events
    WHERE ts >= TIMESTAMP '{GAPFILL_DAY[0]}'
      AND ts < TIMESTAMP '{GAPFILL_DAY[1]}'
),
obs AS (
    SELECT DISTINCT conv_id, date_trunc('minute', ts) AS bucket_start
    FROM ev
),
bounds AS (SELECT conv_id, min(bucket_start) AS b0, max(bucket_start) AS b1
           FROM obs GROUP BY 1),
skel AS (SELECT conv_id,
                unnest(generate_series(b0, b1, INTERVAL 1 MINUTE))
                    AS bucket_start
         FROM bounds),
j AS (
    SELECT s.conv_id, s.bucket_start,
           CASE WHEN o.bucket_start IS NOT NULL THEN 1 ELSE 0 END AS present
    FROM skel s LEFT JOIN obs o
    ON s.conv_id = o.conv_id AND s.bucket_start = o.bucket_start
),
g AS (
    SELECT conv_id, bucket_start, present,
           sum(present) OVER (PARTITION BY conv_id ORDER BY bucket_start
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
    FROM j
),
r AS (
    SELECT conv_id, bucket_start, present,
           row_number() OVER (PARTITION BY conv_id, grp
                              ORDER BY bucket_start) - 1 AS miss
    FROM g
)
SELECT conv_id, bucket_start, present,
       CAST(CASE WHEN present = 1 THEN 0 ELSE miss END AS BIGINT)
           AS miss_run,
       CASE WHEN present = 0 AND miss >= 3 THEN 1 ELSE 0 END AS absent
FROM r
"""

_GAPFILL_SQL = f"""
WITH ev AS (
    SELECT CAST(user_id AS VARCHAR) AS conv_id, ts, value FROM events
    WHERE ts >= TIMESTAMP '{GAPFILL_DAY[0]}' AND ts < TIMESTAMP '{GAPFILL_DAY[1]}'
),
{_T1M_MEAN},
bounds AS (SELECT conv_id, min(bucket_start) AS b0, max(bucket_start) AS b1
           FROM t1m GROUP BY 1),
skel AS (SELECT conv_id,
                unnest(generate_series(b0, b1, INTERVAL 1 MINUTE))
                    AS bucket_start
         FROM bounds),
j AS (SELECT s.conv_id, s.bucket_start, t.mean_v AS v
      FROM skel s LEFT JOIN t1m t
      ON s.conv_id = t.conv_id AND s.bucket_start = t.bucket_start),
w AS (
    SELECT conv_id, bucket_start, v,
           CAST(epoch_us(bucket_start) AS DOUBLE) AS t,
           last_value(v IGNORE NULLS) OVER wp AS prev_v,
           last_value(CASE WHEN v IS NOT NULL
                           THEN CAST(epoch_us(bucket_start) AS DOUBLE) END
                      IGNORE NULLS) OVER wp AS prev_t,
           first_value(v IGNORE NULLS) OVER wn AS next_v,
           first_value(CASE WHEN v IS NOT NULL
                            THEN CAST(epoch_us(bucket_start) AS DOUBLE) END
                       IGNORE NULLS) OVER wn AS next_t
    FROM j
    WINDOW wp AS (PARTITION BY conv_id ORDER BY bucket_start
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
           wn AS (PARTITION BY conv_id ORDER BY bucket_start
                  ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT conv_id, bucket_start, round(v, 4) AS mean_v,
       round(CASE WHEN v IS NOT NULL THEN v
                  WHEN prev_v IS NOT NULL AND next_v IS NOT NULL
                  THEN prev_v + (next_v - prev_v) * (t - prev_t)
                       / (next_t - prev_t)
             END, 4) AS mean_v_filled,
       CASE WHEN v IS NULL AND prev_v IS NOT NULL AND next_v IS NOT NULL
            THEN 1 ELSE 0 END AS gap_filled
FROM w
"""

_TOPK_SQL = f"""
WITH ev AS ({_EV}),
t1m AS (
    SELECT conv_id, date_trunc('minute', ts) AS bucket_start,
           count(*) AS cnt
    FROM ev GROUP BY 1, 2
),
rk AS (
    SELECT conv_id, bucket_start, cnt,
           row_number() OVER (PARTITION BY conv_id
                              ORDER BY cnt DESC, bucket_start ASC) AS rk
    FROM t1m
)
SELECT conv_id, bucket_start, cnt, CAST(rk AS INT) AS rk
FROM rk WHERE rk <= 3
"""

_TIER_PARITY_SQL = f"""
WITH ev AS ({_EV})
SELECT count(*) AS n_buckets, CAST(0 AS BIGINT) AS n_mismatch
FROM (SELECT conv_id, date_trunc('hour', ts) FROM ev GROUP BY 1, 2)
"""

_SPLIT_SQL = f"""
WITH ev AS ({_EV})
SELECT 'train' AS split, count(*) AS n, round(sum(value), 4) AS sum_v
FROM ev WHERE ts < TIMESTAMP '{TRAIN_END}'
UNION ALL
SELECT 'val', count(*), round(sum(value), 4) FROM ev
WHERE ts >= TIMESTAMP '{TRAIN_END}' AND ts < TIMESTAMP '{VAL_END}'
UNION ALL
SELECT 'test', count(*), round(sum(value), 4) FROM ev
WHERE ts >= TIMESTAMP '{VAL_END}'
"""

_DOC_SHA_SQL = "SELECT doc_id, sha256(text) AS text_sha FROM documents"

_EWMA_SQL = f"""
WITH ev AS ({_EV}),
{_T1M_MEAN},
arr AS (
    SELECT conv_id,
           list(mean_v ORDER BY bucket_start) AS vs,
           list(bucket_start ORDER BY bucket_start) AS bs
    FROM t1m GROUP BY 1
),
ew AS (
    SELECT conv_id, bs, vs,
           list_transform(generate_series(1, len(vs)),
               i -> list_reduce(vs[1:i],
                                (acc, x) -> acc + 0.3 * (x - acc))) AS es
    FROM arr
)
SELECT conv_id, unnest(bs) AS bucket_start,
       round(unnest(vs), 4) AS mean_v, round(unnest(es), 4) AS ewma
FROM ew
"""

_SALTED_SQL = f"""
WITH ev AS ({_EV})
SELECT conv_id, count(*) AS cnt, round(sum(value), 4) AS sum_v,
       round(min(value), 4) AS min_v, round(max(value), 4) AS max_v
FROM ev GROUP BY 1
"""

_CODEC_SQL = """
SELECT count(*) AS n_points, CAST(0 AS BIGINT) AS n_mismatch
FROM events WHERE value IS NOT NULL
"""

_ROC_SQL = f"""
WITH sc AS ({_SCORED}),
grp AS (
    SELECT score AS _s,
           sum(CASE WHEN label = 1 THEN 1 ELSE 0 END) AS pos,
           sum(CASE WHEN label = 0 THEN 1 ELSE 0 END) AS neg
    FROM sc GROUP BY 1
),
ranked AS (
    SELECT pos, neg,
           coalesce(sum(pos + neg) OVER (ORDER BY _s
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               + (pos + neg + 1) / 2.0 AS rank_avg,
           sum(pos) OVER (ORDER BY _s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_pos_desc,
           sum(pos + neg) OVER (ORDER BY _s DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_all_desc
    FROM grp
),
agg AS (
    -- CAST AS BIGINT: avoid DuckDB HUGEINT vs Spark int64 hash skew
    SELECT CAST(sum(pos) AS BIGINT) AS np, CAST(sum(neg) AS BIGINT) AS nn,
           sum(pos * rank_avg) AS rsum,
           sum((CAST(cum_pos_desc AS DOUBLE) / cum_all_desc) * pos)
               AS ap_num
    FROM ranked
)
SELECT round((rsum - np * (np + 1) / 2.0) / (np * nn), 4) AS auroc,
       round(ap_num / np, 4) AS average_precision,
       np AS n_pos, nn AS n_neg
FROM agg
"""

_SWEEP_RAW_LT_SQL = f"""
WITH sc AS (SELECT event_id, -CAST(value AS DOUBLE) / 500.0 AS score,
            CAST((event_id % 97) < 5 AS INT) AS label FROM events),
gt AS (SELECT -0.10 + CAST(i AS DOUBLE) * -0.01 AS y,
              -0.10 + CAST(i AS DOUBLE) * -0.01 AS threshold
       FROM generate_series(0, 20) t(i)),
sw AS (
    SELECT y, threshold,
           CAST(sum(CASE WHEN score < threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score < threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score >= threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN score >= threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM sc, gt GROUP BY y, threshold
)
SELECT round(y, 4) AS y, round(threshold, 4) AS threshold, tp, fp, fn, tn,
       round(CASE WHEN 2 * tp + fp + fn > 0
                  THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 4) AS f1
FROM sw
"""

_LIFECYCLE_SQL = f"""
WITH sc AS (SELECT ts, CAST(value AS DOUBLE) AS score,
            CAST((event_id % 97) < 5 AS INT) AS label FROM events),
val AS (SELECT * FROM sc WHERE ts >= TIMESTAMP '{TRAIN_END}'
        AND ts < TIMESTAMP '{VAL_END}'),
test AS (SELECT * FROM sc WHERE ts >= TIMESTAMP '{VAL_END}'),
st AS (SELECT avg(score) AS mu, stddev_pop(score) AS sigma FROM val),
gt AS (SELECT 1.0 + CAST(i AS DOUBLE) AS y,
              (1.0 + CAST(i AS DOUBLE)) * mu + sigma AS threshold
       FROM generate_series(0, 99) t(i), st),
sw AS (
    SELECT y, threshold,
           CAST(sum(CASE WHEN score > threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN score > threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN score <= threshold AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN score <= threshold AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM val, gt GROUP BY y, threshold
),
swf AS (
    SELECT *, CASE WHEN 2 * tp + fp + fn > 0
                   THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END AS f1
    FROM sw
),
best AS (SELECT y AS best_y, threshold AS fit_threshold FROM swf
         ORDER BY f1 DESC, y ASC LIMIT 1),
app AS (
    SELECT best_y, fit_threshold, label,
           CASE WHEN score > fit_threshold THEN 1 ELSE 0 END AS pred
    FROM test, best
),
c AS (
    SELECT best_y, fit_threshold,
           CAST(sum(CASE WHEN pred = 1 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
           CAST(sum(CASE WHEN pred = 1 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
           CAST(sum(CASE WHEN pred = 0 AND label = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fn,
           CAST(sum(CASE WHEN pred = 0 AND label = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn
    FROM app GROUP BY 1, 2
)
SELECT best_y, round(fit_threshold, 4) AS fit_threshold, tp, fp, fn, tn,
       round(CASE WHEN 2 * tp + fp + fn > 0
                  THEN 2.0 * tp / (2 * tp + fp + fn) ELSE 0.0 END, 4) AS f1
FROM c
"""

_CASCADE_SERIES_SQL = f"""
SELECT conv_id, date_trunc('minute', ts) AS bucket_start,
       round(sum(value) / count(value), 4) AS v
FROM ({_EV}) ev GROUP BY 1, 2
"""

_KL_SQL = """
WITH p AS (
    SELECT (CAST(value AS DOUBLE) - 50.0) / 50.0 AS mu,
           -(CAST(event_id % 7 AS DOUBLE) / 7.0) AS logvar
    FROM events
)
SELECT round(-0.5 * avg(1.0 + logvar - mu * mu - exp(logvar)), 4) AS kl,
       count(*) AS n
FROM p
"""

_OCSVM_SQL = f"""
WITH sc AS ({_SCORED}),
st AS (SELECT avg(score) AS mu, stddev_pop(score) AS sigma FROM sc)
SELECT CASE WHEN score > mu + 2 * sigma THEN 0 ELSE 1 END AS pred,
       count(*) AS n
FROM sc, st GROUP BY 1
"""

_BEST_EPOCH_SQL = """
WITH e AS (
    SELECT event_id % 20 AS epoch,
           round(avg(CAST(value AS DOUBLE)), 4) AS test_loss,
           count(*) AS n_batches
    FROM events GROUP BY 1
)
SELECT epoch, test_loss, n_batches FROM e
ORDER BY test_loss ASC, epoch ASC LIMIT 1
"""

_BOF_SQL = """
WITH xs AS (SELECT CAST(i AS INT) AS x, CAST(i AS DOUBLE) AS xd
            FROM generate_series(0, 99) t(i))
SELECT x,
  round(1.5 * sin(0.2 * xd + 0.3), 4) AS f_sin,
  round(1.5 * cos(0.2 * xd + 0.3), 4) AS f_cos,
  round(abs(1.5 * sin(0.2 * xd + 0.3)), 4) AS f_sin_abs,
  round(2 * 2.0 * (xd / 7.0 - floor(0.5 + xd / 7.0)) + 0.5, 4) AS f_sawtooth,
  round(1.0 * CASE WHEN abs(0.3 * xd - 2.0) < 1e-12 THEN 1.0
              ELSE sin(0.3 * xd - 2.0) / (0.3 * xd - 2.0) END, 4) AS f_si,
  round(1.0 + 0.5 * xd, 4) AS f_lin,
  round(0.5 + 2.0 * (1 - exp(-xd / (5.0 + 1e-6))), 4) AS f_exp_sat,
  round(0.5 + 2.0 * exp(-xd / (5.0 + 1e-6)), 4) AS f_exp_decay,
  round(0.0 + 1.0 * sqrt(xd + 2.0), 4) AS f_sqrt,
  round(0.0 + 1.0 * log10(xd + 1.0), 4) AS f_log10,
  round(1.0 * (1 - 2.0 / (exp(2 * (xd - 50.0) * 0.1) + 1)), 4) AS f_tanh,
  round(1.0 / (1 + exp((-xd - (-30.0)) * 0.2)), 4) AS f_sig,
  round(2.0 * exp(-abs(0.001 * power(xd - 50.0, 2))), 4) AS f_gaus,
  round(CASE WHEN xd < 30.0 THEN 0.0 ELSE 1.0 END, 4) AS f_step,
  round(CASE WHEN xd >= 20.0 AND xd <= 20.0 + (100.0 - 20.0) * 0.5
             THEN 1.0 ELSE 0.0 END, 4) AS f_rect,
  round(CAST(xd > 50.0 AS DOUBLE), 4) AS f_hardlim,
  round(exp(-power(xd - 50.0, 2) / (2 * 10.0 * 10.0))
        / (10.0 * sqrt(2 * pi())), 4) AS f_gauss_pdf
FROM xs
"""


def _epsilonize(sql: str) -> str:
    """Rewrite every ``round(<expr>, 4)`` to ``round(<expr> + 1e-9, 4)``
    — the oracle-side mirror of ``portable_round``'s boundary epsilon
    (paren-matched, so nested rounds/parens are handled)."""
    out = []
    i = 0
    token = "round("
    while True:
        j = sql.find(token, i)
        if j < 0:
            out.append(sql[i:])
            break
        out.append(sql[i: j + len(token)])
        depth = 1
        k = j + len(token)
        while depth > 0:
            ch = sql[k]
            depth += ch == "("
            depth -= ch == ")"
            k += 1
        inner = sql[j + len(token): k - 1]
        head, sep, scale = inner.rpartition(",")
        if sep and scale.strip() == "4":
            out.append(f"({head}) + 1e-9, 4)")
        else:
            out.append(inner + ")")
        i = k
    return "".join(out)


def oracle_sql() -> dict[str, str]:
    out = {
        "tier_merge_refresh": _tier_sql("hour", 3600),
        "rollup_1m": _tier_sql("minute", 60),
        "rollup_1h": _tier_sql("hour", 3600),
        "rollup_1d": _tier_sql("day", 86400),
        "latency_1m": _LATENCY_SQL,
        "rolling_stats": _ROLLING_SQL,
        "zscore_flags": _ZSCORE_SQL,
        "threshold_sweep": _SWEEP_SQL,
        "best_threshold": _BEST_SQL,
        "confusion_metrics": _CONFUSION_SQL,
        "pred_value_counts": _VALUE_COUNTS_SQL,
        "gapfill_1m": _GAPFILL_SQL,
        "absent_1m": _ABSENT_SQL,
        "segment_rollup_1d": _SEGMENT_ROLLUP_SQL,
        # the splice's oracle is deliberately the PLAIN full-scan
        # tier SQL: the gate proves splice ≡ full recompute
        "realtime_rollup_1h": _tier_sql("hour", 3600),
        "topk_buckets": _TOPK_SQL,
        "tier_parity_1h": _TIER_PARITY_SQL,
        "split_counts": _SPLIT_SQL,
        "doc_sha": _DOC_SHA_SQL,
        "ewma_1m": _EWMA_SQL,
        "conv_stats_salted": _SALTED_SQL,
        "codec_roundtrip": _CODEC_SQL,
        "roc_auc": _ROC_SQL,
        "bof_eval": _BOF_SQL,
        "threshold_sweep_raw_lt": _SWEEP_RAW_LT_SQL,
        "detector_lifecycle": _LIFECYCLE_SQL,
        "residual_cascade": cascade_op.cascade_oracle_sql(
            _CASCADE_SERIES_SQL
        ),
        "kl_closed_form": _KL_SQL,
        "ocsvm_remap": _OCSVM_SQL,
        "best_epoch": _BEST_EPOCH_SQL,
    }
    out.update(dedup.ORACLE_SQL)
    out.update(similarity.ORACLE_SQL)
    out.update(textstats.ORACLE_SQL)
    out.update(multimodal.ORACLE_SQL)
    out.update(sessions.ORACLE_SQL)
    out.update(tsanalytics.ORACLE_SQL)
    out.update(alerting.ORACLE_SQL)
    out.update(sketches.ORACLE_SQL)
    out.update(journeys.ORACLE_SQL)
    out.update(curation.ORACLE_SQL)
    out["grouping_cube_1d"] = rollup.GROUPED_ROLLUP_SQL
    out.update(layout.ORACLE_SQL)
    out.update(enrich.ORACLE_SQL)
    out.update(gapfill.ORACLE_SQL)
    out.update(statstests.ORACLE_SQL)
    # capstone composition: intersection of three independently-
    # oracled doc_id sets (quality gate, canonical dedup survivors,
    # stratified sample)
    out["curated_corpus"] = f"""
SELECT doc_id FROM ({out['quality_filter']}) q
WHERE doc_id IN (SELECT doc_id FROM ({out['dedup_canonical']}))
  AND doc_id IN (SELECT doc_id FROM ({out['stratified_sample']}))
"""
    return {k: _epsilonize(v) for k, v in out.items()}
