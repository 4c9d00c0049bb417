"""Linear-interpolation gap-fill across sparse conversation windows.

North-rule component; nearest reference analog is the NaN→1 patch in
the Si basis function (/root/reference/Network/ITF/functions.py:153)
— the engine implements real bucket-skeleton + linear interpolation.

Semantics: for each conversation, materialize EVERY tier bucket
between its first and last observed bucket (``sequence`` + explode —
no driver loop), left-join observed rows, and linearly interpolate
interior NULL runs between the nearest observed neighbors on the time
axis. Leading/trailing buckets (no neighbor on one side) stay NULL.
``gap_filled`` marks synthesized values.

Scale: skeleton generation is per-conversation map-side arithmetic;
the join is on (conv_id, bucket_start) — same clustering as the tier
tables, so AQE keeps it a co-partitioned sort-merge join; the
interpolation itself is four window functions over conv_id, reusing
that single shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark import caching

from yahoo_anomaly_detection_spark.operators.rollup import TIER_SECONDS


def bucket_skeleton(tier_df: DataFrame, tier: str = "1m",
                    key: str = "conv_id",
                    bucket_col: str = "bucket_start") -> DataFrame:
    """All buckets from min to max observed per key, one row each."""
    step = F.expr(f"INTERVAL {TIER_SECONDS[tier]} SECONDS")
    return (
        tier_df.groupBy(key)
        .agg(F.min(bucket_col).alias("_b0"), F.max(bucket_col).alias("_b1"))
        .select(
            key,
            F.explode(F.sequence(F.col("_b0"), F.col("_b1"), step)).alias(bucket_col),
        )
    )


def gapfill_linear(tier_df: DataFrame, tier: str = "1m",
                   value_col: str = "mean", key: str = "conv_id",
                   bucket_col: str = "bucket_start") -> DataFrame:
    """Skeleton join + linear interpolation of ``value_col``.

    Output: (key, bucket_start, <value_col> observed-or-null,
    <value_col>_filled, gap_filled boolean).
    """
    # feeds both the skeleton bounds and the join — materialize (fill
    # the cache eagerly) so the two consumers can't race a cold
    # persist() and each recompute the tier subtree (the same race
    # dedup's banded self-join fixes); caller releases via
    # caching.release_all()
    tier_df = caching.materialize(tier_df)
    skel = bucket_skeleton(tier_df, tier, key, bucket_col)
    obs = tier_df.select(key, bucket_col, F.col(value_col).alias("_v"))
    joined = skel.join(obs, on=[key, bucket_col], how="left")

    t = F.unix_micros(F.col(bucket_col)).cast("double")
    # both directions as RUNNING frames (O(n)); a
    # (CURRENT ROW, UNBOUNDED FOLLOWING) frame would make Spark rescan
    # the partition remainder per row (O(n²) — 10×+ slower measured)
    w_prev = W.partitionBy(key).orderBy(bucket_col).rowsBetween(
        W.unboundedPreceding, 0
    )
    w_next = W.partitionBy(key).orderBy(F.desc(bucket_col)).rowsBetween(
        W.unboundedPreceding, 0
    )
    v = F.col("_v")
    prev_v = F.last(v, ignorenulls=True).over(w_prev)
    prev_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_prev)
    next_v = F.last(v, ignorenulls=True).over(w_next)
    next_t = F.last(F.when(v.isNotNull(), t), ignorenulls=True).over(w_next)

    interp = F.when(v.isNotNull(), v).otherwise(
        F.when(
            prev_v.isNotNull() & next_v.isNotNull(),
            prev_v + (next_v - prev_v) * (t - prev_t) / (next_t - prev_t),
        )
    )
    return joined.select(
        key,
        bucket_col,
        v.alias(value_col),
        interp.alias(f"{value_col}_filled"),
        (v.isNull() & interp.isNotNull()).alias("gap_filled"),
    )


def backfill_plan(events: DataFrame, key: str = "event_type",
                  ts_col: str = "ts",
                  granularity: str = "day") -> DataFrame:
    """Operational complement of gap-FILLING: enumerate the missing
    days instead of interpolating them — the work-list a backfill
    orchestrator executes (one job per contiguous missing run, the
    unit Airflow/dagster-style backfills schedule). Per series, the
    calendar spine between the series' first and last active day is
    anti-joined against observed days; consecutive missing days
    collapse into runs via the gaps-and-islands idiom
    (``day_number − row_number`` is constant within a run).

    Output: (key, backfill_start, backfill_end, n_days) — one row
    per contiguous missing run, empty when no gaps exist.

    ``granularity`` ("day" or "hour") picks the backfill unit —
    partition-per-day tables backfill days, finer tiers backfill
    hours.

    Scale shape: the raw relation collapses to the chosen tier (ONE
    map-side-combined groupBy); the spine explodes ≤ span-days rows
    per series off the tiny per-series bounds relation; anti-join,
    row_number window, and run groupBy all run on tier-sized
    relations partitioned by the series key.
    """
    if granularity not in ("day", "hour"):
        raise ValueError(f"granularity must be day|hour, got {granularity}")
    unit_us = 86_400_000_000 if granularity == "day" else 3_600_000_000
    day = F.date_trunc(granularity, F.col(ts_col))
    observed = (events.groupBy(F.col(key), day.alias("day"))
                .agg(F.count(F.lit(1)).alias("n")))
    bounds = observed.groupBy(key).agg(
        F.min("day").alias("d0"), F.max("day").alias("d1"))
    spine = bounds.select(
        key,
        F.explode(F.sequence(
            F.col("d0").cast("timestamp"), F.col("d1").cast("timestamp"),
            F.expr(f"interval 1 {granularity}"))).alias("day"))
    missing = spine.join(observed.select(key, "day"), [key, "day"],
                         "left_anti")
    dnum = (F.unix_micros(F.col("day").cast("timestamp"))
            / F.lit(unit_us)).cast("long")
    w = W.partitionBy(key).orderBy("day")
    runs = missing.select(
        key, "day",
        (dnum - F.row_number().over(w)).alias("_grp"))
    return (runs.groupBy(key, "_grp")
            .agg(F.min("day").alias("backfill_start"),
                 F.max("day").alias("backfill_end"),
                 F.count(F.lit(1)).alias("n_days"))
            .drop("_grp"))


def _backfill_sql(granularity: str = "day") -> str:
    unit_s = 86400 if granularity == "day" else 3600
    return f"""
WITH obs AS (
    SELECT event_type, date_trunc('{granularity}', ts) AS day
    FROM events GROUP BY 1, 2
),
b AS (
    SELECT event_type, min(day) AS d0, max(day) AS d1
    FROM obs GROUP BY 1
),
spine AS (
    SELECT event_type, unnest(generate_series(d0, d1,
                                   INTERVAL 1 {granularity})) AS day
    FROM b
),
miss AS (
    SELECT s.event_type, s.day
    FROM spine s LEFT JOIN obs USING (event_type, day)
    WHERE obs.day IS NULL
),
g AS (
    SELECT event_type, day,
           CAST(epoch(day) AS BIGINT) // {unit_s}
               - row_number() OVER (PARTITION BY event_type
                                    ORDER BY day) AS grp
    FROM miss
)
SELECT event_type,
       min(day) AS backfill_start,
       max(day) AS backfill_end,
       count(*) AS n_days
FROM g GROUP BY event_type, grp
"""


ORACLE_SQL = {"backfill_plan": _backfill_sql("hour")}
