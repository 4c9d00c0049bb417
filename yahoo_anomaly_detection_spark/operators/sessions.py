"""Gap-based sessionization over the events stream table.

Splits each user's event sequence into sessions wherever the
inter-arrival gap exceeds a threshold, then aggregates per-session
stats — the sessionize → aggregate shape every clickstream/agent-log
pipeline runs before feature extraction. (No reference counterpart —
the reference has no event-log layer; this is an engine-side
data-pipeline operator.)

Scale shape: ONE hash shuffle on ``user_id`` serves both window
phases (the lag that detects breaks and the running sum that numbers
sessions use the same partitioning, so Catalyst plans a single
exchange with two pipelined window stages); ``session_stats`` then
reuses the same partitioning for its groupBy — map-side combined,
no second wide exchange of raw events. Ordering is made total with
the ``(ts, event_id)`` tie-break so results are deterministic and
engine-portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from yahoo_anomaly_detection_spark.functions.portable import portable_round

_R = 4


def sessionize(events: DataFrame, gap_seconds: int = 28800) -> DataFrame:
    """(event_id, user_id, session_id): 0-based session number per
    user; a new session starts when the gap since the previous event
    exceeds ``gap_seconds``. First event of a user is session 0
    (NULL lag compares false, same in ANSI SQL)."""
    order = [F.col("ts"), F.col("event_id")]
    w = W.partitionBy("user_id").orderBy(*order)
    # events.ts is TIMESTAMP_NTZ in the driver parquet; the session
    # runs UTC so the cast is an identity relabel
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = (
        F.when((us - F.lag(us).over(w)) / F.lit(1e6) > gap_seconds, 1)
        .otherwise(0)
        .alias("brk")
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        events.select("event_id", "user_id", "ts", brk)
        .select(
            "event_id",
            "user_id",
            F.sum("brk").over(run).cast("long").alias("session_id"),
        )
    )


def session_stats(events: DataFrame,
                  gap_seconds: int = 28800) -> DataFrame:
    """Per-session aggregates: event count, duration (seconds),
    summed value — the session-level feature table."""
    order = [F.col("ts"), F.col("event_id")]
    w = W.partitionBy("user_id").orderBy(*order)
    # events.ts is TIMESTAMP_NTZ in the driver parquet; the session
    # runs UTC so the cast is an identity relabel
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    brk = (
        F.when((us - F.lag(us).over(w)) / F.lit(1e6) > gap_seconds, 1)
        .otherwise(0)
        .alias("brk")
    )
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    tagged = events.select("event_id", "user_id", "ts", "value", brk).select(
        "user_id",
        "ts",
        "value",
        F.sum("brk").over(run).cast("long").alias("session_id"),
    )
    return tagged.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        ((F.unix_micros(F.max(F.col("ts").cast("timestamp")))
          - F.unix_micros(F.min(F.col("ts").cast("timestamp"))))
         / F.lit(1e6)).alias("duration_s"),
        # rounded: float summation order differs across engines
        portable_round(F.sum("value"), _R).alias("sum_value"),
    )


def _session_sql_body(gap_seconds: int) -> str:
    return f"""
g AS (
    SELECT event_id, user_id, ts, value,
           CASE WHEN (epoch_us(ts) - lag(epoch_us(ts)) OVER w) / 1e6
                     > {gap_seconds}
                THEN 1 ELSE 0 END AS brk
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
    SELECT event_id, user_id, ts, value,
           CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS session_id
    FROM g
)"""


def _sessionize_sql(gap_seconds: int) -> str:
    return (
        "WITH " + _session_sql_body(gap_seconds)
        + "\nSELECT event_id, user_id, session_id FROM s"
    )


def _session_stats_sql(gap_seconds: int) -> str:
    return (
        "WITH " + _session_sql_body(gap_seconds)
        + """
SELECT user_id, session_id, count(*) AS n_events,
       (epoch_us(max(ts)) - epoch_us(min(ts))) / 1e6 AS duration_s,
       round(sum(value), 4) AS sum_value
FROM s GROUP BY 1, 2
"""
    )


def value_percentiles(events: DataFrame) -> DataFrame:
    """p50/p95/p99 of ``value`` per (event_type, day) — the
    percentile rollup every latency/observability pipeline runs.

    Exact linear-interpolated percentiles (``F.percentile`` ≡ ANSI
    ``percentile_cont`` ≡ DuckDB ``quantile_cont``) so the oracle
    matches bit-for-bit after portable rounding. Exact percentile is
    a sort-based aggregate — it shuffles each group's values to one
    reducer. That is fine while groups are (type × day)-sized; at
    100 TB with huge groups swap in ``F.approx_percentile`` — a
    mergeable KLL-style sketch with map-side partial aggregation —
    at the cost of oracle exactness (the scale path, same schema)."""
    day = F.date_trunc("DAY", F.col("ts").cast("timestamp")).alias("day")
    v = F.col("value")
    return (
        events.groupBy("event_type", day)
        .agg(
            F.count(F.lit(1)).alias("n"),
            portable_round(F.percentile(v, 0.5), _R).alias("p50"),
            portable_round(F.percentile(v, 0.95), _R).alias("p95"),
            portable_round(F.percentile(v, 0.99), _R).alias("p99"),
        )
    )


_PERCENTILES_SQL = """
SELECT event_type, date_trunc('day', ts) AS day, count(*) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(quantile_cont(value, 0.99), 4) AS p99
FROM events GROUP BY 1, 2
"""


ORACLE_SQL = {
    "sessionize": _sessionize_sql(28800),
    "session_stats": _session_stats_sql(28800),
    "value_percentiles": _PERCENTILES_SQL,
}
