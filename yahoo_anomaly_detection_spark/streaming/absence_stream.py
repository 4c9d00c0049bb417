"""Streaming heartbeat-absence alerts over finalized tier rows.

Fifth hop of the streaming topology — the continuous analog of the
batch :func:`operators.tsanalytics.absent_flags` (Prometheus
``absent()``): a conversation that STOPS producing tier buckets fires
one alert once ``k`` full buckets have elapsed with no data. This is
the one alert a data-driven operator cannot express: every other hop
computes over rows that arrived; this one fires precisely BECAUSE no
row arrived — only an event-time timeout can see that.

Mechanism: per-conversation state holds one long (the last observed
bucket start, µs). On data the state re-arms an EVENT-TIME timeout at
``last + (k+1)·bucket`` — the instant the k-th consecutive empty
bucket completes (matching batch semantics: ``absent_flags`` flags
the k-th missing bucket; this alert fires when exactly that bucket
closes). When the query's watermark passes the timeout with no new
data, Spark invokes the state handler with ``hasTimedOut`` and the
alert row is emitted: (conv_id, silent_since = last + bucket,
alert_at = the timeout instant, missed_buckets = k). The state is
then REMOVED: one alert per silence, and a conversation that returns
re-arms from scratch (the next silence alerts again).

Late-data interaction: the timeout is clamped to just above the
current watermark when a conversation's data arrives so late that
its silence deadline already passed — the alert then fires in the
next micro-batch instead of raising, with ``alert_at`` still the
true event-time deadline.

Scale: one long per live conversation — state size is that of the
latency hop; removal-on-fire IS the eviction (a dead conversation
costs exactly one timeout), so no TTL knob is needed.

Input contract: finalized tier rows (conv_id, bucket_start) with a
watermark set by THIS operator (``watermark_delay``); in-order
per conversation across micro-batches like every downstream hop.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("silent_since", T.TimestampType()),
        T.StructField("alert_at", T.TimestampType()),
        T.StructField("missed_buckets", T.IntegerType()),
    ]
)
# the whole state: last observed bucket start (epoch µs)
_STATE_SCHEMA = T.StructType([T.StructField("last_us", T.LongType())])

_US = 1_000_000


def stream_absence_alerts(tiers: DataFrame, k: int = 3,
                          bucket_seconds: int = 60,
                          watermark_delay: str = "10 minutes"
                          ) -> DataFrame:
    """Finalized tier stream → one absence alert per silence of ≥ k
    full buckets (see module docstring for exact event-time
    semantics and the batch-parity relationship)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if bucket_seconds < 1:
        raise ValueError(
            f"bucket_seconds must be >= 1, got {bucket_seconds}")
    b_us = int(bucket_seconds) * _US
    kk = int(k)

    def fn(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            last_us = int(state.get[0])
            state.remove()
            yield pd.DataFrame(
                {
                    "conv_id": [key[0]],
                    "silent_since": [pd.Timestamp(last_us + b_us,
                                                  unit="us")],
                    "alert_at": [pd.Timestamp(last_us + (kk + 1) * b_us,
                                              unit="us")],
                    "missed_buckets": [kk],
                }
            )
            return
        mx = 0
        for pdf in pdfs:
            if len(pdf):
                col = pdf["bucket_start"]
                mx = max(mx, int(col.max().value) // 1000)
        if mx == 0:
            return
        if state.exists:
            mx = max(mx, int(state.get[0]))
        state.update((mx,))
        deadline_ms = (mx + (kk + 1) * b_us) // 1000
        # event-time timeouts must sit strictly past the current
        # watermark; a conversation arriving later than its own
        # silence deadline clamps to "next batch" (alert_at keeps the
        # true event-time deadline — computed from state, not this)
        wm_ms = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(deadline_ms, wm_ms + 1))
        return
        yield  # pragma: no cover — generator form required by Spark

    return (
        tiers.select("conv_id", "bucket_start")
        .withWatermark("bucket_start", watermark_delay)
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn, _OUT_SCHEMA, _STATE_SCHEMA, "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )


def start_absence_to_parquet(alerts: DataFrame, out_path: str,
                             checkpoint_path: str, trigger_secs: int = 1):
    """Append-mode parquet sink with a streaming checkpoint."""
    return (
        alerts.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .trigger(processingTime=f"{trigger_secs} seconds")
        .start()
    )
