"""Streaming ingest dedup (hop 0 of the topology): collapse
at-least-once delivery to an exactly-once event relation BEFORE any
aggregate sees the data.

Every real transport in front of this engine (Kafka with producer
retries, webhook redelivery, backfill overlap) re-delivers events;
every downstream operator here (tier rollups, latency derivation,
alert states) assumes each event counts once. The batch path gets
that from idempotent bucket re-rollup (`jobs/rollup_job.py`); the
streaming path gets it from this hop, so the SAME five-hop topology
runs on a dirty source with unchanged semantics — batch-parity test
in tests/test_streaming.py.

Mechanics and why state stays bounded (SURVEY §2.9; no reference
counterpart — the reference is batch-only,
/root/reference/StatsTesting/base_anomaly_stats.py:16-26 consumes a
clean loader): ``dropDuplicatesWithinWatermark`` keeps one state-store
row per key currently inside the event-time watermark and EVICTS it
when the watermark passes — unlike streaming ``dropDuplicates``,
whose state grows with every key ever seen and OOMs a forever-running
query. The contract is the transport's redelivery horizon: two copies
of a key are collapsed when they arrive within the watermark of each
other (true redeliveries are seconds apart; the watermark is sized in
minutes), while a key legitimately reused outside the horizon counts
again.

State cost: one row per distinct key per watermark window per
partition-key shard — independent of stream length, the same
bounded-state argument as the rollup hop's watermarked buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(events: DataFrame,
                 key_cols: tuple[str, ...] = ("event_id",),
                 ts_col: str = "ts",
                 watermark: str = "10 minutes") -> DataFrame:
    """Exactly-once event relation from an at-least-once stream:
    drop redeliveries of ``key_cols`` arriving within ``watermark``
    (event time on ``ts_col``) of the first copy.

    Returns a streaming DataFrame with the input schema — insert this
    hop between the source and any aggregate; downstream watermarks
    compose (Spark tracks the min across stateful operators).
    """
    if not key_cols:
        raise ValueError("key_cols must name at least one column")
    return (
        events.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(list(key_cols))
    )
