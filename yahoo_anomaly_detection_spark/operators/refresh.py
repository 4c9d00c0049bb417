"""Incremental continuous-aggregate refresh: exact tier maintenance
over an append-only transcripts table without ever recomputing
history.

North-rule component ("continuous-aggregate tiers ... resumable from
Iceberg snapshot checkpoints"): at 10^12 turns a tier refresh must
touch only the appended delta plus the tier rows it lands in. The
machinery:

- ``catalog.read_appended`` scans ONLY the commits after the last
  processed snapshot (Iceberg incremental scan / the shim's new-dir
  union);
- the one stateful derivation — per-turn latency, a ``lag`` over
  (conv_id, turn_idx) — crosses batch boundaries, so a compact
  per-conversation TAILS table carries each conversation's last
  (turn_idx, ts) forward; :func:`incremental_latency` windows over
  delta ∪ carried tails and is EXACTLY equal to what a full recompute
  would assign the delta rows (pytest parity);
- tier partials of the delta merge into existing rows via
  :func:`operators.rollup.merge_tiers` (tiers carry decomposable
  state) and land with ``catalog.replace_where`` on the affected day
  partitions only — one atomic commit per tier, cost ∝ delta;
- the tails table is hive-partitioned by a conv_id hash bucket so
  its update is also a ``replace_where`` on the affected buckets, not
  a full rewrite (#convs grows with the corpus).

Out-of-order appends (a turn arriving with ``turn_idx`` ≤ the
conversation's recorded tail) would silently corrupt latency values;
:func:`validate_in_order` makes the refresh fail LOUDLY instead — the
operator contract is in-order appends per conversation, the natural
shape of a transcript log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from .rollup import transcripts_latency

TAILS_BUCKETS = 64


def conv_tails(df: DataFrame) -> DataFrame:
    """Per-conversation tail: the last (turn_idx, ts) under stable
    turn ordering, plus the hash bucket the tails table is
    partitioned by. One map-side-combined shuffle of 3 columns."""
    return df.groupBy("conv_id").agg(
        F.max("turn_idx").alias("last_turn_idx"),
        F.max_by("ts", "turn_idx").alias("last_ts"),
    ).withColumn(
        "bucket", F.pmod(F.hash(F.col("conv_id")), F.lit(TAILS_BUCKETS))
    )


def merge_tails(old: DataFrame | None, delta_tails: DataFrame) -> DataFrame:
    """Newest tail per conversation across old state and the delta."""
    u = delta_tails if old is None \
        else old.select(*delta_tails.columns).unionByName(delta_tails)
    return u.groupBy("conv_id").agg(
        F.max("last_turn_idx").alias("last_turn_idx"),
        F.max_by("last_ts", "last_turn_idx").alias("last_ts"),
        F.first("bucket").alias("bucket"),  # hash of conv_id: constant
    )


def validate_in_order(delta: DataFrame,
                      tails: DataFrame | None = None) -> int:
    """Number of conversations whose delta violates the append
    contract: a delta turn_idx at or below the recorded tail, OR a
    duplicated ``turn_idx`` WITHIN the delta itself (producer retries
    — the ``lag`` window would tie nondeterministically and ``cnt``
    would inflate). The caller raises on > 0 — continuing would assign
    wrong latencies silently. One delta-sized aggregation; ``tails``
    is None on an initial/full run (only the duplicate check applies).
    """
    per_conv = delta.groupBy("conv_id").agg(
        F.min("turn_idx").alias("mn"),
        (F.count("*") > F.count_distinct("turn_idx")).alias("dup"),
    )
    if tails is None:
        return per_conv.where("dup").count()
    return (
        per_conv.join(tails.select("conv_id", "last_turn_idx"),
                      "conv_id", "left")
        # NULL last_turn_idx (conv not in tails) fails the <= branch
        .where(F.col("dup") | (F.col("mn") <= F.col("last_turn_idx")))
        .count()
    )


def incremental_latency(delta: DataFrame,
                        tails: DataFrame | None) -> DataFrame:
    """Latency points for EXACTLY the delta rows, equal to what a full
    recompute would assign them.

    The carried tail row supplies the ``lag`` predecessor for each
    conversation's first delta turn; a conversation with no tail (its
    global first turns are in this delta) gets NULL on its first turn,
    as in :func:`transcripts_latency`. Tails are pruned to the delta's
    conversations with a left_semi join before the union, so the
    window shuffles delta-sized data plus one carried row per active
    conversation — never the full tails table.
    """
    if tails is None:
        return transcripts_latency(delta)
    active = delta.select("conv_id").distinct()
    carry = (
        tails.join(active, "conv_id", "left_semi")
        .select(
            "conv_id",
            F.col("last_ts").alias("ts"),
            F.col("last_turn_idx").alias("turn_idx"),
            F.lit(True).alias("_carry"),
        )
    )
    aug = delta.select(
        "conv_id", "ts", "turn_idx", F.lit(False).alias("_carry")
    ).unionByName(carry)
    w = W.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts"))
    return (
        aug.select(
            "conv_id",
            "ts",
            "_carry",
            ((us - F.lag(us).over(w)) / F.lit(1e6)).alias("value"),
        )
        .where(~F.col("_carry"))
        .drop("_carry")
    )


def affected_days(delta_points: DataFrame, ts_col: str = "ts") -> list[str]:
    """Distinct days the delta touches — the partitions every tier
    refresh replaces. Driver-side list by design: a refresh batch
    spans hours-to-days of event time (bounded), never table history."""
    rows = (
        delta_points.select(
            F.to_date(F.col(ts_col)).cast("string").alias("day")
        )
        .distinct()
        .collect()
    )
    return sorted(r.day for r in rows)


def day_predicate(days: list[str], col: str = "day") -> str:
    """``day IN (...)`` predicate for replace_where on day partitions."""
    if not days:
        raise ValueError("no affected days — nothing to replace")
    quoted = ", ".join(f"DATE'{d}'" for d in days)
    return f"{col} IN ({quoted})"


def realtime_splice(tier_df: DataFrame, raw_points: DataFrame,
                    tier: str, watermark, value_col: str = "value",
                    ts_col: str = "ts") -> DataFrame:
    """TimescaleDB-style real-time continuous aggregate: the
    MATERIALIZED tier below the watermark unioned with an on-the-fly
    rollup of the raw tail at/after it — queries see fresh data
    without waiting for the next refresh, and the refresh job never
    races the readers.

    ``watermark`` must be bucket-aligned for ``tier`` (the refresh
    job's invariant: it materializes whole buckets, so the watermark
    is always the end of the last complete one). A misaligned
    watermark would let one bucket straddle the splice — half its
    rows in the materialized part, half re-aggregated from raw — and
    the union would silently emit two partial rows for one bucket;
    this raises instead. Alignment makes the splice EXACT: every
    bucket's rows land wholly on one side, so the result is
    row-for-row the full-recompute tier (the driver oracle for
    ``realtime_rollup_1h`` is the plain full-scan tier SQL — the gate
    proves splice ≡ recompute, not a transcription of the splice).

    Scale shape: the materialized side is a partition-pruned tier
    scan (``bucket_start < watermark`` prunes day partitions on the
    catalog tables); the raw side scans ONLY the tail (``ts >=
    watermark`` prunes bronze partitions) through one map-side-
    combined rollup. Nothing shuffles across the splice — the union
    is a plan-level concat.
    """
    from datetime import datetime

    from .rollup import TIER_SECONDS, rollup_points

    if tier not in TIER_SECONDS:
        raise ValueError(f"unknown tier {tier!r}")
    wm = (datetime.fromisoformat(watermark)
          if isinstance(watermark, str) else watermark)
    if wm.tzinfo is not None:
        # normalize to the engine's UTC wall clock — .replace() alone
        # would silently DROP a non-UTC offset and shift the splice
        from datetime import timezone

        wm = wm.astimezone(timezone.utc).replace(tzinfo=None)
    epoch_us = int((wm - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    if epoch_us % (TIER_SECONDS[tier] * 1_000_000) != 0:
        raise ValueError(
            f"watermark {wm} is not aligned to the {tier} bucket grid — "
            f"a straddling bucket would be emitted twice, partially")
    # the literal is built from the SAME epoch micros the alignment
    # check validated — F.lit(naive datetime) would round-trip through
    # the DRIVER OS timezone (py4j DatetimeConverter uses time.mktime),
    # silently shifting the splice on any non-UTC host while the
    # UTC-based check above still passed
    lit_wm = F.timestamp_micros(F.lit(epoch_us))
    materialized = tier_df.where(F.col("bucket_start") < lit_wm)
    tail = rollup_points(
        raw_points.where(F.col(ts_col).cast("timestamp") >= lit_wm),
        tier, value_col=value_col,
    )
    return materialized.unionByName(tail)
