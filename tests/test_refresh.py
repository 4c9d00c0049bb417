"""Incremental continuous-aggregate refresh: exactness, loud-failure
and crash-retry semantics of operators/refresh.py + jobs/refresh_job.py.

The core claim under test: k incremental refreshes over an append-only
bronze table produce BIT-FOR-LOGIC identical tiers to one full
recompute of the concatenated input — including latency values that
cross batch boundaries (the per-conversation tails carry-in)."""

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from jobs.refresh_job import TAILS_TABLE, refresh_once
from yahoo_anomaly_detection_spark.operators.rollup import (
    TIERS,
    merge_tiers,
    rollup_all_tiers,
    rollup_points,
    transcripts_latency,
)
from yahoo_anomaly_detection_spark.operators import refresh as R
from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog
from yahoo_anomaly_detection_spark.sources.ingest import bronze_transcripts
from yahoo_anomaly_detection_spark.synthgen import gen_transcripts

INT_COLS = ("cnt", "vcnt")
FLOAT_COLS = ("sum", "sum_sq", "min", "max", "mean", "std", "turn_rate")


def _split_by_time(df, k):
    """Split rows into k batches by global event-time order, so
    conversations SPAN batch boundaries (the hard case for latency)."""
    w = W.orderBy("ts", "conv_id", "turn_idx")
    tiled = df.withColumn("_b", F.ntile(k).over(w))
    return [tiled.where(F.col("_b") == i + 1).drop("_b") for i in range(k)]


def _tier_map(df):
    out = {}
    for r in df.collect():
        out[(r.conv_id, str(r.bucket_start))] = r
    return out


def assert_tier_equal(got, exp, tier):
    g, e = _tier_map(got), _tier_map(exp)
    assert set(g) == set(e), f"{tier}: bucket key sets differ"
    for k, er in e.items():
        gr = g[k]
        for c in INT_COLS:
            assert gr[c] == er[c], (tier, k, c, gr[c], er[c])
        for c in FLOAT_COLS:
            if er[c] is None:
                assert gr[c] is None, (tier, k, c)
            else:
                assert gr[c] == pytest.approx(er[c], rel=1e-9, abs=1e-9), (
                    tier, k, c, gr[c], er[c])


@pytest.fixture()
def warehouse(tmp_path):
    return ParquetCatalog(str(tmp_path / "wh"))


def test_merge_tiers_equals_flat_rollup(spark):
    raw = bronze_transcripts(gen_transcripts(spark, n_convs=12,
                                             partitions=3))
    pts = transcripts_latency(raw)
    a = pts.where(F.pmod(F.hash("conv_id"), F.lit(2)) == 0)
    b = pts.where(F.pmod(F.hash("conv_id"), F.lit(2)) == 1)
    # also split WITHIN conversations on time, so partial buckets merge
    mid = pts.agg(F.percentile_approx("ts", 0.5)).collect()[0][0]
    a2, b2 = pts.where(F.col("ts") <= mid), pts.where(F.col("ts") > mid)
    for parts in ([a, b], [a2, b2]):
        merged = merge_tiers([rollup_points(p, "1m") for p in parts], "1m")
        assert_tier_equal(merged, rollup_points(pts, "1m"), "1m")


def test_incremental_refresh_equals_full_recompute(spark, warehouse):
    raw = gen_transcripts(spark, n_convs=40, partitions=4)
    batches = _split_by_time(raw, 3)
    for b in batches:
        warehouse.append(bronze_transcripts(b), "transcripts",
                         partition_by=["day"])
        m = refresh_once(spark, warehouse)
        assert m["mode"] in ("initial", "incremental")
    # sanity: the split really crossed conversations over batches
    convs0 = {r.conv_id for r in batches[0].select("conv_id")
              .distinct().collect()}
    convs1 = {r.conv_id for r in batches[1].select("conv_id")
              .distinct().collect()}
    assert convs0 & convs1, "fixture too easy: no conv spans batches"

    expected = rollup_all_tiers(
        transcripts_latency(bronze_transcripts(raw)))
    for tier in TIERS:
        got = warehouse.read(spark, f"tier_{tier}").drop("day")
        assert_tier_equal(got, expected[tier], tier)

    # tails state equals the full input's per-conv tails
    exp_tails = _tier_map_rows(R.conv_tails(bronze_transcripts(raw)))
    got_tails = _tier_map_rows(warehouse.read(spark, TAILS_TABLE))
    assert got_tails == exp_tails

    # a refresh with nothing new is a recorded no-op
    m = refresh_once(spark, warehouse)
    assert m["mode"] == "noop"


def _tier_map_rows(df):
    return {r.conv_id: (r.last_turn_idx, str(r.last_ts))
            for r in df.collect()}


def _mini_bronze(spark, rows):
    return bronze_transcripts(spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp"))


def test_out_of_order_append_fails_loudly(spark, warehouse):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    hi = [("c", 2, t + dt.timedelta(seconds=20)),
          ("c", 3, t + dt.timedelta(seconds=30))]
    lo = [("c", 0, t), ("c", 1, t + dt.timedelta(seconds=10))]
    warehouse.append(_mini_bronze(spark, hi), "transcripts",
                     partition_by=["day"])
    refresh_once(spark, warehouse)
    warehouse.append(_mini_bronze(spark, lo), "transcripts",
                     partition_by=["day"])
    with pytest.raises(RuntimeError, match="in-order-append"):
        refresh_once(spark, warehouse)


def test_full_fallback_after_history_rewrite(spark, warehouse):
    raw = gen_transcripts(spark, n_convs=16, partitions=2)
    b1, b2 = _split_by_time(raw, 2)
    warehouse.append(bronze_transcripts(b1), "transcripts",
                     partition_by=["day"])
    refresh_once(spark, warehouse)
    warehouse.append(bronze_transcripts(b2), "transcripts",
                     partition_by=["day"])
    # TTL rewrite of bronze history: incremental is now undefined
    cutoff = raw.agg(F.percentile_approx("ts", 0.25)).collect()[0][0]
    warehouse.delete_where(spark, "transcripts",
                           f"ts < TIMESTAMP'{cutoff}'")
    m = refresh_once(spark, warehouse)
    assert m["mode"] == "full"
    surviving = bronze_transcripts(raw).where(
        F.col("ts") >= F.lit(cutoff))
    expected = rollup_all_tiers(transcripts_latency(surviving))
    for tier in TIERS:
        got = warehouse.read(spark, f"tier_{tier}").drop("day")
        assert_tier_equal(got, expected[tier], tier)


def test_crash_before_meta_commit_retries_exactly_once(spark, warehouse):
    """Tier/tails commits land but the meta row doesn't (simulated
    crash): the retry recomputes against the PINNED pre-crash
    snapshots and converges to the same result as an uninterrupted
    run — no double-merge."""
    from jobs import refresh_job

    raw = gen_transcripts(spark, n_convs=20, partitions=2)
    b1, b2 = _split_by_time(raw, 2)
    warehouse.append(bronze_transcripts(b1), "transcripts",
                     partition_by=["day"])
    refresh_once(spark, warehouse)
    warehouse.append(bronze_transcripts(b2), "transcripts",
                     partition_by=["day"])

    real_append = warehouse.append

    def exploding_append(df, table, partition_by=None):
        if table == refresh_job.META_TABLE:
            raise OSError("simulated crash before meta commit")
        return real_append(df, table, partition_by=partition_by)

    warehouse.append = exploding_append
    try:
        with pytest.raises(OSError, match="simulated crash"):
            refresh_once(spark, warehouse)
    finally:
        warehouse.append = real_append

    m = refresh_once(spark, warehouse)  # retry after "restart"
    assert m["mode"] == "incremental"
    expected = rollup_all_tiers(
        transcripts_latency(bronze_transcripts(raw)))
    for tier in TIERS:
        got = warehouse.read(spark, f"tier_{tier}").drop("day")
        assert_tier_equal(got, expected[tier], tier)


def test_tiers_argument_validated(spark, warehouse):
    warehouse.append(_mini_bronze_one(spark), "transcripts")
    for bad in (("1h", "1m"), ("1m", "1m"), ("2m",), ()):
        with pytest.raises(ValueError):
            refresh_once(spark, warehouse, tiers=bad)
    with pytest.raises(ValueError, match="vacuum_keep_last"):
        refresh_once(spark, warehouse, vacuum_keep_last=1)


def _mini_bronze_one(spark):
    import datetime as dt
    return _mini_bronze(spark, [("c", 0, dt.datetime(2024, 1, 1))])


def test_tier_set_growth_triggers_full_rebuild(spark, warehouse):
    """Extending --tiers on an existing consumer must NOT create the
    new tier from the delta's days only — it rebuilds full, so the new
    tier covers ALL historical days."""
    raw = gen_transcripts(spark, n_convs=16, partitions=2)
    b1, b2 = _split_by_time(raw, 2)
    warehouse.append(bronze_transcripts(b1), "transcripts",
                     partition_by=["day"])
    refresh_once(spark, warehouse, tiers=("1m",))
    warehouse.append(bronze_transcripts(b2), "transcripts",
                     partition_by=["day"])
    m = refresh_once(spark, warehouse, tiers=("1m", "1h"))
    assert m["mode"] == "full"
    expected = rollup_all_tiers(
        transcripts_latency(bronze_transcripts(raw)))
    for tier in ("1m", "1h"):
        got = warehouse.read(spark, f"tier_{tier}").drop("day")
        assert_tier_equal(got, expected[tier], tier)
    # and the rebuild re-established incremental maintenance
    warehouse.append(bronze_transcripts(b2.limit(0)), "transcripts")
    assert refresh_once(spark, warehouse,
                        tiers=("1m", "1h"))["mode"] == "incremental"


def test_bronze_emptied_rebuilds_empty_tiers(spark, warehouse):
    """TTL delete of ALL bronze rows: the tiers must be rebuilt empty
    (not keep serving deleted history) and the pipeline must not wedge
    on the next refresh."""
    raw = gen_transcripts(spark, n_convs=8, partitions=2)
    warehouse.append(bronze_transcripts(raw), "transcripts",
                     partition_by=["day"])
    refresh_once(spark, warehouse)
    warehouse.delete_where(spark, "transcripts", "turn_idx >= 0")
    m = refresh_once(spark, warehouse)
    assert m["mode"] == "full"
    for tier in TIERS:
        assert warehouse.read(spark, f"tier_{tier}").count() == 0
    assert warehouse.read(spark, TAILS_TABLE).count() == 0
    # not wedged: new data arrives and refreshes cleanly
    warehouse.append(bronze_transcripts(raw), "transcripts",
                     partition_by=["day"])
    m2 = refresh_once(spark, warehouse)
    # the rewrite was processed by the full rebuild, so the new append
    # is a clean incremental range (merging into the emptied tiers)
    assert m2["mode"] == "incremental"
    expected = rollup_all_tiers(
        transcripts_latency(bronze_transcripts(raw)))
    for tier in TIERS:
        got = warehouse.read(spark, f"tier_{tier}").drop("day")
        assert_tier_equal(got, expected[tier], tier)


def test_duplicate_turn_within_batch_fails_loudly(spark, warehouse):
    import datetime as dt

    t = dt.datetime(2024, 1, 1)
    warehouse.append(
        _mini_bronze(spark, [("c", 0, t)]), "transcripts")
    refresh_once(spark, warehouse)
    dup = [("c", 5, t + dt.timedelta(seconds=50)),
           ("c", 5, t + dt.timedelta(seconds=51))]  # producer retry
    warehouse.append(_mini_bronze(spark, dup), "transcripts")
    with pytest.raises(RuntimeError, match="duplicated turn_idx"):
        refresh_once(spark, warehouse)


def test_vacuum_and_meta_compaction(spark, warehouse, monkeypatch):
    """--vacuum-keep-last bounds the output tables' snapshot logs
    without breaking incremental parity or crash-retry pins; the meta
    log self-compacts past the threshold."""
    from jobs import refresh_job

    monkeypatch.setattr(refresh_job, "META_COMPACT_THRESHOLD", 2)
    raw = gen_transcripts(spark, n_convs=24, partitions=2)
    batches = _split_by_time(raw, 4)
    for b in batches:
        warehouse.append(bronze_transcripts(b), "transcripts",
                         partition_by=["day"])
        refresh_once(spark, warehouse, vacuum_keep_last=2)
    expected = rollup_all_tiers(
        transcripts_latency(bronze_transcripts(raw)))
    for tier in TIERS:
        got = warehouse.read(spark, f"tier_{tier}").drop("day")
        assert_tier_equal(got, expected[tier], tier)
        # bounded: compact+expire keeps at most keep_last snapshots
        assert len(warehouse.snapshots(f"tier_{tier}")) <= 2
    assert len(warehouse.snapshots(refresh_job.META_TABLE)) <= 2


def test_incremental_latency_carry_in(spark):
    import datetime as dt

    t = dt.datetime(2024, 3, 1)
    prior = _mini_bronze(spark, [("c", 0, t),
                                 ("c", 1, t + dt.timedelta(seconds=7))])
    delta = _mini_bronze(spark, [
        ("c", 2, t + dt.timedelta(seconds=19)),   # 12s after the tail
        ("d", 0, t + dt.timedelta(seconds=100)),  # brand-new conv
    ])
    tails = R.conv_tails(prior)
    got = {(r.conv_id, r.ts.second): r.value
           for r in R.incremental_latency(delta, tails).collect()}
    assert got[("c", 19)] == pytest.approx(12.0)
    assert got[("d", 40)] is None  # 100s -> :01:40; global first turn


# ----------------------------------------------------- realtime_splice
def _hour_points(spark, rows):
    """rows: (conv_id, sec_offset_from_aligned_base, value); the base
    1699999200 is exactly on the hour grid so watermarks at base + k·3600
    are 1h-bucket-aligned."""
    return spark.createDataFrame(
        [(c, 1699999200 + s, float(v)) for c, s, v in rows],
        "conv_id string, epoch long, value double",
    ).select(
        "conv_id",
        F.timestamp_seconds(F.col("epoch")).alias("ts"),
        "value",
    )


def test_realtime_splice_equals_full_recompute(spark):
    from datetime import datetime, timezone

    rows = [("a", i * 700, float(i)) for i in range(20)]
    rows += [("b", i * 1100 + 50, 2.0 * i) for i in range(15)]
    pts = _hour_points(spark, rows)
    wm = datetime.fromtimestamp(1699999200 + 2 * 3600,
                                tz=timezone.utc).replace(tzinfo=None)
    tier = rollup_points(pts.where(F.col("ts") < F.lit(wm)), "1h")
    got = R.realtime_splice(tier, pts, "1h", wm)
    assert_tier_equal(got, rollup_points(pts, "1h"), "1h")
    # string watermarks parse too
    got2 = R.realtime_splice(tier, pts, "1h", str(wm))
    assert_tier_equal(got2, rollup_points(pts, "1h"), "1h")


def test_realtime_splice_misaligned_watermark_raises(spark):
    from datetime import datetime, timezone

    pts = _hour_points(spark, [("a", 0, 1.0)])
    tier = rollup_points(pts, "1h")
    bad = datetime.fromtimestamp(1699999200 + 1800,
                                 tz=timezone.utc).replace(tzinfo=None)
    with pytest.raises(ValueError, match="not aligned"):
        R.realtime_splice(tier, pts, "1h", bad)
    with pytest.raises(ValueError, match="unknown tier"):
        R.realtime_splice(tier, pts, "7m", bad)
