"""Catalog snapshots, TTL eviction, checkpoint resume, lineage."""

from datetime import datetime

import pandas as pd
import pytest

from yahoo_anomaly_detection_spark.operators.checkpoint import (
    LINEAGE_TABLE,
    CheckpointedRun,
)
from yahoo_anomaly_detection_spark.operators.retention import (
    cutoff_for,
    evict_tier,
    verify_evicted,
    verify_survivors,
)
from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog


@pytest.fixture()
def catalog(tmp_path):
    return ParquetCatalog(str(tmp_path / "warehouse"))


def _tier_df(spark, days):
    rows = [
        ("c1", datetime(2025, 1, d, h), float(d * 24 + h))
        for d in days
        for h in (0, 12)
    ]
    return spark.createDataFrame(rows, "conv_id string, bucket_start timestamp, mean double")


def test_snapshot_append_and_time_travel(spark, catalog):
    s1 = catalog.append(_tier_df(spark, [1]), "tier_1d")
    s2 = catalog.append(_tier_df(spark, [2]), "tier_1d")
    assert catalog.read(spark, "tier_1d", s1).count() == 2
    assert catalog.read(spark, "tier_1d", s2).count() == 4
    assert catalog.read(spark, "tier_1d").count() == 4
    assert catalog.current_snapshot_id("tier_1d") == s2


def test_ttl_eviction_and_verification(spark, catalog):
    catalog.append(_tier_df(spark, [1, 5, 10, 20]), "tier_1m")
    before = catalog.read(spark, "tier_1m")
    now = datetime(2025, 1, 21)
    retention = {"1m": 7 * 86400}
    cutoff = cutoff_for("1m", now, retention)
    evict_tier(catalog, spark, "tier_1m", "1m", now, retention)
    after = catalog.read(spark, "tier_1m")
    assert verify_evicted(after, cutoff) == 0
    assert verify_survivors(before, after, cutoff) == 0
    assert after.count() == 2  # cutoff 2025-01-14: only day 20 survives (2 rows)


def test_checkpoint_resume_skips_done_units(spark, catalog):
    calls = []

    def work(day):
        def fn():
            calls.append(day)
            df = _tier_df(spark, [day])
            catalog.append(df, "tier_out")
            return df

        return fn

    run1 = CheckpointedRun(catalog, spark, "run-1")
    for d in (1, 2):
        run1.unit("rollup_1m", f"day={d}", work(d), input_snapshot="snap-a")
    assert calls == [1, 2]

    run2 = CheckpointedRun(catalog, spark, "run-1")  # resume same run
    for d in (1, 2, 3):
        run2.unit("rollup_1m", f"day={d}", work(d), input_snapshot="snap-a")
    assert calls == [1, 2, 3], "days 1-2 must be skipped on resume"
    assert run2.skipped == [("rollup_1m", "day=1"), ("rollup_1m", "day=2")]

    lineage = catalog.read(spark, LINEAGE_TABLE).toPandas()
    assert len(lineage) == 3
    assert set(lineage["stage"]) == {"rollup_1m"}
    assert (lineage["row_count"] == 2).all()
    assert (lineage["input_snapshot"] == "snap-a").all()


def test_delete_where_creates_new_snapshot(spark, catalog):
    s1 = catalog.append(_tier_df(spark, [1, 2]), "t")
    s2 = catalog.delete_where(spark, "t", "bucket_start < TIMESTAMP '2025-01-02 00:00:00'")
    assert s1 != s2
    assert catalog.read(spark, "t", s1).count() == 4  # time travel sees old data
    assert catalog.read(spark, "t", s2).count() == 2
