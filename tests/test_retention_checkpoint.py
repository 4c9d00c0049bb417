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
    vacuum_tier,
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


def test_vacuum_reclaims_evicted_storage(spark, catalog, tmp_path):
    """evict + vacuum: dead pre-eviction dirs are physically removed,
    the live view is untouched, and the read plan collapses to one
    commit dir."""
    import os

    for days in ([1, 5], [10], [20]):
        catalog.append(_tier_df(spark, days), "tier_1m")
    now = datetime(2025, 1, 21)
    retention = {"1m": 7 * 86400}
    evict_tier(catalog, spark, "tier_1m", "1m", now, retention)
    tdir = tmp_path / "warehouse" / "tier_1m"
    n_dirs_before = sum(
        1 for n in os.listdir(tdir) if n.startswith("snap="))
    assert n_dirs_before >= 4  # 3 appends + eviction rewrite
    out = vacuum_tier(catalog, spark, "tier_1m", keep_last=1)
    assert out["removed_dirs"] >= 3
    assert len(catalog.snapshots("tier_1m")) == 1
    assert len(catalog.snapshots("tier_1m")[-1].paths) == 1  # compacted
    after = catalog.read(spark, "tier_1m")
    assert verify_evicted(after, cutoff_for("1m", now, retention)) == 0
    assert after.count() == 2  # day-20 rows survive


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


def _file_digests(root):
    import hashlib
    import os

    out = {}
    for dirpath, _, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            with open(p, "rb") as fh:
                out[p] = hashlib.sha256(fh.read()).hexdigest()
    return out


def test_eviction_prunes_untouched_dirs(spark, catalog):
    """TTL eviction must NOT rewrite data dirs with no expired rows:
    their files stay byte-identical (the shim's analog of Iceberg's
    metadata-only partition drop)."""
    catalog.append(_tier_df(spark, [1, 5]), "tier_1m")     # all expire
    s_new = catalog.append(_tier_df(spark, [20]), "tier_1m")  # all survive
    new_dir = catalog.snapshots("tier_1m")[-1].summary["added_path"]
    before_files = _file_digests(new_dir)
    now = datetime(2025, 1, 21)
    retention = {"1m": 7 * 86400}
    evict_tier(catalog, spark, "tier_1m", "1m", now, retention)
    snap = catalog.snapshots("tier_1m")[-1]
    assert snap.summary["pruned_dirs"] == 1
    assert snap.summary["rewritten_dirs"] == 1
    assert new_dir in snap.paths, "surviving dir must carry over as-is"
    assert _file_digests(new_dir) == before_files, "survivor dir rewritten"
    after = catalog.read(spark, "tier_1m")
    assert after.count() == 2  # only day-20 rows
    assert verify_evicted(after, cutoff_for("1m", now, retention)) == 0
    # second eviction with nothing to do: metadata-only commit, every
    # dir carries over
    paths_before = list(snap.paths)
    evict_tier(catalog, spark, "tier_1m", "1m", now, retention)
    snap2 = catalog.snapshots("tier_1m")[-1]
    assert snap2.summary["rewritten_dirs"] == 0
    assert sorted(snap2.paths) == sorted(paths_before)
    assert s_new  # time travel to pre-eviction still works
    assert catalog.read(spark, "tier_1m", s_new).count() == 6


def test_delete_where_creates_new_snapshot(spark, catalog):
    s1 = catalog.append(_tier_df(spark, [1, 2]), "t")
    s2 = catalog.delete_where(spark, "t", "bucket_start < TIMESTAMP '2025-01-02 00:00:00'")
    assert s1 != s2
    assert catalog.read(spark, "t", s1).count() == 4  # time travel sees old data
    assert catalog.read(spark, "t", s2).count() == 2
