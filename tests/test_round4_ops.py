"""Round-4 operator tests: ANSI/Iceberg NULL-predicate DELETE
semantics, harness-only guard on the orphan-RDD sweep, connected-
components hygiene (max_iter validation, per-round block release,
reliable-checkpoint mode), two-phase as-of join, bounded top-k per
stratum, and sketch percentiles."""

import pytest
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark import caching
from yahoo_anomaly_detection_spark.operators import dedup
from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog


@pytest.fixture()
def catalog(tmp_path):
    return ParquetCatalog(str(tmp_path / "warehouse"))


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "doc_a long, doc_b long")


# ------------------------- DELETE with NULL-predicate rows (ADVICE)
def test_delete_where_retains_null_predicate_rows(spark, catalog):
    """ANSI / Iceberg DELETE removes only predicate=TRUE rows; rows
    where the predicate evaluates NULL survive — and must survive
    REGARDLESS of whether their data dir was rewritten (it contained
    TRUE matches) or carried over untouched (it did not). The old
    ``NOT (p)`` rewrite filter dropped NULL rows from rewritten dirs
    only, making survival depend on physical layout."""
    # dir 1: a TRUE match + a NULL row  -> rewritten
    catalog.append(
        spark.createDataFrame(
            [(1, 5.0), (2, None)], "id long, v double"
        ),
        "t",
    )
    # dir 2: a FALSE row + a NULL row   -> untouched (no TRUE match)
    catalog.append(
        spark.createDataFrame(
            [(3, 50.0), (4, None)], "id long, v double"
        ),
        "t",
    )
    catalog.delete_where(spark, "t", "v < 10")
    snap = catalog.snapshots("t")[-1]
    assert snap.summary["rewritten_dirs"] == 1
    assert snap.summary["pruned_dirs"] == 1
    kept = sorted(r["id"] for r in catalog.read(spark, "t").collect())
    # only id=1 (v=5, predicate TRUE) is deleted; both NULL rows live
    assert kept == [2, 3, 4]


# --------------------------------- orphan-RDD sweep guard (ADVICE)
def test_release_orphan_rdds_refuses_with_live_registry(spark):
    df = spark.range(10)
    caching.materialize(df)
    try:
        with pytest.raises(RuntimeError, match="registered cache"):
            caching.release_orphan_rdds(spark)
    finally:
        caching.release_all()
    # registry drained -> sweep is allowed again
    caching.release_orphan_rdds(spark)


# ------------------------------------ connected-components hygiene
def test_cc_max_iter_zero_raises(spark):
    with pytest.raises(ValueError, match="max_iter"):
        dedup.connected_components(_pairs_df(spark, [(1, 2)]), max_iter=0)


def test_cc_releases_previous_round_blocks(spark):
    """After a multi-round CC run, only the FINAL round's checkpoint
    blocks (plus the registered edges cache) may remain persisted —
    earlier rounds' localCheckpoint RDDs must have been unpersisted
    as the loop advanced (ADVICE: repeated library calls were
    accumulating block-manager memory for the session lifetime)."""
    caching.release_all()
    caching.release_orphan_rdds(spark)  # clean slate
    edges = [(i, i + 1) for i in range(12)]  # ~11 propagation rounds
    stats = {}
    cc = dedup.connected_components(_pairs_df(spark, edges), stats=stats)
    got = {r["doc_id"]: r["cluster"] for r in cc.collect()}
    assert got == {i: 0 for i in range(13)}
    assert stats["rounds"] >= 10
    n_persistent = len(dedup._persistent_rdd_ids(spark))
    # edges cache + final-round checkpoint blocks only — NOT one RDD
    # per round (which would be >= stats["rounds"])
    assert n_persistent <= 3, n_persistent
    caching.release_all()
    caching.release_orphan_rdds(spark)


def test_cc_reliable_requires_checkpoint_dir(spark):
    # runs BEFORE test_cc_reliable_checkpoint (definition order):
    # the session has no checkpoint dir yet
    if not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty():
        pytest.skip("checkpoint dir already set in this session")
    with pytest.raises(RuntimeError, match="setCheckpointDir"):
        dedup.connected_components(
            _pairs_df(spark, [(1, 2)]), reliable=True
        )


def test_cc_reliable_checkpoint(spark, tmp_path):
    """reliable=True commits each round to the configured checkpoint
    dir (survives executor loss on a real cluster) and still returns
    the same components with truncated lineage: the returned plan
    reads the checkpointed RDD, not the round-k join tree."""
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    edges = [(1, 2), (2, 3), (3, 4), (10, 11)]
    cc = dedup.connected_components(_pairs_df(spark, edges), reliable=True)
    got = {r["doc_id"]: r["cluster"] for r in cc.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    # reliable checkpoint files were actually written
    ckpt_files = list((tmp_path / "ckpt").rglob("part-*"))
    assert ckpt_files, "no reliable checkpoint files on disk"
    # lineage truncation: the final plan is a scan of the checkpointed
    # RDD — the iterative join/aggregate subtree is gone
    plan = cc._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan, plan
    caching.release_all()
    caching.release_orphan_rdds(spark)
