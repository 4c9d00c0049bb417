"""Shared contract suite for the catalog interface.

Every semantic the engine relies on (append commits, full overwrite,
time travel, ANSI/Iceberg DELETE NULL-retention, existence) is
asserted through the INTERFACE only, parameterized over the available
implementations: ``ParquetCatalog`` (always) and ``IcebergCatalog``
(whenever the Iceberg Spark runtime jar is on the classpath — absent
in this sandbox, so those rows skip with a reason). The interface-
parity test runs regardless of the jar, pinning the adapter to the
shim's exact public surface so it cannot drift while unexercised.
"""

import inspect

import pytest

from yahoo_anomaly_detection_spark.sources.catalog import ParquetCatalog
from yahoo_anomaly_detection_spark.sources.iceberg import (
    IcebergCatalog,
    IcebergUnavailableError,
    iceberg_available,
)

CONTRACT_METHODS = ["append", "overwrite_table", "delete_where", "read",
                    "snapshots", "current_snapshot_id", "exists",
                    "expire_snapshots", "compact", "remove_orphan_files",
                    "replace_where", "read_appended", "merge_upsert"]


def test_adapter_interface_matches_shim():
    """IcebergCatalog exposes the shim's exact public call surface.

    Runs without the Iceberg jar: signature drift in the adapter must
    fail CI in this sandbox, not on the first cluster deploy.
    """
    for name in CONTRACT_METHODS:
        shim = inspect.signature(getattr(ParquetCatalog, name))
        adap = inspect.signature(getattr(IcebergCatalog, name))
        assert list(shim.parameters) == list(adap.parameters), name
        for p in shim.parameters.values():
            assert adap.parameters[p.name].default == p.default, (name, p.name)


def test_adapter_refuses_without_runtime(spark):
    """Constructing the adapter without the jar raises the clear error
    (and the availability probe agrees), instead of failing later
    inside a write."""
    if iceberg_available(spark):
        pytest.skip("Iceberg runtime present; refusal path not reachable")
    with pytest.raises(IcebergUnavailableError):
        IcebergCatalog(spark)


@pytest.fixture(params=["parquet", "iceberg"])
def catalog(request, spark, tmp_path):
    if request.param == "parquet":
        return ParquetCatalog(str(tmp_path / "warehouse"))
    if not iceberg_available(spark):
        pytest.skip("Iceberg Spark runtime jar not on classpath")
    return IcebergCatalog(spark, catalog="local",
                          namespace=f"t{tmp_path.name.lower()}")


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, day string, v double")


def test_contract_append_and_read(spark, catalog):
    catalog.append(_df(spark, [(1, "d1", 1.0)]), "t1", partition_by=["day"])
    catalog.append(_df(spark, [(2, "d2", 2.0)]), "t1", partition_by=["day"])
    got = sorted(r.id for r in catalog.read(spark, "t1").collect())
    assert got == [1, 2]
    assert catalog.exists("t1") and not catalog.exists("nope")


def test_contract_time_travel(spark, catalog):
    catalog.append(_df(spark, [(1, "d1", 1.0)]), "t2")
    sid = catalog.current_snapshot_id("t2")
    catalog.append(_df(spark, [(2, "d2", 2.0)]), "t2")
    assert catalog.read(spark, "t2").count() == 2
    old = catalog.read(spark, "t2", snapshot_id=sid)
    assert [r.id for r in old.collect()] == [1]


def test_contract_overwrite(spark, catalog):
    catalog.append(_df(spark, [(1, "d1", 1.0)]), "t3")
    catalog.overwrite_table(_df(spark, [(9, "d9", 9.0)]), "t3")
    assert [r.id for r in catalog.read(spark, "t3").collect()] == [9]


def test_contract_delete_retains_null_predicate_rows(spark, catalog):
    """ANSI / Iceberg DELETE: only predicate=TRUE rows go; NULL rows
    stay — regardless of which physical file a row lives in (two
    separate append commits force two dirs in the shim)."""
    catalog.append(_df(spark, [(1, "d1", 1.0), (2, "d1", None)]), "t4")
    catalog.append(_df(spark, [(3, "d2", 30.0), (4, "d2", None)]), "t4")
    catalog.delete_where(spark, "t4", "v > 5.0")
    got = sorted(r.id for r in catalog.read(spark, "t4").collect())
    assert got == [1, 2, 4]  # 3 deleted; NULL-v rows 2 and 4 retained


def test_contract_expire_snapshots(spark, catalog):
    """expire keeps the newest N snapshots, GCs dead storage, and
    time travel to an expired id fails loudly (Iceberg maintenance
    semantics)."""
    for i in range(3):
        catalog.append(_df(spark, [(i, f"d{i}", float(i))]), "t6",
                       partition_by=["day"])
    old_sid = catalog.snapshots("t6")[0].snapshot_id
    catalog.expire_snapshots("t6", keep_last=1)
    got = sorted(r.id for r in catalog.read(spark, "t6").collect())
    assert got == [0, 1, 2]  # current view untouched
    assert len(catalog.snapshots("t6")) == 1
    with pytest.raises(Exception):
        catalog.read(spark, "t6", snapshot_id=old_sid).collect()
    with pytest.raises(ValueError):
        catalog.expire_snapshots("t6", keep_last=0)


def test_expire_snapshots_gcs_dead_dirs(spark, tmp_path):
    """Shim-specific physical check: unreferenced snap= dirs are
    removed from disk, referenced ones survive."""
    import os
    cat = ParquetCatalog(str(tmp_path / "wh"))
    for i in range(3):
        cat.append(_df(spark, [(i, f"d{i}", float(i))]), "t")
    tdir = tmp_path / "wh" / "t"
    assert sum(1 for n in os.listdir(tdir) if n.startswith("snap=")) == 3
    out = cat.expire_snapshots("t", keep_last=1)
    assert out["expired_snapshots"] == 2
    assert out["removed_dirs"] == 0  # last append references all 3 dirs
    # compact first, then expire: now only the compacted dir is live
    cat.compact(spark, "t")
    out = cat.expire_snapshots("t", keep_last=1)
    assert out["removed_dirs"] == 3
    assert sum(1 for n in os.listdir(tdir) if n.startswith("snap=")) == 1
    assert cat.read(spark, "t").count() == 3


def test_contract_compact_collapses_commits(spark, catalog):
    """compact rewrites the current view into one commit; reads are
    value-identical and (shim) the snapshot's path list collapses."""
    for i in range(4):
        catalog.append(_df(spark, [(i, f"d{i % 2}", float(i))]), "t7",
                       partition_by=["day"])
    before = sorted((r.id, r.day, r.v)
                    for r in catalog.read(spark, "t7").collect())
    catalog.compact(spark, "t7", partition_by=["day"])
    after = sorted((r.id, r.day, r.v)
                   for r in catalog.read(spark, "t7").collect())
    assert after == before
    if isinstance(catalog, ParquetCatalog):
        assert len(catalog.snapshots("t7")[-1].paths) == 1


def test_contract_replace_where(spark, catalog):
    """Dynamic predicate overwrite: rows matching the predicate are
    replaced by the new frame in ONE commit; non-matching rows —
    including NULL-predicate rows — carry over untouched."""
    catalog.append(_df(spark, [(1, "d1", 1.0), (2, "d2", 2.0)]), "t8",
                   partition_by=["day"])
    catalog.append(_df(spark, [(3, "d2", 3.0), (4, None, 4.0)]), "t8")
    n0 = len(catalog.snapshots("t8"))
    catalog.replace_where(spark, _df(spark, [(9, "d2", 9.0)]), "t8",
                          "day = 'd2'")
    got = sorted((r.id, r.day) for r in catalog.read(spark, "t8").collect())
    # 2 and 3 replaced by 9; NULL-day row 4 retained; d1 untouched
    assert got == [(1, "d1"), (4, None), (9, "d2")]
    assert len(catalog.snapshots("t8")) == n0 + 1  # atomic: ONE commit
    with pytest.raises(FileNotFoundError):
        catalog.replace_where(spark, _df(spark, [(1, "d", 1.0)]),
                              "never_created", "day = 'd'")


def test_contract_merge_upsert(spark, catalog):
    """Keyed upsert (MERGE INTO ... UPDATE SET * / INSERT *): matched
    target rows take the source's values, unmatched source rows
    insert, everything else carries over — in ONE atomic commit, with
    time travel to the pre-merge view intact."""
    catalog.append(_df(spark, [(1, "d1", 1.0), (2, "d2", 2.0)]), "t10",
                   partition_by=["day"])
    pre = catalog.current_snapshot_id("t10")
    n0 = len(catalog.snapshots("t10"))
    catalog.merge_upsert(spark, _df(spark, [(2, "d2", 20.0),
                                            (3, "d3", 3.0)]),
                         "t10", key_cols=["id"])
    got = sorted((r.id, r.v) for r in catalog.read(spark, "t10").collect())
    assert got == [(1, 1.0), (2, 20.0), (3, 3.0)]
    assert len(catalog.snapshots("t10")) == n0 + 1  # atomic: ONE commit
    old = sorted((r.id, r.v)
                 for r in catalog.read(spark, "t10", pre).collect())
    assert old == [(1, 1.0), (2, 2.0)]
    with pytest.raises(FileNotFoundError):
        catalog.merge_upsert(spark, _df(spark, [(1, "d", 1.0)]),
                             "never_created", key_cols=["id"])


def test_contract_merge_upsert_null_keys_never_match(spark, catalog):
    """ON t.k = s.k is plain equality: a NULL-key source row is an
    insert, a NULL-key target row always survives (SQL MERGE)."""
    catalog.append(_df(spark, [(None, "d0", 0.5), (1, "d1", 1.0)]), "t11")
    catalog.merge_upsert(spark, _df(spark, [(None, "dX", 7.0),
                                            (1, "d1", 10.0)]),
                         "t11", key_cols=["id"])
    got = sorted((r.id, r.day, r.v)
                 for r in catalog.read(spark, "t11").collect()
                 if r.id is not None)
    assert got == [(1, "d1", 10.0)]
    nulls = sorted(r.day for r in catalog.read(spark, "t11").collect()
                   if r.id is None)
    assert nulls == ["d0", "dX"]  # both NULL-key rows present


def test_contract_read_appended(spark, catalog):
    """Incremental scan: rows appended in (since, until]; since=None
    reads the full view; a non-append snapshot in the range raises."""
    catalog.append(_df(spark, [(1, "d1", 1.0)]), "t9")
    s1 = catalog.current_snapshot_id("t9")
    catalog.append(_df(spark, [(2, "d2", 2.0)]), "t9")
    s2 = catalog.current_snapshot_id("t9")
    catalog.append(_df(spark, [(3, "d3", 3.0)]), "t9")

    inc = catalog.read_appended(spark, "t9", s1)
    assert sorted(r.id for r in inc.collect()) == [2, 3]
    window = catalog.read_appended(spark, "t9", s1, until_snapshot_id=s2)
    assert [r.id for r in window.collect()] == [2]
    assert catalog.read_appended(spark, "t9", s2, s2).count() == 0
    full = catalog.read_appended(spark, "t9", None)
    assert sorted(r.id for r in full.collect()) == [1, 2, 3]

    catalog.delete_where(spark, "t9", "id = 1")
    with pytest.raises(Exception):
        # overwrite/delete in the range: "rows added since" undefined
        catalog.read_appended(spark, "t9", s1).collect()


def test_contract_snapshot_log_grows(spark, catalog):
    catalog.append(_df(spark, [(1, "d1", 1.0)]), "t5")
    n0 = len(catalog.snapshots("t5"))
    catalog.append(_df(spark, [(2, "d2", 2.0)]), "t5")
    snaps = catalog.snapshots("t5")
    assert len(snaps) == n0 + 1
    assert snaps[-1].parent_id == snaps[-2].snapshot_id
    assert catalog.current_snapshot_id("t5") == snaps[-1].snapshot_id
