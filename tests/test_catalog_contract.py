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
                    "snapshots", "current_snapshot_id", "exists"]


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


def test_contract_snapshot_log_grows(spark, catalog):
    catalog.append(_df(spark, [(1, "d1", 1.0)]), "t5")
    n0 = len(catalog.snapshots("t5"))
    catalog.append(_df(spark, [(2, "d2", 2.0)]), "t5")
    snaps = catalog.snapshots("t5")
    assert len(snaps) == n0 + 1
    assert snaps[-1].parent_id == snaps[-2].snapshot_id
    assert catalog.current_snapshot_id("t5") == snaps[-1].snapshot_id
