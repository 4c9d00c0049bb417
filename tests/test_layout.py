"""Z-order clustering + zone-map pruning: bit-exact interleave vs a
python replica, and the layout's measurable objective — 2-D box
queries must prune dramatically better than a linear single-column
sort."""

import pytest
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.operators import layout


def _interleave_py(vals, bits):
    z = 0
    m = len(vals)
    for i, v in enumerate(vals):
        for b in range(bits):
            z |= ((v >> b) & 1) << (b * m + i)
    return z


def _grid(spark, n=64):
    rows = [(x, y) for x in range(n) for y in range(n)]
    return spark.createDataFrame(rows, "x long, y long")


def test_zvalue_matches_python_interleave(spark):
    """On an integer grid whose min/max scaling is exact (0..2^bits-1
    inputs at matching bits), the Z-key equals the textbook
    bit-interleave."""
    bits = 6
    df = layout.zvalue(_grid(spark, 1 << bits), ["x", "y"], bits=bits)
    for r in df.orderBy("x", "y").limit(500).collect():
        assert r._z == _interleave_py([r.x, r.y], bits), (r.x, r.y)


def test_zvalue_null_and_constant_columns(spark):
    df = spark.createDataFrame(
        [(None, 5.0), (3.0, 5.0), (7.0, 5.0)], "a double, c double")
    out = layout.zvalue(df, ["a", "c"], bits=4).collect()
    z = {r.a: r._z for r in out}
    assert z[None] == 0          # NULL -> curve origin
    assert z[3.0] == 0           # min of a -> 0; c constant -> 0
    assert z[7.0] == _interleave_py([15, 0], 4)


def test_zvalue_rejects_bad_params(spark):
    df = spark.createDataFrame([(1.0,)], "a double")
    with pytest.raises(ValueError):
        layout.zvalue(df, [], bits=8)
    with pytest.raises(ValueError):
        layout.zvalue(df, ["a"], bits=64)


def test_zorder_prunes_2d_boxes_linear_does_not(spark):
    """The objective: on a 64x64 uniform grid split into 16
    partitions, a small 2-D box prunes >= 50% of partitions under
    Z-order on BOTH columns, while a linear sort on x alone prunes
    ~nothing for a y-box. Also: pruning is sound (surviving
    partitions hold every matching row)."""
    df = _grid(spark, 64)
    parts = 16
    box = {"x": (8.0, 15.0), "y": (8.0, 15.0)}

    zed = layout.zorder_repartition(df, ["x", "y"], parts, bits=6)
    zmap_z = layout.zonemap(zed, ["x", "y"])
    prune_z = layout.pruning_ratio(zmap_z, box)

    lin = df.repartitionByRange(parts, "x").sortWithinPartitions("x")
    zmap_l = layout.zonemap(lin, ["x", "y"])
    # x-sorted layout cannot skip on a y-only predicate
    assert layout.pruning_ratio(zmap_l, {"y": (8.0, 15.0)}) == 0.0
    # the same 2-D box: x-linear prunes on x only
    prune_l = layout.pruning_ratio(zmap_l, box)

    assert prune_z >= 0.5, f"z-order pruned only {prune_z:.2f}"
    assert prune_z > prune_l, (prune_z, prune_l)

    # soundness: rows inside the box only live in surviving partitions
    surviving = {
        r.pid for r in zmap_z.where(
            (F.col("max_x") >= 8) & (F.col("min_x") <= 15)
            & (F.col("max_y") >= 8) & (F.col("min_y") <= 15)
        ).collect()
    }
    in_box = (zed.withColumn("pid", F.spark_partition_id())
              .where((F.col("x").between(8, 15))
                     & (F.col("y").between(8, 15)))
              .select("pid").distinct().collect())
    assert {r.pid for r in in_box} <= surviving


def test_zorder_repartition_single_range_exchange(spark):
    from tests.conftest import count_exchanges
    df = _grid(spark, 16)
    assert count_exchanges(
        layout.zorder_repartition(df, ["x", "y"], 4, bits=4)) == 1


def test_zvalue_timestamp_column(spark):
    import datetime as dt
    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(t0, 1.0), (t0 + dt.timedelta(hours=1), 2.0)],
        "ts timestamp, v double")
    out = {r.v: r._z for r in
           layout.zvalue(df, ["ts", "v"], bits=8).collect()}
    assert out[1.0] == 0
    assert out[2.0] == _interleave_py([255, 255], 8)


# ------------------------------------------------------ bucketed joins
def _bt_df(spark, n, seed):
    import pyspark.sql.functions as F
    return (spark.range(n)
            .select((F.col("id") % 97).alias("conv_id"),
                    (F.col("id") * seed % 1001).alias("v")))


def test_bucketed_join_zero_exchange(spark, tmp_path):
    """Two tables bucketed identically on the join key must plan a
    SortMergeJoin with NO exchange on either side — the write-time
    shuffle amortizes over every later join."""
    import re

    from conftest import plan_str
    from yahoo_anomaly_detection_spark.operators import layout

    layout.write_bucketed(_bt_df(spark, 5000, 3), "bt_a",
                          ["conv_id"], 8, ["conv_id"],
                          str(tmp_path / "bt_a"))
    layout.write_bucketed(_bt_df(spark, 4000, 7), "bt_b",
                          ["conv_id"], 8, ["conv_id"],
                          str(tmp_path / "bt_b"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = (spark.table("bt_a").join(spark.table("bt_b"), "conv_id")
             .groupBy("conv_id")
             .agg(F.count(F.lit(1)).alias("n")))
        plan = plan_str(j)
        assert "SortMergeJoin" in plan, plan
        assert not re.search(
            r"Exchange hashpartitioning\(conv_id", plan), plan
        # row parity vs the shuffled plan on plain frames
        exp = (_bt_df(spark, 5000, 3)
               .join(_bt_df(spark, 4000, 7), "conv_id")
               .groupBy("conv_id").agg(F.count(F.lit(1)).alias("n")))
        assert sorted((r.conv_id, r.n) for r in j.collect()) == \
            sorted((r.conv_id, r.n) for r in exp.collect())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_one_sided_bucketed_join_shuffles_probe_only(spark, tmp_path):
    """Joining a bucketed table to a plain relation shuffles ONLY
    the plain side into the bucketed distribution."""
    import re

    from conftest import plan_str
    from yahoo_anomaly_detection_spark.operators import layout

    layout.write_bucketed(_bt_df(spark, 5000, 3), "bt_c",
                          ["conv_id"], 8, ["conv_id"],
                          str(tmp_path / "bt_c"))
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        probe = _bt_df(spark, 4000, 7)
        plan = plan_str(spark.table("bt_c").join(probe, "conv_id"))
        assert len(re.findall(
            r"Exchange hashpartitioning\(conv_id", plan)) == 1, plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS bt_c")
