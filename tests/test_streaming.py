"""Streaming 1m rollup: batch parity + late-data watermark behavior."""

import os
import time

import pytest
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.operators.rollup import (
    rollup_cascade,
    rollup_points,
)
from yahoo_anomaly_detection_spark.streaming.rollup_stream import (
    POINTS_DDL,
    read_point_stream,
    start_stream_to_parquet,
    stream_rollup_1m,
)


def _mk_points(spark, rows):
    return spark.createDataFrame(
        [(c, f"2024-01-01 00:{m:02d}:{s:02d}", v) for c, m, s, v in rows],
        "conv_id string, ts string, value double",
    ).select("conv_id", F.col("ts").cast("timestamp").alias("ts"), "value")


def test_stream_rollup_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src)

    early = [("a", 0, 1, 10.0), ("a", 0, 30, 20.0), ("b", 1, 5, 5.0),
             ("a", 1, 10, 30.0), ("b", 1, 50, 7.0)]
    # a second file far enough ahead that the watermark closes the
    # early buckets (watermark = 10 min; 00:30 >> 00:01 + 10 min)
    flush = [("a", 30, 0, 1.0), ("b", 31, 0, 2.0)]

    _mk_points(spark, early).coalesce(1).write.mode("append").parquet(src)
    stream = stream_rollup_1m(read_point_stream(spark, src), "10 minutes")
    q = start_stream_to_parquet(stream, out, ckpt, trigger_secs=1)
    try:
        q.processAllAvailable()
        _mk_points(spark, flush).coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    # the early buckets must be finalized; the 00:30/00:31 ones may
    # still sit in state — compare only finalized buckets against the
    # batch rollup of the same input
    batch = rollup_points(_mk_points(spark, early), "1m")
    j = batch.alias("b").join(
        got.alias("s"), on=["conv_id", "bucket_start"], how="left"
    )
    rows = j.select(
        "conv_id", "bucket_start",
        F.col("b.cnt").alias("bc"), F.col("s.cnt").alias("sc"),
        F.col("b.mean").alias("bm"), F.col("s.mean").alias("sm"),
        F.col("b.std").alias("bs"), F.col("s.std").alias("ss"),
    ).collect()
    assert rows, "no buckets compared"
    for r in rows:
        assert r["sc"] == r["bc"], r
        assert abs(r["sm"] - r["bm"]) < 1e-12, r
        assert abs(r["ss"] - r["bs"]) < 1e-12, r

    # upper tiers recombine from the streamed tier unchanged
    t1h = rollup_cascade(
        got.select("conv_id", "bucket_start", "cnt", "vcnt", "sum",
                   "sum_sq", "min", "max"), "1h"
    )
    assert t1h.where(F.col("cnt") > 0).count() >= 2


def test_stream_resumes_from_checkpoint(spark, tmp_path):
    src = str(tmp_path / "src2")
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    os.makedirs(src)
    _mk_points(spark, [("c", 0, 1, 1.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    s1 = stream_rollup_1m(read_point_stream(spark, src), "5 minutes")
    q1 = start_stream_to_parquet(s1, out, ckpt)
    q1.processAllAvailable()
    q1.stop()
    # restart from the same checkpoint; new data triggers finalization
    _mk_points(spark, [("c", 20, 0, 2.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    s2 = stream_rollup_1m(read_point_stream(spark, src), "5 minutes")
    q2 = start_stream_to_parquet(s2, out, ckpt)
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out)
    assert got.where("conv_id = 'c'").count() >= 1
