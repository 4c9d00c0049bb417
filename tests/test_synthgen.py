"""Transcripts generator: determinism, schema, skew, label alignment."""

import numpy as np
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.synthgen import (
    gen_anomaly_labels,
    gen_transcripts,
)


def test_schema_and_determinism(spark):
    df1 = gen_transcripts(spark, n_convs=20, seed=42, partitions=4)
    df2 = gen_transcripts(spark, n_convs=20, seed=42, partitions=7)  # different parallelism
    assert [f.name for f in df1.schema.fields] == [
        "conv_id", "turn_idx", "role", "text", "tool", "ts",
    ]
    p1 = df1.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    p2 = df2.toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert p1.equals(p2), "generation must be partitioning-invariant"
    # different seed ⇒ different data
    p3 = gen_transcripts(spark, n_convs=20, seed=1, partitions=4).toPandas()
    assert not p1["text"].equals(
        p3.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)["text"]
    )


def test_turn_idx_dense_and_ts_monotone(spark):
    pdf = gen_transcripts(spark, n_convs=15, seed=42).toPandas()
    for _, g in pdf.groupby("conv_id"):
        g = g.sort_values("turn_idx")
        assert (g["turn_idx"].to_numpy() == np.arange(len(g))).all()
        ts = g["ts"].to_numpy()
        assert (ts[1:] > ts[:-1]).all()


def test_hot_conversations_skew(spark):
    cnt = (
        gen_transcripts(spark, n_convs=200, seed=42, hot_every=100)
        .groupBy("conv_id").count().toPandas()
    )
    med = cnt["count"].median()
    assert cnt["count"].max() >= 25 * med, "hot conversations must exist"


def test_labels_align_with_buckets(spark):
    turns = gen_transcripts(spark, n_convs=50, seed=42)
    labels = gen_anomaly_labels(spark, n_convs=50, seed=42)
    lab = labels.toPandas()
    assert len(lab) > 0
    # every labeled bucket must contain at least one turn of that conv
    buckets = (
        turns.select(
            "conv_id", F.date_trunc("minute", "ts").alias("bucket_start")
        ).distinct()
    )
    missing = (
        labels.join(buckets, ["conv_id", "bucket_start"], "left_anti").count()
    )
    assert missing == 0
