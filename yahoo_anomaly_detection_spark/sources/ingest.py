"""Bronze ingest: scans, salting, stable ordering, text invariant.

Reference analog: dataset load + fixed splits
(/root/reference/Data/prepare_data.py:3-5, config
/root/reference/Configuration/config_yahoo.yaml:11-19). Splits become
event-time range predicates; stable positional order
(shuffle_train: False, config_yahoo.yaml:19) becomes a deterministic
``(conv_id, turn_idx)`` sort key.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_SALT_BUCKETS = 32


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one driver-testdata parquet table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def with_salt(df: DataFrame, key: str = "conv_id",
              buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Hot-key salt column per the north rule's salted range
    partitioning: ``pmod(hash(key), buckets)`` (SURVEY §4)."""
    return df.withColumn("salt", F.pmod(F.hash(F.col(key)), F.lit(buckets)))


def bronze_transcripts(df: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS) -> DataFrame:
    """Bronze layer: typed, salted, day-partition column added.

    Partitioning on (day(ts), salt(conv_id)) gives Catalyst partition
    pruning on time-range predicates and breaks hot-conversation skew
    at write time (north rule: salted range partitioning).
    """
    return (
        df.withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("turn_idx", F.col("turn_idx").cast("int"))
        .transform(lambda d: with_salt(d, "conv_id", salt_buckets))
        .withColumn("day", F.to_date("ts"))
    )


def split_by_time(df: DataFrame, train_end: str, val_end: str,
                  ts_col: str = "ts") -> tuple[DataFrame, DataFrame, DataFrame]:
    """train/val/test splits as event-time ranges (reference's three
    DataLoaders, /root/reference/Data/prepare_data.py:4-5)."""
    c = F.col(ts_col)
    return (
        df.where(c < F.lit(train_end).cast("timestamp")),
        df.where(
            (c >= F.lit(train_end).cast("timestamp"))
            & (c < F.lit(val_end).cast("timestamp"))
        ),
        df.where(c >= F.lit(val_end).cast("timestamp")),
    )


def text_invariant_table(df: DataFrame) -> DataFrame:
    """Per-turn text-equality invariant rows (BASELINE input_hint).

    sha2 digest per (conv_id, turn_idx) under stable ordering; two
    datasets are turn-equal iff these tables are equal (verified with
    an anti-join in tests). ``rn`` asserts the stable-order invariant:
    row_number over (conv_id order by turn_idx) must equal turn_idx
    when turn indices are dense from 0.
    """
    from pyspark.sql import Window as W

    w = W.partitionBy("conv_id").orderBy("turn_idx")
    return df.select(
        "conv_id",
        "turn_idx",
        F.sha2(F.col("text"), 256).alias("text_sha"),
        (F.row_number().over(w) - F.lit(1)).alias("rn"),
    )


def events_as_series(df: DataFrame) -> DataFrame:
    """Adapt the driver's ``events`` table (FIXTURES.md F3) to the
    engine's series model: user_id plays conv_id, value is the series."""
    return df.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
