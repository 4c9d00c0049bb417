"""Multimodal column plumbing: opaque binary payloads + typed
metadata, with decode/feature-extraction as Arrow-batched pandas UDFs.

Training-data-pipeline component. Image/audio codecs are not in this
sandbox, so the DECODE step is a clearly-marked deterministic fake
(md5-derived bytes) — the Spark-side plumbing (binary schema, Arrow
batch shape, ``mapInPandas`` signature, partition behavior) is real
and oracle-checked. A production deployment swaps
:func:`_decode_batch` — the ONE decode call site every UDF here goes
through — for PIL/ffmpeg decoding of the same Arrow batch.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_R = 4


def attach_payload(docs: DataFrame) -> DataFrame:
    """Attach a deterministic 16-byte fake image payload (md5 of the
    text) as an opaque ``binary`` column — the schema/partitioning
    pattern for any multimodal blob column."""
    return docs.select(
        "doc_id",
        "text",
        F.unhex(F.md5(F.col("text"))).alias("payload"),
        F.lit("image/fake").alias("mime"),
    )


def attach_payload_meta(docs: DataFrame) -> DataFrame:
    """Typed metadata columns beside the opaque payload: byte length
    plus fake decoded dimensions derived from the payload header
    (first/second byte — a stand-in for a real image-header parse)."""
    h = F.md5(F.col("text"))
    return docs.select(
        "doc_id",
        F.length(F.unhex(h)).alias("n_bytes"),
        F.conv(F.substring(h, 1, 2), 16, 10).cast("int").alias("width"),
        F.conv(F.substring(h, 3, 2), 16, 10).cast("int").alias("height"),
    )


_META_SQL = """
SELECT doc_id,
       octet_length(unhex(md5(text))) AS n_bytes,
       CAST(concat('0x', substr(md5(text), 1, 2)) AS INT) AS width,
       CAST(concat('0x', substr(md5(text), 3, 2)) AS INT) AS height
FROM documents
"""


FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("mean_byte", T.DoubleType(), True),
        T.StructField("max_byte", T.IntegerType(), True),
        T.StructField("min_byte", T.IntegerType(), True),
    ]
)


PAYLOAD_BYTES = 16


def _decode_batch(payloads) -> np.ndarray:
    """STUB batch decode → (n, PAYLOAD_BYTES) uint8 pixel matrix —
    the single decode call site of every UDF in this module, and the
    production swap point (real code decodes each payload with
    PIL/ffmpeg here, or raises
    ``NotImplementedError("PIL/ffmpeg not available in sandbox")``).

    The deterministic fake interprets the payload bytes as flat
    grayscale pixels so the downstream feature math is real. The
    explicit width matters: a zero-row Arrow batch reshapes cleanly
    to (0, 16) where ``reshape(n, -1)`` would raise, and a ragged
    payload fails loudly instead of silently misaligning rows."""
    buf = b"".join(bytes(p) for p in payloads)
    return np.frombuffer(buf, dtype=np.uint8).reshape(
        len(payloads), PAYLOAD_BYTES
    )


def extract_features(with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the binary column —
    the ``mapInPandas`` shape for decode/resize/frame-sample at scale
    (one Python worker per partition, Arrow record batches, no
    per-row overhead)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # columnar decode (see _decode_batch): one (n, 16) matrix,
            # then three vectorized reductions — no per-row Python
            # (was ~20s/500k docs as list comprehensions, now
            # sub-second)
            px = _decode_batch(pdf["payload"])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "mean_byte": np.round(
                        px.sum(axis=1, dtype=np.float64) / px.shape[1], _R
                    ),
                    "max_byte": px.max(axis=1).astype("int32"),
                    "min_byte": px.min(axis=1).astype("int32"),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        fn, schema=FEATURES_SCHEMA
    )


_FEATURES_SQL = """
WITH px AS (
    SELECT doc_id,
           list_transform(generate_series(0, 15),
               i -> CAST(concat('0x', substr(md5(text), i * 2 + 1, 2))
                         AS INT)) AS v
    FROM documents
)
SELECT doc_id,
       round(CAST(list_sum(v) AS DOUBLE) / 16, 4) AS mean_byte,
       CAST(list_max(v) AS INT) AS max_byte,
       CAST(list_min(v) AS INT) AS min_byte
FROM px
"""


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("p00", T.DoubleType(), True),
        T.StructField("p01", T.DoubleType(), True),
        T.StructField("p10", T.DoubleType(), True),
        T.StructField("p11", T.DoubleType(), True),
    ]
)


def resize_pool2x2(with_payload: DataFrame) -> DataFrame:
    """2×2 average-pool 'resize' of the decoded 4×4 grayscale image —
    the mapInPandas shape for real image resizing at scale (swap the
    pooling for PIL's resize on real payloads; batch shape, schema,
    and partition behavior are identical). All math is one numpy
    reshape + mean over the whole Arrow batch. Pool means are sums of
    4 bytes / 4 — exactly representable, so cross-engine rounding is
    exact."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            px = _decode_batch(pdf["payload"]).reshape(len(pdf), 4, 4)
            pool = px.reshape(len(pdf), 2, 2, 2, 2).mean(
                axis=(2, 4), dtype=np.float64
            )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "p00": np.round(pool[:, 0, 0], _R),
                    "p01": np.round(pool[:, 0, 1], _R),
                    "p10": np.round(pool[:, 1, 0], _R),
                    "p11": np.round(pool[:, 1, 1], _R),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        fn, schema=RESIZE_SCHEMA
    )


def _pool_sql(idx: list[int]) -> str:
    terms = " + ".join(f"v[{i + 1}]" for i in idx)  # 1-based lists
    return f"round(({terms}) / 4.0, {_R})"


_RESIZE_SQL = f"""
WITH px AS (
    SELECT doc_id,
           list_transform(generate_series(0, 15),
               i -> CAST(concat('0x', substr(md5(text), i * 2 + 1, 2))
                         AS INT)) AS v
    FROM documents
)
SELECT doc_id,
       {_pool_sql([0, 1, 4, 5])} AS p00,
       {_pool_sql([2, 3, 6, 7])} AS p01,
       {_pool_sql([8, 9, 12, 13])} AS p10,
       {_pool_sql([10, 11, 14, 15])} AS p11
FROM px
"""


FRAMES_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("frame_mean", T.DoubleType(), True),
    ]
)


def frame_sample(with_payload: DataFrame, stride: int = 2) -> DataFrame:
    """Strided frame sampling: the 16-byte payload is a 4-frame fake
    video (4 bytes/frame); emit every ``stride``-th frame's mean —
    the 1→k row-explosion batch shape of real video frame sampling
    (ffmpeg keyframe extraction slots into the same UDF body)."""
    frames = list(range(0, 4, stride))

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            px = _decode_batch(pdf["payload"]).reshape(n, 4, 4)
            means = px[:, frames, :].mean(axis=2, dtype=np.float64)
            yield pd.DataFrame(
                {
                    "doc_id": np.repeat(
                        pdf["doc_id"].to_numpy(dtype="int64"), len(frames)
                    ),
                    "frame_idx": np.tile(
                        np.array(frames, dtype="int32"), n
                    ),
                    "frame_mean": np.round(means.ravel(), _R),
                }
            )

    return with_payload.select("doc_id", "payload").mapInPandas(
        fn, schema=FRAMES_SCHEMA
    )


_FRAME_SQL = """
WITH px AS (
    SELECT doc_id,
           list_transform(generate_series(0, 15),
               i -> CAST(concat('0x', substr(md5(text), i * 2 + 1, 2))
                         AS INT)) AS v
    FROM documents
),
f AS (SELECT doc_id, unnest([0, 2]) AS fi, v FROM px)
SELECT doc_id, CAST(fi AS INT) AS frame_idx,
       round((v[fi * 4 + 1] + v[fi * 4 + 2] + v[fi * 4 + 3]
              + v[fi * 4 + 4]) / 4.0, 4) AS frame_mean
FROM f
"""


ORACLE_SQL = {
    "multimodal_meta": _META_SQL,
    "multimodal_features": _FEATURES_SQL,
    "multimodal_resize": _RESIZE_SQL,
    "multimodal_frames": _FRAME_SQL,
}
