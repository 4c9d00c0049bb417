"""Gorilla + delta-of-delta codec: exact round-trip (pure python core)."""

import math

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from yahoo_anomaly_detection_spark.operators.codec import (
    decode_any,
    decode_series,
    decode_series_v2,
    encode_series,
    encode_series_scalar,
    encode_series_v2,
)


def roundtrip(ts, vals):
    ts = np.asarray(ts, dtype=np.int64)
    vals = np.asarray(vals, dtype=np.float64)
    for enc, dec in (
        (encode_series, decode_series),
        (encode_series_v2, decode_series_v2),
    ):
        t2, v2 = dec(enc(ts, vals))
        np.testing.assert_array_equal(ts, t2)
        # bit-exact comparison (handles NaN payloads)
        np.testing.assert_array_equal(vals.view(np.uint64), v2.view(np.uint64))
    # magic dispatch picks the right decoder for either format
    t3, v3 = decode_any(encode_series_v2(ts, vals))
    np.testing.assert_array_equal(ts, t3)


def test_empty():
    roundtrip([], [])


def test_single():
    roundtrip([1736000000_000000], [3.14159])


def test_two_points():
    roundtrip([0, 1_000_000], [1.0, 1.0])


def test_constant_values_regular_ts():
    n = 500
    roundtrip(np.arange(n) * 60_000_000, np.full(n, 42.5))


def test_irregular_ts_and_values():
    rng = np.random.default_rng(42)
    n = 1000
    ts = np.cumsum(rng.integers(1, 10_000_000, n))
    vals = rng.normal(100, 25, n)
    roundtrip(ts, vals)


def test_special_floats():
    roundtrip(
        [0, 1, 2, 3, 4, 5],
        [0.0, -0.0, math.inf, -math.inf, math.nan, 1e-308],
    )


def test_negative_dod_buckets():
    # exercise every DoD bucket width
    deltas = [1000, 1000, 1064, 1000, 1256, 1000, 3048, 1000, 10_000_000, 1000]
    ts = np.cumsum([0] + deltas)
    roundtrip(ts, np.arange(len(ts), dtype=float))


def test_batch_encode_byte_identical():
    """encode_batch_v2 must produce byte-identical payloads to the
    per-series encoder for every series in the batch."""
    from yahoo_anomaly_detection_spark.operators.codec import (
        encode_batch_v2,
        encode_series_v2,
    )

    rng = np.random.default_rng(13)
    cases = []
    for n in (0, 1, 2, 3, 7, 60, 301):
        ts = (np.cumsum(rng.integers(1, 10_000_000, n)).astype(np.int64)
              if n else np.array([], np.int64))
        cases.append((ts, rng.normal(0, 1e3, n)))
    cases.append((np.arange(40, dtype=np.int64) * 60_000_000,
                  np.full(40, 7.25)))  # all-zero xors
    cases.append((np.arange(5, dtype=np.int64),
                  np.array([0.0, -0.0, np.inf, np.nan, 1e-308])))
    # empty series in LAST position (start index == total length —
    # regression: the header gather used to index out of bounds) and
    # sandwiched between non-empty ones
    cases.append((np.array([], np.int64), np.array([], np.float64)))
    batch = encode_batch_v2([c[0] for c in cases], [c[1] for c in cases])
    for i, (ts, vals) in enumerate(cases):
        assert batch[i] == encode_series_v2(ts, vals), i
    mid = [cases[3][0], np.array([], np.int64), cases[4][0]]
    midv = [cases[3][1], np.array([], np.float64), cases[4][1]]
    for i, p in enumerate(encode_batch_v2(mid, midv)):
        assert p == encode_series_v2(mid[i], midv[i]), i
    # all-empty batch
    assert encode_batch_v2(
        [np.array([], np.int64)], [np.array([], np.float64)]
    ) == [encode_series_v2(np.array([], np.int64), np.array([], np.float64))]


def test_vectorized_matches_scalar_decode():
    """Both encoders (vectorized shared-window, scalar greedy-window)
    must decode back to the identical series — same format, different
    window policy."""
    rng = np.random.default_rng(11)
    for n in (2, 3, 17, 400):
        ts = np.cumsum(rng.integers(1, 5_000_000, n)).astype(np.int64)
        vals = np.where(rng.random(n) < 0.3, 42.0, rng.normal(0, 1e6, n))
        for enc in (encode_series, encode_series_scalar):
            t2, v2 = decode_series(enc(ts, vals))
            np.testing.assert_array_equal(ts, t2)
            np.testing.assert_array_equal(vals.view(np.uint64),
                                          v2.view(np.uint64))


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=10**9),
            st.floats(allow_nan=True, allow_infinity=True, width=64),
        ),
        min_size=0,
        max_size=200,
    )
)
def test_property_roundtrip(pairs):
    gaps = [p[0] for p in pairs]
    vals = [p[1] for p in pairs]
    ts = np.cumsum(gaps).astype(np.int64) if gaps else np.array([], dtype=np.int64)
    roundtrip(ts, vals)


def test_compression_ratio_on_regular_series():
    """Regular cadence + slowly-varying values must beat raw 16B/point."""
    n = 3600
    ts = np.arange(n, dtype=np.int64) * 1_000_000
    vals = np.round(np.sin(np.arange(n) / 100.0), 2) * 100  # repeating bit patterns
    payload = encode_series(ts, vals)
    assert len(payload) < n * 16 * 0.5, f"{len(payload)} vs raw {n * 16}"


def test_spark_roundtrip(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from yahoo_anomaly_detection_spark.operators.codec import (
        compress_buckets,
        decompress_buckets,
    )

    rng = np.random.default_rng(7)
    n = 2000
    pdf = pd.DataFrame(
        {
            "conv_id": np.repeat([f"c{i}" for i in range(10)], n // 10),
            "ts": pd.to_datetime(
                np.tile(np.cumsum(rng.integers(1, 30_000_000, n // 10)), 10), unit="us"
            ),
            "value": rng.normal(0, 1, n),
        }
    )
    df = spark.createDataFrame(pdf)
    enc = compress_buckets(df, coarse="hour")
    dec = decompress_buckets(enc)
    back = dec.toPandas().sort_values(["conv_id", "ts"]).reset_index(drop=True)
    orig = pdf.sort_values(["conv_id", "ts"]).reset_index(drop=True)
    assert (enc.select(F.sum("n_points")).first()[0]) == n
    np.testing.assert_array_equal(
        back["value"].to_numpy(), orig["value"].to_numpy()
    )
    assert (back["ts"].to_numpy() == orig["ts"].to_numpy()).all()
