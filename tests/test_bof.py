"""Bag-of-Functions parity vs numpy mirrors of reference formulas
(/root/reference/Network/ITF/functions.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.functions import bof

W = 100
X = np.arange(W, dtype=float)
A1, A2, A3 = 1.7, 0.31, 0.9
EPS = 1e-6

CASES = [
    ("sin", lambda: bof.sin(F.col("x"), A1, A2, A3), A1 * np.sin(A2 * X + A3)),
    ("cos", lambda: bof.cos(F.col("x"), A1, A2, A3), A1 * np.cos(A2 * X + A3)),
    ("sin_abs", lambda: bof.sin_abs(F.col("x"), A1, A2, A3), np.abs(A1 * np.sin(A2 * X + A3))),
    (
        "sawtooth",
        lambda: bof.sawtooth_wave(F.col("x"), A1, A2, A3),
        2 * A1 * (X / A2 - np.floor(0.5 + X / A2)) + A3,
    ),
    (
        "si",
        lambda: bof.si(F.col("x"), A1, A2, A3),
        A1 * np.where(np.abs(A2 * X + A3) < 1e-12, 1.0, np.sin(A2 * X + A3) / (A2 * X + A3)),
    ),
    ("lin", lambda: bof.lin(F.col("x"), A1, A2), A1 + A2 * X),
    (
        "exp_sat",
        lambda: bof.exp_sat(F.col("x"), A1, A2, A3),
        A1 + A2 * (1 - np.exp(-X / (A3 + EPS))),
    ),
    (
        "exp_decay",
        lambda: bof.exp_decay(F.col("x"), A1, A2, A3),
        A1 + A2 * np.exp(-X / (A3 + EPS)),
    ),
    ("sqrt", lambda: bof.sqrt_fn(F.col("x"), A1, A2, A3), A1 + A2 * np.sqrt(X + A3)),
    ("log10", lambda: bof.log10_fn(F.col("x"), A1, A2, A3), A1 + A2 * np.log10(X + A3)),
    ("tanh", lambda: bof.tanh_fn(F.col("x"), A1, A2, A3), A1 * np.tanh((X - A3) * A2)),
    ("sig", lambda: bof.sig(F.col("x"), A1, A2, A3), A1 / (1 + np.exp((-X - A3) * A2))),
    (
        "gaus",
        lambda: bof.gaus(F.col("x"), A1, A2, A3),
        A1 * np.exp(-np.abs(A2 * (X - A3) ** 2)),
    ),
    ("step", lambda: bof.step(F.col("x"), A1, 31.0), np.where(X < 31.0, 0.0, A1)),
    (
        "rect",
        lambda: bof.rect(F.col("x"), A1, 20.0, 0.5, W),
        np.where((X >= 20.0) & (X <= 20.0 + (W - 20.0) * 0.5), A1, 0.0),
    ),
    ("hardlim", lambda: bof.hardlim(F.col("x"), 49.5), (X > 49.5).astype(float)),
    (
        "gauss_pdf",
        lambda: bof.gaussian_pdf(F.col("x"), 50.0, 10.0),
        np.exp(-((X - 50.0) ** 2) / 200.0) / (10.0 * math.sqrt(2 * math.pi)),
    ),
]


@pytest.fixture(scope="module")
def xdf(spark):
    return spark.range(W).select(F.col("id").cast("double").alias("x")).cache()


@pytest.mark.parametrize("name,expr,expected", CASES, ids=[c[0] for c in CASES])
def test_bof_parity(spark, xdf, name, expr, expected):
    got = np.array(
        [r[0] for r in xdf.select(F.col("x"), expr().alias("v")).orderBy("x").select("v").collect()]
    )
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-300)


def test_eval_over_window(spark):
    arr = (
        spark.range(1)
        .select(bof.eval_over_window(lambda x: bof.lin(x, 2.0, 3.0), 5).alias("a"))
        .first()["a"]
    )
    np.testing.assert_allclose(arr, [2.0, 5.0, 8.0, 11.0, 14.0])


def test_rescale(spark):
    got = spark.range(1).select(bof.rescale(F.lit(0.5), -1.0, 3.0)).first()[0]
    assert got == 1.0
