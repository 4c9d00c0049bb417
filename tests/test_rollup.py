"""Tier rollups: oracle equality vs pandas (ddof=0) + exact cascade."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from yahoo_anomaly_detection_spark.operators.rollup import (
    rollup_all_tiers,
    rollup_cascade,
    rollup_points,
    transcripts_latency,
)
from yahoo_anomaly_detection_spark.synthgen import gen_transcripts


@pytest.fixture(scope="module")
def points(spark):
    turns = gen_transcripts(spark, n_convs=40, seed=42)
    return transcripts_latency(turns).cache()


def _pandas_tier(pdf: pd.DataFrame, freq: str) -> pd.DataFrame:
    pdf = pdf.copy()
    pdf["bucket_start"] = pdf["ts"].dt.floor(freq)
    g = pdf.groupby(["conv_id", "bucket_start"])
    out = g.agg(
        cnt=("ts", "size"),
        vcnt=("value", "count"),
        sum=("value", lambda s: s.sum(min_count=1)),
        min=("value", "min"),
        max=("value", "max"),
        mean=("value", "mean"),
        std=("value", lambda s: np.std(s.dropna())),  # ddof=0 like np.std
    ).reset_index()
    return out.sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)


def test_1m_tier_matches_pandas_oracle(spark, points):
    got = (
        rollup_points(points, "1m")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    exp = _pandas_tier(points.toPandas(), "min")
    assert len(got) == len(exp)
    pd.testing.assert_series_equal(got["cnt"], exp["cnt"], check_names=False)
    pd.testing.assert_series_equal(got["vcnt"], exp["vcnt"], check_names=False)
    for c in ("min", "max"):
        np.testing.assert_allclose(got[c].astype(float), exp[c].astype(float), rtol=0, atol=0)
    for c in ("sum", "mean"):
        np.testing.assert_allclose(
            got[c].astype(float), exp[c].astype(float), rtol=1e-9, atol=1e-12
        )
    # std uses the recombinable sum/sum_sq form → ~1e-7 rel cancellation
    # error vs numpy's two-pass std (SURVEY §7.4 documented tradeoff)
    np.testing.assert_allclose(
        got["std"].astype(float), exp["std"].astype(float), rtol=1e-6, atol=1e-9
    )


def test_cascade_equals_direct(spark, points):
    """1h tier recombined from 1m must equal 1h computed from raw —
    count/min/max exactly, sums to float tolerance."""
    t1m = rollup_points(points, "1m")
    via_cascade = (
        rollup_cascade(t1m, "1h").toPandas()
        .sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)
    )
    direct = (
        rollup_points(points, "1h").toPandas()
        .sort_values(["conv_id", "bucket_start"]).reset_index(drop=True)
    )
    assert via_cascade[["conv_id", "bucket_start", "cnt", "vcnt"]].equals(
        direct[["conv_id", "bucket_start", "cnt", "vcnt"]]
    )
    np.testing.assert_array_equal(via_cascade["min"], direct["min"])
    np.testing.assert_array_equal(via_cascade["max"], direct["max"])
    np.testing.assert_allclose(via_cascade["mean"], direct["mean"], rtol=1e-12)
    np.testing.assert_allclose(via_cascade["std"], direct["std"], rtol=1e-9, atol=1e-12)


def test_all_tiers_shapes(spark, points):
    tiers = rollup_all_tiers(points)
    c1m, c1h, c1d = (tiers[t].count() for t in ("1m", "1h", "1d"))
    assert c1m >= c1h >= c1d > 0
    total_turns = points.count()
    assert tiers["1d"].agg(F.sum("cnt")).first()[0] == total_turns


def test_single_shuffle_plan(spark):
    """latency derivation + 1m rollup must not add a second exchange
    for the groupBy (HashPartitioning(conv_id) satisfies the
    (conv_id, bucket) clustered distribution). Uses an uncached
    pipeline: a cached fixture embeds its plan text in the scan node."""
    fresh = transcripts_latency(gen_transcripts(spark, n_convs=5, seed=42))
    plan = rollup_points(fresh, "1m")._jdf.queryExecution().executedPlan().toString()
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 1, plan


def test_route_tier_picks_finest_within_budget():
    from yahoo_anomaly_detection_spark.operators.rollup import route_tier

    assert route_tier(6 * 3600, 500) == "1m"        # 360 points
    assert route_tier(30 * 86400, 1000) == "1h"     # 720 points
    assert route_tier(5 * 365 * 86400, 2000) == "1d"
    # nothing fits → coarsest
    assert route_tier(10 * 365 * 86400, 10) == "1d"
    # exact boundary: ceil(span/secs) == budget still fits
    assert route_tier(500 * 60, 500) == "1m"
    assert route_tier(500 * 60 + 1, 500) == "1h"
    import pytest as _pt
    with _pt.raises(ValueError):
        route_tier(0, 10)
    with _pt.raises(ValueError):
        route_tier(60, 0)
