"""Gap-fill: skeleton completeness + linear interpolation oracle."""

import numpy as np
import pandas as pd

from yahoo_anomaly_detection_spark.operators.gapfill import (
    bucket_skeleton,
    gapfill_linear,
)


def _tier_pdf():
    # conv a: buckets 0,1,4,5 (gap 2,3); conv b: 0,3 (gap 1,2); conv c: single
    t0 = pd.Timestamp("2025-01-01")

    def mk(conv, idxs, vals):
        return pd.DataFrame(
            {
                "conv_id": conv,
                "bucket_start": [t0 + pd.Timedelta(minutes=i) for i in idxs],
                "mean": vals,
            }
        )

    return pd.concat(
        [
            mk("a", [0, 1, 4, 5], [1.0, 2.0, 8.0, 10.0]),
            mk("b", [0, 3], [3.0, 9.0]),
            mk("c", [2], [7.0]),
        ],
        ignore_index=True,
    )


def test_skeleton_is_dense(spark):
    df = spark.createDataFrame(_tier_pdf())
    skel = bucket_skeleton(df, "1m").toPandas()
    counts = skel.groupby("conv_id").size().to_dict()
    assert counts == {"a": 6, "b": 4, "c": 1}


def test_linear_interpolation_values(spark):
    df = spark.createDataFrame(_tier_pdf())
    got = (
        gapfill_linear(df, "1m", "mean")
        .toPandas()
        .sort_values(["conv_id", "bucket_start"])
        .reset_index(drop=True)
    )
    a = got[got.conv_id == "a"]["mean_filled"].to_numpy()
    # linear between (1,2.0) and (4,8.0): minutes 2,3 → 4.0, 6.0
    np.testing.assert_allclose(a, [1.0, 2.0, 4.0, 6.0, 8.0, 10.0])
    b = got[got.conv_id == "b"]["mean_filled"].to_numpy()
    np.testing.assert_allclose(b, [3.0, 5.0, 7.0, 9.0])
    flags = got.groupby("conv_id")["gap_filled"].sum().to_dict()
    assert flags == {"a": 2, "b": 2, "c": 0}
    # observed values pass through untouched
    obs = got[~got["gap_filled"]]
    np.testing.assert_allclose(obs["mean_filled"], obs["mean"])


def test_matches_pandas_interpolate(spark):
    rng = np.random.default_rng(3)
    t0 = pd.Timestamp("2025-01-01")
    idxs = np.sort(rng.choice(np.arange(200), size=60, replace=False))
    pdf = pd.DataFrame(
        {
            "conv_id": "x",
            "bucket_start": [t0 + pd.Timedelta(minutes=int(i)) for i in idxs],
            "mean": rng.normal(0, 5, len(idxs)),
        }
    )
    got = (
        gapfill_linear(spark.createDataFrame(pdf), "1m", "mean")
        .toPandas()
        .sort_values("bucket_start")
        .reset_index(drop=True)
    )
    full = pd.Series(index=np.arange(idxs.min(), idxs.max() + 1), dtype=float)
    full.loc[idxs] = pdf["mean"].to_numpy()
    exp = full.interpolate(method="linear").to_numpy()
    np.testing.assert_allclose(got["mean_filled"].to_numpy(), exp, rtol=1e-12)
