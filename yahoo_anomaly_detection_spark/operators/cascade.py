"""Residual cascade: iterative reconstruct-and-subtract over a basis
sequence (SURVEY W4).

Reference analog: the Bag-of-Functions residual autoencoder loop at
/root/reference/Network/ITF/itf_residual.py:60-65 — each stage
reconstructs the CURRENT residual, subtracts its reconstruction, and
the model output is the sum of stage reconstructions. The reference
fits each stage with a learned encoder; the engine echoes the
dataflow with closed-form least-squares projections onto fixed basis
functions (const, linear, sine), which keeps every stage an exact
window aggregate — fully distributed, one shuffle for the whole
cascade (all stages share the per-conversation partitioning), and
SQL-expressible for the DuckDB oracle.

Stages (x = 0..n-1 per series, r_0 = v):
  const : rec = mean(r)                       (projection onto 1)
  lin   : rec = a + b·x, OLS closed form      (projection onto {1, x})
  sin   : rec = a·sin(ωx), a = Σr·s/Σs²       (projection onto sin)
r_{k} = r_{k-1} − rec_k; outputs recon = Σ rec_k and final residual.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

SIN_OMEGA = 2.0 * math.pi / 16.0


def residual_cascade(df: DataFrame, value_col: str = "v",
                     keys: tuple[str, ...] = ("conv_id",),
                     order_col: str = "bucket_start") -> DataFrame:
    """const → linear → sine cascade per series.

    Every stage is expressed over ONE unbounded window per key — the
    plan carries a single hash-partition exchange on the keys, then
    all six aggregates (n, Σr, Σx, Σx², Σxr, Σrs, Σs²) evaluate in the
    same window frame; no per-stage shuffles, no Python.
    """
    w_order = W.partitionBy(*keys).orderBy(order_col)
    w_all = W.partitionBy(*keys).rowsBetween(
        W.unboundedPreceding, W.unboundedFollowing
    )
    v = F.col(value_col)
    x = (F.row_number().over(w_order) - F.lit(1)).cast("double")
    s = F.sin(F.lit(SIN_OMEGA) * F.col("_x"))

    out = df.withColumn("_x", x).withColumn("_s", s)

    # stage 1: const fit on r0 = v
    rec1 = F.avg(v).over(w_all)
    out = out.withColumn("_rec1", rec1).withColumn("_r1", v - F.col("_rec1"))

    # stage 2: OLS line on r1 (closed form over window aggregates)
    r1 = F.col("_r1")
    xm = F.avg("_x").over(w_all)
    rm = F.avg("_r1").over(w_all)
    sxx = F.avg(F.col("_x") * F.col("_x")).over(w_all) - xm * xm
    sxr = F.avg(F.col("_x") * r1).over(w_all) - xm * rm
    slope = F.when(sxx > 0, sxr / sxx).otherwise(F.lit(0.0))
    out = out.withColumn("_rec2",
                         rm + slope * (F.col("_x") - xm)).withColumn(
        "_r2", r1 - F.col("_rec2")
    )

    # stage 3: sine projection on r2
    r2 = F.col("_r2")
    num = F.sum(r2 * F.col("_s")).over(w_all)
    den = F.sum(F.col("_s") * F.col("_s")).over(w_all)
    amp = F.when(den > 0, num / den).otherwise(F.lit(0.0))
    out = out.withColumn("_rec3", amp * F.col("_s"))

    return out.select(
        *keys,
        order_col,
        v.alias("v"),
        (F.col("_rec1") + F.col("_rec2") + F.col("_rec3")).alias("recon"),
        (F.col("_r2") - F.col("_rec3")).alias("residual"),
    )


def cascade_oracle_sql(series_sql: str, value_col: str = "v",
                       key: str = "conv_id",
                       order_col: str = "bucket_start") -> str:
    """DuckDB mirror of :func:`residual_cascade` over ``series_sql``
    (must yield columns key, order_col, value_col)."""
    return f"""
WITH base AS ({series_sql}),
xed AS (
    SELECT {key}, {order_col}, {value_col} AS v,
           CAST(row_number() OVER (PARTITION BY {key}
                ORDER BY {order_col}) - 1 AS DOUBLE) AS x
    FROM base
),
s1 AS (
    SELECT *, sin({SIN_OMEGA!r} * x) AS s,
           avg(v) OVER wk AS rec1
    FROM xed
    WINDOW wk AS (PARTITION BY {key})
),
s2 AS (
    SELECT *, v - rec1 AS r1 FROM s1
),
s3 AS (
    SELECT *,
           CASE WHEN avg(x * x) OVER wk - avg(x) OVER wk * avg(x) OVER wk > 0
                THEN (avg(x * r1) OVER wk
                      - avg(x) OVER wk * avg(r1) OVER wk)
                     / (avg(x * x) OVER wk
                        - avg(x) OVER wk * avg(x) OVER wk)
                ELSE 0.0 END AS slope,
           avg(r1) OVER wk AS r1m, avg(x) OVER wk AS xm
    FROM s2
    WINDOW wk AS (PARTITION BY {key})
),
s4 AS (
    SELECT *, r1m + slope * (x - xm) AS rec2,
           r1 - (r1m + slope * (x - xm)) AS r2
    FROM s3
),
s5 AS (
    SELECT *,
           CASE WHEN sum(s * s) OVER wk > 0
                THEN sum(r2 * s) OVER wk / sum(s * s) OVER wk
                ELSE 0.0 END * s AS rec3
    FROM s4
    WINDOW wk AS (PARTITION BY {key})
)
SELECT {key}, {order_col}, v,
       round(rec1 + rec2 + rec3, 4) AS recon,
       round(r2 - rec3, 4) AS residual
FROM s5
"""
