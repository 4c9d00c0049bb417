"""Mergeable cardinality / frequency sketches: HyperLogLog distinct
counts and Count-Min frequency estimates.

Why the engine carries these next to the exact operators
(``active_users_1d``'s COUNT(DISTINCT), ``heavy_hitters``'s exact
groupBy): distinct counts and frequencies are the two aggregates that
do NOT decompose over a rollup cascade — ``sum(distinct_per_day)``
over a week counts repeat visitors once per day, so an exact 7d
number must re-touch the raw events. At 10^12 turns that re-scan is
the difference between a tier cascade (the north rule's shape) and a
nightly full-table job. A sketch register file IS decomposable: HLL
registers merge by ``max``, CMS counters merge by ``+`` — both
associative and idempotent-safe, so every coarser tier derives from
the finer tier's sketch, never from raw data, exactly like the
sum/cnt/min/max columns in ``rollup.TIER_STATE_COLS``.

Cross-engine determinism (the repo-wide contract, see dedup.py:8):
every hash is an md5 hex-digit lane — ``conv(substr(md5(x),1,8),16,10)``
(bits 1-32) and ``substr(..,9,8)`` (bits 33-64) — reproducible
bit-for-bit in Spark, DuckDB, and any engine with md5. No
``xxhash64``/``F.hash``: those are engine-private. The HLL estimator
itself is deterministic: register harmonic sums add ≤2^p exact binary
fractions ≥ 2^-33, so every partial sum fits a double EXACTLY
(10+33 bits < 53) and no summation-order wobble exists; the only
floats are one division and (small-range branch) one ``ln``, both
absorbed by ``portable_round``.

Scale shape: both sketches cross ONE map-side-combined exchange whose
width is the sketch size — HLL: (groups × ≤2^p) register rows; CMS:
(d × w) counter rows — INDEPENDENT of key cardinality. The exact
twins shuffle one row per distinct key; at 10^9 users that exchange
is the job, while the sketch exchange stays ~kilobytes per group.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import Window as W

from ..functions.portable import portable_round

_R = 4


def _lane(c: Column, start: int) -> Column:
    """32 md5 bits starting at hex digit ``start`` (1 or 9), as a
    non-negative long — the house engine-portable hash lane."""
    return F.conv(
        F.substring(F.md5(c.cast("string")), start, 8), 16, 10
    ).cast("long")


def _lane_sql(x: str, start: int) -> str:
    return (f"CAST(concat('0x', substr(md5(CAST({x} AS VARCHAR)),"
            f" {start}, 8)) AS BIGINT)")


def _hll_alpha(m: int) -> float:
    return 0.7213 / (1.0 + 1.079 / m)


def _check_p(p: int) -> int:
    if not 7 <= p <= 16:
        raise ValueError(f"p must be in [7, 16], got {p}")
    return 1 << p


# --------------------------------------------------------------- HLL
def hll_registers(df: DataFrame, id_col: str,
                  group_cols: tuple[str, ...], p: int = 10) -> DataFrame:
    """HLL register file per group: (group_cols…, reg, max_rho).

    reg = low-lane hash mod 2^p; rho = leading-zero count of the
    INDEPENDENT high lane + 1 (md5's bits 33-64), so the register
    index steals no rho bits — the estimator sees a full 32-bit
    geometric tail regardless of p. rho is computed with integer ops
    only (``33 − length(bin(hi))``), never ``floor(log2)`` whose
    libm last-ulp can disagree between engines at exact powers of 2.

    One ``groupBy(group, reg) → max`` exchange; map-side combine
    bounds each task's emission at 2^p rows per group.
    """
    m = _check_p(p)
    idc = F.col(id_col)
    hi = _lane(idc, 9)
    rho = (F.when(hi == 0, F.lit(33))
           .otherwise(F.lit(33) - F.length(F.conv(hi, 10, 2))))
    return (
        df.where(idc.isNotNull())
        .select(*group_cols,
                (_lane(idc, 1) % F.lit(m)).alias("reg"),
                rho.alias("rho"))
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_estimate(regs: DataFrame, group_cols: tuple[str, ...],
                 p: int = 10, out_col: str = "est") -> DataFrame:
    """Fold a register file to one cardinality estimate per group.

    Raw HLL ``α·m²/(V + Σ 2^-rho)`` with the standard small-range
    linear-counting switch (E ≤ 2.5m and empty registers exist →
    ``m·ln(m/V)``). Absent registers contribute 2^0 = 1 each via V.
    No large-range correction: the rho lane is 32 bits wide and the
    32-bit-hash collision regime starts ~10^9 per GROUP — beyond it,
    raise p / widen the lane, not a correction curve.
    """
    m = _check_p(p)
    alpha = _hll_alpha(m)
    agg = regs.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_nz"),
        F.sum(F.pow(F.lit(2.0), -F.col("max_rho"))).alias("_s"),
    )
    v = F.lit(m) - F.col("_nz")
    raw = F.lit(alpha * m * m) / (v.cast("double") + F.col("_s"))
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double"))
    est = F.when((v > 0) & (raw <= F.lit(2.5 * m)), lc).otherwise(raw)
    return agg.select(*group_cols, portable_round(est, _R).alias(out_col))


def _hll_est_sql(regs_cte: str, grp: str, p: int, out: str = "est") -> str:
    m = 1 << p
    alpha = _hll_alpha(m)
    return f"""
SELECT {grp},
       round(CASE WHEN ({m} - count(*)) > 0
                   AND {alpha * m * m!r} /
                       (({m} - count(*)) + sum(pow(2.0, -max_rho)))
                       <= {2.5 * m!r}
             THEN {float(m)!r} * ln({float(m)!r} / ({m} - count(*)))
             ELSE {alpha * m * m!r} /
                  (({m} - count(*)) + sum(pow(2.0, -max_rho)))
             END, 4) AS {out}
FROM {regs_cte} GROUP BY {grp}
"""


def _hll_regs_sql(src: str, id_col: str, grp_expr: str, p: int) -> str:
    m = 1 << p
    hi = _lane_sql(id_col, 9)
    return f"""(
    SELECT {grp_expr} AS bucket_start,
           ({_lane_sql(id_col, 1)} % {m}) AS reg,
           max(CASE WHEN {hi} = 0 THEN 33
                    ELSE 33 - length(format('{{:b}}', {hi})) END) AS max_rho
    FROM {src} WHERE {id_col} IS NOT NULL
    GROUP BY 1, 2
)"""


def hll_distinct(events: DataFrame, id_col: str = "user_id",
                 bucket_seconds: int = 86400, ts_col: str = "ts",
                 p: int = 10) -> DataFrame:
    """Per-bucket approximate distinct ``id_col`` with the exact
    count alongside: (bucket_start, n_exact, est).

    The exact column exists to make the estimate auditable at test
    scale (and gives the oracle a hard integer to match); at 100 TB a
    caller keeps only the register file and drops the exact branch —
    the sketch exchange is (buckets × ≤2^p) rows vs one row per
    distinct id.
    """
    from .tsanalytics import _bucket_expr

    bucketed = events.select(
        _bucket_expr(ts_col, int(bucket_seconds)).alias("bucket_start"),
        F.col(id_col),
    )
    regs = hll_registers(bucketed, id_col, ("bucket_start",), p)
    est = hll_estimate(regs, ("bucket_start",), p)
    exact = (bucketed.where(F.col(id_col).isNotNull())
             .groupBy("bucket_start")
             .agg(F.count_distinct(F.col(id_col)).alias("n_exact")))
    return exact.join(est, "bucket_start").select(
        "bucket_start", "n_exact", "est")


def hll_cascade(events: DataFrame, id_col: str = "user_id",
                fine_seconds: int = 86400,
                coarse_seconds: int = 7 * 86400,
                ts_col: str = "ts", p: int = 10) -> DataFrame:
    """The tier-cascade proof: coarse-bucket estimates computed TWO
    ways — ``est_merged`` folds the fine tier's register file up by
    ``max`` (never re-reading events), ``est_direct`` sketches the
    raw events at coarse grain. Register max is associative, so the
    two columns are bit-identical — the property that lets a 1d→7d→
    30d distinct rollup ride the same incremental-refresh machinery
    as sum/cnt tiers (rollup.py's cascade). Output:
    (bucket_start, est_merged, est_direct, n_exact).
    """
    from .tsanalytics import _bucket_expr

    if coarse_seconds % fine_seconds:
        raise ValueError(
            f"coarse ({coarse_seconds}) must be a multiple of fine "
            f"({fine_seconds}) for a lossless register merge")
    fine = events.select(
        _bucket_expr(ts_col, int(fine_seconds)).alias("fine_start"),
        _bucket_expr(ts_col, int(coarse_seconds)).alias("bucket_start"),
        F.col(id_col),
    )
    fine_regs = hll_registers(fine, id_col,
                              ("bucket_start", "fine_start"), p)
    merged = fine_regs.groupBy("bucket_start", "reg").agg(
        F.max("max_rho").alias("max_rho"))
    est_m = hll_estimate(merged, ("bucket_start",), p, out_col="est_merged")
    direct = hll_registers(fine, id_col, ("bucket_start",), p)
    est_d = hll_estimate(direct, ("bucket_start",), p, out_col="est_direct")
    exact = (fine.where(F.col(id_col).isNotNull())
             .groupBy("bucket_start")
             .agg(F.count_distinct(F.col(id_col)).alias("n_exact")))
    return (est_m.join(est_d, "bucket_start").join(exact, "bucket_start")
            .select("bucket_start", "est_merged", "est_direct", "n_exact"))


# --------------------------------------------------------- Count-Min
def cms_sketch(df: DataFrame, key_col: str, d: int = 4,
               w: int = 2048) -> DataFrame:
    """Count-Min counter file: (hrow, bucket, cnt), d·w rows total.

    Each key hashes to one bucket per row via salted md5 lanes
    (salts ``cms0|``…); the counter file is the ONLY thing that
    crosses the wire — one map-side-combined groupBy whose output is
    d·w rows no matter how many distinct keys exist. Merging two
    sketches (across partitions, days, or tiers) is counter
    addition.
    """
    if d < 1 or w < 2:
        raise ValueError(f"need d >= 1, w >= 2, got d={d}, w={w}")
    kc = F.col(key_col)
    rows = F.array(*[
        F.struct(F.lit(i).alias("hrow"),
                 (_lane(F.concat(F.lit(f"cms{i}|"), kc.cast("string")), 1)
                  % F.lit(w))
                 .alias("bucket"))
        for i in range(d)
    ])
    return (
        df.where(kc.isNotNull())
        .select(F.explode(rows).alias("h"))
        .groupBy(F.col("h.hrow").alias("hrow"),
                 F.col("h.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_topk_compare(df: DataFrame, key_col: str, k: int = 20,
                     d: int = 4, w: int = 2048) -> DataFrame:
    """Exact top-k keys probed against the CMS: (key, n_exact, est).

    est = min over the d counter rows — the classic one-sided bound
    (est ≥ true; est ≤ true + εN w.h.p., ε = e/w). The exact branch
    exists for auditability at test scale; the production pattern
    streams candidate keys (e.g. from a heavy-hitters pass over one
    partition) against a broadcast counter file — d·w longs, a few
    KB — with no per-key state anywhere.

    Integer-exact end to end: no float enters either engine, so the
    oracle match is exact, not rounded.
    """
    kc = F.col(key_col)
    sketch = cms_sketch(df, key_col, d=d, w=w)
    exact = (df.where(kc.isNotNull()).groupBy(key_col)
             .agg(F.count(F.lit(1)).alias("n_exact"))
             .orderBy(F.col("n_exact").desc(), kc.asc())
             .limit(k))
    probes = exact.select(
        key_col, "n_exact",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("hrow"),
                     (_lane(F.concat(F.lit(f"cms{i}|"),
                                      kc.cast("string")), 1)
                      % F.lit(w)).alias("bucket"))
            for i in range(d)
        ])).alias("h"),
    ).select(key_col, "n_exact", "h.hrow", "h.bucket")
    return (
        probes.join(F.broadcast(sketch), ["hrow", "bucket"])
        .groupBy(key_col, "n_exact")
        .agg(F.min("cnt").alias("est"))
        .select(key_col, "n_exact", "est")
    )


# ------------------------------------------------------------ oracles
_P = 10

_HLL_1D_SQL = f"""
WITH regs AS {_hll_regs_sql("events", "user_id",
                            "date_trunc('day', ts)", _P)},
est AS ({_hll_est_sql("regs", "bucket_start", _P)}),
exact AS (
    SELECT date_trunc('day', ts) AS bucket_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT exact.bucket_start, n_exact, est
FROM exact JOIN est USING (bucket_start)
"""

_WEEK_US = 7 * 86400 * 1_000_000

_HLL_CASCADE_SQL = f"""
WITH fine AS (
    SELECT make_timestamp(epoch_us(ts) - epoch_us(ts) % {_WEEK_US})
               AS bucket_start,
           date_trunc('day', ts) AS fine_start, user_id
    FROM events WHERE user_id IS NOT NULL
),
fine_regs AS (
    SELECT bucket_start, fine_start,
           ({_lane_sql("user_id", 1)} % {1 << _P}) AS reg,
           max(CASE WHEN {_lane_sql("user_id", 9)} = 0 THEN 33
                    ELSE 33 - length(format('{{:b}}',
                                            {_lane_sql("user_id", 9)}))
               END) AS max_rho
    FROM fine GROUP BY 1, 2, 3
),
merged AS (
    SELECT bucket_start, reg, max(max_rho) AS max_rho
    FROM fine_regs GROUP BY 1, 2
),
est_m AS ({_hll_est_sql("merged", "bucket_start", _P, out="est_merged")}),
direct AS (
    SELECT bucket_start, reg, max(max_rho) AS max_rho
    FROM fine_regs GROUP BY 1, 2
),
est_d AS ({_hll_est_sql("direct", "bucket_start", _P, out="est_direct")}),
exact AS (
    SELECT bucket_start,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM fine GROUP BY 1
)
SELECT bucket_start, est_merged, est_direct, n_exact
FROM est_m JOIN est_d USING (bucket_start) JOIN exact USING (bucket_start)
"""


def _cms_sql(key: str, k: int, d: int, w: int) -> str:
    salted = [_lane_sql(f"concat('cms{i}|', {key})", 1) for i in range(d)]
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT {key}, n_exact, {i} AS hrow, "
        f"({salted[i]} % {w}) AS bucket FROM topk"
        for i in range(d)
    )
    sketch_rows = "\nUNION ALL\n".join(
        f"SELECT {i} AS hrow, ({salted[i]} % {w}) AS bucket FROM src"
        for i in range(d)
    )
    return f"""
WITH src AS (
    SELECT {key} FROM events WHERE {key} IS NOT NULL
),
sketch AS (
    SELECT hrow, bucket, CAST(count(*) AS BIGINT) AS cnt
    FROM ({sketch_rows}) GROUP BY 1, 2
),
topk AS (
    SELECT {key}, CAST(count(*) AS BIGINT) AS n_exact
    FROM src GROUP BY 1
    ORDER BY n_exact DESC, {key} ASC LIMIT {k}
),
probes AS ({probe_rows})
SELECT p.{key}, p.n_exact, CAST(min(s.cnt) AS BIGINT) AS est
FROM probes p JOIN sketch s USING (hrow, bucket)
GROUP BY 1, 2
"""


def bitmap_actives(events: DataFrame, key: str = "event_type",
                   ts_col: str = "ts",
                   id_col: str = "user_id") -> DataFrame:
    """EXACT distinct ids per (key, day) via packed-bitmap partial
    aggregation — the Druid/ClickHouse ``groupBitmap`` idiom:
    (key, day, n_users).

    The third point on the distinct-count cost curve: COUNT(DISTINCT)
    (``active_users_1d``) shuffles one row per distinct id per group;
    HLL (``hll_actives_1d``) shuffles ≤2^p register rows but is
    approximate. A bitmap packs 32 ids into one long that merges by
    ``bit_or`` — associative, idempotent (a retried/duplicated task
    re-ORs the same bits harmlessly), map-side combinable — so the
    exchange carries at most |id-universe|/32 chunk rows per group,
    32× fewer than the distinct rows themselves when ids are dense.
    Like the HLL register file, the (key, day, chunk, bm) relation is
    a mergeable TIER: week = bit_or of the dailies, still exact —
    the decomposability COUNT(DISTINCT) lacks.

    32-bit chunks, not 64: ``1 << 63`` overflows signed BIGINT on
    engines without unsigned shifts (DuckDB raises), and the sign bit
    makes ``bit_count`` two's-complement-dependent. 32 live bits in a
    64-bit long keeps every engine in exact integer territory.
    Requires non-negative integer ids (asserted cheaply via the
    id >= 0 filter semantics: negative ids would alias chunks).
    """
    uid = F.col(id_col).cast("long")
    day = F.date_trunc("day", F.col(ts_col)).alias("day")
    chunks = (
        events.where(uid.isNotNull() & (uid >= 0))
        .groupBy(F.col(key), day,
                 F.expr(f"{id_col} div 32").alias("chunk"))
        .agg(F.expr(f"bit_or(shiftleft(1L, "
                    f"cast({id_col} % 32 as int)))").alias("bm"))
    )
    return chunks.groupBy(key, "day").agg(
        F.sum(F.bit_count("bm")).alias("n_users"))


_BITMAP_SQL = """
WITH b AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           user_id // 32 AS chunk,
           bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bm
    FROM events
    WHERE user_id IS NOT NULL AND user_id >= 0
    GROUP BY 1, 2, 3
)
SELECT event_type, day, CAST(sum(bit_count(bm)) AS BIGINT) AS n_users
FROM b GROUP BY 1, 2
"""


ORACLE_SQL = {
    "hll_actives_1d": _HLL_1D_SQL,
    "hll_cascade_7d": _HLL_CASCADE_SQL,
    "cms_heavy_hitters": _cms_sql("user_id", 20, 4, 2048),
    "bitmap_actives_1d": _BITMAP_SQL,
}


# --------------------------------------------------------------- KMV
KMV_M = float(1 << 60)  # hash space: 60 md5 bits (15 hex digits)


def _kmv_hash(c: Column) -> Column:
    """60-bit md5 hash lane as a non-negative long — wide enough that
    k-min order statistics are collision-free in practice, narrow
    enough to stay inside signed BIGINT on every engine."""
    return F.conv(
        F.substring(F.md5(c.cast("string")), 1, 15), 16, 10
    ).cast("long")


def kmv_sketches(events: DataFrame, id_col: str = "user_id",
                 key: str = "event_type", k: int = 64) -> DataFrame:
    """K-minimum-values (bottom-k / theta) sketch per group:
    (key, h, rk) — the k smallest 60-bit hashes of the distinct ids,
    rank-ordered. The sketch family that supports set INTERSECTION
    (and arbitrary set algebra), which HLL registers cannot: two KMV
    sketches merge by union-then-truncate, and the overlap of their
    k-min union estimates Jaccard directly (Beyer et al., SIGMOD'07).

    Scale shape: one map-side-combined distinct on (key, h); then
    k-min is DISTRIBUTIVE (the global k smallest survive any
    partition-local k-min), so phase 1 ranks within
    (key, physical partition) — bounded per task, never funneling a
    key's full id set through one window task — and phase 2 re-ranks
    only the ≤ k·P survivors per key. Same bounded-top-k idiom as
    ``textstats.topk_per_band``.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    idc = F.col(id_col)
    distinct = (events.where(idc.isNotNull())
                .select(F.col(key), _kmv_hash(idc).alias("h"))
                .distinct())
    part = distinct.withColumn("pid", F.spark_partition_id())
    w1 = W.partitionBy(key, "pid").orderBy("h")
    surv = (part.withColumn("rk", F.row_number().over(w1))
            .where(F.col("rk") <= k).drop("pid", "rk"))
    w2 = W.partitionBy(key).orderBy("h")
    return (surv.withColumn("rk", F.row_number().over(w2))
            .where(F.col("rk") <= k))


def kmv_overlap(events: DataFrame, id_col: str = "user_id",
                key: str = "event_type", k: int = 64) -> DataFrame:
    """Audience-overlap estimates for every group pair from KMV
    sketches: (key_a, key_b, est_a, est_b, est_union, est_inter,
    jaccard). est = (k−1)/θ with θ = v_k/M (exact count when the
    sketch holds the whole set, i.e. fewer than k distinct ids);
    intersection via ρ = |k-min(A∪B) ∩ A ∩ B| / |k-min(A∪B)|,
    est_inter = ρ·est_union — the classic KMV set-algebra estimator.

    Everything after :func:`kmv_sketches` runs on sketch-sized
    relations (≤ |keys|²·2k rows): the pair spine is a tiny
    self-cross of the key list, sketch sides broadcast, and the
    union re-rank windows over ≤2k rows per pair.
    """
    sk = kmv_sketches(events, id_col, key, k).select(
        F.col(key).alias("kk"), "h", "rk")
    per_key = sk.groupBy("kk").agg(
        F.count(F.lit(1)).alias("cnt"), F.max("h").alias("vk"))
    est = F.when(
        F.col("cnt") < k, F.col("cnt").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_M) / F.col("vk"))
    per_key = per_key.select("kk", est.alias("est"))
    ks = per_key.select(F.col("kk").alias("ka"))
    pairs = (ks.crossJoin(ks.select(F.col("ka").alias("kb")))
             .where(F.col("ka") < F.col("kb")))
    side_a = pairs.join(F.broadcast(sk), F.col("ka") == F.col("kk")) \
        .select("ka", "kb", "h", F.lit(1).alias("in_a"),
                F.lit(0).alias("in_b"))
    side_b = pairs.join(F.broadcast(sk), F.col("kb") == F.col("kk")) \
        .select("ka", "kb", "h", F.lit(0).alias("in_a"),
                F.lit(1).alias("in_b"))
    u = (side_a.unionByName(side_b)
         .groupBy("ka", "kb", "h")
         .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b")))
    wu = W.partitionBy("ka", "kb").orderBy("h")
    topu = (u.withColumn("rk", F.row_number().over(wu))
            .where(F.col("rk") <= k))
    agg = topu.groupBy("ka", "kb").agg(
        F.count(F.lit(1)).alias("m_u"),
        F.max("h").alias("vk"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("both"))
    est_u = F.when(
        F.col("m_u") < k, F.col("m_u").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(KMV_M) / F.col("vk"))
    rho = F.col("both").cast("double") / F.col("m_u").cast("double")
    out = (agg
           .join(F.broadcast(per_key.select(F.col("kk").alias("ka"),
                                            F.col("est").alias("ea"))),
                 "ka")
           .join(F.broadcast(per_key.select(F.col("kk").alias("kb"),
                                            F.col("est").alias("eb"))),
                 "kb"))
    return out.select(
        F.col("ka").alias("key_a"), F.col("kb").alias("key_b"),
        portable_round(F.col("ea"), _R).alias("est_a"),
        portable_round(F.col("eb"), _R).alias("est_b"),
        portable_round(est_u, _R).alias("est_union"),
        portable_round(rho * est_u, _R).alias("est_inter"),
        portable_round(rho, _R).alias("jaccard"),
    )


def _kmv_sql(k: int = 64) -> str:
    m = 1 << 60
    h = ("CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),"
         " 1, 15)) AS BIGINT)")
    return f"""
WITH d AS (
    SELECT DISTINCT event_type AS kk, {h} AS h
    FROM events WHERE user_id IS NOT NULL
),
sk AS (
    SELECT kk, h,
           row_number() OVER (PARTITION BY kk ORDER BY h) AS rk
    FROM d QUALIFY rk <= {k}
),
pk AS (
    SELECT kk,
           CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE)
                ELSE {float(k - 1)} * {float(m)} / max(h) END AS est
    FROM sk GROUP BY kk
),
pairs AS (
    SELECT a.kk AS ka, b.kk AS kb
    FROM pk a, pk b WHERE a.kk < b.kk
),
u AS (
    SELECT ka, kb, h, max(in_a) AS in_a, max(in_b) AS in_b
    FROM (
        SELECT p.ka, p.kb, s.h, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON s.kk = p.ka
        UNION ALL
        SELECT p.ka, p.kb, s.h, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON s.kk = p.kb
    ) GROUP BY 1, 2, 3
),
topu AS (
    SELECT ka, kb, h, in_a, in_b,
           row_number() OVER (PARTITION BY ka, kb ORDER BY h) AS rk
    FROM u QUALIFY rk <= {k}
),
agg AS (
    SELECT ka, kb, count(*) AS m_u, max(h) AS vk,
           sum(in_a * in_b) AS both
    FROM topu GROUP BY 1, 2
)
SELECT agg.ka AS key_a, agg.kb AS key_b,
       round(pa.est, 4) AS est_a,
       round(pb.est, 4) AS est_b,
       round(CASE WHEN agg.m_u < {k} THEN CAST(agg.m_u AS DOUBLE)
             ELSE {float(k - 1)} * {float(m)} / agg.vk END, 4)
           AS est_union,
       round(CAST(agg.both AS DOUBLE) / CAST(agg.m_u AS DOUBLE)
             * CASE WHEN agg.m_u < {k} THEN CAST(agg.m_u AS DOUBLE)
               ELSE {float(k - 1)} * {float(m)} / agg.vk END, 4)
           AS est_inter,
       round(CAST(agg.both AS DOUBLE) / CAST(agg.m_u AS DOUBLE), 4)
           AS jaccard
FROM agg
JOIN pk pa ON pa.kk = agg.ka
JOIN pk pb ON pb.kk = agg.kb
"""


ORACLE_SQL["kmv_overlap"] = _kmv_sql()


def bitmap_rolling(events: DataFrame, window_days: int = 7,
                   key: str = "event_type", ts_col: str = "ts",
                   id_col: str = "user_id") -> DataFrame:
    """EXACT trailing-N-day distinct ids per (key, day) — the rolling
    metric the :func:`bitmap_actives` chunk tier exists to power:
    repeat visitors collapse (``sum`` of dailies over-counts them;
    HLL approximates), and the packed-bitmap tier answers it exactly
    by OR-ing each chunk's daily bitmaps across the trailing frame
    and popcounting.

    Output: (key, day, n_users) — one row per (key, day) with ≥1
    event, counting distinct ids over [day − N + 1, day].

    Scale shape: raw rows collapse to the (key, day, chunk) tier
    first (ONE map-side-combined groupBy, ≤ |ids|/32 rows per
    group-day); the rolling OR is a window over THAT tier partitioned
    by (key, chunk) — per-task input is one chunk's daily history,
    bounded — and the popcount rollup reuses tier-sized relations
    throughout. A calendar-day RANGE frame (epoch-day ordering)
    keeps the window honest across gap days: a chunk absent on a
    day simply contributes nothing that day.
    """
    if window_days < 1:
        raise ValueError(f"window_days must be >= 1, got {window_days}")
    uid = F.col(id_col).cast("long")
    day = F.date_trunc("day", F.col(ts_col))
    chunks = (
        events.where(uid.isNotNull() & (uid >= 0))
        .groupBy(F.col(key), day.alias("day"),
                 F.expr(f"{id_col} div 32").alias("chunk"))
        .agg(F.expr(f"bit_or(shiftleft(1L, "
                    f"cast({id_col} % 32 as int)))").alias("bm"))
    )
    dnum = (F.unix_micros(F.col("day").cast("timestamp"))
            / F.lit(86_400_000_000)).cast("long")
    # SQL-form window: bit_or has no python Column.over() helper
    rolled = chunks.withColumn("_d", dnum).withColumn(
        "bm_roll",
        F.expr(
            f"bit_or(bm) OVER (PARTITION BY {key}, chunk ORDER BY _d "
            f"RANGE BETWEEN {window_days - 1} PRECEDING AND CURRENT "
            f"ROW)"))
    return (rolled.groupBy(key, "day")
            .agg(F.sum(F.bit_count("bm_roll")).alias("n_users")))


def _bitmap_rolling_sql(window_days: int = 7) -> str:
    return f"""
WITH c AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           user_id // 32 AS chunk,
           bit_or(1::BIGINT << CAST(user_id % 32 AS INT)) AS bm
    FROM events
    WHERE user_id IS NOT NULL AND user_id >= 0
    GROUP BY 1, 2, 3
),
r AS (
    SELECT event_type, day, chunk,
           bit_or(bm) OVER (
               PARTITION BY event_type, chunk
               ORDER BY CAST(epoch(day) AS BIGINT) // 86400
               RANGE BETWEEN {window_days - 1} PRECEDING
                         AND CURRENT ROW
           ) AS bm_roll
    FROM c
)
SELECT event_type, day,
       CAST(sum(bit_count(bm_roll)) AS BIGINT) AS n_users
FROM r GROUP BY 1, 2
"""


ORACLE_SQL["bitmap_rolling_7d"] = _bitmap_rolling_sql()


def join_size_est(left: DataFrame, right: DataFrame,
                  left_key: str, right_key: str,
                  d: int = 4, w: int = 2048) -> DataFrame:
    """Join-cardinality estimation from Count-Min inner products —
    the optimizer statistic that decides join ORDER and strategy
    before any join runs: ``|L ⋈ R|`` on an equi-key equals the
    inner product of the two sides' key-frequency vectors, and the
    AMS/CM estimate is ``min over hash rows of Σ_b cL[b]·cR[b]``
    (Cormode & Muthukrishnan's classic join-size bound: always ≥ the
    truth, within ε·N_L·N_R with the usual CMS guarantees).

    Output: one row — (exact_size, est_size, rel_err). The exact
    side is computed WITHOUT materializing the join: two per-key
    count aggregates and a key-equality join of the (distinct-key)
    count relations, Σ n_L(k)·n_R(k).

    Scale shape: each sketch is one map-side-combined groupBy whose
    output is d·w counter rows regardless of key cardinality; the
    inner product joins two d·w-row relations. The exact branch
    shuffles one row per distinct key per side (the audit path —
    at 100 TB keep only the sketch branch; the exact branch exists
    so the estimate is verifiable at test scale, same pattern as
    ``hll_distinct``).
    """
    sl = cms_sketch(left, left_key, d, w).withColumnRenamed("cnt", "cl")
    sr = cms_sketch(right, right_key, d, w) \
        .withColumnRenamed("cnt", "cr")
    per_row = (sl.join(sr, ["hrow", "bucket"])
               .groupBy("hrow")
               .agg(F.sum(F.col("cl") * F.col("cr")).alias("ip")))
    # a hash row with ZERO overlapping buckets contributes ip = 0 but
    # drops out of the inner join entirely — min over the survivors
    # would overestimate; any absent row means the true min is 0
    est = per_row.agg(
        F.when(F.count(F.lit(1)) < d, F.lit(0))
        .otherwise(F.min("ip")).alias("est_size"))
    nl = left.groupBy(F.col(left_key).alias("k")).agg(
        F.count(F.lit(1)).alias("na"))
    nr = right.groupBy(F.col(right_key).alias("k")).agg(
        F.count(F.lit(1)).alias("nb"))
    exact = (nl.join(nr, "k")
             .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")),
                             F.lit(0)).alias("exact_size")))
    return exact.crossJoin(F.broadcast(est)).select(
        "exact_size", "est_size",
        portable_round(
            F.try_divide(
                (F.col("est_size") - F.col("exact_size")).cast("double"),
                F.col("exact_size")), _R).alias("rel_err"),
    )


def _join_size_sql(left: str, right: str, lk: str, rk: str,
                   d: int = 4, w: int = 2048) -> str:
    def sk(src, key):
        parts = []
        for i in range(d):
            salted = "'cms%d|' || CAST(%s AS VARCHAR)" % (i, key)
            lane = _lane_sql(salted, 1)
            parts.append(
                "SELECT %d AS hrow, (%s %% %d) AS bucket FROM %s "
                "WHERE %s IS NOT NULL" % (i, lane, w, src, key))
        rows = " UNION ALL ".join(parts)
        return ("SELECT hrow, bucket, count(*) AS cnt FROM (%s) "
                "GROUP BY 1, 2" % rows)
    return f"""
WITH sl AS ({sk(left, lk)}),
sr AS ({sk(right, rk)}),
ip AS (
    SELECT sl.hrow, sum(sl.cnt * sr.cnt) AS ip
    FROM sl JOIN sr USING (hrow, bucket)
    GROUP BY 1
),
est AS (SELECT CAST(CASE WHEN count(*) < {d} THEN 0
                         ELSE min(ip) END AS BIGINT) AS est_size
        FROM ip),
ex AS (
    SELECT CAST(coalesce(sum(na * nb), 0) AS BIGINT) AS exact_size
    FROM (SELECT {lk} AS k, count(*) AS na FROM {left} GROUP BY 1) a
    JOIN (SELECT {rk} AS k, count(*) AS nb FROM {right} GROUP BY 1) b
      USING (k)
)
SELECT ex.exact_size, est.est_size,
       round(CAST(est.est_size - ex.exact_size AS DOUBLE)
             / ex.exact_size, 4) AS rel_err
FROM ex, est
"""


ORACLE_SQL["join_size_est"] = _join_size_sql(
    "lineitem", "orders", "l_orderkey", "o_orderkey")
