"""User-journey flow analytics over the events stream table.

The transcript-flavored companions to sessionize/funnel/retention:
what SEQUENCE shape does each user's (or conversation's) event stream
have? Four operators, each an agent-log / product-analytics staple
(no reference counterpart — the reference has no event-log layer):

- :func:`event_transitions` — the first-order Markov transition
  matrix of consecutive event types per user: the "role/tool
  transition profile" of an agent-transcript corpus (user→assistant
  →tool→assistant… at 10^12-turn scale), or the page-flow matrix of
  a clickstream.
- :func:`type_streaks` — each user's longest run of consecutive
  same-type events and which type it was: the "agent autonomy
  streak" (how many tool/assistant turns between user touches) or
  retry-storm detector.
- :func:`depth_histogram` — the corpus-shape histogram of per-user
  event counts in exact power-of-two buckets: the depth profile a
  capacity planner reads before sizing per-conversation state.
- :func:`next_gap_1d` — per (event_type, day): how long until the
  SAME user's next event (any type) — the re-engagement metric: which
  event types are session-enders vs mid-flow steps.

Scale shape: every sequential operator hashes ONE key — ``user_id``
— and all of its window phases reuse that single exchange (lag /
lead / running-sum are all partitioned by the same key, so Catalyst
plans one Exchange with pipelined Window stages; plan-audited in
``tests/test_plans.py``). The downstream groupBys are either
map-side-combined corpus aggregates (depth histogram, next-gap
rollup) or run-keyed aggregates that reuse the user partitioning
(streaks). Outputs are (type × type)-, (bucket)-, (type × day)- or
user-cardinality-sized — never corpus-sized shuffles. Ordering is
made total with the ``(ts, event_id)`` tie-break so results are
deterministic and engine-portable (same convention as
``operators/sessions.py``).

Exact-integer log2 note: ``depth_histogram`` buckets by
floor(log2(n)) computed as ``length(base-2 digits of n) - 1``
(Spark ``conv(n, 10, 2)``, DuckDB ``bin(n)``) — pure integer/string
math, so n = 2^k lands in bucket k on every engine; a floating
``log2`` could round 2^k to k - epsilon and flip the bucket.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from yahoo_anomaly_detection_spark.functions.portable import portable_round

_R = 4


def _seq_window(user_col: str, ts_col: str, id_col: str) -> W:
    return W.partitionBy(user_col).orderBy(
        F.col(ts_col).cast("timestamp"), F.col(id_col)
    )


def event_transitions(events: DataFrame, user_col: str = "user_id",
                      type_col: str = "event_type", ts_col: str = "ts",
                      id_col: str = "event_id") -> DataFrame:
    """(from_type, to_type, n_pairs, share): first-order Markov
    transition counts of consecutive event types within each user's
    stream, plus each edge's share of its from-state's outgoing
    transitions (rows of the transition-probability matrix).

    A user's LAST event has no successor and contributes no pair
    (the lead is NULL); single-event users contribute nothing.
    ``share`` sums to 1 per from_type by construction.

    Shape: one user-key exchange for the lead window; the pair
    relation then collapses through a map-side-combined
    (from, to) groupBy to at most |types|² rows — the share window
    runs over THAT tiny relation, never the corpus."""
    w = _seq_window(user_col, ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_pairs")
    )
    tot = F.sum("n_pairs").over(W.partitionBy("from_type"))
    return counts.select(
        "from_type", "to_type", "n_pairs",
        portable_round(
            F.col("n_pairs").cast("double") / tot.cast("double"), _R
        ).alias("share"),
    )


_TRANSITIONS_SQL = """
WITH p AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
),
c AS (
    SELECT from_type, to_type, count(*) AS n_pairs
    FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
)
SELECT from_type, to_type, n_pairs,
       round(CAST(n_pairs AS DOUBLE)
             / CAST(sum(n_pairs) OVER (PARTITION BY from_type)
                    AS DOUBLE), 4) AS share
FROM c
"""


def type_streaks(events: DataFrame, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts",
                 id_col: str = "event_id") -> DataFrame:
    """(user_id, max_streak, streak_type): each user's longest run of
    consecutive same-type events and the type that achieved it. Ties
    on length resolve to the EARLIEST run (deterministic on any
    engine).

    The run decomposition is the engine's segmented-scan idiom
    (sessionize, breach_intervals): lag detects type changes, a
    running sum numbers the runs — both windows and the (user, run)
    groupBy hash the same user key, ONE exchange total; the final
    per-user reduction is ``max`` + ``max_by`` over the run relation
    (≤ one row per run), ordered by (length, -run_id) so longer wins
    and earlier breaks ties."""
    w = _seq_window(user_col, ts_col, id_col)
    run_w = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    chg = (
        F.when(
            F.lag(type_col).over(w).isNull()
            | (F.lag(type_col).over(w) != F.col(type_col)),
            1,
        )
        .otherwise(0)
    )
    tagged = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("_type"),
        F.sum(chg).over(run_w).cast("long").alias("_run"),
    )
    runs = tagged.groupBy("user_id", "_run").agg(
        F.count(F.lit(1)).alias("_len"),
        # _type is constant within a run by construction
        F.min("_type").alias("_type"),
    )
    return runs.groupBy("user_id").agg(
        F.max("_len").alias("max_streak"),
        F.max_by(
            F.col("_type"), F.struct(F.col("_len"), (-F.col("_run")))
        ).alias("streak_type"),
    )


_STREAKS_SQL = """
WITH g AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR lag(event_type) OVER w <> event_type
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
t AS (
    SELECT user_id, event_type,
           sum(chg) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS run
    FROM g
),
runs AS (
    SELECT user_id, run, count(*) AS len, min(event_type) AS etype
    FROM t GROUP BY 1, 2
),
ranked AS (
    SELECT user_id, len, etype,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY len DESC, run ASC) AS rn
    FROM runs
)
SELECT user_id, len AS max_streak, etype AS streak_type
FROM ranked WHERE rn = 1
"""


def depth_histogram(events: DataFrame,
                    user_col: str = "user_id") -> DataFrame:
    """(depth_bucket, lo, hi, n_users): histogram of per-user event
    counts in power-of-two buckets — bucket b holds users with
    2^b ≤ count < 2^(b+1). The corpus-shape profile: how deep do
    conversations/journeys run, and how heavy is the hot tail?

    floor(log2(n)) is computed EXACTLY as the base-2 digit length of
    n minus one (integer/string math, see module docstring), so
    boundary counts (n = 2^k) bucket identically on every engine.

    Shape: map-side-combined count per user (one user-key exchange),
    then a second map-side-combined groupBy that collapses users
    into ≤ 64 bucket rows."""
    per = events.groupBy(user_col).agg(F.count(F.lit(1)).alias("_n"))
    b = (
        F.length(F.conv(F.col("_n").cast("string"), 10, 2)) - F.lit(1)
    ).cast("long").alias("depth_bucket")
    hist = per.groupBy(b).agg(F.count(F.lit(1)).alias("n_users"))
    lo = F.pow(F.lit(2.0), F.col("depth_bucket")).cast("long")
    return hist.select(
        "depth_bucket",
        lo.alias("lo"),
        (lo * 2 - 1).alias("hi"),
        "n_users",
    )


_DEPTH_SQL = """
WITH d AS (SELECT user_id, count(*) AS n FROM events GROUP BY 1),
h AS (
    SELECT CAST(length(bin(n)) - 1 AS BIGINT) AS depth_bucket,
           count(*) AS n_users
    FROM d GROUP BY 1
)
SELECT depth_bucket,
       CAST(2 ** depth_bucket AS BIGINT) AS lo,
       CAST(2 ** depth_bucket * 2 - 1 AS BIGINT) AS hi,
       n_users
FROM h
"""


def next_gap_1d(events: DataFrame, user_col: str = "user_id",
                type_col: str = "event_type", ts_col: str = "ts",
                id_col: str = "event_id") -> DataFrame:
    """(event_type, day, n_events, mean_next_gap_s, n_terminal):
    re-engagement profile — for each event, how long until the SAME
    user's next event of ANY type; rolled up per (type, day).
    ``n_terminal`` counts events with no successor (each user's last
    event: the candidate session-enders); those contribute no gap to
    the mean. A (type, day) cell whose events are ALL terminal has
    ``mean_next_gap_s`` NULL.

    Shape: the lead window is the module's shared user-key exchange;
    the rollup is one map-side-combined (type, day) groupBy —
    avg/count partials merge on the reducers, no second corpus-wide
    shuffle."""
    w = _seq_window(user_col, ts_col, id_col)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = (F.lead(us).over(w) - us) / F.lit(1e6)
    day = F.date_trunc("DAY", F.col(ts_col).cast("timestamp")).alias("day")
    tagged = events.select(
        F.col(type_col).alias("event_type"), day, gap.alias("_gap")
    )
    return tagged.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_events"),
        portable_round(F.avg("_gap"), _R).alias("mean_next_gap_s"),
        F.sum(F.col("_gap").isNull().cast("long")).alias("n_terminal"),
    )


_NEXT_GAP_SQL = """
WITH g AS (
    SELECT event_type, date_trunc('day', ts) AS day,
           (lead(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id
            ) - epoch_us(ts)) / 1e6 AS gap
    FROM events
)
SELECT event_type, day, count(*) AS n_events,
       round(avg(gap), 4) AS mean_next_gap_s,
       CAST(sum(CASE WHEN gap IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_terminal
FROM g GROUP BY 1, 2
"""


def pagerank(edges: DataFrame, src_col: str = "src", dst_col: str = "dst",
             weight_col: str | None = None, damping: float = 0.85,
             iters: int = 8) -> DataFrame:
    """Weighted PageRank over an edge relation: (node, pr).

    The centrality read-out of the journey graph
    :func:`event_transitions` builds — which state do random walks of
    the corpus' flows concentrate on — complementing the transition
    MATRIX (local, one-hop) with the global stationary view. Power
    iteration with a fixed ``iters`` (the oracle-friendly
    formulation: a recursive fixpoint has no portable SQL mirror;
    8 rounds at d=0.85 contract the residual by 0.85^8 ≈ 0.27^2,
    ample for ranking stability on conversational flow graphs).

    Dangling nodes (no out-edges — e.g. an event type that only ever
    ends streams) redistribute their mass uniformly each round, the
    standard stochastic-matrix completion, so ranks always sum to 1.

    Scale shape: each round is ONE edge-keyed hash join (edges ⋈
    ranks on src) + ONE map-side-combined groupBy(dst); the rank,
    node-count and dangling-mass relations are node-cardinality- or
    scalar-sized and broadcast — the corpus-scale edge relation is
    never re-shuffled across rounds (it keeps its (src,dst) hash
    partitioning). Each round's rank relation is eagerly
    ``localCheckpoint``-ed (the Pregel superstep idiom,
    :func:`dedup.connected_components`): the rank state feeds THREE
    consumers next round (edge join, dangling sum, spine), so a lazy
    plan would triple its subtree per round — 3^iters analysis blowup
    — while the materialized state is only node-cardinality-sized.
    Previous rounds' blocks are unpersisted as soon as the next round
    materializes (no session-lifetime accumulation).
    """
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    wcol = (F.col(weight_col).cast("double") if weight_col
            else F.lit(1.0))
    e = (edges.groupBy(F.col(src_col).alias("src"),
                       F.col(dst_col).alias("dst"))
         .agg(F.sum(wcol).alias("w")))
    en = e.select(
        "src", "dst",
        (F.col("w") / F.sum("w").over(W.partitionBy("src"))).alias("p"),
    )
    # materialize the normalized edge relation ONCE: it feeds the
    # contrib join of every round, and lazily it would re-run the
    # upstream corpus scan (for pagerank_types: the full lead-window
    # pair extraction) 8 times — measured 19.6 s -> ~6 s at sf0.1
    from yahoo_anomaly_detection_spark import caching

    en = caching.materialize(en)
    e = en  # nodes/srcs below derive from the cached relation
    from .dedup import _persistent_rdd_ids, _unpersist_rdd_ids

    spark = edges.sparkSession
    nodes = (e.select(F.col("src").alias("node"))
             .union(e.select(F.col("dst").alias("node")))
             .distinct())
    n1 = nodes.agg(F.count(F.lit(1)).cast("double").alias("n"))
    # WHICH nodes are dangling is static across rounds (only their
    # mass changes), so the membership anti-join runs ONCE here and
    # rides the checkpointed rank state as a boolean — each round
    # then computes the dangling mass with a plain conditional sum
    # instead of re-shuffling ranks against the src set.
    srcs = en.select(F.col("src").alias("node")).distinct()
    ids_before = _persistent_rdd_ids(spark)
    ranks = (
        nodes.join(srcs.withColumn("has_out", F.lit(True)),
                   "node", "left")
        .crossJoin(F.broadcast(n1))
        .select(
            "node", "n",
            (F.lit(1.0) / F.col("n")).alias("pr"),
            (~F.coalesce(F.col("has_out"), F.lit(False))).alias("dangling"),
        )
    ).localCheckpoint()
    live_ids = _persistent_rdd_ids(spark) - ids_before
    d = float(damping)
    for _ in range(iters):
        contrib = (
            en.join(F.broadcast(ranks.select(F.col("node").alias("src"),
                                             "pr")), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("p") * F.col("pr")).alias("s"))
        )
        dang = ranks.agg(
            F.coalesce(F.sum(F.when(F.col("dangling"), F.col("pr"))),
                       F.lit(0.0)).alias("dm"))
        ids_before = _persistent_rdd_ids(spark)
        ranks = (
            ranks.select("node", "n", "dangling")
            .join(F.broadcast(contrib), "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node", "n", "dangling",
                (F.lit(1.0 - d) / F.col("n")
                 + F.lit(d) * (F.coalesce(F.col("s"), F.lit(0.0))
                               + F.col("dm") / F.col("n"))).alias("pr"),
            )
        ).localCheckpoint()
        new_ids = _persistent_rdd_ids(spark) - ids_before
        _unpersist_rdd_ids(spark, live_ids)
        live_ids = new_ids
    return ranks.select("node", portable_round(F.col("pr"), _R).alias("pr"))


def pagerank_types(events: DataFrame, damping: float = 0.85,
                   iters: int = 8) -> DataFrame:
    """PageRank of event types over the consecutive-event transition
    graph (same edge construction as :func:`event_transitions`):
    (event_type, pr)."""
    w = _seq_window("user_id", "ts", "event_id")
    pairs = events.select(
        F.col("event_type").alias("src"),
        F.lead("event_type").over(w).alias("dst"),
    ).where(F.col("dst").isNotNull())
    out = pagerank(pairs, damping=damping, iters=iters)
    return out.select(F.col("node").alias("event_type"), "pr")


def trigram_flows(events: DataFrame, k: int = 25,
                  user_col: str = "user_id", type_col: str = "event_type",
                  ts_col: str = "ts", id_col: str = "event_id") -> DataFrame:
    """Top-k order-3 journey paths: the most frequent (t1 → t2 → t3)
    windows of consecutive event types within a user's stream —
    (t1, t2, t3, n).

    The sequence-mining step past the first-order matrix
    (:func:`event_transitions`): funnels and retry storms that a
    Markov view washes out (view→view→purchase vs view→error→view
    have identical edge sets but different trigrams). Users
    contribute max(0, depth-2) trigrams; ties at the k boundary
    break by (t1, t2, t3) asc so the cut is deterministic.

    Shape: TWO leads over the one user-key exchange (same Window →
    one Exchange, pipelined), map-side-combined groupBy to ≤ |types|³
    rows, top-k via orderBy().limit(k) = TakeOrderedAndProject."""
    w = _seq_window(user_col, ts_col, id_col)
    tri = events.select(
        F.col(type_col).alias("t1"),
        F.lead(type_col, 1).over(w).alias("t2"),
        F.lead(type_col, 2).over(w).alias("t3"),
    ).where(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    counts = tri.groupBy("t1", "t2", "t3").agg(F.count(F.lit(1)).alias("n"))
    return counts.orderBy(F.desc("n"), "t1", "t2", "t3").limit(k)


def survival_km(events: DataFrame, user_col: str = "user_id",
                ts_col: str = "ts") -> DataFrame:
    """Kaplan–Meier survival curve of user lifetime (days from first
    to last observed activity), right-censored at the corpus's last
    observed day: one row per observed lifetime
    (t_day, n_risk, n_events, n_censored, survival).

    The churn read-out :func:`~.sessions.retention_cohorts` can't
    give: naive retention treats users whose history is cut off by
    the snapshot edge as churned, biasing lifetime low; KM counts
    them at risk up to their censoring age and no further (Kaplan &
    Meier 1958). A user whose last activity falls ON the corpus's
    final day is censored (we cannot know they left); everyone else
    "died" at age ``last_day − first_day``.

    S(t) = Π_{s ≤ t} (1 − d(s)/n(s)) computed as exp(Σ ln·) over the
    age-ordered relation, with the d(s) = n(s) collapse (survival
    hits exactly 0) handled via a zero-factor counter rather than
    ln(0), which engines disagree on (NULL vs −inf).

    Scale shape: ONE map-side-combined user-keyed groupBy (corpus →
    |users| rows), a broadcast scalar cutoff, then an age-keyed
    rollup to ≤ |distinct lifetimes| rows (≤ observation span in
    days) — every window below runs on that tiny relation."""
    day = F.to_date(F.col(ts_col))
    pu = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(day).alias("f"), F.max(day).alias("l"))
    cutoff = events.agg(F.max(day).alias("cutoff"))
    u = pu.crossJoin(F.broadcast(cutoff)).select(
        F.datediff("l", "f").alias("t_day"),
        (F.col("l") < F.col("cutoff")).cast("long").alias("d"),
    )
    a = u.groupBy("t_day").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum("d").alias("n_events"),
        (F.count(F.lit(1)) - F.sum("d")).alias("n_censored"),
    )
    w_risk = (W.orderBy(F.desc("t_day"))
              .rowsBetween(W.unboundedPreceding, W.currentRow))
    r = a.select(
        "t_day", "n_events", "n_censored",
        F.sum("n_total").over(w_risk).alias("n_risk"),
    )
    w_cum = W.orderBy("t_day").rowsBetween(W.unboundedPreceding,
                                           W.currentRow)
    frac = F.col("n_events") / F.col("n_risk").cast("double")
    z = F.sum((F.col("n_events") == F.col("n_risk")).cast("long")) \
        .over(w_cum)
    ls = F.sum(F.when(F.col("n_risk") > F.col("n_events"),
                      F.log(F.lit(1.0) - frac))).over(w_cum)
    return r.select(
        "t_day", "n_risk", "n_events", "n_censored",
        portable_round(
            F.when(z > 0, F.lit(0.0))
            .otherwise(F.exp(F.coalesce(ls, F.lit(0.0)))), _R)
        .alias("survival"),
    )


_SURVIVAL_SQL = """
WITH pu AS (
    SELECT user_id, min(CAST(ts AS DATE)) AS f, max(CAST(ts AS DATE)) AS l
    FROM events GROUP BY 1
),
c AS (SELECT max(CAST(ts AS DATE)) AS cutoff FROM events),
u AS (
    SELECT date_diff('day', f, l) AS t_day,
           CASE WHEN l < (SELECT cutoff FROM c) THEN 1 ELSE 0 END AS d
    FROM pu
),
a AS (
    SELECT t_day, count(*) AS n_total,
           CAST(sum(d) AS BIGINT) AS n_events,
           CAST(count(*) - sum(d) AS BIGINT) AS n_censored
    FROM u GROUP BY 1
),
r AS (
    SELECT t_day, n_events, n_censored,
           CAST(sum(n_total) OVER (
               ORDER BY t_day DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_risk
    FROM a
),
s AS (
    SELECT t_day, n_risk, n_events, n_censored,
           sum(CASE WHEN n_events = n_risk THEN 1 ELSE 0 END) OVER w AS z,
           sum(CASE WHEN n_risk > n_events
                    THEN ln(1.0 - n_events / CAST(n_risk AS DOUBLE))
               END) OVER w AS ls
    FROM r
    WINDOW w AS (ORDER BY t_day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t_day, n_risk, n_events, n_censored,
       round(CASE WHEN z > 0 THEN 0.0
                  ELSE exp(COALESCE(ls, 0.0)) END, 4) AS survival
FROM s
"""


def _trigram_sql(k: int) -> str:
    return f"""
WITH t AS (
    SELECT event_type AS t1,
           lead(event_type, 1) OVER w AS t2,
           lead(event_type, 2) OVER w AS t3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1, t2, t3, count(*) AS n
FROM t WHERE t2 IS NOT NULL AND t3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, t1, t2, t3
LIMIT {k}
"""


def _pagerank_sql(damping: float = 0.85, iters: int = 8) -> str:
    # every r{i} references r{i-1} TWICE (edge join + dangling sum);
    # DuckDB inlines plain CTEs, so without MATERIALIZED the plan tree
    # doubles per round (2^iters scans of the events window — measured
    # 90 s at sf0.001). MATERIALIZED pins each round to one evaluation.
    d = repr(float(damping))
    parts = [f"""
WITH p AS MATERIALIZED (
    SELECT event_type AS src,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS dst
    FROM events
),
e AS MATERIALIZED (
    SELECT src, dst, CAST(count(*) AS DOUBLE) AS w
    FROM p WHERE dst IS NOT NULL GROUP BY 1, 2
),
en AS MATERIALIZED (
    SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p
    FROM e
),
nodes AS MATERIALIZED (
    SELECT src AS node FROM e UNION SELECT dst FROM e
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (
    SELECT node, 1.0 / (SELECT n FROM nn) AS pr FROM nodes
)"""]
    for i in range(1, iters + 1):
        prev = f"r{i - 1}"
        parts.append(f""",
r{i} AS MATERIALIZED (
    SELECT nodes.node,
           (1.0 - {d}) / (SELECT n FROM nn)
           + {d} * (COALESCE(c.s, 0.0)
                    + (SELECT COALESCE(sum(pr), 0.0) FROM {prev}
                       WHERE node NOT IN (SELECT src FROM en))
                      / (SELECT n FROM nn)) AS pr
    FROM nodes LEFT JOIN (
        SELECT en.dst AS node, sum(en.p * {prev}.pr) AS s
        FROM en JOIN {prev} ON en.src = {prev}.node GROUP BY 1
    ) c USING (node)
)""")
    parts.append(f"""
SELECT node AS event_type, round(pr, 4) AS pr FROM r{iters}
""")
    return "".join(parts)


ORACLE_SQL = {
    "event_transitions": _TRANSITIONS_SQL,
    "type_streaks": _STREAKS_SQL,
    "depth_hist": _DEPTH_SQL,
    "next_gap_1d": _NEXT_GAP_SQL,
    "pagerank_types": _pagerank_sql(),
    "trigram_flows": _trigram_sql(25),
    "survival_km": _SURVIVAL_SQL,
}


def markov_entropy(events: DataFrame, user_col: str = "user_id",
                   type_col: str = "event_type", ts_col: str = "ts",
                   id_col: str = "event_id") -> DataFrame:
    """Entropy profile of the first-order Markov chain over event
    types: for each from-state, the conditional next-state entropy
    H(next | from) in bits and its weight π(from)·H in the chain's
    overall entropy rate (π = empirical from-state share of all
    transitions). A perfectly predictable journey step scores 0 bits;
    a uniform fan-out over k successors scores log2(k) — the
    information-theoretic complement of :func:`event_transitions`'
    raw probabilities, standard in user-journey predictability
    analysis (e.g. Song et al., Science 2010 mobility-entropy line
    of work).

    Output: (from_type, n_out, h_bits, w_bits), floats rounded to 4.

    Scale shape: identical to :func:`event_transitions` — ONE
    user-key exchange for the lead window; everything after runs on
    the ≤|types|² count relation (window + one-row total broadcast),
    never the corpus.
    """
    w = _seq_window(user_col, ts_col, id_col)
    pairs = events.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c"))
    tot_out = F.sum("c").over(W.partitionBy("from_type"))
    p = F.col("c").cast("double") / tot_out.cast("double")
    per_edge = counts.select(
        "from_type", "c",
        tot_out.alias("n_out"),
        (-p * F.log2(p)).alias("term"),
    )
    per_from = per_edge.groupBy("from_type", "n_out").agg(
        F.sum("term").alias("h"))
    # grand-total via an empty-partition window over the <=|types|
    # per-from rows: a separate agg + crossJoin would re-evaluate the
    # corpus subtree (Spark does not dedupe the shared lineage)
    n_total = F.sum("n_out").over(W.partitionBy()).cast("double")
    return per_from.select(
        "from_type", "n_out",
        portable_round(F.col("h"), _R).alias("h_bits"),
        portable_round(
            F.col("n_out").cast("double") / n_total * F.col("h"), _R
        ).alias("w_bits"),
    )


_MARKOV_ENTROPY_SQL = """
WITH p AS (
    SELECT event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
),
c AS (
    SELECT from_type, to_type, count(*) AS c
    FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
),
e AS (
    SELECT from_type, c,
           sum(c) OVER (PARTITION BY from_type) AS n_out
    FROM c
),
f AS (
    SELECT from_type, n_out,
           sum(-(CAST(c AS DOUBLE) / CAST(n_out AS DOUBLE))
               * log2(CAST(c AS DOUBLE) / CAST(n_out AS DOUBLE)))
               AS h
    FROM e GROUP BY 1, 2
)
SELECT from_type, CAST(n_out AS BIGINT) AS n_out,
       round(h, 4) AS h_bits,
       round(CAST(n_out AS DOUBLE)
             / (SELECT CAST(sum(n_out) AS DOUBLE) FROM f) * h, 4)
           AS w_bits
FROM f
"""


ORACLE_SQL["markov_entropy"] = _MARKOV_ENTROPY_SQL


def journey_surprise(events: DataFrame, user_col: str = "user_id",
                     type_col: str = "event_type", ts_col: str = "ts",
                     id_col: str = "event_id",
                     min_trans: int = 5) -> DataFrame:
    """Sequence-anomaly score per user: mean surprisal (bits/step) of
    the user's journey under the corpus-wide first-order Markov model
    — each step costs −log2 P(to | from) with P from the global
    transition counts, so users whose paths follow rare edges score
    high. The sequence-level counterpart of the per-point detectors
    (and of ``bigram_logppl`` on document text): anomaly = improbable
    TRAJECTORY, not improbable value.

    Output: (user_id, n_trans, bits) for users with at least
    ``min_trans`` transitions, bits rounded to 4.

    Scale shape: the pair relation (one user-key window exchange)
    feeds both the global count aggregate and the scoring join —
    identical subplans, so AQE's ReusedExchange serves both from ONE
    physical shuffle; the ≤|types|² probability relation broadcasts
    back and the final per-user rollup rides the same user-key
    partitioning (superset-key distribution). No corpus re-shuffle.
    """
    w = _seq_window(user_col, ts_col, id_col)
    pairs = events.select(
        F.col(user_col).alias("uid"),
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).where(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("c"))
    tot_out = F.sum("c").over(W.partitionBy("from_type"))
    probs = counts.select(
        "from_type", "to_type",
        (F.col("c").cast("double") / tot_out.cast("double")).alias("p"))
    scored = pairs.join(F.broadcast(probs), ["from_type", "to_type"])
    return (scored.groupBy(F.col("uid").alias(user_col))
            .agg(F.count(F.lit(1)).alias("n_trans"),
                 F.avg(-F.log2("p")).alias("_bits"))
            .where(F.col("n_trans") >= min_trans)
            .select(user_col, "n_trans",
                    portable_round(F.col("_bits"), _R).alias("bits")))


def _journey_surprise_sql(min_trans: int = 5) -> str:
    return f"""
WITH p AS (
    SELECT user_id AS uid, event_type AS from_type,
           lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS to_type
    FROM events
),
pairs AS (SELECT * FROM p WHERE to_type IS NOT NULL),
c AS (
    SELECT from_type, to_type, count(*) AS c
    FROM pairs GROUP BY 1, 2
),
probs AS (
    SELECT from_type, to_type,
           CAST(c AS DOUBLE)
           / CAST(sum(c) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM c
)
SELECT pairs.uid AS user_id, count(*) AS n_trans,
       round(avg(-log2(probs.p)), 4) AS bits
FROM pairs JOIN probs USING (from_type, to_type)
GROUP BY 1
HAVING count(*) >= {min_trans}
"""


ORACLE_SQL["journey_surprise"] = _journey_surprise_sql()
