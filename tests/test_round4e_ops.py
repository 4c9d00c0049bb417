"""Round-4 wave-e operators: trigram journey flows, per-doc shingle
novelty, and the corpus Zipf power-law fit."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import count_exchanges
from yahoo_anomaly_detection_spark.operators import (
    curation,
    journeys,
    textstats,
)


# ------------------------------------------------- trigram_flows
def _ev(spark, rows):
    t0 = dt.datetime(2024, 6, 1)
    data = [(i, t0 + dt.timedelta(seconds=i), u, t, 1.0)
            for i, (u, t) in enumerate(rows)]
    return spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double")


def test_trigram_flows_counts_and_user_boundaries(spark):
    """Two users: trigrams never cross the user boundary, counts are
    exact, users with < 3 events contribute nothing."""
    ev = _ev(spark, [
        (1, "a"), (1, "b"), (1, "c"), (1, "a"), (1, "b"), (1, "c"),
        (2, "x"), (2, "y"),  # depth 2 -> no trigram
    ])
    out = {(r.t1, r.t2, r.t3): r.n for r in
           journeys.trigram_flows(ev).collect()}
    assert out == {("a", "b", "c"): 2, ("b", "c", "a"): 1,
                   ("c", "a", "b"): 1}


def test_trigram_flows_topk_deterministic_tiebreak(spark):
    """At the k boundary, ties break by (t1, t2, t3) asc."""
    ev = _ev(spark, [(1, "b"), (1, "b"), (1, "b"),
                     (2, "a"), (2, "a"), (2, "a")])
    out = journeys.trigram_flows(ev, k=1).collect()
    assert len(out) == 1
    assert (out[0].t1, out[0].t2, out[0].t3) == ("a", "a", "a")


def test_trigram_flows_single_exchange_before_agg(spark):
    """Both leads ride ONE user-key exchange; with the tiny groupBy
    and the top-k that's at most 2 shuffles total, never 3."""
    ev = _ev(spark, [(1, "a")] * 5)
    assert count_exchanges(journeys.trigram_flows(ev)) <= 2


# ------------------------------------------------- shingle_novelty
def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")


def test_shingle_novelty_first_doc_owns_everything(spark):
    """doc0 introduces all its shingles (novelty 1); an exact copy at
    doc1 introduces none (novelty 0); a half-overlap doc scores in
    between; a too-short doc gets NULL."""
    base = "w1 w2 w3 w4 w5"           # 3-shingles: 3
    out = {r.doc_id: r for r in curation.shingle_novelty(_docs(spark, [
        base,                          # doc0: all novel
        base,                          # doc1: exact copy -> 0
        "w3 w4 w5 w6 w7",              # doc2: shares (w3 w4 w5) only
        "w1 w2",                       # doc3: < n tokens -> no shingles
    ]), n=3).collect()}
    assert out[0].n_shingles == 3 and out[0].novelty == 1.0
    assert out[1].n_shingles == 3 and out[1].novelty == 0.0
    assert out[2].n_shingles == 3 and out[2].n_novel == 2
    assert abs(out[2].novelty - round(2 / 3, 4)) < 1e-9
    assert out[3].n_shingles == 0 and out[3].novelty is None


def test_shingle_novelty_every_shingle_charged_once(spark):
    """Conservation: sum(n_novel) == count of distinct shingles in the
    corpus (each distinct shingle is novel for exactly one doc)."""
    texts = ["a b c d e", "c d e f g", "f g h a b", "a b c d e f g h"]
    df = curation.shingle_novelty(_docs(spark, texts), n=3)
    total_novel = df.agg(F.sum("n_novel")).collect()[0][0]
    distinct = set()
    for t in texts:
        w = t.split()
        distinct |= {" ".join(w[i:i + 3]) for i in range(len(w) - 2)}
    assert total_novel == len(distinct)


# ------------------------------------------------- zipf_fit
def test_zipf_fit_recovers_planted_power_law(spark):
    """Plant counts n(r) = round(1000 * r^-0.8): the fit must recover
    slope ~ -0.8 with r2 ~ 1 (exact OLS vs math.log10 replica)."""
    texts = []
    toks = []
    for r in range(1, 51):
        toks += [f"tok{r:03d}"] * round(1000 * r ** -0.8)
    # spread tokens over a few docs (split is per-doc, counts global)
    step = len(toks) // 7 + 1
    texts = [" ".join(toks[i:i + step]) for i in range(0, len(toks), step)]
    row = textstats.zipf_fit(_docs(spark, texts), k=50).collect()[0]
    assert row.n_terms == 50
    # exact replica: ranks are count-desc, token-asc
    counts = sorted(
        ((round(1000 * r ** -0.8), f"tok{r:03d}") for r in range(1, 51)),
        key=lambda p: (-p[0], p[1]))
    xs = [math.log10(i + 1) for i in range(50)]
    ys = [math.log10(c) for c, _ in counts]
    n = 50.0
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert abs(row.slope - round(slope + 1e-9, 4)) < 2e-4
    assert -0.85 < row.slope < -0.75
    assert row.r2 > 0.99


def test_zipf_fit_degenerate_single_term(spark):
    """One distinct token: var(x) = 0 -> slope/intercept/r2 NULL, not
    NaN/zero-division."""
    row = textstats.zipf_fit(_docs(spark, ["solo solo solo"]),
                             k=10).collect()[0]
    assert row.n_terms == 1
    assert row.slope is None and row.intercept is None and row.r2 is None
