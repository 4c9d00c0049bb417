"""Operator-internal cache registry.

Several operators materialize an intermediate relation that feeds a
self-join (shingles, LSH bands) or multiple consumers (gap-fill
skeleton bounds + join) — without a materialized cache Spark
re-evaluates the subtree per consumer (measured ~40× slower for the
shingle explode at sf0.1). Those persists cannot be released inside
the operator (the returned DataFrame is lazy; the cache must survive
until the caller's action runs), so they register here and the
CALLER releases them once its action completes:

    from yahoo_anomaly_detection_spark import caching
    result = some_query(...).collect()
    caching.release_all()

Long-lived sessions (benchmarks, the oracle harness, notebooks) call
``release_all()`` between queries; short-lived jobs can skip it — the
caches die with the session.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def materialize(df: DataFrame) -> DataFrame:
    """persist() + eager count() + registration.

    The eager count matters for self-joins: both sides of a join on a
    not-yet-computed cached relation race and each recomputes the
    subtree; counting first fills the cache once.
    """
    df = df.persist()
    df.count()
    _LIVE.append(df)
    return df


def register(df: DataFrame) -> DataFrame:
    """Register an already-persisted DataFrame for later release
    (for call sites that persist lazily on purpose)."""
    _LIVE.append(df)
    return df


def release_all() -> int:
    """Unpersist every registered relation; returns how many."""
    n = 0
    while _LIVE:
        try:
            _LIVE.pop().unpersist()
        except Exception:
            pass  # session may already be stopped
        n += 1
    return n
