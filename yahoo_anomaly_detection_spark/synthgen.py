"""Deterministic distributed generator of the transcripts table.

Schema per BASELINE.json input_hint:
    (conv_id string, turn_idx int, role string, text string,
     tool string, ts timestamp)

Design (FIXTURES.md F1):
- Generation is keyed per conversation: every conversation derives its
  own ``numpy.random.Generator`` seeded by ``(seed, conv_index)``, so
  the output is bit-identical regardless of partitioning, parallelism
  or row count of the surrounding job (scale-out safe determinism).
- Distributed: ``spark.range(n_convs)`` → ``mapInPandas`` — no
  driver-side materialization, scales to any row count.
- Inter-turn gaps echo the reference's Yahoo Bag-of-Functions pool
  (Sin/Lin/Gaus/Exp_Sat selected at /root/reference/main.py:53-56,
  formulas at /root/reference/Network/ITF/functions.py:58-69,180-189,
  287-298,191-203): base linear trend + sinusoidal diurnal term +
  Gaussian burst + exponential-saturation warm-up, plus seeded anomaly
  runs (latency cliffs / rate surges) with ground-truth labels exposed
  by :func:`gen_anomaly_labels` (plays Yahoo S5's is_anomaly column,
  cf. labels consumed at
  /root/reference/StatsTesting/base_anomaly_stats.py:16-26).
- ~1% of conversations are "hot" (50–100× median turns) to exercise
  the skew/salting path; multi-bucket silences are injected for
  gap-fill coverage.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

EPOCH = np.datetime64("2025-01-01T00:00:00", "us")

TRANSCRIPTS_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), False),
    ]
)

ANOMALY_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("bucket_start", T.TimestampType(), False),
        T.StructField("kind", T.StringType(), False),
    ]
)

_VOCAB = np.array(
    (
        "the of and to in is for with on that spark query plan shuffle join "
        "agg window bucket tier rollup stream state key value row batch "
        "latency turn tool call run read write search scan filter push "
        "partition skew salt hash merge sort codec gorilla delta time"
    ).split()
)
_TOOLS = np.array(["search", "bash", "read", "write"])
_ROLES = np.array(["user", "assistant", "tool"])


def _conv_rng(seed: int, conv: int) -> np.random.Generator:
    return np.random.default_rng(np.random.SeedSequence([seed, conv]))


def _conv_plan(seed: int, conv: int, mean_turns: int, hot_every: int):
    """Deterministic per-conversation parameters + anomaly runs."""
    rng = _conv_rng(seed, conv)
    hot = hot_every > 0 and conv % hot_every == 0
    n_turns = int(rng.integers(mean_turns // 2, mean_turns * 2))
    if hot:
        n_turns *= int(rng.integers(50, 100))
    n_turns = max(n_turns, 4)
    start_off_s = float(rng.uniform(0, 30 * 86400))  # within 30 days
    # Bag-of-Functions-style gap model over turn index x (seconds):
    a_lin = float(rng.uniform(0.0, 0.02))  # Lin: a1 + a2*x
    base = float(rng.uniform(2.0, 30.0))
    a_sin = float(rng.uniform(0.0, base / 2))  # Sin: a1*sin(a2*x+a3)
    w_sin = float(rng.uniform(0.05, 0.5))
    p_sin = float(rng.uniform(0, 2 * np.pi))
    a_gau = float(rng.uniform(0.0, base))  # Gaus burst
    c_gau = float(rng.uniform(0, n_turns))
    a_sat = float(rng.uniform(0.0, base))  # Exp_Sat warm-up
    tau = float(rng.uniform(1.0, 20.0))
    # anomaly runs: 0-2 per conversation
    runs = []
    for _ in range(int(rng.integers(0, 3))):
        kind = "latency_cliff" if rng.random() < 0.5 else "rate_surge"
        i0 = int(rng.integers(0, max(n_turns - 3, 1)))
        i1 = min(n_turns, i0 + int(rng.integers(2, 8)))
        runs.append((kind, i0, i1))
    # one long silence (multi-bucket gap) in ~30% of conversations
    silence_at = int(rng.integers(1, n_turns)) if rng.random() < 0.3 else -1
    return rng, n_turns, start_off_s, (a_lin, base, a_sin, w_sin, p_sin, a_gau, c_gau, a_sat, tau), runs, silence_at


def _conv_timestamps(n_turns, start_off_s, params, runs, silence_at, rng):
    a_lin, base, a_sin, w_sin, p_sin, a_gau, c_gau, a_sat, tau = params
    x = np.arange(n_turns, dtype=np.float64)
    gaps = (
        base
        + a_lin * x
        + a_sin * np.sin(w_sin * x + p_sin)
        + a_gau * np.exp(-0.01 * (x - c_gau) ** 2)
        + a_sat * (1.0 - np.exp(-x / tau))
        + rng.exponential(1.0, n_turns)
    )
    for kind, i0, i1 in runs:
        if kind == "latency_cliff":
            gaps[i0:i1] *= 40.0
        else:  # rate_surge
            gaps[i0:i1] *= 0.02
    if silence_at >= 0:
        gaps[silence_at] += 600.0  # >= 10 one-minute buckets of silence
    off_us = (start_off_s + np.cumsum(gaps)) * 1e6
    return EPOCH + off_us.astype("timedelta64[us]")


def _conv_turns(seed: int, conv: int, mean_turns: int, hot_every: int,
                max_words: int) -> pd.DataFrame:
    rng, n_turns, start_off_s, params, runs, silence_at = _conv_plan(
        seed, conv, mean_turns, hot_every
    )
    ts = _conv_timestamps(n_turns, start_off_s, params, runs, silence_at, rng)
    idx = np.arange(n_turns, dtype=np.int32)
    roles = _ROLES[np.where(rng.random(n_turns) < 0.10, 2, idx % 2)]
    tool_mask = rng.random(n_turns) < 0.15
    tools = np.where(tool_mask, _TOOLS[rng.integers(0, len(_TOOLS), n_turns)], None)
    n_words = rng.integers(3, max_words + 1, n_turns)
    words = _VOCAB[rng.integers(0, len(_VOCAB), int(n_words.sum()))]
    bounds = np.cumsum(n_words)[:-1]
    texts = [" ".join(w) for w in np.split(words, bounds)]
    return pd.DataFrame(
        {
            "conv_id": f"conv_{conv:08d}",
            "turn_idx": idx,
            "role": roles,
            "text": texts,
            "tool": tools,
            "ts": ts,
        }
    )


def gen_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    mean_turns: int = 40,
    hot_every: int = 100,
    max_words: int = 40,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic transcripts table."""
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for conv in pdf["id"].to_numpy():
                yield _conv_turns(seed, int(conv), mean_turns, hot_every, max_words)

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=TRANSCRIPTS_SCHEMA)
    )


def gen_anomaly_labels(
    spark: SparkSession,
    n_convs: int = 200,
    seed: int = 42,
    mean_turns: int = 40,
    hot_every: int = 100,
    partitions: int | None = None,
) -> DataFrame:
    """Ground-truth anomaly sidecar: affected 1-minute buckets per run.

    Derived from the same per-conversation RNG stream as
    :func:`gen_transcripts`, so labels always align with the data.
    """
    parts = partitions or max(spark.sparkContext.defaultParallelism, 8)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for conv in pdf["id"].to_numpy():
                rng, n_turns, start_off_s, params, runs, silence_at = _conv_plan(
                    seed, int(conv), mean_turns, hot_every
                )
                if not runs:
                    continue
                ts = _conv_timestamps(
                    n_turns, start_off_s, params, runs, silence_at, rng
                )
                minute = ts.astype("datetime64[m]")
                for kind, i0, i1 in runs:
                    for b in np.unique(minute[i0:i1]):
                        out.append((f"conv_{int(conv):08d}",
                                    pd.Timestamp(b), kind))
            yield pd.DataFrame(
                out, columns=["conv_id", "bucket_start", "kind"]
            ) if out else pd.DataFrame(
                {"conv_id": pd.Series(dtype=str),
                 "bucket_start": pd.Series(dtype="datetime64[us]"),
                 "kind": pd.Series(dtype=str)}
            )

    return (
        spark.range(0, n_convs, numPartitions=parts)
        .mapInPandas(gen, schema=ANOMALY_SCHEMA)
        .dropDuplicates(["conv_id", "bucket_start", "kind"])
    )
