"""roc_auc operator vs a pure-numpy oracle (and sklearn when present)."""

from __future__ import annotations

import numpy as np
import pytest

from yahoo_anomaly_detection_spark.operators.stats import roc_auc


def _np_auroc(scores: np.ndarray, labels: np.ndarray) -> float:
    """Mann-Whitney with average ranks (ties handled like sklearn)."""
    order = np.argsort(scores, kind="mergesort")
    s, l = scores[order], labels[order]
    ranks = np.empty(len(s), dtype=np.float64)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        ranks[i:j] = (i + j + 1) / 2.0  # average 1-based rank
        i = j
    n_pos = int(l.sum())
    n_neg = len(l) - n_pos
    return (ranks[l == 1].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)


def _np_ap(scores: np.ndarray, labels: np.ndarray) -> float:
    """sklearn-style average precision over distinct-score groups."""
    uniq = np.unique(scores)[::-1]
    n_pos = labels.sum()
    cum_pos = cum_all = 0
    ap = 0.0
    for u in uniq:
        m = scores == u
        pos = int(labels[m].sum())
        cum_pos += pos
        cum_all += int(m.sum())
        ap += (cum_pos / cum_all) * (pos / n_pos)
    return ap


@pytest.mark.parametrize("with_ties", [False, True])
def test_roc_auc_matches_numpy(spark, with_ties):
    rng = np.random.default_rng(11)
    n = 500
    labels = (rng.random(n) < 0.2).astype(int)
    scores = rng.normal(size=n) + labels * 0.8
    if with_ties:
        scores = np.round(scores, 1)  # heavy ties
    df = spark.createDataFrame(
        [(float(s), int(l)) for s, l in zip(scores, labels)],
        "score double, label int",
    )
    row = roc_auc(df, "score", "label").collect()[0]
    assert row["auroc"] == pytest.approx(_np_auroc(scores, labels), abs=1e-9)
    assert row["average_precision"] == pytest.approx(
        _np_ap(scores, labels), abs=1e-9
    )
    assert row["n_pos"] == int(labels.sum())

    try:
        from sklearn.metrics import average_precision_score, roc_auc_score
    except ImportError:
        return
    assert row["auroc"] == pytest.approx(
        roc_auc_score(labels, scores), abs=1e-9
    )
    assert row["average_precision"] == pytest.approx(
        average_precision_score(labels, scores), abs=1e-9
    )
