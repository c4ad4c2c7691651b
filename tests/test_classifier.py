"""Quality-classifier training (stages/classifier): separable-data
convergence, bit-exact parallelism invariance, reference mirror vs a
dense single-process numpy implementation, scoring direction, and
feature-mode contracts. The registered ``quality_classifier_history``
golden at sf0.01 is covered by tests/test_queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.classifier import (_SCALE, _featurize,
                                                     classifier_score,
                                                     train_quality_classifier)

pytestmark = pytest.mark.usefixtures("ray_session")

_GOOD = ["insight", "analysis", "careful", "thorough", "evidence"]
_BAD = ["spam", "click", "win", "free", "offer"]
_SHARED = ["the", "a", "of", "and", "to"]


def _docs(n: int = 120) -> pd.DataFrame:
    rng = np.random.default_rng(3)
    rows = []
    for i in range(n):
        y = i % 2
        vocab = _GOOD if y else _BAD
        words = list(rng.choice(vocab, 10)) + list(rng.choice(_SHARED, 8))
        rng.shuffle(words)
        rows.append((i, " ".join(words), y))
    return pd.DataFrame(rows, columns=["doc_id", "text", "y"])


def _reference(docs: pd.DataFrame, dim: int, iters: int, lr: float):
    """Single-process mirror using the SAME per-row int64 quantization."""
    x = _featurize(docs, "text", dim)
    y = docs["y"].to_numpy(dtype=np.float64)
    w = np.zeros(dim + 1)
    hist = []
    for it in range(iters):
        z = x @ w[:dim] + w[dim]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g_rows = np.concatenate([err[:, None] * x, err[:, None]], axis=1)
        g = np.round(g_rows * _SCALE).astype(np.int64).sum(axis=0)
        eps = 1e-12
        lr_ = -(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
        loss = float(np.round(lr_ * _SCALE).astype(np.int64).sum()) / _SCALE / len(y)
        acc = float(((p >= 0.5) == (y >= 0.5)).mean())
        hist.append((it, round(loss, 6), round(acc, 6)))
        w = w - lr * (g.astype(np.float64) / _SCALE / len(y))
    return w, pd.DataFrame(hist, columns=["iter", "loss", "acc"]).astype(
        {"iter": "int64"})


def test_converges_and_mirrors_reference():
    docs = _docs()
    w, hist = train_quality_classifier(
        rd.from_pandas(docs).repartition(4), "text", "y", dim=64, iters=15)
    assert hist["acc"].iloc[-1] == 1.0
    assert hist["loss"].is_monotonic_decreasing
    w_ref, hist_ref = _reference(docs, 64, 15, 2.0)
    assert (w == w_ref).all()
    pd.testing.assert_frame_equal(hist, hist_ref)


def test_bitwise_parallelism_invariance():
    docs = _docs()
    w1, h1 = train_quality_classifier(
        rd.from_pandas(docs).repartition(1), "text", "y", dim=64, iters=8)
    w2, h2 = train_quality_classifier(
        rd.from_pandas(docs).repartition(9), "text", "y", dim=64, iters=8)
    assert (w1 == w2).all()
    pd.testing.assert_frame_equal(h1, h2)


def test_score_direction():
    docs = _docs()
    w, _ = train_quality_classifier(
        rd.from_pandas(docs).repartition(3), "text", "y", dim=64, iters=15)
    probe = pd.DataFrame({
        "text": ["insight evidence careful analysis of the data",
                 "free spam click to win the offer"]})
    out = classifier_score(rd.from_pandas(probe), "text", w).to_pandas()
    assert out["quality_prob"].iloc[0] > 0.5 > out["quality_prob"].iloc[1]


def test_feature_modes():
    df = pd.DataFrame({"text": ["a a a b", "", None]})
    xb = _featurize(df, "text", 32, "binary")
    xt = _featurize(df, "text", 32, "tf")
    assert xb.max() == 1.0 and set(np.unique(xb)) <= {0.0, 1.0}
    assert np.isclose(xt[0].sum(), 1.0) and xt[1].sum() == xt[2].sum() == 0.0
    assert xt[0].max() == 0.75  # 3 of 4 tokens in one bucket
