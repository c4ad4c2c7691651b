"""Distributed k-means with fixed-point deterministic updates
(stages/similarity.kmeans)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.similarity import (
    _KMEANS_SCALE,
    kmeans,
    kmeans_cluster_sizes,
)


def _blobs(n=600, dim=8, k=3, seed=4):
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, dim) * 3
    labels = rng.randint(0, k, n)
    x = centers[labels] + rng.randn(n, dim) * 0.3
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [row.astype(np.float32) for row in x / 10.0],  # |v| < 1
    }), labels


def _reference_kmeans(df, dim, k, iters, seed):
    """Single-process mirror of the SAME quantized algorithm."""
    x = np.vstack(df["embedding"].to_numpy()).astype(np.float64)

    def hkey(v):
        return hashlib.md5(f"k{seed}\x1f{v}".encode()).hexdigest()

    order = sorted(range(len(df)), key=lambda i: hkey(df["vec_id"].iloc[i]))
    cent = x[order[:k]].copy()
    for _ in range(iters):
        scores = x @ cent.T - 0.5 * (cent * cent).sum(axis=1)
        lab = np.argmax(scores, axis=1)
        q = np.round(x * _KMEANS_SCALE).astype(np.int64)
        for c in range(k):
            m = lab == c
            if m.any():
                cent[c] = q[m].sum(axis=0, dtype=np.int64) / m.sum() / _KMEANS_SCALE
    return cent


class TestKmeans:
    def test_matches_reference_and_parallelism_invariant(self):
        df, _ = _blobs()
        want = _reference_kmeans(df, 8, 3, 5, seed=4)
        # driver_max_bytes=0 forces the distributed tier; default auto-gates
        # to the driver tier at this size — BOTH must be bit-identical to
        # the single-process mirror (integer sums are associative)
        for dmb in (0, 128 << 20):
            for blocks in (1, 13):
                cent, _fn = kmeans(rd.from_pandas(df).repartition(blocks),
                                   "vec_id", "embedding", 8, 3, iters=5,
                                   seed=4, driver_max_bytes=dmb)
                np.testing.assert_array_equal(cent, want)  # BIT-identical

    def test_recovers_planted_blobs(self):
        df, true_labels = _blobs()
        _, assign_fn = kmeans(rd.from_pandas(df).repartition(5),
                              "vec_id", "embedding", 8, 3, iters=10, seed=4)
        got = assign_fn(rd.from_pandas(df)).to_pandas().sort_values("vec_id")
        # cluster/label agreement up to permutation: purity > 95%
        tab = pd.crosstab(got["cluster"].to_numpy(), true_labels)
        assert tab.max(axis=1).sum() / len(df) > 0.95

    def test_cluster_sizes_query_shape(self):
        df, _ = _blobs(n=200)
        out = kmeans_cluster_sizes(rd.from_pandas(df).repartition(3),
                                   "vec_id", "embedding", 8, 3, iters=3, seed=4)
        assert list(out.columns) == ["cluster", "size", "centroid_norm"]
        assert out["size"].sum() == 200
