"""Deterministic training-shard shuffle (stages/sampling.shard_shuffle):
brute-force parity, permutation property, parallelism invariance, and
order alignment for num_buckets < 256 (range-scaled, not mod). The
sf0.01 SQL parity of the registered query is in tests/test_queries.py."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.sampling import shard_shuffle
from docprocai_service_ray.state.groupby import collect_pandas

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute(ids, n_shards, seed):
    rows = []
    for i in ids:
        h = hashlib.md5(f"sh{seed}\x1f{i}".encode()).hexdigest()[:16]
        rows.append((i, h, int(h[:8], 16) % n_shards))
    df = pd.DataFrame(rows, columns=["doc_id", "hkey", "shard"])
    df = df.sort_values(["shard", "hkey", "doc_id"])
    df["pos"] = df.groupby("shard").cumcount()
    return (df[["doc_id", "shard", "pos"]]
            .sort_values("doc_id").reset_index(drop=True))


def _run(ids, n_shards, seed=42, **kw):
    ds = rd.from_pandas(
        pd.DataFrame({"doc_id": np.asarray(ids, dtype="int64")})
    ).repartition(7)
    out = shard_shuffle(ds, "doc_id", n_shards, seed=seed, **kw)
    return (collect_pandas(out, ["doc_id", "shard", "pos"])
            .sort_values("doc_id").reset_index(drop=True))


def test_matches_brute_force():
    ids = list(range(500))
    got = _run(ids, 8)
    pd.testing.assert_frame_equal(got, _brute(ids, 8, 42),
                                  check_dtype=False)


def test_permutation_property():
    got = _run(range(300), 4)
    for s, g in got.groupby("shard"):
        assert sorted(g["pos"]) == list(range(len(g)))
    assert got["doc_id"].is_unique and len(got) == 300


def test_parallelism_invariance():
    ids = list(range(257))
    a = _run(ids, 5, num_partitions=2)
    b = _run(ids, 5, num_partitions=31)
    pd.testing.assert_frame_equal(a, b)


def test_small_num_buckets_stays_order_aligned():
    # regression: bucket must be a range-scaled PREFIX of the order key;
    # a mod would interleave ranges and corrupt the exclusive offsets
    ids = list(range(400))
    got = _run(ids, 3, num_buckets=16)
    pd.testing.assert_frame_equal(got, _brute(ids, 3, 42),
                                  check_dtype=False)


def test_seed_changes_permutation():
    a = _run(range(200), 4, seed=1)
    b = _run(range(200), 4, seed=2)
    assert not a.equals(b)


def test_bad_num_buckets_rejected():
    ds = rd.from_pandas(pd.DataFrame({"doc_id": [1]}))
    with pytest.raises(ValueError, match="num_buckets"):
        shard_shuffle(ds, "doc_id", 2, num_buckets=0)
