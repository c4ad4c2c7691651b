"""Skew-join behavior (VERDICT r01 next-round #3): a head key holding 50%
of the left rows must not change results when salted across merge tasks,
and auto bucket sizing must pick sane counts from metadata only."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from docprocai_service_ray.state.joins import auto_buckets, hash_join


def _skewed_sides():
    n = 20_000
    rng = np.random.RandomState(7)
    keys = np.where(rng.rand(n) < 0.5, 0, rng.randint(1, 500, size=n))
    left = rd.from_arrow(
        pa.table({"k": keys.astype("int64"), "v": np.arange(n, dtype="int64")})
    )
    right = rd.from_arrow(
        pa.table(
            {"k": np.arange(500, dtype="int64"),
             "w": (np.arange(500, dtype="int64") * 10)}
        )
    )
    return left, right


def _agg(ds) -> dict:
    df = pd.concat(list(ds.to_pandas(limit=None) for _ in [0]))
    return {
        "rows": len(df),
        "sum_v": int(df["v"].sum()),
        "sum_w": int(df["w"].sum()),
    }


def test_salted_join_matches_unsalted():
    left, right = _skewed_sides()
    plain = _agg(hash_join(left, right, on="k", buckets=8))
    salted = _agg(hash_join(left, right, on="k", buckets=8, salt=4))
    assert salted == plain
    # ground truth: every left row matches exactly one right row
    assert plain["rows"] == 20_000


def test_salted_join_spreads_head_key():
    """With salt=4 the head key's rows are spread over multiple sub-keys
    (deterministically), so no single merge task holds all of them."""
    left, right = _skewed_sides()
    out = hash_join(left, right, on="k", buckets=8, salt=4)
    df = out.to_pandas(limit=None)
    assert len(df) == 20_000
    # determinism: running again yields identical rows
    df2 = hash_join(left, right, on="k", buckets=8, salt=4).to_pandas(limit=None)
    a = df.sort_values(["k", "v"]).reset_index(drop=True)
    b = df2.sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


def test_auto_buckets_metadata_only():
    left, right = _skewed_sides()
    b = auto_buckets(left, right)
    assert 8 <= b <= 4096
    # a mapped dataset over an in-memory table still resolves via its deps
    mapped = left.map_batches(lambda t: t, batch_format="pyarrow")
    assert 8 <= auto_buckets(mapped, right) <= 4096
