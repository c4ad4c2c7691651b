"""Bloom-prefiltered shuffle hash join: no false negatives (exact parity
with the plain tiers), real pre-shuffle row reduction, and the raw
build/filter primitives."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


class TestBloomJoin:
    def test_parity_with_plain_tiers(self, ray_session):
        from docprocai_service_ray.state.joins import hash_join

        rng = np.random.RandomState(31)
        left = pd.DataFrame(
            {
                "k": rng.randint(0, 5000, 20_000),  # most keys unmatched
                "x": rng.randn(20_000),
            }
        )
        right = pd.DataFrame({"k": np.arange(0, 5000, 7), "y": np.arange(0, 5000, 7) * 2})
        lds, rds = rd.from_pandas(left).repartition(6), rd.from_pandas(right)
        plain = hash_join(lds, rds, on="k", strategy="shuffle").to_pandas()
        bloomed = hash_join(
            lds, rds, on="k", strategy="shuffle", bloom_prefilter=True
        ).to_pandas()
        pd.testing.assert_frame_equal(_sorted(plain), _sorted(bloomed))
        # sanity vs pandas (shuffle tier's unioned schema yields object
        # dtype for right-only columns — compare values, not dtypes)
        want = left.merge(right, on="k", how="inner")
        pd.testing.assert_frame_equal(
            _sorted(plain), _sorted(want), check_dtype=False
        )

    def test_prefilter_drops_most_nonmatching_rows(self, ray_session):
        from docprocai_service_ray.state.joins import (
            bloom_filter_batches,
            build_key_bloom,
        )

        rng = np.random.RandomState(8)
        right = pd.DataFrame({"k": np.arange(100)})
        left = pd.DataFrame({"k": rng.randint(0, 100_000, 50_000)})
        bits = 1 << 20
        bloom = build_key_bloom(rd.from_pandas(right).repartition(3), ["k"], bits=bits)
        kept = bloom_filter_batches(
            rd.from_pandas(left).repartition(5), ["k"], ray.put(bloom), bits=bits
        ).to_pandas()
        true_matches = left[left["k"].isin(right["k"])]
        # every true match survives (no false negatives)…
        assert set(true_matches["k"]).issubset(set(kept["k"]))
        # …and the pass-through rate is near the true match rate (~0.1%):
        # a generous 10× bound still proves real pre-shuffle reduction
        assert len(kept) <= max(10 * len(true_matches), 200), (
            len(kept), len(true_matches))

    def test_multi_key_and_empty(self, ray_session):
        from docprocai_service_ray.state.joins import hash_join

        left = pd.DataFrame({"a": [1, 1, 2, 3], "b": ["x", "y", "x", "z"], "v": range(4)})
        right = pd.DataFrame({"a": [1, 2], "b": ["y", "x"], "w": [10, 20]})
        out = hash_join(
            rd.from_pandas(left), rd.from_pandas(right), on=["a", "b"],
            strategy="shuffle", bloom_prefilter=True,
        ).to_pandas()
        want = left.merge(right, on=["a", "b"], how="inner")
        pd.testing.assert_frame_equal(_sorted(out), _sorted(want), check_dtype=False)
        empty = left.iloc[:0]
        out2 = hash_join(
            rd.from_pandas(empty), rd.from_pandas(right), on=["a", "b"],
            strategy="shuffle", bloom_prefilter=True,
        )
        assert out2.count() == 0
