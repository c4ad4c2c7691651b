"""Point-in-interval join (state/joins.interval_join): semantics,
bucket-boundary exactness, replication bounds, and pandas-reference parity
(the sf0.01 SQL cross-check runs via tests/test_queries.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.state.joins import interval_join


def _ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_pandas(df).repartition(blocks)


def _ref(points: pd.DataFrame, ivals: pd.DataFrame, by: list[str]) -> pd.DataFrame:
    m = points.merge(ivals, on=by) if by else points.merge(ivals, how="cross")
    m = m[(m["start"] <= m["t"]) & (m["t"] < m["end"])]
    return m.sort_values(["pid", "iid"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def numeric_case():
    rng = np.random.RandomState(3)
    n_p, n_i = 4000, 300
    points = pd.DataFrame({
        "pid": np.arange(n_p, dtype="int64"),
        "k": rng.randint(0, 5, n_p).astype("int64"),
        "t": rng.randint(0, 10_000, n_p).astype("int64"),
    })
    start = rng.randint(0, 10_000, n_i).astype("int64")
    ivals = pd.DataFrame({
        "iid": np.arange(n_i, dtype="int64"),
        "k": rng.randint(0, 5, n_i).astype("int64"),
        "start": start,
        "end": start + rng.randint(0, 500, n_i),  # includes empty intervals
    })
    return points, ivals


class TestIntervalJoin:
    def test_matches_pandas_reference_keyed(self, numeric_case):
        points, ivals = numeric_case
        got = interval_join(
            _ds(points), _ds(ivals), on="t", right_start="start",
            right_end="end", by=["k"], bucket_width=256,
        ).to_pandas().sort_values(["pid", "iid"]).reset_index(drop=True)
        ref = _ref(points, ivals, ["k"])
        pd.testing.assert_frame_equal(
            got[["pid", "k", "t", "iid", "start", "end"]],
            ref[["pid", "k", "t", "iid", "start", "end"]],
            check_like=True,
        )

    def test_no_by_key_and_width_independence(self, numeric_case):
        points, ivals = numeric_case
        ref = _ref(points.head(500), ivals.drop(columns="k"), [])
        for width in (64, 1000, 50_000):
            got = interval_join(
                _ds(points.head(500)), _ds(ivals.drop(columns="k")),
                on="t", right_start="start", right_end="end",
                bucket_width=width,
            ).to_pandas().sort_values(["pid", "iid"]).reset_index(drop=True)
            assert len(got) == len(ref), f"width={width}"
            assert got["pid"].tolist() == ref["pid"].tolist()
            assert got["iid"].tolist() == ref["iid"].tolist()

    def test_half_open_boundaries(self):
        points = pd.DataFrame({"pid": [0, 1, 2], "t": [10, 19, 20]})
        ivals = pd.DataFrame({"iid": [0], "start": [10], "end": [20]})
        got = interval_join(_ds(points, 1), _ds(ivals, 1), on="t",
                            right_start="start", right_end="end",
                            bucket_width=7).to_pandas()
        assert sorted(got["pid"]) == [0, 1]  # start inclusive, end exclusive

    def test_timestamps_and_timedelta_width(self):
        t0 = pd.Timestamp("2025-01-01")
        points = pd.DataFrame({
            "pid": np.arange(6, dtype="int64"),
            "t": [t0 + pd.Timedelta(hours=h) for h in (0, 5, 23, 24, 30, 200)],
        })
        ivals = pd.DataFrame({
            "iid": [0, 1],
            "start": [t0, t0 + pd.Timedelta(days=1)],
            "end": [t0 + pd.Timedelta(days=1), t0 + pd.Timedelta(days=2)],
        })
        got = interval_join(_ds(points, 2), _ds(ivals, 1), on="t",
                            right_start="start", right_end="end",
                            bucket_width=pd.Timedelta(hours=6)).to_pandas()
        match = dict(zip(got["pid"], got["iid"]))
        assert match == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}

    def test_empty_interval_matches_nothing(self):
        points = pd.DataFrame({"pid": [0], "t": [5]})
        ivals = pd.DataFrame({"iid": [0, 1], "start": [5, 9], "end": [5, 3]})
        got = interval_join(_ds(points, 1), _ds(ivals, 1), on="t",
                            right_start="start", right_end="end",
                            bucket_width=4).to_pandas()
        assert len(got) == 0

    def test_bad_width_raises(self):
        with pytest.raises(ValueError):
            interval_join(_ds(pd.DataFrame({"t": [1]})), _ds(pd.DataFrame({
                "start": [0], "end": [1]})), on="t", right_start="start",
                right_end="end", bucket_width=0)
