"""SQL window-function / rollup analogs (stages/windows.py):
grouped_topn_rows, running_group_agg, rollup_aggregate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.windows import (
    grouped_topn_rows,
    rollup_aggregate,
    running_group_agg,
)


def _ds(df: pd.DataFrame, blocks: int = 5):
    return rd.from_pandas(df).repartition(blocks)


@pytest.fixture(scope="module")
def skewed():
    """One hot group (80% of rows) + a tail, values with deliberate ties."""
    rng = np.random.RandomState(7)
    n = 5000
    g = np.where(rng.rand(n) < 0.8, "hot", rng.choice(list("abcde"), n))
    return pd.DataFrame({
        "g": g,
        "uid": np.arange(n, dtype="int64"),
        "v": rng.randint(0, 50, n).astype("float64"),  # many ties
    })


class TestGroupedTopnRows:
    def test_matches_pandas_reference(self, skewed):
        got = grouped_topn_rows(
            _ds(skewed), ["g"], "v", 4, descending=True, tiebreak=["uid"]
        ).to_pandas().sort_values(["g", "rn"]).reset_index(drop=True)
        ref = skewed.sort_values(["v", "uid"], ascending=[False, True], kind="stable")
        ref = ref.assign(rn=ref.groupby("g").cumcount() + 1)
        ref = ref[ref["rn"] <= 4].sort_values(["g", "rn"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["g", "uid", "v", "rn"]],
                                      ref[["g", "uid", "v", "rn"]])

    def test_parallelism_invariant(self, skewed):
        a = grouped_topn_rows(_ds(skewed, 1), ["g"], "v", 3, tiebreak=["uid"]).to_pandas()
        b = grouped_topn_rows(_ds(skewed, 17), ["g"], "v", 3, tiebreak=["uid"]).to_pandas()
        key = ["g", "rn"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )

    def test_ascending_order(self):
        df = pd.DataFrame({"g": ["x"] * 4, "uid": [1, 2, 3, 4],
                           "v": [9.0, 1.0, 5.0, 1.0]})
        got = grouped_topn_rows(_ds(df, 2), ["g"], "v", 2,
                                descending=False, tiebreak=["uid"]).to_pandas()
        assert sorted(zip(got["rn"], got["uid"])) == [(1, 2), (2, 4)]


class TestRunningGroupAgg:
    def test_matches_window_sum(self, skewed):
        got = running_group_agg(
            _ds(skewed), ["g"], ["uid"], "v", out_col="run", round_to=None
        ).to_pandas().sort_values("uid").reset_index(drop=True)
        ref = skewed.sort_values(["g", "uid"], kind="stable")
        ref = ref.assign(run=ref.groupby("g")["v"].cumsum())
        ref = ref.sort_values("uid").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, ref[got.columns.tolist()])

    def test_row_count_preserved(self, skewed):
        out = running_group_agg(_ds(skewed), ["g"], ["uid"], "v").to_pandas()
        assert len(out) == len(skewed)


class TestRollupAggregate:
    def test_all_levels_exact(self):
        df = pd.DataFrame({
            "a": ["x", "x", "y", "y", "y"],
            "b": ["p", "q", "p", "p", "q"],
            "v": [1.0, 2.0, 4.0, 8.0, 16.0],
        })
        got = rollup_aggregate(_ds(df, 3), ["a", "b"], "v").to_pandas()
        rows = {(r.a, r.b): (r.total, r.n) for r in got.itertuples()}
        assert rows[("x", "p")] == (1.0, 1)
        assert rows[("x", "q")] == (2.0, 1)
        assert rows[("y", "p")] == (12.0, 2)
        assert rows[("y", "q")] == (16.0, 1)
        assert rows[("x", "ALL")] == (3.0, 2)
        assert rows[("y", "ALL")] == (28.0, 3)
        assert rows[("ALL", "ALL")] == (31.0, 5)
        assert len(rows) == 7  # finest(4) + per-a(2) + grand total(1)

    def test_parallelism_invariant(self, skewed):
        d = skewed.assign(b=np.where(skewed["uid"] % 2 == 0, "even", "odd"))
        a = rollup_aggregate(_ds(d, 1), ["g", "b"], "v").to_pandas()
        b = rollup_aggregate(_ds(d, 13), ["g", "b"], "v").to_pandas()
        key = ["g", "b"]
        pd.testing.assert_frame_equal(
            a.sort_values(key).reset_index(drop=True),
            b.sort_values(key).reset_index(drop=True),
        )


class TestCubeAggregate:
    def test_all_subsets_exact(self):
        from docprocai_service_ray.stages.windows import cube_aggregate

        df = pd.DataFrame({
            "a": ["x", "x", "y"], "b": ["p", "q", "p"], "v": [1.0, 2.0, 4.0],
        })
        got = cube_aggregate(_ds(df, 2), ["a", "b"], "v").to_pandas()
        rows = {(r.a, r.b): (r.total, r.n) for r in got.itertuples()}
        assert rows[("x", "p")] == (1.0, 1)
        assert rows[("ALL", "p")] == (5.0, 2)   # the subset ROLLUP can't emit
        assert rows[("ALL", "q")] == (2.0, 1)
        assert rows[("x", "ALL")] == (3.0, 2)
        assert rows[("ALL", "ALL")] == (7.0, 3)
        assert len(rows) == 3 + 2 + 2 + 1  # finest + per-a + per-b + total


class TestGroupedNtile:
    def test_sql_fill_rule_on_ragged_groups(self):
        import duckdb

        from docprocai_service_ray.stages.windows import grouped_ntile

        rng = np.random.RandomState(13)
        # group sizes deliberately not divisible by 4 (incl. sizes < 4)
        df = pd.DataFrame({
            "g": np.repeat(list("abcde"), [3, 7, 10, 13, 2]),
            "uid": np.arange(35, dtype="int64"),
            "v": rng.rand(35),
        })
        got = (grouped_ntile(_ds(df, 4), ["g"], "v", 4, tiebreak=["uid"])
               .to_pandas().sort_values("uid").reset_index(drop=True))
        con = duckdb.connect(); con.register("t", df)
        want = con.execute(
            "SELECT uid, NTILE(4) OVER (PARTITION BY g ORDER BY v, uid) AS tile"
            " FROM t ORDER BY uid"
        ).fetchdf()
        assert got["tile"].tolist() == want["tile"].tolist()
