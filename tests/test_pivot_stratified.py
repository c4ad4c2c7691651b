"""pivot_table (stages/pivot.py), stratified_sample (stages/sampling.py),
grouped_quantiles_disc (stages/quantiles.py) — unit semantics; the sf0.01
SQL cross-checks run via tests/test_queries.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.pivot import pivot_sql, pivot_table
from docprocai_service_ray.stages.quantiles import grouped_quantiles_disc
from docprocai_service_ray.stages.sampling import (
    stratified_sample,
    stratified_sql_predicate,
)


def _ds(df: pd.DataFrame, blocks: int = 4):
    return rd.from_pandas(df).repartition(blocks)


@pytest.fixture(scope="module")
def frame():
    rng = np.random.RandomState(11)
    n = 3000
    return pd.DataFrame({
        "k": rng.choice(list("xyz"), n),
        "cat": rng.choice(["a", "b", "c", "d"], n, p=[0.7, 0.1, 0.1, 0.1]),
        "v": rng.rand(n) * 100,
        "id": np.arange(n, dtype="int64"),
    })


class TestPivot:
    def test_count_pivot_matches_crosstab(self, frame):
        got = (pivot_table(_ds(frame), ["k"], "cat", agg="count", col_prefix="n_")
               .to_pandas().sort_values("k").reset_index(drop=True))
        ref = pd.crosstab(frame["k"], frame["cat"])
        for c in "abcd":
            assert got[f"n_{c}"].tolist() == ref[c].tolist()

    def test_sum_pivot_matches_duckdb(self, frame):
        got = (pivot_table(_ds(frame), ["k"], "cat", "v", agg="sum",
                           categories=list("abcd"), col_prefix="s_")
               .to_pandas().sort_values("k").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", frame)
        want = con.execute(
            pivot_sql("t", ["k"], "cat", list("abcd"), "v", agg="sum",
                      col_prefix="s_") + " ORDER BY k"
        ).fetchdf()
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))

    def test_category_discovery_and_missing_cells(self):
        df = pd.DataFrame({"k": ["p", "p", "q"], "cat": ["a", "b", "a"]})
        got = pivot_table(_ds(df, 2), ["k"], "cat", agg="count").to_pandas()
        row_q = got[got["k"] == "q"].iloc[0]
        assert row_q["a"] == 1 and row_q["b"] == 0  # absent cell → 0

    def test_parallelism_invariant(self, frame):
        a = pivot_table(_ds(frame, 1), ["k"], "cat", "v", agg="sum").to_pandas()
        b = pivot_table(_ds(frame, 13), ["k"], "cat", "v", agg="sum").to_pandas()
        pd.testing.assert_frame_equal(
            a.sort_values("k").reset_index(drop=True),
            b.sort_values("k").reset_index(drop=True),
        )


class TestStratifiedSample:
    def test_rates_and_determinism(self, frame):
        rates = {"x": 1.0, "y": 0.3, "z": 0.0}
        got = stratified_sample(_ds(frame), "id", "k", rates, seed=7).to_pandas()
        n_by = got.groupby("k").size()
        assert n_by.get("x", 0) == (frame["k"] == "x").sum()  # rate 1.0 keeps all
        assert "z" not in n_by.index  # rate 0.0 drops all
        ny, total_y = n_by.get("y", 0), (frame["k"] == "y").sum()
        assert 0.2 < ny / total_y < 0.4
        again = stratified_sample(_ds(frame, 9), "id", "k", rates, seed=7).to_pandas()
        assert sorted(got["id"]) == sorted(again["id"])  # parallelism-invariant

    def test_sql_predicate_matches(self, frame):
        rates = {"x": 0.5, "y": 0.25}  # z falls back to default_rate=0.1
        got = stratified_sample(
            _ds(frame), "id", "k", rates, default_rate=0.1, seed=3
        ).to_pandas()
        con = duckdb.connect()
        con.register("t", frame)
        pred = stratified_sql_predicate("id", "k", rates, default_rate=0.1, seed=3)
        want = con.execute(f"SELECT * FROM t WHERE {pred}").fetchdf()
        assert sorted(got["id"]) == sorted(want["id"])


class TestQuantilesDisc:
    def test_matches_duckdb_quantile_disc(self, frame):
        got = (grouped_quantiles_disc(_ds(frame), "k", "v", [0.25, 0.5, 0.9])
               .to_pandas().sort_values("k").reset_index(drop=True))
        con = duckdb.connect()
        con.register("t", frame)
        want = con.execute(
            "SELECT k, COUNT(*) AS n, ROUND(quantile_disc(v, 0.25), 6) AS qd_25,"
            " ROUND(quantile_disc(v, 0.5), 6) AS qd_50,"
            " ROUND(quantile_disc(v, 0.9), 6) AS qd_90 FROM t GROUP BY k ORDER BY k"
        ).fetchdf()
        pd.testing.assert_frame_equal(got, want.astype(got.dtypes.to_dict()))

    def test_values_are_actual_data_points(self):
        df = pd.DataFrame({"k": ["a"] * 5, "v": [1.0, 2.0, 3.0, 4.0, 100.0]})
        got = grouped_quantiles_disc(_ds(df, 1), "k", "v", [0.5]).to_pandas()
        assert got["qd_50"].iloc[0] == 3.0  # never interpolated


class TestNullAndEmptySemantics:
    """Regressions for the r3 review findings: null handling must match
    the SQL twins; empty blocks must not crash vector ops."""

    def test_corr_ignores_null_pairs_like_sql(self):
        from docprocai_service_ray.stages.textstats import corr_sql, grouped_corr

        df = pd.DataFrame({
            "g": ["a", "a", "a", "a"],
            "x": [1.0, None, 2.0, 3.0],
            "y": [2.0, 3.0, None, 6.0],
        })
        got = grouped_corr(_ds(df, 2), "g", "x", "y").to_pandas()
        con = duckdb.connect(); con.register("t", df)
        want = con.execute(corr_sql("t", "g", "x", "y")).fetchdf()
        assert got["n"].iloc[0] == want["n"].iloc[0] == 2
        assert abs(got["corr"].iloc[0] - want["corr"].iloc[0]) < 1e-9

    def test_disc_quantiles_ignore_nulls_like_sql(self):
        from docprocai_service_ray.stages.quantiles import grouped_quantiles_disc

        df = pd.DataFrame({"k": ["a"] * 3, "v": [1.0, 2.0, None]})
        got = grouped_quantiles_disc(_ds(df, 1), "k", "v", [0.9]).to_pandas()
        con = duckdb.connect(); con.register("t", df)
        want = con.execute(
            "SELECT k, COUNT(v) AS n, ROUND(quantile_disc(v, 0.9), 6) AS qd_90"
            " FROM t GROUP BY k"
        ).fetchdf()
        assert got["n"].iloc[0] == want["n"].iloc[0] == 2
        assert got["qd_90"].iloc[0] == want["qd_90"].iloc[0] == 2.0

    def test_pivot_null_keys_excluded_both_sides(self):
        from docprocai_service_ray.stages.pivot import pivot_sql, pivot_table

        df = pd.DataFrame({"k": ["x", None, "y", "y"], "cat": ["a", "a", None, "a"],
                           "v": [1.0, 2.0, 4.0, 5.0]})
        got = pivot_table(_ds(df, 2), ["k"], "cat", agg="count",
                          categories=["a"]).to_pandas()
        con = duckdb.connect(); con.register("t", df)
        want = con.execute(pivot_sql("t", ["k"], "cat", ["a"])).fetchdf()
        # the NULL-k row and the NULL-cat row are excluded on BOTH sides
        assert sorted(got["k"]) == sorted(want["k"]) == ["x", "y"]
        assert dict(zip(got["k"], got["a"])) == dict(zip(want["k"], want["a"]))

    def test_empty_blocks_dont_crash_vector_ops(self):
        import ray.data as rd

        from docprocai_service_ray.stages.similarity import (
            kmeans_cluster_sizes,
            label_centroids,
        )

        df = pd.DataFrame({
            "vec_id": np.arange(5, dtype="int64"),
            "label": np.array([0, 0, 1, 1, 1], dtype="int32"),
            "embedding": [np.ones(4, dtype=np.float32) * i for i in range(5)],
        })
        ds = rd.from_pandas(df).repartition(16)  # most blocks are empty
        cents = label_centroids(ds, "label", "embedding", 4).to_pandas()
        assert len(cents) == 2 * 4
        sizes = kmeans_cluster_sizes(ds, "vec_id", "embedding", 4, 2,
                                     iters=2, seed=1)
        assert sizes["size"].sum() == 5
