"""Grouped top-n frequent values: exact tier vs pandas, Misra-Gries sketch
tier guarantees (heavy-hitter retention + lower-bound counts), auto gate."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def _true_topn(df: pd.DataFrame, by: str, v: str, n: int) -> pd.DataFrame:
    t = df.groupby([by, v], as_index=False).size().rename(columns={"size": "cnt"})
    t = t.sort_values([by, "cnt", v], ascending=[True, False, True])
    t["rank"] = t.groupby(by).cumcount() + 1
    return t[t["rank"] <= n].reset_index(drop=True)


class TestGroupedTopn:
    def test_exact_matches_pandas(self, ray_session):
        from docprocai_service_ray.stages.topfreq import grouped_topn_values

        rng = np.random.RandomState(21)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 6000),
                "u": rng.zipf(1.6, 6000) % 400,  # skewed: real head values
            }
        )
        out = (
            grouped_topn_values(rd.from_pandas(df).repartition(7), "g", "u", 5)
            .to_pandas()
            .sort_values(["g", "rank"])
            .reset_index(drop=True)
        )
        want = _true_topn(df, "g", "u", 5)
        pd.testing.assert_frame_equal(
            out[["g", "u", "cnt", "rank"]].astype({"cnt": "int64"}),
            want[["g", "u", "cnt", "rank"]].astype({"cnt": "int64"}),
        )

    def test_sketch_equals_exact_at_high_capacity(self, ray_session):
        from docprocai_service_ray.stages.topfreq import (
            grouped_topn_sketch,
            grouped_topn_values,
        )

        rng = np.random.RandomState(4)
        df = pd.DataFrame(
            {"g": rng.choice(["x", "y"], 3000), "u": rng.randint(0, 50, 3000)}
        )
        ds = rd.from_pandas(df).repartition(5)
        exact = (
            grouped_topn_values(ds, "g", "u", 4).to_pandas()
            .sort_values(["g", "rank"]).reset_index(drop=True)
        )
        sk = (
            grouped_topn_sketch(ds, "g", "u", 4, capacity=1000).to_pandas()
            .sort_values(["g", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(exact, sk)

    def test_sketch_heavy_hitter_guarantee(self, ray_session):
        """Small capacity over a long adversarial tail: every true heavy
        hitter (freq >> N/(capacity+1)) must survive with a count that is a
        lower bound within N/(capacity+1) of truth."""
        from docprocai_service_ray.stages.topfreq import grouped_topn_sketch

        rng = np.random.RandomState(13)
        heavy = {900001: 4000, 900002: 3000, 900003: 2000}
        tail = rng.randint(0, 80_000, 11_000)  # ~10k distinct noise values
        vals = np.concatenate(
            [np.repeat(list(heavy), list(heavy.values())), tail]
        )
        rng.shuffle(vals)
        df = pd.DataFrame({"g": "only", "u": vals})
        n_total = len(df)
        cap = 64
        out = (
            grouped_topn_sketch(
                rd.from_pandas(df).repartition(8), "g", "u", 3, capacity=cap
            )
            .to_pandas()
            .set_index("u")["cnt"]
        )
        bound = n_total / (cap + 1)
        assert set(out.index) == set(heavy)  # exact head set, in spite of cap
        for v, true_cnt in heavy.items():
            assert out[v] <= true_cnt  # lower bound
            assert true_cnt - out[v] <= bound, (v, out[v], true_cnt, bound)

    def test_auto_gate(self, ray_session):
        from docprocai_service_ray.stages.topfreq import (
            grouped_topn_auto,
            grouped_topn_values,
        )

        rng = np.random.RandomState(2)
        df = pd.DataFrame(
            {"g": rng.choice(["a", "b"], 1200), "u": rng.randint(0, 30, 1200)}
        )
        auto = (
            grouped_topn_auto(rd.from_pandas(df), "g", "u", 3)
            .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
        )
        exact = (
            grouped_topn_values(rd.from_pandas(df), "g", "u", 3)
            .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(auto, exact)
        # forced sketch tier still finds the same head set on mild data
        sk = (
            grouped_topn_auto(rd.from_pandas(df), "g", "u", 3,
                              exact_max_bytes=0, capacity=512)
            .to_pandas().sort_values(["g", "rank"]).reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(sk[["g", "u", "rank"]], exact[["g", "u", "rank"]])

    def test_empty_dataset(self, ray_session):
        from docprocai_service_ray.stages.topfreq import (
            grouped_topn_sketch,
            grouped_topn_values,
        )

        df = pd.DataFrame({"g": pd.Series(dtype=object), "u": pd.Series(dtype="int64")})
        assert grouped_topn_values(rd.from_pandas(df), "g", "u", 3).count() == 0
        assert grouped_topn_sketch(rd.from_pandas(df), "g", "u", 3).count() == 0
