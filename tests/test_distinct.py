"""Grouped distinct counts: exact tier vs pandas nunique, HLL sketch tier
error bound + determinism, auto gate parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


class TestGroupedDistinct:
    def test_exact_matches_pandas(self, ray_session):
        from docprocai_service_ray.stages.distinct import grouped_distinct

        rng = np.random.RandomState(11)
        df = pd.DataFrame(
            {
                "g": rng.choice(["a", "b", "c"], 5000),
                "u": rng.randint(0, 700, 5000),
            }
        )
        out = (
            grouped_distinct(rd.from_pandas(df).repartition(9), "g", "u")
            .to_pandas()
            .set_index("g")["n_distinct"]
        )
        want = df.groupby("g")["u"].nunique()
        for g in ["a", "b", "c"]:
            assert out[g] == want[g]

    def test_sketch_error_bound_high_cardinality(self, ray_session):
        """p=12 → standard error ~1.6%; assert within 5% at 20k+ distinct
        (the regime where the exact tier's shuffle is what you're avoiding)."""
        from docprocai_service_ray.stages.distinct import grouped_distinct_sketch

        rng = np.random.RandomState(5)
        n_true = {"big": 25_000, "mid": 4_000}
        frames = []
        for g, k in n_true.items():
            vals = rng.choice(np.arange(k * 3), size=k, replace=False)
            # repeat each value a few times so local dedup matters
            frames.append(
                pd.DataFrame({"g": g, "u": np.repeat(vals, 3)})
            )
        df = pd.concat(frames, ignore_index=True).sample(frac=1.0, random_state=0)
        out = (
            grouped_distinct_sketch(rd.from_pandas(df).repartition(13), "g", "u")
            .to_pandas()
            .set_index("g")["n_distinct"]
        )
        for g, k in n_true.items():
            assert abs(out[g] - k) / k < 0.05, (g, out[g], k)

    def test_sketch_deterministic_across_partitionings(self, ray_session):
        """Register merge is elementwise max → identical output at any
        parallelism / batch boundary (this is what lets the driver golden
        freeze the sketch query)."""
        from docprocai_service_ray.stages.distinct import grouped_distinct_sketch

        rng = np.random.RandomState(3)
        df = pd.DataFrame(
            {"g": rng.choice(["x", "y"], 8000), "u": rng.randint(0, 3000, 8000)}
        )
        outs = []
        for parts in (2, 11):
            outs.append(
                grouped_distinct_sketch(rd.from_pandas(df).repartition(parts), "g", "u")
                .to_pandas()
                .sort_values("g")
                .reset_index(drop=True)
            )
        assert outs[0].equals(outs[1])

    def test_auto_gate_exact_small(self, ray_session):
        from docprocai_service_ray.stages.distinct import (
            grouped_distinct,
            grouped_distinct_auto,
        )

        rng = np.random.RandomState(7)
        df = pd.DataFrame(
            {"g": rng.choice(["a", "b"], 1000), "u": rng.randint(0, 100, 1000)}
        )
        auto = (
            grouped_distinct_auto(rd.from_pandas(df), "g", "u")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        exact = (
            grouped_distinct(rd.from_pandas(df), "g", "u")
            .to_pandas()
            .sort_values("g")
            .reset_index(drop=True)
        )
        assert auto.equals(exact)

    def test_auto_gate_forced_sketch(self, ray_session):
        from docprocai_service_ray.stages.distinct import (
            grouped_distinct,
            grouped_distinct_auto,
        )

        rng = np.random.RandomState(9)
        df = pd.DataFrame(
            {"g": ["only"] * 2000, "u": rng.randint(0, 500, 2000)}
        )
        sk = (
            grouped_distinct_auto(rd.from_pandas(df), "g", "u", exact_max_bytes=0)
            .to_pandas()
            .set_index("g")["n_distinct"]
        )
        exact = (
            grouped_distinct(rd.from_pandas(df), "g", "u")
            .to_pandas()
            .set_index("g")["n_distinct"]
        )
        # small range → linear counting correction should be near-exact
        assert abs(int(sk["only"]) - int(exact["only"])) / int(exact["only"]) < 0.05

    def test_empty_dataset(self, ray_session):
        from docprocai_service_ray.stages.distinct import (
            grouped_distinct,
            grouped_distinct_sketch,
        )

        df = pd.DataFrame({"g": pd.Series(dtype=object), "u": pd.Series(dtype="int64")})
        assert grouped_distinct(rd.from_pandas(df), "g", "u").count() == 0
        assert grouped_distinct_sketch(rd.from_pandas(df), "g", "u").count() == 0
