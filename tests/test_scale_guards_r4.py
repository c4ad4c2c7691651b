"""Round-4 scale guards: khop_neighborhood's driver frontier and the
size-gated broadcast collect for dimension tables."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _triples(pairs):
    return rd.from_arrow(pa.table({
        "subject_id": pa.array([a for a, _ in pairs], pa.string()),
        "pred": pa.array(["links"] * len(pairs), pa.string()),
        "object_id": pa.array([b for _, b in pairs], pa.string()),
    }))


class TestKhopFrontierGuard:
    def test_hub_seed_raises_loudly(self):
        from docprocai_service_ray.stages.graph import khop_neighborhood

        hub = [("seed", f"n{i}") for i in range(500)]
        with pytest.raises(ValueError, match="max_frontier"):
            khop_neighborhood(_triples(hub), "seed", k=1, max_frontier=100)

    def test_small_neighborhood_unchanged(self):
        from docprocai_service_ray.stages.graph import khop_neighborhood

        got = khop_neighborhood(
            _triples([("a", "b"), ("b", "c"), ("c", "d")]), "a", k=2,
            max_frontier=10,
        ).to_pandas()
        assert dict(zip(got["entity"], got["hop"])) == {
            "a": 0, "b": 1, "c": 2}


class TestBroadcastCollectGate:
    def test_small_side_collects(self):
        from docprocai_service_ray.state.joins import collect_broadcast_df

        df = pd.DataFrame({"k": range(100), "v": range(100)})
        got = collect_broadcast_df(rd.from_pandas(df), ["k", "v"])
        assert len(got) == 100 and list(got.columns) == ["k", "v"]

    def test_oversized_side_raises(self):
        from docprocai_service_ray.state.joins import collect_broadcast_df

        df = pd.DataFrame({"k": range(20000),
                           "v": ["x" * 100] * 20000})
        ds = rd.from_pandas(df).materialize()  # metadata has real bytes
        with pytest.raises(ValueError, match="hash_join"):
            collect_broadcast_df(ds, ["k", "v"], max_bytes=1 << 10)
