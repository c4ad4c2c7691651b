"""Round-5 scale guard: partition_reduce / distinct_rows fan-in
self-sizes from the metadata input-bytes estimate (VERDICT r4 weak item
— previously a fixed literal that would hand multi-GB partitions to a
single task at 100×)."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.state import joins
from docprocai_service_ray.state.groupby import (distinct_rows,
                                                 partition_reduce,
                                                 resolve_num_partitions)


class TestAutoFanIn:
    def test_explicit_value_passes_through(self):
        ds = rd.from_pandas(pd.DataFrame({"k": range(10)}))
        assert resolve_num_partitions(ds, 7) == 7

    def test_unknown_estimate_falls_back(self, monkeypatch):
        ds = rd.from_pandas(pd.DataFrame({"k": range(10)}))
        monkeypatch.setattr(joins, "_meta_size_bytes", lambda _ds: None)
        assert resolve_num_partitions(ds, None) == 64

    def test_large_estimate_yields_more_than_64(self, monkeypatch):
        """The VERDICT done-criterion: a large-estimated input must get
        MORE reduce tasks, not bigger ones — 100 GB at ~64 MB/partition
        ⇒ >1500 partitions (capped at 4096)."""
        ds = rd.from_pandas(pd.DataFrame({"k": range(10)}))
        monkeypatch.setattr(joins, "_meta_size_bytes",
                            lambda _ds: 100 << 30)
        got = resolve_num_partitions(ds, None)
        assert got > 64
        assert got == min(4096, (100 << 30) // (64 << 20) + 1)

    def test_small_real_input_stays_modest(self):
        ds = rd.from_pandas(
            pd.DataFrame({"k": range(1000), "v": ["x"] * 1000})
        ).materialize()
        assert 1 <= resolve_num_partitions(ds, None) <= 64

    @pytest.mark.parametrize("np_", [None, 3, 64])
    def test_results_invariant_to_fan_in(self, np_):
        """Partitioning is layout, never semantics: same grouped result
        at any fan-in (auto or explicit)."""
        df = pd.DataFrame({"k": [f"k{i % 17}" for i in range(300)],
                           "v": range(300)})
        ds = rd.from_pandas(df).repartition(5)

        def reduce(part: pd.DataFrame) -> pd.DataFrame:
            return part.groupby("k", as_index=False).agg(s=("v", "sum"))

        got = (partition_reduce(ds, ["k"], reduce, num_partitions=np_)
               .to_pandas().sort_values("k").reset_index(drop=True))
        exp = (df.groupby("k", as_index=False).agg(s=("v", "sum"))
               .sort_values("k").reset_index(drop=True))
        pd.testing.assert_frame_equal(got, exp)

        # distinct keys (non-key column survivors are order-dependent by
        # contract, so compare the key set only)
        dr = distinct_rows(ds, ["k"], num_partitions=np_).to_pandas()
        assert sorted(dr["k"]) == sorted(df["k"].unique())


class TestStreamingFusedGate:
    def test_oversized_streaming_fused_raises(self, corpus_path):
        import dataclasses

        from docprocai_service_ray.config import KGConfig
        from docprocai_service_ray.pipelines.kg import run_kg
        from docprocai_service_ray.sources.webgen import alias_dict_table

        cfg = dataclasses.replace(KGConfig(), streaming_fused_max_bytes=1)
        with pytest.raises(ValueError, match="out_dir"):
            run_kg(corpus_path, alias_dict_table(42, cfg.embedding_dim),
                   cfg, with_link_graph=True)  # streaming (out_dir=None)

    def test_below_gate_streaming_fused_unchanged(self, corpus_path):
        from docprocai_service_ray.config import KGConfig
        from docprocai_service_ray.pipelines.kg import run_kg
        from docprocai_service_ray.sources.webgen import alias_dict_table

        cfg = KGConfig()  # default gate (32 GiB) far above the test corpus
        res = run_kg(corpus_path, alias_dict_table(42, cfg.embedding_dim),
                     cfg, with_link_graph=True)
        assert res["docs"].count() > 0
        assert res["host_edges"].count() > 0
