"""Round-4 ADVICE regression tests:

1. interval_join on FLOAT axes: exact band semantics (no int64
   truncation), negative values, float bucket widths.
2. fixed_histogram excludes NULL/NaN rows (matches the SQL twin).
3. grouped_distinct_sketch excludes NULLs (agrees with the exact tier
   and SQL COUNT(DISTINCT) on null-bearing columns).
4. linkgraph href extraction: double-quoted hrefs are covered by the
   DuckDB oracle; mismatched/embedded quotes rejected identically.
5. reprocess cascade crash recovery: pending urls re-drive against
   their ORIGINAL pages_path, not a later call's shard dir.
"""

from __future__ import annotations

import datetime
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from docprocai_service_ray.state.joins import interval_join


def _ds(df: pd.DataFrame, blocks: int = 3):
    return rd.from_pandas(df).repartition(blocks)


class TestIntervalJoinFloats:
    def test_float_axis_exact_band(self):
        # the ADVICE repro: t=1.5 must NOT match [1.6, 2.0) — int64
        # truncation made both 1 and matched them
        points = pd.DataFrame({"pid": [0, 1, 2, 3],
                               "t": [1.5, 1.7, -0.5, 0.25]})
        ivals = pd.DataFrame({
            "iid": [0, 1, 2],
            "start": [1.6, -1.0, 0.0],
            "end": [2.0, 0.0, 0.25],
        })
        got = interval_join(_ds(points), _ds(ivals, 1), on="t",
                            right_start="start", right_end="end",
                            bucket_width=1).to_pandas()
        pairs = set(zip(got["pid"], got["iid"]))
        # 1.5 ∉ [1.6,2.0); 1.7 ∈ [1.6,2.0); -0.5 ∈ [-1,0) (true floor, not
        # trunc-to-zero); 0.25 ∉ [0,0.25) (end exclusive on raw floats)
        assert pairs == {(1, 0), (2, 1)}

    def test_float_matches_brute_force(self):
        rng = np.random.RandomState(7)
        points = pd.DataFrame({
            "pid": np.arange(800, dtype="int64"),
            "t": rng.uniform(-50.0, 50.0, 800),
        })
        start = rng.uniform(-50.0, 50.0, 60)
        ivals = pd.DataFrame({
            "iid": np.arange(60, dtype="int64"),
            "start": start,
            "end": start + rng.uniform(0.0, 10.0, 60),
        })
        ref = points.merge(ivals, how="cross")
        ref = ref[(ref["start"] <= ref["t"]) & (ref["t"] < ref["end"])]
        ref = ref.sort_values(["pid", "iid"]).reset_index(drop=True)
        for width in (0.5, 3, 7.25):
            got = (interval_join(_ds(points), _ds(ivals), on="t",
                                 right_start="start", right_end="end",
                                 bucket_width=width)
                   .to_pandas().sort_values(["pid", "iid"])
                   .reset_index(drop=True))
            assert got["pid"].tolist() == ref["pid"].tolist(), width
            assert got["iid"].tolist() == ref["iid"].tolist(), width

    def test_float_end_on_bucket_boundary(self):
        # end exactly on k*width: interval must not leak into bucket k
        points = pd.DataFrame({"pid": [0], "t": [4.0]})
        ivals = pd.DataFrame({"iid": [0], "start": [1.0], "end": [4.0]})
        got = interval_join(_ds(points, 1), _ds(ivals, 1), on="t",
                            right_start="start", right_end="end",
                            bucket_width=2.0).to_pandas()
        assert len(got) == 0


class TestHistogramNulls:
    def test_nan_rows_excluded_and_sql_parity(self, tmp_path):
        from docprocai_service_ray.stages.quantiles import (
            fixed_histogram,
            histogram_sql,
        )

        df = pd.DataFrame({
            "g": ["a", "a", "b", "b", "a", "b"],
            "v": [0.5, np.nan, 2.5, None, 9.9, -3.0],
        })
        p = str(tmp_path / "t.parquet")
        pq.write_table(pa.Table.from_pandas(df), p)
        got = (fixed_histogram(_ds(df), "v", 0.0, 10.0, 5, by="g")
               .to_pandas().sort_values(["g", "bin"]).reset_index(drop=True))
        want = (duckdb.sql(histogram_sql(f"read_parquet('{p}')", "v",
                                         0.0, 10.0, 5, by="g"))
                .df().sort_values(["g", "bin"]).reset_index(drop=True))
        assert got["n"].sum() == 4  # the two null rows are gone
        pd.testing.assert_frame_equal(
            got[["g", "bin", "n"]],
            want[["g", "bin", "n"]].astype({"bin": "int64", "n": "int64"}),
        )


class TestDistinctSketchNulls:
    def test_nulls_not_counted(self):
        from docprocai_service_ray.stages.distinct import (
            grouped_distinct,
            grouped_distinct_sketch,
        )

        df = pd.DataFrame({
            "g": ["a"] * 6 + ["b"] * 4,
            "v": ["x", "y", None, "x", None, "z", None, None, None, "w"],
        })
        exact = (grouped_distinct(_ds(df), "g", "v")
                 .to_pandas().set_index("g")["n_distinct"].to_dict())
        sk = (grouped_distinct_sketch(_ds(df), "g", "v", precision=12)
              .to_pandas().set_index("g")["n_distinct"].to_dict())
        assert exact == {"a": 3, "b": 1}
        # at these cardinalities HLL+linear-counting is exact
        assert sk == exact

    def test_all_null_group_is_zero(self):
        from docprocai_service_ray.stages.distinct import (
            grouped_distinct_sketch,
        )

        df = pd.DataFrame({"g": ["a", "a"], "v": [None, None]})
        sk = grouped_distinct_sketch(_ds(df, 1), "g", "v").to_pandas()
        assert sk["n_distinct"].tolist() == [0]


class TestLinkgraphQuoteParity:
    def test_double_quoted_hrefs_covered_by_oracle(self, tmp_path):
        from docprocai_service_ray.sources.webgen import WEB_PAGES_SCHEMA
        from docprocai_service_ray.stages.linkgraph import (
            host_link_edges,
            linkgraph_sql,
        )

        ts = datetime.datetime(2025, 1, 1)
        rows = [
            ("https://a.example/1",
             b"<a href=\"https://b.example/x\">dq</a>"
             b"<a href='https://c.example/y'>sq</a>"
             b"<a href='/self'>rel</a>"),
            # mismatched + embedded quotes: rejected on BOTH sides
            ("https://a.example/2",
             b"<a href='https://d.example/z\">mism</a>"
             b"<a href='https://e.example/a\"b'>emb</a>"
             b"<a href=\"https://f.example/c'd\">emb2</a>"),
            # non-UTF-8 page with a double-quoted href
            ("https://g.example/3",
             b"\xff\xfe<a href=\"https://b.example/n\">bin</a>"),
        ]
        t = pa.Table.from_pydict(
            {
                "url": [u for u, _ in rows],
                "warc_ts": [ts] * len(rows),
                "html": [h for _, h in rows],
                "text": [None] * len(rows),
                "lang": ["en"] * len(rows),
            },
            schema=WEB_PAGES_SCHEMA,
        )
        d = tmp_path / "pages"
        os.makedirs(d, exist_ok=True)
        pq.write_table(t, str(d / "part-0.parquet"))
        ds = rd.read_parquet(str(d), columns=["url", "html"])
        got = (host_link_edges(ds).to_pandas()
               .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
        want = (duckdb.sql(linkgraph_sql(f"{d}/*.parquet")).df()
                .sort_values(["src_host", "dst_host"]).reset_index(drop=True))
        want["n_links"] = want["n_links"].astype("int64")
        pd.testing.assert_frame_equal(got, want)
        assert ("a.example", "b.example") in set(
            zip(got["src_host"], got["dst_host"]))
        assert ("g.example", "b.example") in set(
            zip(got["src_host"], got["dst_host"]))


class TestReprocessCrossPathPending:
    def test_pending_urls_redrive_from_original_source(self, tmp_path):
        """Interrupted reprocess over corpus A, then ingest_shard over a
        DIFFERENT dir B: A's pending urls must be re-derived from A (under
        the old marker they were re-driven against B, found no pages, and
        their rows were permanently deleted)."""
        from docprocai_service_ray.config import KGConfig
        from docprocai_service_ray.pipelines.kg import ingest_shard, run_kg
        from docprocai_service_ray.sources.webgen import (
            alias_dict_table,
            pages_table,
        )
        from docprocai_service_ray.state.manifest import begin_inflight

        def _write(dirpath, rows):
            os.makedirs(dirpath, exist_ok=True)
            pq.write_table(pages_table(42, rows),
                           os.path.join(dirpath, "part-0.parquet"))
            return str(dirpath)

        cfg = KGConfig()
        alias = alias_dict_table(42, cfg.embedding_dim)
        shard_a = _write(tmp_path / "shard_a", list(range(120)))
        shard_b = _write(tmp_path / "shard_b", list(range(120, 160)))
        full = _write(tmp_path / "full", list(range(160)))

        clean = run_kg(full, alias, cfg, out_dir=str(tmp_path / "clean"))
        want_docs = sorted(clean["docs"].to_pandas()["url"].tolist())

        inc_dir = str(tmp_path / "inc")
        first = run_kg(shard_a, alias, cfg, out_dir=inc_dir)
        a_urls = sorted(first["docs"].to_pandas()["url"].tolist())
        # simulate a cascade that crashed before clearing its marker:
        # two of A's urls pending, recorded against A's path
        pending = a_urls[:2]
        begin_inflight(inc_dir, "reprocess", {
            "sources": [{"pages_path": shard_a, "urls": pending}]
        })
        after = ingest_shard(shard_b, alias, cfg, out_dir=inc_dir)
        got_docs = sorted(after["docs"].to_pandas()["url"].tolist())
        assert got_docs == want_docs  # nothing lost, nothing duplicated
