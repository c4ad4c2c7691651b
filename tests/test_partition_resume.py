"""Partition-granular resume (VERDICT r01 next-round #9): a killed
partitioned ingest recomputes ONLY the shards without a DONE manifest row,
and the resumed output equals a clean run's."""

from __future__ import annotations

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from docprocai_service_ray.state.manifest import (
    checkpointed_partitioned,
    is_partition_done,
    is_stage_done,
)


@pytest.fixture()
def files(tmp_path):
    out = []
    for i in range(4):
        p = tmp_path / f"in-{i}.parquet"
        pq.write_table(
            pa.table({"x": list(range(i * 10, i * 10 + 10))}), str(p)
        )
        out.append(str(p))
    return out


def _double(fs):
    return rd.read_parquet(fs).map_batches(
        lambda t: pa.table({"x": t["x"], "y": pa.compute.multiply(t["x"], 2)}),
        batch_format="pyarrow",
    )


def test_resume_skips_done_partitions(files, tmp_path):
    out_dir = str(tmp_path / "out")
    calls: list[list[str]] = []

    class Boom(RuntimeError):
        pass

    def failing(fs):
        calls.append(fs)
        if len(calls) == 3:  # die mid-run, after two shards landed
            raise Boom()
        return _double(fs)

    with pytest.raises(Boom):
        checkpointed_partitioned(failing, files, out_dir, "doubled",
                                 num_partitions=4)
    assert is_partition_done(out_dir, "doubled", 0)
    assert is_partition_done(out_dir, "doubled", 1)
    assert not is_partition_done(out_dir, "doubled", 2)
    assert not is_stage_done(out_dir, "doubled")

    calls.clear()
    ds = checkpointed_partitioned(_wrap(calls), files, out_dir, "doubled",
                                  num_partitions=4)
    # only the two unfinished shards recomputed
    assert len(calls) == 2
    assert is_stage_done(out_dir, "doubled")
    got = sorted((r["x"], r["y"]) for r in ds.take_all())
    assert got == [(i, 2 * i) for i in range(40)]

    # a third run recomputes nothing and returns the same rows
    calls.clear()
    ds2 = checkpointed_partitioned(_wrap(calls), files, out_dir, "doubled",
                                   num_partitions=4)
    assert calls == []
    assert sorted((r["x"], r["y"]) for r in ds2.take_all()) == got


def _wrap(calls):
    def fn(fs):
        calls.append(fs)
        return _double(fs)

    return fn


def test_partition_manifest_rows(files, tmp_path):
    out_dir = str(tmp_path / "out")
    checkpointed_partitioned(_double, files, out_dir, "doubled", num_partitions=2)
    mdir = os.path.join(out_dir, "_manifest")
    parts = sorted(n for n in os.listdir(mdir) if ".part-" in n)
    assert len(parts) == 2
    row = json.load(open(os.path.join(mdir, parts[0])))
    assert row["state"] == "DONE" and row["partition_id"] == 0


def test_kg_partitioned_ingest_matches_whole_stage(tmp_path, corpus_path):
    """run_kg with ingest_partitions: docs_raw output identical to the
    whole-stage path (the corpus fixture is one file → one shard, so also
    write a 4-file copy)."""
    import dataclasses

    from docprocai_service_ray.config import KGConfig
    from docprocai_service_ray.pipelines.kg import run_kg
    from docprocai_service_ray.sources.webgen import alias_dict_table

    # split the single-file corpus into 3 files
    src = rd.read_parquet(corpus_path).to_pandas()
    multi = tmp_path / "pages_multi"
    os.makedirs(multi)
    for i in range(3):
        part = src.iloc[i::3]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(multi / f"f{i}.parquet"),
        )

    cfg = dataclasses.replace(KGConfig(), ingest_partitions=3)
    alias = alias_dict_table(42, cfg.embedding_dim)
    out_a = str(tmp_path / "a")
    res = run_kg(str(multi), alias, cfg, out_dir=out_a)
    got = sorted(
        (r["url"], r["warc_ts"], r["content_hash"]) for r in res["docs"].take_all()
    )

    cfg_b = dataclasses.replace(KGConfig(), ingest_partitions=0)
    out_b = str(tmp_path / "b")
    res_b = run_kg(str(multi), alias, cfg_b, out_dir=out_b)
    want = sorted(
        (r["url"], r["warc_ts"], r["content_hash"]) for r in res_b["docs"].take_all()
    )
    assert got == want
