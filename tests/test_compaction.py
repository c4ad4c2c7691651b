"""Parquet compaction (state/compaction): row-multiset preservation
(incl. binary columns), file-count reduction, deterministic planning,
oversized-file handling, idempotent re-run. File-level op — no SQL twin
(the S6 convention)."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from docprocai_service_ray.state.compaction import (compact_parquet,
                                                    plan_groups)

pytestmark = pytest.mark.usefixtures("ray_session")


def _write_small_files(d: str, n_files: int = 12, rows: int = 50):
    os.makedirs(d, exist_ok=True)
    frames = []
    for i in range(n_files):
        df = pd.DataFrame({
            "id": np.arange(i * rows, (i + 1) * rows, dtype="int64"),
            "payload": [os.urandom(20) for _ in range(rows)],
            "txt": [f"row {i}-{j}" for j in range(rows)],
        })
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       os.path.join(d, f"part-{i:04d}.parquet"))
        frames.append(df)
    return pd.concat(frames, ignore_index=True)


def test_compaction_preserves_rows(tmp_path):
    src, dst = str(tmp_path / "in"), str(tmp_path / "out")
    orig = _write_small_files(src)
    rows = compact_parquet(src, dst, target_bytes=20_000)
    n_in = len(os.listdir(src))
    n_out = len([f for f in os.listdir(dst) if f.endswith(".parquet")])
    assert 1 <= n_out < n_in
    assert sum(r["n_rows"] for r in rows) == len(orig)
    back = pq.read_table(dst).to_pandas()
    key = lambda df: sorted(zip(df["id"], df["payload"], df["txt"]))
    assert key(back) == key(orig)


def test_plan_deterministic_and_oversized(tmp_path):
    src = str(tmp_path / "in")
    _write_small_files(src, n_files=6)
    g1 = plan_groups(src, target_bytes=20_000)
    g2 = plan_groups(src, target_bytes=20_000)
    assert g1 == g2
    # a target smaller than any single file → one group per file
    g3 = plan_groups(src, target_bytes=1)
    assert all(len(g) == 1 for g in g3)
    assert sum(len(g) for g in g3) == 6


def test_idempotent_rerun(tmp_path):
    src, dst = str(tmp_path / "in"), str(tmp_path / "out")
    _write_small_files(src, n_files=4)
    r1 = compact_parquet(src, dst, target_bytes=20_000)
    files1 = sorted(os.listdir(dst))
    r2 = compact_parquet(src, dst, target_bytes=20_000)
    assert sorted(os.listdir(dst)) == files1
    assert all(r["skipped"] for r in r2)
    assert sum(r["n_rows"] for r in r1) == sum(r["n_rows"] for r in r2)
