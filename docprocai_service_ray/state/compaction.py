"""Parquet small-file compaction — the table-maintenance pass every
incrementally-ingested corpus needs (each `ingest_shard` / checkpoint
write adds files; thousands of KB-sized files make every later read
metadata-bound). Bin-packs existing files into ~``target_bytes`` output
files WITHOUT a shuffle: planning is metadata-only (file sizes from the
filesystem, sorted names ⇒ deterministic plan), execution is one Ray
task per output group that streams its input files through and writes
one file — row order within each group is preserved, so compaction is
a pure re-container (tested: row-multiset identical, including binary
columns).

Atomicity: outputs land in the destination via tmp-file + rename; a
crashed compaction leaves only complete files and re-running is
idempotent (group content-hash names, like sources/export.py). Source
files are NOT deleted — the caller swaps directories once the new
manifest verifies (the state/manifest.write_stage rename pattern).
"""

from __future__ import annotations

import hashlib
import os
import uuid

import ray


def plan_groups(in_dir: str, target_bytes: int = 128 << 20
                ) -> list[list[str]]:
    """Deterministic bin-pack: sorted parquet files greedily grouped to
    ~target_bytes (every group non-empty; an oversized single file gets
    its own group)."""
    files = sorted(
        os.path.join(in_dir, f) for f in os.listdir(in_dir)
        if f.endswith(".parquet"))
    groups: list[list[str]] = []
    cur: list[str] = []
    cur_bytes = 0
    for p in files:
        sz = os.path.getsize(p)
        if cur and cur_bytes + sz > target_bytes:
            groups.append(cur)
            cur, cur_bytes = [], 0
        cur.append(p)
        cur_bytes += sz
    if cur:
        groups.append(cur)
    return groups


@ray.remote
def _compact_group(paths: list[str], out_dir: str) -> dict:
    import pyarrow.parquet as pq

    key = hashlib.sha256("\x1f".join(
        os.path.basename(p) for p in paths).encode()).hexdigest()[:16]
    final = os.path.join(out_dir, f"compact-{key}.parquet")
    if os.path.exists(final):  # idempotent re-run
        return {"file": final, "n_rows": pq.ParquetFile(final).metadata.num_rows,
                "n_inputs": len(paths), "skipped": True}
    tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
    writer = None
    n_rows = 0
    try:
        for p in paths:
            f = pq.ParquetFile(p)
            for i in range(f.num_row_groups):
                t = f.read_row_group(i)
                if writer is None:
                    writer = pq.ParquetWriter(tmp, t.schema)
                writer.write_table(t)
                n_rows += len(t)
    finally:
        if writer is not None:
            writer.close()
    os.replace(tmp, final)
    return {"file": final, "n_rows": n_rows, "n_inputs": len(paths),
            "skipped": False}


def compact_parquet(in_dir: str, out_dir: str, *,
                    target_bytes: int = 128 << 20) -> list[dict]:
    """Compact ``in_dir``'s parquet files into ``out_dir``. Returns one
    manifest row per output file. One Ray task per output group —
    parallelism = output file count, no exchange, streaming row-group
    reads (peak memory = one row group per task)."""
    os.makedirs(out_dir, exist_ok=True)
    groups = plan_groups(in_dir, target_bytes)
    return ray.get([_compact_group.remote(g, out_dir) for g in groups])
