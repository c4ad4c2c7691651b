"""Per-partition/stage manifest + resume (SURVEY.md §1.2 manifest table,
§4.3 resumable-output row).

The analog of the reference's ingestion-state table + restart consistency
scan (persistence/IngestionStateDbConnector.py:48-104,
service/DocProcAiService.py:639-668): every stage that materializes output
writes to ``<out>/<stage>.tmp-<token>`` then atomically renames to
``<out>/<stage>`` and appends a manifest row; a resumed run skips stages
whose manifest row says DONE and whose output dir exists (the W6
idempotent-overwrite analog — a re-run replaces the partition files).
"""

from __future__ import annotations

import contextlib
import fcntl
import json
import os
import shutil
import time
import uuid

MANIFEST_DIR = "_manifest"


@contextlib.contextmanager
def dir_lock(path: str, name: str = ".lock"):
    """Advisory file lock serializing writers of one output dir — two
    driver processes resuming the same out_dir must not interleave the
    rmtree/rename of a stage."""
    os.makedirs(path, exist_ok=True)
    fd = os.open(os.path.join(path, name), os.O_CREAT | os.O_RDWR)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def _manifest_path(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{stage}.json")


def stage_output_dir(out_dir: str, stage: str) -> str:
    return os.path.join(out_dir, stage)


def is_stage_done(out_dir: str, stage: str) -> bool:
    p = _manifest_path(out_dir, stage)
    if not os.path.exists(p) or not os.path.isdir(stage_output_dir(out_dir, stage)):
        return False
    try:
        with open(p) as f:
            return json.load(f).get("state") == "DONE"
    except (json.JSONDecodeError, OSError):
        return False


def read_manifest(out_dir: str) -> list[dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    rows = []
    if os.path.isdir(mdir):
        for name in sorted(os.listdir(mdir)):
            if name.endswith(".json"):
                with open(os.path.join(mdir, name)) as f:
                    rows.append(json.load(f))
    return rows


def write_stage(
    ds,
    out_dir: str,
    stage: str,
    extra: dict | None = None,
    write_kwargs: dict | None = None,
) -> str:
    """Write a Dataset's parquet output for ``stage`` atomically and record
    the manifest row. Returns the final output dir."""
    final = stage_output_dir(out_dir, stage)
    tmp = f"{final}.tmp-{uuid.uuid4().hex[:8]}"
    os.makedirs(os.path.dirname(final) or ".", exist_ok=True)
    t0 = time.monotonic()
    ds.write_parquet(tmp, **(write_kwargs or {}))
    wall = time.monotonic() - t0
    with dir_lock(out_dir):
        if os.path.isdir(final):
            shutil.rmtree(final)  # idempotent overwrite (W6 analog)
        os.rename(tmp, final)
    n_files = sum(
        len([f for f in fs if f.endswith(".parquet")])
        for _, _, fs in os.walk(final)
    )
    try:
        import pyarrow.dataset as pads

        rows_out = pads.dataset(final).count_rows()  # parquet metadata only
    except Exception:
        rows_out = None
    row = {
        "stage": stage,
        "state": "DONE",
        "wall_s": round(wall, 3),
        "output_path": final,
        "n_files": n_files,
        "rows_out": rows_out,
        **(extra or {}),
    }
    os.makedirs(os.path.join(out_dir, MANIFEST_DIR), exist_ok=True)
    mp = _manifest_path(out_dir, stage)
    with open(mp + ".tmp", "w") as f:
        json.dump(row, f)
    os.replace(mp + ".tmp", mp)
    return final


def checkpointed(ds_fn, out_dir: str | None, stage: str, resume: bool = True):
    """Run ``ds_fn()`` → Dataset, materialized as a parquet checkpoint when
    ``out_dir`` is set; on resume, reuse a DONE stage's files instead of
    recomputing (resume granularity = stage; shuffle stages cannot resume
    mid-shuffle, SURVEY.md §7.4)."""
    import ray.data as rd

    if out_dir is None:
        return ds_fn()
    if resume and is_stage_done(out_dir, stage):
        return rd.read_parquet(stage_output_dir(out_dir, stage))
    final = write_stage(ds_fn(), out_dir, stage)
    return rd.read_parquet(final)
