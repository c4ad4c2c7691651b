"""Source readers (S-class operators).

The reference's only real "sources" are HTTP fetch + GraphQL lookups
(SURVEY.md §2.1 S1/S2), which the target replaces with columnar inputs.
These wrappers standardize how the engine ingests each format:

- column pruning at the read (never load columns a pipeline doesn't use);
- optional expression pushdown for parquet (row-group skipping);
- explicit schema validation after read (M13 analog — Arrow schema
  enforcement instead of runtime duck-typing);
- block coalescing to ~4 tasks per CPU (measured: hundreds of file-sized
  blocks cost more in dispatch than they buy in balance).
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data as rd


def _target_blocks() -> int:
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        cpus = 8
    return max(32, cpus * 4)


def read_parquet(paths, *, columns: list[str] | None = None, filter=None,
                 coalesce: bool = True):
    kwargs = {}
    if columns:
        kwargs["columns"] = columns
    if filter is not None:
        kwargs["filter"] = filter  # pyarrow dataset expression → row-group pushdown
    if coalesce:
        kwargs["override_num_blocks"] = _target_blocks()
    return rd.read_parquet(paths, **kwargs)


def read_json(paths, **kwargs):
    return rd.read_json(paths, **kwargs)


def read_csv(paths, **kwargs):
    return rd.read_csv(paths, **kwargs)


def read_text(paths, **kwargs):
    return rd.read_text(paths, **kwargs)


def read_binary(paths, include_paths: bool = True, **kwargs):
    """Opaque binary payloads (media files) — one row per file, path kept
    as the id column; feed into stages/multimodal.extract_media_features."""
    return rd.read_binary_files(paths, include_paths=include_paths, **kwargs)


def validate_schema(ds, expected: pa.Schema, *, strict_types: bool = True):
    """Assert a Dataset's schema matches (names always; types unless
    ``strict_types=False``). Returns ds unchanged — put it right after the
    read so drift fails fast, not three stages later."""
    actual = ds.schema()
    if list(actual.names) != list(expected.names):
        raise ValueError(f"schema names {actual.names} != expected {expected.names}")
    if strict_types:
        actual_types = dict(zip(actual.names, actual.types))
        for field in expected:
            if actual_types[field.name] != field.type:
                raise ValueError(
                    f"column {field.name!r}: type {actual_types[field.name]} "
                    f"!= expected {field.type}"
                )
    return ds
