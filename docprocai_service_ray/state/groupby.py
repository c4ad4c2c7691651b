"""Partition-reduce: the vectorized grouped-aggregation pattern.

``Dataset.groupby(key).map_groups(fn)`` invokes ``fn`` once per GROUP —
per-key Python overhead that dominates wall time as soon as there are
thousands of keys. This helper groups by ``hash(key) % P`` instead (P
partition groups total, each holding *all* rows of its keys) and hands the
whole partition to a VECTORIZED reduce function (pandas groupby.agg /
drop_duplicates / a tight plain-Python loop) — same result, P udf calls
instead of n_keys.

Skew note: a head key's rows land in one partition, so callers must
pre-aggregate per batch first (phase 0) so no single key's row count is
proportional to the corpus — the standard partial+final pattern.

The row hash is ``pd.util.hash_pandas_object`` with the default fixed hash
key: deterministic across processes and runs.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd


def resolve_num_partitions(ds, num_partitions: int | None) -> int:
    """``None`` → auto-size from the metadata-only input-bytes estimate
    (~64 MB per partition, state/joins.auto_buckets), so grouped exchanges
    scale their fan-in with input volume exactly like hash_join sizes its
    buckets. Explicit ints pass through untouched."""
    if num_partitions is not None:
        return num_partitions
    from .joins import auto_buckets

    return auto_buckets(ds, default=64)


def partition_reduce(
    ds,
    key_cols: list[str],
    reduce_partition: Callable[[pd.DataFrame], pd.DataFrame],
    num_partitions: int | None = None,
):
    """Co-locate all rows sharing ``key_cols`` values and apply a vectorized
    per-partition reduce. ``reduce_partition`` sees every row of every key
    hashed into its partition (the ``__part`` column is already dropped).

    ``num_partitions=None`` (the default) auto-sizes the fan-in from the
    metadata-only input-bytes estimate, targeting ~64 MB per partition
    (state/joins.auto_buckets — the same self-sizing hash_join uses), so a
    100× corpus gets 100× reduce tasks instead of 100× task size. Pass an
    explicit value only for inputs known to be small by construction
    (vocab-sized partials, dimension tables)."""
    num_partitions = resolve_num_partitions(ds, num_partitions)

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        key = df[key_cols[0]].astype(str)
        for c in key_cols[1:]:  # vectorized concat — never .agg(axis=1)
            key = key + "\x1f" + df[c].astype(str)
        h = pd.util.hash_pandas_object(key, index=False)
        df["__part"] = (h % num_partitions).astype("int64")
        return df

    def run(group: pd.DataFrame) -> pd.DataFrame:
        return reduce_partition(group.drop(columns="__part"))

    return (
        ds.map_batches(tag, batch_format="pandas")
        .groupby("__part")
        .map_groups(run, batch_format="pandas")
    )


def distinct_rows(ds, key_cols: list[str], num_partitions: int | None = None):
    """Distinct rows by ``key_cols`` (vectorized drop_duplicates per
    partition; deterministic keep=first after a sort on the keys).
    ``num_partitions=None`` auto-sizes like :func:`partition_reduce`."""

    def reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(key_cols).drop_duplicates(key_cols, keep="first")

    return partition_reduce(ds, key_cols, reduce, num_partitions)


def collect_pandas(ds, columns: list[str]) -> pd.DataFrame:
    """Driver-side collect via Arrow block concat (``to_pandas``) — never
    per-row ``take_all()``, which converts every row to a Python dict
    (~3 orders of magnitude slower; 40k rows ≈ 20 s). Empty datasets
    collect to a column-less frame, so normalize to ``columns``."""
    df = ds.to_pandas()
    if len(df) == 0:
        return pd.DataFrame({c: pd.Series([], dtype="object") for c in columns})
    return df[list(columns)]  # enforce the declared schema (and prune)
