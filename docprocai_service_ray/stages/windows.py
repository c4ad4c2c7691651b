"""Windowed aggregates over event streams (SURVEY.md §2.8).

Ray Data is a batch engine — no watermarks — so stream-shaped semantics
are expressed per the guide: partition by key, order by ts *within* the
partition, window with vectorized pandas inside one grouped pass
(state/groupby.partition_reduce → all rows of a key co-located, one
vectorized call per partition, never per key).

- ``tumbling``: fixed buckets (see benchqueries.hourly_events — SQL-checked)
- ``sliding_counts``: overlapping fixed windows (each event lands in
  window_size/slide buckets — explode + aggregate)
- ``session_windows``: gap-based sessions (gaps-and-islands), SQL-checked
  against a LAG() oracle. Boundary rule depends only on ts *differences*,
  so equal-ts ties cannot change the result at any parallelism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..state.groupby import partition_reduce


def session_stats(events_ds, *, key_col: str = "user_id", ts_col: str = "ts",
                  gap_minutes: int = 30, num_partitions: int = 32):
    """Per key: number of gap-based sessions and total events.
    Output columns: (key_col, n_sessions, n_events)."""
    gap = pd.Timedelta(minutes=gap_minutes)

    def reduce(part: pd.DataFrame) -> pd.DataFrame:
        part = part.sort_values([key_col, ts_col], kind="stable")
        ts = pd.to_datetime(part[ts_col])
        new_key = part[key_col] != part[key_col].shift()
        gap_break = (ts - ts.shift()) > gap
        new_session = (new_key | gap_break).astype("int64")
        out = (
            part.assign(__ns=new_session)
            .groupby(key_col, as_index=False)
            .agg(n_sessions=("__ns", "sum"), n_events=("__ns", "size"))
        )
        return out.astype({"n_sessions": "int64", "n_events": "int64"})

    return partition_reduce(
        events_ds.select_columns([key_col, ts_col]), [key_col], reduce,
        num_partitions=num_partitions,
    )


def sliding_counts(events_ds, *, ts_col: str = "ts", key_col: str = "event_type",
                   window_minutes: int = 120, slide_minutes: int = 60):
    """Overlapping windows: each event is exploded into the
    window/slide slots covering it, then a grouped count per
    (window_start, key). Output: (window_start: str, key, n)."""
    n_slots = window_minutes // slide_minutes
    slide = pd.Timedelta(minutes=slide_minutes)

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        ts = pd.to_datetime(df[ts_col])
        base = ts.dt.floor(f"{slide_minutes}min")
        frames = []
        for i in range(n_slots):
            start = base - i * slide
            frames.append(pd.DataFrame({
                "window_start": start.dt.strftime("%Y-%m-%d %H:%M:%S"),
                "key": df[key_col].values,
            }))
        out = pd.concat(frames, ignore_index=True)
        return out.groupby(["window_start", "key"], as_index=False).agg(
            n=("key", "size")
        )

    def merge(part: pd.DataFrame) -> pd.DataFrame:
        out = part.groupby(["window_start", "key"], as_index=False).agg(n=("n", "sum"))
        return out.astype({"n": "int64"})

    partials = events_ds.select_columns([ts_col, key_col]).map_batches(
        explode, batch_format="pandas"
    )
    return partition_reduce(partials, ["window_start", "key"], merge,
                            num_partitions=16)
