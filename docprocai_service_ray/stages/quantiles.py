"""Grouped quantiles (A-family aggregate a training-data pipeline needs:
length/quality percentile gates, per-source score cutoffs).

Exact tier: co-locate each group's values with ``partition_reduce`` (one
hash exchange), one vectorized ``numpy.quantile`` per group — linear
interpolation, bit-matching DuckDB ``quantile_cont``, so the op is
SQL-oracle-checked. Exact quantiles fundamentally need every value of a
group in one place; for corpus-scale groups compose with
``stages.sampling.hash_sample`` first (deterministic sampled quantiles —
same predicate both sides keeps it oracle-checkable) or gate on group
size upstream."""

from __future__ import annotations

import numpy as np
import pandas as pd


def grouped_quantiles(ds, by: str, value_col: str, qs: list[float], *,
                      num_partitions: int = 16, round_to: int = 6):
    """→ one row per group: (by, q_<pct> ... ) exact quantiles."""
    from ..state.groupby import partition_reduce

    names = [f"q_{int(round(q * 100)):02d}" for q in qs]

    def reduce(part: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in part.groupby(by, sort=False):
            vals = g[value_col].to_numpy(dtype=np.float64)
            quants = np.quantile(vals, qs)  # linear == DuckDB quantile_cont
            rows.append({by: key, "n": np.int64(len(vals)),
                         **{n: round(float(v), round_to)
                            for n, v in zip(names, quants)}})
        cols = [by, "n", *names]
        if not rows:
            return pd.DataFrame({c: pd.Series(dtype="float64") for c in cols})
        return pd.DataFrame(rows)[cols]

    return partition_reduce(ds, [by], reduce, num_partitions=num_partitions)


def quantile_sql(table: str, by: str, value_col: str, qs: list[float],
                 *, round_to: int = 6) -> str:
    """The matching DuckDB oracle for ``grouped_quantiles``."""
    cols = ", ".join(
        f"ROUND(quantile_cont({value_col}, {q}), {round_to}) "
        f"AS q_{int(round(q * 100)):02d}"
        for q in qs
    )
    return f"SELECT {by}, COUNT(*) AS n, {cols} FROM {table} GROUP BY 1"
