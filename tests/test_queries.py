"""Replicates the driver's correctness gate locally: run EVERY query that
has an oracle_sql() entry (bench SQL, text-analysis SQL, golden-parquet
reads) through __ray_entry__ at sf0.01 and compare row count, column names
and order-insensitive values against DuckDB."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entry

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLE_SQL = entry.oracle_sql()
QUERIES = entry.queries()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]
    rows = []
    for tup in df.itertuples(index=False):
        canon_row = []
        for v in tup:
            if isinstance(v, float):
                canon_row.append(round(v, 6) if not math.isnan(v) else "nan")
            else:
                canon_row.append(v)
        rows.append(tuple(canon_row))
    return sorted(map(repr, rows))


@pytest.mark.parametrize("name", sorted(ORACLE_SQL))
def test_query_matches_oracle(name, duck):
    ray_df = QUERIES[name](SF_DIR)
    if hasattr(ray_df, "to_pandas"):
        ray_df = ray_df.to_pandas()
    sql_df = duck.execute(ORACLE_SQL[name]).fetchdf()
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {list(ray_df.columns)} vs {list(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} vs {len(sql_df)}"
    got, exp = _canon(ray_df), _canon(sql_df)
    mism = [(g, e) for g, e in zip(got, exp) if g != e][:3]
    assert got == exp, f"{name}: first value mismatches: {mism}"


def test_every_query_has_an_oracle():
    """Drift guard: a queries() entry without an oracle_sql() twin would
    silently skip the driver's correctness gate."""
    assert sorted(QUERIES) == sorted(ORACLE_SQL)


def test_triple_pr_vs_oracle_is_exact(ray_session):
    """The north-rule metric: live pipeline vs the independent scalar
    oracle must hold P = R = 1.0 (bar: ≥ 0.95) at the smoke scale."""
    import __ray_entry__ as entry

    t = entry.queries()["triple_pr_vs_oracle"]("/root/testdata/sf0.001")
    row = t.to_pandas().iloc[0]
    assert row["n_live"] == row["n_ref"] == row["n_common"] > 0
    assert row["precision"] == 1.0 and row["recall"] == 1.0
