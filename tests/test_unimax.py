"""UniMax allocation (stages/textstats.unimax_allocation) — closed-form
properties, SQL-twin parity, parallelism invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.textstats import (
    token_counts,
    unimax_allocation,
    unimax_allocation_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus() -> pd.DataFrame:
    # skewed mix: en huge, de medium, fr/it/nl small
    rows = []
    for lang, n_docs, words in (("en", 60, 40), ("de", 20, 25),
                                ("fr", 6, 10), ("it", 3, 8), ("nl", 2, 5)):
        for i in range(n_docs):
            rows.append({"lang": lang,
                         "text": " ".join(f"w{lang}{i}x{j}"
                                          for j in range(words))})
    return pd.DataFrame(rows)


def _sql_twin(df: pd.DataFrame, budget: int, epochs: float) -> pd.DataFrame:
    con = duckdb.connect()
    con.register("docs", df)
    return con.execute(unimax_allocation_sql(
        "docs", "lang", "text", budget_tokens=budget,
        max_epochs=epochs)).df()


@pytest.mark.parametrize("budget", [100, 900, 3_000, 10_000, 1_000_000])
def test_sql_parity_across_budgets(budget):
    df = _corpus()
    got = unimax_allocation(rd.from_pandas(df), "lang", "text",
                            budget_tokens=budget)
    want = _sql_twin(df, budget, 4.0)
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True),
        check_dtype=False)


def test_waterfilling_properties():
    df = _corpus()
    budget = 2_500
    out = unimax_allocation(rd.from_pandas(df), "lang", "text",
                            budget_tokens=budget, max_epochs=4.0)
    toks = df.assign(t=token_counts(df["text"])).groupby("lang")["t"].sum()
    # caps honoured
    assert (out["epochs"] <= 4.0 + 1e-9).all()
    assert np.allclose(out["cap_tokens"],
                       out.set_index("lang").index.map(toks) * 4.0)
    # budget exhausted when sum(caps) >= budget
    assert out["alloc_tokens"].sum() == pytest.approx(budget, rel=1e-9)
    # small languages get their full cap before big ones (fairness)
    small = out.set_index("lang").loc["nl"]
    big = out.set_index("lang").loc["en"]
    assert small["alloc_tokens"] == pytest.approx(small["cap_tokens"])
    assert big["alloc_tokens"] < big["cap_tokens"]
    # uncapped languages share one waterline
    uncapped = out[out["alloc_tokens"] < out["cap_tokens"] - 1e-9]
    assert uncapped["alloc_tokens"].nunique() == 1


def test_budget_exceeding_caps_gives_everyone_cap():
    df = _corpus()
    out = unimax_allocation(rd.from_pandas(df), "lang", "text",
                            budget_tokens=10**9, max_epochs=2.0)
    assert np.allclose(out["alloc_tokens"], out["cap_tokens"])
    assert np.allclose(out["epochs"], 2.0)


def test_parallelism_invariance():
    df = _corpus()
    outs = [unimax_allocation(rd.from_pandas(df).repartition(p), "lang",
                              "text", budget_tokens=1_234)
            for p in (1, 7)]
    pd.testing.assert_frame_equal(outs[0], outs[1])
