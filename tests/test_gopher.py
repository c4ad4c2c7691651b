"""Gopher quality rules (stages/gopher): one handcrafted doc per rule
boundary, SQL twin parity, filter/stats agreement. The sf0.01 parity of
the registered ``gopher_rules_by_source`` query is covered by
tests/test_queries.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.gopher import (gopher_filter,
                                                 gopher_rule_flags,
                                                 gopher_rules_sql,
                                                 gopher_rules_stats)

pytestmark = pytest.mark.usefixtures("ray_session")

CLEAN = "the data we have is good and that be true with many more words " * 5

DOCS = pd.DataFrame({
    "doc_id": np.arange(10, dtype="int64"),
    "source": [f"s{i % 2}" for i in range(10)],
    "text": [
        CLEAN,                                                  # passes all
        "short",                                                # r1 (+r7)
        ("x " * 60).strip(),                                    # r2 low, r7
        "# " * 30 + "the of and have to be that with " * 10,    # r3
        "\n".join("- bullet line the of and" for _ in range(20)),   # r4
        "\n".join("the of and tail..." for _ in range(20)),     # r5
        "12345 67890 " * 30 + "the of and be to",               # r6
        None,
        "",
        "supercalifragilisticexpialidocious " * 60 + "the of",  # r2 high
    ],
})


def test_rule_boundaries():
    f = gopher_rule_flags(DOCS["text"])
    assert f.loc[0].all()                       # the clean doc passes all
    assert not f.loc[1, "r1"]
    assert not f.loc[2, "r2"] and not f.loc[2, "r7"]
    assert not f.loc[3, "r3"]
    assert not f.loc[4, "r4"]
    assert not f.loc[5, "r5"]
    assert not f.loc[6, "r6"]
    assert not f.loc[7, "pass_all"] and not f.loc[8, "pass_all"]
    assert not f.loc[9, "r2"]
    assert f["pass_all"].sum() == 1


def test_stats_sql_parity_and_filter():
    got = (gopher_rules_stats(rd.from_pandas(DOCS).repartition(3), "text",
                              "source")
           .to_pandas().sort_values("source").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", DOCS)
    sq = (con.execute(gopher_rules_sql("t", "text", "source")).df()
          .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sq[got.columns].astype(
        got.dtypes.to_dict()))
    assert got["n_pass_all"].sum() == 1
    kept = gopher_filter(rd.from_pandas(DOCS), "text").to_pandas()
    assert kept["doc_id"].tolist() == [0]


def test_rule_kwargs_propagate():
    docs = pd.DataFrame({"source": ["s"], "text": [
        "the of and that be " * 5]})  # 25 words
    strict = gopher_rules_stats(rd.from_pandas(docs), "text", "source",
                                min_words=50).to_pandas()
    loose = gopher_rules_stats(rd.from_pandas(docs), "text", "source",
                               min_words=20).to_pandas()
    assert strict["fail_r1"].iloc[0] == 1 and loose["fail_r1"].iloc[0] == 0
