"""Lexical gates (stages/lexgate): exact-token blockword semantics (no
substring matches), filter/stats agreement, OOV vocabulary rule and
boundary ties, SQL twin parity for both. The sf0.01 parity of the
registered queries is covered by tests/test_queries.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.lexgate import (blockword_filter,
                                                  blockword_stats,
                                                  blockword_stats_sql,
                                                  oov_rate, oov_rate_sql)

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pd.DataFrame({
    "doc_id": np.arange(8, dtype="int64"),
    "text": [
        "clean text about data pipelines",
        "this one mentions badword right here",
        "classic classwork hides no block",   # substring must NOT match
        "BADWORD in caps still counts",
        "other term naughty present",
        "",
        None,
        "badword and naughty both",
    ],
    "source": [f"s{i % 2}" for i in range(8)],
})
BLOCK = ["badword", "naughty"]


def test_blockword_exact_token_semantics():
    kept = blockword_filter(rd.from_pandas(DOCS), "text",
                            BLOCK).to_pandas()
    flagged = blockword_filter(rd.from_pandas(DOCS), "text", BLOCK,
                               keep_flagged=True).to_pandas()
    assert set(flagged["doc_id"]) == {1, 3, 4, 7}
    assert set(kept["doc_id"]) == {0, 2, 5, 6}


def test_blockword_stats_and_sql():
    got = (blockword_stats(rd.from_pandas(DOCS).repartition(3), "text",
                           "source", BLOCK)
           .to_pandas().sort_values("source").reset_index(drop=True))
    con = duckdb.connect()
    con.register("t", DOCS)
    sq = (con.execute(blockword_stats_sql("t", "text", "source", BLOCK))
          .df().sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sq[got.columns].astype(
        got.dtypes.to_dict()))
    assert got["flagged_docs"].sum() == 4


def test_oov_rule_and_sql():
    docs = pd.DataFrame({
        "text": ["aa aa aa bb bb cc", "bb cc dd", "dd ee", None],
        "source": ["x", "x", "y", "y"],
    })
    # counts: aa=3 bb=3 cc=2 dd=2 ee=1; vocab_size=2 with (n DESC, w ASC)
    # → {aa, bb}; x = 9 tokens / oov cc,cc,dd; y = 2 tokens / oov dd,ee
    got = (oov_rate(rd.from_pandas(docs).repartition(2), "text", "source",
                    vocab_size=2)
           .to_pandas().sort_values("source").reset_index(drop=True))
    assert got["total_tokens"].tolist() == [9, 2]
    assert got["oov_tokens"].tolist() == [3, 2]
    con = duckdb.connect()
    con.register("t", docs)
    sq = (con.execute(oov_rate_sql("t", "text", "source", vocab_size=2))
          .df().sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sq[got.columns].astype(
        got.dtypes.to_dict()))


def test_oov_full_vocab_zero():
    docs = pd.DataFrame({"text": ["a b c", "c b a"], "source": ["s", "s"]})
    got = oov_rate(rd.from_pandas(docs), "text", "source",
                   vocab_size=10).to_pandas()
    assert got["oov_tokens"].tolist() == [0]
    assert got["oov_share"].tolist() == [0.0]
