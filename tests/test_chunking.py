"""Document chunking (stages/chunking): window rule vs a brute
reference, SQL twin parity across boundary sizes, text reassembly
coverage, stride validation. The sf0.01 parity of the registered
``doc_chunk_spans`` query is covered by tests/test_queries.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.chunking import chunk_spans, chunk_spans_sql

pytestmark = pytest.mark.usefixtures("ray_session")


def _brute(docs: pd.DataFrame, c: int, s: int) -> list[tuple]:
    rows = []
    for r in docs.itertuples():
        ws = (r.text or "").split()
        n, p, ci = len(ws), 0, 0
        while p < n:
            e = min(p + c, n)
            rows.append((r.doc_id, ci, p, e, e - p))
            if e >= n:
                break
            p, ci = p + s, ci + 1
    return sorted(rows)


DOCS = pd.DataFrame({
    "doc_id": np.arange(9, dtype="int64"),
    "text": [None, "", "one", "w " * 8, "w " * 9, "w " * 10,
             "w " * 17, "w " * 24, "lorem ipsum " * 40],
})


@pytest.mark.parametrize("c,s", [(8, 4), (8, 8), (5, 2), (3, 3)])
def test_window_rule_and_sql(c, s):
    got = (chunk_spans(rd.from_pandas(DOCS).repartition(3), "doc_id",
                       "text", chunk_tokens=c, stride=s)
           .to_pandas().sort_values(["doc_id", "chunk_id"])
           .reset_index(drop=True))
    assert sorted(map(tuple, got[["doc_id", "chunk_id", "tok_start",
                                  "tok_end", "n_tokens"]]
                      .itertuples(index=False))) == _brute(DOCS, c, s)
    con = duckdb.connect()
    con.register("t", DOCS)
    sq = (con.execute(chunk_spans_sql("t", "doc_id", "text",
                                      chunk_tokens=c, stride=s)).df()
          .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sq[got.columns].astype(
        got.dtypes.to_dict()))


def test_emit_text_covers_doc():
    docs = pd.DataFrame({"doc_id": [0], "text": ["a b c d e f g h i j"]})
    out = (chunk_spans(rd.from_pandas(docs), "doc_id", "text",
                       chunk_tokens=4, stride=2, emit_text=True)
           .to_pandas().sort_values("chunk_id"))
    # consecutive windows overlap by chunk-stride tokens and the union
    # covers every token in order
    assert out["text"].tolist() == ["a b c d", "c d e f", "e f g h",
                                    "g h i j"]
    assert out["tok_end"].iloc[-1] == 10


def test_stride_validation():
    with pytest.raises(ValueError):
        chunk_spans(rd.from_pandas(DOCS), "doc_id", "text",
                    chunk_tokens=8, stride=0)
    with pytest.raises(ValueError):
        chunk_spans(rd.from_pandas(DOCS), "doc_id", "text",
                    chunk_tokens=8, stride=9)
