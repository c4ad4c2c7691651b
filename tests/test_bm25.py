"""BM25 search (stages/bm25): brute-force formula parity, SQL twin
parity, ranking/tie-break, missing-term idf, k truncation, parallelism
invariance. The sf0.01 parity of the registered ``bm25_search_docs``
query is covered by tests/test_queries.py."""

from __future__ import annotations

import math
import re

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.bm25 import bm25_sql, bm25_topk

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pd.DataFrame({
    "doc_id": np.arange(10, dtype="int64"),
    "text": [
        "spark streams data fast",
        "spark spark spark window",
        "window functions roll over batches",
        "the batch window of spark",
        "nothing relevant here at all",
        "",
        None,
        "batch batch batch batch batch batch batch batch",
        "spark window batch",
        "a very long document " + "filler words only " * 40 + "spark",
    ],
})
TERMS = ["spark", "window", "batch"]


def _brute(docs: pd.DataFrame, terms, k=5, k1=1.2, b=0.75) -> pd.DataFrame:
    toks = {r.doc_id: re.findall(r"[a-z]+", (r.text or "").lower())
            for r in docs.itertuples()}
    lens = {d: len(ws) for d, ws in toks.items() if ws}
    n = len(lens)
    avgdl = sum(lens.values()) / n
    df = {t: sum(1 for ws in toks.values() if t in ws) for t in terms}
    rows = []
    for d, ws in toks.items():
        s = 0.0
        for t in terms:
            tf = ws.count(t)
            if tf == 0:
                continue
            idf = math.log((n - df[t] + 0.5) / (df[t] + 0.5) + 1)
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * lens[d] / avgdl))
        if s > 0:
            rows.append((d, round(s, 6)))
    out = pd.DataFrame(rows, columns=["doc_id", "score"])
    return (out.sort_values(["score", "doc_id"], ascending=[False, True])
            .head(k).reset_index(drop=True))


def test_matches_brute_and_sql():
    got = (bm25_topk(rd.from_pandas(DOCS).repartition(3), "doc_id", "text",
                     TERMS, k=5).to_pandas().reset_index(drop=True))
    exp = _brute(DOCS, TERMS, k=5)
    pd.testing.assert_frame_equal(got, exp)
    con = duckdb.connect()
    con.register("t", DOCS)
    sq = con.execute(bm25_sql("t", "doc_id", "text", TERMS, k=5)).df()
    pd.testing.assert_frame_equal(got, sq.astype(got.dtypes.to_dict()))


def test_rare_term_outranks_common():
    """One 'window' (df=3) beats one 'batch' (df=3)? — use a corpus where
    the rare term's idf dominates: 'spark' appears in 5 docs, 'window'
    in 3; a window-only doc must outrank a spark-only doc of equal
    length."""
    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5, 6],
        "text": ["spark aaa", "spark bbb", "spark ccc", "spark ddd",
                 "spark eee", "window fff", "window ggg"]})
    out = bm25_topk(rd.from_pandas(docs), "doc_id", "text",
                    ["spark", "window"], k=7).to_pandas()
    top2 = set(out.head(2)["doc_id"])
    assert top2 == {5, 6}


def test_fewer_matches_than_k():
    out = bm25_topk(rd.from_pandas(DOCS), "doc_id", "text",
                    ["streams"], k=10).to_pandas()
    assert out["doc_id"].tolist() == [0]


def test_no_match_empty():
    out = bm25_topk(rd.from_pandas(DOCS), "doc_id", "text",
                    ["zzzquery"], k=5).to_pandas()
    assert len(out) == 0


def test_parallelism_invariance():
    ref = None
    for parts in (1, 4, 9):
        out = (bm25_topk(rd.from_pandas(DOCS).repartition(parts), "doc_id",
                         "text", TERMS, k=6).to_pandas()
               .reset_index(drop=True))
        if ref is None:
            ref = out
        else:
            pd.testing.assert_frame_equal(out, ref)
