"""Regression tests for the round-4 ADVICE items fixed in round 5:

1. urltools host extraction is fail-closed on raw crawl URLs (uppercase
   scheme, userinfo) — engine AND SQL twin (the medium item; the
   per-case matrix lives in test_urltools.HOSTS, here we pin the SQL
   twin on the adversarial forms).
2. normalize_url_sql leading-tracker steps run with 'g' so engine and
   SQL agree on URLs containing a second literal '?'.
3. lang_mix(_alpha)_sql tokenizes with the Python-\\s-equivalent RE2
   class, so NBSP/unicode-space text counts identically on both sides.
4. Empty pandas blocks mixed with string-id corpora keep a consistent
   id dtype through bm25 / quantize / leakage_safe_split (no Arrow
   schema-union failure).
5. export_jsonl manifest collapses duplicate-content shards (covered in
   test_export.test_duplicate_blocks_collapse_in_manifest).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.bm25 import bm25_topk
from docprocai_service_ray.stages.keepbest import leakage_safe_split
from docprocai_service_ray.stages.quantize import quantized_topk
from docprocai_service_ray.stages.textstats import (
    lang_mix_alpha_sql, lang_mix_alpha_weights, lang_mix_sql,
    lang_mix_weights, token_counts)
from docprocai_service_ray.stages.urltools import (
    blocklist_predicate_sql, host_blocklist_filter, normalize_url_series,
    normalize_url_sql)

pytestmark = pytest.mark.usefixtures("ray_session")


# ---------------------------------------------------------------- item 1
ADVERSARIAL_URLS = [
    "HTTP://blocked.example/page",          # uppercase scheme
    "hTtPs://sub.blocked.example/x",        # mixed-case scheme
    "http://user@blocked.example/x",        # userinfo
    "http://user:pw@www.blocked.example/",  # userinfo w/ password
    "http://blocked.example@safe.example/", # blocked name in userinfo only
    "ftp://blocked.example/f",              # non-http scheme still parses
    "http://safe.example/ok",
]
BLOCK = ["blocked.example"]
EXPECT_BLOCKED = {
    "HTTP://blocked.example/page", "hTtPs://sub.blocked.example/x",
    "http://user@blocked.example/x", "http://user:pw@www.blocked.example/",
    "ftp://blocked.example/f",
}


def test_blocklist_fail_closed_engine():
    ds = rd.from_pandas(pd.DataFrame({"url": ADVERSARIAL_URLS}))
    blocked = host_blocklist_filter(ds, BLOCK, keep_blocked=True).to_pandas()
    assert set(blocked["url"]) == EXPECT_BLOCKED


def test_blocklist_fail_closed_sql_parity():
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"url": ADVERSARIAL_URLS}))
    got = con.execute("SELECT url FROM t WHERE "
                      + blocklist_predicate_sql("url", BLOCK)).df()
    assert set(got["url"]) == EXPECT_BLOCKED


# ---------------------------------------------------------------- item 2
def test_double_question_mark_sql_parity():
    urls = pd.Series([
        "http://a.example/p?utm_source=x&q=1?utm_medium=y",
        "http://a.example/p?q=1?utm_source=z",       # second literal '?'
        "http://a.example/p?utm_source=a?utm_source=b",
        "http://a.example/p?gclid=1&x=2#frag?utm_source=y",
    ])
    py = normalize_url_series(urls)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": urls, "k": range(len(urls))}))
    sq = con.execute(
        f"SELECT {normalize_url_sql('u')} AS u FROM t ORDER BY k").df()["u"]
    assert py.tolist() == sq.tolist()


# ---------------------------------------------------------------- item 3
NBSP_DOCS = pd.DataFrame({
    "lang": ["en", "en", "de", "de", "fr"],
    "text": ["plain ascii words here",
             "nb sp and thin em spaces",    # unicode ws
             "zeile eins zwei drei",
             "a　b c d \x85e",               # ideographic/LS/PS/NEL
             "mot un deux"],
})


@pytest.mark.parametrize("fn,sql_fn,kw", [
    (lang_mix_weights, lang_mix_sql, {}),
    (lang_mix_alpha_weights, lang_mix_alpha_sql, {"alpha": 0.3}),
])
def test_lang_mix_sql_unicode_ws_parity(fn, sql_fn, kw):
    ds = rd.from_pandas(NBSP_DOCS)
    eng = fn(ds, "lang", "text", **kw)
    if not isinstance(eng, pd.DataFrame):
        eng = eng.to_pandas()
    eng = eng.sort_values("lang").reset_index(drop=True)
    con = duckdb.connect()
    con.register("docs", NBSP_DOCS)
    ora = (con.execute(sql_fn("docs", "lang", "text", **kw)).df()
           .sort_values("lang").reset_index(drop=True))
    # n_tokens is the column the old ASCII-\s twin got wrong on this text
    assert eng["n_tokens"].tolist() == ora["n_tokens"].tolist()
    shared = [c for c in eng.columns if c in ora.columns]
    pd.testing.assert_frame_equal(eng[shared], ora[shared],
                                  check_dtype=False)
    # sanity: the engine counts what token_counts counts
    exp = (NBSP_DOCS.assign(tok=token_counts(NBSP_DOCS["text"]))
           .groupby("lang")["tok"].sum())
    assert dict(zip(eng["lang"], eng["n_tokens"])) == exp.to_dict()


# ---------------------------------------------------------------- item 4
def _string_id_docs():
    # 1 non-empty block + 1 block whose rows all miss the query terms /
    # get filtered, exercising the empty-batch fallback path
    return pd.DataFrame({
        "doc_id": [f"doc-{i}" for i in range(8)],
        "text": (["apple banana cherry"] * 4) + (["zzz qqq xxx"] * 4),
    })


def test_bm25_string_ids_with_empty_batches():
    docs = _string_id_docs()
    ds = rd.from_pandas(docs).repartition(4)
    out = bm25_topk(ds, "doc_id", "text", ["apple", "banana"], k=3)
    res = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(res) == 3
    assert all(isinstance(x, str) for x in res["doc_id"])


def test_quantize_string_ids_with_empty_batches():
    rng = np.random.default_rng(0)
    df = pd.DataFrame({
        "vec_id": [f"v{i}" for i in range(16)],
        "embedding": [rng.normal(size=8).tolist() for _ in range(16)],
    })
    ds = rd.from_pandas(df).repartition(6)
    out = quantized_topk(ds, np.asarray(df["embedding"][0]), 3)
    res = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert len(res) == 3 and res["score"].iloc[0] >= 0.99
    assert all(isinstance(x, str) for x in res["vec_id"])


def test_leakage_split_string_ids_with_empty_batches():
    docs = pd.DataFrame({
        "doc_id": [f"d{i}" for i in range(12)],
        "text": [f"unique text {i} " * 5 for i in range(12)],
    })
    ds = rd.from_pandas(docs).repartition(5)
    out = leakage_safe_split(ds, "doc_id", "text").to_pandas()
    assert sorted(out["doc_id"]) == sorted(docs["doc_id"])
    assert set(out["split"]) <= {"train", "holdout"}
