"""Taxonomy routing (stages/taxonomy) — SQL parity, hand-computed
routing, first-wins ties, custom rules, parallelism invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.taxonomy import (
    DEFAULT_RULES,
    OTHER_TOPIC,
    route_topics,
    taxonomy_assign,
    taxonomy_sql,
    taxonomy_stats,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    vocab = ["join", "merge", "hash", "scan", "filter", "sort", "stream",
             "window", "batch", "vector", "column", "agg", "the", "a",
             "data", "table"]
    rows = []
    for i in range(120):
        words = rng.choice(vocab, size=rng.integers(5, 30))
        rows.append({"doc_id": i, "source": f"src{i % 4}",
                     "text": " ".join(words)})
    rows.append({"doc_id": 120, "source": "src0", "text": "nothing here"})
    rows.append({"doc_id": 121, "source": "src1", "text": None})
    return pd.DataFrame(rows)


def test_sql_parity(corpus):
    got = (taxonomy_stats(rd.from_pandas(corpus), "source", "text")
           .to_pandas().sort_values(["source", "topic"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(taxonomy_sql("docs", "text", "source")).df()
            .sort_values(["source", "topic"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hand_routing():
    texts = pd.Series([
        "join join merge scan",      # joins 3 vs scan_exec 1
        "scan stream",               # tie 1–1 → first rule wins: scan_exec
        "plain prose only",          # no rule hits → other
        "vector vector column agg",  # columnar 4
    ])
    r = route_topics(texts)
    assert list(r["topic"]) == ["joins", "scan_exec", OTHER_TOPIC,
                                "columnar"]
    assert list(r["hits"]) == [3, 1, 0, 4]


def test_case_and_boundaries():
    # lowercasing applies; substrings do not match (\b boundaries)
    r = route_topics(pd.Series(["JOIN Merge", "joined mergers hashing"]))
    assert list(r["topic"]) == ["joins", OTHER_TOPIC]
    assert list(r["hits"]) == [2, 0]


def test_assign_matches_route(corpus):
    per_doc = (taxonomy_assign(rd.from_pandas(corpus), "doc_id", "text",
                               keep_cols=("source",))
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
    ref = route_topics(corpus["text"])
    assert list(per_doc["topic"]) == list(ref["topic"])
    assert list(per_doc["hits"]) == list(ref["hits"])
    assert list(per_doc["source"]) == list(corpus["source"])


def test_custom_rules_and_invariance(corpus):
    rules = [("db", r"\b(table|data)\b"), ("glue", r"\b(the|a)\b")]
    base = (taxonomy_stats(rd.from_pandas(corpus), "source", "text",
                           rules=rules).to_pandas()
            .sort_values(["source", "topic"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(taxonomy_sql("docs", "text", "source", rules=rules))
            .df().sort_values(["source", "topic"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(base, want, check_dtype=False)
    again = (taxonomy_stats(rd.from_pandas(corpus).repartition(7), "source",
                            "text", rules=rules).to_pandas()
             .sort_values(["source", "topic"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(base, again)


def test_topic_stratified_sample(corpus):
    from docprocai_service_ray.stages.taxonomy import (
        topic_stratified_sample, topic_stratified_sql)

    rates = {"joins": 0.5, "scan_exec": 0.0, "streaming": 1.0,
             "columnar": 0.2}
    got = (topic_stratified_sample(rd.from_pandas(corpus), "doc_id",
                                   "text", rates, default_rate=1.0)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(topic_stratified_sql("docs", "doc_id", "text",
                                             rates, default_rate=1.0))
            .df().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    # rate-0 stratum fully dropped, rate-1 strata fully kept
    assert not (got["topic"] == "scan_exec").any()
    full = route_topics(corpus["text"])
    full_by = pd.DataFrame({"doc_id": corpus["doc_id"].to_numpy(),
                            "topic": full["topic"].to_numpy()})
    for t in ("streaming", OTHER_TOPIC):
        assert (got["topic"] == t).sum() == (full_by["topic"] == t).sum()
    # sampled set is a subset of the full routing, same topic per doc
    merged = got.merge(full_by, on="doc_id", suffixes=("", "_full"))
    assert (merged["topic"] == merged["topic_full"]).all()


def test_totals_preserved(corpus):
    out = taxonomy_stats(rd.from_pandas(corpus), "source", "text").to_pandas()
    assert out["n_docs"].sum() == len(corpus)
    # every topic present in the rollup is a rule name or "other"
    legal = {t for t, _ in DEFAULT_RULES} | {OTHER_TOPIC}
    assert set(out["topic"]) <= legal
