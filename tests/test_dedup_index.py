"""Persisted MinHash dedup index (stages/dedup.build_dedup_index /
probe_dedup_index): planted exact/near/novel docs, estimate accuracy,
idempotent rebuild, meta-driven probe params."""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.dedup import (
    build_dedup_index,
    jaccard,
    probe_dedup_index,
    word_shingles,
)
from docprocai_service_ray.state.groupby import collect_pandas

pytestmark = pytest.mark.usefixtures("ray_session")

WORDS = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
         "hotel", "india", "juliet", "kilo", "lima", "mike", "november"]


def _corpus(n=40, seed=9):
    rng = np.random.default_rng(seed)
    texts = [" ".join(rng.choice(WORDS, size=60).tolist()) for _ in range(n)]
    return pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                         "text": texts})


def _probe_df(corpus: pd.DataFrame) -> pd.DataFrame:
    exact = corpus.loc[3, "text"]
    near_words = corpus.loc[7, "text"].split(" ")
    near_words[30] = "zulu"  # one-word edit → high but < 1 jaccard
    rng = np.random.default_rng(77)
    novel = " ".join(rng.choice(["xray", "yankee", "zulu"], size=60).tolist())
    return pd.DataFrame({
        "doc_id": np.array([1000, 1001, 1002], dtype="int64"),
        "text": [exact, " ".join(near_words), novel],
    })


@pytest.fixture()
def index_dir(tmp_path):
    return str(tmp_path / "dedup_index")


def test_probe_finds_exact_and_near_not_novel(index_dir):
    corpus = _corpus()
    build_dedup_index(rd.from_pandas(corpus).repartition(5), index_dir,
                      "doc_id", "text")
    shard = _probe_df(corpus)
    got = collect_pandas(
        probe_dedup_index(rd.from_pandas(shard), index_dir,
                          "doc_id", "text", threshold=0.5),
        ["new_id", "corpus_id", "est_jaccard"],
    ).sort_values(["new_id", "corpus_id"]).reset_index(drop=True)

    exact = got[got["new_id"] == 1000]
    assert (3, 1.0) in set(zip(exact["corpus_id"], exact["est_jaccard"]))
    near = got[(got["new_id"] == 1001) & (got["corpus_id"] == 7)]
    assert len(near) == 1
    est = float(near["est_jaccard"].iloc[0])
    true_j = jaccard(word_shingles(corpus.loc[7, "text"], 5),
                     word_shingles(shard.loc[1, "text"], 5))
    assert est >= 0.5 and abs(est - true_j) < 0.25  # σ≈0.05 at 64 perms
    assert not (got["new_id"] == 1002).any()


def test_index_stores_no_text_and_is_idempotent(index_dir):
    corpus = _corpus(n=20)
    d1 = build_dedup_index(rd.from_pandas(corpus), index_dir,
                           "doc_id", "text")
    import pyarrow.dataset as pads

    for sub in ("bands", "sigs"):
        cols = pads.dataset(os.path.join(d1, sub)).schema.names
        assert "text" not in cols
    sig_rows = pads.dataset(os.path.join(d1, "sigs")).count_rows()
    assert sig_rows == 20  # exactly one signature row per doc
    mtime = os.path.getmtime(os.path.join(d1, "_SUCCESS"))
    d2 = build_dedup_index(rd.from_pandas(corpus), index_dir,
                           "doc_id", "text")
    assert d2 == d1
    assert os.path.getmtime(os.path.join(d1, "_SUCCESS")) == mtime


def test_probe_uses_index_params_from_meta(index_dir):
    corpus = _corpus(n=15)
    build_dedup_index(rd.from_pandas(corpus), index_dir, "doc_id", "text",
                      num_perms=32, bands=8, shingle_words=3, seed=7)
    # probing the corpus against itself: every doc must self-match at 1.0
    got = collect_pandas(
        probe_dedup_index(rd.from_pandas(corpus), index_dir,
                          "doc_id", "text", threshold=0.99),
        ["new_id", "corpus_id", "est_jaccard"],
    )
    self_hits = got[got["new_id"] == got["corpus_id"]]
    assert len(self_hits) == 15
    assert (self_hits["est_jaccard"] == 1.0).all()
