"""DSIR importance resampling (stages/dsir.py) — reference mirror,
planted-target selection, parallelism invariance, schema stability."""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.dsir import (
    _gumbel_from_key,
    dsir_log_ratio,
    dsir_scores,
    dsir_select,
    hashed_ngram_profile,
)

BUCKETS = 512
SEED = 7


def _mk(texts, start=0):
    return pd.DataFrame({"doc_id": np.arange(start, start + len(texts)),
                         "text": texts})


def _ref_features(text: str) -> Counter:
    """Single-process mirror of _feature_frame: unigrams + bigrams of
    the [a-z]+ tokenizer, hashed with the SAME pd.util hash."""
    toks = re.findall(r"[a-z]+", (text or "").lower())
    feats = list(toks) + [f"{a}\x1f{b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return Counter()
    h = pd.util.hash_pandas_object(
        pd.Series([f"d{SEED}\x1f" + f for f in feats]), index=False
    ).to_numpy()
    return Counter((h % np.uint64(BUCKETS)).astype("int64").tolist())


@pytest.fixture(scope="module")
def corpora():
    rng = np.random.default_rng(3)
    target = _mk(["solar panel grid energy storage battery"] * 30)
    raw_texts = []
    for i in range(200):
        if i % 8 == 0:
            raw_texts.append("the solar energy grid needs battery storage")
        else:
            raw_texts.append("misc page " + " ".join(
                f"tok{j}" for j in rng.integers(0, 40, 8)))
    return target, _mk(raw_texts)


class TestProfileMirror:
    def test_profile_matches_reference(self, corpora):
        _, raw = corpora
        prof = hashed_ngram_profile(rd.from_pandas(raw), "text",
                                    buckets=BUCKETS, seed=SEED)
        ref = Counter()
        for t in raw["text"]:
            ref.update(_ref_features(t))
        got = dict(zip(prof["bucket"], prof["cnt"]))
        assert got == dict(ref)

    def test_scores_match_reference(self, corpora):
        target, raw = corpora
        tp = hashed_ngram_profile(rd.from_pandas(target), "text",
                                  buckets=BUCKETS, seed=SEED)
        rp = hashed_ngram_profile(rd.from_pandas(raw), "text",
                                  buckets=BUCKETS, seed=SEED)
        lr = dsir_log_ratio(tp, rp, buckets=BUCKETS)
        got = (dsir_scores(rd.from_pandas(raw), "doc_id", "text", lr,
                           buckets=BUCKETS, seed=SEED)
               .to_pandas().set_index("doc_id"))
        for _, row in raw.iterrows():
            c = _ref_features(row["text"])
            want = round(sum(lr[b] * n for b, n in sorted(c.items())), 9)
            assert got.loc[row["doc_id"], "logw"] == pytest.approx(
                want, abs=1e-8)
            assert got.loc[row["doc_id"], "n_feats"] == sum(c.values())


class TestSelect:
    def test_planted_target_docs_selected(self, corpora):
        target, raw = corpora
        k = 25
        sel = dsir_select(rd.from_pandas(raw), rd.from_pandas(target),
                          "doc_id", "text", select_k=k, buckets=BUCKETS,
                          seed=SEED).to_pandas()
        assert len(sel) == k
        planted = set(raw["doc_id"][raw["doc_id"] % 8 == 0])
        assert planted <= set(sel["doc_id"])  # all 25 planted docs win
        assert list(sel["score"]) == sorted(sel["score"], reverse=True)

    def test_parallelism_invariance(self, corpora):
        target, raw = corpora
        outs = []
        for parts in (1, 8):
            sel = dsir_select(
                rd.from_pandas(raw).repartition(parts),
                rd.from_pandas(target).repartition(max(1, parts // 2)),
                "doc_id", "text", select_k=40, buckets=BUCKETS,
                seed=SEED).to_pandas().reset_index(drop=True)
            outs.append(sel)
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_gumbel_is_content_hash(self):
        s = pd.Series([1, 2, 1])
        g = _gumbel_from_key(s, SEED)
        assert g[0] == g[2] and g[0] != g[1]

    def test_empty_and_blank_batches_keep_schema(self):
        target = _mk(["alpha beta gamma"] * 4)
        raw = pd.DataFrame({"doc_id": np.arange(6),
                            "text": ["", None, "alpha beta", "42 %%",
                                     "beta gamma", "zzz qqq"]})
        sel = dsir_select(rd.from_pandas(raw).repartition(4),
                          rd.from_pandas(target), "doc_id", "text",
                          select_k=3, buckets=64, seed=SEED).to_pandas()
        assert len(sel) == 3
        assert list(sel.columns) == ["doc_id", "n_feats", "logw", "score"]
        assert sel["doc_id"].dtype == np.int64
