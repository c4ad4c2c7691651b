"""Cluster topic terms (stages/topics): planted-vocabulary recovery
(each kmeans cluster's top terms are its own vocab, shared words
cancelled), c-TF-IDF score spot-check, parallelism invariance, top_n
shape. The registered ``cluster_topic_terms`` golden at sf0.01 is
covered by tests/test_queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.topics import cluster_topic_terms

pytestmark = pytest.mark.usefixtures("ray_session")

VOCABS = [["apple", "fruit", "orchard"], ["engine", "piston", "torque"],
          ["violin", "sonata", "tempo"]]
SHARED = ["the", "and", "with"]


def _data(n: int = 90):
    rng = np.random.default_rng(5)
    rows_d, rows_e = [], []
    for i in range(n):
        g = i % 3
        center = np.zeros(8)
        center[g] = 5.0
        rows_e.append((i, list((center + rng.normal(0, 0.3, 8))
                               .astype(np.float32))))
        ws = list(rng.choice(VOCABS[g], 6)) + list(rng.choice(SHARED, 4))
        rows_d.append((i, " ".join(ws), g))
    return (pd.DataFrame(rows_d, columns=["doc_id", "text", "g"]),
            pd.DataFrame(rows_e, columns=["vec_id", "embedding"]))


def _run(parts: int = 3, top_n: int = 3) -> pd.DataFrame:
    docs, embs = _data()
    out = cluster_topic_terms(
        rd.from_pandas(docs[["doc_id", "text"]]).repartition(parts),
        rd.from_pandas(embs).repartition(parts),
        dim=8, k=3, top_n=top_n, seed=42)
    return (out.to_pandas().sort_values(["cluster", "rank"])
            .reset_index(drop=True))


def test_planted_vocab_recovery():
    out = _run()
    assert len(out) == 9  # 3 clusters × top 3
    # every cluster's top-3 is exactly ONE planted vocabulary — the
    # shared words never appear (c-TF-IDF cancels them)
    seen = []
    for _, grp in out.groupby("cluster"):
        terms = set(grp["term"])
        match = [v for v in VOCABS if terms == set(v)]
        assert match, f"cluster terms {terms} match no planted vocab"
        seen.append(tuple(match[0]))
    assert len(set(seen)) == 3  # each vocab claimed by exactly one cluster
    assert not set(out["term"]) & set(SHARED)
    # ranks are 0..n-1 per cluster, scores non-increasing
    for _, grp in out.groupby("cluster"):
        assert grp["rank"].tolist() == [0, 1, 2]
        assert (grp["score"].diff().dropna() <= 0).all()


def test_parallelism_invariance():
    ref = _run(1)
    for parts in (4, 7):
        pd.testing.assert_frame_equal(_run(parts), ref)


def test_top_n_shape():
    out = _run(top_n=2)
    assert (out.groupby("cluster").size() == 2).all()
