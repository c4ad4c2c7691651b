"""Near-dup cluster canonicalization (stages/keepbest): planted-cluster
closure + survivor choice vs a brute-force reference, one-keeper
invariant, singleton exclusion, tie-break rule, parallelism invariance.
The registered ``near_dup_keep_best`` golden at sf0.01 is covered by
tests/test_queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.keepbest import near_dup_keep_best
from docprocai_service_ray.stages.textstats import quality_score

pytestmark = pytest.mark.usefixtures("ray_session")

# three planted near-identical families + singleton noise docs. Quality
# differs WITHIN each family via punctuation/length manipulation so the
# survivor choice is non-trivial.
_GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
         "chases the fox around the old barn for a while. ")


def _docs() -> pd.DataFrame:
    rows = []
    # family A: 3 members, shared body + tiny suffix edits
    for i, suffix in enumerate(["", "extra tail words here.", "x"]):
        rows.append((f"a{i}", _GOOD * 4 + suffix))
    # family B: 2 members; b1 has a punctuation-junk tail — nearly all
    # word shingles shared (still clusters) but punct_ratio > 0.2 tanks
    # its quality, so b0 must win
    rows.append(("b0", _GOOD * 3))
    rows.append(("b1", _GOOD * 3 + " " + ";" * 150))
    # singletons
    rows.append(("s0", "completely unrelated content about spark rays " * 8))
    rows.append(("s1", "another standalone document with its own words " * 8))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def _run(parts: int = 3, threshold: float = 0.7) -> pd.DataFrame:
    out = near_dup_keep_best(
        rd.from_pandas(_docs()).repartition(parts), "doc_id", "text",
        threshold=threshold, seed=42)
    return out.to_pandas().sort_values("doc_id").reset_index(drop=True)


def test_clusters_and_survivors():
    out = _run()
    # singletons never emitted
    assert not set(out["doc_id"]) & {"s0", "s1"}
    # family membership is the transitive closure
    by_doc = out.set_index("doc_id")
    assert len(set(by_doc.loc[["a0", "a1", "a2"], "cluster_id"])) == 1
    assert len(set(by_doc.loc[["b0", "b1"], "cluster_id"])) == 1
    # exactly one keeper per cluster
    keepers = out[out["keep"]].groupby("cluster_id").size()
    assert (keepers == 1).all()
    assert out.groupby("cluster_id").size().ge(2).all()
    # the survivor is the quality argmax (id ASC tie-break)
    docs = _docs()
    q = dict(zip(docs["doc_id"], quality_score(docs["text"])))
    for cid, grp in out.groupby("cluster_id"):
        best = sorted(grp["doc_id"], key=lambda d: (-q[d], d))[0]
        assert set(grp.loc[grp["keep"], "doc_id"]) == {best}
    # quality column matches the standalone scorer
    for r in out.itertuples():
        assert r.quality == q[r.doc_id]


def test_parallelism_invariance():
    ref = _run(1)
    for parts in (4, 7):
        pd.testing.assert_frame_equal(_run(parts), ref)


def test_no_pairs_empty_output():
    docs = pd.DataFrame({
        "doc_id": ["x", "y"],
        "text": ["first totally distinct words " * 10,
                 "second entirely different content " * 10]})
    out = near_dup_keep_best(rd.from_pandas(docs), "doc_id", "text",
                             threshold=0.9, seed=42).to_pandas()
    assert len(out) == 0
