"""Cross-source n-gram overlap matrix (stages/overlap) — SQL parity,
hand-computed Jaccard, zero-overlap pairs, invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.overlap import (
    source_overlap_jaccard,
    source_overlap_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = ["v" + "".join(rng.choice(alpha, 4)) for _ in range(150)]
    rows = []
    for i in range(90):
        # a/b share vocab (heavy overlap), c is disjoint
        if i % 3 == 0:
            src, words = "a", [vocab[j] for j in rng.integers(0, 60, 20)]
        elif i % 3 == 1:
            src, words = "b", [vocab[j] for j in rng.integers(20, 80, 20)]
        else:
            src, words = "c", [vocab[j] for j in rng.integers(90, 150, 20)]
        rows.append({"doc_id": i, "src": src, "text": " ".join(words)})
    return pd.DataFrame(rows)


def test_sql_parity(corpus):
    got = (source_overlap_jaccard(rd.from_pandas(corpus), "text", "src",
                                  n=2)
           .sort_values(["source_a", "source_b"]).reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = con.execute(source_overlap_sql("docs", "text", "src", n=2)).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_hand_jaccard():
    rows = [
        {"src": "x", "text": "p q r s"},     # grams: pq qr rs
        {"src": "y", "text": "q r s t"},     # grams: qr rs st
        {"src": "z", "text": "m n"},         # grams: mn
    ]
    out = (source_overlap_jaccard(rd.from_pandas(pd.DataFrame(rows)),
                                  "text", "src", n=2)
           .set_index(["source_a", "source_b"]))
    assert out.loc[("x", "y"), "n_common"] == 2          # qr rs
    assert out.loc[("x", "y"), "jaccard"] == round(2 / 4, 6)
    assert out.loc[("x", "z"), "n_common"] == 0
    assert out.loc[("x", "z"), "jaccard"] == 0.0
    assert len(out) == 3                                  # all pairs


def test_overlap_structure_and_invariance(corpus):
    base = source_overlap_jaccard(rd.from_pandas(corpus), "text", "src",
                                  n=2).reset_index(drop=True)
    m = base.set_index(["source_a", "source_b"])
    # shared-vocab pair overlaps; disjoint-vocab pairs do not
    assert m.loc[("a", "b"), "jaccard"] > 0
    assert m.loc[("a", "c"), "n_common"] == 0
    assert m.loc[("b", "c"), "n_common"] == 0
    for p in (1, 6):
        again = (source_overlap_jaccard(
            rd.from_pandas(corpus).repartition(p), "text", "src", n=2)
            .reset_index(drop=True))
        pd.testing.assert_frame_equal(base, again)
