"""Interpolated Kneser–Ney bigram LM (stages/ngramlm.kneser_ney_bits) —
SQL-twin parity, the continuation-count signature, invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.ngramlm import (
    bigram_lm_bits,
    kneser_ney_bits,
    kneser_ney_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(7)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = ["w" + "".join(rng.choice(alpha, 5)) for _ in range(200)]
    rows = []
    for i in range(60):
        if i % 4 == 0:
            text = "the quick brown fox jumps over the lazy dog " * 2
        else:
            text = " ".join(vocab[j] for j in rng.integers(0, 200, 30))
        rows.append({"doc_id": i, "src": f"s{i % 3}", "text": text})
    rows.append({"doc_id": 60, "src": "s0", "text": "solo"})  # no bigram
    return pd.DataFrame(rows)


def test_sql_parity(corpus):
    got = (kneser_ney_bits(rd.from_pandas(corpus), "doc_id", "text", "src")
           .to_pandas().sort_values("src").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(kneser_ney_sql("docs", "doc_id", "text", "src"))
            .df().sort_values("src").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_kn_differs_from_addk_and_is_finite(corpus):
    kn = (kneser_ney_bits(rd.from_pandas(corpus), "doc_id", "text", "src")
          .to_pandas().sort_values("src").reset_index(drop=True))
    addk = (bigram_lm_bits(rd.from_pandas(corpus), "doc_id", "text", "src")
            .to_pandas().sort_values("src").reset_index(drop=True))
    assert (kn["n_docs"] == addk["n_docs"]).all()  # same doc exclusion
    assert np.isfinite(kn["avg_bits"]).all() and (kn["avg_bits"] > 0).all()
    # different smoothing families produce different numbers
    assert not np.allclose(kn["avg_bits"], addk["avg_bits"])


def test_continuation_signature():
    """The KN property: an unseen-in-context word with MANY distinct
    left-contexts (high N1+(·,r)) gets a higher backoff probability —
    i.e. fewer bits — than one with a single repeated context."""
    # 'versatile' follows 10 distinct lefts once each; 'stuck' follows
    # the same left 10 times. Both then appear after the fresh context
    # 'probe' exactly once, with identical c(l,r)=1 and c(l)=2 — only
    # the continuation count differs.
    rows = [{"doc_id": i, "src": "s",
             "text": f"ctx{c} versatile"}  # letter suffix: [a-z]+ tokens
            for i, c in enumerate("abcdefghij")]
    rows += [{"doc_id": 10 + i, "src": "s",
              "text": "same stuck"} for i in range(10)]
    rows += [{"doc_id": 20, "src": "v", "text": "probe versatile"},
             {"doc_id": 21, "src": "k", "text": "probe stuck"}]
    ds = rd.from_pandas(pd.DataFrame(rows))
    out = (kneser_ney_bits(ds, "doc_id", "text", "src")
           .to_pandas().set_index("src"))
    assert out.loc["v", "avg_bits"] < out.loc["k", "avg_bits"]


def test_parallelism_invariance(corpus):
    outs = [
        (kneser_ney_bits(rd.from_pandas(corpus).repartition(p),
                         "doc_id", "text", "src")
         .to_pandas().sort_values("src").reset_index(drop=True))
        for p in (1, 5)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
