"""Zipf corpus-health scan (stages/zipf.zipf_law_stats) — SQL parity,
the Zipf-shaped-corpus signature, top-k truncation, invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.zipf import zipf_law_stats, zipf_law_sql

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    """Words drawn from an actual Zipf distribution over an alphabetic
    vocabulary (the [a-z]+ tokenizer drops digits)."""
    rng = np.random.default_rng(3)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = np.array(["z" + "".join(rng.choice(alpha, 4))
                      for _ in range(800)])
    ranks = rng.zipf(1.3, size=(120, 40))
    rows = [{"doc_id": i,
             "text": " ".join(vocab[np.minimum(r, 800) - 1])}
            for i, r in enumerate(ranks)]
    return pd.DataFrame(rows)


def test_sql_parity(corpus):
    got = zipf_law_stats(rd.from_pandas(corpus), "text", top_k=200)
    con = duckdb.connect()
    con.register("docs", corpus)
    want = con.execute(zipf_law_sql("docs", "text", top_k=200)).df()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), want,
                                  check_dtype=False)


def test_zipf_signature(corpus):
    out = zipf_law_stats(rd.from_pandas(corpus), "text", top_k=200)
    row = out.iloc[0]
    assert row["n_tokens"] == 120 * 40
    assert 0 < row["n_types"] <= 800
    assert row["zipf_slope"] < -0.3          # heavy-head decay
    assert row["zipf_r2"] > 0.8              # log-log near-linear
    assert 0 < row["hapax_frac"] < 1
    assert 0 < row["tt_ratio"] < 1


def test_top_k_truncation_and_invariance(corpus):
    full = zipf_law_stats(rd.from_pandas(corpus), "text", top_k=50)
    for p in (1, 7):
        again = zipf_law_stats(rd.from_pandas(corpus).repartition(p),
                               "text", top_k=50)
        pd.testing.assert_frame_equal(full, again)
    # a different k changes the fit but not the corpus scalars
    other = zipf_law_stats(rd.from_pandas(corpus), "text", top_k=200)
    assert other["n_types"].iloc[0] == full["n_types"].iloc[0]
    assert other["zipf_slope"].iloc[0] != full["zipf_slope"].iloc[0]
