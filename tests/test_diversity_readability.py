"""distinct-n diversity (stages/diversity) + Flesch readability
(stages/readability) — SQL parity, hand-computed values, signal
direction, invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.diversity import (
    distinct_ngram_stats,
    distinct_ngram_sql,
)
from docprocai_service_ray.stages.readability import (
    flesch_by_group,
    flesch_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(9)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = ["d" + "".join(rng.choice(alpha, 4)) for _ in range(400)]
    rows = []
    for i in range(80):
        if i % 2 == 0:  # looped template: low diversity
            src, text = "loop", "copy paste boiler plate " * 10
        else:
            src = "prose"
            text = " ".join(vocab[j] for j in rng.integers(0, 400, 40))
            text += ". " + " ".join(vocab[j]
                                    for j in rng.integers(0, 400, 10)) + "!"
        rows.append({"doc_id": i, "src": src, "text": text})
    return pd.DataFrame(rows)


def test_diversity_sql_parity(corpus):
    got = (distinct_ngram_stats(rd.from_pandas(corpus), "text", "src", n=3)
           .to_pandas().sort_values("src").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(distinct_ngram_sql("docs", "text", "src", n=3))
            .df().sort_values("src").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_diversity_hand_values():
    rows = [{"src": "x", "text": "a b a b"},   # grams: ab ba ab → 2/3
            {"src": "y", "text": "p q r"}]     # grams: pq qr   → 2/2
    out = (distinct_ngram_stats(rd.from_pandas(pd.DataFrame(rows)),
                                "text", "src", n=2)
           .to_pandas().set_index("src"))
    assert out.loc["x", "n_grams"] == 3
    assert out.loc["x", "n_distinct"] == 2
    assert out.loc["x", "distinct_ratio"] == round(2 / 3, 6)
    assert out.loc["y", "distinct_ratio"] == 1.0


def test_diversity_direction_and_invariance(corpus):
    base = (distinct_ngram_stats(rd.from_pandas(corpus), "text", "src",
                                 n=3).to_pandas()
            .sort_values("src").reset_index(drop=True))
    m = base.set_index("src")
    assert m.loc["loop", "distinct_ratio"] < m.loc["prose",
                                                   "distinct_ratio"]
    again = (distinct_ngram_stats(rd.from_pandas(corpus).repartition(6),
                                  "text", "src", n=3).to_pandas()
             .sort_values("src").reset_index(drop=True))
    pd.testing.assert_frame_equal(base, again)


def test_flesch_sql_parity(corpus):
    got = (flesch_by_group(rd.from_pandas(corpus), "text", "src")
           .to_pandas().sort_values("src").reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(flesch_sql("docs", "text", "src"))
            .df().sort_values("src").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_flesch_hand_value():
    # one doc: 4 words, 2 sentences, 4 vowel groups (e, a, a, o)
    rows = [{"src": "s", "text": "The cat sat. Go!"}]
    out = flesch_by_group(rd.from_pandas(pd.DataFrame(rows)),
                          "text", "src").to_pandas()
    expect = 206.835 - 1.015 * (4 / 2) - 84.6 * (4 / 4)
    assert out.loc[0, "avg_flesch"] == round(expect, 4)
    assert out.loc[0, "avg_words"] == 4.0
    # zero-word doc is excluded entirely
    rows2 = rows + [{"src": "s", "text": "123 456"}]
    out2 = flesch_by_group(rd.from_pandas(pd.DataFrame(rows2)),
                           "text", "src").to_pandas()
    assert out2.loc[0, "n_docs"] == 1
