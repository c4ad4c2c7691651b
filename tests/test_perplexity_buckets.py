"""CCNet perplexity bucketing (stages/ngramlm.perplexity_buckets) —
SQL-twin parity, head/tail semantics, tercile shape, invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.ngramlm import (
    doc_bigram_bits,
    perplexity_buckets,
    perplexity_buckets_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(11)
    rows = []
    did = 0
    # vocab words must be alphabetic: the engine tokenizer is [a-z]+,
    # so "enw288" would collapse to the single token "enw"
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    vocab = {lang: [lang + "".join(rng.choice(alpha, 5)) for _ in range(300)]
             for lang in ("en", "de")}
    for lang, n in (("en", 45), ("de", 21)):
        for i in range(n):
            if i % 3 == 0:  # templated ⇒ predictable ⇒ head
                text = "the quick brown fox jumps over the lazy dog " * 3
            else:
                text = " ".join(vocab[lang][j] for j in
                                rng.integers(0, 300, 25))
            rows.append({"doc_id": did, "lang": lang, "text": text})
            did += 1
    rows.append({"doc_id": did, "lang": "en", "text": "one"})  # <2 toks
    return pd.DataFrame(rows)


def test_sql_parity(corpus):
    got = (perplexity_buckets(rd.from_pandas(corpus), "doc_id", "text",
                              "lang")
           .to_pandas().sort_values(["lang", "bucket"])
           .reset_index(drop=True))
    con = duckdb.connect()
    con.register("docs", corpus)
    want = (con.execute(perplexity_buckets_sql("docs", "doc_id", "text",
                                               "lang"))
            .df().sort_values(["lang", "bucket"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_head_holds_templated_docs(corpus):
    bits = (doc_bigram_bits(rd.from_pandas(corpus), "doc_id", "text",
                            "lang").to_pandas())
    # sub-2-token doc excluded
    assert len(bits) == len(corpus) - 1
    out = (perplexity_buckets(rd.from_pandas(corpus), "doc_id", "text",
                              "lang").to_pandas())
    en = out[out["lang"] == "en"].set_index("bucket")
    # bucket means are ordered head < middle < tail
    assert (en.loc["head", "avg_bits"] < en.loc["middle", "avg_bits"]
            < en.loc["tail", "avg_bits"])
    # terciles: no bucket is empty and sizes are near-equal
    assert set(out["bucket"]) == {"head", "middle", "tail"}
    for lang, g in out.groupby("lang"):
        sizes = g.set_index("bucket")["n_docs"]
        assert sizes.max() - sizes.min() <= max(2, sizes.sum() // 3)


def test_parallelism_invariance(corpus):
    outs = [
        (perplexity_buckets(rd.from_pandas(corpus).repartition(p),
                            "doc_id", "text", "lang")
         .to_pandas().sort_values(["lang", "bucket"])
         .reset_index(drop=True))
        for p in (1, 6)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])
