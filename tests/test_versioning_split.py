"""Corpus diff (stages/versioning) and leakage-safe split
(stages/keepbest.leakage_safe_split): all four diff statuses vs a brute
reference + DuckDB twin; split no-straddle property on planted dup
families, determinism, rate sanity. The sf0.01 parity of the registered
queries is covered by tests/test_queries.py."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.keepbest import leakage_safe_split
from docprocai_service_ray.stages.versioning import (corpus_diff,
                                                     corpus_diff_sql)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_corpus_diff_all_statuses():
    old = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                        "text": ["a", "b", "c", None]})
    new = pd.DataFrame({"doc_id": [2, 3, 5, 4],
                        "text": ["b", "c CHANGED", "e", ""]})
    got = (corpus_diff(rd.from_pandas(old).repartition(2),
                       rd.from_pandas(new).repartition(2),
                       "doc_id", "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    exp = {1: "removed", 2: "same", 3: "changed",
           4: "same",  # None and '' share md5('') — the documented rule
           5: "added"}
    assert dict(zip(got["doc_id"], got["status"])) == exp
    con = duckdb.connect()
    con.register("o", old)
    con.register("n", new)
    sq = (con.execute(corpus_diff_sql("o", "n", "doc_id", "text")).df()
          .sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, sq.astype(got.dtypes.to_dict()))


_GOOD = ("the quick brown fox jumps over the lazy dog and then the dog "
         "chases the fox around the old barn for a while. ")


def _split_docs() -> pd.DataFrame:
    rng = np.random.default_rng(11)
    rows = []
    for fam in range(6):  # 6 planted families of 3 near-identical docs
        base = _GOOD * 3 + f"family {fam} marker. "
        for j, sfx in enumerate(["", "tail one.", "x"]):
            rows.append((f"f{fam}m{j}", base + sfx))
    for i in range(20):  # singleton noise
        rows.append((f"solo{i}",
                     " ".join(rng.choice(
                         ["alpha", "beta", "gamma", "delta", "epsilon",
                          "zeta", "eta", "theta"], 40)) + f" uniq {i}"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_split_never_straddles_clusters():
    docs = _split_docs()
    out = (leakage_safe_split(rd.from_pandas(docs).repartition(4),
                              "doc_id", "text", holdout_rate=0.5,
                              threshold=0.7, seed=42)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert len(out) == len(docs)
    by_doc = out.set_index("doc_id")
    for fam in range(6):
        sides = {by_doc.loc[f"f{fam}m{j}", "split"] for j in range(3)}
        units = {by_doc.loc[f"f{fam}m{j}", "unit"] for j in range(3)}
        assert len(sides) == 1, f"family {fam} straddles the split"
        assert len(units) == 1
    # with rate 0.5 over 6 family-units + 20 singleton-units, both sides
    # must be populated
    assert set(out["split"]) == {"train", "holdout"}


def test_split_deterministic():
    docs = _split_docs()
    outs = []
    for parts in (1, 5):
        outs.append(
            leakage_safe_split(rd.from_pandas(docs).repartition(parts),
                               "doc_id", "text", holdout_rate=0.3,
                               threshold=0.7, seed=7)
            .to_pandas().sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_split_rate_scales():
    docs = _split_docs()
    hold = {}
    for rate in (0.0, 1.0):
        out = leakage_safe_split(rd.from_pandas(docs), "doc_id", "text",
                                 holdout_rate=rate, threshold=0.7,
                                 seed=42).to_pandas()
        hold[rate] = (out["split"] == "holdout").mean()
    assert hold[0.0] == 0.0 and hold[1.0] == 1.0
