"""Text normalization (stages/textnorm): step semantics (NFC,
control/zero-width strip, whitespace collapse incl. NBSP), SQL twin
parity, idempotence, dedup-collision motivation. The sf0.01 parity of
the registered ``normalized_text_docs`` query is covered by
tests/test_queries.py."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.textnorm import (normalize_text,
                                                   normalize_text_series,
                                                   normalize_text_sql)

pytestmark = pytest.mark.usefixtures("ray_session")

CASES = [
    ("café corner", "café corner"),          # NFC composes
    ("a​b‌c﻿d", "abcd"),            # zero-width strip
    ("tab\tand\nnewline  runs", "tab and newline runs"),
    ("nbsp here", "nbsp here"),
    (" \t lead and trail \n ", "lead and trail"),
    ("ctrl\x00\x07chars\x1f", "ctrlchars"),
    ("", ""),
    (None, ""),
    ("ümlaut ÄÖÜ bleibt", "ümlaut ÄÖÜ bleibt"),
]


def test_cases_and_idempotence():
    got = normalize_text_series(pd.Series([c[0] for c in CASES]))
    assert got.tolist() == [c[1] for c in CASES]
    assert normalize_text_series(got).tolist() == got.tolist()


def test_sql_parity():
    df = pd.DataFrame({"s": [c[0] for c in CASES], "k": range(len(CASES))})
    con = duckdb.connect()
    con.register("t", df)
    sq = con.execute(
        f"SELECT {normalize_text_sql('s')} AS s FROM t ORDER BY k"
    ).df()["s"]
    assert sq.tolist() == [c[1] for c in CASES]


def test_byte_variants_collide_after_normalization():
    """The motivation: equivalent byte variants must hash equal AFTER
    normalization (they don't before)."""
    variants = ["café du parc", "café du parc",
                "café  du \tparc​"]
    norm = normalize_text_series(pd.Series(variants))
    assert len(set(norm)) == 1
    assert len(set(variants)) == 3


def test_dataset_stage():
    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a  b", None]})
    out = (normalize_text(rd.from_pandas(df), "text", out_col="clean")
           .to_pandas().sort_values("doc_id"))
    assert out["clean"].tolist() == ["a b", ""]
    assert out["text"].iloc[0] == "a  b"  # original preserved
