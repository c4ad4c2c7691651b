"""Checked-in golden outputs (SURVEY.md §5.2 item 5): the distributed
engine's output on the seeded 300-page corpus must match the committed
parquet fixtures bit-for-bit in content. Regenerate ONLY via
``python scripts/regenerate_golden.py`` after an intentional semantic
change."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def test_docs_match_golden(kg_result):
    res, _, _ = kg_result
    exp = {
        (r["url"], r["n_chars"], r["content_hash"])
        for r in pq.read_table(os.path.join(GOLDEN, "golden_docs.parquet")).to_pylist()
    }
    got = {
        (r["url"], r["n_chars"], r["content_hash"])
        for r in res["docs"].select_columns(["url", "n_chars", "content_hash"]).take_all()
    }
    assert got == exp


def test_triples_match_golden(kg_result):
    res, _, _ = kg_result
    exp = {
        (r["subject_id"], r["pred"], r["object_id"], r["weight"])
        for r in pq.read_table(os.path.join(GOLDEN, "golden_triples.parquet")).to_pylist()
    }
    got = {
        (t["subject_id"], t["pred"], t["object_id"], t["weight"])
        for t in res["triples"].take_all()
    }
    assert got == exp


def test_entity_map_matches_golden(kg_result):
    res, _, _ = kg_result
    exp = {
        (r["surface"], r["canonical_id"])
        for r in pq.read_table(os.path.join(GOLDEN, "golden_entity_map.parquet")).to_pylist()
    }
    got = {
        (r["surface"], r["canonical_id"]) for r in res["entity_map"].take_all()
    }
    assert got == exp
