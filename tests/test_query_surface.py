"""Query-surface hardening (VERDICT r01 #5/#7): quote-safe point lookups
and stored-embedding scoring parity."""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.pipelines.queries import (
    build_sentence_embeddings,
    semantic_search,
    sentences_for_url,
    similar_entities,
)

CFG = KGConfig()


def _sentences():
    rows = {
        "url": [
            "https://x.test/it's-a-page",  # a url containing a single quote
            "https://x.test/it's-a-page",
            "https://y.test/plain",
            "https://z.test/other",
        ],
        "sent_id": [0, 1, 0, 0],
        "text": [
            "Alice Turner founded Blue River Labs.",
            "The lab researches rivers.",
            "Alice Turner founded Blue River Labs.",
            "Totally unrelated sentence about trains.",
        ],
        "char_start": [0, 40, 0, 0],
        "char_end": [38, 66, 38, 40],
    }
    return rd.from_arrow(pa.Table.from_pydict(rows))


class TestQuoteSafety:
    def test_sentences_for_url_with_quote(self):
        out = sentences_for_url(_sentences(), "https://x.test/it's-a-page").take_all()
        assert [r["sent_id"] for r in out] == [0, 1]

    def test_similar_entities_probe_with_quote(self):
        out = similar_entities(
            _sentences(), "https://x.test/it's-a-page", 0, k=2, cfg=CFG
        ).take_all()
        urls = {r["url"] for r in out}
        assert "https://x.test/it's-a-page" not in urls  # same-url excluded
        assert out[0]["url"] == "https://y.test/plain"  # identical text ranks first


class TestStoredEmbeddings:
    def test_semantic_search_stored_matches_inline(self):
        sents = _sentences().materialize()
        stored = build_sentence_embeddings(sents, CFG).materialize()
        q = "Alice Turner founded Blue River Labs"
        inline = semantic_search(sents, q, k=3, cfg=CFG).take_all()
        persisted = semantic_search(
            sents, q, k=3, cfg=CFG, embedded_ds=stored
        ).take_all()
        strip = lambda rows: [
            (r["url"], r["sent_id"], r["text"], r["score"]) for r in rows
        ]
        assert strip(persisted) == strip(inline)

    def test_similar_entities_stored_matches_inline(self):
        sents = _sentences().materialize()
        stored = build_sentence_embeddings(sents, CFG).materialize()
        inline = similar_entities(sents, "https://y.test/plain", 0, k=3, cfg=CFG).take_all()
        persisted = similar_entities(
            sents, "https://y.test/plain", 0, k=3, cfg=CFG, embedded_ds=stored
        ).take_all()
        strip = lambda rows: [
            (r["url"], r["sent_id"], r["text"], r["score"]) for r in rows
        ]
        assert strip(persisted) == strip(inline)
