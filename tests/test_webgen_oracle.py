"""Corpus generator determinism + scalar-oracle quality (SURVEY.md §5.2)."""

from __future__ import annotations

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.functions.html_extract import extract_text
from docprocai_service_ray.sources.webgen import (
    alias_dict_table,
    build_entities,
    gen_page,
    pages_table,
)


class TestWebgen:
    def test_pure_per_row(self):
        a, b = gen_page(42, 17), gen_page(42, 17)
        assert a == b
        assert gen_page(43, 17)["html"] != a["html"]

    def test_edge_rows(self):
        assert gen_page(42, 0)["html"] == b""
        assert b"\xff" in gen_page(42, 998)["html"][:4]  # 998 % 997 == 1 → non-UTF8
        assert extract_text(gen_page(42, 2)["html"]) == ""  # boilerplate-only
        # duplicate html under a different url (rows 3 and 5 share html)
        assert gen_page(42, 3)["html"] == gen_page(42, 5)["html"]
        assert gen_page(42, 3)["url"] != gen_page(42, 5)["url"]
        # duplicate url (rows 4 and 5), later warc_ts (row 5) wins
        assert gen_page(42, 4)["url"] == gen_page(42, 5)["url"]
        assert gen_page(42, 5)["warc_ts"] > gen_page(42, 4)["warc_ts"]

    def test_prefilled_text_matches_extractor(self):
        hits = 0
        for r in range(5, 200):
            p = gen_page(42, r)
            if p["text"] is not None:
                assert p["text"] == extract_text(p["html"])
                hits += 1
        assert hits > 10  # ~20% of rows carry the oracle text

    def test_schema(self):
        t = pages_table(42, list(range(8)))
        assert t.schema.names == ["url", "warc_ts", "html", "text", "lang"]

    def test_alias_dict_collision_present(self):
        t = alias_dict_table(42, 64)
        qids = {q for s, q in zip(t["surface"].to_pylist(), t["qid"].to_pylist()) if s == "Mercury"}
        assert len(qids) == 2  # org and place both answer to "Mercury"

    def test_entities_deterministic(self):
        assert build_entities(42) == build_entities(42)


class TestOracle:
    def test_counts(self, oracle_result):
        assert len(oracle_result["docs"]) > 250
        assert len(oracle_result["sentences"]) > 1000
        assert len(oracle_result["triples_raw"]) > 500

    def test_empty_pages_dropped(self, oracle_result):
        urls = {d["url"] for d in oracle_result["docs"]}
        from docprocai_service_ray.sources.webgen import url_for

        assert url_for(42, 0) not in urls  # empty html
        assert url_for(42, 2) not in urls  # boilerplate-only

    def test_planted_fact_pr(self, small_corpus, oracle_result):
        """The headline quality bar: canonicalized triples vs planted facts,
        P and R ≥ 0.95 (BASELINE.json metric, measured against the plant)."""
        planted = set()
        for r in range(300):
            for f in gen_page(42, r)["_facts"]:
                planted.add(f)
        got = {
            (t["subject_id"], t["pred"], t["object_id"]) for t in oracle_result["triples"]
        }
        tp = len(planted & got)
        assert tp / len(planted) >= 0.95, "recall vs planted facts"
        assert tp / len(got) >= 0.95, "precision vs planted facts"

    def test_provenance_complete_and_capped(self, small_corpus, oracle_result):
        cfg = KGConfig()
        doc_urls = {d["url"] for d in oracle_result["docs"]}
        for t in oracle_result["triples"]:
            assert 1 <= len(t["prov"]) <= cfg.prov_cap
            assert t["weight"] == len(t["prov"]) + t["prov_overflow"]
            for p in t["prov"]:
                assert p["url"] in doc_urls

    def test_entity_map_covers_all_surfaces(self, oracle_result):
        surfaces = {t["subj"] for t in oracle_result["triples_raw"]} | {
            t["obj"] for t in oracle_result["triples_raw"]
        }
        assert set(oracle_result["entity_map"]) == surfaces
