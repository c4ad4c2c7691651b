"""Declarative pipeline assembly (§2.9 surface)."""

from __future__ import annotations

import dataclasses

import pytest
import ray
import ray.data as rd

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.pipelines.builder import (
    EXTRACTOR_REGISTRY,
    STAGE_REGISTRY,
    assemble,
    extractor_for,
    register_extractor,
    register_stage,
)
from docprocai_service_ray.sources.webgen import alias_dict_table


class TestBuilder:
    def test_assembled_chain_matches_composed(self, corpus_path, oracle_result):
        cfg = KGConfig()
        pages = rd.read_parquet(corpus_path, columns=["url", "warc_ts", "html", "lang"])
        traw = assemble(pages, ["docs", "sentences", "triples_raw"], cfg)
        got = {
            (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
            for r in traw.take_all()
        }
        exp = {
            (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
            for t in oracle_result["triples_raw"]
        }
        assert got == exp

    def test_ctx_carries_broadcast_refs(self, corpus_path):
        cfg = KGConfig()
        pages = rd.read_parquet(corpus_path, columns=["url", "warc_ts", "html", "lang"])
        ctx = {"alias_ref": ray.put(alias_dict_table(42, cfg.embedding_dim))}
        em = assemble(pages, ["docs", "sentences", "triples_raw", "entity_map"], cfg, ctx)
        assert em.count() > 100

    def test_unknown_stage_error_names_known(self):
        cfg = KGConfig()
        with pytest.raises(KeyError, match="unknown stage"):
            assemble(rd.range(1), ["nope"], cfg)

    def test_register_custom_stage(self):
        @register_stage("double")
        def _double(ds, cfg, ctx):
            return ds.map_batches(
                lambda df: df.assign(id=df["id"] * 2), batch_format="pandas"
            )

        try:
            out = assemble(rd.range(3), ["double"], KGConfig()).take_all()
            assert sorted(r["id"] for r in out) == [0, 2, 4]
        finally:
            STAGE_REGISTRY.pop("double", None)

    def test_extractor_registry_dispatch(self):
        assert extractor_for("html")(b"<p>Hi there</p>") == "Hi there"
        with pytest.raises(KeyError, match="known"):
            extractor_for("pdf")

        @register_extractor("upper")
        def _upper(b: bytes) -> str:
            return (b or b"").decode("utf-8", "replace").upper()

        try:
            assert extractor_for("upper")(b"abc") == "ABC"
        finally:
            EXTRACTOR_REGISTRY.pop("upper", None)

    def test_lang_filter_stage_in_chain(self, corpus_path):
        cfg = dataclasses.replace(KGConfig(), filter_langs=("de", "fr"))
        pages = rd.read_parquet(corpus_path, columns=["url", "warc_ts", "html", "lang"])
        docs = assemble(pages, ["docs"], cfg)
        assert {r["lang"] for r in docs.take_all()} <= {"de", "fr"}


class TestCLI:
    """python -m docprocai_service_ray (in-process: main() reuses the
    session fixture's Ray and must NOT shut it down)."""

    def test_cli_runs_checkpointed_job(self, tmp_path, capsys):
        import json
        import os

        import pyarrow.parquet as pq
        import ray

        from docprocai_service_ray.__main__ import main
        from docprocai_service_ray.sources.webgen import pages_table

        pages = str(tmp_path / "pages"); os.makedirs(pages)
        pq.write_table(pages_table(42, list(range(80))),
                       os.path.join(pages, "p.parquet"))
        rc = main([pages, "--out", str(tmp_path / "kg"), "--with-link-graph"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert out["stages"]["docs"] > 0
        assert out["stages"]["triples"] > 0
        assert "host_ranks" in out["stages"]
        assert ray.is_initialized()  # the caller's session survived
