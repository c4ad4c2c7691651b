"""Distributed pipeline vs scalar oracle (SURVEY.md §5.2 items 1, 2, 4):
row-invariant suite (byte-identical text per url at any partitioning),
triple-equivalence suite, idempotent resume, and driver-vs-distributed
union-find parity."""

from __future__ import annotations

import dataclasses
import os

import pyarrow.parquet as pq
import pytest
import ray
import ray.data as rd

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.pipelines.kg import run_kg
from docprocai_service_ray.sources.webgen import alias_dict_table, pages_table
from docprocai_service_ray.stages.canonicalize import build_entity_map
from docprocai_service_ray.stages.extract import build_docs
from docprocai_service_ray.stages.materialize import build_triples, entity_map_to_dict
from docprocai_service_ray.stages.segment import build_sentences
from docprocai_service_ray.stages.triple_extract import build_triples_raw

N_PAGES = 300  # corpus_path / kg_result fixtures live in conftest.py


def triple_key_set(rows):
    return {(t["subject_id"], t["pred"], t["object_id"]) for t in rows}


class TestRowInvariant:
    def test_docs_byte_identical_per_url(self, kg_result, oracle_result):
        res, _, _ = kg_result
        got = {r["url"]: r["text"] for r in res["docs"].take_all()}
        exp = {d["url"]: d["text"] for d in oracle_result["docs"]}
        assert set(got) == set(exp)
        assert all(got[u] == exp[u] for u in exp), "extracted text must be byte-identical"

    @pytest.mark.parametrize("n_blocks", [1, 7])
    def test_partitioning_invariance(self, corpus_path, oracle_result, n_blocks):
        cfg = KGConfig()
        pages = rd.read_parquet(
            corpus_path, columns=["url", "warc_ts", "html", "lang"],
            override_num_blocks=n_blocks,
        )
        docs = build_docs(pages, cfg)
        got = {r["url"]: r["text"] for r in docs.take_all()}
        exp = {d["url"]: d["text"] for d in oracle_result["docs"]}
        assert got == exp

    def test_sentences_match_oracle(self, kg_result, oracle_result):
        res, _, _ = kg_result
        got = {
            (r["url"], r["sent_id"]): (r["text"], r["char_start"], r["char_end"])
            for r in res["sentences"].take_all()
        }
        exp = {
            (s["url"], s["sent_id"]): (s["text"], s["char_start"], s["char_end"])
            for s in oracle_result["sentences"]
        }
        assert got == exp


class TestTripleEquivalence:
    def test_triple_set_exact(self, kg_result, oracle_result):
        res, _, _ = kg_result
        got = res["triples"].take_all()
        exp = oracle_result["triples"]
        assert triple_key_set(got) == triple_key_set(exp)

    def test_weights_and_provenance(self, kg_result, oracle_result):
        res, _, _ = kg_result
        got = {
            (t["subject_id"], t["pred"], t["object_id"]): t
            for t in res["triples"].take_all()
        }
        for e in oracle_result["triples"]:
            g = got[(e["subject_id"], e["pred"], e["object_id"])]
            assert g["weight"] == e["weight"]
            assert g["prov_overflow"] == e["prov_overflow"]
            gp = sorted((p["url"], p["sent_id"]) for p in g["prov"])
            ep = sorted((p["url"], p["sent_id"]) for p in e["prov"])
            assert gp == ep

    def test_entity_map_matches(self, kg_result, oracle_result):
        res, _, _ = kg_result
        got = {
            r["surface"]: r["canonical_id"] for r in res["entity_map"].take_all()
        }
        assert got == oracle_result["entity_map"]

    def test_mentions_link_scores(self, kg_result):
        res, _, cfg = kg_result
        rows = res["mentions"].take_all()
        assert len(rows) > 0
        for r in rows[:200]:
            assert r["role"] in ("subj", "obj")
            assert len(r["embedding"]) == cfg.embedding_dim
            if r["cand_qid"] is not None:
                assert r["link_score"] >= cfg.link_threshold


class TestResume:
    def test_manifest_written(self, kg_result):
        _, out, _ = kg_result
        from docprocai_service_ray.state.manifest import read_manifest

        rows = read_manifest(out)
        stages = {r["stage"] for r in rows}
        assert {"docs", "sentences", "triples_raw", "entity_map", "triples"} <= stages
        assert all(r["state"] == "DONE" for r in rows)

    def test_resume_skips_done_stages(self, kg_result, corpus_path):
        res, out, cfg = kg_result
        before = os.path.getmtime(os.path.join(out, "docs"))
        res2 = run_kg(corpus_path, alias_dict_table(42, cfg.embedding_dim), cfg,
                      out_dir=out, resume=True)
        assert os.path.getmtime(os.path.join(out, "docs")) == before
        assert triple_key_set(res2["triples"].take_all()) == triple_key_set(
            res["triples"].take_all()
        )

    def test_resume_after_partial_failure(self, kg_result, corpus_path, tmp_path):
        """Kill-after-stage-k simulation: wipe the last stage, resume, get
        identical output (idempotent partition overwrite, W6 analog).
        Operates on a COPY of the checkpoint dir so the session fixture's
        datasets keep valid file handles."""
        import shutil

        res, orig_out, cfg = kg_result
        expected = triple_key_set(res["triples"].take_all())
        out = str(tmp_path / "kgout_copy")
        shutil.copytree(orig_out, out)
        shutil.rmtree(os.path.join(out, "triples"))
        os.remove(os.path.join(out, "_manifest", "triples.json"))
        docs_mtime = os.path.getmtime(os.path.join(out, "docs"))
        res2 = run_kg(corpus_path, alias_dict_table(42, cfg.embedding_dim), cfg,
                      out_dir=out, resume=True)
        assert triple_key_set(res2["triples"].take_all()) == expected
        assert os.path.getmtime(os.path.join(out, "docs")) == docs_mtime  # not recomputed


class TestDistributedComponents:
    def test_label_propagation_matches_driver_unionfind(self, corpus_path, oracle_result):
        """Force the distributed min-label-propagation path and check it
        produces the same entity_map as the driver union-find."""
        cfg = dataclasses.replace(KGConfig(), driver_unionfind_max=0, driver_canon_max=0)
        pages = rd.read_parquet(corpus_path, columns=["url", "warc_ts", "html", "lang"])
        traw = build_triples_raw(build_sentences(build_docs(pages, cfg), cfg), cfg)
        alias_ref = ray.put(alias_dict_table(42, cfg.embedding_dim))
        emap = build_entity_map(traw.materialize(), alias_ref, cfg)
        got = {r["surface"]: r["canonical_id"] for r in emap.take_all()}
        assert got == oracle_result["entity_map"]


class TestOutputLayout:
    def test_bucketed_partitions(self, kg_result):
        _, out, cfg = kg_result
        buckets = [
            d for d in os.listdir(os.path.join(out, "triples")) if d.startswith("bucket=")
        ]
        assert len(buckets) > 1  # partitioned output, one dir per subject bucket


def test_doc_summaries_match_oracle(kg_result, oracle_result):
    """Deterministic per-doc digest (summary + tags) must equal the scalar
    oracle exactly — selection rule, tie-breaks, join characters and all
    (VERDICT r2 #8 / reference MediaRecordInfo summary+tags analog)."""
    from docprocai_service_ray.stages.summarize import build_doc_summaries

    res, _, cfg = kg_result
    got = {
        r["url"]: (r["summary"], r["top_entities"], r["n_triples"])
        for r in build_doc_summaries(
            res["sentences"], res["triples_raw"], cfg
        ).take_all()
    }
    want = {
        r["url"]: (r["summary"], r["top_entities"], r["n_triples"])
        for r in oracle_result["doc_summaries"]
    }
    assert got == want and len(want) > 50


def test_run_kg_with_doc_summaries_stage(corpus_path, oracle_result, tmp_path):
    """with_doc_summaries=True lands a checkpointed doc_summaries table
    equal to the scalar oracle (the reference doc_info summary/tags
    columns as a first-class stage)."""
    from docprocai_service_ray.config import KGConfig
    from docprocai_service_ray.pipelines.kg import run_kg
    from docprocai_service_ray.sources.webgen import alias_dict_table
    from docprocai_service_ray.state.manifest import is_stage_done

    cfg = KGConfig()
    out_dir = str(tmp_path / "kg")
    res = run_kg(corpus_path, alias_dict_table(42, cfg.embedding_dim), cfg,
                 out_dir=out_dir, with_doc_summaries=True)
    assert is_stage_done(out_dir, "doc_summaries")
    got = {
        r["url"]: (r["summary"], r["top_entities"], r["n_triples"])
        for r in res["doc_summaries"].take_all()
    }
    want = {
        r["url"]: (r["summary"], r["top_entities"], r["n_triples"])
        for r in oracle_result["doc_summaries"]
    }
    assert got == want
