"""Fused segment+triple extraction must equal the two-stage composition."""

from __future__ import annotations

import ray.data as rd

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.stages.extract import build_docs
from docprocai_service_ray.stages.segment import build_sentences
from docprocai_service_ray.stages.triple_extract import (
    build_triples_raw,
    build_triples_raw_fused,
)


def _key_set(rows):
    return {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"],
         r["subj_start"], r["obj_start"])
        for r in rows
    }


def test_fused_equals_two_stage(corpus_path):
    cfg = KGConfig()
    pages = rd.read_parquet(corpus_path, columns=["url", "warc_ts", "html", "lang"])
    docs = build_docs(pages, cfg).materialize()
    two_stage = _key_set(build_triples_raw(build_sentences(docs, cfg), cfg).take_all())
    fused = _key_set(build_triples_raw_fused(docs, cfg).take_all())
    assert fused == two_stage
    assert len(fused) > 500
