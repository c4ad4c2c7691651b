"""Incremental shard ingest (pipelines/kg.ingest_shard): run_kg over shard
A, ingest shard B, and every stage — including the corpus-global
entity_map / triples cascade — must equal a clean run over A ∪ B; a second
ingest of the same shard is a no-op."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
import pytest

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.pipelines.kg import ingest_shard, run_kg
from docprocai_service_ray.sources.webgen import alias_dict_table, pages_table

STAGES = {
    "docs": ["url", "lang", "n_chars", "content_hash"],
    "sentences": ["url", "sent_id", "char_start", "char_end", "text"],
    "triples_raw": ["url", "sent_id", "subj", "pred", "obj"],
    "entity_map": ["surface", "canonical_id"],
    "triples": ["subject_id", "pred", "object_id", "weight"],
}


def _rows(ds, cols):
    df = ds.to_pandas()[cols]
    for c in cols:
        df[c] = df[c].map(
            lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else str(v)
        )
    return sorted(map(tuple, df.itertuples(index=False)))


def _write_pages(dirpath, rows):
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(pages_table(42, rows), os.path.join(dirpath, "part-0.parquet"))
    return str(dirpath)


@pytest.mark.usefixtures("ray_session")
def test_ingest_equals_clean_union(tmp_path):
    cfg = KGConfig()
    alias = alias_dict_table(42, cfg.embedding_dim)
    shard_a = _write_pages(tmp_path / "shard_a", list(range(200)))
    shard_b = _write_pages(tmp_path / "shard_b", list(range(200, 300)))
    full = _write_pages(tmp_path / "full", list(range(300)))

    clean_dir = str(tmp_path / "clean")
    clean = run_kg(full, alias, cfg, out_dir=clean_dir)
    want = {s: _rows(clean[s], cols) for s, cols in STAGES.items()}

    inc_dir = str(tmp_path / "inc")
    run_kg(shard_a, alias, cfg, out_dir=inc_dir)
    after_b = ingest_shard(shard_b, alias, cfg, out_dir=inc_dir)
    for stage, cols in STAGES.items():
        assert _rows(after_b[stage], cols) == want[stage], stage

    # idempotent: re-ingesting the same shard changes nothing
    again = ingest_shard(shard_b, alias, cfg, out_dir=inc_dir)
    for stage, cols in STAGES.items():
        assert _rows(again[stage], cols) == want[stage], stage
