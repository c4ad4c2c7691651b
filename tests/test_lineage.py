"""Stage-level input lineage (state/manifest input_sig): editing one
input shard invalidates exactly the dependent stages — the untouched
docs_raw partition resumes, everything derived downstream recomputes, and
an unchanged corpus still resumes everything."""

from __future__ import annotations

import dataclasses
import os

import pyarrow.parquet as pq
import pytest

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.pipelines.kg import run_kg
from docprocai_service_ray.sources.webgen import alias_dict_table, pages_table


def _mtimes(out_dir: str) -> dict[str, float]:
    mdir = os.path.join(out_dir, "_manifest")
    return {
        n: os.path.getmtime(os.path.join(mdir, n))
        for n in os.listdir(mdir)
        if n.endswith(".json") and not n.startswith("_inflight")
    }


@pytest.mark.usefixtures("ray_session")
def test_tamper_invalidates_exactly_dependents(tmp_path):
    cfg = dataclasses.replace(KGConfig(), ingest_partitions=2)
    alias = alias_dict_table(42, cfg.embedding_dim)
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    pq.write_table(pages_table(42, list(range(150))),
                   os.path.join(pages_dir, "a.parquet"))
    pq.write_table(pages_table(42, list(range(150, 300))),
                   os.path.join(pages_dir, "b.parquet"))

    out = str(tmp_path / "kg")
    run_kg(pages_dir, alias, cfg, out_dir=out)
    first = _mtimes(out)

    # resume over an UNCHANGED corpus: nothing recomputes
    run_kg(pages_dir, alias, cfg, out_dir=out)
    assert _mtimes(out) == first

    # tamper with shard b only (valid content, different rows)
    pq.write_table(pages_table(42, list(range(150, 310))),
                   os.path.join(pages_dir, "b.parquet"))
    res = run_kg(pages_dir, alias, cfg, out_dir=out)
    after = _mtimes(out)

    # the untouched partition (sorted files → part-00000 holds a.parquet)
    # resumed; the tampered one and every downstream stage recomputed
    same = {n for n in first if after[n] == first[n]}
    changed = {n for n in first if after[n] != first[n]}
    assert "docs_raw.part-00000.json" in same
    assert "docs_raw.part-00001.json" in changed
    for stage in ("docs_raw.json", "docs.json", "sentences.json",
                  "triples_raw.json", "entity_map.json", "triples.json"):
        assert stage in changed, stage

    # and the result reflects the EDITED corpus (not the stale checkpoint)
    clean = run_kg(pages_dir, alias, cfg,
                   out_dir=str(tmp_path / "clean"), resume=False)
    got = sorted(res["docs"].to_pandas()["url"])
    want = sorted(clean["docs"].to_pandas()["url"])
    assert got == want and len(got) > 0


@pytest.mark.usefixtures("ray_session")
def test_swapped_corpus_path_invalidates(tmp_path):
    """The r3 gap: a different corpus path with equal row count used to
    resume silently; the lineage sig includes the source path."""
    cfg = KGConfig()
    alias = alias_dict_table(42, cfg.embedding_dim)
    dir_a = str(tmp_path / "a"); os.makedirs(dir_a)
    dir_b = str(tmp_path / "b"); os.makedirs(dir_b)
    pq.write_table(pages_table(42, list(range(120))),
                   os.path.join(dir_a, "p.parquet"))
    pq.write_table(pages_table(42, list(range(120, 240))),
                   os.path.join(dir_b, "p.parquet"))

    out = str(tmp_path / "kg")
    run_kg(dir_a, alias, cfg, out_dir=out)
    res = run_kg(dir_b, alias, cfg, out_dir=out)  # resume=True default
    urls = set(res["docs"].to_pandas()["url"])
    want = set(run_kg(dir_b, alias, cfg, out_dir=str(tmp_path / "kg_b"),
                      resume=False)["docs"].to_pandas()["url"])
    assert urls == want  # derived from B, not silently resumed from A
