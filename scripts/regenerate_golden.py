#!/usr/bin/env python
"""Regenerate the checked-in golden outputs (SURVEY.md §5.2 item 5).

Run ONLY when an intentional semantic change invalidates the goldens:
    python scripts/regenerate_golden.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pyarrow as pa
import pyarrow.parquet as pq

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.oracle.scalar import run_oracle
from docprocai_service_ray.sources.webgen import alias_dict_table, gen_page

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
N_PAGES = 300


def main() -> None:
    cfg = KGConfig()
    pages = [gen_page(cfg.seed, r) for r in range(N_PAGES)]
    res = run_oracle(pages, alias_dict_table(cfg.seed, cfg.embedding_dim), cfg)
    docs = pa.Table.from_pylist(
        [{"url": d["url"], "n_chars": d["n_chars"], "content_hash": d["content_hash"]}
         for d in res["docs"]]
    )
    pq.write_table(docs, os.path.join(OUT, "golden_docs.parquet"))
    triples = pa.Table.from_pylist(
        [{"subject_id": t["subject_id"], "pred": t["pred"],
          "object_id": t["object_id"], "weight": t["weight"]}
         for t in res["triples"]]
    )
    pq.write_table(triples, os.path.join(OUT, "golden_triples.parquet"))
    emap = pa.Table.from_pylist(
        [{"surface": s, "canonical_id": c} for s, c in sorted(res["entity_map"].items())]
    )
    pq.write_table(emap, os.path.join(OUT, "golden_entity_map.parquet"))
    print(f"wrote goldens: docs={docs.num_rows} triples={triples.num_rows} "
          f"entity_map={emap.num_rows}")


if __name__ == "__main__":
    main()
