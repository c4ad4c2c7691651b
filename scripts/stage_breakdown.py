"""Operator-level wall-time breakdown of the flagship KG pipeline.

Runs run_kg (streaming mode) once at --pages, then parses ds.stats() of
the final triple table into a compact (operator, wall) table so
BASELINE.md can show WHERE the end-to-end seconds go — the evidence that
wall time is dominated by useful compute (extraction regex/parse work),
not shuffles or overhead.

Usage: python scripts/stage_breakdown.py [--pages 100000] [--cpus 16]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=100_000)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    import ray

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from docprocai_service_ray.config import KGConfig
    from docprocai_service_ray.pipelines.kg import run_kg
    from docprocai_service_ray.sources.webgen import alias_dict_table, ensure_corpus

    cfg = KGConfig()
    corpus = ensure_corpus(args.pages, cfg.seed, cfg.embedding_dim)
    t0 = time.monotonic()
    res = run_kg(os.path.join(corpus, "web_pages"),
                 alias_dict_table(cfg.seed, cfg.embedding_dim), cfg)
    triples = res["triples"].materialize()
    wall = time.monotonic() - t0
    n = triples.count()

    print(f"pages={args.pages} cpus={args.cpus} wall={wall:.1f}s triples={n}")
    seen = set()
    for name in ("docs", "sentences", "triples_raw", "entity_map", "triples"):
        ds = res.get(name)
        if ds is None or not hasattr(ds, "stats"):
            continue
        try:
            stats = ds.stats()
        except Exception:
            continue
        rows = [(float(m.group(2)), m.group(1)[:100]) for m in re.finditer(
            r"Operator \d+ ([^:\n]+): [^\n]*? in ([\d.]+)s", stats)]
        rows = [r for r in rows if r not in seen]
        if not rows:
            continue
        print(f"--- {name} lineage ---")
        for t, op in rows:
            seen.add((t, op))
            print(f"{t:9.2f}s  {op}")
    ray.shutdown()


if __name__ == "__main__":
    main()
