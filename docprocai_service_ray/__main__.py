"""CLI job runner: ``python -m docprocai_service_ray <pages.parquet dir>``.

The reference runs as a long-lived service fed by a task queue
(service/DocProcAiService.py); the Ray-Data engine's unit of operation is
a JOB over a Parquet corpus — this entry point is what you'd hand to
``ray job submit`` on a real cluster. It owns the Ray session (the
library itself never calls ray.init — see __ray_entry__ contract).

Examples:
  python -m docprocai_service_ray PAGES_DIR --out /tmp/kg --alias ALIAS.parquet
  python -m docprocai_service_ray PAGES_DIR --streaming --with-link-graph
  python -m docprocai_service_ray PAGES_DIR --out /tmp/kg --reprocess url1 url2
  python -m docprocai_service_ray PAGES_DIR --out /tmp/kg --ingest-shard SHARD_DIR
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="docprocai_service_ray")
    ap.add_argument("pages", help="directory of web_pages parquet")
    ap.add_argument("--alias", help="alias_dict parquet (defaults to the "
                    "synthetic seed dictionary)")
    ap.add_argument("--out", help="checkpoint/output dir (omit = streaming "
                    "mode, results are summarized but not persisted)")
    ap.add_argument("--streaming", action="store_true",
                    help="force streaming mode even with --out unset")
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--with-mentions", action="store_true")
    ap.add_argument("--with-doc-summaries", action="store_true")
    ap.add_argument("--with-link-graph", action="store_true")
    ap.add_argument("--with-sentence-embeddings", action="store_true")
    ap.add_argument("--reprocess", nargs="+", metavar="URL",
                    help="re-derive these urls in the --out checkpoint")
    ap.add_argument("--ingest-shard", metavar="DIR",
                    help="append this shard of pages to the --out checkpoint")
    ap.add_argument("--num-cpus", type=int, default=None)
    args = ap.parse_args(argv)

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address="local", num_cpus=args.num_cpus,
                 include_dashboard=False, logging_level="ERROR")
    try:
        import pyarrow.parquet as pq

        from .config import KGConfig
        from .pipelines.kg import ingest_shard, reprocess_urls, run_kg
        from .sources.webgen import alias_dict_table

        cfg = KGConfig()
        alias = (pq.read_table(args.alias) if args.alias
                 else alias_dict_table(cfg.seed, cfg.embedding_dim))

        if args.reprocess:
            if not args.out:
                ap.error("--reprocess needs --out")
            res = reprocess_urls(args.pages, args.reprocess, alias, cfg,
                                 out_dir=args.out)
        elif args.ingest_shard:
            if not args.out:
                ap.error("--ingest-shard needs --out")
            res = ingest_shard(args.ingest_shard, alias, cfg, out_dir=args.out)
        else:
            res = run_kg(
                args.pages, alias, cfg,
                out_dir=None if args.streaming else args.out,
                resume=not args.no_resume,
                with_mentions=args.with_mentions,
                with_doc_summaries=args.with_doc_summaries,
                with_link_graph=args.with_link_graph,
                with_sentence_embeddings=args.with_sentence_embeddings,
            )
        summary = {
            name: ds.count() for name, ds in res.items() if hasattr(ds, "count")
        }
        print(json.dumps({"stages": summary, "out_dir": args.out}))
        return 0
    finally:
        if owns_session:  # never tear down a caller's session (tests)
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
