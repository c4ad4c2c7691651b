"""docs stage: web_pages → extracted docs (M1/M7/W6 analogs).

``read_parquet(web_pages)`` → stateless ``map_batches`` HTML→text
extraction (one output row per page, empty text kept until after url-dedup)
→ url-dedup (max (warc_ts, content_hash) wins) → empty-text drop.

Semantics (aligned with oracle/scalar.oracle_docs — same order of steps):
1. extract every capture (empty-text rows KEPT so a url whose latest
   capture extracts empty is dropped, not resurrected by an older capture);
2. per url keep the max (warc_ts, content_hash) row; rows tying on all of
   (url, warc_ts, content_hash) are byte-identical — exactly ONE copy is
   kept (a tiny distinct pass over only the tied urls);
3. drop rows whose extracted text is empty (PdfProcessor.py:53-59 analog).

Scale notes (SURVEY.md §7.4):
- the ``html`` binary column is dropped INSIDE the extraction batch fn —
  nothing downstream ever shuffles raw HTML;
- url-dedup does NOT shuffle or pin document text: only the 3-column
  (url, warc_ts, content_hash) projection is materialized (40 B/row — a
  100 TB corpus projects to tens of GB, object-store-sized); the winners
  map is broadcast via ``ray.put`` and losers are filtered out in place.
  In streaming mode the extraction therefore runs once for the winners
  pass and once for the filter pass — compute is traded for not pinning
  the full extracted corpus (the checkpointed path in pipelines/kg.py
  avoids the re-run by writing extraction to Parquet first).
"""

from __future__ import annotations

import pyarrow as pa
import ray

from ..config import KGConfig
from ..functions.html_extract import content_hash, extract_text

DOCS_SCHEMA = pa.schema(
    [
        pa.field("url", pa.string()),
        pa.field("warc_ts", pa.timestamp("us")),
        pa.field("lang", pa.string()),
        pa.field("text", pa.string()),
        pa.field("n_chars", pa.int64()),
        pa.field("content_hash", pa.binary(16)),
    ]
)


def extract_batch(batch: pa.Table) -> pa.Table:
    """Pure per-row extraction; drops the html column. Empty-text rows are
    KEPT (url-dedup must see every capture; drop_empty runs after dedup)."""
    htmls = batch["html"].to_pylist()
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    out_text, out_n, out_h = [], [], []
    for html in htmls:
        text = extract_text(html) or ""
        out_text.append(text)
        out_n.append(len(text))
        out_h.append(content_hash(text))
    return pa.Table.from_arrays(
        [
            pa.array(urls, pa.string()),
            pa.array(tss, pa.timestamp("us")),
            pa.array(langs, pa.string()),
            pa.array(out_text, pa.string()),
            pa.array(out_n, pa.int64()),
            pa.array(out_h, pa.binary(16)),
        ],
        schema=DOCS_SCHEMA,
    )


def drop_empty(docs_ds):
    """Drop rows whose extracted text is empty — AFTER url-dedup, so an
    empty latest capture suppresses its url entirely."""
    import pyarrow.compute as pc

    return docs_ds.map_batches(
        lambda t: t.filter(pc.greater(t["n_chars"], 0)), batch_format="pyarrow"
    )


def dedup_urls(docs_ds, cfg: KGConfig):
    """Keep the max (warc_ts, content_hash) row per url without shuffling
    text: project → winners over the tiny projection → broadcast winners →
    filter. Rows tying on ALL of (url, warc_ts, content_hash) are
    byte-identical; exactly one copy survives (a distinct pass over only
    the tied urls — a crawl shard almost never produces them)."""
    import pandas as pd

    from ..state.groupby import distinct_rows, partition_reduce

    # one execution of the upstream pipeline feeds this 3-column projection;
    # everything below it is metadata / vocab-sized
    proj = docs_ds.select_columns(["url", "warc_ts", "content_hash"]).materialize()

    def winners(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of a url are in this partition → global per-url decision,
        # fully vectorized (sort + drop_duplicates + duplicated mask)
        dup_mask = part.duplicated("url", keep=False)
        dups = part[dup_mask]
        if dups.empty:
            return part.iloc[0:0].assign(n_win_copies=pd.Series(dtype="int64"))
        best = dups.sort_values(
            ["url", "warc_ts", "content_hash"], ascending=[True, False, False]
        ).drop_duplicates("url", keep="first")
        counts = (
            dups.merge(best, on=["url", "warc_ts", "content_hash"])
            .groupby("url", as_index=False)
            .size()
            .rename(columns={"size": "n_win_copies"})
        )
        return best.merge(counts, on="url")

    n_docs = proj.count()  # metadata-only: proj is materialized
    if n_docs <= cfg.driver_dedup_max:
        # small-side fast path: the 40-byte/row projection fits on the
        # driver — one collect, no shuffle
        win_df = winners(proj.to_pandas())
        win_rows = win_df.to_dict("records")
    else:
        dup_winners = partition_reduce(proj, ["url"], winners, num_partitions=64)
        win_rows = dup_winners.take_all()  # small: only urls that appear 2+ times
    win_map = {r["url"]: (r["warc_ts"], r["content_hash"]) for r in win_rows}
    tie_urls = sorted(r["url"] for r in win_rows if r["n_win_copies"] > 1)
    if not win_map:
        return docs_ds
    ref = ray.put(win_map)

    def keep(batch: pa.Table) -> pa.Table:
        wm = ray.get(ref)
        urls = batch["url"].to_pylist()
        tss = batch["warc_ts"].to_pylist()
        hs = batch["content_hash"].to_pylist()
        mask = [
            (u not in wm) or ((ts, h) == wm[u]) for u, ts, h in zip(urls, tss, hs)
        ]
        return batch.filter(pa.array(mask, pa.bool_()))

    filtered = docs_ds.map_batches(keep, batch_format="pyarrow")
    if not tie_urls:
        return filtered

    # exact-tie multiplicity: byte-identical winner copies collapse to one
    # row via a distinct pass over ONLY the tied urls (vanishingly rare, so
    # the extra upstream execution + row shuffle touch almost nothing)
    import pyarrow.compute as pc

    tie_ref = ray.put(set(tie_urls))

    def _not_tied(t: pa.Table) -> pa.Table:
        ties = pa.array(sorted(ray.get(tie_ref)))
        return t.filter(pc.invert(pc.is_in(t["url"], ties)))

    def _tied(t: pa.Table) -> pa.Table:
        ties = pa.array(sorted(ray.get(tie_ref)))
        return t.filter(pc.is_in(t["url"], ties))

    base = filtered.map_batches(_not_tied, batch_format="pyarrow")
    tied_once = distinct_rows(
        filtered.map_batches(_tied, batch_format="pyarrow"), ["url"],
        num_partitions=4,
    ).map_batches(
        # pandas round-trip loses binary(16)/timestamp[us] — restore DOCS_SCHEMA
        # so the union with the arrow-block base has one schema
        lambda df: pa.Table.from_pandas(df, schema=DOCS_SCHEMA, preserve_index=False),
        batch_format="pandas",
    )
    return base.union(tied_once)


def extract_docs(pages_ds, cfg: KGConfig):
    """web_pages Dataset → raw extracted docs (not yet url-deduped; includes
    empty-text rows — see module docstring step ordering)."""
    pages_ds = filter_langs(pages_ds, cfg)
    return pages_ds.map_batches(
        extract_batch,
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        zero_copy_batch=True,
    )


def filter_langs(ds, cfg: KGConfig):
    """Optional language dispatch (the content-type-dispatch analog of
    DocumentProcessor.py:25-30): drop rows whose lang isn't configured.
    Applied pre-extraction so filtered html is never parsed."""
    if not cfg.filter_langs:
        return ds
    import pyarrow.compute as pc

    langs = pa.array(sorted(cfg.filter_langs))
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], langs)), batch_format="pyarrow"
    )


def build_docs(pages_ds, cfg: KGConfig):
    """web_pages Dataset → docs Dataset (extracted, url-deduped, empty rows
    dropped). Only the 3-column dedup projection is ever materialized; in
    exchange the extraction runs once for the winners pass and once for the
    filter pass (the checkpointed pipeline in pipelines/kg.py writes the
    extraction to Parquet instead and re-reads, paying neither)."""
    return drop_empty(dedup_urls(extract_docs(pages_ds, cfg), cfg))
