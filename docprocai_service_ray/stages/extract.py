"""docs stage: web_pages → extracted docs (M1/M7/W6 analogs).

``read_parquet(web_pages)`` → stateless ``map_batches`` HTML→text
extraction (one output row per kept page) → url-dedup (last warc_ts wins).

Scale notes (SURVEY.md §7.4):
- the ``html`` binary column is dropped INSIDE the extraction batch fn —
  nothing downstream ever shuffles raw HTML;
- url-dedup does NOT shuffle document text: a (url, warc_ts, content_hash)
  projection is grouped to find *duplicated* urls only (rare in a WARC-style
  crawl — assumption documented here), the winners map is broadcast via
  ``ray.put`` and losers are filtered out in place. Worst case (everything
  duplicated) degrades to a projection-sized shuffle, never a text shuffle.
- ties on warc_ts break by content_hash (max), matching oracle/scalar.py.
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
    """Pure per-row extraction; drops empty-text rows and the html column."""
    htmls = batch["html"].to_pylist()
    urls = batch["url"].to_pylist()
    tss = batch["warc_ts"].to_pylist()
    langs = batch["lang"].to_pylist()
    out_url, out_ts, out_lang, out_text, out_n, out_h = [], [], [], [], [], []
    for url, ts, lang, html in zip(urls, tss, langs, htmls):
        text = extract_text(html)
        if not text:
            continue  # empty/boilerplate-only page skip (PdfProcessor.py:53-59 analog)
        out_url.append(url)
        out_ts.append(ts)
        out_lang.append(lang)
        out_text.append(text)
        out_n.append(len(text))
        out_h.append(content_hash(text))
    return pa.Table.from_arrays(
        [
            pa.array(out_url, pa.string()),
            pa.array(out_ts, pa.timestamp("us")),
            pa.array(out_lang, pa.string()),
            pa.array(out_text, pa.string()),
            pa.array(out_n, pa.int64()),
            pa.array(out_h, pa.binary(16)),
        ],
        schema=DOCS_SCHEMA,
    )


def dedup_urls(docs_ds, cfg: KGConfig):
    """Keep the max (warc_ts, content_hash) row per url without shuffling
    text: project → groupby(url) over the tiny projection → collect ONLY
    duplicated urls → broadcast winners → filter.

    Edge case: rows that tie on ALL of (url, warc_ts, content_hash) are
    byte-identical records; the filter keeps every copy (the winner match
    is by value). A crawl cannot produce distinguishable duplicates this
    way — the rows are indistinguishable — but exact multiplicity of such
    ties is not preserved."""
    import pandas as pd

    from ..state.groupby import partition_reduce

    proj = docs_ds.select_columns(["url", "warc_ts", "content_hash"])

    def winners(part: pd.DataFrame) -> pd.DataFrame:
        # all rows of a url are in this partition → global per-url decision,
        # fully vectorized (sort + drop_duplicates + duplicated mask)
        dup_mask = part.duplicated("url", keep=False)
        dups = part[dup_mask]
        if dups.empty:
            return part.iloc[0:0]
        best = dups.sort_values(
            ["url", "warc_ts", "content_hash"], ascending=[True, False, False]
        ).drop_duplicates("url", keep="first")
        return best

    n_docs = None
    try:
        n_docs = docs_ds.count()  # metadata-only for parquet / materialized inputs
    except Exception:
        pass
    if n_docs is not None and n_docs <= cfg.driver_dedup_max:
        # small-side fast path: the 40-byte/row projection fits on the
        # driver — one streaming pass, no shuffle
        win_df = winners(proj.to_pandas())
        win_rows = win_df.to_dict("records")
    else:
        dup_winners = partition_reduce(proj, ["url"], winners, num_partitions=64)
        win_rows = dup_winners.take_all()  # small: only urls that appear 2+ times
    win_map = {r["url"]: (r["warc_ts"], r["content_hash"]) for r in win_rows}
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

    return docs_ds.map_batches(keep, batch_format="pyarrow")


def extract_docs(pages_ds, cfg: KGConfig):
    """web_pages Dataset → raw extracted docs (not yet url-deduped)."""
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
    """web_pages Dataset → docs Dataset (extracted, deduped).

    The winners pass and the filter pass both consume the extraction; to run
    the (expensive) HTML parse exactly once the extraction is pinned with
    ``materialize()`` here. The checkpointed pipeline (pipelines/kg.py)
    avoids even that by writing the raw extraction to Parquet first and
    running the winners pass over the cheap columnar projection."""
    return dedup_urls(extract_docs(pages_ds, cfg).materialize(), cfg)
