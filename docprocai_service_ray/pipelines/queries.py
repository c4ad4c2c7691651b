"""Query surface over the KG output tables (SURVEY.md §2.10 Q1–Q6).

Each reference GraphQL query becomes a Dataset expression over the
Parquet outputs — no service layer, no Postgres (§7.4 non-goal creep):

- Q1 semanticSearch       → ``semantic_search``  (score → sort → limit)
- Q2 similarEntities      → ``similar_entities`` (anti-join + drop self)
- Q3 getMediaRecordSegments → ``sentences_for_url`` (point lookup)
- Q4 linksForContent      → ``triples_for_subject``
- Q5 captions/summary     → ``doc_for_url`` (column projection)
- Q6 AiProcessingProgress → ``progress`` (manifest lookup, J6 null-fill)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..config import KGConfig
from ..functions.hashing import hash_embedding
from ..stages.similarity import brute_force_topk


def _filter_eq(ds, **col_values):
    """Equality filter built from pyarrow.compute predicates — immune to
    quotes/escapes in values (a url may legally contain ``'``), unlike an
    interpolated ``filter(expr=...)`` string."""

    def _fn(batch: pa.Table) -> pa.Table:
        mask = None
        for col, val in col_values.items():
            m = pc.equal(batch[col], pa.scalar(val))
            mask = m if mask is None else pc.and_(mask, m)
        return batch.filter(mask)

    return ds.map_batches(_fn, batch_format="pyarrow")


def _with_sentence_embeddings(sentences_ds, cfg: KGConfig):
    dim = cfg.embedding_dim

    def embed(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        embs = [hash_embedding(t or "", dim) for t in texts]
        flat = np.concatenate(embs).astype(np.float32) if embs else np.empty(0, np.float32)
        return batch.append_column(
            "embedding", pa.FixedSizeListArray.from_arrays(pa.array(flat), dim)
        )

    return sentences_ds.map_batches(embed, batch_format="pyarrow", zero_copy_batch=True)


def build_sentence_embeddings(sentences_ds, cfg: KGConfig):
    """Embed-at-ingest table (url, sent_id, text, embedding) — the analog
    of the reference storing pgvector embeddings once at ingest
    (persistence/SegmentDbConnector.py:25-36) so every query scores STORED
    vectors (SegmentDbConnector.py:223-267) instead of re-embedding the
    corpus per query. Persist this once (pipelines/kg.run_kg checkpoints it
    as the ``sentence_embeddings`` stage) and pass it to semantic_search /
    similar_entities as ``embedded_ds``."""
    return _with_sentence_embeddings(sentences_ds, cfg)


def semantic_search(
    sentences_ds,
    query_text: str,
    k: int = 10,
    cfg: KGConfig = KGConfig(),
    whitelist_urls: set[str] | None = None,
    embedded_ds=None,
):
    """Q1: embed query on the driver (one call — the reference does exactly
    one HTTP embed per search, DocProcAiService.py:574), optional whitelist
    semi-join (J4), score → sort → limit (W1).

    Pass ``embedded_ds`` (a stored build_sentence_embeddings table) to
    score persisted vectors; without it the sentences are embedded inline
    (one full corpus embed per query — fine for tests, wrong at scale)."""
    ds = embedded_ds if embedded_ds is not None else sentences_ds
    if whitelist_urls is not None:
        ref = ray.put(set(whitelist_urls))

        def filt(batch: pa.Table) -> pa.Table:
            wl = ray.get(ref)
            return batch.filter(pc.is_in(batch["url"], pa.array(sorted(wl))))

        ds = ds.map_batches(filt, batch_format="pyarrow")
    q = hash_embedding(query_text, cfg.embedding_dim).astype(np.float64)
    if embedded_ds is None:
        ds = _with_sentence_embeddings(ds, cfg)
    ds = ds.map_batches(
        lambda t: t.append_column(
            "sent_key",
            pc.binary_join_element_wise(
                t["url"], pc.cast(t["sent_id"], pa.string()), "#"
            ),
        ),
        batch_format="pyarrow",
    )
    top = brute_force_topk(ds, q, k, id_col="sent_key", extra_cols=("url", "sent_id", "text"))
    return top.map_batches(
        lambda df: pd.DataFrame({
            "url": df["url"], "sent_id": df["sent_id"], "text": df["text"],
            "score": df["score"].round(6),
        }),
        batch_format="pandas",
    )


def similar_entities(
    sentences_ds,
    url: str,
    sent_id: int,
    k: int = 10,
    cfg: KGConfig = KGConfig(),
    exclude_same_url: bool = True,
    embedded_ds=None,
):
    """Q2: top-k sentences similar to a probe sentence; anti-join (J5) drops
    the probe's own document when ``exclude_same_url`` (the reference's
    excludeEntitiesWithSameParent, DocProcAiService.py:616-637) and the
    probe row itself. Pass ``embedded_ds`` to score stored vectors."""
    base = embedded_ds if embedded_ds is not None else sentences_ds
    probe = _filter_eq(base, url=url, sent_id=sent_id).take(1)
    if not probe:
        raise KeyError(f"no sentence {url}#{sent_id}")
    q = hash_embedding(probe[0]["text"], cfg.embedding_dim).astype(np.float64)

    def filt(batch: pa.Table) -> pa.Table:
        if exclude_same_url:
            return batch.filter(pc.not_equal(batch["url"], url))
        keep = pc.or_(
            pc.not_equal(batch["url"], url),
            pc.not_equal(batch["sent_id"], sent_id),
        )
        return batch.filter(keep)

    ds = base.map_batches(filt, batch_format="pyarrow")
    if embedded_ds is None:
        ds = _with_sentence_embeddings(ds, cfg)
    ds = ds.map_batches(
        lambda t: t.append_column(
            "sent_key",
            pc.binary_join_element_wise(t["url"], pc.cast(t["sent_id"], pa.string()), "#"),
        ),
        batch_format="pyarrow",
    )
    top = brute_force_topk(ds, q, k, id_col="sent_key", extra_cols=("url", "sent_id", "text"))
    return top.map_batches(
        lambda df: pd.DataFrame({
            "url": df["url"], "sent_id": df["sent_id"], "text": df["text"],
            "score": df["score"].round(6),
        }),
        batch_format="pandas",
    )


def sentences_for_url(sentences_ds, url: str):
    """Q3: ordered segments of one document (point lookup + sort)."""
    return _filter_eq(sentences_ds, url=url).sort("sent_id")


def doc_for_url(docs_ds, url: str):
    """Q5: one document's record-level info (column projection)."""
    return _filter_eq(docs_ds, url=url).select_columns(
        ["url", "warc_ts", "lang", "n_chars", "text"]
    )


def triples_for_subject(triples_ds, subject_id: str):
    """Q4: edges of one subject with provenance resolved (J3 analog)."""
    return _filter_eq(triples_ds, subject_id=subject_id).select_columns(
        ["subject_id", "pred", "object_id", "weight", "prov"]
    )


def progress(out_dir: str) -> pd.DataFrame:
    """Q6: per-stage processing state from the manifest; stages never
    started report UNKNOWN (left join with null-fill, J6 analog)."""
    from ..state.manifest import read_manifest

    all_stages = ["docs", "sentences", "triples_raw", "mentions", "entity_map", "triples"]
    rows = {r["stage"]: r for r in read_manifest(out_dir)}
    return pd.DataFrame({
        "stage": all_stages,
        "state": [rows.get(s, {}).get("state", "UNKNOWN") for s in all_stages],
        "wall_s": [rows.get(s, {}).get("wall_s", float("nan")) for s in all_stages],
        "output_path": [rows.get(s, {}).get("output_path") for s in all_stages],
    })
