"""Sequential scalar oracle for the KG pipeline (SURVEY.md §5.2).

The reference repo has no automated tests or conformance corpus (SURVEY.md
§5.1), so this single-process, row-at-a-time implementation over the
synthetic corpus IS the conformance target: the distributed Ray Data
pipeline must produce byte-identical `docs.text` per url and a triple set
with P/R ≥ 0.95 (exact, order-free) against these outputs at any
parallelism. It deliberately shares the pure kernels in ``functions/`` —
the distributed engine may only differ in *where* work runs, never in what
is computed.
"""

from __future__ import annotations

from collections import defaultdict

import pyarrow as pa

from ..config import KGConfig
from ..functions.canon import (
    UnionFind,
    canonical_id_for_component,
    is_qid_node,
    lsh_candidate_edges,
    qid_node,
)
from ..functions.html_extract import content_hash, extract_text
from ..functions.linking import best_candidate, build_alias_index
from ..functions.sentences import split_sentences
from ..functions.triples import extract_triples


def oracle_docs(pages: list[dict], cfg: KGConfig | None = None) -> list[dict]:
    """Extract EVERY capture, url-dedup by max (warc_ts, content_hash),
    then drop empty-text winners; optional language filter. Step order and
    tie-break match stages/extract.py exactly (extract → dedup → empty-drop,
    so an empty LATEST capture drops its url; byte-identical full ties keep
    one copy)."""
    if cfg is not None and cfg.filter_langs:
        pages = [p for p in pages if p["lang"] in cfg.filter_langs]
    by_url: dict[str, dict] = {}
    for p in pages:
        text = extract_text(p["html"]) or ""
        row = {
            "url": p["url"],
            "warc_ts": p["warc_ts"],
            "lang": p["lang"],
            "text": text,
            "n_chars": len(text),
            "content_hash": content_hash(text),
        }
        cur = by_url.get(p["url"])
        if cur is None or (row["warc_ts"], row["content_hash"]) > (
            cur["warc_ts"], cur["content_hash"]
        ):
            by_url[p["url"]] = row
    return [by_url[url] for url in sorted(by_url) if by_url[url]["text"]]


def oracle_sentences(docs: list[dict]) -> list[dict]:
    out = []
    for d in docs:
        for sent_id, text, start, end in split_sentences(d["text"]):
            out.append(
                {
                    "url": d["url"],
                    "warc_ts": d["warc_ts"],
                    "sent_id": sent_id,
                    "text": text,
                    "char_start": start,
                    "char_end": end,
                }
            )
    return out


def oracle_triples_raw(sents: list[dict]) -> list[dict]:
    out = []
    for s in sents:
        for subj, pred, obj, ss, sl, os_, ol, conf in extract_triples(s["text"]):
            out.append(
                {
                    "url": s["url"],
                    "warc_ts": s["warc_ts"],
                    "sent_id": s["sent_id"],
                    "subj": subj,
                    "pred": pred,
                    "obj": obj,
                    "subj_start": ss,
                    "subj_len": sl,
                    "obj_start": os_,
                    "obj_len": ol,
                    "conf": conf,
                }
            )
    return out


def oracle_entity_map(surfaces: set[str], alias_table: pa.Table, cfg: KGConfig) -> dict[str, str]:
    """surface → canonical_id via alias links + LSH clustering + union-find."""
    index = build_alias_index(alias_table)
    uf = UnionFind()
    for s in sorted(surfaces):
        uf.find(s)
        cand = best_candidate(s, index, cfg.embedding_dim)
        if cand is not None and cand[1] >= cfg.link_threshold:
            uf.union(s, qid_node(cand[0]))
    for s1, s2 in lsh_candidate_edges(
        sorted(surfaces),
        seed=cfg.seed,
        num_perms=cfg.minhash_perms,
        bands=cfg.lsh_bands,
        k=cfg.shingle_k,
        threshold=cfg.jaccard_threshold,
    ):
        uf.union(s1, s2)
    mapping: dict[str, str] = {}
    for _, members in uf.components().items():
        cid = canonical_id_for_component(members)
        for m in members:
            if not is_qid_node(m):
                mapping[m] = cid
    return mapping


def oracle_entity_map_table(surfaces: set[str], alias_table: pa.Table, cfg: KGConfig) -> pa.Table:
    mapping = oracle_entity_map(surfaces, alias_table, cfg)
    sizes: dict[str, int] = defaultdict(int)
    for _, cid in mapping.items():
        sizes[cid] += 1
    rows = sorted(mapping.items())
    return pa.Table.from_pydict(
        {
            "surface": [r[0] for r in rows],
            "canonical_id": [r[1] for r in rows],
            "cluster_size": [sizes[r[1]] for r in rows],
        }
    )


def oracle_triples(
    triples_raw: list[dict], entity_map: dict[str, str], cfg: KGConfig
) -> list[dict]:
    """Canonicalize, dedup by (subject_id, pred, object_id), collect capped
    provenance, count weight."""
    agg: dict[tuple[str, str, str], dict] = {}
    for t in sorted(
        triples_raw, key=lambda t: (t["url"], t["sent_id"], t["subj"], t["obj"])
    ):
        sid = entity_map.get(t["subj"], t["subj"])
        oid = entity_map.get(t["obj"], t["obj"])
        key = (sid, t["pred"], oid)
        ent = agg.setdefault(key, {"weight": 0, "prov": [], "overflow": 0})
        ent["weight"] += 1
        if len(ent["prov"]) < cfg.prov_cap:
            ent["prov"].append(
                {"url": t["url"], "warc_ts": t["warc_ts"], "sent_id": t["sent_id"]}
            )
        else:
            ent["overflow"] += 1
    out = []
    for (sid, pred, oid), ent in sorted(agg.items()):
        out.append(
            {
                "subject_id": sid,
                "pred": pred,
                "object_id": oid,
                "prov": ent["prov"],
                "weight": ent["weight"],
                "prov_overflow": ent["overflow"],
            }
        )
    return out


def oracle_doc_summaries(sents: list[dict], triples_raw: list[dict], *,
                         summary_k: int = 2, tags_k: int = 3) -> list[dict]:
    """Per-url digest: top-k salient sentences (most triple extractions,
    earlier sentence on ties, re-ordered by position, joined with ' ') +
    top-k surfaces (subj+obj occurrences, lexicographic tie-break, joined
    with '|') + exact triple count. Mirrors stages/summarize.py."""
    hits: dict[tuple[str, int], int] = defaultdict(int)
    ents: dict[tuple[str, str], int] = defaultdict(int)
    ntrip: dict[str, int] = defaultdict(int)
    for t in triples_raw:
        hits[(t["url"], t["sent_id"])] += 1
        ents[(t["url"], t["subj"])] += 1
        ents[(t["url"], t["obj"])] += 1
        ntrip[t["url"]] += 1
    text = {(s["url"], s["sent_id"]): s["text"] for s in sents}
    by_url_hits: dict[str, list] = defaultdict(list)
    for (url, sid), h in hits.items():
        by_url_hits[url].append((sid, h))
    by_url_ents: dict[str, list] = defaultdict(list)
    for (url, surf), c in ents.items():
        by_url_ents[url].append((surf, c))
    out = []
    for url in sorted(ntrip):
        top_sents = sorted(by_url_hits[url], key=lambda x: (-x[1], x[0]))[:summary_k]
        summary = " ".join(text[(url, sid)] for sid, _ in sorted(top_sents))
        top_ents = sorted(by_url_ents[url], key=lambda x: (-x[1], x[0]))[:tags_k]
        out.append(
            {
                "url": url,
                "summary": summary,
                "top_entities": "|".join(s for s, _ in top_ents),
                "n_triples": ntrip[url],
            }
        )
    return out


def run_oracle(pages: list[dict], alias_table: pa.Table, cfg: KGConfig | None = None) -> dict:
    """Full sequential pipeline; returns dict of plain-Python stage outputs."""
    cfg = cfg or KGConfig()
    docs = oracle_docs(pages, cfg)
    sents = oracle_sentences(docs)
    traw = oracle_triples_raw(sents)
    surfaces = {t["subj"] for t in traw} | {t["obj"] for t in traw}
    emap = oracle_entity_map(surfaces, alias_table, cfg)
    triples = oracle_triples(traw, emap, cfg)
    return {
        "docs": docs,
        "sentences": sents,
        "triples_raw": traw,
        "entity_map": emap,
        "triples": triples,
        "doc_summaries": oracle_doc_summaries(sents, traw),
    }
