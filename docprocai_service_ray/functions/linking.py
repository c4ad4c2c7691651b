"""Entity-link scoring (the ST3/ST6/ST7 analog kernel).

The reference scores cross-record links by image-template similarity with a
0.7 cutoff (reference: service/DocProcAiService.py:710-757, threshold :755)
and fetches candidates per query (ST7, :670-680). The target retrieves
candidates by exact surface match against the alias dictionary and scores
``0.5*cosine(mention_emb, candidate_emb) + 0.5*prior`` — pure, vectorizable,
deterministic. The alias dictionary is the broadcast small side
(``ray.put`` once, read in every actor's ``__init__``; SURVEY.md §2.3 ST7).
"""

from __future__ import annotations

import numpy as np

from .hashing import hash_embedding


def build_alias_index(alias_table) -> dict[str, list[tuple[str, float, np.ndarray]]]:
    """surface → [(qid, prior, embedding)] lookup from the alias_dict table
    (pyarrow.Table with columns surface, qid, prior, embedding)."""
    surfaces = alias_table["surface"].to_pylist()
    qids = alias_table["qid"].to_pylist()
    priors = alias_table["prior"].to_pylist()
    embs = alias_table["embedding"].to_pylist()
    idx: dict[str, list[tuple[str, float, np.ndarray]]] = {}
    for s, q, p, e in zip(surfaces, qids, priors, embs):
        idx.setdefault(s, []).append((q, float(p), np.asarray(e, dtype=np.float32)))
    return idx


def link_score(cos: float, prior: float) -> float:
    return 0.5 * max(0.0, cos) + 0.5 * prior


def best_candidate(
    surface: str,
    index: dict[str, list[tuple[str, float, np.ndarray]]],
    dim: int,
    emb: np.ndarray | None = None,
) -> tuple[str, float] | None:
    """Best (qid, score) for a mention surface, or None if no candidate.

    Deterministic tie-break: higher score, then lexicographically smaller
    qid (min-label rule, SURVEY.md §4.3).
    """
    cands = index.get(surface)
    if not cands:
        return None
    if emb is None:
        emb = hash_embedding(surface, dim)
    best: tuple[float, str] | None = None
    for qid, prior, cemb in cands:
        cos = float(np.dot(emb, cemb))  # both unit vectors
        s = link_score(cos, prior)
        key = (-s, qid)
        if best is None or key < best:
            best = key
    return (best[1], -best[0])
