"""Hybrid lexical+semantic search via Reciprocal Rank Fusion (RRF;
Cormack/Clarke/Büttcher 2009 — the standard public score-free fusion:
``fused(d) = Σ_lists 1/(K + rank_list(d))``, K=60).

The engine already has both retrieval legs at corpus scale — BM25
(stages/bm25.bm25_topk: candidate-sized exchanges, partial top-k merge)
and exact cosine (stages/similarity.brute_force_topk: per-block
argpartition partials). Hybrid search is how a real retrieval stack
serves both (the reference serves embedding search through its GraphQL
``semanticSearch``; SegmentDbConnector.py — lexical+fusion is the
standard production extension).

Scale shape: the ONLY corpus-scale work is the two scoring legs, which
keep their own distributed shapes; fusion itself touches two
``depth``-sized (id, score) lists — answer-sized by construction, like
khop_neighborhood, so it runs as a pure pandas kernel on the driver.
Nothing corpus-sized concentrates.

Determinism contract (what makes the DuckDB twin value-exact):
- each leg ranks by (score ROUNDED to 6dp DESC, id ASC) — the same
  rounded-rank discipline bm25_topk already uses internally;
- RRF contributions are 1/(K+rank) sums of ≤ n_lists doubles — with two
  lists a single IEEE addition, identical in DuckDB and numpy — rounded
  to 10dp in the output.
"""

from __future__ import annotations

import pandas as pd


def rrf_fuse(ranked: dict[str, pd.DataFrame], id_col: str, *, k: int = 10,
             rrf_k: int = 60, round_to: int = 10,
             score_round: int = 6) -> pd.DataFrame:
    """Fuse named (id, score) lists into (id, rrf_score, rank_<name>...).

    Each input frame must hold ``id_col`` and ``score``; it is re-ranked
    here by (round(score, score_round) DESC, id ASC) so rank assignment —
    not float tails — is what crosses engines. Ids absent from a list
    contribute nothing for it (the classic RRF convention); per-list
    1-based ranks are returned (0 = absent) so consumers can audit the
    fusion."""
    parts = []
    for name, df in sorted(ranked.items()):
        d = df[[id_col, "score"]].copy()
        d["score"] = d["score"].round(score_round)
        d = d.sort_values(["score", id_col], ascending=[False, True],
                          kind="stable").reset_index(drop=True)
        d[f"rank_{name}"] = d.index + 1
        d[f"__c_{name}"] = 1.0 / (rrf_k + d[f"rank_{name}"])
        parts.append(d[[id_col, f"rank_{name}", f"__c_{name}"]])
    if not parts:
        return pd.DataFrame({id_col: [], "rrf_score": []})
    out = parts[0]
    for p in parts[1:]:
        out = out.merge(p, on=id_col, how="outer")
    rank_cols = [c for c in out.columns if c.startswith("rank_")]
    c_cols = [c for c in out.columns if c.startswith("__c_")]
    out["rrf_score"] = out[c_cols].fillna(0.0).sum(axis=1).round(round_to)
    for c in rank_cols:
        out[c] = out[c].fillna(0).astype("int64")
    out = out.sort_values(["rrf_score", id_col], ascending=[False, True],
                          kind="stable").head(k)
    return out[[id_col, "rrf_score"] + sorted(rank_cols)].reset_index(drop=True)


def hybrid_search_rrf(docs, embs, *, query_terms: list[str], query_vec,
                      doc_id_col: str = "doc_id", text_col: str = "text",
                      vec_id_col: str = "vec_id", emb_col: str = "embedding",
                      k: int = 10, depth: int = 50, rrf_k: int = 60):
    """BM25 + exact-cosine hybrid search over a (docs, embeddings) pair
    sharing an id space. Runs both legs to ``depth`` distributed, fuses
    the two depth-sized lists with :func:`rrf_fuse`, returns the top-k
    (doc_id, rrf_score, rank_cosine, rank_lexical) as a pyarrow Table."""
    import pyarrow as pa

    from .bm25 import bm25_topk
    from .similarity import brute_force_topk

    lex = bm25_topk(docs, doc_id_col, text_col, query_terms,
                    k=depth).to_pandas()
    sem = brute_force_topk(embs, query_vec, depth, id_col=vec_id_col,
                           emb_col=emb_col).to_pandas()
    sem = sem.rename(columns={vec_id_col: doc_id_col})
    fused = rrf_fuse({"cosine": sem, "lexical": lex}, doc_id_col,
                     k=k, rrf_k=rrf_k)
    return pa.Table.from_pandas(fused, preserve_index=False)


def rrf_sql(bm25_inner: str, cosine_inner: str, id_col: str, *,
            k: int = 10, rrf_k: int = 60, round_to: int = 10) -> str:
    """DuckDB twin of a two-leg RRF fusion. ``bm25_inner`` /
    ``cosine_inner`` must each yield (id_col, score) rows already
    truncated to the fusion depth with 6dp-rounded scores (same rounding
    the engine ranks on)."""
    return f"""
        WITH bm AS ({bm25_inner}),
        bmr AS (
            SELECT {id_col},
                   ROW_NUMBER() OVER (ORDER BY score DESC, {id_col}) AS r
            FROM bm
        ),
        cs AS ({cosine_inner}),
        csr AS (
            SELECT {id_col},
                   ROW_NUMBER() OVER (ORDER BY score DESC, {id_col}) AS r
            FROM cs
        ),
        fused AS (
            SELECT COALESCE(bmr.{id_col}, csr.{id_col}) AS {id_col},
                   ROUND(COALESCE(1.0 / ({rrf_k} + bmr.r), 0)
                         + COALESCE(1.0 / ({rrf_k} + csr.r), 0),
                         {round_to}) AS rrf_score,
                   COALESCE(csr.r, 0) AS rank_cosine,
                   COALESCE(bmr.r, 0) AS rank_lexical
            FROM bmr FULL OUTER JOIN csr ON bmr.{id_col} = csr.{id_col}
        )
        SELECT {id_col}, rrf_score, rank_cosine, rank_lexical
        FROM fused ORDER BY rrf_score DESC, {id_col} LIMIT {k}
    """
