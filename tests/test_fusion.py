"""RRF hybrid search (stages/fusion.py): kernel vs hand-computed fusion,
DuckDB twin parity on a tiny corpus, absence semantics, 3-list fusion."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.fusion import (
    hybrid_search_rrf,
    rrf_fuse,
    rrf_sql,
)


class TestRRFKernel:
    def test_hand_computed(self):
        a = pd.DataFrame({"id": [1, 2, 3], "score": [0.9, 0.8, 0.7]})
        b = pd.DataFrame({"id": [2, 3, 4], "score": [10.0, 9.0, 8.0]})
        out = rrf_fuse({"a": a, "b": b}, "id", k=10)
        want = {
            1: 1 / 61,            # rank 1 in a only
            2: 1 / 62 + 1 / 61,   # rank 2 in a, rank 1 in b
            3: 1 / 63 + 1 / 62,
            4: 1 / 63,
        }
        got = dict(zip(out["id"], out["rrf_score"]))
        assert set(got) == set(want)
        for i, v in want.items():
            assert got[i] == pytest.approx(round(v, 10), abs=1e-12)
        # fused head: id 2 is in both lists near the top
        assert out["id"].iloc[0] == 2
        # per-list ranks audited, 0 = absent
        r = out.set_index("id")
        assert r.loc[1, "rank_b"] == 0 and r.loc[4, "rank_a"] == 0
        assert r.loc[2, "rank_a"] == 2 and r.loc[2, "rank_b"] == 1

    def test_rank_by_rounded_score_with_id_tiebreak(self):
        # raw scores differ past 6dp ⇒ same rounded score ⇒ id ASC order
        a = pd.DataFrame({"id": [5, 3], "score": [0.50000001, 0.50000002]})
        out = rrf_fuse({"a": a}, "id", k=2)
        r = out.set_index("id")
        assert r.loc[3, "rank_a"] == 1 and r.loc[5, "rank_a"] == 2

    def test_three_lists(self):
        dfs = {
            n: pd.DataFrame({"id": ids, "score": [3.0, 2.0, 1.0]})
            for n, ids in (("x", [1, 2, 3]), ("y", [2, 1, 3]),
                           ("z", [3, 2, 1]))
        }
        out = rrf_fuse(dfs, "id", k=3)
        # id 2 has ranks (2,1,2); ids 1 and 3 each have (1,2,3)-shaped sets
        assert out["id"].iloc[0] == 2
        assert set(out.columns) >= {"id", "rrf_score", "rank_x", "rank_y",
                                    "rank_z"}

    def test_empty(self):
        assert len(rrf_fuse({}, "id")) == 0


class TestHybridVsDuckDB:
    @pytest.fixture(scope="class")
    def corpus(self, ray_session, tmp_path_factory):
        rng = np.random.RandomState(7)
        n, dim = 120, 8
        texts = []
        for i in range(n):
            words = ["alpha", "beta", "gamma", "delta"]
            # plant the query terms with varying density
            t = " ".join(
                rng.choice(words + ["spark"] * (i % 4) + ["batch"] * (i % 3),
                           size=20)
            )
            texts.append(t)
        docs = pd.DataFrame({"doc_id": np.arange(n, dtype="int64"),
                             "text": texts})
        embs = pd.DataFrame({
            "vec_id": np.arange(n, dtype="int64"),
            "embedding": [rng.standard_normal(dim).round(4).tolist()
                          for _ in range(n)],
        })
        d = tmp_path_factory.mktemp("fusion")
        docs.to_parquet(d / "documents.parquet")
        embs.to_parquet(d / "embeddings.parquet")
        return d, docs, embs

    def test_matches_sql_twin(self, corpus):
        from docprocai_service_ray.stages.bm25 import bm25_sql

        d, docs, embs = corpus
        q = np.asarray(embs.loc[0, "embedding"], dtype=np.float64)
        docs_ds = rd.from_pandas(docs[docs.doc_id != 0]).repartition(5)
        embs_ds = rd.from_pandas(embs[embs.vec_id != 0]).repartition(5)
        got = hybrid_search_rrf(
            docs_ds, embs_ds, query_terms=["spark", "batch"], query_vec=q,
            k=10, depth=30,
        ).to_pandas()

        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')")
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet')")
        want = con.execute(rrf_sql(
            bm25_sql("(SELECT * FROM documents WHERE doc_id <> 0)",
                     "doc_id", "text", ["spark", "batch"], k=30),
            """
            SELECT e.vec_id AS doc_id,
                   ROUND(list_cosine_similarity(e.embedding, q.embedding), 6) AS score
            FROM embeddings e,
                 (SELECT embedding FROM embeddings WHERE vec_id = 0) q
            WHERE e.vec_id <> 0
            ORDER BY score DESC, doc_id LIMIT 30
            """,
            "doc_id", k=10)).df()
        pd.testing.assert_frame_equal(
            got.reset_index(drop=True).astype({"rank_cosine": "int64",
                                               "rank_lexical": "int64"}),
            want.reset_index(drop=True).astype({"rank_cosine": "int64",
                                                "rank_lexical": "int64"}),
            check_dtype=False,
        )

    def test_parallelism_invariance(self, corpus):
        _, docs, embs = corpus
        q = np.asarray(embs.loc[0, "embedding"], dtype=np.float64)
        outs = []
        for blocks in (1, 7):
            outs.append(hybrid_search_rrf(
                rd.from_pandas(docs[docs.doc_id != 0]).repartition(blocks),
                rd.from_pandas(embs[embs.vec_id != 0]).repartition(blocks),
                query_terms=["spark", "batch"], query_vec=q, k=10, depth=30,
            ).to_pandas())
        pd.testing.assert_frame_equal(outs[0], outs[1])
