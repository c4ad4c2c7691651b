"""Per-doc TF-IDF top terms (stages/tfidf.py): known-answer ranking,
parallelism invariance, forced shuffle-tier idf join parity.
(The sf0.01 SQL-oracle comparison runs in test_queries.py via the
auto-parameterized oracle_sql() sweep.)"""

from __future__ import annotations

import pandas as pd
import ray.data as rd


def _docs():
    # 'zebra' appears in one doc only (max idf); 'the' in all (idf=ln(1)=0)
    return pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": [
                "the zebra zebra runs the plain",
                "the lion sleeps the night the lion",
                "the river bends the river flows",
                "the the the the",
            ],
        }
    )


class TestDocTopTerms:
    def test_known_ranking(self, ray_session):
        from docprocai_service_ray.stages.tfidf import doc_top_terms

        out = (
            doc_top_terms(rd.from_pandas(_docs()), "doc_id", "text", 2)
            .to_pandas()
            .sort_values(["doc_id", "rank"])
            .reset_index(drop=True)
        )
        d1 = out[out["doc_id"] == 1]
        assert list(d1["term"]) == ["zebra", "plain"]  # tf=2·ln4 beats tf=1·ln4
        assert list(d1["tf"]) == [2, 1]
        d4 = out[out["doc_id"] == 4]
        # doc 4 has only 'the' (idf=0 → score 0); still ranked, rank 1 only
        assert list(d4["term"]) == ["the"] and list(d4["rank"]) == [1]

    def test_parallelism_invariance(self, ray_session):
        from docprocai_service_ray.stages.tfidf import doc_top_terms

        docs = pd.concat([_docs()] * 6, ignore_index=True)
        docs["doc_id"] = range(len(docs))
        outs = []
        for parts in (1, 7):
            outs.append(
                doc_top_terms(
                    rd.from_pandas(docs).repartition(parts), "doc_id", "text", 3
                )
                .to_pandas()
                .sort_values(["doc_id", "rank"])
                .reset_index(drop=True)
            )
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_forced_shuffle_idf_join_parity(self, ray_session, monkeypatch):
        """The idf join must yield identical output when its broadcast gate
        is forced shut (the corpus-vocab scale path)."""
        import docprocai_service_ray.state.joins as joins
        from docprocai_service_ray.stages.tfidf import doc_top_terms

        base = (
            doc_top_terms(rd.from_pandas(_docs()), "doc_id", "text", 2)
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        )
        real_hash_join = joins.hash_join

        def forced(left, right, on, **kw):
            kw["strategy"] = "shuffle"
            return real_hash_join(left, right, on, **kw)

        monkeypatch.setattr(joins, "hash_join", forced)
        forced_out = (
            doc_top_terms(rd.from_pandas(_docs()), "doc_id", "text", 2)
            .to_pandas().sort_values(["doc_id", "rank"]).reset_index(drop=True)
        )
        # the shuffle tier's unioned schema turns pass-through columns
        # object-typed — values must match exactly, dtypes may not
        pd.testing.assert_frame_equal(base, forced_out, check_dtype=False)
