"""Winnowing fingerprints (stages/winnow.py): coverage guarantee on
planted shared substrings, DuckDB twin parity, kernel edge cases, cap
behavior, parallelism invariance."""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.winnow import (
    _winnow_one,
    winnow_fingerprints,
    winnow_overlap_pairs,
    winnow_pairs_sql,
    winnow_sql,
)


class TestKernel:
    def test_brute_force_reference(self):
        rng = np.random.RandomState(5)
        for _ in range(20):
            n = rng.randint(0, 120)
            t = "".join(rng.choice(list("abcd efg"), size=n))
            k, w = 5, 7
            got = _winnow_one(t, k, w)
            grams = [hashlib.md5(t[i:i + k].encode()).hexdigest()
                     for i in range(max(0, len(t) - k + 1))]
            if not grams:
                want = [hashlib.md5(t.encode()).hexdigest()]
            elif len(grams) <= w:
                want = [min(grams)]
            else:
                want = sorted({min(grams[i:i + w])
                               for i in range(len(grams) - w + 1)})
            assert got == want

    def test_coverage_guarantee(self):
        # any shared substring of >= w+k-1 chars => shared fingerprint
        rng = np.random.RandomState(9)
        k, w = 6, 8
        shared = "THE-COMMON-SYNDICATED-SENTENCE-XYZ"  # 34 >= 13
        assert len(shared) >= w + k - 1
        a = "".join(rng.choice(list("abcdefgh "), 80)) + shared
        b = shared + "".join(rng.choice(list("ijklmnop "), 80))
        fa, fb = set(_winnow_one(a, k, w)), set(_winnow_one(b, k, w))
        assert fa & fb

    def test_tiny_and_empty(self):
        assert _winnow_one("", 8, 4) == [hashlib.md5(b"").hexdigest()]
        assert _winnow_one("abc", 8, 4) == [hashlib.md5(b"abc").hexdigest()]


class TestVsDuckDB:
    @pytest.fixture(scope="class")
    def corpus(self, ray_session, tmp_path_factory):
        rng = np.random.RandomState(3)
        words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
        shared = " the quick brown fox jumps over the lazy dog "
        texts = []
        for i in range(60):
            t = " ".join(rng.choice(words, size=rng.randint(0, 30)))
            if i % 5 == 0:
                t += shared  # planted syndicated span
            texts.append(t)
        df = pd.DataFrame({"doc_id": np.arange(60, dtype="int64"),
                           "text": texts})
        d = tmp_path_factory.mktemp("winnow")
        df.to_parquet(d / "documents.parquet")
        return d, df

    def test_fps_match_sql(self, corpus):
        d, df = corpus
        got = (winnow_fingerprints(rd.from_pandas(df).repartition(7),
                                   k=8, w=6)
               .to_pandas().sort_values(["doc_id", "fp"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = (con.execute(winnow_sql("documents", "doc_id", "text",
                                       k=8, w=6))
                .df().sort_values(["doc_id", "fp"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_pairs_match_sql_and_find_plants(self, corpus):
        d, df = corpus
        got = (winnow_overlap_pairs(rd.from_pandas(df).repartition(7),
                                    k=8, w=6, min_shared=3)
               .to_pandas().sort_values(["doc_a", "doc_b"])
               .reset_index(drop=True))
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"read_parquet('{d}/documents.parquet')")
        want = (con.execute(winnow_pairs_sql("documents", "doc_id", "text",
                                             k=8, w=6, min_shared=3))
                .df().sort_values(["doc_a", "doc_b"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(
            got.astype({"n_shared": "int64"}),
            want.astype({"n_shared": "int64"}), check_dtype=False)
        # the planted syndicated docs (every 5th) pair up
        planted = {i for i in range(60) if i % 5 == 0}
        pair_docs = set(got["doc_a"]) | set(got["doc_b"])
        assert planted <= pair_docs

    def test_parallelism_invariance(self, corpus):
        _, df = corpus
        outs = []
        for blocks in (1, 9):
            outs.append(
                winnow_overlap_pairs(rd.from_pandas(df).repartition(blocks),
                                     k=8, w=6, min_shared=3)
                .to_pandas().sort_values(["doc_a", "doc_b"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])


class TestCap:
    def test_star_cap_bounds_pairs(self, ray_session):
        # 30 identical docs share every fp; cap 5 => star edges only
        df = pd.DataFrame({"doc_id": np.arange(30, dtype="int64"),
                           "text": ["same text body here, repeated!"] * 30})
        got = winnow_overlap_pairs(rd.from_pandas(df), k=6, w=4,
                                   min_shared=1, pair_cap=5).to_pandas()
        # star on min id: every pair involves doc 0 — O(n), not O(n²)
        assert (got["doc_a"] == 0).all()
        assert len(got) == 29
