"""Curation recipe (pipelines/curate.py): parity with its DuckDB twin on
synthetic corpora with planted duplicates, parallelism invariance, and the
filter→dedup→sample ordering semantics."""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_corpus(tmp_path, rows: list[dict]) -> str:
    d = str(tmp_path)
    pq.write_table(pa.Table.from_pylist(rows), os.path.join(d, "documents.parquet"))
    return d


def _good_text(i: int) -> str:
    # passes all three quality gates: 50..100k chars, some punctuation
    # under 20%, >2% English stopwords
    return (
        f"the quick brown fox {i} jumps over the lazy dog, and then "
        "it runs away to the forest. " * 3
    )


class TestCurate:
    def _rows(self):
        rows = []
        for i in range(120):
            rows.append(
                {"doc_id": i, "text": _good_text(i % 40), "lang": "en",
                 "source": "s", "n_chars": 1}
            )
        # planted: German dupes, filtered langs, garbage quality
        rows += [
            {"doc_id": 200, "text": _good_text(999), "lang": "de", "source": "s", "n_chars": 1},
            {"doc_id": 201, "text": _good_text(999), "lang": "de", "source": "s", "n_chars": 1},
            {"doc_id": 202, "text": _good_text(999), "lang": "fr", "source": "s", "n_chars": 1},
            {"doc_id": 203, "text": "short", "lang": "en", "source": "s", "n_chars": 1},
            {"doc_id": 204, "text": None, "lang": "en", "source": "s", "n_chars": 1},
        ]
        return rows

    def test_matches_sql_twin(self, ray_session, tmp_path):
        from docprocai_service_ray.pipelines.curate import (
            curated_corpus_stats,
            curation_sql,
        )

        d = _mk_corpus(tmp_path, self._rows())
        got = (
            curated_corpus_stats(d).to_pandas()
            .sort_values("lang").reset_index(drop=True)
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{os.path.join(d, 'documents.parquet')}')"
        )
        want = (
            con.execute(curation_sql()).df()
            .sort_values("lang").reset_index(drop=True)
            .astype(got.dtypes.to_dict())
        )
        pd.testing.assert_frame_equal(got, want)
        # semantics spot-checks: the 40 distinct en texts dedup 120→40
        # (before sampling), the de pair dedups to doc_id 200, fr and the
        # two garbage rows are gone
        assert got["n_docs"].sum() <= 41

    def test_dedup_keeps_min_doc_id(self, ray_session, tmp_path):
        from docprocai_service_ray.pipelines.curate import curate_documents

        d = _mk_corpus(tmp_path, self._rows())
        kept = curate_documents(d, sample_rate=1.0).to_pandas()
        en_ids = kept[kept["lang"] == "en"]["doc_id"]
        # each distinct text keeps its MIN doc_id: all en keepers are < 40
        assert (en_ids < 40).all()
        de = kept[kept["lang"] == "de"]
        assert set(de["doc_id"]) <= {200}  # 201 is the dupe, 202 is fr

    def test_parallelism_invariance(self, ray_session, tmp_path):
        from docprocai_service_ray.pipelines.curate import curate_documents

        d = _mk_corpus(tmp_path, self._rows())
        a = (
            curate_documents(d, num_partitions=2).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        b = (
            curate_documents(d, num_partitions=13).to_pandas()
            .sort_values("doc_id").reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(a, b)

    def test_sample_rate_zero_and_one(self, ray_session, tmp_path):
        from docprocai_service_ray.pipelines.curate import curate_documents

        d = _mk_corpus(tmp_path, self._rows())
        assert curate_documents(d, sample_rate=0.0).count() == 0
        full = curate_documents(d, sample_rate=1.0).count()
        half = curate_documents(d, sample_rate=0.5).count()
        assert 0 < half < full
