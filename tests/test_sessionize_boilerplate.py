"""Row-level sessionize (stages/windows.py) and boilerplate_stats
(stages/textstats.py) edge semantics; sf0.01 SQL parity runs via
tests/test_queries.py."""

from __future__ import annotations

import pandas as pd
import ray.data as rd

from docprocai_service_ray.stages.textstats import boilerplate_stats
from docprocai_service_ray.stages.windows import sessionize


def _ds(df, blocks=3):
    return rd.from_pandas(df).repartition(blocks)


class TestSessionize:
    def test_gap_boundary_and_ordinals(self):
        t0 = pd.Timestamp("2025-01-01 00:00:00")
        df = pd.DataFrame({
            "event_id": [1, 2, 3, 4, 5],
            "user_id": [7, 7, 7, 7, 9],
            "ts": [t0, t0 + pd.Timedelta(minutes=30),      # exactly 30m: same session
                   t0 + pd.Timedelta(minutes=61),          # >30m gap: new session
                   t0 + pd.Timedelta(minutes=62), t0],
        })
        got = sessionize(_ds(df), gap_minutes=30).to_pandas()
        seq = dict(zip(got["event_id"], got["session_seq"]))
        assert seq == {1: 1, 2: 1, 3: 2, 4: 2, 5: 1}

    def test_parallelism_invariant(self):
        import numpy as np

        rng = np.random.RandomState(5)
        df = pd.DataFrame({
            "event_id": np.arange(2000, dtype="int64"),
            "user_id": rng.randint(0, 20, 2000).astype("int64"),
            "ts": pd.Timestamp("2025-01-01")
            + pd.to_timedelta(rng.randint(0, 10**6, 2000), unit="s"),
        })
        a = sessionize(_ds(df, 1)).to_pandas().sort_values("event_id")
        b = sessionize(_ds(df, 17)).to_pandas().sort_values("event_id")
        assert a["session_seq"].tolist() == b["session_seq"].tolist()


class TestBoilerplate:
    def test_shared_sentence_flagged(self):
        shared = "this sentence is shared across both documents verbatim"
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "source": ["s", "s", "s"],
            "text": [
                f"{shared}. unique sentence number one for doc a.",
                f"{shared}. a different unique sentence for doc b.",
                "totally original content with no duplication at all.",
            ],
        })
        got = boilerplate_stats(_ds(df), "doc_id", "text", "source").to_pandas()
        assert got["n_docs"].iloc[0] == 3
        # docs 1 and 2: 1 of 2 sentences duplicated; doc 3: 0 of 1
        # output is rounded to 4 dp
        assert abs(got["avg_dup_ratio"].iloc[0] - (0.5 + 0.5 + 0.0) / 3) < 1e-4

    def test_short_and_empty_docs_excluded(self):
        df = pd.DataFrame({
            "doc_id": [1, 2, 3],
            "source": ["s", "s", "s"],
            "text": ["tiny. bits.", None,
                     "one qualifying sentence that is long enough to count."],
        })
        got = boilerplate_stats(_ds(df), "doc_id", "text", "source").to_pandas()
        assert got["n_docs"].iloc[0] == 1  # only doc 3 qualifies
