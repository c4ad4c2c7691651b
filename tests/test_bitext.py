"""Margin-based bitext mining (stages/bitext.py): brute numpy reference,
DuckDB twin parity (both mutual modes), planted-translation recovery,
neighborhood caps, parallelism invariance."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.bitext import (
    _SCALE,
    bitext_margin_pairs,
    bitext_sql,
)


def _brute(src: pd.DataFrame, tgt: pd.DataFrame, k: int,
           threshold: float, mutual: bool) -> pd.DataFrame:
    s = np.asarray(src["embedding"].tolist(), dtype=np.float64)
    t = np.asarray(tgt["embedding"].tolist(), dtype=np.float64)
    s = s / np.linalg.norm(s, axis=1, keepdims=True)
    t = t / np.linalg.norm(t, axis=1, keepdims=True)
    ci = np.floor((t @ s.T) * _SCALE + 0.5).astype(np.int64)  # (nt, ns)
    sid, tid = src["vec_id"].to_numpy(), tgt["vec_id"].to_numpy()
    rows = []
    for yi in range(len(t)):
        forder = np.argsort(-ci[yi], kind="stable")
        best = forder[0]
        kf = min(k, len(s))
        sum_f = int(ci[yi, forder[:kf]].sum())
        border = np.argsort(-ci[:, best], kind="stable")
        kb = min(k, len(t))
        sum_b = int(ci[border[:kb], best].sum())
        margin = np.floor(2.0 * ci[yi, best] * kf * kb
                          / (sum_f * kb + sum_b * kf) * 1e6 + 0.5) / 1e6
        if margin < threshold:
            continue
        if mutual and border[0] != yi:
            continue
        rows.append((sid[best], tid[yi], ci[yi, best] / _SCALE, margin))
    return pd.DataFrame(rows, columns=["src_id", "tgt_id", "cos", "margin"])


def _mk(rng, n, dim, start_id):
    return pd.DataFrame({
        "vec_id": np.arange(start_id, start_id + n, dtype="int64"),
        "embedding": [rng.standard_normal(dim).round(3).tolist()
                      for _ in range(n)],
    })


class TestBitext:
    @pytest.fixture(scope="class")
    def sides(self, ray_session):
        rng = np.random.RandomState(17)
        src = _mk(rng, 40, 8, 0)
        tgt = _mk(rng, 70, 8, 1000)
        # plant 5 true translations: near-identical vectors
        for i in range(5):
            v = np.asarray(src.loc[i, "embedding"]) + rng.standard_normal(8) * 0.01
            tgt.at[i, "embedding"] = v.round(3).tolist()
        return src, tgt

    @pytest.mark.parametrize("mutual", [False, True])
    def test_matches_brute_reference(self, sides, mutual):
        src, tgt = sides
        got = bitext_margin_pairs(
            rd.from_pandas(src).repartition(3),
            rd.from_pandas(tgt).repartition(6),
            k=4, margin_threshold=1.0, mutual=mutual,
        ).to_pandas().sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
        want = _brute(src, tgt, 4, 1.0, mutual).sort_values(
            ["src_id", "tgt_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_planted_translations_mined(self, sides):
        src, tgt = sides
        got = bitext_margin_pairs(
            rd.from_pandas(src), rd.from_pandas(tgt),
            k=4, margin_threshold=1.05, mutual=True,
        ).to_pandas()
        mined = set(zip(got["src_id"], got["tgt_id"]))
        assert {(i, 1000 + i) for i in range(5)} <= mined

    def test_matches_duckdb_twin(self, sides, tmp_path):
        src, tgt = sides
        both = pd.concat([src.assign(label=1), tgt.assign(label=2)])
        both.to_parquet(tmp_path / "embeddings.parquet")
        got = bitext_margin_pairs(
            rd.from_pandas(src).repartition(4), rd.from_pandas(tgt).repartition(4),
            k=3, margin_threshold=1.0, mutual=True,
        ).to_pandas().sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/embeddings.parquet')")
        want = con.execute(bitext_sql(
            "SELECT vec_id AS id, embedding FROM embeddings WHERE label = 1",
            "SELECT vec_id AS id, embedding FROM embeddings WHERE label = 2",
            k=3, margin_threshold=1.0, mutual=True,
        )).df().sort_values(["src_id", "tgt_id"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_k_exceeds_side_sizes(self, ray_session):
        rng = np.random.RandomState(1)
        src, tgt = _mk(rng, 2, 4, 0), _mk(rng, 3, 4, 100)
        got = bitext_margin_pairs(
            rd.from_pandas(src), rd.from_pandas(tgt),
            k=10, margin_threshold=0.0,
        ).to_pandas()
        want = _brute(src, tgt, 10, 0.0, False)
        assert len(got) == len(want) == 3

    def test_parallelism_invariance(self, sides):
        src, tgt = sides
        outs = []
        for b in (1, 9):
            outs.append(bitext_margin_pairs(
                rd.from_pandas(src).repartition(max(1, b // 2)),
                rd.from_pandas(tgt).repartition(b),
                k=4, margin_threshold=1.0, mutual=True,
            ).to_pandas().sort_values(["src_id", "tgt_id"])
                .reset_index(drop=True))
        pd.testing.assert_frame_equal(outs[0], outs[1])

    def test_empty_source(self, ray_session):
        rng = np.random.RandomState(1)
        tgt = _mk(rng, 3, 4, 100)
        src = _mk(rng, 0, 4, 0)
        assert bitext_margin_pairs(
            rd.from_pandas(pd.DataFrame({"vec_id": pd.Series([], dtype="int64"),
                                         "embedding": pd.Series([], dtype=object)})),
            rd.from_pandas(tgt), k=2).count() == 0
