"""SQ8 quantized search (stages/quantize): quantization round-trip
error bound, prefilter recall measured against exact brute force,
end-to-end top-k equality at sane rerank factors, parallelism
invariance. The registered ``ann_quantized_topk`` golden at sf0.01 is
covered by tests/test_queries.py."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.quantize import (quantize_embeddings,
                                                   quantized_topk)
from docprocai_service_ray.stages.similarity import brute_force_topk

pytestmark = pytest.mark.usefixtures("ray_session")


def _embs(n: int = 400, d: int = 32, seed: int = 9) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    return pd.DataFrame({
        "vec_id": np.arange(n, dtype="int64"),
        "embedding": [list(v) for v in
                      rng.normal(0, 1, (n, d)).astype(np.float64)],
    })


def test_quantization_error_bound():
    df = _embs(50)
    out = quantize_embeddings(rd.from_pandas(df), "vec_id",
                              "embedding").to_pandas()
    for codes, scale, orig in zip(out["codes"], out["scale"],
                                  df["embedding"]):
        rec = np.frombuffer(codes, dtype=np.int8).astype(np.float64) * scale
        # symmetric SQ8: per-element error ≤ scale/2
        assert np.abs(rec - np.asarray(orig)).max() <= scale / 2 + 1e-12


def test_topk_matches_exact():
    df = _embs()
    q = np.asarray(df["embedding"][7])  # a real corpus vector as query
    exact = (brute_force_topk(rd.from_pandas(df), q, 10)
             .to_pandas().reset_index(drop=True))
    quant = (quantized_topk(rd.from_pandas(df).repartition(4), q, 10,
                            rerank_factor=4)
             .to_pandas().reset_index(drop=True))
    assert quant["vec_id"].tolist() == exact["vec_id"].tolist()
    # scores are full-precision (re-ranked), equal to 6dp
    assert np.allclose(quant["score"], exact["score"].round(6), atol=1e-6)


def test_prefilter_recall():
    """Measured, not assumed: at rerank_factor=1 (pure quantized
    ranking, no safety margin) recall@10 vs exact must still be high —
    SQ8 distortion is small."""
    df = _embs(600)
    rng = np.random.default_rng(3)
    hits = 0
    for _ in range(5):
        q = rng.normal(0, 1, 32)
        exact = set(brute_force_topk(rd.from_pandas(df), q, 10)
                    .to_pandas()["vec_id"])
        quant = set(quantized_topk(rd.from_pandas(df), q, 10,
                                   rerank_factor=1)
                    .to_pandas()["vec_id"])
        hits += len(exact & quant)
    assert hits / 50 >= 0.9


def test_parallelism_invariance():
    df = _embs()
    q = np.asarray(df["embedding"][0])
    ref = None
    for parts in (1, 6):
        out = (quantized_topk(rd.from_pandas(df).repartition(parts), q, 8)
               .to_pandas().reset_index(drop=True))
        if ref is None:
            ref = out
        else:
            pd.testing.assert_frame_equal(out, ref)
