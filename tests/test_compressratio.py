"""Compression-ratio quality signal (stages/textstats.
compression_ratio_stats) — single-process mirror, signal direction,
empty handling, parallelism invariance."""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.textstats import compression_ratio_stats

pytestmark = pytest.mark.usefixtures("ray_session")

_FP = 10 ** 9


def _ref(df: pd.DataFrame, level: int = 6) -> pd.DataFrame:
    rows = {}
    for g, t in zip(df["g"], df["text"]):
        b = (t or "").encode("utf-8")
        if not b:
            continue
        r = (len(zlib.compress(b, level)) * _FP) // len(b)
        rows.setdefault(g, []).append(r)
    out = []
    for g in sorted(rows):
        v = rows[g]
        out.append({"g": g, "n_docs": len(v),
                    "mean_ratio": round(sum(v) / len(v) / _FP, 6),
                    "min_ratio": round(min(v) / _FP, 6),
                    "max_ratio": round(max(v) / _FP, 6)})
    return pd.DataFrame(out)


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(5)
    rows = []
    for i in range(60):
        rows.append({"g": "boiler", "text": "buy now " * (20 + i % 5)})
    for i in range(60):
        rows.append({"g": "prose", "text": " ".join(
            f"word{j}" for j in rng.integers(0, 500, 40 + i % 7))})
    for i in range(30):
        rows.append({"g": "noise", "text": "".join(
            chr(33 + int(c)) for c in rng.integers(0, 90, 200))})
    rows += [{"g": "prose", "text": ""}, {"g": "prose", "text": None}]
    return pd.DataFrame(rows)


def test_matches_reference_mirror(corpus):
    got = (compression_ratio_stats(rd.from_pandas(corpus), "g", "text")
           .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, _ref(corpus), check_dtype=False)


def test_signal_direction(corpus):
    out = (compression_ratio_stats(rd.from_pandas(corpus), "g", "text")
           .to_pandas().set_index("g"))
    # templated boilerplate compresses hardest, random noise least
    assert out.loc["boiler", "mean_ratio"] < out.loc["prose", "mean_ratio"]
    assert out.loc["prose", "mean_ratio"] < out.loc["noise", "mean_ratio"]
    # empty/None docs excluded from the count
    assert out.loc["prose", "n_docs"] == 60


def test_parallelism_invariance(corpus):
    outs = [
        (compression_ratio_stats(rd.from_pandas(corpus).repartition(p),
                                 "g", "text")
         .to_pandas().sort_values("g").reset_index(drop=True))
        for p in (1, 9)
    ]
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_all_empty_group_batches_keep_schema():
    df = pd.DataFrame({"g": ["a", "b"], "text": ["", None]})
    out = (compression_ratio_stats(rd.from_pandas(df), "g", "text")
           .to_pandas())
    assert len(out) == 0
    # an ALL-empty dataset collapses to Ray's column-less empty block;
    # any surviving columns must be the contract ones (mixed empty +
    # non-empty blocks are covered by the mirror test's empty rows)
    assert list(out.columns) in (
        [], ["g", "n_docs", "mean_ratio", "min_ratio", "max_ratio"])
