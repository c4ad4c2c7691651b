"""url-dedup edge cases the synthetic corpus never produces (ADVICE r01):
an empty-text LATEST capture must drop the url (not resurrect an older
non-empty capture), warc_ts ties break by max content_hash, and full
(url, warc_ts, content_hash) ties keep exactly one copy — distributed and
oracle must agree on all three."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import ray.data as rd

from docprocai_service_ray.config import KGConfig
from docprocai_service_ray.functions.html_extract import content_hash, extract_text
from docprocai_service_ray.oracle.scalar import oracle_docs
from docprocai_service_ray.stages.extract import build_docs


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 12, minute, 0)


PAGES = [
    # url A: older capture has text, the LATEST extracts empty → url dropped
    {"url": "https://a.test/", "warc_ts": _ts(0),
     "html": b"<html><body><p>real content here</p></body></html>", "lang": "en"},
    {"url": "https://a.test/", "warc_ts": _ts(5),
     "html": b"<html><head><script>gone()</script></head></html>", "lang": "en"},
    # url B: warc_ts tie, different content → max content_hash wins
    {"url": "https://b.test/", "warc_ts": _ts(1),
     "html": b"<html><body><p>version one</p></body></html>", "lang": "en"},
    {"url": "https://b.test/", "warc_ts": _ts(1),
     "html": b"<html><body><p>version two</p></body></html>", "lang": "en"},
    # url C: byte-identical duplicate captures → exactly one row survives
    {"url": "https://c.test/", "warc_ts": _ts(2),
     "html": b"<html><body><p>identical copy</p></body></html>", "lang": "en"},
    {"url": "https://c.test/", "warc_ts": _ts(2),
     "html": b"<html><body><p>identical copy</p></body></html>", "lang": "en"},
    # url D: plain single capture
    {"url": "https://d.test/", "warc_ts": _ts(3),
     "html": b"<html><body><p>plain page</p></body></html>", "lang": "en"},
]


def _pages_ds():
    return rd.from_arrow(
        pa.table(
            {
                "url": [p["url"] for p in PAGES],
                "warc_ts": pa.array([p["warc_ts"] for p in PAGES], pa.timestamp("us")),
                "html": pa.array([p["html"] for p in PAGES], pa.binary()),
                "lang": [p["lang"] for p in PAGES],
            }
        )
    )


def test_distributed_matches_oracle_on_edge_cases():
    cfg = KGConfig()
    got = sorted(
        (
            (r["url"], r["warc_ts"], r["text"], r["content_hash"])
            for r in build_docs(_pages_ds(), cfg).take_all()
        )
    )
    want = sorted(
        (r["url"], r["warc_ts"], r["text"], r["content_hash"])
        for r in oracle_docs(PAGES, cfg)
    )
    assert got == want


def test_oracle_edge_semantics():
    cfg = KGConfig()
    docs = oracle_docs(PAGES, cfg)
    by_url = {d["url"]: d for d in docs}
    # A dropped: latest capture extracts empty
    assert "https://a.test/" not in by_url
    # B: the tie broke to the larger content_hash
    v1 = extract_text(PAGES[2]["html"])
    v2 = extract_text(PAGES[3]["html"])
    expected = v1 if content_hash(v1) > content_hash(v2) else v2
    assert by_url["https://b.test/"]["text"] == expected
    # C: exactly one copy
    assert sum(1 for d in docs if d["url"] == "https://c.test/") == 1
    assert len(docs) == 3


class TestFuzzyPairs:
    """Deletion-neighborhood fuzzy self-join (stages/dedup.fuzzy_pairs)."""

    def _run(self, strings, blocks=3):
        import pandas as pd
        import ray.data as rd

        from docprocai_service_ray.stages.dedup import fuzzy_pairs

        ds = rd.from_pandas(pd.DataFrame({"s": strings})).repartition(blocks)
        df = fuzzy_pairs(ds, "s").to_pandas()
        return {(a, b): d for a, b, d in zip(df["s1"], df["s2"], df["d"])}

    def test_substitution_insertion_deletion_found(self):
        got = self._run(["alpha", "alphb", "alpha7", "lpha", "zzzz"])
        assert got[("alpha", "alphb")] == 1   # substitution
        assert got[("alpha", "alpha7")] == 1  # insertion
        assert got[("alpha", "lpha")] == 1    # deletion
        assert ("alpha", "zzzz") not in got   # distance > 1 excluded

    def test_matches_brute_force(self):
        import itertools
        import random

        rng = random.Random(9)
        base = ["".join(rng.choice("ab") for _ in range(5)) for _ in range(60)]
        strings = sorted(set(base))
        got = set(self._run(strings, blocks=7))

        def lev(a, b):
            import numpy as np
            d = np.arange(len(b) + 1)
            for i, ca in enumerate(a, 1):
                prev, d[0] = d[0], i
                for j, cb in enumerate(b, 1):
                    prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                           prev + (ca != cb))
            return d[-1]

        want = {(a, b) for a, b in itertools.combinations(strings, 2)
                if lev(a, b) <= 1}
        assert got == want  # blocking complete AND verification exact
