"""URL hygiene (stages/urltools): normalization rewrite-chain semantics,
host-blocklist matching, and RE2 parity of BOTH against DuckDB on
adversarial urls. The sf0.01 SQL parity of the registered
``normalized_urls`` / ``blocked_host_doc_counts`` queries is covered by
tests/test_queries.py."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.urltools import (blocklist_predicate_sql,
                                                   host_blocklist_filter,
                                                   normalize_url_series,
                                                   normalize_url_sql,
                                                   normalize_urls)

pytestmark = pytest.mark.usefixtures("ray_session")

CASES = [
    # fragment strip
    ("http://a.example/p#frag", "http://a.example/p"),
    # leading tracker with a survivor: separator repaired to '?'
    ("http://a.example/p?utm_source=x&id=3", "http://a.example/p?id=3"),
    # non-leading tracker: '&' consumed with the param
    ("http://a.example/p?id=3&gclid=abc", "http://a.example/p?id=3"),
    # tracker is the whole query: '?' dropped too
    ("http://a.example/p?utm_campaign=c", "http://a.example/p"),
    # multiple trackers in one query (global replace)
    ("http://a.example/?a=1&utm_term=t&b=2&fbclid=z", "http://a.example/?a=1&b=2"),
    # default ports
    ("http://a.example:80/p", "http://a.example/p"),
    ("https://a.example:443/", "https://a.example/"),
    # NON-default ports survive
    ("http://a.example:8080/p", "http://a.example:8080/p"),
    ("https://a.example:4430/p", "https://a.example:4430/p"),
    # :443 on http / :80 on https are NOT default — survive
    ("http://a.example:443/p", "http://a.example:443/p"),
    # scheme+host lowercased, path case preserved
    ("HTTP://WWW.Ex.COM/CaseY/Path", "http://www.ex.com/CaseY/Path"),
    # everything at once
    ("HTTPS://Host.Ex:443/A/B?utm_source=s&keep=1#f",
     "https://host.ex/A/B?keep=1"),
    # scheme-less and empty inputs pass through sanely
    ("no-scheme/path?utm_source=x", "no-scheme/path"),
    ("", ""),
]


def test_normalize_cases():
    urls = pd.Series([c[0] for c in CASES])
    got = normalize_url_series(urls).tolist()
    assert got == [c[1] for c in CASES]


def test_normalize_null_is_empty():
    assert normalize_url_series(pd.Series([None, "http://a.b/#x"])).tolist() == \
        ["", "http://a.b/"]


def test_normalize_sql_parity():
    """The DuckDB rewrite chain (normalize_url_sql) matches Python re on
    every case above plus idempotence (normalizing twice is a no-op)."""
    urls = pd.Series([c[0] for c in CASES])
    py = normalize_url_series(urls)
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"u": urls, "k": range(len(urls))}))
    sq = con.execute(
        f"SELECT {normalize_url_sql('u')} AS u FROM t ORDER BY k").df()["u"]
    assert py.tolist() == sq.tolist()
    assert normalize_url_series(py).tolist() == py.tolist()  # idempotent


BLOCK = ["spam.example", "Ads.Example"]
HOSTS = [
    ("http://spam.example/x", True),          # exact
    ("http://www.spam.example/x", True),      # subdomain
    ("http://a.b.spam.example/x", True),      # deep subdomain
    ("HTTP://spam.example/x", True),          # raw uppercase scheme must
    # NOT fail open (ADVICE r4: the gate holds pre-normalization)
    ("http://Spam.Example/x", True),
    ("http://u@spam.example/x", True),        # userinfo skipped, not host
    ("http://u:p@www.spam.example/x", True),
    ("http://spam.example@ok.example/x", False),  # blocked name in USERINFO
    # only — real host is ok.example, must pass
    ("http://notspam.example/x", False),      # suffix of the NAME, not a
    ("http://spam.example.org/x", False),     # subdomain / different tld
    ("https://ads.example/x", True),          # blocklist entry lowercased
    ("", False),
]


def test_blocklist_matching():
    df = pd.DataFrame({"url": [h[0] for h in HOSTS],
                       "k": range(len(HOSTS))})
    ds = rd.from_pandas(df)
    kept = host_blocklist_filter(ds, BLOCK).to_pandas()
    blocked = host_blocklist_filter(ds, BLOCK, keep_blocked=True).to_pandas()
    exp_blocked = {h[0] for h in HOSTS if h[1]}
    assert set(blocked["url"]) == exp_blocked
    assert set(kept["url"]) == {h[0] for h in HOSTS} - exp_blocked
    assert len(kept) + len(blocked) == len(HOSTS)


def test_blocklist_sql_parity():
    df = pd.DataFrame({"url": [h[0] for h in HOSTS]})
    con = duckdb.connect()
    con.register("t", df)
    got = con.execute(
        "SELECT url FROM t WHERE "
        + blocklist_predicate_sql("url", BLOCK, blocked=True)).df()
    assert set(got["url"]) == {h[0] for h in HOSTS if h[1]}
    empty = con.execute(
        "SELECT url FROM t WHERE "
        + blocklist_predicate_sql("url", [], blocked=True)).df()
    assert len(empty) == 0


def test_normalize_urls_dataset_roundtrip():
    """normalize_urls as a Dataset stage: out_col append vs in-place."""
    df = pd.DataFrame({"url": [c[0] for c in CASES[:6]], "k": range(6)})
    ds = rd.from_pandas(df)
    out = normalize_urls(ds, "url", out_col="url_norm").to_pandas()
    assert list(out.columns) == ["url", "k", "url_norm"]
    assert out.sort_values("k")["url_norm"].tolist() == \
        [c[1] for c in CASES[:6]]
    inplace = normalize_urls(ds, "url").to_pandas()
    assert inplace.sort_values("k")["url"].tolist() == \
        [c[1] for c in CASES[:6]]


class TestHostCrawlStats:
    def _pages(self):
        import datetime

        rows = [
            ("http://a.example/p1", datetime.datetime(2025, 1, 1, 10, 0, 0, 123456)),
            ("http://a.example/p2", datetime.datetime(2025, 1, 1, 12, 0, 0)),
            ("http://a.example/p3", datetime.datetime(2025, 1, 3, 9, 30, 0, 7)),
            ("https://b.example/x", datetime.datetime(2025, 2, 10, 0, 0, 0)),
            ("HTTP://A.example/up", datetime.datetime(2025, 1, 2, 1, 0, 0)),
            ("not-a-url", datetime.datetime(2025, 1, 5, 0, 0, 0)),
        ]
        return pd.DataFrame({"url": [u for u, _ in rows],
                             "warc_ts": [t for _, t in rows]})

    def test_hand_rollup(self, ray_session):
        import ray.data as rd

        from docprocai_service_ray.stages.urltools import host_crawl_stats

        got = host_crawl_stats(rd.from_pandas(self._pages()).repartition(3)
                               ).to_pandas().set_index("host")
        # a.example: 3 pages over 2025-01-01..01-03 = 2 distinct days, span 2
        a = got.loc["a.example"]
        assert (a["n_pages"], a["n_days"], a["span_days"]) == (3, 2, 2)
        assert a["first_ts"] == "2025-01-01 10:00:00.123456"
        assert a["last_ts"] == "2025-01-03 09:30:00.000007"
        # case-insensitive scheme, case-SENSITIVE host (raw crawl url)
        assert got.loc["A.example", "n_pages"] == 1
        # unparseable url rolls into the '' bucket, never dropped silently
        assert got.loc["", "n_pages"] == 1
        assert got.loc["b.example", "span_days"] == 0

    def test_matches_duckdb(self, ray_session, tmp_path):
        import duckdb
        import ray.data as rd

        from docprocai_service_ray.stages.urltools import (
            host_crawl_sql,
            host_crawl_stats,
        )

        df = self._pages()
        df.to_parquet(tmp_path / "pages.parquet")
        got = host_crawl_stats(rd.from_pandas(df).repartition(2)
                               ).to_pandas().sort_values("host").reset_index(drop=True)
        want = duckdb.connect().execute(
            host_crawl_sql(f"{tmp_path}/pages.parquet")
        ).df().sort_values("host").reset_index(drop=True)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
