"""Registrable-domain extraction (stages/domains): PSL 2-label rule
edge cases, SQL-twin parity on adversarial hosts, rollup shape. The
sf0.01 parity of the registered ``domain_doc_counts`` query is covered
by tests/test_queries.py."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.stages.domains import (add_registrable_domain,
                                                  domain_rollup,
                                                  registrable_domain_series,
                                                  registrable_domain_sql)

pytestmark = pytest.mark.usefixtures("ray_session")

CASES = [
    ("www.example.com", "example.com"),
    ("example.com", "example.com"),
    ("a.b.c.example.org", "example.org"),
    ("blog.x.co.uk", "x.co.uk"),          # ML2 suffix → 3 labels
    ("x.co.uk", "x.co.uk"),
    ("deep.sub.x.com.au", "x.com.au"),
    ("co.uk", "co.uk"),                   # bare public suffix → itself
    ("localhost", "localhost"),           # single label → itself
    ("WWW.Upper.COM", "upper.com"),       # lowercased
    ("", ""),
    (None, ""),
]


def test_rule_cases():
    got = registrable_domain_series(pd.Series([c[0] for c in CASES])).tolist()
    assert got == [c[1] for c in CASES]


def test_sql_parity():
    hosts = pd.DataFrame({"h": [c[0] for c in CASES],
                          "k": range(len(CASES))})
    con = duckdb.connect()
    con.register("t", hosts)
    sq = con.execute(
        f"SELECT {registrable_domain_sql('h')} AS d FROM t ORDER BY k"
    ).df()["d"]
    assert sq.tolist() == [c[1] for c in CASES]


def test_rollup_counts():
    urls = ["https://blog.x.co.uk/a", "https://www.x.co.uk/b",
            "https://x.co.uk/c", "https://y.com/a", "http://sub.y.com/b",
            "HTTPS://unparsed", None]
    ds = rd.from_pandas(pd.DataFrame({"url": urls}))
    out = domain_rollup(ds, "url").to_pandas().sort_values("domain")
    got = dict(zip(out["domain"], out["n_docs"]))
    # uppercase scheme still parses (fail-closed host contract, ADVICE
    # r4); only the null url falls into the '' bucket
    assert got == {"": 1, "unparsed": 1, "x.co.uk": 3, "y.com": 2}


def test_add_column_passthrough():
    df = pd.DataFrame({"url": ["https://a.b.co.jp/x"], "v": [7]})
    out = add_registrable_domain(rd.from_pandas(df)).to_pandas()
    assert out["domain"].tolist() == ["b.co.jp"]
    assert out["v"].tolist() == [7]
