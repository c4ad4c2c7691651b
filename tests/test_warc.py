"""WARC crawl ingest (sources/warc): round-trip vs the parquet corpus,
Common-Crawl per-record-gzip layout, HTTP payload unwrap, record-type
filtering, language-header mapping, malformed-input errors."""

from __future__ import annotations

import pandas as pd
import pytest
import ray.data as rd

from docprocai_service_ray.sources.warc import (
    iter_warc_records,
    parse_warc_pages,
    read_pages_warc,
    write_warc,
)
from docprocai_service_ray.sources.webgen import WEB_PAGES_SCHEMA, ensure_corpus

pytestmark = pytest.mark.usefixtures("ray_session")


def _corpus_df(n=60) -> pd.DataFrame:
    d = ensure_corpus(200, 42)
    df = rd.read_parquet(d + "/web_pages").to_pandas()
    df = df.sort_values("url").head(n).reset_index(drop=True)
    # empty-string lang would round-trip as a skipped header → None
    df["lang"] = df["lang"].where(df["lang"].astype(bool), None)
    return df


def _records(df: pd.DataFrame, http_wrap=False):
    for i, r in enumerate(df.itertuples()):
        yield (r.url, r.warc_ts.isoformat() + "Z", bytes(r.html), r.lang,
               "response", http_wrap if isinstance(http_wrap, bool)
               else bool(i % 2))


def _assert_pages_match(got: pd.DataFrame, exp: pd.DataFrame):
    got = got.sort_values("url").reset_index(drop=True)
    exp = exp.sort_values("url").reset_index(drop=True)
    for col in ("url", "warc_ts", "lang"):
        pd.testing.assert_series_equal(got[col], exp[col], check_names=False)
    assert [bytes(b) for b in got["html"]] == [bytes(b) for b in exp["html"]]
    assert got["text"].isna().all()  # extraction is the pipeline's job


class TestWarcRoundTrip:
    def test_plain_and_gzip_members(self, tmp_path):
        df = _corpus_df()
        write_warc(_records(df.iloc[:30]), str(tmp_path / "a.warc"))
        write_warc(_records(df.iloc[30:]), str(tmp_path / "b.warc.gz"),
                   gzip_records=True)  # CC layout: one gzip member/record
        ds = read_pages_warc(str(tmp_path))
        assert ds.schema().names == WEB_PAGES_SCHEMA.names
        _assert_pages_match(ds.to_pandas(), df)

    def test_http_wrapped_payloads_unwrap(self, tmp_path):
        df = _corpus_df(10)
        write_warc(_records(df, http_wrap=True), str(tmp_path / "h.warc"))
        got = read_pages_warc(str(tmp_path / "h.warc")).to_pandas()
        _assert_pages_match(got, df)

    def test_whole_file_gzip(self, tmp_path):
        import gzip

        df = _corpus_df(8)
        write_warc(_records(df), str(tmp_path / "c.warc"))
        raw = (tmp_path / "c.warc").read_bytes()
        (tmp_path / "c.warc.gz").write_bytes(gzip.compress(raw))
        got = parse_warc_pages((tmp_path / "c.warc.gz").read_bytes())
        _assert_pages_match(got.to_pandas(), df)


class TestWarcSemantics:
    def test_non_content_records_skipped(self, tmp_path):
        recs = [
            ("meta:info", "2026-01-01T00:00:00Z", b"crawler config",
             None, "warcinfo", False),
            ("http://x/a", "2026-01-01T00:00:01Z", b"GET /a HTTP/1.1",
             None, "request", False),
            ("http://x/a", "2026-01-01T00:00:01Z", b"<p>A</p>",
             "en", "response", False),
            ("http://x/b", "2026-01-02T00:00:00Z", b"plain text",
             "de", "conversion", False),
        ]
        write_warc(recs, str(tmp_path / "m.warc"))
        got = parse_warc_pages((tmp_path / "m.warc").read_bytes()).to_pandas()
        assert got["url"].tolist() == ["http://x/a", "http://x/b"]
        assert got["lang"].tolist() == ["en", "de"]
        assert bytes(got["html"][1]) == b"plain text"

    def test_multivalued_language_header_takes_first(self, tmp_path):
        write_warc([("http://x/c", "2026-01-01T00:00:00Z", b"x",
                     "en,deu", "response", False)], str(tmp_path / "l.warc"))
        got = parse_warc_pages((tmp_path / "l.warc").read_bytes()).to_pandas()
        assert got["lang"].tolist() == ["en"]

    def test_timestamp_microseconds_exact(self, tmp_path):
        write_warc([("http://x/t", "2026-03-04T05:06:07.123456Z", b"x",
                     None, "response", False)], str(tmp_path / "t.warc"))
        got = parse_warc_pages((tmp_path / "t.warc").read_bytes()).to_pandas()
        assert got["warc_ts"][0] == pd.Timestamp("2026-03-04 05:06:07.123456")

    def test_binary_payload_survives(self, tmp_path):
        payload = b"\xff\xfe\x00<p>Broken</p>\x80\x81"  # not valid UTF-8
        write_warc([("http://x/bin", "2026-01-01T00:00:00Z", payload,
                     None, "response", False)], str(tmp_path / "b.warc"))
        got = parse_warc_pages((tmp_path / "b.warc").read_bytes())
        assert bytes(got["html"][0].as_py()) == payload

    def test_malformed_raises(self):
        with pytest.raises(ValueError, match="version marker"):
            list(iter_warc_records(b"NOTAWARC\r\n\r\n"))
        with pytest.raises(ValueError, match="Content-Length"):
            list(iter_warc_records(
                b"WARC/1.0\r\nWARC-Type: response\r\n\r\nbody"))


class TestWarcDrivesPipeline:
    def test_extraction_equal_to_parquet_path(self, tmp_path):
        """The same crawl via WARC and via Parquet must extract to
        IDENTICAL documents (the source-equivalence contract the JSONL
        adapter also satisfies)."""
        from docprocai_service_ray.stages.extract import extract_batch

        df = _corpus_df(40)
        write_warc(_records(df), str(tmp_path / "p.warc.gz"),
                   gzip_records=True)

        def run(ds):
            out = ds.map_batches(extract_batch, batch_format="pyarrow")
            return (out.to_pandas().sort_values("url")
                    .reset_index(drop=True))

        via_warc = run(read_pages_warc(str(tmp_path / "p.warc.gz")))
        via_pq = run(rd.from_pandas(df))
        pd.testing.assert_frame_equal(via_warc, via_pq)


class TestExportWarcRoundTrip:
    """export_warc → read_pages_warc is lossless on the real corpus
    shape, and the claimed parallelism (one parse task per archive) holds
    by construction: one archive per input block, one read block per
    archive file."""

    def test_corpus_roundtrip_and_parallelism(self, tmp_path, ray_session):
        import ray.data as rd

        from docprocai_service_ray.sources.warc import (export_warc,
                                                        read_pages_warc)
        from docprocai_service_ray.sources.webgen import ensure_corpus

        corpus = ensure_corpus(300, 42)
        pages = rd.read_parquet(corpus + "/web_pages")
        n_archives = 6
        out = str(tmp_path / "crawl")
        man = export_warc(pages.repartition(n_archives), out)
        assert len(man) == n_archives            # one archive per block
        assert int(man["n_records"].sum()) == 300

        # parse unit = whole archive: every non-empty input block of the
        # binary read holds exactly ONE file (an archive never splits
        # across tasks), so parse parallelism == archive count
        import ray as _ray

        raw = rd.read_binary_files(out).materialize()
        rows_per_block = []
        for bundle in raw.iter_internal_ref_bundles():
            for ref in bundle.block_refs:
                rows_per_block.append(
                    _ray.get(ref).num_rows
                    if hasattr(_ray.get(ref), "num_rows")
                    else len(_ray.get(ref)))
        nonempty = [r for r in rows_per_block if r]
        assert nonempty == [1] * n_archives

        back = read_pages_warc(out).materialize()

        # multiple captures per url exist — sort on (url, warc_ts)
        a = (pages.to_pandas().sort_values(["url", "warc_ts"])
             .reset_index(drop=True))
        b = (back.to_pandas().sort_values(["url", "warc_ts"])
             .reset_index(drop=True))
        # lang '' and None both round-trip as "header absent" — normalize
        a["lang"] = a["lang"].fillna("")
        b["lang"] = b["lang"].fillna("")
        for col in ("url", "warc_ts", "lang"):
            assert a[col].tolist() == b[col].tolist(), col
        assert [bytes(x or b"") for x in a["html"]] == \
            [bytes(x or b"") for x in b["html"]]

    def test_export_idempotent(self, tmp_path, ray_session):
        import os

        import ray.data as rd

        from docprocai_service_ray.sources.warc import export_warc
        from docprocai_service_ray.sources.webgen import ensure_corpus

        corpus = ensure_corpus(300, 42)
        pages = rd.read_parquet(corpus + "/web_pages").repartition(3)
        out = str(tmp_path / "crawl")
        m1 = export_warc(pages, out)
        files1 = sorted(os.listdir(out))
        m2 = export_warc(pages, out)
        assert sorted(os.listdir(out)) == files1
        assert m1["sha256"].tolist() == m2["sha256"].tolist()
