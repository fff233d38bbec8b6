"""WARC/WET source tests over deterministic in-test archives.

Archives are byte-built to the public WARC 1.0 grammar (ISO 28500:
``WARC/1.0`` version line, ``Name: value`` headers, CRLFCRLF, payload of
``Content-Length`` bytes, CRLFCRLF record separator), gzipped per member
like real crawl files — no external data.
"""

import gzip

import pytest

from simpl_schema_spark.warc import (
    iter_warc_records,
    read_warc,
    read_wet,
    warc_to_documents,
)


def _record(rtype, url, date, payload: bytes, extra=()):
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Record-ID: <urn:uuid:" + url.encode() + b">",
        b"WARC-Date: " + date.encode(),
    ]
    if url:
        head.append(b"WARC-Target-URI: " + url.encode())
    head.extend(extra)
    head.append(b"Content-Length: " + str(len(payload)).encode())
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def _http_response(body: bytes, ctype=b"text/html"):
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: " + ctype
        + b"\r\nServer: t\r\n\r\n" + body
    )


def _warc_bytes():
    r1 = _record(
        "response",
        "http://a.example/page1",
        "2017-01-01T00:00:00Z",
        _http_response(b"<html><body>Page one</body></html>"),
        extra=[b"Content-Type: application/http; msgtype=response"],
    )
    req = _record(
        "request",
        "http://a.example/page1",
        "2017-01-01T00:00:00Z",
        b"GET /page1 HTTP/1.1\r\n\r\n",
        extra=[b"Content-Type: application/http; msgtype=request"],
    )
    r2 = _record(
        "response",
        "http://b.example/page2",
        "2017-01-02T03:04:05Z",
        _http_response(b"<html>Page two</html>"),
        extra=[b"Content-Type: application/http; msgtype=response"],
    )
    return r1 + req + r2


def _wet_bytes():
    info = _record("warcinfo", "", "2017-01-01T00:00:00Z", b"software: test")
    c1 = _record(
        "conversion",
        "http://a.example/page1",
        "2017-01-01T00:00:00Z",
        "Page one text é".encode("utf-8"),
        extra=[b"Content-Type: text/plain"],
    )
    c2 = _record(
        "conversion",
        "http://b.example/page2",
        "2017-01-02T03:04:05Z",
        b"Page two text",
        extra=[b"Content-Type: text/plain"],
    )
    return info + c1 + c2


@pytest.fixture(scope="module")
def archive_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    # member-per-record gzip, like real crawl packaging
    wet_members = b""
    for rec in (_wet_bytes(),):
        wet_members += gzip.compress(rec, mtime=0)
    (d / "seg-00000.warc.gz").write_bytes(gzip.compress(_warc_bytes(), mtime=0))
    (d / "seg-00000.wet.gz").write_bytes(wet_members)
    return str(d)


class TestIterRecords:
    def test_parses_all_records(self):
        recs = list(iter_warc_records(_warc_bytes()))
        assert [r["headers"]["warc-type"] for r in recs] == [
            "response", "request", "response",
        ]
        assert all(r["error"] is None for r in recs)

    def test_bad_record_costs_one_row_not_the_file(self):
        blob = _warc_bytes() + b"GARBAGE NOT A RECORD\r\n" + _record(
            "response", "http://c.example/x", "2017-01-03T00:00:00Z", b"HTTP/1.1 200 OK\r\n\r\nok",
            extra=[b"Content-Type: application/http; msgtype=response"],
        )
        recs = list(iter_warc_records(blob))
        errors = [r for r in recs if r.get("error")]
        good = [r for r in recs if not r.get("error")]
        assert len(errors) == 1
        assert [r["headers"]["warc-target-uri"] for r in good][-1] == (
            "http://c.example/x"
        )

    def test_missing_content_length_resyncs(self):
        bad = b"WARC/1.0\r\nWARC-Type: response\r\n\r\npayload\r\n\r\n"
        blob = bad + _wet_bytes()
        recs = list(iter_warc_records(blob))
        assert recs[0]["error"] and "Content-Length" in recs[0]["error"]
        assert sum(1 for r in recs if not r.get("error")) == 3


class TestReadWarc:
    def test_response_records_with_http_split(self, spark, archive_dir):
        df = read_warc(spark, archive_dir, path_glob="*.warc.gz")
        rows = {r.url: r for r in df.collect()}
        assert set(rows) == {
            "http://a.example/page1", "http://b.example/page2",
        }
        r = rows["http://a.example/page1"]
        assert r.record_type == "response"
        assert r.http_status == 200
        assert r.http_content_type == "text/html"
        assert bytes(r.payload) == b"<html><body>Page one</body></html>"
        assert r.warc_ts.isoformat() == "2017-01-01T00:00:00"
        assert r.error is None

    def test_all_record_types_when_unfiltered(self, spark, archive_dir):
        df = read_warc(
            spark, archive_dir, record_types=None, path_glob="*.warc.gz"
        )
        assert df.count() == 3  # 2 responses + 1 request

    def test_wet_conversion_text(self, spark, archive_dir):
        df = read_wet(spark, archive_dir, path_glob="*.wet.gz")
        rows = {r.url: r for r in df.collect()}
        assert set(rows) == {
            "http://a.example/page1", "http://b.example/page2",
        }
        assert rows["http://a.example/page1"].text == "Page one text é"

    def test_documents_shape(self, spark, archive_dir):
        docs = warc_to_documents(
            read_warc(spark, archive_dir, path_glob="*.warc.gz")
        )
        assert [f.name for f in docs.schema.fields] == [
            "url", "warc_ts", "html", "text", "lang",
        ]
        rows = {r.url: r for r in docs.collect()}
        assert bytes(rows["http://b.example/page2"].html) == b"<html>Page two</html>"
        assert rows["http://b.example/page2"].lang is None

    def test_corrupt_gzip_skip_policy(self, spark, tmp_path):
        p = tmp_path / "bad"
        p.mkdir()
        (p / "x.warc.gz").write_bytes(b"\x1f\x8b not really gzip")
        df = read_warc(spark, str(p))
        rows = df.collect()
        assert len(rows) == 1 and rows[0].error.startswith("gzip:")
        with pytest.raises(Exception):
            read_warc(spark, str(p), on_error="raise").collect()
