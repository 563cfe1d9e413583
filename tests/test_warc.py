"""WARC ingestion (sources/warc.py): stdlib record parser, gzip
members, HTTP payload stripping + dechunking, strict/lenient truncation
contract, and the warc_to_pages composition onto the canonical schema."""

from __future__ import annotations

import gzip
import io

import pytest

from featurewiz_spark.sources.warc import (
    _dechunk,
    iter_warc_records,
    read_warc,
    warc_to_pages,
)
from featurewiz_spark.text.extract import extract_one


def _record(rtype: str, uri: str | None, date: str, block: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {rtype}", f"WARC-Date: {date}"]
    if uri:
        head.append(f"WARC-Target-URI: {uri}")
    head.append(f"WARC-Record-ID: <urn:uuid:{rtype}-{len(block)}>")
    head.append(f"Content-Length: {len(block)}")
    return "\r\n".join(head).encode() + b"\r\n\r\n" + block + b"\r\n\r\n"


def _http(body: bytes, ctype: str = "text/html; charset=utf-8") -> bytes:
    return (
        b"HTTP/1.1 200 OK\r\nContent-Type: "
        + ctype.encode()
        + b"\r\nContent-Length: "
        + str(len(body)).encode()
        + b"\r\n\r\n"
        + body
    )


HTML1 = b"<html><title>T1</title><body><p>hello&amp;world</p></body></html>"
HTML2 = b"<html><body><div>zwei  seiten</div></body></html>"


def _warc_bytes() -> bytes:
    return (
        _record("warcinfo", None, "2024-03-01T00:00:00Z", b"software: test\r\n")
        + _record(
            "request",
            "http://a.example/x",
            "2024-03-01T10:00:00Z",
            b"GET /x HTTP/1.1\r\n\r\n",
        )
        + _record(
            "response", "http://a.example/x", "2024-03-01T10:00:00Z", _http(HTML1)
        )
        + _record(
            "resource",
            "http://b.example/raw.html",
            "2024-03-02T11:30:00.123Z",
            HTML2,
        )
    )


def test_iter_warc_records_stream():
    recs = list(iter_warc_records(io.BytesIO(_warc_bytes())))
    assert [r["headers"]["warc-type"] for r in recs] == [
        "warcinfo",
        "request",
        "response",
        "resource",
    ]
    assert recs[2]["block"].startswith(b"HTTP/1.1 200")


def test_iter_warc_truncated_lenient_and_strict():
    data = _warc_bytes()[:-30]  # cut into the last record's payload
    recs = list(iter_warc_records(io.BytesIO(data)))
    assert len(recs) == 3  # truncated tail dropped, no raise
    with pytest.raises(ValueError, match="EOF inside WARC payload"):
        list(iter_warc_records(io.BytesIO(data), strict=True))


def test_folded_warc_header_and_bare_lf_http():
    from featurewiz_spark.sources.warc import _split_http_payload

    # RFC header folding: continuation line joins the previous value
    block = b"payload"
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://x.example/very\r\n\t/long/path\r\n"
        b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
        + block + b"\r\n\r\n"
    )
    r = next(iter_warc_records(io.BytesIO(rec)))
    assert r["headers"]["warc-target-uri"] == "http://x.example/very /long/path"

    # bare-LF HTTP headers (non-compliant server captured raw)
    body, ctype, status = _split_http_payload(
        b"HTTP/1.0 200 OK\nContent-Type: text/html\n\n<p>x</p>"
    )
    assert body == b"<p>x</p>" and ctype == "text/html" and status == 200
    # compliant CRLF headers, body containing LFLF: split at CRLFCRLF
    body, _, status = _split_http_payload(
        b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\na\n\nb"
    )
    assert body == b"a\n\nb" and status == 404
    # bare-LF headers, body containing CRLFCRLF: split at the earlier LFLF
    body, _, _ = _split_http_payload(
        b"HTTP/1.0 200 OK\nContent-Type: text/html\n\nc\r\n\r\nd"
    )
    assert body == b"c\r\n\r\nd"


def test_dechunk():
    body = b"5\r\nhello\r\n6\r\n world\r\n0\r\n\r\n"
    assert _dechunk(body) == b"hello world"
    assert _dechunk(b"not chunked at all") == b"not chunked at all"


def test_read_warc_plain_and_gz_members(spark, tmp_path):
    p1 = tmp_path / "a.warc"
    p1.write_bytes(_warc_bytes())
    # gz with TWO members (Common Crawl writes one member per record)
    p2 = tmp_path / "b.warc.gz"
    m1 = gzip.compress(
        _record(
            "response",
            "http://c.example/y",
            "2024-03-03T09:00:00Z",
            _http(HTML2),
        )
    )
    chunked = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n"
        b"5\r\n<p>ab\r\n4\r\n</p>\r\n0\r\n\r\n"
    )
    m2 = gzip.compress(
        _record("response", "http://c.example/z", "2024-03-03T09:05:00Z", chunked)
    )
    p2.write_bytes(m1 + m2)

    df = read_warc(spark, str(tmp_path)).orderBy("url")
    rows = {r["url"]: r for r in df.collect()}
    # request/warcinfo filtered by default record_types
    assert set(rows) == {
        "http://a.example/x",
        "http://b.example/raw.html",
        "http://c.example/y",
        "http://c.example/z",
    }
    a = rows["http://a.example/x"]
    assert bytes(a["html"]) == HTML1  # HTTP headers stripped
    assert a["content_type"].startswith("text/html")
    assert a["http_status"] == 200
    assert rows["http://b.example/raw.html"]["http_status"] is None  # resource
    assert a["warc_ts"].isoformat() == "2024-03-01T10:00:00"
    assert bytes(rows["http://b.example/raw.html"]["html"]) == HTML2
    assert bytes(rows["http://c.example/z"]["html"]) == b"<p>ab</p>"  # dechunked
    assert rows["http://c.example/y"]["source_file"].endswith("b.warc.gz")


def test_read_wet_conversion_records(spark, tmp_path):
    """Common Crawl .wet sidecars are WARC files of `conversion`
    records (pre-extracted text/plain) — read_warc ingests them with
    the default record_types, payload passed through verbatim."""
    wet = _record(
        "conversion",
        "http://a.example/x",
        "2024-03-01T10:00:00Z",
        "already extracted text\nsecond line".encode(),
    )
    p = tmp_path / "a.warc.wet.gz"
    p.write_bytes(gzip.compress(wet))
    df = read_warc(spark, str(p))
    r = df.first()
    assert r["warc_type"] == "conversion"
    assert bytes(r["html"]) == b"already extracted text\nsecond line"


def test_stream_warc_matches_batch(spark, tmp_path):
    """availableNow streaming run over a landing dir equals the batch
    reader record-for-record (url, payload md5, length, type)."""
    from featurewiz_spark.streaming.stream_warc import stream_warc

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.warc").write_bytes(_warc_bytes())
    (landing / "b.warc.gz").write_bytes(
        gzip.compress(
            _record(
                "response",
                "http://c.example/y",
                "2024-03-03T09:00:00Z",
                _http(HTML2),
            )
        )
    )

    def canon(df):
        from pyspark.sql import functions as F

        return sorted(
            (r["url"], r["m"], r["content_length"], r["warc_type"])
            for r in df.select(
                "url",
                F.md5("html").alias("m"),
                "content_length",
                "warc_type",
            ).collect()
        )

    q = (
        stream_warc(spark, str(landing))
        .writeStream.format("memory")
        .queryName("warc_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = canon(spark.sql("select * from warc_stream_t"))
    want = canon(read_warc(spark, str(landing)))
    assert got == want and len(got) == 3


def test_stream_warc_pages_exactly_once_resume(spark, tmp_path):
    """Checkpointed availableNow runs: a second trigger after a new
    segment lands processes ONLY the new file — no re-ingestion."""
    from featurewiz_spark.streaming.stream_warc import stream_warc_pages

    landing = tmp_path / "landing"
    landing.mkdir()
    out = str(tmp_path / "pages_out")
    ckpt = str(tmp_path / "ckpt")
    (landing / "seg0.warc").write_bytes(
        _record(
            "response", "http://a.example/x", "2024-03-01T10:00:00Z", _http(HTML1)
        )
    )

    def run_once():
        q = (
            stream_warc_pages(spark, str(landing))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    assert spark.read.parquet(out).count() == 1
    (landing / "seg1.warc").write_bytes(
        _record(
            "response", "http://b.example/y", "2024-03-02T10:00:00Z", _http(HTML2)
        )
    )
    run_once()
    df = spark.read.parquet(out)
    assert df.count() == 2  # seg0 NOT re-ingested
    assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
    texts = {r["url"]: r["text"] for r in df.collect()}
    assert texts["http://a.example/x"] == extract_one(HTML1)


def test_read_warc_uri_scheme_via_pyarrow_fs(spark, tmp_path):
    """file:// URIs exercise the pyarrow.fs route (the same code path
    as s3://, gs://, hdfs://): listing, raw open (no pyarrow
    auto-decompress — stdlib gzip keeps multi-member semantics)."""
    (tmp_path / "a.warc").write_bytes(_warc_bytes())
    (tmp_path / "b.warc.gz").write_bytes(
        gzip.compress(
            _record(
                "response",
                "http://c.example/y",
                "2024-03-03T09:00:00Z",
                _http(HTML2),
            )
        )
    )
    df = read_warc(spark, f"file://{tmp_path}")
    urls = {r["url"] for r in df.collect()}
    assert urls == {
        "http://a.example/x",
        "http://b.example/raw.html",
        "http://c.example/y",
    }


def test_write_warc_roundtrip(spark, tmp_path):
    """Archive symmetry: pages → write_warc (per-record gzip members,
    locators recorded at write time) → byte-range re-fetch via the
    returned locators → exact payloads; and the segments are plain
    read_warc-able files."""
    import pandas as pd

    from featurewiz_spark.sources.cdx import fetch_warc_records
    from featurewiz_spark.sources.warc import write_warc

    rows = [
        (f"https://w.example/p{i}",
         (pd.Timestamp("2024-03-01T10:00:00")
          + pd.Timedelta(minutes=i)).to_pydatetime(),
         bytearray(f"<p>page {i} body</p>".encode()))
        for i in range(20)
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).repartition(3)
    out = tmp_path / "export"
    out.mkdir()
    locs = write_warc(pages, str(out)).persist()
    assert locs.count() == 20
    assert locs.select("filename").distinct().count() == 3  # one per task

    # selective re-fetch through the recorded locators
    fetched = fetch_warc_records(
        locs.where("offset > 0"), base_dir=str(out)
    )
    got = {r["url"]: bytes(r["html"]) for r in fetched.collect()}
    want = {u: bytes(h) for u, _, h in rows}
    assert 0 < len(got) < 20  # a real subset (offset>0 skips firsts)
    for url, html in got.items():
        assert html == want[url]

    # the segments are also plain full-scan readable
    all_back = read_warc(spark, str(out))
    assert all_back.count() == 20
    r0 = all_back.where("url = 'https://w.example/p7'").first()
    assert bytes(r0["html"]) == want["https://w.example/p7"]
    assert r0["warc_ts"] == rows[7][1]
    locs.unpersist()


def test_warc_to_pages_canonical_schema(spark, tmp_path):
    p = tmp_path / "a.warc"
    p.write_bytes(_warc_bytes())
    pages = warc_to_pages(spark, str(p))
    assert pages.columns == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r["url"]: r for r in pages.collect()}
    # resource record has no HTTP content-type -> dropped by html_only
    assert set(rows) == {"http://a.example/x"}
    r = rows["http://a.example/x"]
    # pinned extractor byte-identity vs the Python oracle
    assert r["text"] == extract_one(HTML1) == "T1\nhello&world"
    assert r["lang"] is not None
