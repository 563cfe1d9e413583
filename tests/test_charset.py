"""Charset-aware transcode (text/charset.py): WHATWG-ish resolution
precedence, lenient legacy decode, UTF-8 passthrough byte-identity,
and the charset_aware path through warc_to_pages."""

from __future__ import annotations

from featurewiz_spark.text.charset import (
    detect_charset,
    transcode_one,
    transcode_to_utf8,
)


def test_detect_precedence_http_over_meta():
    head = b'<html><head><meta charset="shift_jis"></head>'
    # HTTP param wins over the meta sniff
    assert detect_charset("text/html; charset=ISO-8859-1", head) == "cp1252"
    # no HTTP param -> meta sniff
    assert detect_charset("text/html", head) == "shift_jis"
    # http-equiv style meta
    he = (
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=gb2312">'
    )
    assert detect_charset(None, he) == "gb18030"
    # nothing declared -> default
    assert detect_charset(None, b"<html><p>x</p>") == "utf-8"
    # unknown label ignored, falls through to default
    assert detect_charset("text/html; charset=bogus-enc", b"") == "utf-8"


def test_transcode_legacy_and_passthrough():
    # cp1252 page: 0xe9 is e-acute
    raw = b"<p>caf\xe9</p>"
    out, cs = transcode_one(raw, "text/html; charset=iso-8859-1")
    assert cs == "cp1252" and out == "<p>café</p>".encode()
    # utf-8 passthrough is byte-identical (no re-encode churn)
    u = "<p>naïve 😀</p>".encode()
    out, cs = transcode_one(u, "text/html; charset=utf-8")
    assert cs == "utf-8" and out is u
    # wrong declaration cannot raise: lenient replace
    out, _ = transcode_one(b"\xff\xfe<p>x</p>", "text/html; charset=shift_jis")
    assert b"<p>x</p>" in out or b"x" in out


def test_transcode_to_utf8_dataframe(spark):
    rows = [
        (1, bytearray(b"<p>caf\xe9</p>"), "text/html; charset=latin-1"),
        (2, bytearray("<p>ok</p>".encode()), "text/html"),
        (3, None, None),
    ]
    df = spark.createDataFrame(rows, "id long, html binary, content_type string")
    out = {r["id"]: r for r in transcode_to_utf8(df).collect()}
    assert bytes(out[1]["html"]) == "<p>café</p>".encode()
    assert out[1]["charset"] == "cp1252"
    assert bytes(out[2]["html"]) == b"<p>ok</p>" and out[2]["charset"] == "utf-8"
    assert out[3]["html"] is None and out[3]["charset"] is None


def test_warc_to_pages_charset_aware(spark, tmp_path):
    from featurewiz_spark.sources.warc import warc_to_pages
    from tests.test_warc import _http, _record

    html = b"<html><title>caf\xe9</title><body><p>d\xe9j\xe0 vu</p></body></html>"
    rec = _record(
        "response",
        "http://legacy.example/a",
        "2024-03-01T10:00:00Z",
        _http(html, ctype="text/html; charset=iso-8859-1"),
    )
    p = tmp_path / "legacy.warc"
    p.write_bytes(rec)
    naive = warc_to_pages(spark, str(p)).first()
    aware = warc_to_pages(spark, str(p), charset_aware=True).first()
    assert "�" in naive["text"]  # blind utf-8 read mangles it
    assert aware["text"] == "café\ndéjà vu"
