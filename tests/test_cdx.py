"""CDX index reader (sources/cdx.py): line parse, casts, malformed
lines, and the generated DuckDB mirror."""

from __future__ import annotations

import duckdb

from featurewiz_spark.sources.cdx import cdx_sql, parse_cdx_lines, read_cdx

LINES = [
    'com,example)/ 20240101120000 {"url": "https://example.com/", '
    '"mime": "text/html", "status": "200", "digest": "sha1:AAA", '
    '"length": "1234", "offset": "0", "filename": "seg0.warc.gz"}',
    'com,example)/about 20240102130501 {"url": "https://example.com/about",'
    ' "mime": "text/html", "status": "404", "digest": "sha1:BBB", '
    '"length": "88", "offset": "1234", "filename": "seg0.warc.gz"}',
    "junk header line without the shape",
    'org,test)/x 20240203000000 {"url": "https://test.org/x", '
    '"mime": "application/pdf", "status": "200", "digest": "sha1:CCC", '
    '"length": "5", "offset": "99", "filename": "seg1.warc.gz"}',
]


def test_read_cdx(spark, tmp_path):
    p = tmp_path / "idx.cdx"
    p.write_text("\n".join(LINES) + "\n")
    df = read_cdx(spark, str(p))
    rows = {r["urlkey"]: r for r in df.collect()}
    assert set(rows) == {"com,example)/", "com,example)/about", "org,test)/x"}
    r = rows["com,example)/"]
    assert r["url"] == "https://example.com/"
    assert r["http_status"] == 200 and r["length"] == 1234
    assert r["capture_ts"].isoformat() == "2024-01-01T12:00:00"
    assert rows["com,example)/about"]["http_status"] == 404
    assert rows["org,test)/x"]["offset"] == 99


def test_cdx_sql_mirror(spark):
    df = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    got = sorted(map(tuple, parse_cdx_lines(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE l (line VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?)", [(ln,) for ln in LINES])
    oracle = sorted(map(tuple, con.execute(cdx_sql("l")).fetchall()))
    assert got == oracle
