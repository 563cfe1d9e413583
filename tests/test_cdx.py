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


def test_fetch_warc_records_by_offset(spark, tmp_path):
    """CDX -> selective fetch: per-record gzip members sliced at their
    recorded (offset, length) decode back to the exact payloads, files
    opened once per task with ascending seeks."""
    import gzip

    from featurewiz_spark.sources.cdx import fetch_warc_records
    from tests.test_warc import _http, _record

    locators, payloads = [], {}
    for f in range(2):
        path = tmp_path / f"seg{f}.warc.gz"
        buf, off = [], 0
        for i in range(6):
            url = f"https://s{f}.example/p{i}"
            html = f"<p>doc {f}-{i}</p>".encode()
            member = gzip.compress(
                _record("response", url, "2024-03-01T10:00:00Z", _http(html))
            )
            locators.append((f"seg{f}.warc.gz", off, len(member), url))
            payloads[url] = html
            buf.append(member)
            off += len(member)
        path.write_bytes(b"".join(buf))

    # fetch a SUBSET (every other record) by locator
    chosen = [loc for i, loc in enumerate(locators) if i % 2 == 0]
    ldf = spark.createDataFrame(
        chosen, "filename string, offset long, length long, want_url string"
    )
    got = {
        r["url"]: bytes(r["html"])
        for r in fetch_warc_records(ldf, base_dir=str(tmp_path)).collect()
    }
    assert set(got) == {u for _, _, _, u in chosen}
    for url, html in got.items():
        assert html == payloads[url]


def test_stream_cdx_matches_batch(spark, tmp_path):
    from featurewiz_spark.sources.cdx import stream_cdx

    landing = tmp_path / "landing"
    landing.mkdir()
    (landing / "a.cdx").write_text("\n".join(LINES) + "\n")
    q = (
        stream_cdx(spark, str(landing))
        .writeStream.format("memory")
        .queryName("cdx_stream_t")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("select * from cdx_stream_t").collect()))
    want = sorted(map(tuple, read_cdx(spark, str(landing / "a.cdx")).collect()))
    assert got == want and len(got) == 3


def test_cdx_sql_mirror(spark):
    df = spark.createDataFrame([(ln,) for ln in LINES], "value string")
    got = sorted(map(tuple, parse_cdx_lines(df).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE l (line VARCHAR)")
    con.executemany("INSERT INTO l VALUES (?)", [(ln,) for ln in LINES])
    oracle = sorted(map(tuple, con.execute(cdx_sql("l")).fetchall()))
    assert got == oracle
