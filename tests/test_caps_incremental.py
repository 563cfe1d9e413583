"""cap_per_key (operators/sampling.py) and plan_incremental_fetch
(sources/cdx.py): semantics + generated-mirror parity."""

from __future__ import annotations

import duckdb

from featurewiz_spark.operators.sampling import cap_per_key, cap_per_key_sql
from featurewiz_spark.sources.cdx import (
    incremental_fetch_sql,
    plan_incremental_fetch,
)


def test_cap_per_key(spark):
    rows = [("d1", i, f"u{i}") for i in range(5)] + [
        ("d2", 9, "x"), ("d2", 9, "y"), ("d2", 9, "z")
    ]
    df = spark.createDataFrame(rows, "domain string, score long, id string")
    capped = cap_per_key(
        df, ["domain"], 2, "score", tie_col="id", ascending=False
    )
    got = sorted((r["domain"], r["id"]) for r in capped.collect())
    # d1: top-2 scores (4,3); d2: tie on score -> id ASC picks x,y
    assert got == [("d1", "u3"), ("d1", "u4"), ("d2", "x"), ("d2", "y")]
    assert "cap_rank" in cap_per_key(
        df, ["domain"], 2, "score", tie_col="id", keep_rank=True
    ).columns

    con = duckdb.connect()
    con.execute("CREATE TABLE t (domain VARCHAR, score BIGINT, id VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    oracle = sorted(
        (d, i)
        for d, _, i in con.execute(
            cap_per_key_sql("t", ["domain"], 2, "score", tie_col="id",
                            ascending=False)
        ).fetchall()
    )
    assert got == oracle


CDX_ROWS = [
    # (digest, http_status, mime, filename, offset, length)
    ("sha1:A", 200, "text/html", "seg1.warc.gz", 100, 10),
    ("sha1:A", 200, "text/html", "seg0.warc.gz", 500, 10),  # earlier file
    ("sha1:B", 200, "text/html", "seg0.warc.gz", 0, 10),    # already seen
    ("sha1:C", 404, "text/html", "seg0.warc.gz", 10, 10),   # wrong status
    ("sha1:D", 200, "application/pdf", "seg0.warc.gz", 20, 10),  # wrong mime
    ("sha1:E", 200, "text/html; charset=utf-8", "seg2.warc.gz", 7, 10),
]


def test_plan_incremental_fetch(spark):
    cdx = spark.createDataFrame(
        CDX_ROWS,
        "digest string, http_status int, mime string, filename string, "
        "offset long, length long",
    )
    seen = spark.createDataFrame([("sha1:B",)], "digest string")
    plan = plan_incremental_fetch(cdx, seen)
    got = {r["digest"]: (r["filename"], r["offset"]) for r in plan.collect()}
    # A: earliest capture by (filename, offset); B seen; C/D filtered
    assert got == {
        "sha1:A": ("seg0.warc.gz", 500),
        "sha1:E": ("seg2.warc.gz", 7),
    }

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE cdx (digest VARCHAR, http_status INT, mime VARCHAR, "
        "filename VARCHAR, \"offset\" BIGINT, length BIGINT)"
    )
    con.executemany("INSERT INTO cdx VALUES (?, ?, ?, ?, ?, ?)", CDX_ROWS)
    con.execute("CREATE TABLE seen (digest VARCHAR)")
    con.execute("INSERT INTO seen VALUES ('sha1:B')")
    cols = ["http_status", "mime", "filename", "offset", "length"]
    oracle = {
        r[0]: (r[3], r[4])
        for r in con.execute(
            incremental_fetch_sql("cdx", "seen", cols)
        ).fetchall()
    }
    assert got == oracle
