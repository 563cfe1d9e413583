"""Link extraction (text/links.py): pinned resolution semantics,
Spark vs the generated DuckDB mirror, and the edges → PageRank chain."""

from __future__ import annotations

import duckdb

from featurewiz_spark.text.links import extract_links, extract_links_sql

PAGES = [
    (
        "https://a.example/dir/page.html",
        '<html><body>'
        '<a href="https://b.example/x">abs</a>'
        "<a href='//cdn.example/lib.js'>proto-rel</a>"
        '<a href="/root.html">root-rel</a>'
        '<a href="sib.html">rel</a>'
        '<a href="#top">frag-only</a>'
        '<a href="mailto:x@y.z">mail</a>'
        '<a href="javascript:void(0)">js</a>'
        '<a href="sub/deep.html#sec">rel-frag</a>'
        "<a href=bare.html>unquoted</a>"
        '<a href="https://a.example/dir/page.html">self</a>'
        "</body></html>",
    ),
    ("https://c.example", '<p><a href="n.html">no-path-base</a></p>'),
]

EXPECT = {
    ("https://a.example/dir/page.html", "https://b.example/x"),
    ("https://a.example/dir/page.html", "https://cdn.example/lib.js"),
    ("https://a.example/dir/page.html", "https://a.example/root.html"),
    ("https://a.example/dir/page.html", "https://a.example/dir/sib.html"),
    ("https://a.example/dir/page.html", "https://a.example/dir/sub/deep.html"),
    ("https://a.example/dir/page.html", "https://a.example/dir/bare.html"),
    ("https://c.example", "https://c.example/n.html"),
}


def test_extract_links_pinned_semantics(spark):
    df = spark.createDataFrame(PAGES, "url string, text_html string")
    got = {(r["src"], r["dst"]) for r in extract_links(df).collect()}
    assert got == EXPECT  # mailto/js/frag-only/self dropped


def test_extract_links_sql_mirror_matches(spark):
    df = spark.createDataFrame(PAGES, "url string, text_html string")
    got = sorted(
        (r["src"], r["dst"]) for r in extract_links(df).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE pages (url VARCHAR, text_html VARCHAR)")
    con.executemany("INSERT INTO pages VALUES (?, ?)", PAGES)
    oracle = sorted(con.execute(extract_links_sql("pages")).fetchall())
    assert got == oracle


def test_extract_links_anchor_text(spark):
    df = spark.createDataFrame(
        [
            (
                "https://a.example/p.html",
                '<a href="/x.html">  Click\n here </a>'
                '<a href="/y.html"><b>bold-wrapped</b></a>'
                '<a href="#f">frag only</a>',
            )
        ],
        "url string, text_html string",
    )
    got = {
        r["dst"]: r["anchor_text"]
        for r in extract_links(df, anchor_text=True).collect()
    }
    assert got["https://a.example/x.html"] == "Click here"  # ws collapsed
    # text up to the NEXT TAG only (pinned): a nested tag empties it
    assert got["https://a.example/y.html"] == ""
    assert "https://a.example/p.html" not in got  # frag-only still dropped


def test_extract_links_normalized_feed_pagerank(spark):
    """End of the chain: extracted+canonicalized edges run through the
    fixed-point PageRank without modification."""
    from featurewiz_spark.operators.pagerank import pagerank

    df = spark.createDataFrame(PAGES, "url string, text_html string")
    edges = extract_links(df, normalize=True)
    # normalize strips nothing here except producing canonical forms;
    # ranks exist for every endpoint node
    ranks = pagerank(edges, src="src", dst="dst", iterations=3)
    nodes = {r["node"] for r in ranks.collect()}
    assert "https://b.example/x" in nodes
    assert all(r["rank_fp"] > 0 for r in ranks.collect())
