"""robots.txt compliance (text/robots.py): pinned REP semantics,
group selection, longest-match + allow-tie-break, and the generated
DuckDB mirror."""

from __future__ import annotations

import duckdb

from featurewiz_spark.text.robots import apply_robots, parse_robots, robots_sql

ROBOTS = [
    (
        "a.example",
        "# corpus rules\n"
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Allow: /private/ok\n"
        "\n"
        "User-agent: ccbot\n"
        "User-agent: otherbot\n"
        "Disallow: /no-cc/\n"
        "Disallow:\n",  # empty value = allow-all, dropped
    ),
    ("b.example", "User-agent: *\nDisallow: /\nAllow: /pub\n"),
    ("c.example", "just junk, no groups\n"),
]

PAGES = [
    ("https://a.example/free.html",),
    ("https://a.example/private/secret.html",),
    ("https://a.example/private/ok/page.html",),
    ("https://a.example/no-cc/x",),
    ("https://b.example/pub/data.html",),
    ("https://b.example/other.html",),
    ("https://b.example",),  # empty path -> "/"
    ("https://c.example/anything",),
    ("https://zzz.example/no-robots",),
]


def _spark_verdicts(spark, user_agent):
    robots = spark.createDataFrame(ROBOTS, "host string, robots_txt string")
    pages = spark.createDataFrame(PAGES, "url string")
    rules = parse_robots(robots, user_agent=user_agent)
    return {
        r["url"]: r["robots_allowed"]
        for r in apply_robots(pages, rules).collect()
    }


def test_star_agent_semantics(spark):
    got = _spark_verdicts(spark, "*")
    assert got["https://a.example/free.html"] is True
    assert got["https://a.example/private/secret.html"] is False
    # longer Allow overrides Disallow prefix
    assert got["https://a.example/private/ok/page.html"] is True
    # the ccbot group does NOT apply to *
    assert got["https://a.example/no-cc/x"] is True
    assert got["https://b.example/pub/data.html"] is True
    assert got["https://b.example/other.html"] is False
    assert got["https://b.example"] is False  # "/" disallowed
    assert got["https://c.example/anything"] is True  # no parsable rules
    assert got["https://zzz.example/no-robots"] is True  # host absent


def test_specific_agent_overrides_star(spark):
    got = _spark_verdicts(spark, "ccbot")
    # specific group exists for a.example -> star group IGNORED
    assert got["https://a.example/private/secret.html"] is True
    assert got["https://a.example/no-cc/x"] is False
    # b.example has no ccbot group -> falls back to star
    assert got["https://b.example/other.html"] is False


def test_sql_mirror_matches(spark):
    for ua in ("*", "ccbot"):
        got = sorted(_spark_verdicts(spark, ua).items())
        con = duckdb.connect()
        con.execute("CREATE TABLE robots (host VARCHAR, robots_txt VARCHAR)")
        con.executemany("INSERT INTO robots VALUES (?, ?)", ROBOTS)
        con.execute("CREATE TABLE pages (url VARCHAR)")
        con.executemany("INSERT INTO pages VALUES (?)", PAGES)
        oracle = sorted(
            con.execute(robots_sql("robots", "pages", user_agent=ua)).fetchall()
        )
        assert got == oracle, f"mirror divergence for ua={ua}"
