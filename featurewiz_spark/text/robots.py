"""robots.txt parsing + crawl-allowance filtering.

Curation-compliance operator: Common Crawl archives the robots.txt
fetches alongside page captures, and respectful corpus construction
filters pages whose path a site disallowed for the crawler. Both
stages are pure declarative plans (split/explode + one per-host window
+ one aggregate) — no Python in the path — and every regex/constant is
shared with the generated DuckDB mirror.

Pinned semantics (REP, RFC 9309, simplified where the spec allows):

- lines are trimmed, ``#`` comments stripped; group = a maximal run of
  consecutive ``User-agent:`` lines plus the ``Allow:``/``Disallow:``
  rules that follow it (a UA line after rules starts a NEW group).
- group selection: if any group names ``user_agent`` (case-insensitive
  exact token), only those groups apply; otherwise the ``*`` groups.
- rule matching: literal prefix match (``*``/``$`` wildcards are NOT
  interpreted — documented simplification), longest prefix wins,
  Allow wins length ties (Google semantics), no rules → allowed.
- ``Disallow:`` with an empty value is allow-all per spec → dropped.

Scale: the parse window partitions by host — one host's robots body is
a few KB, never corpus-scale. apply_robots joins pages to the rules
table on host (broadcastable: rules ≪ pages) and reduces with ONE
max_by aggregate; the tie-break is encoded into a single integer key
(prefix_len*2 + allow) so both engines order identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# shared with the SQL mirror — RE2+Java compatible
UA_PAT = r"(?i)^user-agent\s*:"
UA_VAL_PAT = r"(?i)^user-agent\s*:(.*)$"
RULE_PAT = r"(?i)^(allow|disallow)\s*:"
ALLOW_PAT = r"(?i)^allow\s*:"
RULE_VAL_PAT = r"(?i)^(?:dis)?allow\s*:(.*)$"
COMMENT_PAT = r"#.*$"
URL_PATH_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"
URL_HOST_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"


def parse_robots(
    df: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    user_agent: str = "*",
) -> DataFrame:
    """robots.txt bodies → applicable rule table
    ``(host, allow, prefix, prefix_len)`` for ``user_agent``."""
    ua = user_agent.lower()
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    )
    line = F.trim(F.regexp_replace(F.col("raw"), COMMENT_PAT, ""))
    lines = lines.select(
        "host", "pos", line.alias("line")
    ).where(F.col("line") != "")
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = F.col("line").rlike(UA_PAT)
    prev_ua = F.lag(is_ua, 1, False).over(w)
    grouped = lines.select(
        "host",
        "pos",
        "line",
        is_ua.alias("is_ua"),
        F.sum((is_ua & ~prev_ua).cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("gid"),
    )
    uas = grouped.where("is_ua").select(
        "host",
        "gid",
        F.lower(F.trim(F.regexp_extract("line", UA_VAL_PAT, 1))).alias("ua"),
    )
    # group selection: specific UA groups if any exist for the host,
    # else the '*' groups. Only the OUTER distinct is load-bearing:
    # pre-distinct-ing each branch and the anti-join's build side
    # repeated the dedup three times (three extra exchanges for sets
    # the final distinct collapses anyway; anti-join semantics are
    # existence-based and need no distinct input).
    hosts_specific = uas.where(F.col("ua") == ua).select("host", "gid")
    star = uas.where(F.col("ua") == "*").select("host", "gid")
    has_specific = hosts_specific.select("host")
    chosen = hosts_specific.unionByName(
        star.join(has_specific, "host", "left_anti")
    ).distinct()

    rules = grouped.where(
        F.col("line").rlike(RULE_PAT)
    ).select(
        "host",
        "gid",
        F.col("line").rlike(ALLOW_PAT).alias("allow"),
        F.trim(F.regexp_extract("line", RULE_VAL_PAT, 1)).alias("prefix"),
    ).where(F.col("prefix") != "")
    return rules.join(chosen, ["host", "gid"]).select(
        "host", "allow", "prefix", F.length("prefix").alias("prefix_len")
    ).distinct()


def apply_robots(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    out_col: str = "robots_allowed",
) -> DataFrame:
    """Adds ``out_col``: longest-prefix-match verdict of the rules
    table against each page URL's path (query string included, per
    REP). No matching rule, or no rules for the host → allowed."""
    clash = {"__host", "__path", "host", "allow", "prefix", "prefix_len"} & set(
        pages.columns
    )
    if clash:
        raise ValueError(
            f"apply_robots: pages already has column(s) {sorted(clash)}; "
            "rename them before applying"
        )
    pages = pages.withColumn(
        "__host", F.regexp_extract(F.col(url_col), URL_HOST_PAT, 1)
    ).withColumn(
        "__path",
        F.when(
            F.regexp_extract(F.col(url_col), URL_PATH_PAT, 1) == "",
            F.lit("/"),
        ).otherwise(F.regexp_extract(F.col(url_col), URL_PATH_PAT, 1)),
    )
    # Shape: aggregate the RULES side per host (rules-scale, tiny next
    # to pages), join each page to its host's rule array once, and
    # evaluate longest-prefix-match as an in-plan array expression.
    # The old shape joined pages×rules then re-aggregated BY URL and
    # joined the verdict back — three pages-scale shuffles (q105
    # audited at 10 exchanges, the max of all 110 queries) and an
    # implicit assumption that url is unique in `pages`. Now the pages
    # side crosses at most ONE exchange (zero when the per-host rule
    # table broadcasts, the common case — robots.txt size is bounded),
    # the verdict is a projection per page row, and duplicate urls keep
    # their multiplicity. Tie-break key unchanged: longest prefix wins,
    # allow wins ties; no matching rule or unknown host → allowed.
    host_rules = rules.groupBy(F.col("host").alias("__rhost")).agg(
        F.collect_list(F.struct("prefix", "prefix_len", "allow")).alias("__rules")
    )
    joined = pages.join(
        host_rules, pages["__host"] == host_rules["__rhost"], "left"
    )
    matched = F.filter(
        F.col("__rules"),
        lambda r: F.col("__path").substr(F.lit(1), F.length(r["prefix"]))
        == r["prefix"],
    )
    best = F.array_max(
        F.transform(
            matched,
            lambda r: F.struct(
                (r["prefix_len"] * 2 + r["allow"].cast("int")).alias("k"),
                r["allow"].alias("a"),
            ),
        )
    )
    return joined.withColumn(out_col, F.coalesce(best["a"], F.lit(True))).drop(
        "__host", "__path", "__rhost", "__rules"
    )


def robots_sql(
    robots_src: str,
    pages_src: str,
    host_col: str = "host",
    body_col: str = "robots_txt",
    url_col: str = "url",
    user_agent: str = "*",
    out_col: str = "robots_allowed",
) -> str:
    """DuckDB mirror generated from the SAME patterns and the same
    integer tie-break key. ``robots_src``/``pages_src`` are table names
    or parenthesized subqueries."""
    def q(p: str) -> str:
        return "'" + p.replace("'", "''") + "'"

    ua = user_agent.lower().replace("'", "''")
    return f"""
        WITH __lines AS MATERIALIZED (
            SELECT {host_col} AS host, i AS pos,
                   trim(regexp_replace(ls[i], {q(COMMENT_PAT)}, '')) AS line
            FROM (SELECT {host_col},
                         string_split({body_col}, chr(10)) AS ls
                  FROM {robots_src}) t,
                 LATERAL (SELECT unnest(generate_series(1, len(ls))) AS i)
            WHERE trim(regexp_replace(ls[i], {q(COMMENT_PAT)}, '')) <> ''
        ),
        __g0 AS MATERIALIZED (
            SELECT host, pos, line,
                   regexp_matches(line, {q(UA_PAT)}) AS is_ua,
                   COALESCE(LAG(regexp_matches(line, {q(UA_PAT)})) OVER
                       (PARTITION BY host ORDER BY pos), FALSE) AS prev_ua
            FROM __lines
        ),
        __g AS MATERIALIZED (
            SELECT host, pos, line, is_ua,
                   SUM(CASE WHEN is_ua AND NOT prev_ua THEN 1 ELSE 0 END)
                     OVER (PARTITION BY host ORDER BY pos
                           ROWS UNBOUNDED PRECEDING) AS gid
            FROM __g0
        ),
        __uas AS MATERIALIZED (
            SELECT host, gid,
                   lower(trim(regexp_extract(line, {q(UA_VAL_PAT)}, 1))) AS ua
            FROM __g WHERE is_ua
        ),
        __spec AS MATERIALIZED (
            SELECT DISTINCT host, gid FROM __uas WHERE ua = '{ua}'),
        __star AS MATERIALIZED (
            SELECT DISTINCT host, gid FROM __uas WHERE ua = '*'),
        __chosen AS MATERIALIZED (
            SELECT host, gid FROM __spec
            UNION
            SELECT host, gid FROM __star
            WHERE host NOT IN (SELECT host FROM __spec)
        ),
        __rules AS MATERIALIZED (
            SELECT DISTINCT g.host,
                   regexp_matches(g.line, {q(ALLOW_PAT)}) AS allow,
                   trim(regexp_extract(g.line, {q(RULE_VAL_PAT)}, 1)) AS prefix
            FROM __g g JOIN __chosen c ON g.host = c.host AND g.gid = c.gid
            WHERE regexp_matches(g.line, {q(RULE_PAT)})
              AND trim(regexp_extract(g.line, {q(RULE_VAL_PAT)}, 1)) <> ''
        ),
        __pages AS MATERIALIZED (
            SELECT *,
                   regexp_extract({url_col}, {q(URL_HOST_PAT)}, 1) AS __host,
                   CASE WHEN regexp_extract({url_col}, {q(URL_PATH_PAT)}, 1)
                             = '' THEN '/'
                        ELSE regexp_extract({url_col}, {q(URL_PATH_PAT)}, 1)
                   END AS __path
            FROM {pages_src}
        ),
        __verdict AS MATERIALIZED (
            SELECT p.{url_col} AS u,
                   COALESCE(arg_max(r.allow,
                       length(r.prefix) * 2
                       + CASE WHEN r.allow THEN 1 ELSE 0 END), TRUE)
                     AS {out_col}
            FROM __pages p LEFT JOIN __rules r
              ON p.__host = r.host
             AND substr(p.__path, 1, length(r.prefix)) = r.prefix
            GROUP BY p.{url_col}
        )
        SELECT p.* EXCLUDE (__host, __path), v.{out_col}
        FROM __pages p LEFT JOIN __verdict v ON p.{url_col} = v.u
    """
