"""Link extraction: pages → (src, dst) edge list for the link graph.

Closes the chain WARC → pages → edges → PageRank
(operators/pagerank.py): `<a href>` targets are pulled with ONE
regexp_extract_all riding the scan (pure codegen, no Python), resolved
against the page's own URL, and optionally canonicalized with
text.urls.normalize_url. The SQL mirror is generated from the SAME
pattern constants below, so the two engines cannot drift.

Pinned resolution semantics (deliberately simpler than full RFC 3986 —
documented, not accidental):

- ``scheme:...`` absolute → kept iff http/https (mailto:, javascript:,
  data: dropped)
- ``//host/...`` protocol-relative → base scheme prepended
- ``/path``     root-relative     → base ``scheme://host`` prepended
- anything else relative          → joined to the DIRECTORY of the
  base path (``a/b.html`` + ``c.html`` → ``a/c.html``)
- fragments stripped everywhere; surrounding quotes trimmed; no
  dot-segment (``../``) normalization — a ``..`` survives literally,
  which is stable for graph identity even if not browser-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ONE source of truth for both engines (RE2-safe: no backrefs/lookarounds)
HREF_PAT = r"""(?i)<a[^>]*\shref\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)"""
# href + anchor text in one pattern: group 1 = href token, group 2 =
# visible text up to the next tag. Both engines extract the SAME spans
# twice (group 1 and group 2), so the two arrays align positionally.
HREF_TEXT_PAT = (
    r"""(?i)<a[^>]*\shref\s*=\s*("[^"]*"|'[^']*'|[^\s>]+)[^>]*>([^<]*)"""
)
QUOTE_TRIM_PAT = r"""^["']|["']$"""
FRAGMENT_PAT = r"#.*$"
SCHEME_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*:"
BASE_SCHEME_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
BASE_HOST_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
BASE_PATH_PAT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
LAST_SEG_PAT = r"[^/]*$"


def _resolve(base: Column, href: Column) -> Column:
    """Shared resolution CASE — the Spark half; the SQL half below is
    generated from the same constants with identical branch order."""
    scheme = F.regexp_extract(base, BASE_SCHEME_PAT, 1)
    host = F.regexp_extract(base, BASE_HOST_PAT, 1)
    path = F.regexp_extract(base, BASE_PATH_PAT, 1)
    basedir = F.regexp_replace(path, LAST_SEG_PAT, "")
    basedir = F.when(basedir == "", F.lit("/")).otherwise(basedir)
    root = F.concat(scheme, F.lit("://"), host)
    return (
        F.when(
            href.rlike(SCHEME_PAT),
            F.when(href.rlike(r"(?i)^https?:"), href).otherwise(F.lit(None)),
        )
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(root, href))
        .otherwise(F.concat(root, basedir, href))
    )


def extract_links(
    df: DataFrame,
    url_col: str = "url",
    html_col: str = "text_html",
    out_col: str = "dst",
    normalize: bool = False,
    drop_self: bool = True,
    anchor_text: bool = False,
) -> DataFrame:
    """One row per (page, resolved link target). ``html_col`` must be a
    STRING column (decode/extract upstream). ``normalize=True`` runs
    text.urls.normalize_url on both endpoints so the edge list feeds
    dedup_by_canonical_url / pagerank directly. ``anchor_text=True``
    adds the link's visible text (up to the next tag, whitespace
    collapsed) — the classic off-page relevance/quality signal for the
    TARGET document."""
    if anchor_text:
        pat = F.lit(HREF_TEXT_PAT)
        pairs = F.arrays_zip(
            F.regexp_extract_all(F.col(html_col), pat, 1).alias("h"),
            F.regexp_extract_all(F.col(html_col), pat, 2).alias("a"),
        )
        out = df.select(
            F.col(url_col).alias("src"), F.explode(pairs).alias("__p")
        ).select(
            "src",
            F.col("__p.h").alias("__raw"),
            F.regexp_replace(
                F.regexp_replace(F.col("__p.a"), r"\s+", " "), r"^ | $", ""
            ).alias("anchor_text"),
        )
        extra = ["anchor_text"]
    else:
        hrefs = F.regexp_extract_all(F.col(html_col), F.lit(HREF_PAT), 1)
        out = df.select(
            F.col(url_col).alias("src"), F.explode(hrefs).alias("__raw")
        )
        extra = []
    href = F.regexp_replace(
        F.regexp_replace(F.col("__raw"), QUOTE_TRIM_PAT, ""),
        FRAGMENT_PAT,
        "",
    )
    # empty after quote/fragment strip (e.g. href="#top") -> no edge
    out = out.select("src", href.alias("__href"), *extra).where(
        F.col("__href") != ""
    )
    out = out.select(
        "src", _resolve(F.col("src"), F.col("__href")).alias(out_col), *extra
    ).where(F.col(out_col).isNotNull() & (F.col(out_col) != ""))
    if normalize:
        from featurewiz_spark.text.urls import normalize_url

        out = out.select(
            normalize_url(F.col("src")).alias("src"),
            normalize_url(F.col(out_col)).alias(out_col),
            *extra,
        )
    if drop_self:
        out = out.where(F.col("src") != F.col(out_col))
    return out


def extract_links_sql(
    src: str,
    url_col: str = "url",
    html_col: str = "text_html",
    out_col: str = "dst",
    drop_self: bool = True,
) -> str:
    """DuckDB mirror generated from the SAME constants (normalize=False
    variant; compose with url_features_sql for canonical edges)."""
    # DuckDB string literals: escape single quotes in the patterns
    def q(p: str) -> str:
        return "'" + p.replace("'", "''") + "'"

    self_filter = f"AND src <> {out_col}" if drop_self else ""
    return f"""
        WITH __h AS (
            SELECT {url_col} AS src,
                   unnest(regexp_extract_all({html_col}, {q(HREF_PAT)}, 1))
                     AS raw
            FROM {src}
        ),
        __c AS (
            SELECT src,
                   regexp_replace(
                     regexp_replace(raw, {q(QUOTE_TRIM_PAT)}, '', 'g'),
                     {q(FRAGMENT_PAT)}, '') AS href,
                   regexp_extract(src, {q(BASE_SCHEME_PAT)}, 1) AS sch,
                   regexp_extract(src, {q(BASE_HOST_PAT)}, 1) AS hst,
                   CASE WHEN regexp_replace(
                            regexp_extract(src, {q(BASE_PATH_PAT)}, 1),
                            {q(LAST_SEG_PAT)}, '') = '' THEN '/'
                        ELSE regexp_replace(
                            regexp_extract(src, {q(BASE_PATH_PAT)}, 1),
                            {q(LAST_SEG_PAT)}, '') END AS dir
            FROM __h
        )
        SELECT src,
               CASE
                 WHEN regexp_matches(href, {q(SCHEME_PAT)}) THEN
                   CASE WHEN regexp_matches(href, '(?i)^https?:')
                        THEN href ELSE NULL END
                 WHEN href LIKE '//%' THEN sch || ':' || href
                 WHEN href LIKE '/%' THEN sch || '://' || hst || href
                 ELSE sch || '://' || hst || dir || href
               END AS {out_col}
        FROM __c
        WHERE href <> ''
          AND {out_col} IS NOT NULL AND {out_col} <> '' {self_filter}
    """
