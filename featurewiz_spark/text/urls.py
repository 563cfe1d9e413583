"""URL canonicalization + structural features for web-page corpora.

Common-Crawl-style pipelines dedup and partition BY URL before anything
touches the page bytes: the same page is fetched under scheme/case/
port/tracking-parameter variants, and hot domains dominate partitions
unless the key is normalized first (the north-rule input table keys on
``url``). This module gives both halves:

- :func:`normalize_url` — a pure-expression canonicalizer (lowercase
  scheme+host, strip fragment, strip default port, strip ``www.``,
  drop tracking query parameters, sort the survivors) — the join /
  dedup key.
- :func:`add_url_features` — host, registered domain (last-two-labels
  heuristic; a real deployment swaps in the public-suffix list), path
  depth, query-parameter count, https flag — grouping/skew-diagnosis
  keys (salt on ``url_domain`` for hot-domain joins).

Everything is JVM regexp/array expressions — no Python, no shuffle; the
plan rides the scan. Patterns use RE2-compatible syntax (no backrefs /
lookaround) so the DuckDB oracle evaluates the identical definition.

Re-derived from the public WHATWG-URL / RFC 3986 normalization rules;
featurewiz has no URL operators (LLM-pipeline addition per the brief).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column

# query params that never identify content (analytics/click tracking)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|gclid|fbclid|msclkid|ref|mc_eid)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"


def _parts(url: Column):
    """Split a URL column into (scheme, hostport, path, query) —
    fragment already stripped. Pure regexp_extract, each evaluated on
    the de-fragmented string."""
    nofrag = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(F.regexp_extract(nofrag, _SCHEME_RE, 1))
    rest = F.regexp_replace(nofrag, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, r"^[^?#]*\?([^#]*)", 1)
    return scheme, hostport, path, query


def _clean_host(scheme: Column, hostport: Column, strip_www: bool) -> Column:
    strip80 = (scheme == F.lit("http")) & hostport.rlike(":80$")
    strip443 = (scheme == F.lit("https")) & hostport.rlike(":443$")
    host = (
        F.when(strip80, F.regexp_replace(hostport, r":80$", ""))
        .when(strip443, F.regexp_replace(hostport, r":443$", ""))
        .otherwise(hostport)
    )
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    return host


def _kept_params(query: Column) -> Column:
    """Sorted array of non-tracking, non-empty query params."""
    return F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
        )
    )


def normalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical URL: ``scheme://host[path][?sorted-kept-params]``.
    Fragment removed; scheme/host lowercased; default port stripped
    (``:80`` for http, ``:443`` for https); leading ``www.`` stripped
    when ``strip_www``; tracking params (``utm_*``, ``gclid``, ...)
    dropped and the survivors sorted bytewise; empty path becomes
    ``/``. Strings without a scheme pass through these rules with
    ``scheme=''`` (the expression never throws)."""
    scheme, hostport, path, query = _parts(url)
    host = _clean_host(scheme, hostport, strip_www)
    kept = _kept_params(query)
    qs = F.array_join(kept, "&")
    path_n = F.when(path == "", F.lit("/")).otherwise(path)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path_n,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )


def add_url_features(df, url_col: str = "url", strip_www: bool = True):
    """Append ``url_norm``, ``url_host``, ``url_domain`` (last two
    dot-labels of the host — heuristic registered domain), ``url_depth``
    (non-empty path segments), ``url_n_params`` (kept query params) and
    ``url_is_https`` to ``df``."""
    url = F.col(url_col)
    scheme, hostport, path, query = _parts(url)
    host = _clean_host(scheme, hostport, strip_www)
    hostname = F.regexp_replace(host, r":[0-9]+$", "")
    domain = F.when(
        hostname.rlike(r"[^.]+\.[^.]+$"),
        F.regexp_extract(hostname, r"([^.]+\.[^.]+)$", 1),
    ).otherwise(hostname)
    depth = F.size(F.filter(F.split(path, "/"), lambda s: s != ""))
    return df.withColumns(
        {
            "url_norm": normalize_url(url, strip_www),
            "url_host": host,
            "url_domain": domain,
            "url_depth": depth,
            "url_n_params": F.size(_kept_params(query)),
            "url_is_https": (scheme == "https").cast("int"),
        }
    )


def url_features_sql(
    url_expr: str, strip_www: bool = True
) -> dict[str, str]:
    """DuckDB SQL expression strings mirroring :func:`add_url_features`
    for a raw-URL SQL expression ``url_expr`` — generated beside the
    Spark expressions so the two engines share one definition. Returns
    a dict of output column -> SQL expression (reference them in a
    SELECT; DuckDB's regexp functions are RE2, patterns identical)."""
    nofrag = f"regexp_replace({url_expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({nofrag}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({nofrag}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    hostport = f"lower(regexp_extract({rest}, '^([^/?#]*)', 1))"
    path = f"regexp_extract({rest}, '^[^/?#]*([^?#]*)', 1)"
    query = f"regexp_extract({rest}, '^[^?#]*\\?([^#]*)', 1)"
    host = (
        f"CASE WHEN {scheme} = 'http' AND regexp_matches({hostport}, ':80$')"
        f" THEN regexp_replace({hostport}, ':80$', '')"
        f" WHEN {scheme} = 'https' AND regexp_matches({hostport}, ':443$')"
        f" THEN regexp_replace({hostport}, ':443$', '')"
        f" ELSE {hostport} END"
    )
    if strip_www:
        host = f"regexp_replace({host}, '^www\\.', '')"
    hostname = f"regexp_replace({host}, ':[0-9]+$', '')"
    domain = (
        f"CASE WHEN regexp_matches({hostname}, '[^.]+\\.[^.]+$')"
        f" THEN regexp_extract({hostname}, '([^.]+\\.[^.]+)$', 1)"
        f" ELSE {hostname} END"
    )
    kept = (
        f"list_sort(list_filter(string_split({query}, '&'),"
        f" p -> p <> '' AND NOT regexp_matches(p, '{TRACKING_PARAM_RE}')))"
    )
    # coalesce: DuckDB array_to_string([]) is NULL (not ''), and
    # concat('?', NULL) evaluates to '?' — without it every URL with no
    # kept params grew a stray trailing '?' only in the mirror,
    # splitting its canonical-dedup key from the Spark plan's
    qs = f"coalesce(array_to_string({kept}, '&'), '')"
    path_n = f"CASE WHEN {path} = '' THEN '/' ELSE {path} END"
    url_norm = (
        f"concat({scheme}, '://', {host}, {path_n},"
        f" CASE WHEN {qs} = '' THEN '' ELSE concat('?', {qs}) END)"
    )
    # CAST to INT: DuckDB len() yields BIGINT, Spark size() yields INT —
    # the driver's schema compare needs the types to agree.
    depth = f"CAST(len(list_filter(string_split({path}, '/'), s -> s <> '')) AS INT)"
    return {
        "url_norm": url_norm,
        "url_host": host,
        "url_domain": domain,
        "url_depth": depth,
        "url_n_params": f"CAST(len({kept}) AS INT)",
        "url_is_https": f"CAST({scheme} = 'https' AS INT)",
    }


def dedup_by_canonical_url(
    df,
    url_col: str = "url",
    order_col: str = "fetch_seq",
    id_col: str = "doc_id",
    strip_www: bool = True,
    canon_col: str = "url_canon",
):
    """Keep the LATEST fetch per canonical URL — the Common-Crawl-style
    refetch dedup: many raw URLs (scheme case, default ports, www,
    tracking params, fragments) collapse to one canonical form via
    :func:`normalize_url`, and only the row with the greatest
    (order_col, id_col) survives.

    ONE hash aggregate with `max_by(struct(all columns),
    struct(order_col, id_col))` — the skew-proof shape (map-side
    partials collapse a hot URL's refetches before the shuffle; a
    10^8-refetch URL costs one row per map task, the same pattern as
    the curation dedup). No window, no per-key sort task. Tie-break on
    id_col makes the survivor deterministic even with duplicate
    order values. Output: ``canon_col`` + every input column (survivor
    row) + ``n_fetches``.

    NULL order_col semantics (pinned by test): Spark's struct ordering
    sorts a NULL field before every non-null value, so a row with NULL
    ``order_col`` only survives when ALL fetches of its canonical URL
    have NULL order (ties then broken by greatest ``id_col``). Mirrors
    a ``row_number ... ORDER BY ord DESC NULLS LAST, id DESC`` oracle.
    """
    for c in (canon_col, "n_fetches"):
        if c in df.columns:
            raise ValueError(f"dedup_by_canonical_url: {c!r} exists")
    src_cols = df.columns
    with_canon = df.withColumn(canon_col, normalize_url(F.col(url_col), strip_www))
    return (
        with_canon.groupBy(canon_col)
        .agg(
            F.max_by(
                F.struct(*src_cols),
                F.struct(F.col(order_col), F.col(id_col)),
            ).alias("__survivor"),
            F.count(F.lit(1)).alias("n_fetches"),
        )
        .select(canon_col, "__survivor.*", "n_fetches")
    )
