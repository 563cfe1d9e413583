"""Distributed TF-IDF keyword extraction.

Per-document top-k salient terms — the tagging/clustering/search
primitive of a web-corpus pipeline (and the classic "what is this page
about" feature). Formula is the standard smoothed variant (public
knowledge, e.g. the sklearn TfidfTransformer documentation):

    idf(t)    = ln((N + 1) / (df(t) + 1)) + 1
    tfidf(d,t) = tf(d,t) * idf(t)

with raw term counts for tf. Scores are rounded to 6 decimals BEFORE
ranking, and ties break on the token string, so the top-k set is
deterministic and engine-independent (ln() may differ in the last ulp
across libm implementations; rounding first turns near-ties into exact
ties with a deterministic tie-break).

Scale shape at 10^12 docs:

- tf: explode tokens -> hash aggregate on (doc, token) — map-side
  partials; per-doc token cardinality is doc-length-bounded.
- df: hash aggregate of the tf table on token (one row per distinct
  (doc, token), so df = docs containing the token).
- N: a one-row aggregate cross-joined in (fully lazy — no driver
  action, BroadcastNestedLoopJoin of a single row is free).
- idf join: token -> (df) table, usually broadcastable
  (vocabulary-bounded). ``broadcast_idf`` is an explicit hint Spark
  HONORS regardless of size — for corpora whose distinct-token table
  exceeds the broadcast limit (hapax URLs/typos at web scale), pass
  ``broadcast_idf=False`` to use a shuffle join instead; there is no
  silent fallback.
- top-k: row_number window partitioned BY DOCUMENT — partition size is
  the doc's distinct-token count, never a hot key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featurewiz_spark.cache import scoped_persist
from featurewiz_spark.text._norm import norm_tokens, norm_tokens_sql


def tfidf_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
    rounding: int = 6,
    broadcast_idf: bool = True,
) -> DataFrame:
    """Top-``k`` keywords per document by smoothed TF-IDF.

    Returns (id_col, rank 1..k, keyword, tfidf) — documents with no
    tokens yield no rows; tokens in fewer than ``min_df`` documents are
    excluded from ranking.

    The tf aggregate feeds BOTH the df derivation and the scoring join,
    so it is scoped_persist-ed — without it the corpus-wide
    tokenize+explode+aggregate (the expensive stage) runs twice.
    Callers release via cache.release_caches()/cache_scope()."""
    tf = scoped_persist(
        docs.select(
            F.col(id_col),
            F.explode(norm_tokens(text_col)[1]).alias("keyword"),
        )
        .groupBy(id_col, "keyword")
        .agg(F.count(F.lit(1)).alias("__tf")),
        # the df-derivation (broadcast build) and the scoring join are
        # concurrent stage futures of one action — a lazy persist lets
        # both recompute the tokenize+explode+aggregate stage before
        # the cache fills (see scoped_persist docstring)
        eager=True,
    )
    dfreq = tf.groupBy("keyword").agg(F.count(F.lit(1)).alias("__df"))
    if min_df > 1:
        dfreq = dfreq.filter(F.col("__df") >= min_df)
    if broadcast_idf:
        dfreq = F.broadcast(dfreq)
    n = docs.agg(F.count(F.lit(1)).alias("__n"))
    scored = (
        tf.join(dfreq, "keyword")
        .crossJoin(F.broadcast(n))
        .select(
            id_col,
            "keyword",
            F.round(
                F.col("__tf")
                * (F.log((F.col("__n") + 1) / (F.col("__df") + 1)) + 1),
                rounding,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("keyword").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "rank", "keyword", "tfidf")
    )


def tfidf_keywords_sql(
    docs_src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    min_df: int = 1,
    rounding: int = 6,
) -> str:
    """DuckDB mirror of :func:`tfidf_keywords` — same normalization,
    smoothing, rounding-before-rank, and token tie-break."""
    t_sql, w_sql = norm_tokens_sql(text_col)
    return f"""
WITH __ti_toks AS (
    SELECT {id_col}, unnest(w) AS keyword
    FROM (SELECT {id_col},
                 {w_sql} AS w,
                 {t_sql} AS t
          FROM {docs_src}) s
    WHERE t <> ''),
__ti_tf AS (
    SELECT {id_col}, keyword, count(*) AS tf
    FROM __ti_toks GROUP BY 1, 2),
__ti_df AS (
    SELECT keyword, count(*) AS df
    FROM __ti_tf GROUP BY 1
    HAVING count(*) >= {int(min_df)}),
__ti_n AS (SELECT count(*) AS n FROM {docs_src}),
__ti_scored AS (
    SELECT {id_col}, keyword,
           round(tf * (ln((n + 1) / (df + 1)) + 1), {rounding}) AS tfidf
    FROM __ti_tf JOIN __ti_df USING (keyword) CROSS JOIN __ti_n),
__ti_ranked AS (
    SELECT {id_col}, keyword, tfidf,
           CAST(row_number() OVER (
               PARTITION BY {id_col} ORDER BY tfidf DESC, keyword
           ) AS INT) AS rank
    FROM __ti_scored)
SELECT {id_col}, rank, keyword, tfidf
FROM __ti_ranked WHERE rank <= {int(k)}
"""


def build_vocabulary(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    top_k: int = 100,
) -> DataFrame:
    """Corpus vocabulary table — the first step of tokenizer training:
    per token, ``term_freq`` (total occurrences) and ``doc_freq``
    (documents containing it), tokens in fewer than ``min_df`` docs
    dropped, truncated to the ``top_k`` most frequent with the
    deterministic (term_freq DESC, token ASC) tie-break so the selected
    SET is engine- and partition-invariant.

    Plan: explode → ONE hash aggregate (count + count(DISTINCT id) get
    partial aggregation) → TakeOrderedAndProject for the top-k (a
    distributed heap per partition + driver merge of k rows — NOT a
    global sort, NOT a single-task row_number window). Vocabulary is
    corpus-bounded; k rows reach the driver."""
    _, toks = norm_tokens(text_col)
    return (
        docs.select(F.col(id_col).alias("__id"), F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("term_freq"),
            F.countDistinct("__id").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= min_df)
        .orderBy(F.desc("term_freq"), F.asc("token"))
        .limit(top_k)
    )


def build_vocabulary_sql(
    src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 1,
    top_k: int = 100,
) -> str:
    """DuckDB mirror of :func:`build_vocabulary` (same tokenizer, same
    deterministic tie-break; counts cast to BIGINT to match Spark)."""
    t_sql, w_sql = norm_tokens_sql(text_col)
    return f"""
SELECT token,
       count(*)::BIGINT AS term_freq,
       count(DISTINCT __id)::BIGINT AS doc_freq
FROM (SELECT {id_col} AS __id, unnest({w_sql}) AS token
      FROM {src} WHERE {t_sql} <> '')
GROUP BY token
HAVING count(DISTINCT __id) >= {int(min_df)}
ORDER BY term_freq DESC, token ASC
LIMIT {int(top_k)}
"""
