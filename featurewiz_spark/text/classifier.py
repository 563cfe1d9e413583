"""Supervised linear quality classifier for web-corpus filtering.

GPT-3-style training-data curation trains a linear classifier to
separate a "high-quality" reference corpus from raw web text and keeps
documents scoring above a threshold (Brown et al. 2020 §A; LLaMA uses
the same shape with a fastText model). This module re-derives that
signal Spark-first as a multinomial Naive-Bayes log-odds scorer — the
closed-form member of the linear-classifier family, chosen because its
training IS a hash aggregate (so it distributes with map-side partials
and stays deterministic) while scoring is the same w·x dot product any
linear model uses:

    w(tok)   = ln((c_pos(tok) + k) / (N_pos + k·V))
             - ln((c_neg(tok) + k) / (N_neg + k·V))
    score(d) = prior + mean_{tok ∈ d} w(tok)
    prior    = ln(n_pos_docs / n_neg_docs)

with c_cls(tok) the token count inside class cls, N_cls the total
token count of the class, V = |vocabulary| + 1 (the +1 is the
out-of-vocabulary bucket — unseen tokens get the smoothed floor
through coalesce-to-0 left joins, exactly like text/lm.py). The mean
(not sum) over tokens is the fastText-style length normalization: a
long document is not "more positive" just for being long.

Scale shape at 10^12 docs:

- Training: ONE hash aggregate over the exploded labeled corpus
  (per-token conditional sums collapse map-side), plus one tiny
  totals aggregate. The model is vocabulary-bounded, not
  corpus-bounded.
- Scoring: explode tokens → BROADCAST join against the model table →
  hash aggregate back to doc_id. Partial aggregation collapses a
  document's token rows before the shuffle, so shuffle width is
  O(documents), not O(tokens).
- Join keys are md5-60 hashes (8 bytes) shared with the generated
  DuckDB mirror, so the oracle verifies the exact hashed pipeline.

Floats: counts and totals are exact integers in both engines; the two
`ln` calls and the mean are IEEE doubles, and the score is rounded
(default 6 dp) before output — the same cross-engine discipline as
text/lm.py and text/tfidf.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.cache import scoped_persist
from featurewiz_spark.text._norm import (
    h60,
    h60_sql,
    norm_tokens,
    norm_tokens_sql,
)


def _tokens(text_col: str):
    return norm_tokens(text_col)[1]


_h60 = h60  # shared cross-engine definition (text/_norm.py)


def train_quality_classifier(
    corpus: DataFrame,
    label_col: str,
    text_col: str = "text",
) -> tuple[DataFrame, dict]:
    """Fit the NB log-odds model on a labeled corpus. ``label_col``
    must be a boolean-ish column (cast to int: 1 = the "quality"
    class). Returns ``(model, stats)`` where ``model`` has columns
    (tok_h, c_pos, c_neg) — vocabulary-bounded, broadcastable — and
    ``stats`` is the tiny driver-side scalar set
    {n_pos_tok, n_neg_tok, vocab, n_pos_docs, n_neg_docs} consumed as
    literals by :func:`add_quality_score` (the same pattern as
    lm.py's driver-side vocab_size count).

    Raises if either class has zero documents — a one-class "model"
    would silently score everything with the prior's sign.

    Rows with a NULL label are excluded from BOTH classes (their tokens
    train nothing, their docs count toward neither prior) — the same
    NULL-skipping the generated SQL mirror's ``sum`` performs, so the
    engines agree on partially-labeled corpora.
    """
    y = F.col(label_col).cast("int")
    toks = _tokens(text_col)
    # NULL-label rows must be filtered BEFORE the explode: their counts
    # would sum to NULL (harmless) but their tokens would still create
    # model rows and inflate the vocabulary V, shifting every token's
    # smoothed log-odds — the docstring's "train nothing" contract
    labeled = corpus.where(F.col(label_col).isNotNull())
    model = (
        labeled.select(y.alias("__y"), F.explode(toks).alias("__tok"))
        .groupBy(_h60(F.col("__tok")).alias("tok_h"))
        .agg(
            F.sum("__y").alias("c_pos"),
            F.sum(F.lit(1) - F.col("__y")).alias("c_neg"),
        )
    )
    model = scoped_persist(model)
    tot = model.agg(
        F.sum("c_pos").alias("np"),
        F.sum("c_neg").alias("nn"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    docs = labeled.agg(
        F.sum(y).alias("dp"), F.sum(F.lit(1) - y).alias("dn")
    ).collect()[0]
    if not docs["dp"] or not docs["dn"]:
        raise ValueError(
            "train_quality_classifier: both classes must be non-empty "
            f"(got {docs['dp']} positive / {docs['dn']} negative docs)"
        )
    stats = {
        "n_pos_tok": int(tot["np"] or 0),
        "n_neg_tok": int(tot["nn"] or 0),
        "vocab": int(tot["v"]) + 1,
        "n_pos_docs": int(docs["dp"]),
        "n_neg_docs": int(docs["dn"]),
    }
    return model, stats


def add_quality_score(
    docs: DataFrame,
    model: DataFrame,
    stats: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    out_col: str = "quality_score",
    keep_col: str = "quality_keep",
    rounding: int | None = 6,
) -> DataFrame:
    """Append ``out_col`` = prior + mean token log-odds (see module
    docstring) and ``keep_col`` = score > 0. Documents with zero
    tokens score NULL (keep NULL) — there is no evidence either way,
    and NULL flows through the engine's missing-value machinery
    instead of inheriting the prior's sign silently."""
    import math

    clash = {out_col, keep_col} & set(docs.columns)
    if clash:
        raise ValueError(f"add_quality_score: columns exist: {sorted(clash)}")

    prior = math.log(stats["n_pos_docs"] / stats["n_neg_docs"])
    vp = float(k) * stats["vocab"]
    toks = _tokens(text_col)
    w = F.log(
        (F.coalesce(F.col("c_pos"), F.lit(0)) + F.lit(float(k)))
        / F.lit(stats["n_pos_tok"] + vp)
    ) - F.log(
        (F.coalesce(F.col("c_neg"), F.lit(0)) + F.lit(float(k)))
        / F.lit(stats["n_neg_tok"] + vp)
    )
    scored = (
        docs.select(F.col(id_col), F.explode(toks).alias("__tok"))
        .select(id_col, _h60(F.col("__tok")).alias("tok_h"))
        .join(F.broadcast(model), "tok_h", "left")
        .select(id_col, w.alias("__w"))
        .groupBy(id_col)
        .agg((F.lit(prior) + F.avg("__w")).alias(out_col))
    )
    out = docs.join(scored, id_col, "left")
    if rounding is not None:
        out = out.withColumn(out_col, F.round(F.col(out_col), rounding))
    return out.withColumn(keep_col, F.col(out_col) > 0)


def quality_score_sql(
    docs_src: str,
    label_expr: str,
    train_src: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    out_col: str = "quality_score",
    keep_col: str = "quality_keep",
    rounding: int = 6,
) -> str:
    """DuckDB mirror of train_quality_classifier + add_quality_score —
    full SELECT returning (id_col, out_col, keep_col). ``label_expr``
    is a boolean SQL expression over ``train_src`` columns (e.g.
    ``"lang = 'en'"``); ``train_src`` defaults to ``docs_src``
    (self-scoring fixture). Generated from the same normalization /
    hash / smoothing definitions as the Spark path."""
    train_src = train_src or docs_src
    kf = float(k)
    t_sql, w_sql = norm_tokens_sql(text_col)
    return f"""
WITH __qc_train AS (
    SELECT ({label_expr})::INT AS y,
           {w_sql} AS w, {t_sql} AS t
    FROM {train_src}
    WHERE ({label_expr}) IS NOT NULL),
__qc_docs AS (
    SELECT {id_col}, {w_sql} AS w, {t_sql} AS t
    FROM {docs_src}),
__qc_model AS (
    SELECT {h60_sql("tok")} AS tok_h,
           sum(y) AS c_pos, sum(1 - y) AS c_neg
    FROM (SELECT y, unnest(w) AS tok FROM __qc_train WHERE t <> '')
    GROUP BY 1),
__qc_tot AS (
    SELECT coalesce(sum(c_pos), 0) AS np,
           coalesce(sum(c_neg), 0) AS nn,
           count(*) + 1 AS v
    FROM __qc_model),
__qc_prior AS (
    -- mirror the Spark path's one-class ValueError: DuckDB returns
    -- NULL for 0/0 division, which would silently NULL every score
    SELECT CASE
             WHEN coalesce(sum(y), 0) = 0 OR coalesce(sum(1 - y), 0) = 0
             THEN error('quality_score_sql: both classes must be non-empty')
             ELSE ln(sum(y)::DOUBLE / sum(1 - y))
           END AS prior
    FROM __qc_train),
__qc_pairs AS (
    SELECT {id_col}, {h60_sql("tok")} AS tok_h
    FROM (SELECT {id_col}, unnest(w) AS tok
          FROM __qc_docs WHERE t <> '')),
__qc_scored AS (
    SELECT {id_col},
           (SELECT prior FROM __qc_prior)
           + avg(ln((coalesce(c_pos, 0) + {kf})
                    / ((SELECT np FROM __qc_tot) + {kf} * (SELECT v FROM __qc_tot)))
                 - ln((coalesce(c_neg, 0) + {kf})
                      / ((SELECT nn FROM __qc_tot) + {kf} * (SELECT v FROM __qc_tot)))
             ) AS s
    FROM __qc_pairs LEFT JOIN __qc_model USING (tok_h)
    GROUP BY 1)
SELECT d.{id_col},
       round(s.s, {rounding}) AS {out_col},
       (round(s.s, {rounding}) > 0) AS {keep_col}
FROM {docs_src} d LEFT JOIN __qc_scored s USING ({id_col})
"""
