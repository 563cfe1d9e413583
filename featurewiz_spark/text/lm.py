"""Distributed n-gram language-model quality scoring.

CCNet (Wenzek et al. 2020) and Gopher both rank web documents by the
perplexity of a small language model — fluent prose scores low,
boilerplate/gibberish scores high — and keep the low-perplexity head.
This module re-derives that signal as a pure DataFrame plan: an add-k
smoothed bigram LM whose "training" is two hash aggregates over a
reference corpus and whose "scoring" is explode -> left join -> mean
log-probability.

Model (classic add-k bigram, Jurafsky & Martin ch. 3):

    P(w | v) = (c(v w) + k) / (c(v) + k * V)

with c(v w) the bigram count, c(v) the unigram count of the prefix in
the reference corpus, V = |training vocabulary| + 1 (the +1 is the
out-of-vocabulary bucket; unseen tokens/bigrams simply contribute
their smoothed floor through the coalesce-to-0 left joins). The score
is bits per token:

    lm_bits_per_token = -(1/N) * sum log2 P(w_i | w_{i-1})

over the N = n_tokens - 1 bigrams of the document; documents with
fewer than 2 tokens get NULL.

Scale shape at 10^12 docs:

- Training: two hash aggregates (token counts, bigram counts) with
  map-side partials — the LM table size is vocabulary-bounded, not
  corpus-bounded.
- Scoring: explode bigrams -> shuffle LEFT join against the bigram
  table -> one hash aggregate back to doc_id. Join keys are md5-60
  hashes (8 bytes), not gram strings, cutting shuffle width; the
  unigram table is usually small enough to broadcast
  (``broadcast_unigrams=True``).
- 60-bit hash collisions merge two grams' counts (~n^2/2^61 — at 10^8
  vocabulary entries that is ~0.002 expected collisions); both engines
  hash identically so the oracle verifies the exact hashed pipeline.
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


def _bigrams(toks):
    """Array of 'v w' strings for adjacent token pairs."""
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat(
            F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
        ),
    )


def _bigram_structs(toks):
    """(big, pre) struct per adjacent pair — scoring needs BOTH the
    bigram and its prefix token; carrying the prefix from the token
    array avoids a per-bigram regexp re-derivation on the scan's hot
    path (the SQL mirror already uses w[i] directly)."""
    idx = F.when(
        F.size(toks) >= 2, F.sequence(F.lit(1), F.size(toks) - 1)
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.struct(
            F.concat(
                F.element_at(toks, i), F.lit(" "), F.element_at(toks, i + 1)
            ).alias("big"),
            F.element_at(toks, i).alias("pre"),
        ),
    )


def train_bigram_lm(
    corpus: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """(unigram_counts, bigram_counts) over the reference corpus —
    columns (tok_h, c_tok) and (big_h, c_big), keys md5-60 hashed.
    Two hash aggregates; both tables are vocabulary-bounded."""
    toks = _tokens(text_col)
    uni = (
        corpus.select(F.explode(toks).alias("__tok"))
        .groupBy(_h60(F.col("__tok")).alias("tok_h"))
        .agg(F.count(F.lit(1)).alias("c_tok"))
    )
    big = (
        corpus.select(F.explode(_bigrams(toks)).alias("__big"))
        .groupBy(_h60(F.col("__big")).alias("big_h"))
        .agg(F.count(F.lit(1)).alias("c_big"))
    )
    return uni, big


def add_lm_score(
    docs: DataFrame,
    unigram_counts: DataFrame,
    bigram_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.1,
    vocab_size: int | None = None,
    out_col: str = "lm_bits_per_token",
    broadcast_unigrams: bool = True,
    rounding: int | None = 6,
) -> DataFrame:
    """Append ``out_col`` = add-k bigram bits-per-token under the
    trained LM (see module docstring). ``vocab_size`` defaults to
    ``unigram_counts.count() + 1`` (a driver-side count of the SMALL
    LM table, not the corpus). NULL for docs with < 2 tokens.

    Both LM tables are scoped_persist-ed: the default vocab_size count
    materializes the unigram aggregate once and the scoring joins then
    reuse both tables instead of re-tokenizing the reference corpus
    per consumer. Callers release via cache.release_caches() /
    cache_scope() after materializing (see featurewiz_spark.cache)."""
    if out_col in docs.columns:
        raise ValueError(f"add_lm_score: column {out_col!r} already exists")
    unigram_counts = scoped_persist(unigram_counts)
    bigram_counts = scoped_persist(bigram_counts)
    if vocab_size is None:
        vocab_size = unigram_counts.count() + 1
    toks = _tokens(text_col)
    uni = unigram_counts
    if broadcast_unigrams:
        uni = F.broadcast(uni)

    pairs = docs.select(
        F.col(id_col), F.explode(_bigram_structs(toks)).alias("__bp")
    ).select(
        id_col,
        _h60(F.col("__bp.big")).alias("big_h"),
        _h60(F.col("__bp.pre")).alias("tok_h"),
    )
    scored = (
        pairs.join(bigram_counts, "big_h", "left")
        .join(uni, "tok_h", "left")
        .select(
            id_col,
            (
                -F.log2(
                    (F.coalesce(F.col("c_big"), F.lit(0)) + F.lit(float(k)))
                    / (
                        F.coalesce(F.col("c_tok"), F.lit(0))
                        + F.lit(float(k) * vocab_size)
                    )
                )
            ).alias("__bits"),
        )
        .groupBy(id_col)
        .agg(F.avg("__bits").alias(out_col))
    )
    out = docs.join(scored, id_col, "left")
    if rounding is not None:
        out = out.withColumn(out_col, F.round(F.col(out_col), rounding))
    return out


def lm_score_sql(
    docs_src: str,
    train_src: str | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.1,
    out_col: str = "lm_bits_per_token",
    rounding: int = 6,
) -> str:
    """DuckDB mirror of train_bigram_lm + add_lm_score — full SELECT
    returning (id_col, out_col). ``train_src`` defaults to
    ``docs_src`` (self-scoring, the q82 fixture). Generated from the
    same normalization / bigram / hash / smoothing definitions."""
    train_src = train_src or docs_src

    def toks_cte(src: str, name: str, ident: str) -> str:
        t_sql, w_sql = norm_tokens_sql(text_col)
        return f"""{name} AS (
    SELECT {ident},
           {w_sql} AS w,
           {t_sql} AS t
    FROM {src})"""

    return f"""
WITH {toks_cte(train_src, "__lm_train", "1 AS one")},
{toks_cte(docs_src, "__lm_docs", id_col)},
__lm_uni AS (
    SELECT {h60_sql("tok")} AS tok_h, count(*) AS c_tok
    FROM (SELECT unnest(w) AS tok FROM __lm_train WHERE t <> '')
    GROUP BY 1),
__lm_big AS (
    SELECT {h60_sql("big")} AS big_h, count(*) AS c_big
    FROM (SELECT w[i] || ' ' || w[i+1] AS big
          FROM __lm_train, LATERAL unnest(generate_series(1, len(w)-1)) AS g(i)
          WHERE t <> '' AND len(w) >= 2)
    GROUP BY 1),
__lm_v AS (SELECT count(*) + 1 AS v FROM __lm_uni),
__lm_pairs AS (
    SELECT {id_col},
           {h60_sql("w[i] || ' ' || w[i+1]")} AS big_h,
           {h60_sql("w[i]")} AS tok_h
    FROM __lm_docs, LATERAL unnest(generate_series(1, len(w)-1)) AS g(i)
    WHERE t <> '' AND len(w) >= 2),
__lm_scored AS (
    SELECT {id_col},
           avg(-log2((coalesce(c_big, 0) + {float(k)})
                     / (coalesce(c_tok, 0) + {float(k)} * v))) AS raw
    FROM __lm_pairs
    LEFT JOIN __lm_big USING (big_h)
    LEFT JOIN __lm_uni USING (tok_h)
    CROSS JOIN __lm_v
    GROUP BY {id_col})
SELECT d.{id_col}, round(s.raw, {rounding}) AS {out_col}
FROM {docs_src} d LEFT JOIN __lm_scored s USING ({id_col})
"""
