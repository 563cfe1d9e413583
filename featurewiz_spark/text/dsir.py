"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

The standard published recipe for selecting LLM pretraining documents
that "look like" a small high-quality target corpus: featurize every
document as a bag of HASHED unigrams+bigrams over ``m`` buckets, fit
two smoothed bucket distributions (target ``p``, raw ``q``), score each
raw document with the importance log-weight

    logw(d) = sum_{gram in d} [ ln p(bucket(gram)) - ln q(bucket(gram)) ]

and resample without replacement via the Gumbel top-k trick:
``key = logw/temperature + Gumbel(doc)``, keep the ``k`` largest keys.
featurewiz has no corpus-selection operators — this is an
LLM-training-data-pipeline addition per the builder's brief (same
family as text/classifier.py's GPT-3-style quality filter, but
unsupervised on the raw side: no labels, just a target corpus).

Scale shape at 10^12 docs:

- Fit: ONE explode + hash aggregate per corpus, keyed by the bucket id
  — at most ``m`` (default 2048) distinct keys, so map-side partials
  collapse everything and the shuffle is O(m x partitions) bytes. The
  fitted model is a driver-side list of ``m`` doubles (the same "tiny
  fitted table" contract as lm.py / classifier.py).
- Score: ZERO shuffles. The lambda table rides the plan as an
  ``m``-slot array literal (the langid pattern); per-doc scoring is a
  projection — tokenize, hash, fold. Selection is
  ``orderBy(key).limit(k)`` = TakeOrderedAndProject (per-partition
  top-k + driver merge of k-row heaps), never a global sort.

Cross-engine exactness (the driver hashes values with NO slack):

- Gram hashing uses the portable md5-60 family % m — identical bucket
  ids in Spark and DuckDB (shared ``h60`` definition, text/_norm.py).
- lambda_b = round(ln((tc+1)/(T+m)) - ln((rc+1)/(R+m)), 9) + 0.0 is
  computed IN-PLAN by Spark and mirrored term-for-term in SQL: counts
  and totals are exact integers, the long->double divisions are
  IEEE-exact-rounded on both engines, and round-to-9 absorbs the
  sub-ULP jitter of the two ``ln`` calls (the house libm discipline).
  The trailing ``+ 0.0`` canonicalizes IEEE -0.0 (q08/q09 precedent).
- Per-doc logw is a LEFT FOLD over the bucket-sorted gram multiset:
  Spark ``F.aggregate(array_sort(buckets), 0.0, +)`` vs DuckDB
  ``sum(lam ORDER BY b)``. Equal buckets carry the identical lambda,
  so the sorted fold order is fully determined and the two sums are
  bit-identical (validated: 0 mismatches over adversarial fixtures).
- Gumbel noise is derandomized: u = ((md5_60(id || ':gumbel') % 2^53)
  + 0.5) / 2^53 is EXACT double arithmetic (every intermediate is a
  representable integer or half-integer), g = round(-ln(-ln(u)), 9).

Reference parity note: the reference repo (AutoViML/featurewiz) has no
corpus-selection surface; the semantics here follow the DSIR paper's
hashed n-gram + Laplace-smoothed bag model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import (
    h60,
    h60_sql,
    norm_tokens,
    norm_tokens_sql,
)

_TWO53 = 2**53  # largest power of two whose integers are all exact doubles


def _gram_buckets(text_col: str, m: int):
    """Array<long> of hashed-gram bucket ids: one entry per unigram and
    per bigram of the normalized token stream (a multiset — repeated
    grams count once per occurrence, as the DSIR bag model requires).
    Empty/whitespace/NULL text yields an empty array."""
    t, toks = norm_tokens(text_col)
    uni = F.transform(toks, lambda w: h60(w) % m)
    bi_idx = F.when(
        (F.length(t) > 0) & (F.size(toks) >= 2),
        F.sequence(F.lit(0), F.size(toks) - 2),
    ).otherwise(F.array().cast("array<int>"))
    bi = F.transform(
        bi_idx,
        lambda i: h60(F.concat_ws(" ", F.get(toks, i), F.get(toks, i + 1))) % m,
    )
    return F.concat(uni, bi)


def dsir_fit(
    target: DataFrame,
    raw: DataFrame,
    text_col: str = "text",
    m: int = 2048,
) -> tuple[list[float], dict]:
    """Fit the hashed-bigram importance model. Returns
    ``(lam, stats)``: ``lam[b]`` is the per-bucket log-ratio
    ln p̂(b) − ln q̂(b) (Laplace α=1, rounded to 9 dp in-plan so the
    SQL mirror reproduces it bit-for-bit) for every bucket 0..m-1,
    ``stats`` = {t_grams, r_grams, m}. Raises on an empty gram set on
    either side — a one-sided "model" would score everything with the
    smoothing floor."""
    def counts(df: DataFrame, name: str) -> DataFrame:
        return (
            df.select(F.explode(_gram_buckets(text_col, m)).alias("b"))
            .groupBy("b")
            .agg(F.count(F.lit(1)).alias(name))
        )

    # ONE corpus scan per side: collect the <=m-row count tables once
    # and derive the totals driver-side (they are the sums of the
    # collected counts) — a separate agg job would re-execute the whole
    # explode+groupBy lineage over the corpus
    tc_map = {
        int(r["b"]): int(r["tc"]) for r in counts(target, "tc").collect()
    }
    rc_map = {int(r["b"]): int(r["rc"]) for r in counts(raw, "rc").collect()}
    tot_t, tot_r = sum(tc_map.values()), sum(rc_map.values())
    if tot_t == 0 or tot_r == 0:
        raise ValueError(
            "dsir_fit: the %s corpus produced zero grams — fit needs "
            "non-empty text on both sides"
            % ("target" if tot_t == 0 else "raw")
        )
    # lambda stays IN-PLAN (a tiny local m-row job) so the ln/round
    # arithmetic is the same engine path the SQL mirror reproduces
    spark = target.sparkSession
    local = spark.createDataFrame(
        [(b, tc_map.get(b, 0), rc_map.get(b, 0)) for b in range(m)],
        "b int, tc long, rc long",
    )
    lam_col = (
        F.round(
            F.log((F.col("tc") + 1).cast("double") / F.lit(float(tot_t + m)))
            - F.log((F.col("rc") + 1).cast("double") / F.lit(float(tot_r + m))),
            9,
        )
        + F.lit(0.0)
    ).alias("lam")
    lam = [0.0] * m
    for row in local.select("b", lam_col).collect():
        lam[int(row["b"])] = float(row["lam"])
    return lam, {"t_grams": tot_t, "r_grams": tot_r, "m": m}


def _gumbel_key(id_col: str, logw, temperature: float):
    """Derandomized Gumbel key: logw/T + round(-ln(-ln(u)), 9) with u
    an exact-double md5 uniform in (0, 1) derived from the id."""
    u = (
        (h60(F.concat(F.col(id_col).cast("string"), F.lit(":gumbel")))
         % F.lit(_TWO53)).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_TWO53))
    g = F.round(-F.log(-F.log(u)), 9) + F.lit(0.0)
    return logw / F.lit(float(temperature)) + g


def dsir_score(
    docs: DataFrame,
    lam: list[float],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "dsir_logw",
    key_col: str = "dsir_key",
    temperature: float | None = 1.0,
    rounding: int | None = 6,
) -> DataFrame:
    """Append ``out_col`` (importance log-weight) and ``key_col`` (the
    Gumbel resampling key; = ``out_col`` when ``temperature`` is None,
    i.e. deterministic head selection) to ``docs``. Zero shuffles —
    the model is an array literal and scoring is a projection. Keys
    are computed from the UNROUNDED log-weight, then both columns are
    rounded (``rounding`` dp, -0.0 canonicalized) for output."""
    clash = {out_col, key_col} & set(docs.columns)
    if clash:
        raise ValueError(f"dsir_score: columns exist: {sorted(clash)}")
    m = len(lam)
    lam_arr = F.array(*[F.lit(float(v)) for v in lam])
    logw = F.aggregate(
        F.array_sort(_gram_buckets(text_col, m)),
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(lam_arr, (b + 1).cast("int")),
    )
    out = docs.withColumn(out_col, logw)
    key = (
        F.col(out_col)
        if temperature is None
        else _gumbel_key(id_col, F.col(out_col), temperature)
    )
    out = out.withColumn(key_col, key)
    if rounding is not None:
        out = out.withColumns(
            {
                out_col: F.round(out_col, rounding) + F.lit(0.0),
                key_col: F.round(key_col, rounding) + F.lit(0.0),
            }
        )
    return out


def dsir_resample(
    docs: DataFrame,
    target: DataFrame,
    k: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = 2048,
    temperature: float | None = 1.0,
    rounding: int = 6,
) -> DataFrame:
    """End-to-end DSIR: fit on (target, docs), score docs, keep the k
    largest keys (ties at ``rounding`` dp broken by ascending id —
    fully deterministic, identical in the SQL mirror). The selection
    is a TakeOrderedAndProject, never a global sort."""
    lam, _ = dsir_fit(target, docs, text_col=text_col, m=m)
    scored = dsir_score(
        docs, lam, text_col=text_col, id_col=id_col,
        temperature=temperature, rounding=rounding,
    )
    return scored.orderBy(F.desc("dsir_key"), F.asc(id_col)).limit(k)


def dsir_sql(
    docs_src: str,
    target_src: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m: int = 2048,
    temperature: float | None = 1.0,
    k: int | None = None,
    rounding: int = 6,
) -> str:
    """DuckDB mirror of dsir_fit + dsir_score (+ the top-k cut when
    ``k`` is given) — full SELECT returning
    (id_col, dsir_logw, dsir_key). Generated from the same tokenizer /
    md5-60 / smoothing / fold-order definitions as the Spark path."""
    t_sql, w_sql = norm_tokens_sql(text_col)

    def gram_b(src: str, ident: str, tag: str) -> str:
        base = f"SELECT {ident}, {w_sql} AS w, {t_sql} AS t FROM {src}"
        return f"""
    SELECT {ident}, {h60_sql('tok')} % {m} AS b
    FROM (
      SELECT {ident}, unnest(w) AS tok FROM ({base}) {tag}1 WHERE t <> ''
      UNION ALL
      SELECT {ident}, w[i] || ' ' || w[i+1] AS tok
      FROM ({base}) {tag}2,
           LATERAL unnest(generate_series(1, len(w) - 1)) AS {tag}g(i)
      WHERE t <> '' AND len(w) >= 2
    ) {tag}u"""

    if temperature is None:
        u_expr = "0.5"  # never read; keeps the subquery shape identical
        key_raw = "logw_raw"
    else:
        coin = h60_sql(id_col + "::VARCHAR || ':gumbel'")
        u_expr = (
            f"((({coin}) % {_TWO53})::DOUBLE + 0.5) / {float(_TWO53)!r}"
        )
        key_raw = (
            f"logw_raw / {float(temperature)!r}"
            f" + (round(-ln(-ln(u)), 9) + 0.0)"
        )
    tail = (
        f"\nORDER BY dsir_key DESC, {id_col} ASC\nLIMIT {k}" if k is not None else ""
    )
    return f"""
WITH __dsir_tb AS ({gram_b(target_src, '1 AS one', '__dt')}),
__dsir_rb AS ({gram_b(docs_src, id_col, '__dr')}),
__dsir_tc AS (SELECT b, count(*) AS c FROM __dsir_tb GROUP BY b),
__dsir_rc AS (SELECT b, count(*) AS c FROM __dsir_rb GROUP BY b),
__dsir_tot AS (SELECT (SELECT count(*) FROM __dsir_tb) AS tt,
                      (SELECT count(*) FROM __dsir_rb) AS rt),
__dsir_w AS (
  SELECT r.range AS b,
         round(ln((coalesce(tc.c, 0) + 1)::DOUBLE / (tot.tt + {m})::DOUBLE)
             - ln((coalesce(rc.c, 0) + 1)::DOUBLE / (tot.rt + {m})::DOUBLE), 9)
           + 0.0 AS lam
  FROM range({m}) r
  CROSS JOIN __dsir_tot tot
  LEFT JOIN __dsir_tc tc ON tc.b = r.range
  LEFT JOIN __dsir_rc rc ON rc.b = r.range),
__dsir_s AS (
  SELECT {id_col}, sum(lam ORDER BY b) AS logw
  FROM __dsir_rb JOIN __dsir_w USING (b) GROUP BY {id_col}),
__dsir_keyed AS (
  SELECT {id_col}, logw_raw, {key_raw} AS key_raw
  FROM (SELECT d.{id_col}, coalesce(s.logw, 0.0) AS logw_raw,
               {u_expr} AS u
        FROM {docs_src} d LEFT JOIN __dsir_s s USING ({id_col})) sc)
SELECT {id_col},
       round(logw_raw, {rounding}) + 0.0 AS dsir_logw,
       round(key_raw, {rounding}) + 0.0 AS dsir_key
FROM __dsir_keyed{tail}"""
