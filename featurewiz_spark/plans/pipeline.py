"""The flagship north-rule pipelines.

`pages_feature_pipeline` — SURVEY.md §7.1 minimum end-to-end slice over
the Common-Crawl-style pages table ``(url, warc_ts, html, text, lang)``:
per (url, warc_ts) emit extracted text, n_chars signal, lag1, rolling
7-row mean, backward as-of joined latest-snapshot value with tolerance,
backfilled lang, gap-sessionized session id, calendar features.

Physical plan shape (what .explain should show):
  one Exchange (hashpartitioning url) → one Sort (url, warc_ts) → ALL
  window functions in a single Window chain sharing that sort, plus the
  as-of union pass on the same key. Projection-only features (calendar,
  text stats) ride along with zero extra shuffles. The html→text UDF is
  one ArrowEvalPython over the scan.

`events_feature_pipeline` — the same feature set over the driver's
events table (user_id as entity, ts as time), used by entry()/bench.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import WS_CLASS

from featurewiz_spark.operators.asof import asof_join
from featurewiz_spark.operators.timefeatures import add_calendar_features
from featurewiz_spark.operators.windows import (
    duration_between_rows,
    forward_fill,
    lag_lead,
    rolling_agg,
    sessionize,
)
from featurewiz_spark.text.extract import extract_text


def pages_feature_pipeline(
    pages: DataFrame,
    snapshots: DataFrame | None = None,
    gap: str = "30 minutes",
    tolerance: str = "7 days",
    extract: bool = True,
) -> DataFrame:
    """Materialize the per-(url, warc_ts) feature vector."""
    df = pages
    if extract:
        df = extract_text(df, "html", "extracted_text")
    df = df.withColumn("n_chars", F.length("text")).withColumn(
        "n_words", F.size(F.split(F.col("text"), WS_CLASS))
    )
    df = lag_lead(df, "url", "warc_ts", "n_chars", lags=[1], leads=[1])
    df = rolling_agg(df, "url", "warc_ts", "n_chars", window_rows=7, aggs=["avg"])
    df = forward_fill(df, "url", "warc_ts", ["lang"], flag=True)
    df = sessionize(df, "url", "warc_ts", gap=gap)
    df = duration_between_rows(df, "url", "warc_ts")
    df = add_calendar_features(df, "warc_ts", prefix="cal", crosses=False)
    if snapshots is not None:
        df = asof_join(
            df,
            snapshots,
            on="url",
            left_ts="warc_ts",
            right_ts="snap_ts",
            tolerance=tolerance,
            strict=True,
        )
    return df


def documents_curation_pipeline(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 5,
    max_punct_ratio: float = 0.5,
) -> DataFrame:
    """Training-data curation flagship over the documents table: exact
    dedup (keep the min-id doc per whitespace-normalized lowered
    content), quality gating (word count + punctuation ratio), language
    ID, content fingerprint.

    Plan shape: ONE shuffle total — dedup is a hash aggregate
    ``min_by(struct(row), id)`` per content hash, NOT a row_number
    window: the window puts EVERY copy of a duplicated document into
    one sorted task, and duplicates are the whole point of this stage —
    a boilerplate page repeated 10^8 times in a Common-Crawl corpus
    would be an unsplittable straggler. The aggregate's map-side
    partials collapse duplicates BEFORE the shuffle, so a hot content
    hash costs one row per map task regardless of its multiplicity.
    Everything after is a pure projection riding the same stage.
    """
    from featurewiz_spark.text.stats import (
        add_fingerprint,
        add_language_id,
        add_quality_features,
    )

    norm = F.lower(F.regexp_replace(F.col(text_col), WS_CLASS, " "))
    d = (
        docs.groupBy(F.md5(norm).alias("__h"))
        .agg(F.min_by(F.struct(*docs.columns), F.col(id_col)).alias("__r"))
        .select("__r.*")
    )
    d = add_quality_features(d, text_col)
    d = d.filter(
        (F.col("q_n_words") >= min_words)
        & (F.col("q_punct_ratio") <= max_punct_ratio)
    )
    d = add_language_id(d, text_col)
    return add_fingerprint(d, text_col)


def events_feature_pipeline(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """Flagship over the driver's events table: windowed features per
    (user_id, ts) + as-of join to the user's latest strictly-earlier
    purchase (point-in-time snapshot semantics, zero leakage).

    Operator order is a performance decision (results are identical —
    the as-of match and the window features are independent of each
    other): the as-of union pass runs FIRST, over the narrow base
    events, and the window-feature chain rides its (user_id) hash
    partitioning with no further exchange. The previous order (windows
    first, as-of last) re-shuffled every already-computed feature
    column through the union's exchange — 43 columns instead of 8, and
    2 exchanges of the events table instead of 1. A final select pins
    the original column order so downstream consumers see an unchanged
    schema."""
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("snap_ts"),
        F.col("value").alias("purchase_value"),
    )
    df = asof_join(
        events,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="snap_ts",
        tolerance="7 days",
        strict=True,
        suffix="_asof",
    )
    df = lag_lead(df, "user_id", "ts", "value", lags=[1], leads=[1],
                  tie_break=["event_id"])
    df = rolling_agg(df, "user_id", "ts", "value", window_rows=7, aggs=["avg", "sum"],
                     tie_break=["event_id"])
    df = rolling_agg(df, "user_id", "ts", "value", aggs=["cumsum"],
                     tie_break=["event_id"])
    df = sessionize(df, "user_id", "ts", gap=gap)
    df = duration_between_rows(df, "user_id", "ts")
    df = add_calendar_features(df, "ts", prefix="cal", crosses=False)
    asof_cols = ["purchase_value_asof", "snap_ts_asof"]
    return df.select(
        *[c for c in df.columns if c not in asof_cols], *asof_cols
    )


def featurewiz(
    spark,
    data,
    target,
    corr_limit: float = 0.70,
    feature_engg: str | list[str] | None = None,
    category_encoders: str | list[str] | None = None,
    **facade_kwargs,
):
    """F4 one-call functional API — the reference's ``featurewiz(dataname,
    target, ...)`` entry point (reference featurewiz/featurewiz.py:286-420):
    accepts a PATH (csv/parquet/feather/json, routed through the S1
    encoding-aware reader) or an existing DataFrame, runs the full facade
    (classify → engineer → encode → SULOV → recursive ranking), and
    returns ``(features, transformed_df)`` exactly like the reference's
    ``(features, trainm)`` pair. `target` may be a list (multi-label).

    The functional default corr_limit is 0.70 (featurewiz.py:389); the
    class API keeps 0.90. String args for feature_engg /
    category_encoders are accepted like the reference (single name or
    comma-separated).
    """
    from featurewiz_spark.plans.facade import FeatureWizSpark
    from featurewiz_spark.sources.readers import read_any

    def _as_list(v):
        if v is None:
            return []
        if isinstance(v, str):
            return [s.strip() for s in v.split(",") if s.strip()]
        return list(v)

    df = data if isinstance(data, DataFrame) else read_any(spark, data)
    fw = FeatureWizSpark(
        corr_limit=corr_limit,
        feature_engg=_as_list(feature_engg),
        category_encoders=_as_list(category_encoders),
        **facade_kwargs,
    )
    out = fw.fit_transform(df, target)
    return fw.features, out


def web_curation_pipeline(
    docs: DataFrame,
    bench: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    lm_threshold: float = 4.95,
    decontam_n: int = 8,
    temperature: float = 0.5,
    target_frac: float = 0.5,
) -> DataFrame:
    """RefinedWeb/CCNet-shaped END-TO-END web curation — the composed
    proof that the LLM-pipeline operators chain: exact dedup →
    self-trained bigram-LM perplexity filter → benchmark
    decontamination (drop mode) → temperature-scaled stratum
    rebalancing. Output: surviving (id, stratum, lm_bits_per_token,
    mix_rate) rows.

    Plan shape at 100 TB: ONE dedup shuffle (min_by aggregate, map-side
    partials collapse a 10^8-copy boilerplate page — same rationale as
    `documents_curation_pipeline`); the LM model and benchmark gram set
    are vocabulary-/benchmark-bounded BROADCAST tables so the corpus is
    never reshuffled by scoring or decontamination; mixing adds no data
    shuffle (only the per-stratum count table hits the driver). The
    cleaned frame is persisted before mixing because mixing's count
    aggregation and the final projection both consume it.

    LM threshold compares the ROUNDED (6 dp) score, and NULL scores
    (docs with <2 tokens) are dropped by the comparison — both exactly
    mirrored by the composed SQL oracle (q92).
    """
    from featurewiz_spark.cache import scoped_persist
    from featurewiz_spark.operators.sampling import temperature_mixing_sample
    from featurewiz_spark.text.decontam import decontaminate
    from featurewiz_spark.text.lm import add_lm_score, train_bigram_lm

    norm = F.lower(F.regexp_replace(F.col(text_col), WS_CLASS, " "))
    d = (
        docs.groupBy(F.md5(norm).alias("__h"))
        .agg(F.min_by(F.struct(*docs.columns), F.col(id_col)).alias("__r"))
        .select("__r.*")
    )
    # persist BEFORE the LM: the dedup shuffle otherwise re-executes
    # for the unigram-count action, the bigram table, and the scoring
    # scan (the measured multi-consumer 3.8x recompute cache.py exists
    # to prevent)
    d = scoped_persist(d)
    uni, big = train_bigram_lm(d, text_col=text_col)
    d = add_lm_score(d, uni, big, text_col=text_col, id_col=id_col)
    d = d.filter(F.col("lm_bits_per_token") <= lm_threshold)
    d = decontaminate(
        d, bench, text_col=text_col, id_col=id_col, n=decontam_n,
        mode="drop",
    )
    d = scoped_persist(d)
    out_cols = [id_col, strata_col, "lm_bits_per_token", "mix_rate"]
    if d.where(F.col(strata_col).isNotNull()).limit(1).count() == 0:
        # zero survivors, OR survivors whose strata are all NULL: the
        # SQL mirror's count CTE is empty in both cases and the final
        # `WHERE mix_keep` (NULL for NULL strata) returns no rows — so
        # must we; temperature_mixing_sample would instead raise on an
        # empty count table
        return d.limit(0).withColumn(
            "mix_rate", F.lit(None).cast("double")
        ).select(*out_cols)
    d = temperature_mixing_sample(
        d, strata_col, id_col, temperature=temperature,
        target_frac=target_frac,
    )
    return d.filter(F.col("mix_keep")).select(*out_cols)
