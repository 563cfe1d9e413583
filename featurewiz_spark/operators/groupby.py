"""Group aggregation feature generators (SURVEY.md §2.4).

Pattern: one hash aggregate (map-side partial + final) per categorical
key, then a broadcast left join back to the row table (reference J1 —
pd.merge of the agg table, my_encoders.py:570-607). The agg table has one
row per category (≤ cat_limit by construction) so the join is always
broadcastable; hot-key skew cannot occur on the build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from featurewiz_spark.cache import scoped_persist

_KEY = "__fw_gb_key"


def _null_safe_merge_back(df: DataFrame, c: str, tbl: DataFrame) -> DataFrame:
    """Broadcast left join of a fitted per-category table, matching the
    NULL category too — pandas merge treats NaN keys as equal
    (reference J1 semantics), while Spark's equality join silently gives
    NULL-category rows no features. The fitted key is renamed to a
    reserved name pre-join so dropping it can never remove a user
    column."""
    t = tbl.withColumnRenamed(c, _KEY)
    return df.join(
        broadcast(t), on=df[c].eqNullSafe(t[_KEY]), how="left"
    ).drop(_KEY)

# agg name → builder(col) (reference func_set, my_encoders.py:495-497)
_AGG_BUILDERS = {
    "count": lambda c: F.count(c),
    "sum": lambda c: F.sum(c),
    "mean": lambda c: F.avg(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
    "median": lambda c: F.expr(f"percentile(`{c}`, 0.5)"),
    "std": lambda c: F.stddev(c),
    "var": lambda c: F.variance(c),
    "skew": lambda c: F.skewness(c),
    "kurt": lambda c: F.kurtosis(c),
    "mode": lambda c: F.mode(c),
    "prod": lambda c: F.product(c),
    "sem": lambda c: F.stddev(c) / F.sqrt(F.count(c)),
    "quantile25": lambda c: F.expr(f"percentile(`{c}`, 0.25)"),
    "quantile75": lambda c: F.expr(f"percentile(`{c}`, 0.75)"),
}

# 100TB scale path: exact percentile forces ObjectHashAggregate (no
# whole-stage codegen — see BENCH/PLAN_AUDIT.md q01 note); the approx
# variants keep codegen with bounded relative error. Selected via
# groupby_aggregate(..., percentile_mode="approx").
_APPROX_PERCENTILES = {
    "median": lambda c: F.percentile_approx(c, 0.5),
    "quantile25": lambda c: F.percentile_approx(c, 0.25),
    "quantile75": lambda c: F.percentile_approx(c, 0.75),
}

CUMULATIVE = {"cumsum": "sum", "cumprod": "product", "cummax": "max", "cummin": "min"}


def groupby_aggregate(
    df: DataFrame,
    cat_cols: list[str],
    num_cols: list[str],
    aggs: list[str] = ("mean",),
    drop_zero_variance: bool = True,
    percentile_mode: str = "exact",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """A1 Groupby_Aggregator (reference my_encoders.py:453-618): for each
    categorical c and numeric n and agg f, add column ``{n}_by_{c}_{f}``
    via groupBy(c).agg + broadcast left join back.

    percentile_mode='exact' (default) matches pandas median bit-for-bit
    but runs as ObjectHashAggregate (no codegen); 'approx' uses
    percentile_approx — the 100TB path, keeping whole-stage codegen at
    bounded relative error.

    `mad` (mean absolute deviation) needs a two-pass plan and is exposed
    separately via :func:`groupby_mad`. cum* functions are window ops —
    see :func:`cumulative_by_group`.

    Returns (result_df, fitted_tables) — fitted_tables are the per-cat
    aggregate DataFrames, replayed on test via the same join (J4: unseen
    keys → NULL, caller decides the fill policy).
    """
    out = df
    fitted: dict[str, DataFrame] = {}
    for c in cat_cols:
        exprs = []
        for n in num_cols:
            for a in aggs:
                if a in CUMULATIVE:
                    continue
                builder = (
                    _APPROX_PERCENTILES[a]
                    if percentile_mode == "approx" and a in _APPROX_PERCENTILES
                    else _AGG_BUILDERS[a]
                )
                exprs.append(builder(n).alias(f"{n}_by_{c}_{a}"))
        if not exprs:
            continue
        # persist the (≤cat_limit-row) aggregate: the zero-variance
        # stats action and the merge-back join would otherwise each
        # re-run the full groupBy scan of df (the lazy-plan
        # re-execution pathology); released via cache.release_caches()
        agg_tbl = scoped_persist(df.groupBy(c).agg(*exprs))
        if drop_zero_variance:
            # drop generated cols whose variance across categories is 0
            # (reference my_encoders.py:554-561)
            gen = [f.name for f in agg_tbl.schema.fields if f.name != c]
            stats = agg_tbl.agg(
                *[F.variance(F.col(g).cast("double")).alias(g) for g in gen]
            ).first()
            keep = [g for g in gen if stats[g] is None or stats[g] > 0]
            agg_tbl = agg_tbl.select(c, *keep)
        fitted[c] = agg_tbl
        out = _null_safe_merge_back(out, c, agg_tbl)
    return out, fitted


def apply_fitted_aggregates(
    df: DataFrame, fitted: dict[str, DataFrame], fill: float | None = 0.0
) -> DataFrame:
    """J4 train→test transfer: replay fitted aggregate tables on a new
    DataFrame; unseen keys → `fill` (reference my_encoders.py:774-797,
    fillna(0) at :816-817). This is the leakage boundary: aggregates are
    computed on train only."""
    out = df
    for c, tbl in fitted.items():
        gen = [f.name for f in tbl.schema.fields if f.name != c]
        # null-safe like the fit path: a NULL category is a SEEN key
        # (its fitted row exists) and must encode identically at fit and
        # transform — only genuinely unseen keys take the fill
        out = _null_safe_merge_back(out, c, tbl)
        if fill is not None:
            out = out.withColumns(
                {g: F.coalesce(F.col(g), F.lit(fill)) for g in gen}
            )
    return out


def groupby_mad(df: DataFrame, cat: str, num: str) -> DataFrame:
    """Mean absolute deviation by group — two-pass: group means, join,
    then mean(|x-mean|). Reference 'mad' in func_set
    (my_encoders.py:495-497, pandas Series.mad)."""
    means = df.groupBy(cat).agg(F.avg(num).alias("__mu"))
    return (
        df.join(broadcast(means), on=cat)
        .groupBy(cat)
        .agg(F.avg(F.abs(F.col(num) - F.col("__mu"))).alias(f"{num}_by_{cat}_mad"))
    )


def cumulative_by_group(
    df: DataFrame, keys: str | list[str], ts: str, num: str,
    funcs: list[str] = ("cumsum",), tie_break: list[str] | None = None,
) -> DataFrame:
    """cum* members of the reference func_set as ordered windows."""
    kl = [keys] if isinstance(keys, str) else list(keys)
    order = [F.col(ts)] + [F.col(c) for c in (tie_break or [])]
    w = (
        Window.partitionBy(*kl)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for f in funcs:
        base = CUMULATIVE[f]
        out = out.withColumn(f"{num}_{f}", getattr(F, base)(num).over(w))
    return out


def group_row_counts(
    df: DataFrame, keys: str | list[str], cols: list[str] | None = None,
    include_nulls: bool = False,
) -> DataFrame:
    """A3/A4 per-group row counts (FE_count_rows_for_all_columns_by_group,
    reference featurewiz/featurewiz.py:1986-2019)."""
    kl = [keys] if isinstance(keys, str) else list(keys)
    if include_nulls or not cols:
        return df.groupBy(*kl).agg(F.count(F.lit(1)).alias("row_count"))
    return df.groupBy(*kl).agg(
        *[F.count(c).alias(f"row_count_{c}") for c in cols]
    )


def trend_seasonality(
    df: DataFrame, cat: str, ts: str, value: str,
    trend_col: str = "trend", season_col: str = "seasonality",
) -> DataFrame:
    """A9 trend/seasonality ratios (TS_Trend_Seasonality_Transformer,
    reference my_encoders.py:1743-1797): trend = sum(value) by (cat, ts)
    / sum(value) by ts; seasonality = value / trend.

    Spark-first: TWO HASH AGGREGATES + a join back — not window sums.
    ``sum(value) over (partitionBy(ts))`` would put every row sharing a
    timestamp into ONE window task with no partial aggregation; at
    100 TB with daily/hourly granularity one ts = billions of rows = an
    unsplittable straggler. Hash aggregates get map-side partials (dup
    timestamps collapse before the shuffle), the per-(cat,ts) trend
    table is tiny (one row per group) so the merge-back join is
    broadcastable, and AQE sizes everything else. Joins are null-safe:
    window partitionBy groups NULL keys together, and a plain equi-join
    would silently give NULL-cat/ts rows no trend.

    try_divide: under Spark 4's default ANSI mode a zero denominator
    (all values zero for a ts, or cancelling signs) would THROW
    DIVIDE_BY_ZERO and abort the job; we yield NULL instead (pandas
    yields inf/NaN there — NULL flows through the engine's
    missing-value machinery rather than poisoning downstream features;
    deviation documented).
    """
    kc, kt = "__fw_tr_cat", "__fw_tr_ts"
    sct = df.groupBy(
        F.col(cat).alias(kc), F.col(ts).alias(kt)
    ).agg(F.sum(value).alias("__sct"))
    st = df.groupBy(F.col(ts).alias(kt)).agg(F.sum(value).alias("__st"))
    tbl = (
        sct.join(st.withColumnRenamed(kt, f"{kt}2"),
                 on=sct[kt].eqNullSafe(F.col(f"{kt}2")), how="left")
        .select(kc, kt, F.try_divide(F.col("__sct"), F.col("__st")).alias("__tr"))
    )
    out = df.join(
        tbl,
        on=df[cat].eqNullSafe(tbl[kc]) & df[ts].eqNullSafe(tbl[kt]),
        how="left",
    ).drop(kc, kt)
    return out.withColumn(trend_col, F.col("__tr")).withColumn(
        season_col, F.try_divide(F.col(value), F.col("__tr"))
    ).drop("__tr")


def ranking_aggregate(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    method: str = "dense",
    out_col: str | None = None,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """W5 Ranking_Aggregator (reference my_encoders.py:628-830, rank call
    :745-751): rank rows within (keys) by order_col.

    method ∈ {min: rank, dense: dense_rank, first: row_number,
    average: rank + (tie_count-1)/2, percent: percent_rank}.

    tie_break applies ONLY to method='first' (row_number needs a total
    order): for the shared-tie methods, ranking over (order_col +
    tie_break) would RESOLVE the ties pandas rank() shares — e.g.
    values [5, 5] must both rank 1.5 under 'average', not 1.5/2.5.
    """
    out_col = out_col or f"{order_col}_rank_{method}"
    w = Window.partitionBy(*keys).orderBy(F.col(order_col))
    if method == "min":
        e = F.rank().over(w)
    elif method == "dense":
        e = F.dense_rank().over(w)
    elif method == "first":
        order = [F.col(order_col)] + [F.col(c) for c in (tie_break or [])]
        e = F.row_number().over(Window.partitionBy(*keys).orderBy(*order))
    elif method == "percent":
        e = F.percent_rank().over(w)
    elif method == "average":
        tie_w = Window.partitionBy(*keys, order_col)
        e = F.rank().over(w) + (F.count(F.lit(1)).over(tie_w) - 1) / 2.0
    else:
        raise ValueError(method)
    return df.withColumn(out_col, e)
