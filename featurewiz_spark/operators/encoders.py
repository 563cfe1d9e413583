"""Categorical encoders + cleaning (SURVEY.md §2.10, §2.4 A5–A8).

Every encoder fits a SMALL per-category table (≤ cat_limit rows) on the
train DataFrame and applies it with a broadcast left join — the fitted
state is a DataFrame, never a driver-side Python dict, so fit scales with
category count, not row count. Unseen-category policies are explicit and
mirror the reference.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

_KEY = "__fw_key"


def _join_fitted(df: DataFrame, col: str, fitted: DataFrame, how: str = "left") -> DataFrame:
    """Broadcast-left-join a fitted ('value' → encodings) table on `col`
    without capturing user columns: the fitted key is renamed to a
    reserved name pre-join, so the post-join drop can never remove a
    user column that happens to be called 'value' (e.g. the events
    table's literal `value` measure — bug caught by driver query q60)."""
    f = fitted.withColumnRenamed("value", _KEY)
    return df.join(broadcast(f), on=df[col].eqNullSafe(f[_KEY]), how=how).drop(_KEY)


def label_encode(
    df: DataFrame, col: str, order_col: str | None = None,
    max_categories: int | None = 2_000_000,
) -> tuple[DataFrame, DataFrame]:
    """E1 My_LabelEncoder (reference my_encoders.py:34-136): codes by
    FIRST-APPEARANCE order (pandas factorize), NaN → its own code.

    Distributed first-appearance: min(order_col) per value → codes by
    that order; pass the table's event-time/row-id column to reproduce
    the reference's encounter order. With order_col=None the code order
    is xxhash64(value) — NOT first-appearance, but run- and
    cluster-size-STABLE (SURVEY §7.4 determinism rule). The previous
    fallback (monotonically_increasing_id) changed with partitioning,
    so the same data could encode differently on different clusters.
    Returns (encoded_df, mapping_df ['value', 'code']). A NULL value is
    ordered LAST explicitly (leading isNull sort key — the reference
    maps NaN after all seen values, :92-96; without the explicit key the
    hash path would land null at an arbitrary mid-range code).

    max_categories guards the mapping window: row_number() without a
    partitionBy single-task-sorts the distinct-value table, which is the
    right plan for categorical cardinalities (reference cat_limit=35)
    but a silent stall if an id-like column slips in. Cardinality is
    pre-checked with approx_count_distinct (one scan-only job, ±2%);
    above the cap we raise instead of hanging — pass None to disable.
    """
    if max_categories is not None:
        est = df.agg(F.approx_count_distinct(col).alias("n")).first()["n"]
        if est > max_categories:
            raise ValueError(
                f"label_encode({col!r}): ~{est} distinct values exceeds "
                f"max_categories={max_categories}. The code-assignment "
                "window is a single-task sort over the distinct values — "
                "id-like columns do not belong in a label encoder "
                "(classify_columns routes them to id_vars). Pass "
                "max_categories=None to force."
            )
    first_seen = df.groupBy(F.col(col).alias("value")).agg(
        (
            F.min(order_col)
            if order_col is not None
            else F.first(F.xxhash64(F.col(col)))
        ).alias("__first")
    )
    w = Window.orderBy(
        F.col("value").isNull().cast("int").asc(),
        F.col("__first").asc(),
        F.col("value").asc(),
    )
    mapping = first_seen.select(
        "value", (F.row_number().over(w) - 1).alias("code")
    )
    out = _join_fitted(
        df, col, mapping.withColumnRenamed("code", f"{col}_code")
    )
    return out, mapping


def apply_label_encoding(
    df: DataFrame, col: str, mapping: DataFrame
) -> DataFrame:
    """E1 unseen-test policy: unseen values get max_code + dense_rank of
    the unseen value (reference my_encoders.py:103-111 assigns max+1
    incrementally in encounter order; we use deterministic value order)."""
    max_code = mapping.agg(F.max("code")).first()[0]
    # NULL-SAFE anti join: a plain on="value" never matches NULL=NULL,
    # so a NULL test value would be re-added as "unseen" even when the
    # fitted mapping already holds a NULL row — and the eqNullSafe
    # application join would then match BOTH rows, duplicating every
    # NULL input row with conflicting codes.
    m = mapping.select(F.col("value").alias("__mv"))
    unseen = (
        df.select(F.col(col).alias("value"))
        .distinct()
        .join(m, on=F.col("value").eqNullSafe(F.col("__mv")), how="left_anti")
    )
    w = Window.orderBy(F.col("value").asc_nulls_last())
    unseen_map = unseen.select(
        "value", (F.lit(max_code) + F.row_number().over(w)).alias("code")
    )
    full = mapping.unionByName(unseen_map)
    return _join_fitted(df, col, full.withColumnRenamed("code", f"{col}_code"))


def rare_class_combine(
    df: DataFrame, col: str, threshold: float = 0.01, rare_label: str = "RARE",
    missing_label: str = "missing",
) -> tuple[DataFrame, DataFrame]:
    """A5/E2 Rare_Class_Combiner (reference my_encoders.py:225-331;
    FE_combine_rare_categories featurewiz/featurewiz.py:1858-1873):
    values with relative frequency ≤ threshold → rare_label; nulls →
    missing_label. Returns (df, fitted mapping).

    ONE job: the total row count is the sum of the per-value counts, so
    it folds into an unpartitioned window over the (small, ≤cardinality)
    aggregate table instead of a separate df.count() pass."""
    w_all = Window.partitionBy()
    freq = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("__n")
    ).withColumn("freq", F.col("__n") / F.sum("__n").over(w_all))
    mapping = freq.select(
        "value",
        F.when(F.col("value").isNull(), F.lit(missing_label))
        .when(F.col("freq") <= threshold, F.lit(rare_label))
        .otherwise(F.col("value").cast("string"))
        .alias(f"{col}_combined"),
    )
    out = _join_fitted(df, col, mapping)
    return out, mapping


def frequency_encode(
    df: DataFrame, col: str, normalize: bool = True
) -> tuple[DataFrame, DataFrame]:
    """A6/E3 FrequencyEncoder (reference encoders.py:35-125): category →
    train relative frequency. Unseen test values keep their TEST-side
    frequency (reference :103-118) — see apply_frequency_encoding.
    Single job: the normalizing total folds into an unpartitioned window
    over the per-value aggregate (same IEEE count/total division as the
    former separate df.count() pass — bit-identical results)."""
    w_all = Window.partitionBy()
    counts = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    enc = counts.select(
        "value",
        (
            (F.col("__n") / F.sum("__n").over(w_all)) if normalize else F.col("__n")
        ).cast("double").alias(f"{col}_freq"),
    )
    out = _join_fitted(df, col, enc)
    return out, enc


def apply_frequency_encoding(df: DataFrame, col: str, enc: DataFrame) -> DataFrame:
    """Unseen values → their own frequency within the new data."""
    w_all = Window.partitionBy()
    test_enc = df.groupBy(F.col(col).alias("value")).agg(
        F.count(F.lit(1)).alias("__n")
    ).select(
        "value",
        (F.col("__n") / F.sum("__n").over(w_all)).cast("double").alias("__tf"),
    )
    out = _join_fitted(_join_fitted(df, col, enc), col, test_enc)
    fcol = [c for c in enc.columns if c != "value"][0]
    return out.withColumn(fcol, F.coalesce(F.col(fcol), F.col("__tf"))).drop("__tf")


def target_encode(
    df: DataFrame, col: str, target: str, smoothing: float = 20.0
) -> tuple[DataFrame, DataFrame]:
    """A7/E5 smoothed mean target encoding (reference registry
    settings.py:24-31, applied databunch.py:287-327). Encoding =
    (n·mean_cat + k·mean_global) / (n + k), the James-Stein/TargetEncoder
    shrinkage form (also used for A8 GroupEncoded features,
    databunch.py:363-391)."""
    gmean = df.agg(F.avg(target)).first()[0]
    enc = df.groupBy(F.col(col).alias("value")).agg(
        (
            (F.count(target) * F.avg(target) + F.lit(smoothing) * F.lit(gmean))
            / (F.count(target) + F.lit(smoothing))
        ).alias(f"{col}_target_enc")
    )
    out = _join_fitted(df, col, enc).withColumn(
        f"{col}_target_enc", F.coalesce(F.col(f"{col}_target_enc"), F.lit(gmean))
    )
    return out, enc


def glmm_encode(
    df: DataFrame, col: str, target: str, family: str = "gaussian"
) -> tuple[DataFrame, DataFrame]:
    """A7/E5 GLMMEncoder (reference registry settings.py:24-31 /
    databunch.py:34; category_encoders.glmm fits a random-intercept
    model per category — gaussian for regression targets,
    binomial_target=True for classification). Re-derived as distributed
    aggregates: the random-intercept posterior mean with method-of-
    moments (one-way random-effects ANOVA) variance estimates,

        enc_c = gm + (m_c − gm) · n_c τ² / (n_c τ² + σ²)

    σ² = pooled within-category variance, τ² = between-category variance
    (clipped at 0). Unlike the fixed-smoothing target_encode, the
    shrinkage strength is LEARNED from the data's own variance
    decomposition — categories in noisy targets shrink harder. One
    aggregate pass + broadcast join; unseen/degenerate → grand mean
    (0.0 on the logit scale for binomial — the global log-odds offset
    is carried by the intercept, matching category_encoders' convention
    of emitting the random EFFECT, not the fitted probability).

    family="binomial": the 0/1 target is mapped through the one-step
    working-response approximation of the logistic mixed model (a
    single IRLS step from the null model — the same linearization
    statsmodels' variational fit iterates): z = logit(gm) +
    (y − gm)/(gm(1−gm)), then the gaussian MoM machinery above runs on
    z and the encoding is the shrunken random intercept on the LOGIT
    scale. Deterministic, one pass, no driver-side iteration."""
    if family == "binomial":
        stats0 = df.agg(F.avg(F.col(target).cast("double")).alias("p")).first()
        p = min(max(float(stats0["p"]), 1e-6), 1 - 1e-6)
        import math as _math

        z0 = _math.log(p / (1 - p))
        work = F.lit(z0) + (F.col(target).cast("double") - F.lit(p)) / F.lit(
            p * (1 - p)
        )
        df = df.withColumn("__glmm_z", work)
        out, enc = glmm_encode(df, col, "__glmm_z", family="gaussian")
        out = out.drop("__glmm_z")
        # emit the random EFFECT (deviation from the global log-odds):
        # category_encoders' GLMM output convention; unseen → 0.0
        out = out.withColumn(f"{col}_glmm", F.col(f"{col}_glmm") - F.lit(z0))
        enc = enc.withColumn(f"{col}_glmm", F.col(f"{col}_glmm") - F.lit(z0))
        return out, enc
    if family != "gaussian":
        raise ValueError(family)
    big = df.agg(
        F.avg(target).alias("gm"),
        F.count(target).alias("n"),
    ).first()
    gm, n_tot = float(big["gm"]), float(big["n"])
    stats = df.groupBy(F.col(col).alias("value")).agg(
        F.count(target).alias("__n"),
        F.avg(target).alias("__m"),
        F.coalesce(F.var_samp(target), F.lit(0.0)).alias("__v"),
    )
    agg = stats.agg(
        F.count(F.lit(1)).alias("c"),
        F.sum((F.col("__n") - 1) * F.col("__v")).alias("ss_within"),
        F.sum(F.col("__n") * (F.col("__m") - F.lit(gm)) ** 2).alias("ss_between"),
        F.sum(F.col("__n") * F.col("__n")).alias("sum_n2"),
    ).first()
    c = float(agg["c"])
    sigma2 = float(agg["ss_within"]) / (n_tot - c) if n_tot > c else 0.0
    denom = n_tot - float(agg["sum_n2"]) / n_tot
    tau2 = (
        max(0.0, (float(agg["ss_between"]) - (c - 1) * sigma2) / denom)
        if denom > 0
        else 0.0
    )
    shrink = (F.col("__n") * F.lit(tau2)) / (
        F.col("__n") * F.lit(tau2) + F.lit(sigma2)
    )
    enc = stats.select(
        "value",
        F.when(
            F.col("__n") * F.lit(tau2) + F.lit(sigma2) > 0,
            F.lit(gm) + (F.col("__m") - F.lit(gm)) * shrink,
        )
        .otherwise(F.lit(gm))
        .alias(f"{col}_glmm"),
    )
    out = _join_fitted(df, col, enc).withColumn(
        f"{col}_glmm", F.coalesce(F.col(f"{col}_glmm"), F.lit(gm))
    )
    return out, enc


def ordered_target_encode(
    df: DataFrame, col: str, target: str, ts: str, prior: float | None = None,
    prior_weight: float = 1.0, bucket: str | float | None = None,
) -> DataFrame:
    """A7 CatBoost-style ORDERED target encoding — leakage-free by
    construction: each row sees only strictly-earlier rows of its
    category: (sum(y) over past + w·prior) / (count over past + w).
    Reference CatBoostEncoder semantics (settings.py:26) re-derived as a
    running window (SURVEY.md §2.4 A7).

    The frame is a RANGE over the (micro-second) time value, not ROWS:
    a rows-frame would let rows sharing a timestamp see each other's
    targets in arbitrary per-run order — both label leakage and
    nondeterminism. Same-ts peers are excluded ("strictly earlier"
    taken literally).

    bucket=None runs one running window per category — correct, but a
    hot category is a single sorted task, and featurewiz categories are
    ≤35-cardinality by construction, so at 100 TB EVERY category is hot.
    Pass a bucket (interval string for time columns, e.g. ``'30 days'``;
    a number for numeric ts) to cut each category's timeline into
    calendar buckets (same design as ``bucketed_asof_join``):

    1. in-bucket running sums — window over (col, bucket), task size
       bounded by bucket width, not category row count;
    2. per-(col, bucket) totals — ONE row per bucket (hash aggregate
       with map-side partials);
    3. carry: cumulative totals over strictly-earlier buckets — a
       window over the tiny per-bucket table (rows = #buckets);
    4. row value = in-bucket partial + carried prefix, joined back
       null-safely on (col, bucket).

    A row in bucket b has strictly-greater time than every row of any
    bucket < b, and same-micros rows always share a bucket, so the
    strictly-earlier frame semantics are preserved exactly. Cumulative
    float sums associate differently than one long running sum
    (identical up to ~1 ulp per bucket boundary; round outputs as the
    driver queries do)."""
    from pyspark.sql import types as T

    if prior is None:
        prior = df.agg(F.avg(target)).first()[0]
    tdt = df.schema[ts].dataType
    is_time = isinstance(tdt, (T.TimestampType, T.TimestampNTZType, T.DateType))
    okey = F.unix_micros(F.col(ts).cast("timestamp")) if is_time else F.col(ts)
    pw = F.lit(prior_weight)
    pr = F.lit(prior)
    out_col = f"{col}_ordered_te"

    if bucket is None:
        w = (
            Window.partitionBy(col)
            .orderBy(okey)
            .rangeBetween(Window.unboundedPreceding, -1)
        )
        run_sum = F.coalesce(F.sum(target).over(w), F.lit(0.0))
        run_cnt = F.coalesce(F.count(target).over(w), F.lit(0))
        return df.withColumn(out_col, (run_sum + pw * pr) / (run_cnt + pw))

    if is_time:
        from featurewiz_spark.operators.windows import (
            _interval_seconds,
            _require_utc_for_ntz,
        )

        _require_utc_for_ntz(df, ts, "ordered_target_encode")
        width = F.lit(int(_interval_seconds(bucket) * 1_000_000))
    else:
        width = F.lit(bucket)
    b = df.withColumn("__okey", okey).withColumn(
        "__bkt", F.floor(F.col("__okey") / width)
    )
    w_in = (
        Window.partitionBy(col, "__bkt")
        .orderBy("__okey")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    b = b.withColumn(
        "__in_sum", F.coalesce(F.sum(target).over(w_in), F.lit(0.0))
    ).withColumn("__in_cnt", F.coalesce(F.count(target).over(w_in), F.lit(0)))

    kc = "__fw_ote_key"
    tot = b.groupBy(F.col(col).alias(kc), F.col("__bkt").alias("__tbkt")).agg(
        F.sum(target).alias("__bs"), F.count(target).alias("__bc")
    )
    w_c = (
        Window.partitionBy(kc)
        .orderBy("__tbkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = tot.select(
        kc,
        "__tbkt",
        F.coalesce(F.sum("__bs").over(w_c), F.lit(0.0)).alias("__cs"),
        F.coalesce(F.sum("__bc").over(w_c), F.lit(0)).alias("__cc"),
    )
    joined = b.join(
        carry,
        on=b[col].eqNullSafe(carry[kc]) & b["__bkt"].eqNullSafe(carry["__tbkt"]),
        how="left",
    )
    joined = joined.withColumn(
        out_col,
        (F.col("__in_sum") + F.col("__cs") + pw * pr)
        / (F.col("__in_cnt") + F.col("__cc") + pw),
    )
    return joined.drop(
        kc, "__tbkt", "__okey", "__bkt", "__in_sum", "__in_cnt", "__cs", "__cc"
    )


def woe_encode(
    df: DataFrame, col: str, target: str, regularization: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """A7/E5 WOEEncoder (reference registry settings.py:24-31): weight of
    evidence for a binary 0/1 target,
    ln( ((pos_c + reg)/(pos + 2reg)) / ((neg_c + reg)/(neg + 2reg)) ) —
    the regularized form used by the category_encoders library the
    reference wraps. One hash aggregate + broadcast join."""
    tot = df.agg(
        F.sum(F.col(target).cast("double")).alias("pos"),
        F.sum(F.lit(1.0) - F.col(target).cast("double")).alias("neg"),
    ).first()
    pos, neg, r = float(tot["pos"]), float(tot["neg"]), regularization
    enc = df.groupBy(F.col(col).alias("value")).agg(
        F.sum(F.col(target).cast("double")).alias("__p"),
        F.sum(F.lit(1.0) - F.col(target).cast("double")).alias("__n"),
    ).select(
        "value",
        F.log(
            ((F.col("__p") + F.lit(r)) / F.lit(pos + 2 * r))
            / ((F.col("__n") + F.lit(r)) / F.lit(neg + 2 * r))
        ).alias(f"{col}_woe"),
    )
    out = _join_fitted(df, col, enc).withColumn(
        f"{col}_woe", F.coalesce(F.col(f"{col}_woe"), F.lit(0.0))
    )
    return out, enc


def james_stein_groupby(
    df: DataFrame, cat_cols: list[str], num_cols: list[str], k: float = 10.0,
    prefix: str = "GroupEncoded",
) -> tuple[DataFrame, dict[str, DataFrame]]:
    """A8 groupby-JamesStein features (reference databunch.py:363-391,
    583-608): encode each categorical with each NUMERIC column as pseudo-
    target, shrunk toward the global mean: (n·mean_g + k·mean)/(n + k)
    (SURVEY.md §2.4 A8). Column name ``{prefix}_{cat}_{num}``."""
    out = df
    fitted: dict[str, DataFrame] = {}
    gmeans = df.agg(*[F.avg(n).alias(n) for n in num_cols]).first()
    for c in cat_cols:
        enc = df.groupBy(F.col(c).alias("value")).agg(
            *[
                (
                    (F.count(n) * F.avg(n) + F.lit(k) * F.lit(float(gmeans[n])))
                    / (F.count(n) + F.lit(k))
                ).alias(f"{prefix}_{c}_{n}")
                for n in num_cols
            ]
        )
        fitted[c] = enc
        out = _join_fitted(out, c, enc)
    return out, fitted


def _contrast_matrix(kind: str, k: int) -> list[list[float]]:
    """Contrast-coding matrices (k levels → k-1 columns), standard
    definitions as published in the statsmodels/patsy docs. Levels are
    sorted; row i is the coding of level i."""
    import numpy as np

    if kind == "sum":
        m = np.vstack([np.eye(k - 1), -np.ones((1, k - 1))])
    elif kind == "helmert":
        m = np.zeros((k, k - 1))
        for j in range(k - 1):
            m[: j + 1, j] = -1.0
            m[j + 1, j] = float(j + 1)
    elif kind == "backward_difference":
        m = np.zeros((k, k - 1))
        for j in range(1, k):  # column j (1-indexed)
            m[:j, j - 1] = (j - k) / k
            m[j:, j - 1] = j / k
    elif kind == "polynomial":
        # orthonormal polynomial contrasts: QR of the centered Vandermonde
        grid = np.arange(1, k + 1, dtype=np.float64)
        v = np.vander(grid, k, increasing=True)
        q, _ = np.linalg.qr(v)
        # fix signs so the linear term is increasing (QR sign ambiguity)
        for j in range(1, k):
            if q[-1, j] < q[0, j]:
                q[:, j] = -q[:, j]
        m = q[:, 1:]
    else:
        raise ValueError(kind)
    return m.tolist()


def contrast_encode(
    df: DataFrame, col: str, kind: str = "helmert",
    categories: list | None = None,
) -> tuple[DataFrame, list]:
    """E4 contrast coders — Sum / Helmert / BackwardDifference /
    Polynomial (reference registry settings.py:12-22, applied
    databunch.py:252-284). Category count is ≤ cat_limit=35 by
    construction, so the k×(k-1) matrix is driver-built and applied as a
    broadcast join of a k-row mapping table."""
    if categories is None:
        categories = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
    if not categories:
        raise ValueError(
            f"contrast_encode({col!r}): no non-null categories to encode "
            "(all-NULL column) — drop the column or impute first"
        )
    k = len(categories)
    mat = _contrast_matrix(kind, k)
    rows = [(categories[i], *mat[i]) for i in range(k)]
    cols = [f"{col}_{kind}_{j}" for j in range(k - 1)]
    mapping = df.sparkSession.createDataFrame(rows, ["value"] + cols)
    out = _join_fitted(df, col, mapping)
    return out, categories


def basen_encode(
    df: DataFrame, col: str, base: int = 2, categories: list | None = None
) -> tuple[DataFrame, list]:
    """E4 BaseN encoder (reference registry settings.py:12-22): ordinal
    code of the sorted category → base-N digit columns. digits =
    ceil(log_base(k+1)); unseen/null → code 0 (all-zero digits)."""
    import math

    if categories is None:
        categories = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
    if not categories:
        raise ValueError(
            f"basen_encode({col!r}): no non-null categories to encode "
            "(all-NULL column) — drop the column or impute first"
        )
    k = len(categories)
    n_digits = max(1, math.ceil(math.log(k + 1, base)))
    rows = []
    for i, c in enumerate(categories):
        code = i + 1  # 0 reserved for unseen/null
        digits = []
        for d in range(n_digits):
            digits.append(code % base)
            code //= base
        rows.append((c, *reversed(digits)))
    cols = [f"{col}_base{base}_{d}" for d in range(n_digits)]
    mapping = df.sparkSession.createDataFrame(rows, ["value"] + cols)
    out = _join_fitted(df, col, mapping).withColumns(
        {c: F.coalesce(F.col(c), F.lit(0)) for c in cols}
    )
    return out, categories


def one_hot_encode(df: DataFrame, col: str, categories: list | None = None
                   ) -> tuple[DataFrame, list]:
    """E4 OneHot: one indicator column per category. Category list is the
    fitted state (train-side); test replays the same list."""
    if categories is None:
        categories = sorted(
            r[0] for r in df.select(col).distinct().collect() if r[0] is not None
        )
    # deterministic unique names: sanitizing can collide ('a b' vs
    # 'a_b') — uniquify in sorted-category order so fit and replay
    # derive identical names. The uniquifier is seeded ONLY with the
    # generated names themselves, never df.columns: fit and replay
    # frames carry different incidental columns, and seeding with them
    # would derive different one-hot names for the same categories. A
    # genuine clash with a pre-existing column is an error (withColumns
    # would silently overwrite it), not a rename. NULL rows get 0 (not
    # NULL) indicators: (col == c) is NULL for them and would leak NaNs
    # downstream.
    names: dict = {}
    used: set = set()
    for c in categories:
        base = f"{col}_is_{str(c).replace(' ', '_')}"
        name, i = base, 2
        while name in used:
            name = f"{base}__{i}"
            i += 1
        names[c] = name
        used.add(name)
    clash = sorted(used & set(df.columns))
    if clash:
        raise ValueError(
            f"one_hot_encode({col!r}): generated column name(s) {clash} "
            "already exist in the DataFrame — rename or drop them first"
        )
    out = df.withColumns(
        {
            names[c]: F.coalesce((F.col(col) == F.lit(c)).cast("int"), F.lit(0))
            for c in categories
        }
    )
    return out, categories


def hashing_encode(
    df: DataFrame, col: str, n_components: int = 8, method: str = "md5"
) -> DataFrame:
    """E4 HashingEncoder (reference databunch.py:269-270 wraps
    category_encoders.HashingEncoder, whose default hash_method is md5
    with an n_components-column one-hot output): bucket = 60-bit md5
    prefix mod n_components, emitted as the raw bucket id
    (``{col}_hash``) PLUS n_components indicator columns
    (``{col}_hash_0..n-1``) — the reference's output shape. All
    JVM-side expressions, no fitted state; the md5 family is also
    engine-portable, so an external SQL engine can replay the exact
    encoding (driver oracle q38). Nulls hash to bucket 0 (the
    category_encoders convention for missing). method="xxhash64" trades
    that portability for a cheaper single hash op (no hex substring) —
    same output shape, different (still deterministic) buckets."""
    if method == "md5":
        h = F.conv(
            F.substring(F.md5(F.col(col).cast("string")), 1, 15), 16, 10
        ).cast("long")
    elif method == "xxhash64":
        h = F.xxhash64(F.col(col))
    else:
        raise ValueError(method)
    bucket = F.coalesce(F.pmod(h, F.lit(n_components)), F.lit(0))
    out = df.withColumn(f"{col}_hash", bucket.cast("int"))
    return out.withColumns(
        {
            f"{col}_hash_{j}": (bucket == j).cast("int")
            for j in range(n_components)
        }
    )


def add_missing_flags(df: DataFrame, cols: list[str]) -> DataFrame:
    """add_missing (reference featurewiz/featurewiz.py:3687-3708):
    per-column 0/1 missing indicator."""
    return df.withColumns(
        {f"{c}_missing": F.isnull(c).cast("int") for c in cols}
    )


def clean_nans(
    df: DataFrame, num_cols: list[str], stat: str = "median", flags: bool = True
) -> tuple[DataFrame, dict[str, float]]:
    """E9 DataBunch.clean_nans (reference databunch.py:212-229): numeric
    nulls → median (exact percentile; switch to percentile_approx at
    100TB scale via stat='approx_median'), plus _isNAN flags.
    Returns (df, fitted fill values) for test replay."""
    if not num_cols:  # nothing numeric to clean (e.g. all-categorical table)
        return df, {}
    exprs = []
    for c in num_cols:
        if stat == "median":
            exprs.append(F.expr(f"percentile(`{c}`, 0.5)").alias(c))
        elif stat == "approx_median":
            exprs.append(F.percentile_approx(c, 0.5).alias(c))
        elif stat == "mean":
            exprs.append(F.avg(c).alias(c))
        else:
            raise ValueError(stat)
    fills = df.agg(*exprs).first().asDict()
    out = df
    if flags:
        out = out.withColumns({f"{c}_isNAN": F.isnull(c).cast("int") for c in num_cols})
    out = out.withColumns(
        {c: F.coalesce(F.col(c), F.lit(fills[c])) for c in num_cols}
    )
    return out, fills


def standard_scale(
    df: DataFrame, cols: list[str], method: str = "std"
) -> tuple[DataFrame, dict]:
    """E10 scalers ∈ {std, minmax, robust, maxabs} (reference
    databunch.py:629-638; featurewiz/featurewiz.py:2947-3005). One agg
    pass fits; scaled column = pure expression."""
    aggs = []
    for c in cols:
        if method == "std":
            aggs += [F.avg(c).alias(f"{c}__a"), F.stddev(c).alias(f"{c}__b")]
        elif method == "minmax":
            aggs += [F.min(c).alias(f"{c}__a"), F.max(c).alias(f"{c}__b")]
        elif method == "robust":
            aggs += [
                F.expr(f"percentile(`{c}`, 0.5)").alias(f"{c}__a"),
                (F.expr(f"percentile(`{c}`, 0.75)") - F.expr(f"percentile(`{c}`, 0.25)")).alias(f"{c}__b"),
            ]
        elif method == "maxabs":
            aggs += [F.lit(0.0).alias(f"{c}__a"), F.max(F.abs(F.col(c))).alias(f"{c}__b")]
        else:
            raise ValueError(method)
    stats = df.agg(*aggs).first().asDict()
    out = df
    upd = {}
    for c in cols:
        a, b = stats[f"{c}__a"], stats[f"{c}__b"]
        if method == "minmax":
            denom = (b - a) or 1.0
            upd[f"{c}_scaled"] = (F.col(c) - F.lit(a)) / F.lit(denom)
        else:
            denom = b or 1.0
            upd[f"{c}_scaled"] = (F.col(c) - F.lit(a)) / F.lit(denom)
    return out.withColumns(upd), {"method": method, "stats": stats}
