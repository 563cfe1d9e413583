"""Point-in-time / as-of join operators — the engine's core custom ops.

Spark SQL has no native as-of join; the reference implements only an
exact-key shifted-lag lookup (TS_Lagging_Transformer,
reference featurewiz/my_encoders.py:1280-1490) and a latest-row-per-entity
snapshot (FE_get_latest_values_based_on_date_column,
reference featurewiz/featurewiz.py:1876-1908). The north rule generalizes
both to a tolerance-bounded backward/forward as-of join with zero temporal
leakage.

Physical strategy (SURVEY.md §4): union-tag trick — tag left/right rows,
union them, and run ONE window pass per entity ordered by
(ts, side-tag): ``last(right_value, ignorenulls=True) over
rowsBetween(unboundedPreceding, -1 or 0)``. This is a single shuffle on
the entity key (range partition + in-partition sort, exactly the
sort-merge machinery Spark already has) — no join node at all, so there is
no skew-join blowup for hot urls; a hot entity is still a single
partition-local sorted scan. Strictness (< vs <=) is encoded in the
union sort order, tolerance by a final ``when`` filter.

Scale note: for a 10^12-row left side the only shuffle is
repartition-by-entity; AQE handles partition sizing. If the right side is
tiny (dimension snapshots), prefer ``lag_join`` (broadcast).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from featurewiz_spark.operators.windows import (
    _interval_seconds,
    _require_utc_for_ntz,
)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    strict: bool = False,
    suffix: str = "_asof",
) -> DataFrame:
    """As-of join: for each left row, the latest right row at-or-before
    (backward) / earliest at-or-after (forward) its timestamp, per key.

    tolerance: SQL interval string, e.g. ``'7 days'`` — matches farther
    than this become NULL. strict=True excludes equal timestamps
    (leakage-free "only strictly earlier snapshots visible").

    Implemented as union + one window — single shuffle on `on`. The
    matched right ROW travels as ONE struct payload (ts + values), so a
    matched row whose value is NULL stays NULL (per-column
    last(ignorenulls) would silently substitute an OLDER row's value and
    report it inside the newer row's tolerance — pandas merge_asof
    returns NULL here, and so do we). Left columns are never clobbered:
    a right value column sharing a left column's name flows through as
    ``{col}{suffix}`` while the left column survives untouched.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [right_ts]]
    # the matched-timestamp column f"{right_ts}{suffix}" is an output too
    clash = [
        c for c in value_cols + [right_ts] if f"{c}{suffix}" in left.columns
    ]
    if clash:
        raise ValueError(
            f"asof_join: output column(s) {[f'{c}{suffix}' for c in clash]} "
            "already exist on the left side — pass a different suffix"
        )
    # the payload struct is a window SORT key (deterministic right-right
    # tie-break) and a max/min aggregate in the bucketed variant — both
    # require orderable types. MapType is the one common non-orderable
    # column type; fail with an actionable message instead of an opaque
    # Catalyst EXPRESSION_TYPE_IS_NOT_ORDERABLE at execution.
    from pyspark.sql import types as _T

    def _orderable(dt) -> bool:
        # mirrors Catalyst's TypeUtils ordering rule: maps are not
        # orderable ANYWHERE in the type tree (struct<m:map<..>> and
        # array<map<..>> fail the same way a bare map does)
        if isinstance(dt, _T.MapType):
            return False
        if isinstance(dt, _T.ArrayType):
            return _orderable(dt.elementType)
        if isinstance(dt, _T.StructType):
            return all(_orderable(f.dataType) for f in dt.fields)
        return True

    bad = [c for c in value_cols if not _orderable(right.schema[c].dataType)]
    if bad:
        raise ValueError(
            f"asof_join: value column(s) {bad} contain MapType "
            "(non-orderable) — the matched-row payload must sort "
            "deterministically; exclude them from value_cols (e.g. "
            "re-join them by the matched timestamp afterwards) or "
            "encode them as array<struct<key,value>>"
        )

    # tag: right rows must sort BEFORE left rows at equal ts for
    # non-strict backward (so last() sees them), AFTER for strict.
    l_tag, r_tag = (1, 0) if not strict else (0, 1)
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(l_tag))
    rt = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(r_tag).alias("__side"),
        F.struct(
            F.col(right_ts).alias("__mts"), *[F.col(c) for c in value_cols]
        ).alias("__pay"),
    )
    # align schemas for unionByName (right rows carry NULL left columns;
    # left rows carry a NULL payload struct). ONE select per side, not a
    # withColumn per column: every withColumn is a py4j round-trip plus
    # a full re-analysis of the growing plan — pure driver-side plan-
    # construction cost (measured ~0.3s per q04 build).
    rt = rt.select(
        "*",
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left.columns
            if c not in rt.columns
        ],
        F.col("__ts").alias("__rts"),
    )
    lt = lt.select(
        "*",
        F.lit(None).cast(rt.schema["__pay"].dataType).alias("__pay"),
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )

    u = lt.unionByName(rt.select(*lt.columns))

    # final sort key __pay: DUPLICATE right rows at the same (key, ts)
    # would otherwise be resolved by physical row order (run- and
    # partitioning-dependent). Ordering by the payload struct makes the
    # winner deterministic — greatest value struct for backward, least
    # for forward — and EXACTLY matches the bucketed variant's
    # max(struct)/min(struct) carry summaries (1M-row checksum
    # equivalence depends on this; left rows have NULL payloads and are
    # already separated by the side tag, so the key only orders
    # right-right ties).
    if direction == "backward":
        order = [F.col("__ts").asc(), F.col("__side").asc(),
                 F.col("__rts").asc(), F.col("__pay").asc()]
        frame = (Window.unboundedPreceding, -1)
    elif direction == "forward":
        order = [F.col("__ts").desc(), F.col("__side").asc(),
                 F.col("__rts").desc(), F.col("__pay").desc()]
        frame = (Window.unboundedPreceding, -1)
    else:
        raise ValueError(f"direction must be backward|forward, got {direction}")

    w = Window.partitionBy(*keys).orderBy(*order).rowsBetween(*frame)
    # ONE last() over the struct payload: the matched row is atomic —
    # its ts and ALL its values come from the same right row
    matched = u.withColumn("__m", F.last(F.col("__pay"), ignorenulls=True).over(w))
    # one withColumns call for the unpacked payload fields (see the
    # schema-alignment note above: a withColumn per value column is a
    # py4j round-trip plus a re-analysis each)
    matched = matched.withColumns(
        {
            "__mts": F.col("__m").getField("__mts"),
            **{f"{c}{suffix}": F.col("__m").getField(c) for c in value_cols},
        }
    )

    res = matched.filter(F.col("__side") == l_tag)

    if tolerance is not None:
        if direction == "backward":
            within = F.col("__mts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
        else:
            within = F.col("__mts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        res = res.withColumns(
            {
                **{
                    f"{c}{suffix}": F.when(within, F.col(f"{c}{suffix}"))
                    for c in value_cols
                },
                "__mts": F.when(within, F.col("__mts")),
            }
        )

    res = res.withColumn(f"{right_ts}{suffix}", F.col("__mts"))
    return res.drop("__ts", "__side", "__rts", "__mts", "__m", "__pay")


def bucketed_asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
    strict: bool = False,
    suffix: str = "_asof",
    bucket: str = "30 days",
) -> DataFrame:
    """Skew-bounded as-of join: identical semantics to :func:`asof_join`,
    but no single task ever holds an entity's full history.

    The plain union-window design puts ALL rows of a key in one sorted
    task — correct, one shuffle, but a hot url (10% of a 10^12-row table)
    becomes a straggler no AQE can split (windows can't be salted the way
    joins can). Here the timeline is cut into calendar buckets:

    1. in-bucket as-of on (keys, bucket) — task size is bounded by bucket
       width, not entity row count;
    2. per-(key, bucket) summary of the right side — ONE row per bucket
       (``max(struct(ts, values))``), so the carry table is tiny;
    3. cross-bucket carry: window over the bucket spine (union of left
       and right buckets) per key — rows = #buckets, not #events;
    4. rows unmatched within their bucket take the carried
       strictly-earlier-bucket value (for backward; mirrored forward).

    Strictness is preserved: a right row in an earlier bucket is strictly
    earlier than any left row in this bucket by construction. Costs 3
    extra (small) shuffles vs asof_join — use when entity skew is real;
    AQE handles the rest.
    """
    keys = [on] if isinstance(on, str) else list(on)
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in keys + [right_ts]]
    # same NTZ/DST hazard as sessionize: bucket ids come from epoch
    # arithmetic whose NTZ→TZ cast offset must be constant
    _require_utc_for_ntz(left, left_ts, "bucketed_asof_join")
    _require_utc_for_ntz(right, right_ts, "bucketed_asof_join")
    sec = _interval_seconds(bucket)
    l2 = left.withColumn("__bkt", F.floor(F.unix_timestamp(F.col(left_ts)) / sec))
    r2 = right.withColumn("__bkt", F.floor(F.unix_timestamp(F.col(right_ts)) / sec))

    ib = asof_join(
        l2, r2, keys + ["__bkt"], left_ts, right_ts, value_cols,
        direction=direction, tolerance=None, strict=strict, suffix=suffix,
    )

    backward = direction == "backward"
    s_struct = F.struct(F.col(right_ts), *[F.col(c) for c in value_cols])
    summary = r2.groupBy(*keys, "__bkt").agg(
        (F.max(s_struct) if backward else F.min(s_struct)).alias("__s")
    )
    spine = (
        l2.select(*keys, "__bkt").distinct()
        .unionByName(summary.select(*keys, "__bkt"))
        .distinct()
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__bkt").asc() if backward else F.col("__bkt").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = (
        spine.join(summary, on=keys + ["__bkt"], how="left")
        .withColumn("__carry", F.last("__s", ignorenulls=True).over(w))
        .select(*keys, "__bkt", "__carry")
    )
    out = ib.join(carry, on=keys + ["__bkt"], how="left")
    mts_col = f"{right_ts}{suffix}"
    # carry applies only when the bucket had NO match (matched ts null).
    # Deciding per VALUE column (coalesce) would override a legitimate
    # in-bucket match whose value is NULL with a stale earlier-bucket
    # value — the matched row is atomic, same contract as asof_join.
    out = out.withColumn("__mib", F.col(mts_col).isNotNull())
    out = out.withColumn(
        mts_col,
        F.when(F.col("__mib"), F.col(mts_col)).otherwise(
            F.col("__carry").getField(right_ts)
        ),
    )
    for c in value_cols:
        out = out.withColumn(
            f"{c}{suffix}",
            F.when(F.col("__mib"), F.col(f"{c}{suffix}")).otherwise(
                F.col("__carry").getField(c)
            ),
        )
    if tolerance is not None:
        if backward:
            within = F.col(mts_col) >= F.col(left_ts) - F.expr(f"INTERVAL {tolerance}")
        else:
            within = F.col(mts_col) <= F.col(left_ts) + F.expr(f"INTERVAL {tolerance}")
        for c in value_cols:
            out = out.withColumn(f"{c}{suffix}", F.when(within, F.col(f"{c}{suffix}")))
        out = out.withColumn(mts_col, F.when(within, F.col(mts_col)))
    return out.drop("__bkt", "__carry", "__mib")




def lag_join(
    df: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    lag_interval: str,
    agg: str = "sum",
    fill: float = 0.0,
    out_col: str | None = None,
) -> DataFrame:
    """Exact-key calendar-lag join (reference J2, TS_Lagging_Transformer:
    key shift my_encoders.py:1459-1464, dict lookup :1466-1472, aggregate
    table :1399-1402). Computes ``agg(value) by (keys, ts)``, then left
    equi-joins it back at the key shifted by ``lag_interval``; misses → fill.

    The aggregate table is one groupBy (map-side partial agg); the join is
    an equi-join Spark can broadcast when the key space is small, or
    sort-merge co-partitioned with the main table otherwise.
    """
    out_col = out_col or f"{value}_lag_{lag_interval.replace(' ', '_')}"
    agg_tbl = (
        df.groupBy(*keys, F.col(ts).alias("__k_ts"))
        .agg(getattr(F, agg)(value).alias(out_col))
    )
    shifted = df.withColumn("__k_ts", F.col(ts) - F.expr(f"INTERVAL {lag_interval}"))
    joined = shifted.join(agg_tbl, on=keys + ["__k_ts"], how="left")
    return joined.withColumn(out_col, F.coalesce(F.col(out_col), F.lit(fill))).drop(
        "__k_ts"
    )


def latest_per_entity(
    df: DataFrame, keys: str | list[str], ts: str, value_cols: list[str] | None = None
) -> DataFrame:
    """J3: latest-value-per-entity point-in-time snapshot
    (reference FE_get_latest_values_based_on_date_column,
    featurewiz/featurewiz.py:1876-1908 — per-group sort desc + head(1)).

    Spark-first: ONE hash aggregate ``max(struct(ts, *values))`` with
    map-side partials — no window, no per-group sort, no shuffle beyond
    the aggregate's own. Struct comparison is lexicographic, so the
    result is a consistent row with deterministic value tie-breaks at
    equal ts (equivalent to row_number()=1 over orderBy(ts desc,
    values desc)).
    """
    keyl = [keys] if isinstance(keys, str) else list(keys)
    if value_cols is None:
        value_cols = [c for c in df.columns if c not in keyl + [ts]]
    s = F.max(F.struct(F.col(ts), *[F.col(c) for c in value_cols])).alias("__s")
    out = df.groupBy(*keyl).agg(s)
    return out.select(
        *keyl,
        F.col("__s").getField(ts).alias(ts),
        *[F.col("__s").getField(c).alias(c) for c in value_cols],
    )


def asof_join_model_fallback(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    left_ts: str,
    right_ts: str,
    value_col: str,
    direction: str = "backward",
    tolerance: str | None = None,
    strict: bool = False,
    suffix: str = "_asof",
    x_origin: str = "2024-01-01",
    fill: float = 0.0,
) -> DataFrame:
    """As-of join whose tolerance misses are filled by a per-key linear
    trend model — the J5 "model-predicted join fallback".

    The reference trains a regression to predict a lag/trend feature for
    test rows whose (key, date) was never seen in training
    (reference my_encoders.py:1438-1453 XGBRegressor for lags,
    :1756-1780 LinearRegression for trend columns). The Spark-first
    re-expression fits one closed-form linear model per key over the
    right table's own timeline:

      fit:   ``slope_k = covar_pop(y, x) / var_pop(x)`` per key — ONE
             distributed hash aggregate with map-side partials; the
             fitted table is |keys| rows (broadcast).
      apply: ``coalesce(asof_match, slope_k*x + intercept_k, fill)`` —
             a broadcast equi-join, no extra shuffle beyond the as-of's
             own single exchange.

    The regressor ``x`` is DAYS since ``x_origin`` (not raw epoch
    microseconds): centering keeps var_pop ~1e4 instead of ~1e23, so
    the one-pass covariance is far from cancellation and engines agree
    to well past 6dp — the property the DuckDB oracle hash relies on.
    Keys with a degenerate timeline (var_pop(x) == 0: single snapshot
    or all-equal timestamps) have no slope; their misses fall through
    to ``fill`` (the reference's ``fillna(0)``, my_encoders.py:1427).

    Output columns: ``{value_col}{suffix}`` (filled) and
    ``{value_col}{suffix}_src`` ('asof' | 'model' | 'fill').
    """
    keys = [on] if isinstance(on, str) else list(on)
    # a CONSTANT NTZ→TZ offset cancels (linear models are shift-
    # invariant in x), but a DST-variable offset warps x nonuniformly
    _require_utc_for_ntz(left, left_ts, "asof_join_model_fallback")
    _require_utc_for_ntz(right, right_ts, "asof_join_model_fallback")
    matched_col = f"{value_col}{suffix}"
    src_col = f"{matched_col}_src"
    if src_col in left.columns:
        raise ValueError(
            f"asof_join_model_fallback: output column {src_col!r} already "
            "exists on the left side — pass a different suffix"
        )

    def _x(col):
        # days since origin, exact integer microseconds → double division
        return (
            F.unix_micros(F.col(col).cast("timestamp"))
            - F.unix_micros(F.lit(x_origin).cast("timestamp"))
        ) / F.lit(86400e6)

    # fit only on fully-observed (ts, value) pairs: covar_pop drops
    # null-y rows but var_pop/avg(x) would not, so a nullable value
    # column would mix THREE different row sets into one OLS estimate
    # (slope biased whenever nulls correlate with time)
    fit_src = right.filter(
        F.col(value_col).isNotNull() & F.col(right_ts).isNotNull()
    )
    fit = (
        fit_src.groupBy(*keys)
        .agg(
            F.covar_pop(F.col(value_col), _x(right_ts)).alias("__cov"),
            F.var_pop(_x(right_ts)).alias("__var"),
            F.avg(value_col).alias("__my"),
            F.avg(_x(right_ts)).alias("__mx"),
        )
        .withColumn(
            "__slope",
            F.when(F.col("__var") > 0, F.col("__cov") / F.col("__var")),
        )
        .withColumn(
            "__icpt", F.col("__my") - F.col("__slope") * F.col("__mx")
        )
        .select(*keys, "__slope", "__icpt")
    )

    base = asof_join(
        left, right, on=keys, left_ts=left_ts, right_ts=right_ts,
        value_cols=[value_col], direction=direction,
        tolerance=tolerance, strict=strict, suffix=suffix,
    )
    pred = F.col("__slope") * _x(left_ts) + F.col("__icpt")
    out = (
        base.join(F.broadcast(fit), on=keys, how="left")
        .withColumn(
            src_col,
            F.when(F.col(matched_col).isNotNull(), F.lit("asof"))
            .when(F.col("__slope").isNotNull(), F.lit("model"))
            .otherwise(F.lit("fill")),
        )
        .withColumn(
            matched_col,
            F.coalesce(F.col(matched_col), pred, F.lit(float(fill))),
        )
        .drop("__slope", "__icpt")
    )
    return out
