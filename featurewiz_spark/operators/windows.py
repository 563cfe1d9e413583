"""Windowed / ordered temporal operators (SURVEY.md §2.5).

All pure window functions — one shuffle on the entity key, then
partition-local sorted scans. No Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _keys(keys: str | list[str]) -> list[str]:
    return [keys] if isinstance(keys, str) else list(keys)


_UTC_ZONES = ("UTC", "Etc/UTC", "GMT", "Etc/GMT", "Z", "+00:00")


def _require_utc_for_ntz(df: DataFrame, ts: str, op: str) -> None:
    """TIMESTAMP_NTZ columns reach epoch arithmetic via an NTZ→TZ cast
    that applies the session-timezone offset per-value; across a DST
    transition that offset changes, corrupting wall-clock gap math. A
    CONSTANT offset cancels in every gap difference, so any DST-free
    zone is safe (UTC, Etc/GMT±N, Asia/Kolkata, raw "+05:30" …); only
    DST-variable zones raise. The engine's session factory pins UTC."""
    from pyspark.sql import types as T

    if not isinstance(df.schema[ts].dataType, T.TimestampNTZType):
        return
    import re as _re

    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz in _UTC_ZONES:
        return
    # raw fixed-offset ids ("+05:30", "UTC+05:30", "GMT+8", "-0800") are
    # DST-free by construction but not parseable by zoneinfo
    if _re.fullmatch(r"(?:UTC|GMT)?[+-]\d{1,2}(?::?\d{2})?(?::?\d{2})?", tz):
        return
    try:
        from datetime import datetime
        from zoneinfo import ZoneInfo

        z = ZoneInfo(tz)
        # offset constant at every month start over four years → no DST
        # under modern rules (monthly sampling also catches non-calendar
        # schemes like Casablanca's Ramadan windows, which span weeks;
        # pre-1970 historical offsets are out of scope for event data)
        offs = {
            z.utcoffset(datetime(y, m, 1))
            for y in (2020, 2021, 2023, 2024)
            for m in range(1, 13)
        }
        if len(offs) == 1:
            return
    except Exception:
        pass  # unknown zone string → be strict
    raise ValueError(
        f"{op}({ts!r}): column is TIMESTAMP_NTZ but "
        f"spark.sql.session.timeZone={tz!r} observes DST — the NTZ→TZ "
        "cast offset changes across transitions, which corrupts gap "
        "arithmetic. Set the session timezone to UTC (featurewiz_spark."
        "get_spark does) or cast the column to TIMESTAMP explicitly "
        "with your intended semantics."
    )


def lag_lead(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    value: str,
    lags: list[int] = (1,),
    leads: list[int] = (),
    tie_break: list[str] | None = None,
) -> DataFrame:
    """W3: positional lag/lead per entity ordered by ts.

    Reference TS_Lagging_Transformer (my_encoders.py:1280-1490) does
    calendar lags via dict lookup; positional lag/lead is the Spark-native
    primitive (`F.lag/lead` over a per-entity window).
    """
    order = [F.col(ts)] + [F.col(c) for c in (tie_break or [])]
    w = Window.partitionBy(*_keys(keys)).orderBy(*order)
    out = df
    for k in lags:
        out = out.withColumn(f"{value}_lag{k}", F.lag(value, k).over(w))
    for k in leads:
        out = out.withColumn(f"{value}_lead{k}", F.lead(value, k).over(w))
    return out


def rolling_agg(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    value: str,
    window_rows: int | None = None,
    window_range: str | None = None,
    aggs: list[str] = ("avg",),
    include_current: bool = True,
    tie_break: list[str] | None = None,
) -> DataFrame:
    """W4: rolling (last-k-rows or time-range) and cumulative aggregates.

    window_rows=k → rowsBetween(-(k-1), 0); window_range='7 days' →
    rangeBetween over unix MICROseconds (full TimestampType resolution —
    second truncation misclassified sub-second boundaries, and with
    include_current=False excluded every row sharing the current row's
    second, the same defect class sessionize documents); neither →
    cumulative (unboundedPreceding..0). Reference cum* funcs in
    Groupby_Aggregator func_set (my_encoders.py:495-497) are windows,
    not group aggs.
    """
    end = 0 if include_current else -1
    if window_range is not None:
        _require_utc_for_ntz(df, ts, "rolling_agg")  # same DST trap
        w = (
            Window.partitionBy(*_keys(keys))
            .orderBy(F.unix_micros(F.col(ts).cast("timestamp")))
            .rangeBetween(-_interval_seconds(window_range) * 1_000_000, end)
        )
        tag = window_range.replace(" ", "")
    else:
        order = [F.col(ts)] + [F.col(c) for c in (tie_break or [])]
        wb = Window.partitionBy(*_keys(keys)).orderBy(*order)
        if window_rows is not None:
            w = wb.rowsBetween(-(window_rows - 1) if include_current else -window_rows, end)
            tag = f"{window_rows}r"
        else:
            w = wb.rowsBetween(Window.unboundedPreceding, end)
            tag = "cum"
    out = df
    for a in aggs:
        fn = {"cumsum": "sum", "cummax": "max", "cummin": "min"}.get(a, a)
        out = out.withColumn(f"{value}_{a}_{tag}", getattr(F, fn)(value).over(w))
    return out


def _interval_seconds(interval: str) -> int:
    qty, unit = interval.split()
    unit = unit.rstrip("s")
    mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400, "week": 604800}[unit]
    return int(qty) * mult


def forward_fill(
    df: DataFrame, keys: str | list[str], ts: str, cols: list[str],
    flag: bool = False, tie_break: list[str] | None = None,
) -> DataFrame:
    """W2 ffill: last non-null at-or-before each row per entity.

    Reference fillna(method='ffill') + _Missing_Flag
    (my_encoders.py:1055-1066). `last(c, ignorenulls=True)` over
    unboundedPreceding..0 — single sorted window pass.
    """
    order = [F.col(ts)] + [F.col(c) for c in (tie_break or [])]
    w = (
        Window.partitionBy(*_keys(keys))
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = df
    for c in cols:
        if flag:
            out = out.withColumn(f"{c}_missing_flag", F.isnull(c).cast("int"))
        out = out.withColumn(c, F.last(F.col(c), ignorenulls=True).over(w))
    return out


def backfill(
    df: DataFrame, keys: str | list[str], ts: str, cols: list[str],
    tie_break: list[str] | None = None,
) -> DataFrame:
    """W2 bfill: first non-null at-or-after each row per entity
    (reference my_encoders.py:1060-1062 runs bfill after ffill)."""
    order = [F.col(ts)] + [F.col(c) for c in (tie_break or [])]
    w = (
        Window.partitionBy(*_keys(keys))
        .orderBy(*order)
        .rowsBetween(0, Window.unboundedFollowing)
    )
    out = df
    for c in cols:
        out = out.withColumn(c, F.first(F.col(c), ignorenulls=True).over(w))
    return out


def sessionize(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    gap: str = "30 minutes",
    out_col: str = "session_id",
    tie_break: list[str] | None = None,
) -> DataFrame:
    """W6 gap-based sessionization: a new session starts when the gap to
    the previous event (per entity) exceeds `gap`. session_id = running
    count of session starts — `sum(is_new_session) over
    (partitionBy(entity).orderBy(ts))`.

    Gaps are compared at MICROSECOND precision (`unix_micros`), the full
    resolution of TimestampType — second-truncation would misclassify a
    fractional-second gap straddling the threshold. `tie_break` makes
    the scan order total when equal (entity, ts) rows exist; without it
    the lag/running-sum order is partition-dependent.

    Reference analog: FE_calculate_duration_from_timestamp
    (featurewiz/featurewiz.py:3627-3683) pairs alternating rows; gap
    sessionization is its north-rule generalization. Streaming variant
    maps to F.session_window (see featurewiz_spark.streaming).
    """
    kl = _keys(keys)
    order = [F.col(ts)] + [F.col(c) for c in (tie_break or [])]
    w = Window.partitionBy(*kl).orderBy(*order)
    gap_us = _interval_seconds(gap) * 1_000_000
    # cast: unix_micros rejects TIMESTAMP_NTZ. The NTZ→TZ cast applies
    # the session-timezone offset, which is NOT constant across DST
    # transitions — two wall-clock NTZ events 30 min apart spanning a
    # fall-back boundary would map 90 min apart and flip session
    # decisions. Under UTC the offset is identically zero, so require it
    # (our session factory pins spark.sql.session.timeZone=UTC).
    _require_utc_for_ntz(df, ts, "sessionize")
    us = F.unix_micros(F.col(ts).cast("timestamp"))
    prev = F.lag(us).over(w)
    is_new = F.when(prev.isNull() | ((us - prev) > gap_us), 1).otherwise(0)
    return df.withColumn(
        out_col,
        F.sum(is_new).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def duration_between_rows(
    df: DataFrame,
    keys: str | list[str],
    ts: str,
    out_col: str = "duration_sec",
    clamp_negative: bool = True,
) -> DataFrame:
    """W6 duration pairing: Δseconds to the previous row per entity;
    negatives → 0 (reference featurewiz/featurewiz.py:3662-3671)."""
    _require_utc_for_ntz(df, ts, "duration_between_rows")  # same DST trap
    w = Window.partitionBy(*_keys(keys)).orderBy(F.col(ts))
    d = F.unix_timestamp(F.col(ts)) - F.lag(F.unix_timestamp(F.col(ts))).over(w)
    if clamp_negative:
        d = F.greatest(d, F.lit(0))
    return df.withColumn(out_col, d)
