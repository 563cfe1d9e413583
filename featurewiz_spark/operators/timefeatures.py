"""Calendar / cyclic / elapsed time features (SURVEY.md §2.5 W1, W7–W9).

All pure projections — no shuffle; whole-stage-codegen-friendly column
expressions only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAU = 2 * math.pi


_MONTH_NAMES = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
                "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
_DAY_NAMES = ["Sun", "Mon", "Tue", "Wed", "Thu", "Fri", "Sat"]  # Spark dow 1..7
_FESTIVE = (10, 11, 12)   # reference my_encoders.py:946 (Oct/Nov/Dec)
_SUMMER = (6, 7, 8)       # :954
_WINTER = (12, 1, 2)      # :961
_COLD = (10, 11, 12, 1, 2, 3)  # :968
_WARM = (4, 5, 6, 7, 8, 9)     # :975


def add_calendar_features(
    df: DataFrame,
    ts: str,
    prefix: str | None = None,
    cyclic: bool = True,
    crosses: bool = True,
    keep: list[str] | None = None,
    ref_year: int | None = None,
) -> DataFrame:
    """W1: the reference's ~30 calendar decompositions
    (_create_ts_features, reference featurewiz/my_encoders.py:902-1012):
    hour/minute/dayofweek/quarter/month/year/dayofyear/dayofmonth/
    weekofyear, month/day NAMES, season + festive flags, typeofday,
    sin/cos cyclic encodings, weekend flag, and the dow×hour, month×dow
    and month×typeofday crosses.

    Deviations, by design:
    - Spark dayofweek is Sunday=1..Saturday=7; the reference maps pandas
      dayofweek (Monday=0) through a DAYS dict that labels Monday 'Sun'
      (my_encoders.py:928-930), making its "weekend" = Monday+Sunday.
      We name days by their actual identity.
    - `age_in_years` uses the PINNED `ref_year` instead of the
      reference's wall-clock date.today() (:989-991) — wall-clock state
      would make the same input encode differently tomorrow (SURVEY
      §7.4 determinism rule); the feature is omitted when ref_year is
      None.

    `keep` replays a fitted train-side column contract on test
    (reference ts_adds_in, my_encoders.py:1022-1129): only those features
    are produced — zero-variance drops decided on train stay dropped.
    """
    p = f"{prefix}_" if prefix else f"{ts}_"
    t = F.col(ts)
    month_name = F.element_at(
        F.array(*[F.lit(m) for m in _MONTH_NAMES]), F.month(t)
    )
    day_name = F.element_at(
        F.array(*[F.lit(d) for d in _DAY_NAMES]), F.dayofweek(t)
    )
    typeofday = F.when(
        F.dayofweek(t).isin(1, 7), F.lit("weekend")
    ).otherwise(F.lit("weekday"))
    feats: dict[str, F.Column] = {
        f"{p}hour": F.hour(t),
        f"{p}minute": F.minute(t),
        f"{p}dayofweek": F.dayofweek(t),
        f"{p}quarter": F.quarter(t),
        f"{p}month": F.month(t),
        f"{p}year": F.year(t),
        f"{p}dayofyear": F.dayofyear(t),
        f"{p}dayofmonth": F.dayofmonth(t),
        f"{p}weekofyear": F.weekofyear(t),
        f"{p}is_weekend": F.dayofweek(t).isin(1, 7).cast("int"),
        f"{p}month_name": month_name,
        f"{p}dayofweek_name": day_name,
        f"{p}typeofday": typeofday,
        f"{p}is_festive": F.month(t).isin(*_FESTIVE).cast("int"),
        f"{p}is_summer": F.month(t).isin(*_SUMMER).cast("int"),
        f"{p}is_winter": F.month(t).isin(*_WINTER).cast("int"),
        f"{p}is_cold": F.month(t).isin(*_COLD).cast("int"),
        f"{p}is_warm": F.month(t).isin(*_WARM).cast("int"),
    }
    if ref_year is not None:
        feats[f"{p}age_in_years"] = F.lit(ref_year) - F.year(t)
    if cyclic:
        # reference formulas verbatim (my_encoders.py:921-924, 935-938,
        # 997-1000): x·2π/period with the raw 1-based month / day values
        feats[f"{p}hour_sin"] = F.sin(F.hour(t) * TAU / 24)
        feats[f"{p}hour_cos"] = F.cos(F.hour(t) * TAU / 24)
        feats[f"{p}dayofweek_sin"] = F.sin((F.dayofweek(t) - 1) * TAU / 7)
        feats[f"{p}dayofweek_cos"] = F.cos((F.dayofweek(t) - 1) * TAU / 7)
        feats[f"{p}month_sin"] = F.sin(F.month(t) * TAU / 12)
        feats[f"{p}month_cos"] = F.cos(F.month(t) * TAU / 12)
        feats[f"{p}dayofmonth_sin"] = F.sin(F.dayofmonth(t) * TAU / 30)
        feats[f"{p}dayofmonth_cos"] = F.cos(F.dayofmonth(t) * TAU / 30)
    if crosses:
        feats[f"{p}dow_hour"] = F.concat_ws(
            "_", F.dayofweek(t).cast("string"), F.hour(t).cast("string")
        )
        feats[f"{p}month_dow"] = F.concat_ws(
            "_", F.month(t).cast("string"), F.dayofweek(t).cast("string")
        )
        feats[f"{p}month_typeofday"] = F.concat_ws("_", month_name, typeofday)
    if keep is not None:
        feats = {k: v for k, v in feats.items() if k in set(keep)}
    return df.withColumns(feats)


def calendar_string_features(prefix: str) -> list[str]:
    """The string-typed W1 outputs (for downstream label-encode sweeps)."""
    p = f"{prefix}_"
    return [f"{p}month_name", f"{p}dayofweek_name", f"{p}typeofday",
            f"{p}dow_hour", f"{p}month_dow", f"{p}month_typeofday"]


def add_fourier_features(
    df: DataFrame, ts: str, orders: list[int] = (1, 2, 4), period: str = "year",
    prefix: str | None = None,
    mask_col: str | None = None, mask_values: list | None = None,
) -> DataFrame:
    """W9 Fourier seasonal features (TS_Fourier_Transformer,
    reference featurewiz/my_encoders.py:1812-1947, features :1902-1928):
    sin/cos(2πk·dayofyear/365) (period='year') or weekofyear/52
    (period='week').

    `mask_col` adds the reference's per-id indicator interactions
    (:1902-1928 multiplies each Fourier term by a per-product 0/1 mask,
    giving every id its own seasonal coefficients in a downstream
    linear model): for each value v in `mask_values` emit
    ``term · (mask_col == v)`` columns. mask_values defaults to the
    distinct values of mask_col (collected — intended for low-
    cardinality ids exactly like the reference's product lists; pass an
    explicit list at scale)."""
    p = f"{prefix}_" if prefix else f"{ts}_"
    if period == "year":
        base, div = F.dayofyear(F.col(ts)), 365.0
    elif period == "week":
        base, div = F.weekofyear(F.col(ts)), 52.0
    else:
        raise ValueError(period)
    feats = {}
    for k in orders:
        feats[f"{p}fourier_sin_{k}"] = F.sin(TAU * k * base / div)
        feats[f"{p}fourier_cos_{k}"] = F.cos(TAU * k * base / div)
    if mask_col is not None:
        if mask_values is None:
            mask_values = sorted(
                r[0] for r in df.select(mask_col).distinct().collect()
                if r[0] is not None
            )
        for v in mask_values:
            ind = (F.col(mask_col) == F.lit(v)).cast("double")
            tag = str(v).replace(" ", "_")
            for k in orders:
                feats[f"{p}fourier_sin_{k}_{tag}"] = (
                    F.sin(TAU * k * base / div) * ind
                )
                feats[f"{p}fourier_cos_{k}_{tag}"] = (
                    F.cos(TAU * k * base / div) * ind
                )
    return df.withColumns(feats)


def add_elapsed_features(
    df: DataFrame, start: str, end: str, prefix: str = "elapsed"
) -> DataFrame:
    """W7: elapsed between two timestamp cols in days & seconds, plus
    end-side weekday/weekend (FE_start_end_date_time_features,
    reference featurewiz/featurewiz.py:1635-1737)."""
    s, e = F.col(start), F.col(end)
    return df.withColumns(
        {
            f"{prefix}_days": F.datediff(e, s),
            f"{prefix}_seconds": F.unix_timestamp(e) - F.unix_timestamp(s),
            f"{prefix}_end_dayofweek": F.dayofweek(e),
            f"{prefix}_end_is_weekend": F.dayofweek(e).isin(1, 7).cast("int"),
        }
    )


def add_age_features(
    df: DataFrame, date_col: str, ref_date: str, prefix: str | None = None
) -> DataFrame:
    """W8 age-from-date in days/months/years against a PINNED reference
    date (determinism: the reference uses wall-clock pd.Timestamp('now'),
    featurewiz/featurewiz.py:1973 — we require an explicit ref_date)."""
    p = f"{prefix}_" if prefix else f"{date_col}_"
    ref = F.to_timestamp(F.lit(ref_date))
    return df.withColumns(
        {
            f"{p}age_days": F.datediff(ref, F.col(date_col)),
            f"{p}age_months": F.floor(F.months_between(ref, F.col(date_col))),
            f"{p}age_years": F.floor(F.months_between(ref, F.col(date_col)) / 12),
        }
    )
