"""Calendar / cyclic / elapsed time features (SURVEY.md §2.5 W1, W7–W9).

All pure projections — no shuffle; whole-stage-codegen-friendly column
expressions only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TAU = 2 * math.pi


def add_calendar_features(
    df: DataFrame,
    ts: str,
    prefix: str | None = None,
    cyclic: bool = True,
    crosses: bool = True,
    keep: list[str] | None = None,
) -> DataFrame:
    """W1: the reference's ~30 calendar decompositions
    (_create_ts_features, reference featurewiz/my_encoders.py:902-1012):
    hour/minute/dayofweek/quarter/month/year/dayofyear/dayofmonth/
    weekofyear, sin/cos cyclic encodings, weekend flag, dow×hour and
    month×dow crosses.

    `keep` replays a fitted train-side column contract on test
    (reference ts_adds_in, my_encoders.py:1022-1129): only those features
    are produced — zero-variance drops decided on train stay dropped.
    """
    p = f"{prefix}_" if prefix else f"{ts}_"
    t = F.col(ts)
    # Spark dayofweek: Sunday=1..Saturday=7 (documented); reference uses
    # pandas dayofweek Monday=0..Sunday=6 — we standardize on Spark's and
    # expose weekend via day name, so semantics stay explicit.
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
    }
    if cyclic:
        feats[f"{p}hour_sin"] = F.sin(F.hour(t) * TAU / 24)
        feats[f"{p}hour_cos"] = F.cos(F.hour(t) * TAU / 24)
        feats[f"{p}dayofweek_sin"] = F.sin((F.dayofweek(t) - 1) * TAU / 7)
        feats[f"{p}dayofweek_cos"] = F.cos((F.dayofweek(t) - 1) * TAU / 7)
        feats[f"{p}month_sin"] = F.sin((F.month(t) - 1) * TAU / 12)
        feats[f"{p}month_cos"] = F.cos((F.month(t) - 1) * TAU / 12)
        feats[f"{p}dayofmonth_sin"] = F.sin((F.dayofmonth(t) - 1) * TAU / 31)
        feats[f"{p}dayofmonth_cos"] = F.cos((F.dayofmonth(t) - 1) * TAU / 31)
    if crosses:
        feats[f"{p}dow_hour"] = F.concat_ws(
            "_", F.dayofweek(t).cast("string"), F.hour(t).cast("string")
        )
        feats[f"{p}month_dow"] = F.concat_ws(
            "_", F.month(t).cast("string"), F.dayofweek(t).cast("string")
        )
    if keep is not None:
        feats = {k: v for k, v in feats.items() if k in set(keep)}
    return df.withColumns(feats)


def add_fourier_features(
    df: DataFrame, ts: str, orders: list[int] = (1, 2, 4), period: str = "year",
    prefix: str | None = None,
) -> DataFrame:
    """W9 Fourier seasonal features (TS_Fourier_Transformer,
    reference featurewiz/my_encoders.py:1812-1947, features :1902-1928):
    sin/cos(2πk·dayofyear/365) (period='year') or weekofyear/52
    (period='week')."""
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
