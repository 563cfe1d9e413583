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
    # Every feature is ONE parsed SQL string (F.expr), not a nested
    # Column construction: the ~26-feature DSL build made ~170 py4j
    # round-trips of pure driver-side plan-construction latency
    # (measured ~0.12s per call in the flagship build). The parsed
    # expressions are identical — double literals carry the D suffix so
    # the SQL parser yields the same bit-exact double the DSL literal
    # did (repr round-trips, Double.parseDouble is correctly rounded),
    # and sin/cos outputs were verified bit-for-bit via exceptAll.
    t = "`" + ts.replace("`", "``") + "`"  # escape backticks in the name
    month_name = (
        "element_at(array("
        + ", ".join(f"'{m}'" for m in _MONTH_NAMES)
        + f"), month({t}))"
    )
    day_name = (
        "element_at(array("
        + ", ".join(f"'{d}'" for d in _DAY_NAMES)
        + f"), dayofweek({t}))"
    )
    typeofday = (
        f"CASE WHEN dayofweek({t}) IN (1, 7) THEN 'weekend' "
        "ELSE 'weekday' END"
    )

    def _in(vals) -> str:
        return ", ".join(str(v) for v in vals)

    feats_sql: dict[str, str] = {
        f"{p}hour": f"hour({t})",
        f"{p}minute": f"minute({t})",
        f"{p}dayofweek": f"dayofweek({t})",
        f"{p}quarter": f"quarter({t})",
        f"{p}month": f"month({t})",
        f"{p}year": f"year({t})",
        f"{p}dayofyear": f"dayofyear({t})",
        f"{p}dayofmonth": f"dayofmonth({t})",
        f"{p}weekofyear": f"weekofyear({t})",
        f"{p}is_weekend": f"cast(dayofweek({t}) IN (1, 7) as int)",
        f"{p}month_name": month_name,
        f"{p}dayofweek_name": day_name,
        f"{p}typeofday": typeofday,
        f"{p}is_festive": f"cast(month({t}) IN ({_in(_FESTIVE)}) as int)",
        f"{p}is_summer": f"cast(month({t}) IN ({_in(_SUMMER)}) as int)",
        f"{p}is_winter": f"cast(month({t}) IN ({_in(_WINTER)}) as int)",
        f"{p}is_cold": f"cast(month({t}) IN ({_in(_COLD)}) as int)",
        f"{p}is_warm": f"cast(month({t}) IN ({_in(_WARM)}) as int)",
    }
    if ref_year is not None:
        feats_sql[f"{p}age_in_years"] = f"{int(ref_year)} - year({t})"
    if cyclic:
        # reference formulas verbatim (my_encoders.py:921-924, 935-938,
        # 997-1000): x·2π/period with the raw 1-based month / day values
        # NOTE the operator order mirrors the DSL exactly — (x * TAU) /
        # period, NOT x * (TAU/period): pre-folding the constant would
        # change the last ulp of the result.
        feats_sql[f"{p}hour_sin"] = f"sin(hour({t}) * {TAU!r}D / 24)"
        feats_sql[f"{p}hour_cos"] = f"cos(hour({t}) * {TAU!r}D / 24)"
        feats_sql[f"{p}dayofweek_sin"] = (
            f"sin((dayofweek({t}) - 1) * {TAU!r}D / 7)"
        )
        feats_sql[f"{p}dayofweek_cos"] = (
            f"cos((dayofweek({t}) - 1) * {TAU!r}D / 7)"
        )
        feats_sql[f"{p}month_sin"] = f"sin(month({t}) * {TAU!r}D / 12)"
        feats_sql[f"{p}month_cos"] = f"cos(month({t}) * {TAU!r}D / 12)"
        feats_sql[f"{p}dayofmonth_sin"] = (
            f"sin(dayofmonth({t}) * {TAU!r}D / 30)"
        )
        feats_sql[f"{p}dayofmonth_cos"] = (
            f"cos(dayofmonth({t}) * {TAU!r}D / 30)"
        )
    if crosses:
        feats_sql[f"{p}dow_hour"] = (
            f"concat_ws('_', cast(dayofweek({t}) as string), "
            f"cast(hour({t}) as string))"
        )
        feats_sql[f"{p}month_dow"] = (
            f"concat_ws('_', cast(month({t}) as string), "
            f"cast(dayofweek({t}) as string))"
        )
        feats_sql[f"{p}month_typeofday"] = (
            f"concat_ws('_', {month_name}, {typeofday})"
        )
    if keep is not None:
        feats_sql = {k: v for k, v in feats_sql.items() if k in set(keep)}
    return df.withColumns({k: F.expr(v) for k, v in feats_sql.items()})


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
