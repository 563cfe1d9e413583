"""Numeric transforms + row cleaning (SURVEY.md §2.2, §2.8)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_transforms(
    df: DataFrame, cols: list[str], kinds: list[str] = ("log", "sqrt")
) -> DataFrame:
    """log/log10/sqrt/maxabs transforms with the reference's abs+ε guard
    (FE_transform_numeric_columns_to_bins, reference
    featurewiz/featurewiz.py:2525-2579)."""
    feats = {}
    for c in cols:
        guarded = F.abs(F.col(c)) + F.lit(1e-15)
        if "log" in kinds:
            feats[f"{c}_log"] = F.log(guarded)
        if "log10" in kinds:
            feats[f"{c}_log10"] = F.log10(guarded)
        if "sqrt" in kinds:
            feats[f"{c}_sqrt"] = F.sqrt(F.abs(F.col(c)))
    out = df.withColumns(feats)
    if "maxabs" in kinds:
        maxes = out.agg(
            *[F.max(F.abs(F.col(c))).alias(c) for c in cols]
        ).first()
        out = out.withColumns(
            {f"{c}_maxabs": F.abs(F.col(c)) / F.lit(maxes[c] or 1.0) for c in cols}
        )
    return out


def drop_infinity_rows(df: DataFrame, cols: list[str], cap: bool = False) -> DataFrame:
    """P4 FE_drop_rows_with_infinity (reference
    featurewiz/featurewiz.py:309-351): drop rows with ±inf, or cap at the
    max finite value."""
    if not cap:
        cond = None
        for c in cols:
            this = ~F.col(c).isin(float("inf"), float("-inf")) | F.col(c).isNull()
            cond = this if cond is None else (cond & this)
        return df.filter(cond) if cond is not None else df
    caps = df.agg(
        *[
            F.max(F.when(~F.col(c).isin(float("inf"), float("-inf")), F.col(c))).alias(c)
            for c in cols
        ]
    ).first()
    return df.withColumns(
        {
            c: F.when(
                F.col(c).isin(float("inf"), float("-inf")), F.lit(caps[c])
            ).otherwise(F.col(c))
            for c in cols
        }
    )


def drop_zero_variance(df: DataFrame, num_cols: list[str]) -> tuple[DataFrame, list[str]]:
    """P5 zero-variance column drop (reference
    featurewiz/featurewiz.py:3514-3521) — one agg pass, driver drop list."""
    stats = df.agg(*[F.variance(c).alias(c) for c in num_cols]).first()
    dropped = [c for c in num_cols if stats[c] is not None and stats[c] == 0.0]
    return df.drop(*dropped), dropped


def dedup_rows(df: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """P3 duplicate-row dedup (reference featurewiz/featurewiz.py:999-1012
    drops duplicated index entries) → dropDuplicates on explicit keys."""
    return df.dropDuplicates(keys) if keys else df.dropDuplicates()
