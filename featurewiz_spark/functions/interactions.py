"""Pairwise interaction / polynomial feature generation (SURVEY.md §2.8).

Pure projections — Catalyst folds them into one whole-stage-codegen span;
no shuffle, no Python.
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def numeric_interactions(
    df: DataFrame, cols: list[str], ops: list[str] = ("div", "mult", "sub", "add", "sq")
) -> DataFrame:
    """DataBunch.gen_numeric_interaction_features (reference
    databunch.py:329-360; names :350-356): for every ordered pair (a, b):
    a/b, a*b, a-b, a+b; plus a² per column."""
    feats = {}
    for a, b in combinations(cols, 2):
        if "div" in ops:
            feats[f"{a}_div_by_{b}"] = F.col(a) / F.nullif(F.col(b), F.lit(0))
        if "mult" in ops:
            feats[f"{a}_mult_by_{b}"] = F.col(a) * F.col(b)
        if "sub" in ops:
            feats[f"{a}_minus_{b}"] = F.col(a) - F.col(b)
        if "add" in ops:
            feats[f"{a}_plus_{b}"] = F.col(a) + F.col(b)
    if "sq" in ops:
        for a in cols:
            feats[f"{a}_squared"] = F.pow(F.col(a), 2)
    return df.withColumns(feats)


def categorical_crosses(df: DataFrame, cats: list[str], sep: str = " ") -> DataFrame:
    """FE_create_categorical_feature_crosses /
    FE_create_interaction_vars (reference featurewiz/featurewiz.py:
    2160-2183, :2582-2602): concat crosses for all 2-combinations."""
    feats = {
        f"{a}_cross_{b}": F.concat_ws(sep, F.col(a).cast("string"), F.col(b).cast("string"))
        for a, b in combinations(cats, 2)
    }
    return df.withColumns(feats)


def polynomial_features(
    df: DataFrame, cols: list[str], degree: int = 2
) -> DataFrame:
    """PolyFeatureAdder (reference featurewiz/featurewiz.py:3548-3579):
    degree-2/3 products and powers."""
    feats = {}
    for a in cols:
        feats[f"{a}_pow2"] = F.pow(F.col(a), 2)
        if degree >= 3:
            feats[f"{a}_pow3"] = F.pow(F.col(a), 3)
    for a, b in combinations(cols, 2):
        feats[f"{a}_x_{b}"] = F.col(a) * F.col(b)
        if degree >= 3:
            feats[f"{a}2_x_{b}"] = F.pow(F.col(a), 2) * F.col(b)
            feats[f"{a}_x_{b}2"] = F.col(a) * F.pow(F.col(b), 2)
    return df.withColumns(feats)
