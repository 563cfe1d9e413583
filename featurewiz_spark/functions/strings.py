"""String scalar functions (SURVEY.md §2.8) — JVM built-ins only."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_field(
    df: DataFrame, col: str, sep: str = " ", n: int | None = None,
    filler: str = "", add_count: bool = True,
) -> DataFrame:
    """FE_split_one_field_into_many (reference
    featurewiz/featurewiz.py:1739-1807): split into n columns (pad with
    filler) + token count."""
    arr = F.split(F.col(col), re.escape(sep))
    if n is None:
        n = df.agg(F.max(F.size(arr))).first()[0] or 1
    feats = {
        f"{col}_{i}": F.coalesce(arr.getItem(i), F.lit(filler)) for i in range(n)
    }
    if add_count:
        feats[f"{col}_count"] = F.size(arr)
    return df.withColumns(feats)


def split_reduce(
    df: DataFrame, col: str, sep: str = " ", op: str = "add",
    out_col: str | None = None,
) -> DataFrame:
    """FE_split_add_column (reference featurewiz/featurewiz.py:1911-1958):
    split then fold with +, *, or string-concat — higher-order
    ``aggregate`` over the split array (stays in codegen).

    Built from Column expressions, not interpolated SQL: `sep` is a
    literal separator (regex-escaped, so '.', '|', \"'\" all work) and
    the column name can't break the expression (r1 verdict bug #7)."""
    out_col = out_col or f"{col}_{op}"
    arr = F.split(F.col(col), re.escape(sep))
    nums = F.transform(arr, lambda x: x.cast("double"))
    if op == "add":
        e = F.aggregate(nums, F.lit(0.0), lambda a, x: a + x)
    elif op == "mult":
        e = F.aggregate(nums, F.lit(1.0), lambda a, x: a * x)
    elif op == "concat":
        e = F.array_join(arr, "")
    else:
        raise ValueError(op)
    return df.withColumn(out_col, e)


def concat_columns(
    df: DataFrame, cols: list[str], filler: str = " ", out_col: str | None = None
) -> DataFrame:
    """FE_concatenate_multiple_columns (reference
    featurewiz/featurewiz.py:2456-2476)."""
    out_col = out_col or "_".join(cols)
    return df.withColumn(
        out_col, F.concat_ws(filler, *[F.col(c).cast("string") for c in cols])
    )


def strip_commas_numeric(df: DataFrame, cols: list[str]) -> DataFrame:
    """P7 FE_remove_commas_in_numerics (reference
    featurewiz/featurewiz.py:3610-3623): '1,234.5' → 1234.5."""
    return df.withColumns(
        {c: F.regexp_replace(F.col(c), ",", "").cast("double") for c in cols}
    )


def sanitize_column_names(df: DataFrame) -> DataFrame:
    """P6 special-char rename + uniquify (EDA_remove_special_chars,
    reference featurewiz/featurewiz.py:3581-3595; Column_Names_Transformer
    my_encoders.py:1953-2032) — driver-side string op, free."""
    seen: set[str] = set()
    new = []
    for c in df.columns:
        s = re.sub(r"[^A-Za-z0-9_]", "_", c)
        # loop until genuinely unique: the suffixed name itself must be
        # registered and re-checked, else 'a b','a*b','a_b_1' yields two
        # 'a_b_1' columns (AMBIGUOUS_REFERENCE downstream — the exact
        # failure this uniquifier exists to prevent)
        base, i = s, 0
        while s in seen:
            i += 1
            s = f"{base}_{i}"
        seen.add(s)
        new.append(s)
    return df.toDF(*new)


def explode_list_column(df: DataFrame, col: str, n: int | None = None) -> DataFrame:
    """FE_split_list_into_columns (reference
    featurewiz/featurewiz.py:2808-2840): bounded getItem projections."""
    if n is None:
        n = df.agg(F.max(F.size(F.col(col)))).first()[0] or 1
    return df.withColumns(
        {f"{col}_{i}": F.col(col).getItem(i) for i in range(n)}
    )
