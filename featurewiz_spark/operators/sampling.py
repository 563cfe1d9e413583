"""Row sampling / splitting (SURVEY.md §2.2 P9/P10, §2.1 S4).

The reference splits with sklearn train_test_split (random/stratified)
or sequential head-slices for time series (split_data_n_ways,
featurewiz/featurewiz.py:2362-2454; stratified sampler :2842-2870;
nrows load sampling :267-276). Spark-first: randomSplit for random,
sampleBy for stratified, percent_rank over the time column for
sequential — none of them collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_n_ways(
    df: DataFrame,
    weights: list[float],
    how: str = "random",
    seed: int = 42,
    stratify_col: str | None = None,
    time_col: str | None = None,
) -> list[DataFrame]:
    """P9 split_data_n_ways (reference featurewiz/featurewiz.py:2362-2454):
    2/3/4/6-way split.

    how='random'     → randomSplit(weights, seed)
    how='sequential' → time-ordered contiguous slices via percent_rank
                       over time_col (regression/time-series mode)
    how='stratified' → per-class randomSplit preserved by a seeded hash
                       on (stratify_col, row) — every class keeps ~the
                       same proportions in each slice.
    """
    total = sum(weights)
    bounds = []
    acc = 0.0
    for w in weights:
        acc += w / total
        bounds.append(acc)
    if how == "random":
        return df.randomSplit(list(weights), seed=seed)
    if how == "sequential":
        if not time_col:
            raise ValueError("sequential split needs time_col")
        w = Window.orderBy(F.col(time_col))
        ranked = df.withColumn("__pr", F.percent_rank().over(w))
        out = []
        lo = -0.1
        for hi in bounds:
            out.append(ranked.filter((F.col("__pr") > lo) & (F.col("__pr") <= hi)).drop("__pr"))
            lo = hi
        return out
    if how == "stratified":
        if not stratify_col:
            raise ValueError("stratified split needs stratify_col")
        # uniform-in-[0,1) seeded hash per row, ranked WITHIN each class:
        # percent_rank inside the class makes the proportions exact per
        # class (sklearn's stratified behavior), not just in expectation
        w = Window.partitionBy(stratify_col).orderBy(
            F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))
        )
        ranked = df.withColumn("__pr", F.percent_rank().over(w))
        out = []
        lo = -0.1
        for hi in bounds:
            out.append(ranked.filter((F.col("__pr") > lo) & (F.col("__pr") <= hi)).drop("__pr"))
            lo = hi
        return out
    raise ValueError(how)


def stratified_sample(
    df: DataFrame, strata_col: str, n_rows: int, seed: int = 42,
    min_class_rows: int = 3,
) -> DataFrame:
    """P10 EDA_randomly_select_rows_from_dataframe (reference
    featurewiz/featurewiz.py:2842-2870): drop classes with ≤ min_class_rows
    rows, then sample each remaining class at the global fraction
    n_rows/N (sampleBy — one pass, no collect of data rows)."""
    counts = {r[0]: r[1] for r in df.groupBy(strata_col).count().collect()}
    keep = {k: v for k, v in counts.items() if v > min_class_rows}
    total = sum(keep.values())
    if total <= n_rows:
        return df.filter(F.col(strata_col).isin(list(keep)))
    frac = n_rows / total
    fractions = {k: min(1.0, frac) for k in keep}
    return df.filter(F.col(strata_col).isin(list(keep))).sampleBy(
        strata_col, fractions=fractions, seed=seed
    )


def head_sample(df: DataFrame, n_rows: int) -> DataFrame:
    """S4 regression-mode load sampling: first-N rows (reference
    featurewiz/featurewiz.py:267-270)."""
    return df.limit(n_rows)
