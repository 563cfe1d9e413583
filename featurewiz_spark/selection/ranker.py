"""Recursive importance-voting feature ranking (reference
FE_perform_recursive_xgboost, featurewiz/featurewiz.py:1279-1519).

Semantics mirrored:
- columns chunked into ~5 slices (iter_limit = ceil(ncols/5),
  featurewiz.py:1340-1343)
- per slice: train a boosted-tree model, read total_gain importances
  (featurewiz.py:1473-1479)
- keep features with importance ≥ 0.5·max, else top_num = 25% of cols
  if ≤50 else 20% (featurewiz.py:1344-1354,1486-1497)
- union across slices with order-preserving dedup (featurewiz.py:1492-1499)

Distributed shape: training data is a DETERMINISTIC hash-ordered sample
collected to the driver (the reference itself caps training rows and
drops to 20 boost rounds above 100k rows, featurewiz.py:1372-1375);
cluster-size invariance of the selected set follows from the
deterministic sample (SURVEY.md §7.4). Model = xgboost when installed,
else the pure-numpy histogram GBT (selection/gbt.py).
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.selection.gbt import HAS_XGBOOST, NumpyGBT


def deterministic_sample(
    df: DataFrame, cols: list[str], n: int, key_cols: list[str] | None = None
):
    """Hash-ordered top-n sample: stable across partitioning/cluster size.
    Orders by xxhash64 of the row's feature values (plus optional keys)."""
    h = F.xxhash64(*[F.col(c) for c in (key_cols or cols)])
    return (
        df.select(*cols)
        .withColumn("__h", h)
        .orderBy("__h")
        .limit(n)
        .drop("__h")
        .toPandas()
    )


def _train_importances(
    X: np.ndarray, y: np.ndarray, problem_type: str, n_rounds: int
) -> np.ndarray:
    objective = (
        "reg:squarederror" if problem_type == "Regression" else "binary:logistic"
    )
    if HAS_XGBOOST:
        import xgboost as xgb

        dtrain = xgb.DMatrix(X, label=y)
        params = {
            "objective": objective,
            "tree_method": "hist",
            "max_depth": 8,  # reference default depth (featurewiz.py:727-784)
            "seed": 99,
        }
        booster = xgb.train(params, dtrain, num_boost_round=n_rounds)
        score = booster.get_score(importance_type="total_gain")
        imp = np.zeros(X.shape[1])
        for name, v in score.items():
            imp[int(name[1:])] = v
        return imp
    model = NumpyGBT(objective=objective, n_rounds=n_rounds, max_depth=6)
    model.fit(X, y)
    return model.feature_importances()


def recursive_feature_ranking(
    df: DataFrame,
    features: list[str],
    target: str | list[str],
    problem_type: str = "Regression",
    sample_rows: int = 10000,
    n_slices: int = 5,
    engine: str = "sample",
    hist_rounds: int = 20,
    hist_depth: int = 6,
) -> list[str]:
    """Returns the selected feature list (order-preserving union).

    `target` may be a LIST of target columns (reference multi-label
    support, featurewiz.py:788-795): the model is wrapped MultiOutput-
    style and feature importances are taken from the FIRST estimator
    (reference featurewiz.py:1408-1417) — so ranking trains on
    target[0] while every listed target is excluded from the
    candidates (the caller guarantees `features` excludes them).

    engine='sample' (default): train on a deterministic hash-ordered
    driver sample of `sample_rows` rows — the reference's own row-cap
    behavior (featurewiz.py:1372-1375). engine='hist': train the
    distributed histogram GBT (selection/dist_gbt.py) on EVERY row —
    no driver collect, partition-count-invariant splits; rounds pinned
    to 20, the reference's own ≥100k-row setting, since this engine
    exists for the at-scale regime. Same slice / keep / union rules
    either way.
    """
    if not features:
        return []
    targets = [target] if isinstance(target, str) else list(target)
    target = targets[0]
    ncols = len(features)
    slice_size = math.ceil(ncols / n_slices)
    # top_num rule (featurewiz.py:1344-1354)
    top_frac = 0.25 if ncols <= 50 else 0.20
    top_num = max(1, int(round(ncols * top_frac)))

    if engine == "hist":
        from featurewiz_spark.selection.dist_gbt import SparkGBT

        objective = (
            "reg:squarederror"
            if problem_type == "Regression"
            else "binary:logistic"
        )
        train = df
        if problem_type != "Regression":
            # binarize vs most-frequent class (ties to lowest value,
            # matching np.argmax-on-unique below)
            mode_row = (
                df.groupBy(target)
                .count()
                .where(F.col(target).isNotNull())
                .orderBy(F.desc("count"), F.asc(target))
                .first()
            )
            train = df.withColumn(
                target,
                (F.col(target) == F.lit(mode_row[0])).cast("double"),
            )
    elif engine != "sample":
        raise ValueError(f"unknown engine {engine!r}; use sample|hist")

    if engine == "sample":
        # counted here, not up front: the hist engine trains on every
        # row and must not pay a full count() scan it never uses
        total = df.count()
        n_rounds = 20 if total >= 100_000 else 100  # featurewiz.py:1372-1375
        pdf = deterministic_sample(
            df, features + [target], min(sample_rows, total)
        )
        y = pdf[target].to_numpy(dtype=np.float64)
        if problem_type != "Regression":
            # binarize vs most-frequent class for gradient purposes
            vals, counts = np.unique(y[~np.isnan(y)], return_counts=True)
            y = (y == vals[np.argmax(counts)]).astype(np.float64)

    selected: list[str] = []
    for s in range(0, ncols, slice_size):
        chunk = features[s : s + slice_size]
        if engine == "hist":
            model = SparkGBT(
                objective=objective, n_rounds=hist_rounds,
                max_depth=hist_depth,
            )
            model.fit(train, chunk, target)
            imp = model.feature_importances()
        else:
            X = pdf[chunk].to_numpy(dtype=np.float64)
            imp = _train_importances(X, y, problem_type, n_rounds)
        mx = imp.max()
        if mx > 0:
            keep = [c for c, v in zip(chunk, imp) if v >= 0.5 * mx]
        else:
            keep = []
        if not keep:
            order = np.argsort(-imp, kind="stable")
            keep = [chunk[i] for i in order[: min(top_num, len(chunk))]]
        for c in keep:
            if c not in selected:
                selected.append(c)
    if not selected:  # crash-fallback ladder (featurewiz.py:1513-1518)
        return list(features)
    return selected
