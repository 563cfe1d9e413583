"""Groupby aggregator / encoder tests vs pandas oracles (reference
semantics cited per test)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def mixed_pdf():
    rng = np.random.default_rng(11)
    n = 400
    return pd.DataFrame(
        {
            "cat": rng.choice(["a", "b", "c", "d"], n, p=[0.5, 0.3, 0.15, 0.05]),
            "num": rng.normal(10, 3, n),
            "y": rng.normal(100, 20, n),
            "id": np.arange(n),
        }
    )


def test_groupby_aggregate_vs_pandas(spark, mixed_pdf):
    from featurewiz_spark.operators.groupby import groupby_aggregate

    df = spark.createDataFrame(mixed_pdf)
    out, fitted = groupby_aggregate(df, ["cat"], ["num"], ["mean", "max", "count"])
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    exp = mixed_pdf.copy()
    for f, pf in [("mean", "mean"), ("max", "max"), ("count", "count")]:
        exp[f"num_by_cat_{f}"] = exp.groupby("cat")["num"].transform(pf)
    exp = exp.sort_values("id").reset_index(drop=True)
    for f in ["mean", "max", "count"]:
        assert np.allclose(got[f"num_by_cat_{f}"], exp[f"num_by_cat_{f}"])


def test_fitted_aggregates_train_test_contract(spark, mixed_pdf):
    """J4: test rows with unseen categories get fill=0 (reference
    my_encoders.py:774-817)."""
    from featurewiz_spark.operators.groupby import (
        apply_fitted_aggregates,
        groupby_aggregate,
    )

    df = spark.createDataFrame(mixed_pdf)
    _, fitted = groupby_aggregate(df, ["cat"], ["num"], ["mean"])
    test = spark.createDataFrame(
        pd.DataFrame({"cat": ["a", "zz"], "num": [1.0, 2.0], "y": [0.0, 0.0], "id": [0, 1]})
    )
    got = apply_fitted_aggregates(test, fitted).toPandas().set_index("cat")
    exp_a = mixed_pdf[mixed_pdf.cat == "a"]["num"].mean()
    assert abs(got.loc["a", "num_by_cat_mean"] - exp_a) < 1e-9
    assert got.loc["zz", "num_by_cat_mean"] == 0.0


def test_rare_class_combine_vs_reference(spark, mixed_pdf):
    """A5/E2: freq ≤ 1% → RARE; null → missing
    (reference my_encoders.py:279-287)."""
    from featurewiz_spark.operators.encoders import rare_class_combine

    pdf = mixed_pdf.copy()
    pdf.loc[:3, "cat"] = None
    pdf.loc[4:6, "cat"] = "ultra_rare"
    df = spark.createDataFrame(pdf)
    out, _ = rare_class_combine(df, "cat", threshold=0.01)
    got = out.toPandas()
    assert (got.loc[got["cat"].isna(), "cat_combined"] == "missing").all()
    assert (got.loc[got["cat"] == "ultra_rare", "cat_combined"] == "RARE").all()
    assert (got.loc[got["cat"] == "a", "cat_combined"] == "a").all()


def test_frequency_encode_vs_pandas(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import frequency_encode

    df = spark.createDataFrame(mixed_pdf)
    out, _ = frequency_encode(df, "cat")
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    exp = (
        mixed_pdf["cat"]
        .map(mixed_pdf["cat"].value_counts(normalize=True))
        .reset_index(drop=True)
    )
    assert np.allclose(got["cat_freq"], exp)


def test_target_encode_smoothing(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import target_encode

    df = spark.createDataFrame(mixed_pdf)
    out, _ = target_encode(df, "cat", "y", smoothing=20.0)
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    gm = mixed_pdf["y"].mean()
    stats = mixed_pdf.groupby("cat")["y"].agg(["count", "mean"])
    enc = (stats["count"] * stats["mean"] + 20.0 * gm) / (stats["count"] + 20.0)
    exp = mixed_pdf["cat"].map(enc).reset_index(drop=True)
    assert np.allclose(got["cat_target_enc"], exp)


def test_ordered_te_leakage_free(spark):
    """Each row's encoding uses only strictly-earlier rows of its cat."""
    from featurewiz_spark.operators.encoders import ordered_target_encode

    pdf = pd.DataFrame(
        {
            "cat": ["a", "a", "a", "b"],
            "y": [10.0, 20.0, 30.0, 5.0],
            "ts": pd.date_range("2024-01-01", periods=4, freq="D"),
        }
    )
    df = spark.createDataFrame(pdf)
    got = (
        ordered_target_encode(df, "cat", "y", "ts", prior=0.0, prior_weight=1.0)
        .toPandas()
        .sort_values(["cat", "ts"])
        .reset_index(drop=True)
    )
    # row0: (0+0)/(0+1)=0; row1: (10+0)/2=5; row2: (30+0)/3=10
    assert np.allclose(got[got.cat == "a"]["cat_ordered_te"], [0.0, 5.0, 10.0])


def test_label_encode_first_appearance(spark):
    """E1: codes by first-appearance order; unseen → max+1
    (reference my_encoders.py:34-136)."""
    from featurewiz_spark.operators.encoders import apply_label_encoding, label_encode

    pdf = pd.DataFrame({"c": ["z", "m", "z", "a", "m"], "ord": range(5)})
    df = spark.createDataFrame(pdf)
    out, mapping = label_encode(df, "c", order_col="ord")
    got = out.toPandas().sort_values("ord")["c_code"].tolist()
    assert got == [0, 1, 0, 2, 1]  # z first → 0, m → 1, a → 2
    test = spark.createDataFrame(pd.DataFrame({"c": ["m", "new1", "new2"]}))
    tgot = apply_label_encoding(test, "c", mapping).toPandas().set_index("c")["c_code"]
    assert tgot["m"] == 1
    assert {tgot["new1"], tgot["new2"]} == {3, 4}


def test_clean_nans_median_fill(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import clean_nans

    pdf = mixed_pdf.copy()
    pdf.loc[pdf.index[:40], "num"] = np.nan
    df = spark.createDataFrame(pdf)
    out, fills = clean_nans(df, ["num"], stat="median")
    med = pdf["num"].median()
    assert abs(fills["num"] - med) < 1e-9
    got = out.toPandas()
    assert got["num"].isna().sum() == 0
    assert got["num_isNAN"].sum() == 40


def test_standard_scale(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import standard_scale

    df = spark.createDataFrame(mixed_pdf)
    out, _ = standard_scale(df, ["num"], "std")
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    exp = (mixed_pdf["num"] - mixed_pdf["num"].mean()) / mixed_pdf["num"].std()
    assert np.allclose(got["num_scaled"], exp.reset_index(drop=True))


def test_ranking_average_matches_pandas(spark, mixed_pdf):
    """W5 'average' rank == pandas rank(method='average')."""
    from featurewiz_spark.operators.groupby import ranking_aggregate

    pdf = mixed_pdf.copy()
    pdf["num_r"] = pdf["num"].round(0)  # force ties
    df = spark.createDataFrame(pdf)
    got = (
        ranking_aggregate(df, ["cat"], "num_r", method="average")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    exp = (
        pdf.sort_values("id")
        .groupby("cat")["num_r"]
        .rank(method="average")
        .reset_index(drop=True)
    )
    assert np.allclose(got["num_r_rank_average"], exp)


def test_quantile_bin_matches_pandas_qcut_edges(spark, mixed_pdf):
    from featurewiz_spark.operators.binning import quantile_bin

    df = spark.createDataFrame(mixed_pdf)
    out, edges = quantile_bin(df, "num", bins=4)
    exp_edges = mixed_pdf["num"].quantile([0.25, 0.5, 0.75]).to_numpy()
    assert np.allclose(edges, exp_edges)
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    exp_bins = pd.cut(
        mixed_pdf["num"],
        [-np.inf, *exp_edges, np.inf],
        labels=False,
        right=True,
    ).reset_index(drop=True)
    assert (got["num_bin"].to_numpy() == exp_bins.to_numpy()).all()


def test_tree_bin_edges_reduce_variance(spark):
    from featurewiz_spark.operators.binning import tree_bin_edges

    rng = np.random.default_rng(13)
    x = rng.uniform(0, 10, 600)
    y = (x > 3).astype(float) * 5 + (x > 7).astype(float) * 5 + rng.normal(0, 0.1, 600)
    df = spark.createDataFrame(pd.DataFrame({"x": x, "y": y}))
    edges = tree_bin_edges(df, "x", "y", max_depth=2)
    assert any(abs(e - 3) < 0.5 for e in edges)
    assert any(abs(e - 7) < 0.5 for e in edges)
