"""SULOV / MI / recursive-ranking / profiling / facade tests."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def corr_pdf():
    rng = np.random.default_rng(21)
    n = 2000
    x1 = rng.normal(size=n)
    x2 = x1 + rng.normal(scale=0.05, size=n)  # ~x1 (corr ≈ 0.999)
    x3 = rng.normal(size=n)  # independent
    x4 = x3 * 0.9 + rng.normal(scale=0.1, size=n)  # ~x3
    noise = rng.normal(size=n)
    y = 3 * x1 + x3 + rng.normal(scale=0.1, size=n)
    return pd.DataFrame(
        {"x1": x1, "x2": x2, "x3": x3, "x4": x4, "noise": noise, "y": y}
    )


def test_correlation_matrix_matches_pandas(spark, corr_pdf):
    from featurewiz_spark.selection.sulov import correlation_matrix

    df = spark.createDataFrame(corr_pdf)
    cols = ["x1", "x2", "x3", "x4", "noise"]
    got = correlation_matrix(df, cols)
    exp = corr_pdf[cols].corr().abs()
    assert np.allclose(got.to_numpy(), exp.to_numpy(), atol=1e-9)


def test_mutual_info_ranks_signal_over_noise(spark, corr_pdf):
    from featurewiz_spark.selection.sulov import mutual_info

    df = spark.createDataFrame(corr_pdf)
    mi = mutual_info(df, ["x1", "x3", "noise"], "y", "Regression")
    assert mi["x1"] > mi["noise"]
    assert mi["x3"] > mi["noise"]
    assert mi["x1"] > mi["x3"]  # stronger coefficient → higher MI


@pytest.mark.parametrize("mode", ["pairwise", "groupwise"])
def test_sulov_removes_redundant_keeps_best(spark, corr_pdf, mode):
    from featurewiz_spark.selection.sulov import sulov_select

    df = spark.createDataFrame(corr_pdf)
    sel = sulov_select(
        df, ["x1", "x2", "x3", "x4", "noise"], "y",
        corr_limit=0.7, mode=mode,
    )
    # one of each correlated pair survives; noise untouched (no pair)
    assert ("x1" in sel) != ("x2" in sel)
    assert ("x3" in sel) != ("x4" in sel)
    assert "noise" in sel
    # the higher-MI member of each pair is kept
    assert "x1" in sel
    assert "x3" in sel


def test_sulov_deterministic(spark, corr_pdf):
    from featurewiz_spark.selection.sulov import sulov_select

    df = spark.createDataFrame(corr_pdf)
    a = sulov_select(df, ["x1", "x2", "x3", "x4", "noise"], "y", 0.7)
    b = sulov_select(df, ["x1", "x2", "x3", "x4", "noise"], "y", 0.7)
    assert a == b


def test_numpy_gbt_learns_and_ranks(corr_pdf):
    from featurewiz_spark.selection.gbt import NumpyGBT

    X = corr_pdf[["x1", "noise"]].to_numpy()
    y = corr_pdf["y"].to_numpy()
    m = NumpyGBT(n_rounds=20, max_depth=3)
    m.fit(X, y)
    imp = m.feature_importances()
    assert imp[0] > imp[1] * 10  # x1 dominates noise


def test_recursive_ranking_selects_signal(spark, corr_pdf):
    from featurewiz_spark.selection.ranker import recursive_feature_ranking

    df = spark.createDataFrame(corr_pdf)
    sel = recursive_feature_ranking(
        df, ["x1", "x3", "noise"], "y", "Regression", sample_rows=2000
    )
    assert "x1" in sel
    assert "noise" not in sel or len(sel) == 3  # noise must not beat signal


def test_classify_columns_taxonomy(spark):
    from featurewiz_spark.profiling import classify_columns

    rng = np.random.default_rng(5)
    n = 500
    pdf = pd.DataFrame(
        {
            "const": 1,
            "mostly_null": [None] * 495 + [1.0] * 5,
            "bools": rng.integers(0, 2, n),
            "yn": rng.choice(["y", "n"], n),
            "cat": rng.choice(list("abcde"), n),
            "bigcat": [f"v{i % 80}" for i in range(n)],
            "ident": [f"id_{i}" for i in range(n)],
            "cont": rng.normal(size=n),
            "ints": rng.integers(0, 1000, n),
            "ts": pd.date_range("2024-01-01", periods=n, freq="h"),
            "y": rng.integers(0, 2, n),
        }
    )
    df = spark.createDataFrame(pdf)
    tx = classify_columns(df, target="y")
    assert "const" in tx.cols_delete
    assert "mostly_null" in tx.cols_delete
    assert "bools" in tx.num_bool_vars
    assert "yn" in tx.string_bool_vars
    assert "cat" in tx.cat_vars
    assert "bigcat" in tx.discrete_string_vars
    assert "ident" in tx.id_vars
    assert "cont" in tx.continuous_vars
    assert "ints" in tx.int_vars
    assert "ts" in tx.date_vars


def test_analyze_problem_type(spark):
    from featurewiz_spark.profiling import analyze_problem_type

    pdf = pd.DataFrame(
        {
            "bin": np.random.default_rng(1).integers(0, 2, 100),
            "multi": np.random.default_rng(2).integers(0, 5, 100),
            "reg": np.random.default_rng(3).normal(size=100),
        }
    )
    df = spark.createDataFrame(pdf)
    assert analyze_problem_type(df, "bin") == "Binary_Classification"
    assert analyze_problem_type(df, "multi") == "Multi_Classification"
    assert analyze_problem_type(df, "reg") == "Regression"


def test_facade_fit_transform_and_replay(spark, corr_pdf):
    from featurewiz_spark.plans.facade import FeatureWizSpark

    pdf = corr_pdf.copy()
    pdf["cat"] = np.random.default_rng(9).choice(["a", "b", "c"], len(pdf))
    df = spark.createDataFrame(pdf)
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    fw = FeatureWizSpark(corr_limit=0.7, feature_engg=["groupby"])
    out = fw.fit_transform(train, "y")
    assert fw.features  # something selected
    assert set(out.columns) == set(fw.features + ["y"])
    # redundant partner eliminated by SULOV
    assert ("x1" in fw.features) != ("x2" in fw.features)
    replayed = fw.transform(test)
    assert [c for c in replayed.columns if c != "y"] == fw.features
    assert replayed.count() > 0


def test_facade_category_encoder_suite(spark, corr_pdf):
    """E4/E5 through the facade: every named encoder fits on train and
    replays on test with no re-fit (reference databunch.py:252-327)."""
    from featurewiz_spark.plans.facade import FeatureWizSpark

    pdf = corr_pdf.copy()
    # category correlated with y: glmm's LEARNED shrinkage stays > 0
    # (a y-independent cat gives tau^2 = 0 → constant column → the
    # zero-variance drop removes it, correctly)
    pdf["cat"] = pd.qcut(pdf["y"], 3, labels=["a", "b", "c"]).astype(str)
    df = spark.createDataFrame(pdf)
    train, test = df.randomSplit([0.8, 0.2], seed=42)
    fw = FeatureWizSpark(
        corr_limit=0.7,
        category_encoders=["frequency", "woe", "target", "helmert", "basen",
                           "hashing", "james_stein", "glmm"],
        skip_sulov=True, skip_ranking=True,
    )
    # binary target for woe
    train = train.withColumn("y", (F.col("y") > 0).cast("double"))
    test = test.withColumn("y", (F.col("y") > 0).cast("double"))
    out = fw.fit_transform(train, "y")
    gen = [c for c in out.columns if c.startswith("cat_") or c.startswith("GroupEncoded_")]
    assert any("freq" in c for c in out.columns)
    assert any("woe" in c for c in out.columns)
    assert any("helmert" in c for c in out.columns)
    assert any("glmm" in c for c in out.columns)
    replayed = fw.transform(test)
    assert [c for c in replayed.columns if c != "y"] == fw.features
    assert replayed.count() > 0


def test_spearman_approx_matches_exact(spark, corr_pdf):
    """Quantile-ECDF midrank Spearman (shuffle-free scale path) tracks
    exact windowed-rank Spearman within ~1e-2, including under ties."""
    from featurewiz_spark.selection.sulov import correlation_matrix

    pdf = corr_pdf.copy()
    pdf["xt"] = np.round(pdf["x1"], 0)  # heavy ties (~10 distinct values)
    df = spark.createDataFrame(pdf)
    cols = ["x1", "x2", "x3", "xt", "noise"]
    exact = correlation_matrix(df, cols, method="spearman_exact")
    approx = correlation_matrix(df, cols, method="spearman")
    assert np.allclose(approx.to_numpy(), exact.to_numpy(), atol=0.015)


def test_ranking_stable_across_sample_sizes(spark):
    """F2 trains on a deterministic hash-ordered sample (the reference's
    own row cap). On separable data the SELECTED set must not depend on
    the sample size — the signal features survive at 1k and at 10k rows
    (r3 verdict item 6: sample_rows is now caller-configurable through
    the facade)."""
    from featurewiz_spark.selection.ranker import recursive_feature_ranking

    rng = np.random.default_rng(33)
    n = 12000
    pdf = pd.DataFrame({
        "sig1": rng.normal(size=n),
        "sig2": rng.normal(size=n),
        "noise1": rng.normal(size=n),
        "noise2": rng.normal(size=n),
        "noise3": rng.normal(size=n),
    })
    pdf["y"] = 5.0 * pdf.sig1 - 4.0 * pdf.sig2 + 0.01 * rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    feats = ["sig1", "sig2", "noise1", "noise2", "noise3"]
    picked = {}
    for sr in (1000, 10000):
        picked[sr] = set(
            recursive_feature_ranking(df, feats, "y", "Regression",
                                      sample_rows=sr)
        )
        assert {"sig1", "sig2"} <= picked[sr], (sr, picked[sr])


def test_spark_gbt_distributed_ranking(spark):
    """engine='hist' trains the distributed histogram GBT on EVERY row
    (no driver sample). Pin: (a) signal features out-rank noise and the
    selected set agrees with the sample engine on separable data;
    (b) int64-quantized histograms make the learned gains BIT-IDENTICAL
    across partition counts — the determinism float partials can't give."""
    from featurewiz_spark.selection.dist_gbt import SparkGBT
    from featurewiz_spark.selection.ranker import recursive_feature_ranking

    rng = np.random.default_rng(44)
    n = 20000
    pdf = pd.DataFrame({
        "sig1": rng.normal(size=n),
        "sig2": rng.normal(size=n),
        "noise1": rng.normal(size=n),
        "noise2": rng.normal(size=n),
    })
    pdf["y"] = 4.0 * pdf.sig1 - 3.0 * pdf.sig2 + 0.05 * rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    feats = ["sig1", "sig2", "noise1", "noise2"]

    picked = recursive_feature_ranking(df, feats, "y", "Regression",
                                       engine="hist", hist_rounds=3,
                                       hist_depth=3)
    assert {"sig1", "sig2"} <= set(picked)

    g3 = SparkGBT(n_rounds=3, max_depth=3).fit(
        df.repartition(3), feats, "y").feature_importances()
    g13 = SparkGBT(n_rounds=3, max_depth=3).fit(
        df.repartition(13), feats, "y").feature_importances()
    assert np.array_equal(g3, g13), (g3, g13)
    assert g3[:2].min() > g3[2:].max()


def test_spark_gbt_classification_and_nulls(spark):
    """binary:logistic path + null-target rows dropped, null features
    binned like NumpyGBT's nan_to_num."""
    from featurewiz_spark.selection.ranker import recursive_feature_ranking

    rng = np.random.default_rng(55)
    n = 8000
    pdf = pd.DataFrame({
        "a": rng.normal(size=n),
        "b": rng.normal(size=n),
    })
    pdf["label"] = (pdf.a > 0).astype(float)
    pdf.loc[rng.choice(n, 50, replace=False), "label"] = np.nan
    pdf.loc[rng.choice(n, 50, replace=False), "b"] = np.nan
    df = spark.createDataFrame(pdf)
    picked = recursive_feature_ranking(
        df, ["a", "b"], "label", "Classification", engine="hist",
        hist_rounds=3, hist_depth=3)
    assert picked[0] == "a"


def test_spark_gbt_large_magnitude_target(spark):
    """Regression for the int64 histogram overflow budget: a 1e7-scale
    target must (a) still learn (importances rank signal first) and
    (b) stay partition-invariant — the internal standardization derives
    its affine transform from the deterministic edge sample, not from
    float aggregates."""
    from featurewiz_spark.selection.dist_gbt import SparkGBT

    rng = np.random.default_rng(66)
    n = 5000
    pdf = pd.DataFrame({
        "a": rng.normal(size=n),
        "b": rng.normal(size=n),
    })
    pdf["y"] = 1e7 * pdf.a + 1e5 * rng.normal(size=n)
    df = spark.createDataFrame(pdf)
    g5 = SparkGBT(n_rounds=2, max_depth=2).fit(
        df.repartition(5), ["a", "b"], "y").feature_importances()
    g11 = SparkGBT(n_rounds=2, max_depth=2).fit(
        df.repartition(11), ["a", "b"], "y").feature_importances()
    assert np.array_equal(g5, g11)
    assert g5[0] > g5[1]


# ------------------------------------------------------------------
# Kendall τ-b (r5): Knight O(n log n) vs the O(n²) definition
# ------------------------------------------------------------------


def _brute_tau_b(x, y):
    """τ-b straight from the definition: all-pairs concordance counts
    with tie-adjusted denominator. (No scipy in this env; pandas
    corr(method='kendall') delegates to scipy — this brute force IS
    the independent ground truth, correct by construction.)"""
    import math

    n = len(x)
    C = D = n1 = n2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = int(x[i] > x[j]) - int(x[i] < x[j])
            dy = int(y[i] > y[j]) - int(y[i] < y[j])
            if dx == 0:
                n1 += 1
            if dy == 0:
                n2 += 1
            if dx != 0 and dy != 0:
                if dx == dy:
                    C += 1
                else:
                    D += 1
    n0 = n * (n - 1) // 2
    den = float(n0 - n1) * float(n0 - n2)
    if den <= 0:
        return float("nan")
    return (C - D) / math.sqrt(den)


@pytest.mark.parametrize("seed", [0, 7, 42])
def test_kendall_tau_b_matches_bruteforce(seed):
    from featurewiz_spark.selection.sulov import _kendall_tau_b

    rng = np.random.default_rng(seed)
    n = 300
    cases = [
        (rng.normal(size=n), rng.normal(size=n)),            # continuous
        (rng.integers(0, 5, n).astype(float),
         rng.integers(0, 4, n).astype(float)),               # heavy ties
        (np.round(rng.normal(size=n), 1),
         np.round(rng.normal(size=n), 1)),                   # mixed ties
    ]
    x, y = cases[0]
    cases.append((x, 2.0 * x + rng.normal(scale=0.5, size=n)))  # correlated
    for x, y in cases:
        got = _kendall_tau_b(np.asarray(x), np.asarray(y))
        exp = _brute_tau_b(list(x), list(y))
        assert got == pytest.approx(exp, abs=1e-12)


def test_kendall_constant_column_nan():
    from featurewiz_spark.selection.sulov import _kendall_tau_b

    x = np.ones(50)
    y = np.arange(50, dtype=float)
    assert np.isnan(_kendall_tau_b(x, y))


def test_kendall_monotone_nonlinear_is_one():
    """τ is rank-based: a strictly monotone nonlinear map keeps τ=1
    while Pearson drops below 1 — the reason the reference offers it."""
    from featurewiz_spark.selection.sulov import _kendall_tau_b

    rng = np.random.default_rng(3)
    x = rng.normal(size=400)
    y = np.exp(3.0 * x)
    assert _kendall_tau_b(x, y) == pytest.approx(1.0)
    assert abs(np.corrcoef(x, y)[0, 1]) < 0.9


def test_kendall_matrix_sampled_matches_bruteforce(spark, corr_pdf):
    from featurewiz_spark.selection.sulov import kendall_matrix_sampled

    df = spark.createDataFrame(corr_pdf)
    cols = ["x1", "x2", "x3", "noise"]
    got = kendall_matrix_sampled(df, cols, sample_rows=5000)  # > n: full frame
    sub = corr_pdf[cols].head(2000)
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            exp = abs(_brute_tau_b(list(sub[a]), list(sub[b])))
            assert got.loc[a, b] == pytest.approx(exp, abs=1e-12)
    assert np.allclose(np.diag(got.to_numpy()), 1.0)


def test_kendall_binned_close_to_exact(spark, corr_pdf):
    """Binned distributed τ-b: equal-frequency 64-bin contingency tables
    only err by pairs collapsing INTO a bin (O(1/B)) — must track exact
    τ within a few hundredths on continuous data."""
    from featurewiz_spark.selection.sulov import (
        kendall_matrix_binned,
        kendall_matrix_sampled,
    )

    df = spark.createDataFrame(corr_pdf)
    cols = ["x1", "x2", "x3", "x4"]
    exact = kendall_matrix_sampled(df, cols, sample_rows=5000)
    binned = kendall_matrix_binned(df, cols, n_bins=64)
    assert np.abs(exact.to_numpy() - binned.to_numpy()).max() < 0.03


def test_kendall_binned_partition_stable(spark, corr_pdf):
    """The contingency accumulation is exact integer math, but the
    approxQuantile edge pass (Greenwald-Khanna) may merge summaries in
    a partition-dependent order — so the cross-partitioning guarantee
    is edge-jitter-bounded (O(rel_err)), not bitwise."""
    from featurewiz_spark.selection.sulov import kendall_matrix_binned

    df = spark.createDataFrame(corr_pdf)
    cols = ["x1", "x3", "noise"]
    a = kendall_matrix_binned(df.repartition(3), cols)
    b = kendall_matrix_binned(df.repartition(13), cols)
    assert np.abs(a.to_numpy() - b.to_numpy()).max() < 0.02


def test_sulov_accepts_kendall_and_type_lists(spark, corr_pdf):
    """SULOV with method='kendall' knocks out the duplicate features;
    a correlation_types LIST (reference sulov_method.py:107-136) keeps
    a pair whenever ANY matrix crosses the limit — the pearson-weak but
    kendall-strong duplicate must fall only when kendall is included."""
    from featurewiz_spark.selection.sulov import sulov_select

    pdf = corr_pdf.copy()
    # monotone-nonlinear duplicate of x1: kendall |τ|=1, pearson weaker
    pdf["x1_mono"] = np.exp(3.0 * pdf["x1"])
    df = spark.createDataFrame(pdf)
    cols = ["x1", "x2", "x3", "x4", "x1_mono", "noise"]

    kend = sulov_select(df, cols, "y", corr_limit=0.9, method="kendall")
    assert "x1" in kend and "x1_mono" not in kend

    pear = sulov_select(df, cols, "y", corr_limit=0.9, method="pearson")
    assert "x1_mono" in pear  # pearson alone misses the monotone dup

    both = sulov_select(
        df, cols, "y", corr_limit=0.9, method=["pearson", "kendall"]
    )
    assert "x1_mono" not in both
    assert set(both) <= set(pear)
