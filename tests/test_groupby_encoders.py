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


def test_woe_encode_vs_pandas(spark, mixed_pdf):
    """WOE (category_encoders regularized form): ln of regularized odds
    ratio per category (SURVEY.md §2.10 E5 / settings.py:24-31)."""
    from featurewiz_spark.operators.encoders import woe_encode

    pdf = mixed_pdf.assign(yb=(mixed_pdf["y"] > 100).astype(float))
    df = spark.createDataFrame(pdf)
    out, _ = woe_encode(df, "cat", "yb", regularization=1.0)
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    pos, neg = pdf["yb"].sum(), (1 - pdf["yb"]).sum()
    g = pdf.groupby("cat")["yb"]
    woe = np.log(((g.sum() + 1.0) / (pos + 2.0)) / ((g.count() - g.sum() + 1.0) / (neg + 2.0)))
    exp = pdf["cat"].map(woe)
    assert np.allclose(got["cat_woe"], exp.sort_index())


def test_james_stein_groupby_shrinks_toward_global(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import james_stein_groupby

    df = spark.createDataFrame(mixed_pdf)
    out, _ = james_stein_groupby(df, ["cat"], ["num"], k=10.0)
    got = out.toPandas().sort_values("id").reset_index(drop=True)
    gm = mixed_pdf["num"].mean()
    g = mixed_pdf.groupby("cat")["num"]
    enc = (g.count() * g.mean() + 10.0 * gm) / (g.count() + 10.0)
    exp = mixed_pdf["cat"].map(enc)
    assert np.allclose(got["GroupEncoded_cat_num"], exp.sort_index())
    # shrinkage: rare category 'd' pulled harder toward the global mean
    raw_d = abs(g.mean()["d"] - gm)
    enc_d = abs(enc["d"] - gm)
    assert enc_d < raw_d + 1e-12


def test_contrast_matrices_properties():
    """Contrast codings: columns sum to zero over levels (all kinds);
    polynomial columns are orthonormal."""
    from featurewiz_spark.operators.encoders import _contrast_matrix

    for kind in ("sum", "helmert", "backward_difference", "polynomial"):
        m = np.array(_contrast_matrix(kind, 5))
        assert m.shape == (5, 4)
        assert np.allclose(m.sum(axis=0), 0, atol=1e-9), kind
    p = np.array(_contrast_matrix("polynomial", 5))
    assert np.allclose(p.T @ p, np.eye(4), atol=1e-9)


def test_contrast_encode_helmert_values(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import contrast_encode

    df = spark.createDataFrame(mixed_pdf)
    out, cats = contrast_encode(df, "cat", kind="helmert")
    assert cats == ["a", "b", "c", "d"]
    row_b = out.filter(F.col("cat") == "b").select("cat_helmert_0", "cat_helmert_1").first()
    assert row_b[0] == 1.0 and row_b[1] == -1.0


def test_basen_encode_digits(spark, mixed_pdf):
    from featurewiz_spark.operators.encoders import basen_encode

    df = spark.createDataFrame(mixed_pdf)
    out, cats = basen_encode(df, "cat", base=2)
    # 4 cats → codes 1..4 → 3 digits; 'c' = code 3 = 011
    row_c = out.filter(F.col("cat") == "c").select(
        "cat_base2_0", "cat_base2_1", "cat_base2_2"
    ).first()
    assert (row_c[0], row_c[1], row_c[2]) == (0, 1, 1)


def test_split_n_ways_sequential_and_stratified(spark, mixed_pdf):
    from featurewiz_spark.operators.sampling import split_n_ways

    pdf = mixed_pdf.assign(ts=np.arange(len(mixed_pdf)))
    df = spark.createDataFrame(pdf)
    a, b, c = split_n_ways(df, [0.6, 0.2, 0.2], how="sequential", time_col="ts")
    na, nb, nc = a.count(), b.count(), c.count()
    assert na + nb + nc == len(pdf)
    assert abs(na - 0.6 * len(pdf)) <= 2
    # sequential: max ts of slice a < min ts of slice b
    assert a.agg(F.max("ts")).first()[0] < b.agg(F.min("ts")).first()[0]

    s1, s2 = split_n_ways(df, [0.8, 0.2], how="stratified", stratify_col="cat")
    assert s1.count() + s2.count() == len(pdf)
    # every class keeps ~80/20 (exact per-class percent_rank slicing)
    frac = (
        s1.groupBy("cat").count().toPandas().set_index("cat")["count"]
        / pdf.groupby("cat").size()
    )
    assert ((frac - 0.8).abs() < 0.05).all()


def test_stratified_sample_drops_tiny_classes(spark):
    from featurewiz_spark.operators.sampling import stratified_sample

    pdf = pd.DataFrame(
        {"cls": ["a"] * 500 + ["b"] * 500 + ["tiny"] * 2, "v": range(1002)}
    )
    df = spark.createDataFrame(pdf)
    samp = stratified_sample(df, "cls", n_rows=200, seed=42)
    got = samp.groupBy("cls").count().toPandas().set_index("cls")["count"]
    assert "tiny" not in got.index
    assert 100 < got.sum() < 320  # ~200 in expectation


def test_uniform_and_kmeans_bins(spark):
    from featurewiz_spark.operators.binning import (
        apply_bin_edges,
        kmeans_bin_edges,
        uniform_bin,
    )

    rng = np.random.default_rng(7)
    # three well-separated clusters → kmeans edges fall in the gaps
    x = np.concatenate([rng.normal(0, 0.3, 300), rng.normal(5, 0.3, 300),
                        rng.normal(10, 0.3, 300)])
    df = spark.createDataFrame(pd.DataFrame({"x": x, "i": range(len(x))}))
    out, edges = uniform_bin(df, "x", bins=4)
    assert len(edges) == 3
    w = (x.max() - x.min()) / 4
    assert np.allclose(edges, [x.min() + w, x.min() + 2 * w, x.min() + 3 * w])

    kedges = kmeans_bin_edges(df, "x", bins=3)
    assert len(kedges) == 2
    assert 1.0 < kedges[0] < 4.0 and 6.0 < kedges[1] < 9.0
    binned = apply_bin_edges(df, "x", kedges, "kb")
    counts = binned.groupBy("kb").count().toPandas().set_index("kb")["count"]
    assert (counts == 300).all()


def test_encoders_survive_user_column_named_value(spark):
    """Regression: fitted tables key on a temp column called 'value'; a
    user table with a LITERAL `value` column must keep it through every
    encoder join (caught by driver query q60 on the events table)."""
    from featurewiz_spark.operators.encoders import (
        frequency_encode,
        label_encode,
        rare_class_combine,
        target_encode,
    )

    df = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "a", 30.0)],
        "id long, cat string, value double",
    )
    for out in (
        label_encode(df, "cat", order_col="id")[0],
        frequency_encode(df, "cat")[0],
        rare_class_combine(df, "cat", threshold=0.0)[0],
        target_encode(df, "cat", "value")[0],
    ):
        assert "value" in out.columns
        got = {r["id"]: r["value"] for r in out.select("id", "value").collect()}
        assert got == {1: 10.0, 2: 20.0, 3: 30.0}


def test_gmm_bin_recovers_separated_clusters(spark):
    """B1 strategy='gaussian': three well-separated 1-D gaussians must
    map to three distinct bins aligned with the true clusters, labels
    ordered by ascending mean."""
    import numpy as np

    from featurewiz_spark.operators.binning import apply_gmm_bins, gmm_bin_params

    rng = np.random.default_rng(5)
    x = np.concatenate(
        [rng.normal(0, 0.5, 400), rng.normal(10, 0.5, 300), rng.normal(25, 1.0, 300)]
    )
    truth = np.repeat([0, 1, 2], [400, 300, 300])
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(x)], "id long, x double"
    )
    params = gmm_bin_params(df, "x", bins=3)
    mus = [m for _, m, _ in params]
    assert abs(mus[0] - 0) < 0.5 and abs(mus[1] - 10) < 0.5 and abs(mus[2] - 25) < 1.0
    out = apply_gmm_bins(df, "x", params, "xb").toPandas().sort_values("id")
    assert (out["xb"].to_numpy() == truth).mean() > 0.995


def test_glmm_encode_matches_numpy_mom(spark):
    """GLMM (random-intercept, gaussian) encoding must equal the
    method-of-moments posterior mean computed directly in numpy."""
    import numpy as np

    from featurewiz_spark.operators.encoders import glmm_encode

    rng = np.random.default_rng(9)
    cats = np.repeat(["a", "b", "c", "d"], [50, 30, 15, 5])
    effects = {"a": 0.0, "b": 2.0, "c": -1.0, "d": 5.0}
    y = np.array([effects[c] for c in cats]) + rng.normal(0, 1.0, len(cats))
    df = spark.createDataFrame(
        [(str(c), float(v)) for c, v in zip(cats, y)], "cat string, y double"
    )
    out, _ = glmm_encode(df, "cat", "y")
    got = {r["cat"]: r["cat_glmm"] for r in out.select("cat", "cat_glmm").distinct().collect()}

    gm = y.mean()
    ns = {c: (cats == c).sum() for c in effects}
    ms = {c: y[cats == c].mean() for c in effects}
    vs = {c: y[cats == c].var(ddof=1) for c in effects}
    n_tot, C = len(y), len(effects)
    sigma2 = sum((ns[c] - 1) * vs[c] for c in effects) / (n_tot - C)
    ssb = sum(ns[c] * (ms[c] - gm) ** 2 for c in effects)
    denom = n_tot - sum(n * n for n in ns.values()) / n_tot
    tau2 = max(0.0, (ssb - (C - 1) * sigma2) / denom)
    for c in effects:
        want = gm + (ms[c] - gm) * ns[c] * tau2 / (ns[c] * tau2 + sigma2)
        assert abs(got[c] - want) < 1e-9
    # rare category 'd' shrinks toward gm harder than common 'b' (relative)
    wd = ns["d"] * tau2 / (ns["d"] * tau2 + sigma2)
    wb = ns["b"] * tau2 / (ns["b"] * tau2 + sigma2)
    assert wd < wb


def test_groupby_percentile_mode_approx_close_to_exact(spark):
    """percentile_mode='approx' (the codegen-preserving 100TB path) must
    track the exact median within percentile_approx's error bound."""
    import numpy as np

    from featurewiz_spark.operators.groupby import groupby_aggregate

    rng = np.random.default_rng(13)
    df = spark.createDataFrame(
        [(str(c), float(v)) for c, v in
         zip(rng.choice(["a", "b"], 2000), rng.normal(100, 20, 2000))],
        "cat string, x double",
    )
    exact, _ = groupby_aggregate(df, ["cat"], ["x"], aggs=["median"])
    approx, _ = groupby_aggregate(df, ["cat"], ["x"], aggs=["median"],
                                  percentile_mode="approx")
    e = {r["cat"]: r["x_by_cat_median"]
         for r in exact.select("cat", "x_by_cat_median").distinct().collect()}
    a = {r["cat"]: r["x_by_cat_median"]
         for r in approx.select("cat", "x_by_cat_median").distinct().collect()}
    for c in e:
        assert abs(e[c] - a[c]) < 1.0  # well inside the accuracy bound here
