"""Round-3 regression tests: pins for every verdict/advice item closed
this round (cache lifecycle, vectorized ANN kernel, encoder single-job
folds + guards, null-safe outlier drop, table_io write modes, NTZ/DST
guard)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


# ---------------------------------------------------------------- cache

def test_no_cached_rdds_after_release(spark, tmp_path):
    """Verdict item 4: dedup's internal persists must be releasable —
    no cached RDDs left after the LSH pipeline + curation pipeline
    complete and the caller releases."""
    from featurewiz_spark.cache import cache_scope
    from featurewiz_spark.operators.dedup import (
        jaccard_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from featurewiz_spark.plans.pipeline import documents_curation_pipeline

    def persisted_ids():
        # ids, not a bare isEmpty(): other tests in the shared session
        # may hold their own persists — this test owns only its delta
        m = spark.sparkContext._jsc.getPersistentRDDs()
        return {k for k in m.keySet().toArray()}

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": range(40),
                "text": [
                    f"the quick brown fox {i % 7} jumps over the lazy dog {i % 5}"
                    for i in range(40)
                ],
            }
        )
    )
    before = persisted_ids()
    with cache_scope():
        sigs = minhash_signatures(docs, num_hashes=16, partitions=4)
        cand = minhash_lsh_pairs(sigs, bands=4, rows_per_band=4,
                                 jaccard_threshold=0.0)
        verified = jaccard_pairs(docs, cand, shingle_k=3)
        verified.count()
        assert persisted_ids() - before
    assert persisted_ids() - before == set()

    with cache_scope():
        documents_curation_pipeline(docs).count()
    assert persisted_ids() - before == set()


# ----------------------------------------------- vectorized ANN kernel

def test_ann_topk_lsh_matches_reference_kernel(spark):
    """Vectorized per-bucket kernel must reproduce the scalar reference
    semantics: per query, top-k by (sim desc, id asc), self excluded,
    consecutive ranks even when the bucket is smaller than k+1."""
    from featurewiz_spark.operators.similarity import ann_topk_lsh

    rng = np.random.default_rng(7)
    n, d = 60, 8
    vecs = rng.standard_normal((n, d))
    pdf = pd.DataFrame({"vec_id": np.arange(n, dtype="int64"),
                        "embedding": list(vecs)})
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": pdf["vec_id"],
                      "embedding": [list(map(float, v)) for v in vecs]})
    )
    got = (
        ann_topk_lsh(df, k=3, n_planes=3, seed=11)
        .toPandas()
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )

    # scalar oracle: same planes, same buckets, per-row full sort
    planes = np.random.default_rng(11).standard_normal((3, d))
    bits = (vecs @ planes.T) > 0
    buckets = (bits * (1 << np.arange(3))).sum(axis=1)
    rows = []
    norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    for b in np.unique(buckets):
        idx = np.where(buckets == b)[0]
        if len(idx) < 2:
            continue
        sims = norm[idx] @ norm[idx].T
        ids = idx.astype("int64")
        for i in range(len(idx)):
            order = sorted(
                (j for j in range(len(idx)) if j != i),
                key=lambda j: (-sims[i, j], ids[j]),
            )
            for r, j in enumerate(order[:3], start=1):
                rows.append((ids[i], ids[j], r, sims[i, j]))
    exp = (
        pd.DataFrame(rows, columns=["vec_id", "nn_id", "rank", "cos_sim"])
        .sort_values(["vec_id", "rank"])
        .reset_index(drop=True)
    )
    assert len(got) == len(exp)
    assert (got["vec_id"].values == exp["vec_id"].values).all()
    assert (got["nn_id"].values == exp["nn_id"].values).all()
    assert (got["rank"].values == exp["rank"].values).all()
    assert np.allclose(got["cos_sim"].values, exp["cos_sim"].values)


# ------------------------------------------------------------- encoders

def test_label_encode_null_sorts_last(spark):
    from featurewiz_spark.operators.encoders import label_encode

    df = spark.createDataFrame(
        [(1, "b"), (2, None), (3, "a"), (4, "b"), (5, None)],
        "rid int, v string",
    )
    for order_col in ("rid", None):
        _, mapping = label_encode(df, "v", order_col=order_col)
        m = mapping.toPandas().sort_values("code")
        # null must take the LAST code regardless of hash/first-seen order
        assert m.iloc[-1]["value"] is None or pd.isna(m.iloc[-1]["value"])
        assert m.iloc[-1]["code"] == 2

    # first-appearance order preserved for non-null values
    _, mapping = label_encode(df, "v", order_col="rid")
    codes = {r["value"]: r["code"] for r in mapping.collect()}
    assert codes["b"] == 0 and codes["a"] == 1


def test_label_encode_cardinality_guard(spark):
    from featurewiz_spark.operators.encoders import label_encode

    df = spark.range(0, 5000).withColumn("idlike", F.col("id").cast("string"))
    with pytest.raises(ValueError, match="max_categories"):
        label_encode(df, "idlike", max_categories=100)
    # explicit opt-out still works
    out, _ = label_encode(df.limit(50), "idlike", max_categories=None)
    assert out.count() == 50


def test_rare_combine_single_job_same_result(spark):
    """Folded-total rare combiner must equal the two-pass math."""
    from featurewiz_spark.operators.encoders import rare_class_combine

    pdf = pd.DataFrame({"c": ["a"] * 90 + ["b"] * 9 + ["z"]})
    df = spark.createDataFrame(pdf)
    out, mapping = rare_class_combine(df, "c", threshold=0.05)
    m = {r["value"]: r["c_combined"] for r in mapping.collect()}
    assert m == {"a": "a", "b": "b", "z": "RARE"}
    assert out.filter(F.col("c_combined") == "RARE").count() == 1


# ------------------------------------------------- null-safe row drop

def test_rare_combine_builds_lazily(spark):
    """Verdict item 5 done-criterion: rare_class_combine no longer runs
    a separate df.count() job during fit — the total folds into the
    mapping's window, so CONSTRUCTION triggers zero Spark jobs."""
    from featurewiz_spark.operators.encoders import rare_class_combine

    df = spark.range(0, 1000).select((F.col("id") % 7).cast("string").alias("c"))
    st = spark.sparkContext.statusTracker()
    before = len(st.getJobIdsForGroup(None))
    _out, mapping = rare_class_combine(df, "c")
    assert len(st.getJobIdsForGroup(None)) == before  # no eager job
    assert mapping.count() == 7


def test_iqr_row_drop_keeps_null_rows(spark):
    from featurewiz_spark.operators.binning import iqr_outlier_row_drop

    pdf = pd.DataFrame(
        {
            "rid": range(12),
            "x": [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 1e9, None],
            "y": [1.0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 1e9, None],
        }
    )
    df = spark.createDataFrame(pdf)
    out, _ = iqr_outlier_row_drop(df, ["x", "y"], min_outlier_cols=2)
    kept = {r["rid"] for r in out.select("rid").collect()}
    assert 11 in kept          # all-null row is NOT an outlier row
    assert 10 not in kept      # the 1e9 row outlies in both cols


def test_iqr_row_drop_quoted_identifiers(spark):
    from featurewiz_spark.operators.binning import iqr_outlier_row_drop

    df = spark.createDataFrame(
        pd.DataFrame({"weird col": [1.0, 2, 3, 4, 100.0]})
    )
    out, fences = iqr_outlier_row_drop(df, ["weird col"], min_outlier_cols=1)
    assert out.count() == 4
    assert "weird col" in fences["fences"]


# ------------------------------------------------------------ table_io

def test_write_table_parquet_append(spark, tmp_path):
    from featurewiz_spark.sources.table_io import read_table, write_table

    loc = str(tmp_path / "t")
    df = spark.range(0, 5)
    write_table(df, loc, mode="overwrite")
    write_table(df, loc, mode="append")
    assert read_table(spark, loc).count() == 10
    with pytest.raises(ValueError, match="mode"):
        write_table(df, loc, mode="error_if_exists")


import pyspark  # noqa: E402

_ICEBERG_JARS = glob.glob(
    os.path.join(os.path.dirname(pyspark.__file__), "jars",
                 "iceberg-spark-runtime*.jar")
)


@pytest.mark.skipif(not _ICEBERG_JARS, reason="no iceberg runtime jar in env")
def test_iceberg_round_trip(spark, tmp_path):
    """Jar-gated lakehouse integration (verdict item 6): only runs when
    the environment ships an Iceberg runtime; the parquet stand-in path
    is covered unconditionally above."""
    from featurewiz_spark.sources.table_io import write_table

    write_table(spark.range(3), "local.t.ice", table_format="iceberg")


def test_iceberg_without_catalog_raises(spark):
    from featurewiz_spark.sources.table_io import write_table

    if _ICEBERG_JARS:
        pytest.skip("iceberg present; the degraded path does not apply")
    with pytest.raises(RuntimeError, match="iceberg"):
        write_table(spark.range(3), "local.t.ice", table_format="iceberg")


def test_read_any_compressed_formats_and_encoding(spark, tmp_path):
    """zip/xz have no Hadoop codec (raw archive bytes were parsed as CSV
    mojibake) and the encoding probe must see DECOMPRESSED bytes
    (review findings r3-c)."""
    import gzip
    import lzma
    import zipfile

    from featurewiz_spark.sources.readers import read_any

    csv = "name,val\ncafé,1\nnaïve,2\n".encode("utf-8")
    gz = tmp_path / "d.csv.gz"
    gz.write_bytes(gzip.compress(csv))
    z = tmp_path / "d.csv.zip"
    with zipfile.ZipFile(z, "w") as f:
        f.writestr("d.csv", csv)
    xz = tmp_path / "d.csv.xz"
    xz.write_bytes(lzma.compress(csv))
    for p in (gz, z, xz):
        got = {r["name"] for r in read_any(spark, str(p)).collect()}
        assert got == {"café", "naïve"}, p


def test_sanitize_collision_chain(spark):
    from featurewiz_spark.functions.strings import sanitize_column_names

    df = spark.createDataFrame([(1, 2, 3)], ["a b", "a*b", "a_b_1"])
    out = sanitize_column_names(df)
    assert len(set(out.columns)) == 3  # no duplicate generated names


def test_quality_features_unicode_and_density(spark):
    """CJK text is not 'punctuation' (Unicode \\p classes, not ASCII
    \\w) and the stopword ratio measures OCCURRENCE density, not
    distinct types capped at 10 (review findings r3-c)."""
    from featurewiz_spark.text.stats import add_quality_features

    long_en = ("the cat sat on the mat and then the dog ran " * 50).strip()
    df = spark.createDataFrame(
        [(1, "你好 世界 这是 中文 文本 测试"), (2, long_en)],
        "doc_id long, text string",
    )
    q = {r["doc_id"]: r for r in add_quality_features(df).collect()}
    assert q[1]["q_punct_ratio"] < 0.05     # CJK chars are letters
    assert q[2]["q_stopword_ratio"] > 0.25  # density, not capped types


def test_langid_tie_prefers_en(spark):
    # r4: add_language_id now delegates to the trigram model; the
    # stopword tie discipline this test pins lives on the legacy name.
    from featurewiz_spark.text.stats import add_language_id_stopword

    df = spark.createDataFrame([(1, "is es")], "doc_id long, text string")
    assert add_language_id_stopword(df).collect()[0]["lang_pred"] == "en"


def test_classify_text_column_is_nlp_not_id(spark):
    """Free text is ~all-distinct: the NLP rule must fire BEFORE the id
    rule (reference order) or every text column becomes id_vars."""
    from featurewiz_spark.profiling import classify_columns

    rows = [(i, f"this is a fairly long unique document number {i} "
                f"with enough characters to clear the nlp threshold")
            for i in range(150)]
    df = spark.createDataFrame(rows, "rid long, body string")
    tx = classify_columns(df)
    assert "body" in tx.nlp_vars and "body" not in tx.id_vars


def test_facade_string_target(spark):
    """A string-labeled dataset must survive the full pipeline (the
    ranking stage crashed on to_numpy(float) before; reference
    label-encodes non-numeric targets, featurewiz.py:886-918)."""
    from featurewiz_spark.plans.facade import FeatureWizSpark

    rng = np.random.default_rng(4)
    pdf = pd.DataFrame(
        {
            "x1": rng.standard_normal(150),
            "x2": rng.standard_normal(150),
            "species": [["setosa", "versicolor", "virginica"][i % 3]
                        for i in range(150)],
        }
    )
    fw = FeatureWizSpark(corr_limit=0.9, feature_engg=[])
    out = fw.fit_transform(spark.createDataFrame(pdf), "species")
    assert fw.problem_type == "Multi_Classification"
    assert fw.features  # selection completed without crashing
    assert fw._target_maps["species"]["setosa"] == 0


def test_apply_label_encoding_null_no_duplication(spark):
    """NULL is a SEEN value when the mapping holds a NULL row: the
    null-unsafe anti-join re-added it as unseen and the eqNullSafe
    application join then matched BOTH rows, duplicating every NULL
    input row (review finding r3-b)."""
    from featurewiz_spark.operators.encoders import (
        apply_label_encoding,
        label_encode,
    )

    train = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "rid int, v string"
    )
    _, mapping = label_encode(train, "v", order_col="rid")
    test = spark.createDataFrame(
        [(10, None), (11, "a"), (12, "zz")], "rid int, v string"
    )
    out = apply_label_encoding(test, "v", mapping)
    assert out.count() == 3  # no duplication
    codes = {r["rid"]: r["v_code"] for r in out.collect()}
    null_code = {r["value"]: r["code"] for r in mapping.collect()}[None]
    assert codes[10] == null_code     # null is SEEN → fitted code
    assert codes[12] == 3             # unseen → max_code + 1


def test_split_n_ways_no_row_lost(spark):
    """Float bound accumulation must not orphan the percent_rank==1.0
    row (review finding r3-b)."""
    from featurewiz_spark.operators.sampling import split_n_ways

    df = spark.createDataFrame([(i, i) for i in range(9)], "id int, ts int")
    parts = split_n_ways(df, [1, 1, 1], how="sequential", time_col="ts")
    sizes = [p.count() for p in parts]
    assert sum(sizes) == 9 and sizes == [3, 3, 3]
    assert parts[-1].filter("id = 8").count() == 1  # the pr==1.0 row


def test_stratified_sample_keeps_null_stratum(spark):
    from featurewiz_spark.operators.sampling import stratified_sample

    rows = [(i, "a" if i % 2 else None) for i in range(400)]
    df = spark.createDataFrame(rows, "rid int, s string")
    out = stratified_sample(df, "s", 100, method="hash", hash_col="rid")
    got = out.groupBy("s").count().collect()
    by = {r["s"]: r["count"] for r in got}
    assert by.get(None, 0) == 50 and by["a"] == 50  # both strata sampled


def test_ordered_te_same_ts_rows_do_not_leak(spark):
    """Rows sharing a timestamp must not see each other's targets
    (range frame, strictly earlier — review finding r3-b)."""
    from featurewiz_spark.operators.encoders import ordered_target_encode

    df = spark.createDataFrame(
        [("c", 1, 10.0), ("c", 1, 90.0), ("c", 2, 50.0)],
        "cat string, ts int, y double",
    )
    out = ordered_target_encode(df, "cat", "y", "ts", prior=0.0,
                                prior_weight=1.0)
    rows = sorted(out.collect(), key=lambda r: (r["ts"], r["y"]))
    # both ts=1 rows see NO prior rows → encoding = prior = 0.0
    assert rows[0]["cat_ordered_te"] == 0.0
    assert rows[1]["cat_ordered_te"] == 0.0
    # ts=2 row sees both ts=1 rows: (10+90+0)/(2+1)
    assert abs(rows[2]["cat_ordered_te"] - 100.0 / 3) < 1e-12


def test_one_hot_null_rows_and_name_collisions(spark):
    from featurewiz_spark.operators.encoders import one_hot_encode

    df = spark.createDataFrame(
        [(1, "a b"), (2, "a_b"), (3, None)], "rid int, v string"
    )
    out, cats = one_hot_encode(df, "v")
    ind_cols = [c for c in out.columns if c.startswith("v_is_")]
    assert len(ind_cols) == 2  # 'a b' and 'a_b' keep distinct columns
    null_row = out.filter("rid = 3").collect()[0]
    assert all(null_row[c] == 0 for c in ind_cols)  # 0, not NULL


def test_kmeans_gmm_bins_tolerate_nulls(spark):
    from featurewiz_spark.operators.binning import (
        gmm_bin_params,
        kmeans_bin_edges,
    )

    pdf = pd.DataFrame({"x": [1.0, 2, 3, 4, 5, 6, 7, 8, None]})
    df = spark.createDataFrame(pdf)
    assert len(kmeans_bin_edges(df, "x", bins=3)) == 2
    assert len(gmm_bin_params(df, "x", bins=2)) == 2


def test_contrast_all_null_raises_cleanly(spark):
    from featurewiz_spark.operators.encoders import basen_encode, contrast_encode

    df = spark.createDataFrame([(1, None), (2, None)], "rid int, v string")
    with pytest.raises(ValueError, match="non-null"):
        contrast_encode(df, "v")
    with pytest.raises(ValueError, match="non-null"):
        basen_encode(df, "v")


def test_facade_unseen_category_fills_not_null(spark):
    """Transform-time unseen categories must encode to the fitted grand
    mean, not NULL (review finding r3-b)."""
    from featurewiz_spark.plans.facade import FeatureWizSpark

    rng = np.random.default_rng(9)
    pdf = pd.DataFrame(
        {
            "cat": ["a", "b", "c", "d"] * 50,
            "x": rng.standard_normal(200),
            "y": rng.standard_normal(200),
        }
    )
    train = spark.createDataFrame(pdf)
    fw = FeatureWizSpark(corr_limit=0.9, feature_engg=[],
                         category_encoders=["target"])
    fw.fit_transform(train, "y")
    test = spark.createDataFrame(
        pd.DataFrame({"cat": ["zzz_unseen"] * 5, "x": rng.standard_normal(5),
                      "y": rng.standard_normal(5)})
    )
    out = fw.transform(test)
    enc_cols = [c for c in out.columns if "target_enc" in c]
    if enc_cols:  # column survives selection on this tiny fixture
        assert out.filter(F.col(enc_cols[0]).isNull()).count() == 0


def test_correlation_large_mean_stability(spark):
    """cov = E[x²] − E[x]² cancels catastrophically for mean ≫ std
    (epoch-seconds columns); the conditioning shift must keep exact
    correlations (review finding r3)."""
    from featurewiz_spark.selection.sulov import correlation_matrix

    rng = np.random.default_rng(5)
    base = 1.7e9 + rng.standard_normal(4000)  # mean 1.7e9, std 1
    pdf = pd.DataFrame(
        {"a": base, "b": base * 2.0 + 10.0, "c": rng.standard_normal(4000)}
    )
    cm = correlation_matrix(spark.createDataFrame(pdf), ["a", "b", "c"])
    assert abs(cm.loc["a", "b"] - 1.0) < 1e-9   # perfectly correlated
    assert cm.loc["a", "c"] < 0.2               # independent


def test_trend_seasonality_zero_denominator_yields_null(spark):
    """A zero per-ts sum used to THROW DIVIDE_BY_ZERO under ANSI mode
    (review finding r3); it must yield NULL now."""
    from featurewiz_spark.operators.groupby import trend_seasonality

    df = spark.createDataFrame(
        [("x", 1, 0.0), ("y", 1, 0.0), ("x", 2, 3.0), ("y", 2, 1.0)],
        "cat string, ts int, v double",
    )
    rows = {(r["cat"], r["ts"]): r for r in
            trend_seasonality(df, "cat", "ts", "v").collect()}
    assert rows[("x", 1)]["trend"] is None        # 0/0 → NULL, no crash
    assert abs(rows[("x", 2)]["trend"] - 0.75) < 1e-12


def test_ranking_average_shares_ties_despite_tie_break(spark):
    """pandas rank(method='average') gives tied values the SAME rank;
    tie_break must not resolve ties for shared-tie methods (review
    finding r3)."""
    from featurewiz_spark.operators.groupby import ranking_aggregate

    df = spark.createDataFrame(
        [(1, 5.0, 10), (1, 5.0, 11), (1, 7.0, 12)], "k int, v double, rid int"
    )
    got = {r["rid"]: r["r"] for r in ranking_aggregate(
        df, ["k"], "v", method="average", out_col="r", tie_break=["rid"]
    ).collect()}
    assert got[10] == 1.5 and got[11] == 1.5 and got[12] == 3.0


def test_groupby_null_category_matches_fitted_row(spark):
    """pandas merge matches NaN keys; the merge-back and the test-side
    replay must treat a NULL category as a SEEN key (review finding
    r3)."""
    from featurewiz_spark.operators.groupby import (
        apply_fitted_aggregates,
        groupby_aggregate,
    )

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), (None, 10.0), (None, 20.0)],
        "c string, v double",
    )
    out, fitted = groupby_aggregate(df, ["c"], ["v"], aggs=["mean"])
    vals = {r["c"]: r["v_by_c_mean"] for r in out.collect()}
    assert vals[None] == 15.0 and vals["a"] == 2.0
    replay = apply_fitted_aggregates(df, fitted, fill=0.0)
    rvals = {r["c"]: r["v_by_c_mean"] for r in replay.collect()}
    assert rvals[None] == 15.0  # fit and transform encode identically


def test_asof_null_right_value_stays_null(spark):
    """A matched right row whose value is NULL must yield NULL (pandas
    merge_asof semantics) — per-column last(ignorenulls) used to
    substitute an OLDER row's value and report it within the newer
    row's tolerance. The bucketed variant's carry must also not
    override a null-valued in-bucket match (review findings r3)."""
    from featurewiz_spark.operators.asof import asof_join, bucketed_asof_join

    left = spark.createDataFrame(
        [("A", "2024-01-10 00:00:00")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("A", "2023-11-01 00:00:00", 5.0), ("A", "2024-01-10 00:00:00", None)],
        "k string, rts string, score double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))

    got = asof_join(left, right, "k", "ts", "rts", tolerance="2 days").collect()[0]
    assert got["score_asof"] is None          # matched row's value IS null
    assert got["rts_asof"] is not None        # ...and it DID match (ts kept)

    got2 = bucketed_asof_join(
        left, right, "k", "ts", "rts", tolerance="2 days", bucket="30 days"
    ).collect()[0]
    assert got2["score_asof"] is None         # carry must not resurrect 5.0


def test_asof_left_column_collision_safe(spark):
    """A right value column named like a left column must not clobber
    the left data; an output-name clash must raise."""
    from featurewiz_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [("A", "2024-01-10 00:00:00", 99.0)], "k string, ts string, score double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("A", "2024-01-01 00:00:00", 5.0)], "k string, rts string, score double"
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    got = asof_join(left, right, "k", "ts", "rts").collect()[0]
    assert got["score"] == 99.0 and got["score_asof"] == 5.0

    with pytest.raises(ValueError, match="score_asof"):
        asof_join(left.withColumn("score_asof", F.lit(0.0)), right, "k", "ts", "rts")


def test_asof_duplicate_ts_tie_deterministic_and_variant_equal(spark):
    """Duplicate right rows at the same (key, ts): the window variant
    resolved ties by physical row order while the bucketed carry used
    max(struct) — 1M-row probe caught them disagreeing. Both must pick
    the greatest value struct, deterministically (BENCH/SKEW.md r3)."""
    from featurewiz_spark.operators.asof import asof_join, bucketed_asof_join

    left = spark.createDataFrame(
        [("A", "2024-01-10 00:00:00")], "k string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    right = spark.createDataFrame(
        [("A", "2024-01-05 00:00:00", 1.0),
         ("A", "2024-01-05 00:00:00", 9.0),
         ("A", "2024-01-05 00:00:00", 4.0)],
        "k string, rts string, v double",
    ).withColumn("rts", F.col("rts").cast("timestamp"))
    for reps in (1, 4):  # repartition to shake physical order
        r = right.repartition(reps)
        a = asof_join(left, r, "k", "ts", "rts").collect()[0]
        b = bucketed_asof_join(left, r, "k", "ts", "rts",
                               bucket="30 days").collect()[0]
        assert a["v_asof"] == 9.0 == b["v_asof"]


def test_minhash_short_docs_do_not_crash(spark):
    """Docs with fewer than shingle_k tokens must hash, not abort:
    element_at past the token array THROWS under Spark 4 ANSI mode —
    F.get returns NULL and xxhash64 skips it (review finding r3)."""
    from featurewiz_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(0, "only two"), (1, "single"), (2, ""), (3, "a full three tokens here")],
        "doc_id long, text string",
    )
    sigs = {r["doc_id"]: r["minhash"]
            for r in minhash_signatures(df, num_hashes=8, partitions=2).collect()}
    assert len(sigs) == 4 and all(len(v) == 8 for v in sigs.values())
    # determinism: same short text → same signature
    sigs2 = {r["doc_id"]: r["minhash"]
             for r in minhash_signatures(df, num_hashes=8, partitions=2).collect()}
    assert sigs == sigs2


def test_ntz_guard_accepts_fixed_offset_ids(spark):
    """Raw fixed-offset zone ids are DST-free but zoneinfo-unparseable —
    the guard must accept them (review finding r3)."""
    from featurewiz_spark.operators.windows import sessionize

    df = spark.createDataFrame(
        pd.DataFrame({"u": [1], "ts": pd.to_datetime(["2024-01-01"])})
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        for tz in ("+05:30", "UTC+05:30", "GMT+8"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            sessionize(df, "u", "ts").count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_brute_force_topk_filters_dup_id_infs(spark):
    """Duplicate corpus ids mask >1 column; the masked -inf rows must be
    dropped like every other kernel caller does (review finding r3)."""
    from featurewiz_spark.operators.similarity import brute_force_topk

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [0.9, 0.1]), (1, [0.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    rows = brute_force_topk(df, k=2).collect()
    assert all(np.isfinite(r["cos_sim"]) for r in rows)
    # id 0 appears twice in the corpus: each id-0 query row has only ONE
    # real candidate (id 1), so no rank-2 -inf row may leak
    assert all(r["rank"] == 1 for r in rows if r["vec_id"] == 0)


# ----------------------------------------------------------- streaming

def test_stream_sessionize_availablenow_matches_batch(spark, tmp_path):
    """The 3-phase availableNow protocol must emit EVERY real session —
    equal to batch gap-sessionization of the same data (this is the
    invariant that makes the streaming path oracle-checkable, q69)."""
    from featurewiz_spark.streaming.stream_features import (
        run_sessionize_availablenow,
    )

    rng = np.random.default_rng(3)
    base = pd.Timestamp("2024-03-01")
    rows = []
    for u in range(5):
        t = base
        for _ in range(40):
            t = t + pd.Timedelta(minutes=int(rng.integers(1, 90)))
            rows.append((u, t))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    src = str(tmp_path / "src")
    schema = T.StructType(
        [T.StructField("user_id", T.LongType()),
         T.StructField("ts", T.TimestampNTZType())]
    )
    spark.createDataFrame(pdf, schema=schema).write.parquet(src)

    got = run_sessionize_availablenow(
        spark, src, str(tmp_path / "work"), keys=["user_id"], ts="ts",
        gap="30 minutes", sentinel_overrides={"user_id": -1},
    ).toPandas().sort_values(["user_id", "session_start"]).reset_index(drop=True)

    # pandas oracle with session_window semantics: a new session starts
    # strictly BEYOND the gap (exactly-gap-spaced events MERGE — same
    # strict-> rule as the batch sessionize operator; verified on a
    # 2-row exactly-gap frame)
    gap = pd.Timedelta(minutes=30)
    p = pdf.sort_values(["user_id", "ts"]).reset_index(drop=True)
    prev = p.groupby("user_id")["ts"].shift(1)
    p["sid"] = (prev.isna() | (p["ts"] - prev > gap)).groupby(
        p["user_id"]
    ).cumsum()
    exp = (
        p.groupby(["user_id", "sid"])
        .agg(session_start=("ts", "min"), session_end=("ts", "max"),
             n_events=("ts", "size"))
        .reset_index()
        .drop(columns="sid")
    )
    exp["session_end"] = exp["session_end"] + gap
    exp = exp.sort_values(["user_id", "session_start"]).reset_index(drop=True)
    got2 = got[["user_id", "session_start", "session_end", "n_events"]].astype(
        {"n_events": "int64"}
    )
    pd.testing.assert_frame_equal(got2, exp.astype({"n_events": "int64"}))


# ------------------------------------------------------------ NTZ guard

def test_sessionize_ntz_requires_utc(spark):
    from featurewiz_spark.operators.windows import sessionize

    pdf = pd.DataFrame(
        {"u": [1, 1], "ts": pd.to_datetime(["2024-11-03 01:10:00",
                                            "2024-11-03 01:40:00"])}
    )
    schema = T.StructType(
        [T.StructField("u", T.LongType()),
         T.StructField("ts", T.TimestampNTZType())]
    )
    df = spark.createDataFrame(pdf, schema=schema)
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        with pytest.raises(ValueError, match="TIMESTAMP_NTZ"):
            sessionize(df, "u", "ts", gap="30 minutes")
        # DST-free fixed-offset zone: constant offset cancels in gaps
        spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
        sessionize(df, "u", "ts", gap="30 minutes").count()
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # UTC session: NTZ is fine and gap math is exact
    out = sessionize(df, "u", "ts", gap="30 minutes")
    assert out.agg(F.max("session_id")).first()[0] == 1
