"""Regression tests for the round-1 verdict's scale-defect list.

Each test pins the "Done =" criterion from VERDICT.md's next-round
items: deterministic tree-bin sampling (4), ANN bucket caps (5),
run-stable label encoding (6), split_reduce separator escaping (10),
plus the q05 sessionize hardening (microsecond gaps + tie-break) and
the TimestampNTZ classification fix.
"""

from __future__ import annotations

import datetime
import hashlib
import random

import pytest
from pyspark.sql import functions as F


def test_tree_bin_edges_sample_spans_distribution(spark):
    # 100k-row skewed frame: exponential-ish tail. A sorted-head "sample"
    # (the r1 bug) would only ever see the smallest values and place all
    # edges in the bottom sliver; the hash-ordered sample must learn
    # edges spanning the full range.
    from featurewiz_spark.operators.binning import tree_bin_edges

    rng = random.Random(7)
    rows = []
    for i in range(100_000):
        x = rng.random() ** 4 * 1000.0  # heavy mass near 0, tail to 1000
        y = 0.0 if x < 500.0 else 10.0  # step in target at x=500
        rows.append((x, y))
    df = spark.createDataFrame(rows, "x double, y double")
    edges = tree_bin_edges(df, "x", "y", max_depth=2, sample_rows=5000)
    # the dominant split is the target step at 500 — far above the range
    # the old bottom-of-distribution sample (max x ≈ (5000/1e5)^... ≪ 500
    # after sorting) could ever propose
    assert edges, "no edges learned"
    assert max(edges) > 250.0, f"edges stuck in the bottom sliver: {edges}"


def test_tree_bin_edges_deterministic_across_partitioning(spark):
    from featurewiz_spark.operators.binning import tree_bin_edges

    rng = random.Random(11)
    rows = [(rng.uniform(0, 100), rng.uniform(0, 1)) for _ in range(20_000)]
    df = spark.createDataFrame(rows, "x double, y double")
    e1 = tree_bin_edges(df.repartition(1), "x", "y", max_depth=2, sample_rows=3000)
    e32 = tree_bin_edges(df.repartition(32), "x", "y", max_depth=2, sample_rows=3000)
    assert e1 == e32


def test_ann_bucket_cap_bounds_degenerate_bucket(spark):
    # all vectors share one direction → every row lands in ONE lsh
    # bucket; with the cap the pair stage sees zero rows instead of an
    # O(n²) pandas block (and the call completes immediately).
    from featurewiz_spark.operators.similarity import (
        ann_topk_lsh,
        cosine_near_dup_pairs,
        planes_for_corpus,
    )

    n = 3000
    rows = [(i, [1.0 + i * 1e-9, 2.0, 3.0, 4.0]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = cosine_near_dup_pairs(
        df, threshold=0.99, n_planes=4, max_bucket_size=100
    )
    assert pairs.count() == 0  # the single over-cap bucket was dropped
    ann = ann_topk_lsh(df, k=1, n_planes=4, max_bucket_size=100)
    assert ann.count() == 0
    # and with the cap lifted the same fixture does produce results
    some = cosine_near_dup_pairs(
        df.limit(50), threshold=0.99, n_planes=4, max_bucket_size=None
    )
    assert some.count() > 0
    # plane sizing: average bucket ≈ target
    assert planes_for_corpus(1_000_000, 1000) == 10
    assert planes_for_corpus(10 ** 9, 1000) == 20


def test_label_encode_stable_across_partitioning(spark):
    # VERDICT item 6 Done-criterion: output invariant under
    # .repartition(k) for k in {1, 8, 32} with the DEFAULT order.
    from featurewiz_spark.operators.encoders import label_encode

    rows = [(i, f"cat_{i % 17}") for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, c string")
    outs = []
    for k in (1, 8, 32):
        out, _ = label_encode(df.repartition(k), "c")
        outs.append(sorted(map(tuple, out.select("id", "c_code").collect())))
    assert outs[0] == outs[1] == outs[2]


def test_label_encode_first_appearance_with_order_col(spark):
    from featurewiz_spark.operators.encoders import label_encode

    rows = [(0, "b"), (1, "a"), (2, "b"), (3, "c")]
    df = spark.createDataFrame(rows, "id long, c string")
    _, mapping = label_encode(df, "c", order_col="id")
    m = dict(mapping.collect())
    assert m == {"b": 0, "a": 1, "c": 2}


@pytest.mark.parametrize("sep", [".", "'", "|", ","])
def test_split_reduce_special_separators(spark, sep):
    from featurewiz_spark.functions.strings import split_reduce

    df = spark.createDataFrame(
        [(f"1{sep}2{sep}3",), (f"10{sep}20",)], "s string"
    )
    out = split_reduce(df, "s", sep, op="add", out_col="total")
    vals = sorted(r["total"] for r in out.collect())
    assert vals == [6.0, 30.0]


def test_sessionize_microsecond_gap_and_tiebreak(spark):
    # a 1800.5s gap: second-truncated comparison sees 1800 (not > 1800,
    # same session); microsecond comparison sees 1800.5s > 30min → new
    # session. Plus equal-(key, ts) rows must order by the tie-break.
    from featurewiz_spark.operators.windows import sessionize

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0, 250_000)
    t1 = t0 + datetime.timedelta(seconds=1800, microseconds=500_000)
    rows = [(1, 10, t0), (2, 10, t1), (3, 10, t1)]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    out = {
        r["event_id"]: r["session_id"]
        for r in sessionize(
            df, "user_id", "ts", "30 minutes", tie_break=["event_id"]
        ).collect()
    }
    assert out == {1: 1, 2: 2, 3: 2}


def test_classify_timestamp_ntz_is_date_var(spark):
    from featurewiz_spark.profiling import classify_columns

    df = spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1) + datetime.timedelta(hours=i))
         for i in range(200)],
        "id long, ts timestamp_ntz",
    )
    tx = classify_columns(df)
    assert "ts" in tx.date_vars
    assert "ts" not in tx.cols_delete


def test_simhash_md5_60_matches_pure_python(spark):
    # the engine-portable hash family must agree with a from-scratch
    # python recomputation (same 60-bit md5 prefix, same sign rule)
    from featurewiz_spark.operators.dedup import simhash

    texts = ["the quick brown fox", "jumps over the lazy dog",
             "pack my box with five dozen jugs"]
    df = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")
    got = dict(
        simhash(df, "text", "doc_id", bits=16, hash_family="md5_60")
        .collect()
    )

    def py_simhash(text, bits=16):
        toks = sorted(set(text.lower().split()))
        sums = [0] * bits
        for t in toks:
            h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
            for i in range(bits):
                sums[i] += 1 if (h >> i) & 1 else -1
        return sum((1 << i) for i in range(bits) if sums[i] > 0)

    for i, t in enumerate(texts):
        assert got[i] == py_simhash(t), t


def test_jaccard_pairs_shingles(spark):
    from featurewiz_spark.operators.dedup import jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d e"), (3, "z y x w v")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    out = {(r["a"], r["b"]): r["jaccard"]
           for r in jaccard_pairs(docs, pairs, shingle_k=3).collect()}
    assert out[(1, 2)] == 1.0
    assert out[(1, 3)] == 0.0


def test_calendar_parity_features(spark):
    from featurewiz_spark.operators.timefeatures import add_calendar_features

    df = spark.createDataFrame(
        [(1, datetime.datetime(2024, 12, 7, 15, 30)),   # Saturday, December
         (2, datetime.datetime(2024, 6, 3, 9, 0))],     # Monday, June
        "id long, ts timestamp",
    )
    out = {r["id"]: r for r in add_calendar_features(
        df, "ts", prefix="c", ref_year=2025).collect()}
    dec = out[1]
    assert (dec["c_month_name"], dec["c_dayofweek_name"]) == ("Dec", "Sat")
    assert (dec["c_typeofday"], dec["c_is_festive"], dec["c_is_winter"],
            dec["c_is_cold"], dec["c_is_warm"]) == ("weekend", 1, 1, 1, 0)
    assert dec["c_month_typeofday"] == "Dec_weekend"
    assert dec["c_age_in_years"] == 1
    jun = out[2]
    assert (jun["c_month_name"], jun["c_dayofweek_name"]) == ("Jun", "Mon")
    assert (jun["c_typeofday"], jun["c_is_summer"], jun["c_is_warm"],
            jun["c_is_festive"]) == ("weekday", 1, 1, 0)


def test_hashing_encode_n_components(spark):
    import hashlib

    from featurewiz_spark.operators.encoders import hashing_encode

    df = spark.createDataFrame(
        [("AUTOMOBILE",), ("BUILDING",), (None,)], "seg string"
    )
    out = hashing_encode(df, "seg", n_components=4).collect()
    for r in out:
        if r["seg"] is None:
            assert r["seg_hash"] == 0
        else:
            exp = int(hashlib.md5(r["seg"].encode()).hexdigest()[:15], 16) % 4
            assert r["seg_hash"] == exp
        # exactly one indicator set, at the bucket position
        ind = [r[f"seg_hash_{j}"] for j in range(4)]
        assert sum(ind) == 1 and ind[r["seg_hash"]] == 1


def test_fourier_per_id_masks(spark):
    import math

    from featurewiz_spark.operators.timefeatures import add_fourier_features

    df = spark.createDataFrame(
        [(datetime.datetime(2024, 3, 1), "a"),
         (datetime.datetime(2024, 3, 1), "b")],
        "ts timestamp, pid string",
    )
    out = add_fourier_features(df, "ts", orders=[1], prefix="f",
                               mask_col="pid").collect()
    doy = 61  # 2024-03-01
    expect = math.sin(2 * math.pi * doy / 365.0)
    for r in out:
        assert abs(r["f_fourier_sin_1"] - expect) < 1e-12
        own = r[f"f_fourier_sin_1_{r['pid']}"]
        other = r["f_fourier_sin_1_b" if r["pid"] == "a" else "f_fourier_sin_1_a"]
        assert abs(own - expect) < 1e-12 and other == 0.0


def test_nth_largest_cap_semantics(spark):
    from featurewiz_spark.operators.binning import nth_largest_cap

    # values: two rows at max 100; 5th largest below max = 95
    vals = [100, 100, 99, 98, 97, 96, 95, 50, 10]
    df = spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                               "id long, x double")
    out, st = nth_largest_cap(df, "x", cap_at_nth_largest=5)
    got = {r["id"]: r["x"] for r in out.collect()}
    assert st["num_maxs"] == 2 and st["capped_value"] == 95.0
    assert got[0] == 95.0 and got[1] == 95.0 and got[2] == 99.0


def test_iqr_outlier_row_drop(spark):
    from featurewiz_spark.operators.binning import iqr_outlier_row_drop

    rows = [(i, float(i % 50), float(i % 50), float(i % 50), float(i % 50))
            for i in range(1000)]
    # one extreme row, outlier in all four columns
    rows.append((9999, 1e9, 1e9, 1e9, 1e9))
    df = spark.createDataFrame(rows, "id long, a double, b double, c double, d double")
    out, st = iqr_outlier_row_drop(df, ["a", "b", "c", "d"])
    ids = {r["id"] for r in out.select("id").collect()}
    assert 9999 not in ids and len(ids) == 1000


def test_facade_multilabel_targets(spark):
    from featurewiz_spark.plans.facade import FeatureWizSpark

    rows = [(i, i * 0.013, i * 0.007 + 1.0, i * 0.5, i * 0.25 + 2.0)
            for i in range(500)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double, y1 double, y2 double")
    fw = FeatureWizSpark(skip_sulov=True, skip_ranking=True)
    out = fw.fit_transform(df, ["y1", "y2"])
    cols = out.columns
    assert "y1" in cols and "y2" in cols            # both targets carried
    assert "f1" in fw.features and "f2" in fw.features
    assert "y1" not in fw.features and "y2" not in fw.features
    # transform replays on new data with both targets present
    rep = fw.transform(df)
    assert set(rep.columns) == set(cols)


def test_facade_feature_transformer_hook(spark):
    from pyspark.sql import functions as SF

    from featurewiz_spark.plans.facade import FeatureWizSpark

    rows = [(i, i * 0.017, float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, f1 double, y double")

    def add_embedding(d):
        return d.withColumn("dae_f1", SF.col("f1") * 2.0 + 1.0)

    fw = FeatureWizSpark(skip_sulov=True, skip_ranking=True,
                         feature_transformer=add_embedding)
    fw.fit_transform(df, "y")
    assert "dae_f1" in fw.features
    assert "dae_f1" in fw.transform(df).columns


def test_blocked_topk_equals_broadcast_topk(spark):
    # the distributed block-GEMM path must reproduce the broadcast
    # baseline EXACTLY (same ids, same sims, same tie-breaks)
    import random

    from featurewiz_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_blocked,
    )

    rng = random.Random(3)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(400)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, brute_force_topk(df, k=3).collect()))
    b = sorted(map(tuple, brute_force_topk_blocked(
        df, k=3, n_blocks=7, n_query_blocks=3).collect()))
    assert len(a) == len(b) == 400 * 3
    for (ida, nna, ra, sa), (idb, nnb, rb, sb) in zip(a, b):
        assert (ida, nna, ra) == (idb, nnb, rb)
        assert abs(sa - sb) < 1e-9


def test_hash_stratified_sample_partition_invariant(spark):
    from featurewiz_spark.operators.sampling import stratified_sample

    rows = [(i, f"s{i % 4}") for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, s string")
    sets = []
    for k in (1, 8, 32):
        samp = stratified_sample(df.repartition(k), "s", n_rows=400,
                                 method="hash", hash_col="id")
        sets.append(sorted(r["id"] for r in samp.collect()))
    assert sets[0] == sets[1] == sets[2]
    # floor(0.1 * 1000) per stratum
    assert len(sets[0]) == 400


def test_functional_api_path_and_df(spark, tmp_path):
    # F4 one-call orchestration: path input (csv) and DataFrame input
    # both run classify -> engineer -> select and return (features, df)
    from featurewiz_spark.plans.pipeline import featurewiz

    rows = [(i, i * 0.013, i * 0.007 + 1.0, i * 0.5) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, f1 double, f2 double, y double")
    p = str(tmp_path / "train.csv")
    df.toPandas().to_csv(p, index=False)

    feats_path, out_path = featurewiz(
        spark, p, "y", skip_sulov=True, skip_ranking=True
    )
    feats_df, out_df = featurewiz(
        spark, df, "y", skip_sulov=True, skip_ranking=True
    )
    assert feats_path == feats_df
    assert "f1" in feats_df and "f2" in feats_df
    assert "y" in out_df.columns and out_df.count() == 400
    assert out_path.count() == 400


def test_int8_quantized_ann_recall(spark):
    import random

    from featurewiz_spark.operators.similarity import (
        brute_force_topk,
        dequantize_expr,
        quantize_embeddings,
    )

    rng = random.Random(5)
    rows = [(i, [rng.gauss(0, 1) for _ in range(32)]) for i in range(300)]
    # plant exact near-dups so true top-1 is unambiguous for 50 queries
    rows += [(1000 + i, [x * 1.001 for x in rows[i][1]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    qdf = quantize_embeddings(df)
    # codes really are int8
    assert qdf.schema["embedding_q8"].dataType.simpleString() == "array<tinyint>"
    deq = qdf.withColumn("embedding", dequantize_expr("embedding_q8", "embedding_q8_scale"))

    exact = {r["vec_id"]: r["nn_id"]
             for r in brute_force_topk(df, k=1).collect() if r["vec_id"] >= 1000}
    approx = {r["vec_id"]: r["nn_id"]
              for r in brute_force_topk(deq.select("vec_id", "embedding"), k=1).collect()
              if r["vec_id"] >= 1000}
    # planted queries: quantization noise (~1/254) cannot flip a
    # cos≈1.0 vs cos≤0.8 margin — recall must be exact
    assert exact == approx
    for q, nn in approx.items():
        assert nn == q - 1000


def test_glmm_binomial_effect_properties(spark):
    # logit-scale random effects: sign tracks the category's rate vs the
    # global rate; a small category shrinks harder than a large one at
    # the same empirical rate; gaussian path is unchanged.
    import random

    from featurewiz_spark.operators.encoders import glmm_encode

    rng = random.Random(13)
    rows = []
    # cat 'hi' (big, 80% positive), 'lo' (big, 20%), 'hi_small' (10 rows, 80%)
    for i in range(1000):
        rows.append(("hi", 1.0 if rng.random() < 0.8 else 0.0))
        rows.append(("lo", 1.0 if rng.random() < 0.2 else 0.0))
    for i in range(10):
        rows.append(("hi_small", 1.0 if i < 8 else 0.0))
    df = spark.createDataFrame(rows, "c string, y double")
    _, enc = glmm_encode(df, "c", "y", family="binomial")
    eff = dict(enc.collect())
    assert eff["hi"] > 0 > eff["lo"]
    # same direction, but the 10-row category shrinks toward 0 harder
    assert 0 < eff["hi_small"] < eff["hi"]


def test_facade_calendar_string_replay(spark):
    # date vars expand to string calendar features (month/day names,
    # typeofday) which the facade label-encodes on fit and must REPLAY
    # (same fitted mapping, unseen policy) on transform
    from featurewiz_spark.plans.facade import FeatureWizSpark

    rows = [
        (i,
         datetime.datetime(2024, 1 + (i % 12), 1 + (i % 28), i % 24),
         i * 0.017,
         float(i % 100))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, f1 double, y double")
    train = df.filter(F.col("id") < 450)
    test = df.filter(F.col("id") >= 450)
    fw = FeatureWizSpark(skip_sulov=True, skip_ranking=True)
    out = fw.fit_transform(train, "y")
    assert any(c.startswith("ts_month_name") for c in fw._label_maps), fw._label_maps.keys()
    rep = fw.transform(test)
    assert [c for c in rep.columns if c != "y"] == fw.features
    # replayed codes must agree with the fitted mapping for seen months
    code_col = "ts_month_name_code"
    if code_col in rep.columns:
        mapping = dict(fw._label_maps["ts_month_name"].collect())
        got = rep.select("ts_month_name_code").distinct().count()
        assert got <= len(mapping) + 1  # seen codes (+possible unseen block)
    assert rep.count() == 150


def test_ivf_quantized_shuffle_same_neighbors(spark):
    import random

    from featurewiz_spark.operators.similarity import ivf_topk

    rng = random.Random(21)
    rows = [(i, [rng.gauss(0, 1) for _ in range(24)]) for i in range(300)]
    rows += [(1000 + i, [x * 1.001 for x in rows[i][1]]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fp = {r["vec_id"]: r["nn_id"]
          for r in ivf_topk(df, k=1, n_cells=6, sample_rows=400).collect()
          if r["vec_id"] >= 1000}
    q8 = {r["vec_id"]: r["nn_id"]
          for r in ivf_topk(df, k=1, n_cells=6, sample_rows=400,
                            quantize_shuffle=True).collect()
          if r["vec_id"] >= 1000}
    assert fp == q8  # int8 shuffle must not change neighbor identity
    assert all(nn == q - 1000 for q, nn in q8.items())


def test_blocked_topk_no_query_loss_at_scale(spark):
    # regression: mismatched cogroup key TYPES ((bigint,int) left vs
    # (int,bigint) right) hash-partitioned the two sides differently and
    # silently split ~25% of grid cells into half-empty calls at 50k
    # rows / 32 blocks — every query must produce exactly one k=1 row
    import numpy as np

    from pyspark.sql import functions as SF

    from featurewiz_spark.operators.similarity import brute_force_topk_blocked

    rng = np.random.default_rng(17)
    M = rng.standard_normal((50_000, 16)).astype("float32")
    df = (
        spark.createDataFrame(
            [(i, M[i].tolist()) for i in range(50_000)],
            "vec_id long, embedding array<float>",
        )
        .repartition(32)
        .persist()
    )
    q = df.filter(SF.col("vec_id") < 2000)
    out = brute_force_topk_blocked(df, k=1, queries=q, n_blocks=32,
                                   n_query_blocks=4)
    assert out.select("vec_id").distinct().count() == 2000
    assert out.count() == 2000
    df.unpersist()
