"""Regression tests for round-4 verdict + advice items.

Each test pins one specific fix:
- trend_seasonality: hash-aggregate rewrite ≡ old window-sum semantics
  (incl. NULL cat/ts groups, which a plain equi-join would drop)
- ordered_target_encode(bucket=...): bucketed carry-spine ≡ plain
  running window (incl. NULL ts / NULL category / same-ts duplicates)
- asof_join: matched-ts output clash detected; MapType value col raises
  an actionable error instead of a Catalyst one
- read_any zip/xz: chunked decompression, temp files registered for
  exit cleanup (no unbounded f.read, no orphan accumulation)
- one_hot_encode: names derived from categories only (fit vs replay
  frames with different incidental columns agree); clash raises
- facade.transform: string target replayed through the SAME label map
  as fit_transform
- run_sessionize_availablenow without sentinel_overrides: fabricated
  sentinel sessions are filtered, not returned under a real key
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


def _rows(df, *cols):
    return sorted((tuple(r) for r in df.select(*cols).collect()), key=repr)


# --- trend_seasonality rewrite ------------------------------------------

def test_trend_seasonality_matches_window_semantics(spark):
    from featurewiz_spark.operators.groupby import trend_seasonality

    data = [
        ("a", 1, 10.0), ("a", 1, 30.0), ("b", 1, 60.0),
        ("a", 2, 5.0), ("b", 2, 15.0),
        (None, 1, 100.0),          # NULL category groups together
        ("a", None, 7.0),          # NULL ts groups together
        (None, None, 3.0),
        ("c", 3, 0.0),             # zero denominator → NULL trend
    ]
    df = spark.createDataFrame(data, ["cat", "t", "v"])
    got = trend_seasonality(df, "cat", "t", "v")
    # old semantics, computed independently via window sums
    w_ct = Window.partitionBy("cat", "t")
    w_t = Window.partitionBy("t")
    exp = df.withColumn(
        "trend", F.try_divide(F.sum("v").over(w_ct), F.sum("v").over(w_t))
    ).withColumn("seasonality", F.try_divide(F.col("v"), F.col("trend")))

    def r6(df_):
        return _rows(
            df_.select(
                "cat", "t", "v",
                F.round("trend", 6).alias("trend"),
                F.round("seasonality", 6).alias("seasonality"),
            ),
            "cat", "t", "v", "trend", "seasonality",
        )

    assert r6(got) == r6(exp)
    assert got.count() == df.count()


def test_trend_seasonality_plan_has_no_window(spark):
    """The rewrite's point: no Window node (one ts = one task at scale);
    hash aggregates get map-side partials instead."""
    from featurewiz_spark.operators.groupby import trend_seasonality

    df = spark.createDataFrame([("a", 1, 1.0)], ["cat", "t", "v"])
    plan = trend_seasonality(df, "cat", "t", "v")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "HashAggregate" in plan


# --- bucketed ordered_target_encode -------------------------------------

def _ote_frame(spark):
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        cat = ["x", "y", "z", None][i % 4]
        ts = base + dt.timedelta(hours=7 * i % 997, days=i % 160)
        y = float((i * 37) % 100) if i % 11 else None   # NULL targets too
        rows.append((i, cat, ts, y))
    # same-ts duplicates inside one category (must NOT see each other)
    rows += [(1000, "x", base, 50.0), (1001, "x", base, 70.0)]
    # NULL ts rows
    rows += [(1002, "x", None, 5.0), (1003, None, None, 6.0)]
    return spark.createDataFrame(rows, ["id", "cat", "ts", "y"])


@pytest.mark.parametrize("bucket", ["7 days", "30 days", "1000 days"])
def test_bucketed_ordered_te_equals_plain(spark, bucket):
    from featurewiz_spark.operators.encoders import ordered_target_encode

    df = _ote_frame(spark)
    plain = ordered_target_encode(df, "cat", "y", "ts", prior=42.0)
    buck = ordered_target_encode(df, "cat", "y", "ts", prior=42.0,
                                 bucket=bucket)
    p = _rows(plain.select("id", F.round("cat_ordered_te", 9).alias("e")),
              "id", "e")
    b = _rows(buck.select("id", F.round("cat_ordered_te", 9).alias("e")),
              "id", "e")
    assert p == b


def test_bucketed_ordered_te_leakage_free(spark):
    """Each row's encode uses only strictly-earlier rows: encode of the
    earliest row of each category must be the pure prior."""
    from featurewiz_spark.operators.encoders import ordered_target_encode

    base = dt.datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [(0, "a", base, 10.0), (1, "a", base + dt.timedelta(days=40), 20.0),
         (2, "a", base + dt.timedelta(days=80), 30.0)],
        ["id", "cat", "ts", "y"],
    )
    out = dict(
        _rows(
            ordered_target_encode(df, "cat", "y", "ts", prior=5.0,
                                  bucket="30 days")
            .select("id", "cat_ordered_te"), "id", "cat_ordered_te"
        )
    )
    assert out[0] == pytest.approx(5.0)               # prior only
    assert out[1] == pytest.approx((10.0 + 5.0) / 2)  # sees row 0
    assert out[2] == pytest.approx((30.0 + 5.0) / 3)  # sees rows 0,1


# --- asof_join guards ----------------------------------------------------

def test_asof_matched_ts_clash_raises(spark):
    from featurewiz_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 10, 99)], ["k", "lt", "rts_asof"]  # pre-existing output name
    )
    right = spark.createDataFrame([(1, 5, 1.0)], ["k", "rts", "v"])
    with pytest.raises(ValueError, match="rts_asof"):
        asof_join(left, right, "k", "lt", "rts")


def test_asof_maptype_value_col_raises(spark):
    from featurewiz_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 10)], ["k", "lt"])
    right = spark.createDataFrame(
        [(1, 5, {"a": 1})], "k INT, rts INT, m MAP<STRING,INT>"
    )
    with pytest.raises(ValueError, match="non-orderable"):
        asof_join(left, right, "k", "lt", "rts")


# --- read_any compressed temp handling ----------------------------------

def test_read_any_zip_streams_and_registers_cleanup(spark, tmp_path):
    import zipfile

    from featurewiz_spark.sources import readers

    csv = tmp_path / "t.csv"
    csv.write_text("a,b\n1,2\n3,4\n")
    zp = tmp_path / "t.csv.zip"
    with zipfile.ZipFile(zp, "w") as z:
        z.write(csv, "t.csv")
    before = len(readers._TMP_FILES)
    df = readers.read_any(spark, str(zp))
    assert _rows(df, "a", "b") == [(1, 2), (3, 4)]
    assert len(readers._TMP_FILES) == before + 1
    import os

    assert os.path.exists(readers._TMP_FILES[-1])


def test_read_any_xz_roundtrip(spark, tmp_path):
    import lzma

    from featurewiz_spark.sources import readers

    xz = tmp_path / "t.csv.xz"
    with lzma.open(xz, "wt") as f:
        f.write("a,b\n5,6\n")
    df = readers.read_any(spark, str(xz))
    assert _rows(df, "a", "b") == [(5, 6)]


# --- one_hot_encode name determinism -------------------------------------

def test_one_hot_names_invariant_to_incidental_columns(spark):
    from featurewiz_spark.operators.encoders import one_hot_encode

    fit = spark.createDataFrame(
        [("a b", 1, 7), ("a_b", 2, 8)], ["c", "x", "extra_fit_only"]
    )
    replay = spark.createDataFrame(
        [("a b", 3), ("zzz", 4)], ["c", "y"]
    )
    out_fit, cats = one_hot_encode(fit, "c")
    out_rep, _ = one_hot_encode(replay, "c", categories=cats)
    fit_names = sorted(set(out_fit.columns) - set(fit.columns))
    rep_names = sorted(set(out_rep.columns) - set(replay.columns))
    assert fit_names == rep_names == ["c_is_a_b", "c_is_a_b__2"]


def test_one_hot_existing_column_clash_raises(spark):
    from featurewiz_spark.operators.encoders import one_hot_encode

    df = spark.createDataFrame([("v", 1)], ["c", "c_is_v"])
    with pytest.raises(ValueError, match="c_is_v"):
        one_hot_encode(df, "c")


# --- facade.transform target label map -----------------------------------

def test_facade_transform_encodes_string_target(spark):
    from featurewiz_spark.plans.facade import FeatureWizSpark

    rows = [(float(i), float(i % 7), "yes" if i % 2 else "no")
            for i in range(60)]
    df = spark.createDataFrame(rows, ["f1", "f2", "label"])
    fw = FeatureWizSpark(skip_sulov=True, skip_ranking=True)
    train = fw.fit_transform(df, "label")
    assert dict(train.dtypes)["label"] == "int"
    test = fw.transform(df)
    assert "label" in test.columns
    assert dict(test.dtypes)["label"] == "int"
    # same codes both paths: no → 0, yes → 1 (sorted values)
    codes = {r["label"] for r in test.select("label").distinct().collect()}
    assert codes == {0, 1}
    # unseen target value → NULL, not an invented code
    test2 = fw.transform(
        spark.createDataFrame([(1.0, 2.0, "maybe")], ["f1", "f2", "label"])
    )
    assert test2.select("label").first()[0] is None


# --- banded LSH near-dup recall ------------------------------------------

def test_banded_near_dup_beats_single_signature(spark):
    """r3 verdict item 5: one signature needs ALL n_planes bits to
    agree — at cosine ~0.88 with 8 planes that's ~29% recall. Banding
    (collide in ANY of 4 independent signatures) lifts it to ~75%
    analytically; verify on planted moderately-similar pairs that the
    banded candidate set strictly dominates and clears a floor the
    single signature cannot."""
    import numpy as np

    from featurewiz_spark.operators.similarity import cosine_near_dup_pairs

    rng = np.random.default_rng(7)
    dim, n_pairs = 32, 60
    rows = []
    for i in range(n_pairs):
        v = rng.standard_normal(dim)
        v /= np.linalg.norm(v)
        # jitter to cosine ≈ 0.85-0.92 (below the all-bits-agree zone):
        # cos ≈ 1/sqrt(1 + σ²·dim) for unit v ⇒ σ = 0.095 → ~0.88
        w = v + rng.standard_normal(dim) * 0.095
        w /= np.linalg.norm(w)
        rows.append((i, [float(x) for x in v]))
        rows.append((i + 100000, [float(x) for x in w]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    planted = {
        (i, i + 100000)
        for i in range(n_pairs)
        if float(
            np.dot(
                np.array(rows[2 * i][1]), np.array(rows[2 * i + 1][1])
            )
        )
        >= 0.85
    }
    assert len(planted) >= 30  # fixture sanity

    def found(n_bands):
        got = {
            (r["a"], r["b"])
            for r in cosine_near_dup_pairs(
                df, threshold=0.85, n_planes=8, n_bands=n_bands
            ).collect()
        }
        return got & planted

    single = found(1)
    banded = found(4)
    assert single <= banded  # band 0 reuses the single signature's seed
    assert len(banded) > len(single)
    assert len(banded) / len(planted) >= 0.55
    assert len(single) / len(planted) <= 0.55


# --- streaming sentinel filtering without overrides ----------------------

def test_sessionize_availablenow_default_filters_sentinels(spark, tmp_path):
    from featurewiz_spark.streaming.stream_features import (
        run_sessionize_availablenow,
    )

    base = dt.datetime(2024, 5, 1, 12, 0, 0)
    rows = [(7, base + dt.timedelta(minutes=5 * i)) for i in range(4)]
    src = str(tmp_path / "src.parquet")
    spark.createDataFrame(rows, ["user_id", "ts"]).write.parquet(src)
    out = run_sessionize_availablenow(
        spark, src, str(tmp_path / "wk"), keys=["user_id"], ts="ts",
        gap="30 minutes",
    )  # NOTE: no sentinel_overrides — the advice's corruption scenario
    got = out.collect()
    assert len(got) == 1
    assert got[0]["n_events"] == 4
    # nothing in 2030 leaked through under user_id=7
    assert all(r["session_start"].year == 2024 for r in got)


# --- trigram language ID (replaces the stopword toy, same API) -----------

def test_langid_ngram_held_out_and_unknown(spark):
    """add_language_id now routes to the trigram-profile model (with the
    r4 Han-script gate for zh). Pin: (a) held-out sentences (disjoint
    from the training corpus) classify correctly in all profile
    languages, including short fragments where the stopword voter had no
    signal; (b) majority-Han text is 'zh' via the script gate; (c)
    out-of-profile-script / numeric / empty text is 'unknown', not a
    fallback-ordering artifact."""
    from featurewiz_spark.text.stats import add_language_id

    cases = [
        (0, "en", "The museum opens early on weekends and entry is free."),
        (1, "de", "Niemand wusste genau, wann die Brücke gebaut worden war."),
        (2, "fr", "Elle versait le café lentement en lisant le journal."),
        (3, "es", "Nadie sabía exactamente cuándo se había construido el puente."),
        (4, "en", "a quiet place to read"),
        (5, "de", "ein ruhiger Ort zum Lesen"),
        (6, "fr", "un endroit calme pour lire"),
        (7, "es", "un lugar tranquilo para leer"),
        (8, "zh", "你好 世界 这是 中文 文本"),
        (9, "unknown", "42 17 99 -- !!"),
        (10, "unknown", ""),
        (11, "it", "Nessuno sapeva esattamente quando il ponte fosse stato costruito."),
        (12, "pt", "Ninguém sabia exatamente quando a ponte tinha sido construída."),
        (13, "it", "un posto tranquillo per leggere"),
        (14, "zh", "博物馆周末开得很早，学生可以免费入场。"),
        (15, "unknown", "привет мир это русский текст"),
        # mixed text BELOW the Han majority falls through to trigrams
        (16, "en", "the quick brown fox jumped over the lazy dog 狐"),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, _, t in cases], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["lang_pred"] for r in add_language_id(df).collect()}
    for i, truth, _ in cases:
        assert got[i] == truth, (i, truth, got[i])


def test_langid_sql_mirror_matches_spark(spark, duck):
    """The DuckDB CTEs and the Spark projection are generated from the
    same profile table — verify they agree verbatim on a mixed batch
    (this is the q33/q62 lockstep contract, in miniature)."""
    from featurewiz_spark.text.langid import (
        add_language_id_ngram,
        langid_sql_ctes,
    )

    rows = [
        (0, "The committee will publish its findings next month."),
        (1, "Der Ausschuss wird seine Ergebnisse veröffentlichen."),
        (2, "Le comité publiera ses conclusions le mois prochain."),
        (3, "El comité publicará sus conclusiones el próximo mes."),
        (4, "999 ???"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["lang_pred"]
           for r in add_language_id_ngram(df).collect()}
    duck.execute("CREATE OR REPLACE TABLE docs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO docs VALUES (?, ?)", rows)
    sql = (f"WITH {langid_sql_ctes('docs')} "
           "SELECT d.doc_id, coalesce(b.lang_pred, 'unknown') AS lang_pred "
           "FROM docs d LEFT JOIN __lang_best b USING (doc_id)")
    oracle = {int(r[0]): r[1] for r in duck.execute(sql).fetchall()}
    assert got == oracle


def test_langid_pandas_and_expr_impls_agree(spark):
    """The Arrow-kernel default and the pure-JVM expression path must
    return identical predictions. Both accumulate in-vocab log-probs in
    TEXT ORDER (the kernel's weighted bincount adds hits in array order
    = the expr fold's left-to-right order) and both price OOV trigrams
    as ONE closed-form oov_count·fallback multiply — so raw scores are
    bitwise-equal and exact ties (the tie-bait fragments below) hit the
    identical (score, prio, lang) tie-break in both paths. Probed on
    real fixture docs plus edge rows (null / empty / all-OOV / tie-bait
    short fragments)."""
    from featurewiz_spark.text.langid import add_language_id_ngram

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    extra = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "12345 !!"),
         (100004, "la"), (100005, "de la en el und the")],
        "doc_id long, text string",
    )
    df = docs.select("doc_id", "text").unionByName(extra)
    a = {r["doc_id"]: r["lang_pred"]
         for r in add_language_id_ngram(df, impl="pandas").collect()}
    b = {r["doc_id"]: r["lang_pred"]
         for r in add_language_id_ngram(df, impl="expr").collect()}
    assert a == b
    assert len(a) == df.count()


# --- PIL-gated real image decode (stub fallback preserved) ---------------

def test_image_decoder_gate_stub_fallback(spark):
    """decoder='auto' without Pillow must fall back to the deterministic
    stub and keep the poison-row contract; decoder='pil' must raise an
    actionable ImportError up front (openpyxl-gate pattern)."""
    from featurewiz_spark.text import multimodal as mm

    df = spark.createDataFrame(
        [(1, bytes(range(64))), (2, None)],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r
           for r in mm.extract_image_features(df, decoder="auto").collect()}
    if not mm.HAS_PIL:
        # auto == stub here: byte statistics, exact pin
        assert out[1]["features"][0] == 64.0  # len
        assert out[1]["decode_error"] is None
        assert out[2]["features"] is None and "null content" in out[2]["decode_error"]
        with pytest.raises(ImportError, match="Pillow"):
            mm.extract_image_features(df, decoder="pil")
    with pytest.raises(ValueError, match="unknown decoder"):
        mm.extract_image_features(df, decoder="magic")


@pytest.mark.skipif(
    not __import__("featurewiz_spark.text.multimodal", fromlist=["HAS_PIL"]).HAS_PIL,
    reason="Pillow not installed in this container (decode gate falls back to stub)",
)
def test_image_decoder_real_pil_path(spark):
    """Runs only where Pillow exists: a real 2x2 PNG decodes to
    [w, h, meanR, meanG, meanB, stdGray, minGray, maxGray]; a corrupt
    payload becomes a poison row, not a job failure."""
    import io

    import numpy as np
    from PIL import Image

    from featurewiz_spark.text.multimodal import extract_image_features

    img = Image.new("RGB", (2, 2))
    img.putdata([(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)])
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, buf.getvalue()), (2, b"not an image")],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r
           for r in extract_image_features(df, decoder="pil").collect()}
    f = out[1]["features"]
    assert f[:2] == [2.0, 2.0]
    assert np.isclose(f[2], (255 + 0 + 0 + 255) / 4.0)
    assert out[1]["decode_error"] is None
    assert out[2]["features"] is None and out[2]["decode_error"]


# --- J5: as-of join with model-predicted fallback -------------------------

def test_asof_model_fallback_branches(spark):
    """All three fill branches in one frame: a matched row keeps its
    as-of value; a miss on a 2-point key gets the EXACT per-key linear
    trend (data constructed linear, so the closed-form model recovers
    y(t) perfectly); a miss on a single-snapshot key (var_pop == 0, no
    slope) falls to the reference's fillna(0)."""
    from datetime import datetime

    from featurewiz_spark.operators.asof import asof_join_model_fallback

    def ts(d, h=0):
        return datetime(2024, 1, d, h)

    # key 1: purchases at d1 (10.0) and d11 (20.0) — slope 1.0/day.
    # key 2: one purchase only (degenerate timeline).
    right = spark.createDataFrame(
        [(1, ts(1), 10.0), (1, ts(11), 20.0), (2, ts(1), 5.0)],
        "user_id int, snap_ts timestamp, pv double",
    )
    left = spark.createDataFrame(
        [(100, 1, ts(11, 6)),   # within 1 day of d11 -> asof 20.0
         (200, 1, ts(21)),      # miss -> model: 10 + (21-1) = 30.0
         (300, 2, ts(21))],     # miss, var=0 -> fill 0.0
        "event_id int, user_id int, ts timestamp",
    )
    out = {
        r["event_id"]: r
        for r in asof_join_model_fallback(
            left, right, on="user_id", left_ts="ts", right_ts="snap_ts",
            value_col="pv", tolerance="1 day",
        ).collect()
    }
    assert out[100]["pv_asof_src"] == "asof"
    assert out[100]["pv_asof"] == 20.0
    assert out[200]["pv_asof_src"] == "model"
    assert abs(out[200]["pv_asof"] - 30.0) < 1e-9
    assert out[300]["pv_asof_src"] == "fill"
    assert out[300]["pv_asof"] == 0.0


def test_asof_model_fallback_src_clash_raises(spark):
    from datetime import datetime

    from featurewiz_spark.operators.asof import asof_join_model_fallback

    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1.0)],
        "user_id int, snap_ts timestamp, pv double",
    )
    left = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 2), "x")],
        "event_id int, user_id int, ts timestamp, pv_asof_src string",
    )
    with pytest.raises(ValueError, match="pv_asof_src"):
        asof_join_model_fallback(
            left, right, on="user_id", left_ts="ts", right_ts="snap_ts",
            value_col="pv",
        )


# --- review-pass fixes (round 4, second batch) ----------------------------

def test_asof_model_fallback_fit_ignores_null_values(spark):
    """A nullable value column must not bias the fit: covar_pop drops
    null-y rows but var_pop/avg(x) would keep them, mixing three row
    sets into one OLS estimate. With the fit restricted to fully-
    observed pairs, (0d, 10.0), (10d, 20.0), (5d, NULL) fits slope
    exactly 1.0/day -> prediction at day 20 is 30.0 (the biased
    aggregates would give slope 1.5 and a different intercept)."""
    from datetime import datetime

    from featurewiz_spark.operators.asof import asof_join_model_fallback

    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 10.0),
         (1, datetime(2024, 1, 11), 20.0),
         (1, datetime(2024, 1, 6), None)],
        "user_id int, snap_ts timestamp, pv double",
    )
    left = spark.createDataFrame(
        [(200, 1, datetime(2024, 1, 21))],
        "event_id int, user_id int, ts timestamp",
    )
    r = asof_join_model_fallback(
        left, right, on="user_id", left_ts="ts", right_ts="snap_ts",
        value_col="pv", tolerance="1 day",
    ).collect()[0]
    assert r["pv_asof_src"] == "model"
    assert abs(r["pv_asof"] - 30.0) < 1e-9


def test_asof_join_rejects_nested_map_payload(spark):
    """Non-orderable types nested inside structs/arrays must hit the
    actionable guard, not Catalyst's opaque
    EXPRESSION_TYPE_IS_NOT_ORDERABLE at execution."""
    from datetime import datetime

    from featurewiz_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 2))], "user_id int, ts timestamp"
    )
    right = spark.sql(
        "SELECT 1 AS user_id, TIMESTAMP '2024-01-01' AS snap_ts, "
        "named_struct('k', 1, 'm', map('a', 1)) AS payload"
    )
    with pytest.raises(ValueError, match="MapType"):
        asof_join(left, right, on="user_id", left_ts="ts",
                  right_ts="snap_ts")


def test_facade_transform_skips_already_numeric_target(spark):
    """transform() remaps only StringType targets: a frame whose label
    is already integer-coded (fit_transform output fed back, or user
    pre-encoded) must pass through unchanged, not be NULLed by an int
    probe into a map<string,int>."""
    from featurewiz_spark.plans.facade import FeatureWizSpark

    train = spark.createDataFrame(
        [(float(i), float(i % 7), "yes" if i % 2 else "no")
         for i in range(60)],
        "f1 double, f2 double, label string",
    )
    fw = FeatureWizSpark(skip_sulov=True, skip_ranking=True)
    fw.fit_transform(train, "label")
    pre_encoded = spark.createDataFrame(
        [(1.0, 2.0, 1), (2.0, 3.0, 0)], "f1 double, f2 double, label int"
    )
    out = fw.transform(pre_encoded)
    got = sorted(r["label"] for r in out.select("label").collect())
    assert got == [0, 1]


def test_add_language_id_impl_passthrough(spark):
    """The stable stats.add_language_id API exposes impl= so Python-less
    executor deployments can select the pure-JVM expression path."""
    from featurewiz_spark.text.stats import add_language_id

    df = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog and the cat")],
        "doc_id long, text string",
    )
    a = add_language_id(df, "text").collect()[0]["lang_pred"]
    b = add_language_id(df, "text", impl="expr").collect()[0]["lang_pred"]
    assert a == b == "en"


# --- q73: streaming windowed agg runner contract --------------------------

def test_windowed_agg_runner_requires_sentinel_overrides(spark, tmp_path):
    """The ADVICE-class sentinel bug, pre-empted: fabricated far-future
    rows cloned from a real row would silently corrupt results under
    that row's key — the windowed runner refuses to run without an
    explicit impossible-key override."""
    from featurewiz_spark.streaming.stream_features import (
        run_windowed_agg_availablenow,
    )

    with pytest.raises(ValueError, match="sentinel_overrides"):
        run_windowed_agg_availablenow(
            spark, "/root/testdata/sf0.001/events.parquet",
            str(tmp_path / "w"), keys=["user_id"],
        )


def test_windowed_agg_runner_empty_source(spark, tmp_path):
    """An empty source returns an empty frame of the output shape
    instead of dying on the sink's schema inference."""
    from featurewiz_spark.streaming.stream_features import (
        run_windowed_agg_availablenow,
    )

    src = str(tmp_path / "empty.parquet")
    spark.createDataFrame(
        [], "user_id int, ts timestamp_ntz, value double"
    ).write.parquet(src)
    out = run_windowed_agg_availablenow(
        spark, src, str(tmp_path / "w"), keys=["user_id"],
        sentinel_overrides={"user_id": -1},
    )
    assert out.count() == 0
    assert set(out.columns) == {
        "user_id", "window_start", "window_end", "n",
        "value_sum", "value_avg",
    }


# --- audio decode (stdlib WAV — real, not stub) ---------------------------

def test_extract_audio_features_wav_and_poison(spark):
    """A 440Hz int16 mono WAV decodes for real through the stdlib path
    (duration/rate/channels exact, rms ~ 1/sqrt(2) of amplitude); a
    non-WAV payload and a NULL become poison rows, not job failures."""
    import io
    import math
    import wave

    import numpy as np

    from featurewiz_spark.text.multimodal import extract_audio_features

    sr, dur = 8000, 0.5
    t = np.arange(int(sr * dur)) / sr
    pcm = (0.6 * np.sin(2 * math.pi * 440 * t) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    df = spark.createDataFrame(
        [(1, buf.getvalue()), (2, b"ID3not-a-wav"), (3, None)],
        "media_id long, content binary",
    )
    out = {r["media_id"]: r for r in extract_audio_features(df).collect()}
    f = out[1]["features"]
    assert out[1]["decode_error"] is None
    assert f[0] == pytest.approx(dur)        # duration
    assert f[1] == sr and f[2] == 1.0        # rate, channels
    assert f[3] == pytest.approx(0.6 / math.sqrt(2), rel=1e-3)  # rms
    assert f[4] == pytest.approx(0.6, rel=1e-3)                  # peak
    assert out[2]["features"] is None and out[2]["decode_error"]
    assert out[3]["features"] is None and "null content" in out[3]["decode_error"]


def test_audio_corrupt_chunk_is_poison_not_job_failure(spark):
    """Fuzzing found the stdlib wave module raising bare RuntimeError
    (Chunk.skip's invalid seek) on corrupted chunk headers — an
    exception outside the old per-leg catch tuple that would fail the
    Spark task 4x and kill the job. The shared _poison_exceptions
    tuple must turn every such payload into a poison row."""
    import io
    import wave

    import numpy as np

    from featurewiz_spark.text.multimodal import extract_audio_features

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(np.zeros(64, dtype="<i2").tobytes())
    wav = bytearray(buf.getvalue())
    # corrupt the data chunk id + size: 'data' -> 'd{ta', size -> huge
    i = bytes(wav).find(b"data")
    wav[i + 1] = ord("{")
    wav[i + 4 : i + 8] = b"\xff\xff\xff\x7f"
    rows = [(1, bytes(wav))]
    # plus 200 random single-byte corruptions of a valid WAV
    rng = np.random.default_rng(7)
    good = buf.getvalue()
    for k in range(200):
        b = bytearray(good)
        b[rng.integers(0, len(b))] ^= 0xFF
        rows.append((2 + k, bytes(b)))
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = extract_audio_features(df).collect()   # must not raise
    assert len(out) == len(rows)
    for r in out:
        assert (r["features"] is None) == (r["decode_error"] is not None)


def test_audio_single_frame_wav_zcr_defined(spark):
    """A 1-frame WAV is valid audio: zcr must be 0.0, not NaN."""
    import io
    import math
    import wave

    from featurewiz_spark.text.multimodal import extract_audio_features

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00\x40")  # one int16 frame
    df = spark.createDataFrame([(1, buf.getvalue())],
                               "media_id long, content binary")
    r = extract_audio_features(df).collect()[0]
    assert r["decode_error"] is None
    f = r["features"]
    assert not any(math.isnan(v) for v in f)
    assert f[5] == 0.0


def test_lsh_bucket_cap_drops_hot_bucket_without_window(spark):
    """The max_bucket_size guard must (a) drop buckets above the cap,
    (b) keep buckets at/below it, and (c) run as a hash aggregate +
    semi-join, NOT count().over(partitionBy(bucket)) — a window would
    buffer the whole hot boilerplate bucket in one task before
    filtering, the exact blowup the cap exists to prevent."""
    from featurewiz_spark.cache import cache_scope
    from featurewiz_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )

    # 30 identical boilerplate docs (one hot bucket per band) + 2
    # identical rare docs (bucket size 2, far from the boilerplate text)
    rows = [(i, "cookie banner accept terms privacy policy footer nav")
            for i in range(30)]
    rows += [(100, "completely different unique prose alpha beta gamma"),
             (101, "completely different unique prose alpha beta gamma")]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    with cache_scope():
        sigs = minhash_signatures(docs, num_hashes=16, partitions=4)
        pairs = minhash_lsh_pairs(
            sigs, bands=4, rows_per_band=4,
            jaccard_threshold=0.0, max_bucket_size=10,
        )
        got = {(r["a"], r["b"]) for r in pairs.collect()}
        # the 30-doc boilerplate bucket (size 30 > 10) is dropped whole;
        # the pair of rare dups (bucket size 2) survives
        assert got == {(100, 101)}

        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "WindowExec" not in plan and "Window" not in plan

    with cache_scope():
        sigs = minhash_signatures(docs, num_hashes=16, partitions=4)
        all_pairs = minhash_lsh_pairs(
            sigs, bands=4, rows_per_band=4,
            jaccard_threshold=0.0, max_bucket_size=500,
        )
        # with the cap lifted, the boilerplate cluster pairs reappear
        assert all_pairs.count() == 30 * 29 // 2 + 1
