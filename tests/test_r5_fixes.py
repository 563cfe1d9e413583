"""Round-5 regression tests: the four ADVICE findings (temperature_mixing_sql
default shape, web_curation all-NULL-strata corner, dedup_by_canonical_url
n_fetches clash + NULL order semantics, snapshot_churn tie-break) and the
VERDICT scale-hygiene item (brute_force_topk driver-collect guard)."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# ADVICE 1: temperature_mixing_sql default select_cols
# ------------------------------------------------------------------


def test_temperature_mixing_sql_default_shape(spark, duck, tmp_path):
    """Default select_cols must qualify the star to the data table —
    a bare '*' expanded over the LEFT JOIN and duplicated mix_rate."""
    from featurewiz_spark.operators.sampling import (
        temperature_mixing_sample,
        temperature_mixing_sql,
    )

    rows = [(i, ["en", "fr", "de", None][i % 4]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")

    rel = duck.sql(temperature_mixing_sql("docs", "lang", "doc_id"))
    # no duplicate names, no stray rate-table 's' column
    assert rel.columns == ["doc_id", "lang", "mix_rate", "mix_keep"]

    spark_rows = sorted(
        map(
            tuple,
            temperature_mixing_sample(df, "lang", "doc_id")
            .select("doc_id", "lang", "mix_rate", "mix_keep")
            .collect(),
        )
    )
    duck_rows = sorted(map(tuple, rel.fetchall()))
    assert spark_rows == duck_rows


# ------------------------------------------------------------------
# ADVICE 2: web_curation_pipeline all-NULL-strata corner
# ------------------------------------------------------------------


def test_web_curation_all_null_strata_returns_empty(spark):
    """Survivors exist but every stratum is NULL: the composed SQL
    oracle's WHERE mix_keep drops them all (NULL keep), so the engine
    must return the same EMPTY shape instead of raising."""
    from featurewiz_spark.plans.pipeline import web_curation_pipeline

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta words here", None),
            (2, "epsilon zeta eta theta more words", None),
            (3, "iota kappa lambda mu other words", None),
        ],
        "doc_id: long, text: string, lang: string",
    )
    bench = spark.createDataFrame(
        [("never matches anything at all zzz",)], "text: string"
    )
    out = web_curation_pipeline(docs, bench, lm_threshold=1e9)
    assert out.columns == ["doc_id", "lang", "lm_bits_per_token", "mix_rate"]
    assert out.count() == 0


def test_web_curation_zero_survivors_returns_empty(spark):
    """The original guard (zero rows past the filters) still holds."""
    from featurewiz_spark.plans.pipeline import web_curation_pipeline

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "delta epsilon zeta", "fr")],
        "doc_id: long, text: string, lang: string",
    )
    bench = spark.createDataFrame([("x",)], "text: string")
    out = web_curation_pipeline(docs, bench, lm_threshold=-1.0)
    assert out.columns == ["doc_id", "lang", "lm_bits_per_token", "mix_rate"]
    assert out.count() == 0


# ------------------------------------------------------------------
# ADVICE 3: dedup_by_canonical_url clash + NULL order_col
# ------------------------------------------------------------------


def test_url_dedup_n_fetches_clash_raises(spark):
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        [(1, "https://a.example.com/", 1, 9)],
        "doc_id: long, url: string, fetch_seq: long, n_fetches: long",
    )
    with pytest.raises(ValueError, match="n_fetches"):
        dedup_by_canonical_url(df)


def test_url_dedup_null_order_loses_to_nonnull(spark):
    """Pins the documented NULL semantics: a NULL order_col sorts
    before every non-null value in Spark's struct ordering, so the
    NULL-order fetch only survives when ALL fetches have NULL order."""
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        [
            (9, "https://a.example.com/x", None),  # NULL order, larger id
            (2, "https://a.example.com/x", 5),
            (3, "https://b.example.com/y", None),  # all-NULL group
            (1, "https://b.example.com/y", None),
        ],
        "doc_id: long, url: string, fetch_seq: long",
    )
    out = {r["url_canon"]: r for r in dedup_by_canonical_url(df).collect()}
    assert out["https://a.example.com/x"]["doc_id"] == 2
    assert out["https://b.example.com/y"]["doc_id"] == 3  # id tie-break


# ------------------------------------------------------------------
# ADVICE 4: snapshot_churn tie-break
# ------------------------------------------------------------------


def test_snapshot_churn_tiebreak_matches_mirror(spark, duck, tmp_path):
    """Duplicate (entity, version) pairs: with tiebreak_col the
    previous-snapshot choice is pinned and Spark == DuckDB exactly."""
    from featurewiz_spark.text.segments import snapshot_churn, snapshot_churn_sql

    rows = [
        (i, i % 3, (i // 3) % 2,  # versions repeat within an entity
         " ".join(f"w{(i * 7 + j) % 11}" for j in range(i % 5 + 1)))
        for i in range(36)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, entity: long, version: long, text: string"
    )
    p = str(tmp_path / "snaps.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW snaps AS SELECT * FROM '{p}/*.parquet'")
    cols = ["doc_id", "entity", "version",
            "churn_added", "churn_removed", "churn_jaccard"]
    spark_rows = sorted(
        map(tuple,
            snapshot_churn(df, "entity", "version", tiebreak_col="doc_id")
            .select(*cols).collect())
    )
    sql = snapshot_churn_sql("snaps", "entity", "version",
                             tiebreak_col="doc_id")
    duck_rows = sorted(map(tuple, duck.sql(
        f"SELECT {', '.join(cols)} FROM ({sql})"
    ).fetchall()))
    assert spark_rows == duck_rows


# ------------------------------------------------------------------
# VERDICT 1: brute_force_topk driver-collect guard
# ------------------------------------------------------------------


def _vec_df(spark, n, dim=4):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 3) % 7).cast("float")
                  for i in range(dim)]).alias("embedding"),
    )


def test_brute_force_topk_guard_raises(spark):
    from featurewiz_spark.operators.similarity import brute_force_topk

    df = _vec_df(spark, 50)
    with pytest.raises(ValueError, match="brute_force_topk_blocked"):
        brute_force_topk(df, k=1, max_corpus_rows=10)


def test_brute_force_topk_guard_allows_and_disables(spark):
    from featurewiz_spark.operators.similarity import brute_force_topk

    df = _vec_df(spark, 20)
    under = brute_force_topk(df, k=1, max_corpus_rows=20)
    forced = brute_force_topk(df, k=1, max_corpus_rows=None)
    assert sorted(map(tuple, under.collect())) == sorted(
        map(tuple, forced.collect())
    )


# ------------------------------------------------------------------
# r5: real AVI video decode (pure-stdlib demux + numpy DIB frames)
# ------------------------------------------------------------------


def _write_avi_rgb24(frames, w, h, compression=b"\x00\x00\x00\x00"):
    """Minimal AVI writer (test fixture only): RIFF → hdrl(avih, strl
    (strh 'vids', strf BITMAPINFOHEADER)) → movi with '00db' chunks of
    bottom-up 4-byte-padded BGR rows — the layout _parse_avi demuxes."""
    import struct

    import numpy as np

    stride = (w * 3 + 3) & ~3

    def chunk(fcc, data):
        pad = b"\x00" if len(data) & 1 else b""
        return fcc + struct.pack("<I", len(data)) + data + pad

    def lst(t, data):
        return chunk(b"LIST", t + data)

    def enc(a):
        bgr = np.asarray(a, dtype=np.uint8)[::-1, :, ::-1]
        return b"".join(
            r.tobytes() + b"\x00" * (stride - w * 3) for r in bgr
        )

    avih = struct.pack("<14I", 100000, 0, 0, 0, len(frames), 0, 1, 0,
                       w, h, 0, 0, 0, 0)
    strh = (b"vids" + b"DIB " +
            struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, 10, 0,
                        len(frames), 0, 0, 0) +
            struct.pack("<4H", 0, 0, w, h))
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, compression,
                       stride * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", enc(f)) for f in frames))
    body = hdrl + movi
    return b"RIFF" + __import__("struct").pack("<I", 4 + len(body)) + b"AVI " + body


def test_avi_demux_decodes_real_frames(spark):
    """Known-answer round trip: solid-color frames come back with exact
    per-channel means, bottom-up/BGR/stride-padding undone (w=3 forces
    a padded stride), every_n sampling honored."""
    import numpy as np

    from featurewiz_spark.text.multimodal import sample_video_frames

    w, h, nf = 3, 2, 5
    frames = [np.full((h, w, 3), [10 * i, 5, 200], dtype=np.uint8)
              for i in range(nf)]
    avi = _write_avi_rgb24(frames, w, h)
    df = spark.createDataFrame([(1, bytearray(avi))],
                               "media_id long, content binary")
    got = {r["frame_idx"]: r for r in
           sample_video_frames(df, every_n=2).collect()}
    assert sorted(got) == [0, 2, 4]
    for fi, r in got.items():
        assert r["decode_error"] is None
        vec = r["features"]
        assert vec[:2] == [float(w), float(h)]
        assert vec[2:5] == [10.0 * fi, 5.0, 200.0]  # mean R, G, B
        gray = (10.0 * fi + 5.0 + 200.0) / 3
        assert vec[5] == 0.0 and vec[6] == vec[7] == gray


def test_avi_decoder_poison_and_stub_fallback(spark):
    """decoder='avi' on a non-AVI payload → ONE poison row; decoder
    'auto' on the same payload must keep the byte-stride stub contract
    (identical rows to decoder='stub')."""
    from featurewiz_spark.text.multimodal import sample_video_frames

    blob = bytes(range(256)) * 2
    df = spark.createDataFrame([(7, bytearray(blob))],
                               "media_id long, content binary")
    poison = sample_video_frames(df, every_n=2, decoder="avi").collect()
    assert len(poison) == 1 and poison[0]["frame_idx"] == -1
    assert "RIFF" in poison[0]["decode_error"]

    auto = sorted(map(tuple, sample_video_frames(df, every_n=2).collect()))
    stub = sorted(map(tuple,
                      sample_video_frames(df, every_n=2,
                                          decoder="stub").collect()))
    assert auto == stub and len(auto) > 1


def test_avi_mjpg_gated_on_pil(spark):
    """MJPG-compressed AVI: without Pillow the sampled frame raises the
    NotImplementedError gate and becomes a poison row pointing at
    Pillow; with Pillow it would decode (skip the poison assert)."""
    import numpy as np

    from featurewiz_spark.text.multimodal import HAS_PIL, sample_video_frames

    frames = [np.zeros((2, 2, 3), dtype=np.uint8)]
    avi = _write_avi_rgb24(frames, 2, 2, compression=b"MJPG")
    df = spark.createDataFrame([(9, bytearray(avi))],
                               "media_id long, content binary")
    rows = sample_video_frames(df, decoder="avi").collect()
    if not HAS_PIL:
        assert len(rows) == 1 and rows[0]["frame_idx"] == -1
        assert "Pillow" in rows[0]["decode_error"]


# ------------------------------------------------------------------
# r5: xgboost parity harness gate
# ------------------------------------------------------------------


def test_xgb_parity_gate(monkeypatch):
    """Without xgboost the full-parity mode must exit 3 with the gate
    message BEFORE any Spark work (the committed BENCH/XGB_PARITY.md
    records the self-test + the run command for hosts that have it);
    with xgboost installed this gate is vacuous — skip."""
    from featurewiz_spark.selection.gbt import HAS_XGBOOST

    if HAS_XGBOOST:
        pytest.skip("xgboost installed: gate not reachable")
    import tools.xgb_parity as xp

    monkeypatch.setattr("sys.argv", ["xgb_parity.py"])
    assert xp.main() == 3


def test_facade_correlation_types_kendall(spark):
    """The facade exposes the reference's correlation_types knob
    (sulov_method.py:107-136): a kendall-inclusive list must knock out
    a monotone-nonlinear duplicate that pearson alone keeps."""
    import numpy as np
    import pandas as pd

    from featurewiz_spark.plans.facade import FeatureWizSpark

    rng = np.random.default_rng(8)
    n = 2000
    x1 = rng.normal(size=n)
    pdf = pd.DataFrame({
        "x1": x1,
        "x1_mono": np.exp(3.0 * x1),
        "x3": rng.normal(size=n),
        "y": 3 * x1 + rng.normal(scale=0.1, size=n),
    })
    df = spark.createDataFrame(pdf)

    fw_p = FeatureWizSpark(skip_ranking=True, correlation_types="pearson")
    fw_p.fit_transform(df, "y")
    assert "x1_mono" in fw_p.features

    fw_k = FeatureWizSpark(
        skip_ranking=True, correlation_types=["pearson", "kendall"]
    )
    fw_k.fit_transform(df, "y")
    assert "x1" in fw_k.features and "x1_mono" not in fw_k.features


def test_session_keeps_small_python_stages_parallel(spark):
    # AQE's default 1MB coalesce floor serialized the Arrow langid kernel
    # to ONE task on a few-MB deduped documents stage (q62 1.9s -> 1.5s at
    # sf0.1 after the fix). get_spark pins a 32k floor; pin it here so a
    # session refactor can't silently bring the serialization back.
    assert (
        spark.conf.get("spark.sql.adaptive.coalescePartitions.minPartitionSize")
        == "32k"
    )


def test_avi_midstream_failure_emits_only_poison(spark):
    """A demuxer that yields frames 0/1 and THEN hits a truncated chunk
    must not ship the partial frames next to the poison row — the
    contract is all-frames XOR one frame_idx=-1 row per media."""
    import numpy as np

    from featurewiz_spark.text.multimodal import sample_video_frames

    w, h = 3, 2
    frames = [np.full((h, w, 3), 7 * (i + 1), dtype=np.uint8) for i in range(3)]
    avi = bytearray(_write_avi_rgb24(frames, w, h))
    avi = avi[:-4]  # truncate the last '00db' chunk mid-frame
    df = spark.createDataFrame(
        [(1, avi), (2, bytearray(_write_avi_rgb24(frames, w, h)))],
        "media_id long, content binary",
    )
    rows = sample_video_frames(df, every_n=1).collect()
    bad = [r for r in rows if r["media_id"] == 1]
    good = [r for r in rows if r["media_id"] == 2]
    assert len(bad) == 1 and bad[0]["frame_idx"] == -1
    assert bad[0]["decode_error"] is not None and bad[0]["features"] is None
    assert sorted(r["frame_idx"] for r in good) == [0, 1, 2]


def test_kendall_binned_string_column_fills_to_zero(spark):
    """Non-numeric strings cast to NULL (not NaN); the fill must send
    them to 0.0, not let a surviving NULL/NaN searchsorted into the TOP
    bin (NaN compares false everywhere -> side='right' returns len)."""
    import pandas as pd

    from featurewiz_spark.selection.sulov import (
        kendall_matrix_binned,
        kendall_matrix_sampled,
    )

    pdf = pd.DataFrame({
        "a": [str(v) for v in range(1, 101)],
        "b": [float(v) for v in range(1, 101)],
    })
    pdf.loc[::7, "a"] = "not-a-number"  # cast('double') -> NULL
    df = spark.createDataFrame(pdf)
    m_binned = kendall_matrix_binned(df, ["a", "b"], n_bins=32)
    m_sampled = kendall_matrix_sampled(df, ["a", "b"], sample_rows=1000)
    # both variants must agree on the same fill (strings -> 0.0); the
    # binned estimate only loses pairs that collapse INTO a bin
    assert abs(m_binned.loc["a", "b"] - m_sampled.loc["a", "b"]) < 0.08
