"""Lineage/resume + streaming-operator (batch-mode) + multimodal tests."""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="fw_lineage_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _events(spark, n=300):
    rng = np.random.default_rng(3)
    pdf = pd.DataFrame(
        {
            "user": rng.integers(0, 10, n),
            "ts": pd.Timestamp("2024-01-01")
            + pd.to_timedelta(rng.integers(0, 86400, n), unit="s"),
            "v": rng.normal(size=n),
        }
    )
    return spark.createDataFrame(pdf.drop_duplicates(["user", "ts"]))


def test_resume_skips_done_buckets_and_is_identical(spark, tmpdir):
    from featurewiz_spark.plans.lineage import resume_plan, run_resumable, validate_stage

    src = _events(spark)

    calls = []

    def transform(df):
        calls.append(1)
        return df.withColumn("v2", F.col("v") * 2)

    out1 = run_resumable(spark, src, transform, tmpdir, "double", ["user"], n_buckets=8)
    n1 = out1.count()
    assert resume_plan(spark, tmpdir, "double", 8) == []  # all buckets done
    # second run: nothing to do, transform NOT called again
    out2 = run_resumable(spark, src, transform, tmpdir, "double", ["user"], n_buckets=8)
    assert len(calls) == 1
    assert out2.count() == n1
    # manifests validate clean
    assert validate_stage(spark, tmpdir, "double").count() == 0


def test_resume_recomputes_only_missing_buckets(spark, tmpdir):
    from featurewiz_spark.plans.lineage import resume_plan, run_resumable

    src = _events(spark)

    def transform(df):
        return df.withColumn("v2", F.col("v") * 2)

    full = run_resumable(spark, src, transform, tmpdir, "s", ["user"], n_buckets=8)
    expected = {
        (r["user"], r["ts"], round(r["v2"], 9)) for r in full.collect()
    }
    # simulate a crash: delete 2 buckets' manifest rows + data
    man_path = os.path.join(tmpdir, "_manifest", "s")
    man = spark.read.parquet(man_path).filter(~F.col("__bucket").isin([0, 3]))
    man.write.mode("overwrite").parquet(man_path + "_new")
    shutil.rmtree(man_path)
    os.rename(man_path + "_new", man_path)
    for b in (0, 3):
        shutil.rmtree(os.path.join(tmpdir, "s", f"__bucket={b}"), ignore_errors=True)
    assert sorted(resume_plan(spark, tmpdir, "s", 8)) == [0, 3]
    resumed = run_resumable(spark, src, transform, tmpdir, "s", ["user"], n_buckets=8)
    got = {(r["user"], r["ts"], round(r["v2"], 9)) for r in resumed.collect()}
    assert got == expected  # byte-equivalent output after resume


def test_stream_sessionize_batch_semantics(spark):
    from featurewiz_spark.streaming import stream_sessionize

    pdf = pd.DataFrame(
        {
            "user": [1, 1, 1, 2],
            "ts": pd.to_datetime(
                [
                    "2024-01-01 10:00",
                    "2024-01-01 10:10",
                    "2024-01-01 11:30",
                    "2024-01-01 09:00",
                ]
            ),
            "v": [1.0, 2.0, 3.0, 4.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = stream_sessionize(df, ["user"], "ts", gap="30 minutes", value="v").toPandas()
    u1 = out[out.user == 1].sort_values("session_start")
    assert len(u1) == 2  # two sessions (gap > 30min)
    assert u1.iloc[0]["n_events"] == 2
    assert abs(u1.iloc[0]["v_sum"] - 3.0) < 1e-9
    assert u1.iloc[1]["n_events"] == 1


def test_stream_windowed_agg_batch_semantics(spark):
    from featurewiz_spark.streaming import stream_windowed_agg

    pdf = pd.DataFrame(
        {
            "user": [1, 1, 1],
            "ts": pd.to_datetime(
                ["2024-01-01 10:01", "2024-01-01 10:05", "2024-01-01 10:11"]
            ),
            "v": [1.0, 2.0, 4.0],
        }
    )
    df = spark.createDataFrame(pdf)
    out = stream_windowed_agg(df, ["user"], "ts", "v", window="10 minutes").toPandas()
    out = out.sort_values("window_start")
    assert len(out) == 2
    assert out.iloc[0]["n"] == 2 and abs(out.iloc[0]["v_sum"] - 3.0) < 1e-9
    assert out.iloc[1]["n"] == 1 and abs(out.iloc[1]["v_sum"] - 4.0) < 1e-9


def test_multimodal_decode_plumbing(spark):
    from featurewiz_spark.text.multimodal import extract_image_features

    rows = [(1, b"abcdefgh" * 10), (2, b""), (3, bytes(range(64)))]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in extract_image_features(df).collect()}
    assert len(out[1]["features"]) == 8
    assert out[2]["features"] is None  # poison row survives as data
    assert "codec" in out[2]["decode_error"]
    assert out[3]["features"][0] == 64.0  # deterministic fake: length


def test_video_frame_sampling_shape(spark):
    from featurewiz_spark.text.multimodal import sample_video_frames

    rows = [(1, bytes(range(256)) * 4)]  # 1024 bytes → 16 "frames"
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = sample_video_frames(df, every_n=4).toPandas()
    assert (out["media_id"] == 1).all()
    assert list(out["frame_idx"]) == [0, 4, 8, 12]


def _write_stream_file(spark, rows, path):
    pdf = pd.DataFrame(rows, columns=["user", "ts", "v"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(path)


def test_stream_sessionize_true_streaming(spark, tmp_path):
    """END-TO-END Structured Streaming: file-source readStream →
    session_window agg → complete-mode memory sink, equal to the batch
    run of the same transform on the same rows."""
    from featurewiz_spark.streaming import stream_sessionize

    src = str(tmp_path / "in")
    os.makedirs(src)
    rows = [
        (1, "2024-01-01 10:00", 1.0),
        (1, "2024-01-01 10:10", 2.0),
        (1, "2024-01-01 11:30", 3.0),
        (2, "2024-01-01 09:00", 4.0),
    ]
    _write_stream_file(spark, rows[:2], os.path.join(src, "a"))
    _write_stream_file(spark, rows[2:], os.path.join(src, "b"))

    schema = "user bigint, ts timestamp, v double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    sess = stream_sessionize(stream, ["user"], "ts", gap="30 minutes",
                             watermark="2 hours", value="v")
    q = (
        sess.writeStream.format("memory")
        .queryName("sess_complete")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user"], str(r["session_start"]), r["n_events"], r["v_sum"])
        for r in spark.sql("select * from sess_complete").collect()
    }
    batch_df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user", "ts", "v"]).assign(
            ts=lambda d: pd.to_datetime(d.ts)
        )
    )
    want = {
        (r["user"], str(r["session_start"]), r["n_events"], r["v_sum"])
        for r in stream_sessionize(
            batch_df, ["user"], "ts", gap="30 minutes", value="v"
        ).collect()
    }
    assert got == want and len(got) == 3


def test_stream_watermark_drops_late_event(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: an event
    arriving after the watermark passed its window is DROPPED — the
    closed window emits once, without it. Single-file micro-batches with
    forced mtime ordering make watermark progression deterministic.
    NOTE (measured): Spark's late-INPUT filter uses the previous batch's
    final watermark, one batch behind state eviction — so the late row
    must arrive >=2 batches after the watermark passed its window to be
    provably dropped (one batch after, it silently re-enters state)."""
    import time as _time

    from featurewiz_spark.streaming import stream_windowed_agg

    src = str(tmp_path / "in")
    os.makedirs(src)
    batches = [
        [(1, "2024-01-01 10:01", 1.0), (1, "2024-01-01 10:05", 2.0)],
        [(1, "2024-01-01 10:40", 8.0)],   # end of batch: watermark → 10:30
        [(1, "2024-01-01 10:50", 16.0)],  # 10:00-window evicted+emitted here
        [(1, "2024-01-01 10:02", 99.0),   # late: filter wm 10:40 > window end
         (1, "2024-01-01 11:20", 32.0)],
    ]
    now = _time.time()
    for i, b in enumerate(batches):
        p = os.path.join(src, f"b{i}")
        _write_stream_file(spark, b, p)
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("user bigint, ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .option("latestFirst", "false")
        .parquet(src + "/*")
    )
    agg = stream_windowed_agg(stream, ["user"], "ts", "v",
                              window="10 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_append")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from wm_append").collect()
    emitted = [
        (r["n"], r["v_sum"])
        for r in rows
        if str(r["window_start"]) == "2024-01-01 10:00:00"
    ]
    # the 10:00 window closed ONCE with 2 events; the late 99.0 never
    # joined it (and never re-opened it as a duplicate emission)
    assert emitted == [(2, 3.0)]
    # the unclosed trailing 11:20 window is still in state, not emitted
    assert all(str(r["window_start"]) != "2024-01-01 11:20:00" for r in rows)


def test_stream_asof_enrich_state_across_batches(spark, tmp_path):
    """Custom stateful streaming op (applyInPandasWithState): events in
    micro-batch 2 must see the latest snapshot from micro-batch 1 via
    per-key state — and never their own or a later value (no leakage)."""
    import time as _time

    from featurewiz_spark.streaming import stream_asof_enrich

    src = str(tmp_path / "in")
    os.makedirs(src)
    batches = [
        [(1, "2024-01-01 10:00", 1.0), (1, "2024-01-01 10:05", 2.0),
         (2, "2024-01-01 10:01", 7.0)],
        [(1, "2024-01-01 10:20", 5.0),   # must see 2.0 (state from batch 1)
         (2, "2024-01-01 10:25", 9.0),   # must see 7.0
         (3, "2024-01-01 10:30", 4.0)],  # new key: no prior → null
    ]
    now = _time.time()
    for i, b in enumerate(batches):
        p = os.path.join(src, f"b{i}")
        _write_stream_file(spark, b, p)
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("user bigint, ts timestamp, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    enriched = stream_asof_enrich(stream, "user", "ts", "v")
    q = (
        enriched.writeStream.format("memory")
        .queryName("asof_state")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user"], str(r["ts"])): r["v_asof"]
        for r in spark.sql("select * from asof_state").collect()
    }
    assert got[(1, "2024-01-01 10:00:00")] is None       # nothing earlier
    assert got[(1, "2024-01-01 10:05:00")] == 1.0        # within-batch prior
    assert got[(1, "2024-01-01 10:20:00")] == 2.0        # carried via state
    assert got[(2, "2024-01-01 10:25:00")] == 7.0        # per-key isolation
    assert got[(3, "2024-01-01 10:30:00")] is None       # unseen key


def test_run_asof_enrich_availablenow_matches_batch(spark, tmp_path):
    """The q78 runner: a real two-phase readStream execution of
    stream_asof_enrich must equal the batch point-in-time backward
    lookup, and the midpoint split must be non-degenerate (both phases
    carry rows) so per-key state genuinely crosses a batch boundary."""
    from pyspark.sql import Window

    from featurewiz_spark.streaming.stream_features import (
        run_asof_enrich_availablenow,
    )

    src = "/root/testdata/sf0.001/events.parquet"
    out = run_asof_enrich_availablenow(
        spark, src, str(tmp_path / "wk"), key="user_id", ts="ts", value="value"
    )
    events = spark.read.parquet(src)
    lo, hi = events.agg(F.min("ts"), F.max("ts")).first()
    mid = lo + (hi - lo) / 2
    n_lo = events.filter(F.col("ts") <= F.lit(mid).cast("timestamp_ntz")).count()
    assert 0 < n_lo < events.count(), "midpoint split is degenerate"

    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    expected = events.select(
        "event_id",
        F.last("value", ignorenulls=True).over(w).alias("value_asof"),
    )
    got = {r["event_id"]: r["value_asof"]
           for r in out.select("event_id", "value_asof").collect()}
    exp = {r["event_id"]: r["value_asof"] for r in expected.collect()}
    assert got == exp
    assert sum(v is None for v in got.values()) < len(got)


def test_stream_exact_dedup_across_batches(spark, tmp_path):
    """Streaming dedup keyed on content hash: a duplicate arriving in a
    LATER micro-batch (within the watermark horizon) must be dropped;
    whitespace/case variants of the same text share a hash. Batch-mode
    degradation keeps the same emitted set via plain dropDuplicates."""
    import time as _time

    from featurewiz_spark.streaming import stream_exact_dedup

    src = str(tmp_path / "docs_in")
    os.makedirs(src)
    batches = [
        [(1, "2024-01-01 10:00", "hello   world"),
         (2, "2024-01-01 10:01", "fresh content one")],
        [(3, "2024-01-01 10:10", "Hello world"),       # dup of doc 1 (norm)
         (4, "2024-01-01 10:11", "fresh content two")],
    ]
    now = _time.time()
    for i, b in enumerate(batches):
        p = os.path.join(src, f"b{i}")
        spark.createDataFrame(
            [(d, ts, t) for d, ts, t in b],
            "doc_id bigint, ts_s string, text string",
        ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s").write.parquet(p)
        for root, _, files in os.walk(p):
            for fn in files:
                os.utime(os.path.join(root, fn), (now + i * 10, now + i * 10))

    stream = (
        spark.readStream.schema("doc_id bigint, text string, ts timestamp")
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/*")
    )
    dd = stream_exact_dedup(stream, "text", "ts", watermark="1 hour")
    q = (
        dd.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    kept = sorted(
        r["doc_id"] for r in spark.sql("select * from dedup_stream").collect()
    )
    assert kept == [1, 2, 4]  # doc 3 deduped against batch-1 state

    # batch-mode degradation: same distinct content set
    batch_df = spark.createDataFrame(
        [(1, "hello   world"), (3, "Hello world"), (4, "fresh content two")],
        "doc_id bigint, text string",
    )
    out = stream_exact_dedup(batch_df, "text", "ts")
    assert out.select("content_hash").distinct().count() == out.count() == 2
