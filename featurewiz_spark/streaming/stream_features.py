"""Structured Streaming variants of the batch temporal operators.

The reference has NO streaming surface (SURVEY.md §2.12); these are the
engine-side generalizations for unbounded page/event streams:
- gap sessionization (batch W6) → F.session_window + watermark
- rolling aggregates (W4) → tumbling/sliding window aggs + watermark
- calendar features (W1) → pure projections, identical code to batch

Custom stateful op: `stream_asof_enrich` (applyInPandasWithState) — the
streaming generalization of the batch as-of join: each event is enriched
with the latest strictly-earlier value for its key, with per-key state
carrying the last snapshot ACROSS micro-batches (zero temporal leakage:
a row never sees its own or a later value).

These transformations are source-agnostic where Spark allows it: the
windowed aggs accept either a streaming or a batch DataFrame;
stream_asof_enrich requires a streaming one (Spark restriction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from featurewiz_spark.text._norm import WS_CLASS
from pyspark.sql import types as T

from featurewiz_spark.operators.timefeatures import add_calendar_features


def stream_sessionize(
    events: DataFrame,
    keys: list[str],
    ts: str,
    gap: str = "30 minutes",
    watermark: str | None = "1 hour",
    value: str | None = None,
) -> DataFrame:
    """Session windows per entity with a late-data watermark: one row per
    closed session with start/end, event count, and optional value sum."""
    df = events.withWatermark(ts, watermark) if (watermark and events.isStreaming) else events
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value is not None:
        aggs.append(F.sum(value).alias(f"{value}_sum"))
    return (
        df.groupBy(*keys, F.session_window(F.col(ts), gap).alias("session"))
        .agg(*aggs)
        .select(
            *keys,
            F.col("session.start").alias("session_start"),
            F.col("session.end").alias("session_end"),
            "n_events",
            *([f"{value}_sum"] if value is not None else []),
        )
    )


def stream_windowed_agg(
    events: DataFrame,
    keys: list[str],
    ts: str,
    value: str,
    window: str = "10 minutes",
    slide: str | None = None,
    watermark: str | None = "1 hour",
) -> DataFrame:
    """Tumbling (or sliding) windowed aggregates with watermarked late
    data — the streaming analog of rolling_agg (W4)."""
    df = events.withWatermark(ts, watermark) if (watermark and events.isStreaming) else events
    win = F.window(F.col(ts), window, slide) if slide else F.window(F.col(ts), window)
    return (
        df.groupBy(*keys, win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value).alias(f"{value}_sum"),
            F.avg(value).alias(f"{value}_avg"),
        )
        .select(
            *keys,
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n",
            f"{value}_sum",
            f"{value}_avg",
        )
    )


def stream_calendar_features(events: DataFrame, ts: str) -> DataFrame:
    """W1 projections work unchanged on streams (stateless)."""
    return add_calendar_features(events, ts, crosses=False)


def stream_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts: str = "ts",
    watermark: str = "1 hour",
    normalize: bool = True,
) -> DataFrame:
    """Streaming exact dedup for continuous training-data ingest: emit
    each document whose (normalized) content hash has not been seen
    within the watermark horizon — `dropDuplicatesWithinWatermark` keys
    state on the md5 content hash, and Spark evicts hash state once the
    watermark passes, so state is bounded by the dedup horizon instead
    of growing with the corpus (the batch `exact_dedup` handles
    full-corpus history; this op handles the firehose in front of it).
    On a batch DataFrame it degrades to a plain dropDuplicates on the
    same hash — same emitted set, no state."""
    t = F.col(text_col)
    if normalize:
        t = F.lower(F.regexp_replace(t, WS_CLASS, " "))
    hashed = docs.withColumn("content_hash", F.md5(t))
    if not hashed.isStreaming:
        return hashed.dropDuplicates(["content_hash"])
    return hashed.withWatermark(ts, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def _three_phase_availablenow(
    spark,
    batch: DataFrame,
    work_dir: str,
    ts: str,
    build,
    sentinel_overrides: dict | None,
    sentinel_times: tuple[str, str],
) -> DataFrame:
    """Shared availableNow protocol (see run_sessionize_availablenow for
    the full why): phase 1 runs the data, phases 2-3 each append one
    far-future sentinel row — append-mode emission uses the PREVIOUS
    batch's watermark, so two sentinel phases guarantee the watermark
    passes every real window/session. `build(stream)` maps the raw
    readStream to the aggregated streaming DataFrame; returns the
    parquet sink read back as a batch DataFrame (sentinel rows still
    included — callers filter per their own output shape)."""
    import os
    import shutil

    schema = batch.schema
    shutil.rmtree(work_dir, ignore_errors=True)
    in_dir = os.path.join(work_dir, "in")
    out_dir = os.path.join(work_dir, "out")
    ck_dir = os.path.join(work_dir, "ck")
    batch.write.mode("overwrite").parquet(in_dir)

    def phase():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            build(stream)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    phase()
    proto = batch.limit(1)
    for st in sentinel_times:
        sent = proto.withColumn(ts, F.lit(st).cast(schema[ts].dataType))
        for c, v in (sentinel_overrides or {}).items():
            sent = sent.withColumn(c, F.lit(v).cast(schema[c].dataType))
        sent.write.mode("append").parquet(in_dir)
        phase()
    return spark.read.parquet(out_dir)


def run_sessionize_availablenow(
    spark,
    source_parquet: str,
    work_dir: str,
    keys: list[str],
    ts: str = "ts",
    gap: str = "30 minutes",
    watermark: str = "1 second",
    sentinel_overrides: dict | None = None,
    sentinel_times: tuple[str, str] = ("2030-01-01 00:00:00",
                                       "2030-01-02 00:00:00"),
) -> DataFrame:
    """Drive `stream_sessionize` end-to-end through a REAL Structured
    Streaming execution (readStream → session_window+watermark → append
    parquet sink) over a static parquet table, and return the sink as a
    batch DataFrame — deterministically equal to the batch gap-
    sessionization of the same data, which is what makes the streaming
    path ORACLE-CHECKABLE (the driver can only verify batch SQL).

    Protocol — three availableNow phases against one checkpoint:
      1. the source data (any internal batching; in append mode a
         session is only emitted once the watermark passes its end, and
         the watermark available to batch N is computed from batch N-1,
         so a single-batch phase emits nothing yet);
      2. one far-future sentinel row → this phase's batch still runs at
         the data-derived watermark; its commit advances the watermark
         past every real event;
      3. a second, later sentinel row → this phase's batch runs WITH
         the sentinel-advanced watermark, which is beyond every real
         session's end, so every remaining real session is emitted.
    No reliance on file listing order or maxFilesPerTrigger: phase
    boundaries are the batch boundaries. Sentinel rows (key overridden
    via `sentinel_overrides`, e.g. {"user_id": -1}) are filtered from
    the returned DataFrame; their own sessions are the only state left
    unemitted, by construction.

    State is O(open sessions per key) and evicted at the watermark —
    the same bounded-state story at 100TB/day ingest; the parquet sink
    plus checkpoint IS the resume mechanism (exactly-once file sink).
    """
    sentinel_overrides = sentinel_overrides or {}
    batch = spark.read.parquet(source_parquet)
    schema = batch.schema
    if batch.limit(1).count() == 0:
        # empty source: the sink would hold only _spark_metadata and
        # the final read would raise 'Unable to infer schema' — clean
        # any stale work_dir from a previous run (the helper's rmtree
        # never executes on this path) and return
        # an empty frame of the output shape instead
        import shutil

        shutil.rmtree(work_dir, ignore_errors=True)
        bt = schema[ts].dataType
        return spark.createDataFrame(
            [],
            T.StructType(
                [schema[k] for k in keys]
                + [
                    T.StructField("session_start", bt),
                    T.StructField("session_end", bt),
                    T.StructField("n_events", T.LongType()),
                ]
            ),
        )
    # withWatermark rejects TIMESTAMP_NTZ: cast to TIMESTAMP inside the
    # stream (exact under a DST-free session timezone — enforced by the
    # SAME guard the batch ops use, so streaming never silently corrupts
    # gaps where batch raises) and cast the emitted session bounds back
    # to NTZ so the result is timezone-independent like the source.
    from featurewiz_spark.operators.windows import _require_utc_for_ntz

    _require_utc_for_ntz(batch, ts, "run_sessionize_availablenow")
    ntz = isinstance(schema[ts].dataType, T.TimestampNTZType)

    def build(stream):
        if ntz:
            stream = stream.withColumn(ts, F.col(ts).cast("timestamp"))
        return stream_sessionize(stream, keys, ts, gap=gap, watermark=watermark)

    out = _three_phase_availablenow(
        spark, batch, work_dir, ts, build, sentinel_overrides, sentinel_times
    )
    if ntz:
        out = out.withColumn(
            "session_start", F.col("session_start").cast("timestamp_ntz")
        ).withColumn("session_end", F.col("session_end").cast("timestamp_ntz"))
    if sentinel_overrides:
        for c, v in sentinel_overrides.items():
            # null-safe: a plain != would also drop NULL-key sessions
            # (the null group is a legitimate session key in batch and
            # oracle). Choosing a sentinel value that cannot collide
            # with real keys is the caller's contract.
            out = out.filter(~F.col(c).eqNullSafe(F.lit(v)))
    else:
        # no overrides: the sentinel rows were cloned from a REAL row,
        # so their key is a real key — without this filter their two
        # fabricated far-future sessions would appear in the result
        # under that key. Each sentinel is its own single-event session
        # (sentinel_times are > gap apart and beyond all real data), so
        # session_start identifies them exactly. Caveat: a real session
        # starting at precisely a sentinel time would be dropped too —
        # pass sentinel_overrides when sentinel_times could collide
        # with the data's range.
        st_type = schema[ts].dataType
        for stime in sentinel_times:
            out = out.filter(
                ~F.col("session_start").eqNullSafe(F.lit(stime).cast(st_type))
            )
    return out


def run_windowed_agg_availablenow(
    spark,
    source_parquet: str,
    work_dir: str,
    keys: list[str],
    ts: str = "ts",
    value: str = "value",
    window: str = "10 minutes",
    watermark: str = "1 second",
    sentinel_overrides: dict | None = None,
    sentinel_times: tuple[str, str] = ("2030-01-01 00:00:00",
                                       "2030-01-02 00:00:00"),
) -> DataFrame:
    """Drive `stream_windowed_agg` (tumbling windows) through a REAL
    Structured Streaming execution over a static parquet table and
    return the sink as a batch DataFrame — equal to the batch tumbling-
    window aggregation of the same events, which makes the streaming
    path oracle-checkable. Same three-phase availableNow protocol as
    `run_sessionize_availablenow` (shared `_three_phase_availablenow`).

    `sentinel_overrides` is REQUIRED here (raise, not silently corrupt:
    the sessionize runner can identify sentinel sessions by their
    start, but a tumbling window containing a sentinel may be harder to
    reason about under caller-chosen windows — an explicit impossible
    key value is the robust contract)."""
    if not sentinel_overrides:
        raise ValueError(
            "run_windowed_agg_availablenow: sentinel_overrides is "
            "required (e.g. {'user_id': -1}) — the two fabricated "
            "far-future sentinel rows are filtered by key"
        )
    batch = spark.read.parquet(source_parquet)
    schema = batch.schema
    if batch.limit(1).count() == 0:
        import shutil

        shutil.rmtree(work_dir, ignore_errors=True)
        bt = schema[ts].dataType
        # derive the agg result types from the ENGINE on the (empty)
        # frame — hardcoding DoubleType made the empty-source schema
        # disagree with the non-empty one for integral value columns
        # (sum(long) is bigint), breaking cross-run unions
        agg_t = batch.select(
            F.sum(F.col(value)).alias("s"), F.avg(F.col(value)).alias("a")
        ).schema
        return spark.createDataFrame(
            [],
            T.StructType(
                [schema[k] for k in keys]
                + [
                    T.StructField("window_start", bt),
                    T.StructField("window_end", bt),
                    T.StructField("n", T.LongType()),
                    T.StructField(f"{value}_sum", agg_t["s"].dataType),
                    T.StructField(f"{value}_avg", agg_t["a"].dataType),
                ]
            ),
        )
    from featurewiz_spark.operators.windows import _require_utc_for_ntz

    _require_utc_for_ntz(batch, ts, "run_windowed_agg_availablenow")
    ntz = isinstance(schema[ts].dataType, T.TimestampNTZType)

    def build(stream):
        if ntz:
            stream = stream.withColumn(ts, F.col(ts).cast("timestamp"))
        return stream_windowed_agg(
            stream, keys, ts, value, window=window, watermark=watermark
        )

    out = _three_phase_availablenow(
        spark, batch, work_dir, ts, build, sentinel_overrides, sentinel_times
    )
    if ntz:
        out = out.withColumn(
            "window_start", F.col("window_start").cast("timestamp_ntz")
        ).withColumn("window_end", F.col("window_end").cast("timestamp_ntz"))
    for c, v in sentinel_overrides.items():
        out = out.filter(~F.col(c).eqNullSafe(F.lit(v)))
    return out


def stream_asof_enrich(
    events: DataFrame,
    key: str,
    ts: str,
    value: str,
    out_col: str | None = None,
) -> DataFrame:
    """Streaming point-in-time as-of enrichment (custom stateful op).

    Each incoming event gets ``out_col`` = the latest strictly-earlier
    non-null ``value`` for its ``key`` — the streaming analog of the
    batch asof_join's backward lookup (reference J2/J3 semantics,
    my_encoders.py:1459-1472 / featurewiz.py:1876-1908). Per-key state
    holds only the last seen snapshot value (O(1) state per key — at
    10^9 keys this is a few GB across the cluster, partitioned by key),
    so the lookup survives micro-batch boundaries. Within a batch, rows
    are ordered by event time and each row sees only prior rows — zero
    temporal leakage by construction.

    Assumes per-key event-time ordering across batches (true for replay/
    log-ordered sources); out-of-order refinement would need a ts kept in
    state plus watermark-delayed emission.
    """
    import pandas as pd  # noqa: F401 (Arrow batches arrive as pandas)

    from pyspark.sql.streaming.state import GroupStateTimeout

    out_col = out_col or f"{value}_asof"
    cols = events.columns
    out_schema = T.StructType(
        list(events.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )
    state_schema = T.StructType([T.StructField("last_val", T.DoubleType())])

    def fn(key_, pdf_iter, state):
        import pandas as pd

        last_val = state.get[0] if state.exists else None
        # materialize ALL Arrow chunks and sort ONCE: chunks arrive in
        # shuffle order, and sorting per chunk let a later-ts chunk set
        # last_val before an earlier-ts chunk was processed — future
        # values leaking into "strictly earlier" enrichment (verified
        # with an out-of-order two-chunk batch). Transient memory is one
        # micro-batch of one key — the same bound every grouped-map op
        # carries.
        chunks = [p for p in pdf_iter if len(p)]
        if chunks:
            pdf = (
                pd.concat(chunks, ignore_index=True)
                .sort_values(ts, kind="mergesort")
                .copy()
            )
            prior = pdf[value].astype("float64").ffill().shift(1)
            if last_val is not None:
                prior = prior.fillna(last_val)
            pdf[out_col] = prior
            nonnull = pdf[value].dropna()
            if len(nonnull):
                last_val = float(nonnull.iloc[-1])
            yield pdf[cols + [out_col]]
        if last_val is not None:
            state.update((last_val,))

    return events.groupBy(key).applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_asof_enrich_availablenow(
    spark,
    source_parquet: str,
    work_dir: str,
    key: str = "user_id",
    ts: str = "ts",
    value: str = "value",
) -> DataFrame:
    """Drive `stream_asof_enrich` through a REAL Structured Streaming
    execution (readStream → applyInPandasWithState → append parquet
    sink) over a static parquet table, in TWO availableNow phases split
    at the event-time midpoint — so per-key state genuinely carries the
    last snapshot across a batch boundary — and return the sink as a
    batch DataFrame. Equal to the batch point-in-time backward lookup
    (last strictly-earlier non-null value per key), which makes the
    stateful streaming path oracle-checkable: the enriched values are
    parquet doubles carried through unmodified (no arithmetic), so the
    batch SQL `last_value(value IGNORE NULLS) ... ROWS UNBOUNDED
    PRECEDING TO 1 PRECEDING` matches bit-for-bit.

    The time-split phases respect the operator's documented assumption
    (per-key event-time ordering ACROSS batches): every phase-1 event
    precedes every phase-2 event. No watermark and no sentinels — the
    stateful map emits in the same micro-batch it consumes, nothing
    waits on watermark advancement.

    Determinism contract: rows sharing an exact (key, ts) are enriched
    in arrival order (order-dependent); run on data where (key, ts) is
    unique — true of the driver testdata — or pre-dedup ties first.
    """
    import os
    import shutil

    batch = spark.read.parquet(source_parquet)
    schema = batch.schema
    out_col = f"{value}_asof"
    if batch.limit(1).count() == 0:
        shutil.rmtree(work_dir, ignore_errors=True)
        return spark.createDataFrame(
            [], T.StructType(list(schema.fields)
                             + [T.StructField(out_col, T.DoubleType())])
        )
    shutil.rmtree(work_dir, ignore_errors=True)
    in_dir = os.path.join(work_dir, "in")
    out_dir = os.path.join(work_dir, "out")
    ck_dir = os.path.join(work_dir, "ck")
    lo, hi, n_all, n_ts = batch.agg(
        F.min(ts), F.max(ts), F.count(F.lit(1)), F.count(ts)
    ).first()
    if n_ts < n_all:
        # both phase filters (ts <= mid, ts > mid) are NULL for a NULL
        # event time — the row would silently vanish from the sink
        raise ValueError(
            f"run_asof_enrich_availablenow: {n_all - n_ts} rows have a "
            f"NULL {ts!r} — event-time streaming cannot place them; "
            "filter or impute upstream"
        )
    # literal cast to the COLUMN's type: events parquet is TIMESTAMP_NTZ
    # and an LTZ literal comparison would need an implicit cast
    mid = F.lit(lo + (hi - lo) / 2).cast(schema[ts].dataType)

    def phase():
        stream = spark.readStream.schema(schema).parquet(in_dir)
        q = (
            stream_asof_enrich(stream, key, ts, value, out_col)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    batch.filter(F.col(ts) <= mid).write.mode("overwrite").parquet(in_dir)
    phase()
    batch.filter(F.col(ts) > mid).write.mode("append").parquet(in_dir)
    phase()
    return spark.read.parquet(out_dir)


def run_exact_dedup_availablenow(
    spark,
    source_parquet: str,
    work_dir: str,
    text_col: str = "text",
    event_time: str = "2024-01-01 00:00:00",
) -> DataFrame:
    """Drive `stream_exact_dedup` through a REAL Structured Streaming
    execution over a static parquet table and return the sink as a
    batch DataFrame. ONE availableNow phase suffices here — unlike the
    windowed runners, dropDuplicatesWithinWatermark is a stateful
    FILTER, not an aggregation: first-seen rows are emitted in the same
    micro-batch they arrive in, so nothing waits on the watermark (the
    watermark only EVICTS hash state afterwards).

    The source carries no event-time column, so a literal one is
    injected (`event_time`): with every row at one timestamp the
    watermark never passes it and no state is evicted mid-run — exact
    full-corpus dedup, which is what the batch oracle computes. A real
    ingest pipeline uses its arrival timestamp instead, and eviction
    bounds state by the dedup horizon (the operator's scale story).

    Determinism contract: WHICH duplicate row survives depends on
    micro-batch processing order (not reproducible), but the SET of
    emitted content hashes — and the count per hash, namely one — is a
    pure function of the data. Callers projecting `content_hash` get an
    oracle-checkable result; projecting survivor payload columns gets
    rows-only semantics."""
    import os
    import shutil

    shutil.rmtree(work_dir, ignore_errors=True)
    in_dir = os.path.join(work_dir, "in")
    out_dir = os.path.join(work_dir, "out")
    ck_dir = os.path.join(work_dir, "ck")
    batch = spark.read.parquet(source_parquet)
    if batch.limit(1).count() == 0:
        return spark.createDataFrame(
            [], batch.schema.add("__ingest_ts", T.TimestampType())
            .add("content_hash", T.StringType())
        )
    batch.write.mode("overwrite").parquet(in_dir)
    stream = (
        spark.readStream.schema(batch.schema).parquet(in_dir)
        .withColumn("__ingest_ts", F.lit(event_time).cast("timestamp"))
    )
    dedup = stream_exact_dedup(stream, text_col, ts="__ingest_ts")
    q = (
        dedup.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out_dir)
