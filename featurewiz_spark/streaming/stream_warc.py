"""Streaming WARC ingestion: a crawl landing directory → continuous
pages stream.

The batch front door (sources/warc.py) reads a fixed file set; real
crawl operations DROP new segment files into a bucket continuously.
`stream_warc` turns that landing directory into an unbounded
DataFrame of parsed WARC records using Spark's `binaryFile` streaming
file source (exactly-once file tracking via the streaming file index +
checkpoint), and `stream_warc_pages` composes the same pinned
extractor + language ID the batch path uses — the parse and the
downstream transformations are literally shared code, so batch/stream
parity is structural, not re-implemented.

Scale/memory contract: the binaryFile source materializes each
segment's bytes as ONE row (`content`), so task memory is O(largest
file), not O(batch) — the standard CC segment is ~1 GB, which bounds
executor memory per core; set `maxFilesPerTrigger` (exposed here) to
bound a micro-batch. The parse itself streams over a BytesIO view —
no second copy beyond the Arrow batch. This is the one place the
engine accepts an O(file) row by design: a gzip member stream is not
splittable, and the streaming source's file-tracking (what makes
ingestion exactly-once and resumable) operates at file granularity
anyway.
"""

from __future__ import annotations

import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from featurewiz_spark.sources.warc import (
    _DEFAULT_TYPES,
    WARC_SCHEMA,
    _parse_warc_date,
    _split_http_payload,
    iter_warc_records,
)

_BINARYFILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("modificationTime", T.TimestampType()),
        T.StructField("length", T.LongType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def stream_warc(
    spark: SparkSession,
    landing_dir: str,
    record_types: tuple[str, ...] = _DEFAULT_TYPES,
    max_files_per_trigger: int | None = None,
    glob_filter: str = "*.warc*",
    strict: bool = False,
) -> DataFrame:
    """Unbounded WARC record stream over a landing directory.

    Every file that appears under ``landing_dir`` (matching
    ``glob_filter``) is parsed exactly once per checkpointed query —
    the streaming file source tracks seen files. Output schema is the
    batch reader's WARC_SCHEMA, so every downstream batch
    transformation applies unchanged.
    """
    reader = spark.readStream.format("binaryFile").schema(_BINARYFILE_SCHEMA)
    reader = reader.option("pathGlobFilter", glob_filter)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    files = reader.load(landing_dir).select("path", "content")
    wanted = {t.lower() for t in record_types}

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: list[tuple] = []
            for path, content in zip(pdf["path"], pdf["content"]):
                blob = bytes(content)
                if path.endswith(".gz"):
                    import gzip

                    stream = gzip.GzipFile(fileobj=io.BytesIO(blob))
                else:
                    stream = io.BytesIO(blob)
                for rec in iter_warc_records(stream, strict=strict):
                    h = rec["headers"]
                    if h.get("warc-type", "").lower() not in wanted:
                        continue
                    body, ctype, status = _split_http_payload(rec["block"])
                    rows.append(
                        (
                            h.get("warc-target-uri"),
                            _parse_warc_date(h.get("warc-date")),
                            body,
                            h.get("warc-type"),
                            ctype or h.get("content-type"),
                            h.get("warc-record-id"),
                            len(body),
                            status,
                            path,
                        )
                    )
            yield pd.DataFrame(rows, columns=WARC_SCHEMA.fieldNames())

    return files.mapInPandas(_parse, WARC_SCHEMA)


def stream_warc_pages(
    spark: SparkSession,
    landing_dir: str,
    html_only: bool = True,
    langid_impl: str = "pandas",
    charset_aware: bool = False,
    **stream_kwargs,
) -> DataFrame:
    """Streaming twin of sources.warc.warc_to_pages: landing dir →
    canonical ``(url, warc_ts, html, text, lang)`` pages stream, ready
    for ``writeStream`` into the Iceberg lakehouse (append mode; the
    days(warc_ts)/bucket(url) layout accepts streaming appends).
    Identical extractor/langid code as batch — parity is structural."""
    from featurewiz_spark.text.extract import extract_text
    from featurewiz_spark.text.langid import add_language_id_ngram

    df = stream_warc(spark, landing_dir, **stream_kwargs)
    if charset_aware:
        from featurewiz_spark.text.charset import transcode_to_utf8

        df = transcode_to_utf8(df, "html", "content_type", charset_out=None)
    if html_only:
        df = df.where(
            F.col("url").isNotNull()
            & F.col("warc_ts").isNotNull()
            & F.lower(F.coalesce(F.col("content_type"), F.lit(""))).startswith(
                "text/html"
            )
            # non-response records carry no status; for responses keep
            # only 200s (the standard curation gate)
            & (F.col("http_status").isNull() | (F.col("http_status") == 200))
        )
    df = extract_text(df, html_col="html", out_col="text")
    df = add_language_id_ngram(df, text_col="text", out_col="lang", impl=langid_impl)
    return df.select("url", "warc_ts", "html", "text", "lang")
