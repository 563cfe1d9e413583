"""WARC ingestion — the real front door for Common-Crawl-style pages.

BASELINE.json's north star is an Iceberg lakehouse of Common-Crawl-style
web pages; Common Crawl ships WARC/1.x files (ISO 28500): a stream of
records, each a CRLF-terminated header block + Content-Length payload
bytes + CRLFCRLF. ``read_warc`` turns a set of WARC files into a
DataFrame and ``warc_to_pages`` composes it with the pinned extractor +
language ID into the canonical pages schema
``(url, warc_ts, html, text, lang)`` ready for
:func:`featurewiz_spark.sources.table_io.write_table`.

Scale design (file-granular parallelism, the archive-standard pattern):

- gzip WARCs are a concatenation of independently-gzipped members and
  are NOT splittable, so the parallel unit is the FILE. A Common Crawl
  snapshot is ~64k segment files of ~1 GB each — far more files than
  executors, so file-granularity saturates any cluster.
- paths are distributed with ``repartition(n, path)`` and each task
  STREAMS its files through a stdlib parser inside ``mapInPandas``,
  yielding bounded Arrow batches — task memory is O(batch), never
  O(file). No driver-side materialization at any point.
- the parse is pure stdlib (gzip + bytes); Python cost is one linear
  scan per byte of payload, amortized across the Arrow batch. There is
  no JVM WARC codec to prefer here — this is the legitimate
  mapInPandas case (format Spark cannot express declaratively).
- executors must see the files (shared/object storage or local
  replicas) — the same contract as every Spark binary-file source.

Reference scope note: the reference (featurewiz) has no archive
ingestion at all — this operator exists for the north star's data
model, cited to the WARC spec rather than a reference file.
"""

from __future__ import annotations

import io
from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("warc_type", T.StringType(), True),
        T.StructField("content_type", T.StringType(), True),
        T.StructField("record_id", T.StringType(), True),
        T.StructField("content_length", T.LongType(), True),
        T.StructField("http_status", T.IntegerType(), True),
        T.StructField("source_file", T.StringType(), True),
    ]
)

# WARC record types whose payload is (or wraps) the captured content
_DEFAULT_TYPES = ("response", "resource", "conversion")


def _open_stream(path: str):
    """Open a WARC file for streaming. Paths with a URI scheme
    (s3://, gs://, hdfs://, file://) go through pyarrow.fs with
    compression=None — pyarrow would otherwise auto-decompress by
    extension with Arrow's codec, and stdlib gzip's multi-member
    semantics (one member per record, the Common Crawl layout) is the
    contract here. gzip members are handled transparently (Python's
    gzip reads concatenated members)."""
    if "://" in path:
        import pyarrow.fs as pafs

        fs, rel = pafs.FileSystem.from_uri(path)
        raw = fs.open_input_stream(rel, compression=None)
        if not path.endswith(".gz"):
            # NativeFile has no readline; BufferedReader supplies it
            raw = io.BufferedReader(raw)
    else:
        raw = open(path, "rb")
    if path.endswith(".gz"):
        import gzip

        return gzip.GzipFile(fileobj=raw)
    return raw


def _parse_headers(lines: list[bytes]) -> dict[str, str]:
    headers: dict[str, str] = {}
    last: str | None = None
    for ln in lines:
        if last is not None and ln[:1] in (b" ", b"\t"):
            # RFC folded continuation line — append to previous value
            headers[last] += " " + ln.strip().decode("latin-1", "replace")
            continue
        k, sep, v = ln.partition(b":")
        if sep:
            last = k.strip().lower().decode("latin-1")
            headers[last] = v.strip().decode("latin-1", "replace")
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer-encoded body. Malformed
    chunking returns the raw body unchanged (capture fidelity over
    strictness — mirrors warcio's lenient behavior)."""
    out, pos = [], 0
    try:
        while True:
            nl = body.index(b"\r\n", pos)
            size = int(body[pos:nl].split(b";")[0], 16)
            if size == 0:
                break
            start = nl + 2
            out.append(body[start : start + size])
            pos = start + size + 2  # skip chunk CRLF
    except (ValueError, IndexError):
        return body
    return b"".join(out)


def _split_http_payload(block: bytes) -> tuple[bytes, str | None, int | None]:
    """response-record block = raw HTTP response. Returns (body bytes,
    Content-Type, status code). Chunked bodies are dechunked; a block
    that does not start with an HTTP status line is returned whole."""
    if not block.startswith(b"HTTP/"):
        return block, None, None
    # header terminator: CRLFCRLF per spec, bare LFLF from non-compliant
    # servers captured raw (warcio-style leniency). Whichever terminator
    # appears FIRST ends the headers — for compliant responses the first
    # LFLF can only be in the body (CRLFCRLF contains no LFLF), and for
    # bare-LF responses the first CRLFCRLF can only be in the body.
    status: int | None = None
    first_sp = block.find(b" ")
    if 0 < first_sp < 12:
        tok = block[first_sp + 1 : first_sp + 4]
        if tok.isdigit():
            status = int(tok)
    sep_crlf = block.find(b"\r\n\r\n")
    sep_lf = block.find(b"\n\n")
    if sep_crlf < 0 and sep_lf < 0:
        return block, None, status
    if sep_lf < 0 or (0 <= sep_crlf < sep_lf):
        sep, width = sep_crlf, 4
    else:
        sep, width = sep_lf, 2
    http_headers = _parse_headers(
        [ln.rstrip(b"\r") for ln in block[:sep].split(b"\n")[1:]]
    )
    body = block[sep + width :]
    if "chunked" in http_headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return body, http_headers.get("content-type"), status


def iter_warc_records(
    stream: io.BufferedReader, strict: bool = False
) -> Iterator[dict]:
    """Stream WARC records off an open binary stream.

    Yields dicts with keys ``headers`` (lower-cased WARC header map) and
    ``block`` (exactly Content-Length payload bytes). Stops at EOF; a
    malformed record raises when ``strict`` else ends the file's
    iteration (truncated tail files are routine in crawl archives).
    """
    while True:
        # skip inter-record CRLFs to the next version line
        line = stream.readline()
        while line in (b"\r\n", b"\n"):
            line = stream.readline()
        if not line:
            return
        if not line.startswith(b"WARC/"):
            if strict:
                raise ValueError(f"expected WARC version line, got {line[:40]!r}")
            return
        header_lines: list[bytes] = []
        while True:
            ln = stream.readline()
            if not ln:  # EOF mid-header
                if strict:
                    raise ValueError("EOF inside WARC header block")
                return
            if ln in (b"\r\n", b"\n"):
                break
            header_lines.append(ln)
        headers = _parse_headers(header_lines)
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            if strict:
                raise ValueError("WARC record missing Content-Length") from None
            return
        block = stream.read(length)
        if len(block) < length:
            if strict:
                raise ValueError("EOF inside WARC payload")
            return
        yield {"headers": headers, "block": block}


def _parse_warc_date(raw: str | None):
    if not raw:
        return None
    try:
        ts = pd.Timestamp(raw)
    except (ValueError, TypeError, OverflowError):
        # covers pandas OutOfBoundsDatetime/DateParseError (ValueError
        # subclasses) — an unparseable date yields NULL, not a dead task
        return None
    if ts.tzinfo is not None:  # normalize to tz-naive UTC (pages schema)
        ts = ts.tz_convert("UTC").tz_localize(None)
    return ts


def read_warc(
    spark: SparkSession,
    paths: str | Iterable[str],
    record_types: tuple[str, ...] = _DEFAULT_TYPES,
    parallelism: int | None = None,
    batch_rows: int = 512,
    strict: bool = False,
) -> DataFrame:
    """Distributed WARC read → DataFrame(WARC_SCHEMA).

    ``paths``: a glob/directory string (expanded driver-side) or an
    explicit path list. Files are hash-distributed across
    ``parallelism`` tasks (default: one task per file up to the session
    default parallelism); each task streams records and yields Arrow
    batches of ``batch_rows`` — memory stays bounded for arbitrarily
    large archives. ``html`` holds the payload bytes (HTTP headers
    stripped and chunking decoded for response records).
    """
    if isinstance(paths, str):
        if "://" in paths:
            # object-store / hdfs directory: list via pyarrow.fs and
            # keep the scheme on each path for the task-side open
            import pyarrow.fs as pafs

            scheme = paths.split("://", 1)[0]
            fs, rel = pafs.FileSystem.from_uri(paths)
            info = fs.get_file_info(rel)
            if info.type == pafs.FileType.Directory:
                expanded = sorted(
                    f"{scheme}://{i.path}"
                    for i in fs.get_file_info(
                        pafs.FileSelector(rel, recursive=False)
                    )
                    if i.is_file and ".warc" in i.base_name
                )
            elif info.type == pafs.FileType.File:
                expanded = [paths]
            else:
                expanded = []
        else:
            import glob as _glob
            import os as _os

            expanded = (
                sorted(_glob.glob(_os.path.join(paths, "*.warc*")))
                if _os.path.isdir(paths)
                else sorted(_glob.glob(paths))
            )
        if not expanded:
            raise ValueError(f"no WARC files match {paths!r}")
        paths = expanded
    else:
        paths = list(paths)
        if not paths:
            raise ValueError("read_warc: empty path list")
    wanted = {t.lower() for t in record_types}

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[tuple] = []
        for pdf in batches:
            for path in pdf["path"]:
                with _open_stream(path) as stream:
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
                        if len(rows) >= batch_rows:
                            yield pd.DataFrame(
                                rows, columns=WARC_SCHEMA.fieldNames()
                            )
                            rows = []
        if rows:
            yield pd.DataFrame(rows, columns=WARC_SCHEMA.fieldNames())

    n = parallelism or max(
        1, min(len(paths), spark.sparkContext.defaultParallelism)
    )
    path_df = spark.createDataFrame([(p,) for p in paths], "path string")
    return path_df.repartition(n, "path").mapInPandas(_parse, WARC_SCHEMA)


CDX_LOCATOR_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("filename", T.StringType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("length", T.LongType(), False),
    ]
)


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    content_type: str = "text/html; charset=utf-8",
    prefix: str = "part",
) -> DataFrame:
    """Export a corpus as archive-standard WARC: one gzip member per
    ``response`` record (the Common Crawl layout — every record
    independently sliceable), one segment file per partition, written
    task-side. Returns the CDX locator DataFrame
    ``(url, warc_ts, digest, filename, offset, length)`` — offsets
    recorded AT WRITE TIME, so the result feeds
    :func:`featurewiz_spark.sources.cdx.fetch_warc_records` (and a
    cdx sidecar file) directly. Completes the archive round trip:
    read_warc → curate → write_warc → selective re-fetch.

    Scale: no shuffle — each task streams its partition through gzip
    into ONE segment (repartition upstream to pick the segment count /
    size); memory is O(record). ``out_dir`` must be a directory
    task-writable via local/NFS path or pyarrow.fs URI; distinct
    partition ids make filenames collision-free.
    """
    import gzip
    import hashlib

    sep = "" if out_dir.endswith("/") else "/"

    def _write(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        name = f"{prefix}-{pid:05d}.warc.gz"
        full = out_dir + sep + name
        if "://" in full:
            import pyarrow.fs as pafs

            fs, rel = pafs.FileSystem.from_uri(full)
            handle = fs.open_output_stream(rel, compression=None)
        else:
            handle = open(full, "wb")
        off = 0
        locs: list[tuple] = []
        try:
            for pdf in batches:
                for url, ts, payload in zip(
                    pdf[url_col], pdf[ts_col], pdf[payload_col]
                ):
                    if payload is None:
                        continue
                    body = bytes(payload)
                    # pd.isna, not `is not None`: a NULL timestamp
                    # arrives as pandas NaT in mapInPandas, which
                    # passes an `is not None` check and then
                    # pd.Timestamp(NaT).strftime raises ('NaTType does
                    # not support strftime'), killing the export task —
                    # the epoch fallback below was dead code
                    iso = (
                        "1970-01-01T00:00:00Z"
                        if ts is None or pd.isna(ts)
                        else pd.Timestamp(ts).strftime("%Y-%m-%dT%H:%M:%SZ")
                    )
                    http = (
                        b"HTTP/1.1 200 OK\r\nContent-Type: "
                        + content_type.encode()
                        + b"\r\nContent-Length: "
                        + str(len(body)).encode()
                        + b"\r\n\r\n"
                        + body
                    )
                    digest = hashlib.sha1(body).hexdigest()
                    rec = (
                        f"WARC/1.0\r\nWARC-Type: response\r\n"
                        f"WARC-Date: {iso}\r\n"
                        f"WARC-Target-URI: {url}\r\n"
                        f"WARC-Payload-Digest: sha1:{digest}\r\n"
                        f"Content-Length: {len(http)}\r\n\r\n"
                    ).encode() + http + b"\r\n\r\n"
                    member = gzip.compress(rec)
                    handle.write(member)
                    locs.append(
                        (url,
                         None if ts is None or pd.isna(ts)
                         else pd.Timestamp(ts),
                         f"sha1:{digest}", name, off, len(member))
                    )
                    off += len(member)
        finally:
            handle.close()
        yield pd.DataFrame(
            locs, columns=CDX_LOCATOR_SCHEMA.fieldNames()
        )

    return df.select(url_col, ts_col, payload_col).mapInPandas(
        _write, CDX_LOCATOR_SCHEMA
    )


def warc_to_pages(
    spark: SparkSession,
    paths: str | Iterable[str],
    html_only: bool = True,
    langid_impl: str = "pandas",
    charset_aware: bool = False,
    **read_kwargs,
) -> DataFrame:
    """WARC files → the canonical pages table
    ``(url, warc_ts, html, text, lang)``: read_warc → (optional)
    text/html content-type filter → pinned JVM extractor
    (byte-identical to the Python oracle) → trigram language ID.
    Write the result with table_io.write_table (Iceberg
    ``days(warc_ts)/bucket(url)`` layout) to land the lakehouse the
    north star describes. One linear pass, no shuffle — partitioning
    follows the file distribution of read_warc.

    ``charset_aware=True`` inserts text.charset.transcode_to_utf8
    before extraction (HTTP charset param > early <meta> sniff >
    utf-8): recommended for real crawls, where a large minority of
    pages are legacy-encoded and a blind UTF-8 read yields U+FFFD
    soup. Off by default so the payload column stays byte-identical to
    the archive.
    """
    from featurewiz_spark.text.extract import extract_text
    from featurewiz_spark.text.langid import add_language_id_ngram

    df = read_warc(spark, paths, **read_kwargs)
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
