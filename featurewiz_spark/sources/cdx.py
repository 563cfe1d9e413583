"""CDX(J) index reader — Common Crawl's WARC lookup sidecar.

Each crawl ships a CDX index: one text line per capture,
``<urlkey> <14-digit timestamp> <json>``, where the JSON carries the
original url, mime, HTTP status, content digest, and the
(filename, offset, length) triple locating the record inside its WARC
segment. Reading it is how a cluster plans selective fetches (only
text/html 200s, only new digests) WITHOUT scanning petabytes of WARC.

Spark-first: the parse is ONE projection over ``spark.read.text`` —
``regexp_extract`` for the three space-delimited parts and
``get_json_object`` for the fields, all whole-stage codegen; the text
source splits large .cdx files by line across tasks (unlike gzip WARC,
CDX is splittable when uncompressed, and .gz CDX files parallelize at
file granularity via Spark's codec). No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# shared with the oracle mirror (RE2+Java compatible)
URLKEY_PAT = r"^(\S+) "
TS_PAT = r"^\S+ (\d{14}) "
JSON_PAT = r"^\S+ \d{14} (\{.*\})\s*$"
CDX_TS_FMT = "yyyyMMddHHmmss"

# JSON field -> (output column, cast type or None)
CDX_FIELDS = [
    ("url", "url", None),
    ("mime", "mime", None),
    ("status", "http_status", "int"),
    ("digest", "digest", None),
    ("length", "length", "bigint"),
    ("offset", "offset", "bigint"),
    ("filename", "filename", None),
]


def parse_cdx_lines(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Parse CDX(J) lines already in a DataFrame column — shared by
    :func:`read_cdx` and any streaming text source."""
    line = F.col(line_col)
    js = F.regexp_extract(line, JSON_PAT, 1)
    cols = [
        F.regexp_extract(line, URLKEY_PAT, 1).alias("urlkey"),
        # try_to_timestamp: ANSI to_timestamp would abort the job on a
        # junk line's empty extract before the urlkey filter applies
        F.try_to_timestamp(
            F.regexp_extract(line, TS_PAT, 1), F.lit(CDX_TS_FMT)
        ).alias("capture_ts"),
    ]
    for field, out, cast in CDX_FIELDS:
        c = F.get_json_object(js, f"$.{field}")
        if cast:
            c = c.cast(cast)
        cols.append(c.alias(out))
    # validity = the full three-part shape (the JSON tail is the
    # discriminating part — any word would match the urlkey pattern);
    # junk headers/trailers vanish identically in both engines
    return (
        df.withColumn("__js", js)
        .where(F.col("__js") != "")
        .select(*cols)
    )


def read_cdx(spark: SparkSession, paths: str | list) -> DataFrame:
    """CDX files → (urlkey, capture_ts, url, mime, http_status, digest,
    length, offset, filename)."""
    text = spark.read.text(paths)
    return parse_cdx_lines(text, "value")


def stream_cdx(spark: SparkSession, landing_dir: str) -> DataFrame:
    """Streaming twin of :func:`read_cdx`: tail a landing directory of
    CDX files with the text file source (exactly-once per checkpoint)
    through the SAME parse projection — e.g. to keep an incremental
    fetch queue current as index shards land."""
    text = (
        spark.readStream.format("text")
        .option("pathGlobFilter", "*.cdx*")
        .load(landing_dir)
    )
    return parse_cdx_lines(text, "value")


def fetch_warc_records(
    locators: DataFrame,
    base_dir: str | None = None,
    filename_col: str = "filename",
    offset_col: str = "offset",
    length_col: str = "length",
    parallelism: int | None = None,
    record_types: tuple[str, ...] | None = None,
    strict: bool = False,
) -> DataFrame:
    """Selective WARC record fetch by CDX locator — the reason the
    index exists: read ONLY the chosen captures' byte ranges instead
    of scanning whole segments.

    Input: a DataFrame of (filename, offset, length) locators (e.g. a
    filtered read_cdx result — 200s only, new digests only). Common
    Crawl writes ONE gzip member per record, so each (offset, length)
    slice is independently decompressable. Output: the batch reader's
    WARC_SCHEMA, one row per fetched record.

    Scale: locators hash-partition by filename; within each Arrow
    batch offsets are read in ascending order from one open handle per
    file — monotone forward seeks, the object-store-friendly pattern
    (spark.sql.execution.arrow.maxRecordsPerBatch bounds how often a
    file reopens across batch boundaries). Task memory is O(largest
    record). URI-scheme paths go
    through pyarrow.fs random-access files.
    """
    import io as _io

    from featurewiz_spark.sources.warc import (
        _DEFAULT_TYPES,
        WARC_SCHEMA,
        _parse_warc_date,
        _split_http_payload,
        iter_warc_records,
    )

    df = locators
    wanted = {t.lower() for t in (record_types or _DEFAULT_TYPES)}

    def _full_path(name: str) -> str:
        if base_dir is None or "://" in name or name.startswith("/"):
            return name
        sep = "" if base_dir.endswith("/") else "/"
        return base_dir + sep + name

    def _open_random(path: str):
        if "://" in path:
            import pyarrow.fs as pafs

            fs, rel = pafs.FileSystem.from_uri(path)
            return fs.open_input_file(rel)  # random-access
        return open(path, "rb")

    def _fetch(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.sort_values([filename_col, offset_col])
            rows: list[tuple] = []
            cur_name, handle = None, None
            try:
                for name, off, ln in zip(
                    pdf[filename_col], pdf[offset_col], pdf[length_col]
                ):
                    path = _full_path(str(name))
                    if path != cur_name:
                        if handle is not None:
                            handle.close()
                        handle = _open_random(path)
                        cur_name = path
                    handle.seek(int(off))
                    blob = handle.read(int(ln))
                    if blob[:2] == b"\x1f\x8b":  # per-record gzip member
                        import gzip

                        blob = gzip.decompress(blob)
                    for rec in iter_warc_records(
                        _io.BytesIO(blob), strict=strict
                    ):
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
            finally:
                if handle is not None:
                    handle.close()
            yield pd.DataFrame(rows, columns=WARC_SCHEMA.fieldNames())

    n = parallelism or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, filename_col).mapInPandas(_fetch, WARC_SCHEMA)


def plan_incremental_fetch(
    cdx: DataFrame,
    seen_digests: DataFrame | None = None,
    digest_col: str = "digest",
    status: int | None = 200,
    mime_prefix: str | None = "text/html",
) -> DataFrame:
    """Incremental crawl processing: reduce a snapshot's CDX to the
    locators actually worth fetching — desired status/mime, content
    digest NOT already in the lakehouse (anti-join against
    ``seen_digests``, a 1-column frame), and ONE locator per new
    digest (the earliest capture by (filename, offset), via min_by —
    no window, map-side partials collapse hot digests). The result
    feeds :func:`fetch_warc_records` directly.
    """
    c = cdx
    if status is not None:
        c = c.where(F.col("http_status") == status)
    if mime_prefix is not None:
        c = c.where(
            F.lower(F.coalesce(F.col("mime"), F.lit(""))).startswith(
                mime_prefix
            )
        )
    c = c.where(F.col(digest_col).isNotNull())
    if seen_digests is not None:
        c = c.join(seen_digests, digest_col, "left_anti")
    # one scalar order key (filename, zero-padded offset): identical
    # lexicographic semantics in every engine — DuckDB's arg_min does
    # not accept struct keys. \x01 separator sorts below any filename
    # character in use.
    order = F.concat(
        F.col("filename"),
        F.lit("\x01"),
        F.lpad(F.col("offset").cast("string"), 19, "0"),
    )
    keep = [f for f in c.columns if f != digest_col]
    return c.groupBy(digest_col).agg(
        *[F.min_by(F.col(f), order).alias(f) for f in keep]
    )


def incremental_fetch_sql(
    cdx_src: str,
    seen_src: str | None,
    columns: list[str],
    digest_col: str = "digest",
    status: int | None = 200,
    mime_prefix: str | None = "text/html",
) -> str:
    """DuckDB mirror: same filters, NOT IN anti-join, arg_min per
    surviving digest with the same (filename, offset) struct order.
    ``columns`` = the non-digest columns to carry (order-insensitive
    compare sorts them anyway)."""
    conds = [f"{digest_col} IS NOT NULL"]
    if status is not None:
        conds.append(f"http_status = {status}")
    if mime_prefix is not None:
        conds.append(
            f"lower(COALESCE(mime, '')) LIKE '{mime_prefix}%'"
        )
    if seen_src is not None:
        conds.append(f"{digest_col} NOT IN (SELECT * FROM {seen_src})")
    okey = "filename || chr(1) || lpad(CAST(\"offset\" AS VARCHAR), 19, '0')"
    cols = ",\n               ".join(
        f'arg_min("{c}", {okey}) AS "{c}"' for c in columns
    )
    return f"""
        SELECT {digest_col},
               {cols}
        FROM {cdx_src}
        WHERE {" AND ".join(conds)}
        GROUP BY {digest_col}
    """


def cdx_sql(lines_src: str, line_col: str = "line") -> str:
    """DuckDB mirror over a (line) relation, generated from the SAME
    patterns/field list. DuckDB regexp_extract + json_extract_string;
    the 14-digit timestamp parses with strptime."""
    def q(p: str) -> str:
        return "'" + p.replace("'", "''") + "'"

    field_sql = []
    for field, out, cast in CDX_FIELDS:
        e = (
            f"json_extract_string(regexp_extract({line_col}, {q(JSON_PAT)},"
            f" 1), '$.{field}')"
        )
        if cast:
            e = f"CAST({e} AS {'INTEGER' if cast == 'int' else 'BIGINT'})"
        field_sql.append(f"{e} AS {out}")
    fields = ",\n               ".join(field_sql)
    return f"""
        SELECT regexp_extract({line_col}, {q(URLKEY_PAT)}, 1) AS urlkey,
               try_strptime(regexp_extract({line_col}, {q(TS_PAT)}, 1),
                        '%Y%m%d%H%M%S') AS capture_ts,
               {fields}
        FROM {lines_src}
        WHERE regexp_extract({line_col}, {q(JSON_PAT)}, 1) <> ''
    """
