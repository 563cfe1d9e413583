from featurewiz_spark.sources.pages import generate_pages, pages_schema
from featurewiz_spark.sources.readers import load_table, read_any
from featurewiz_spark.sources.cdx import (
    fetch_warc_records,
    parse_cdx_lines,
    plan_incremental_fetch,
    read_cdx,
    stream_cdx,
)
from featurewiz_spark.sources.warc import read_warc, warc_to_pages, write_warc

__all__ = [
    "generate_pages",
    "pages_schema",
    "load_table",
    "read_any",
    "read_warc",
    "warc_to_pages",
    "read_cdx",
    "parse_cdx_lines",
    "fetch_warc_records",
    "write_warc",
    "plan_incremental_fetch",
    "stream_cdx",
]
