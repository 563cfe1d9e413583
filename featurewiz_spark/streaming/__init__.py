from featurewiz_spark.streaming.stream_features import (
    stream_asof_enrich,
    stream_exact_dedup,
    stream_calendar_features,
    stream_sessionize,
    stream_windowed_agg,
)
from featurewiz_spark.streaming.stream_warc import stream_warc, stream_warc_pages

__all__ = [
    "stream_sessionize",
    "stream_windowed_agg",
    "stream_calendar_features",
    "stream_asof_enrich",
    "stream_exact_dedup",
    "stream_warc",
    "stream_warc_pages",
]
