from featurewiz_spark.text.charset import detect_charset, transcode_to_utf8
from featurewiz_spark.text.extract import extract_text, extract_text_udf
from featurewiz_spark.text.langid import add_language_id_ngram
from featurewiz_spark.text.links import extract_links
from featurewiz_spark.text.robots import apply_robots, parse_robots
from featurewiz_spark.text.stats import (
    add_fingerprint,
    add_language_id,
    add_language_id_stopword,
    add_quality_features,
    add_token_counts,
)

__all__ = [
    "extract_text",
    "extract_text_udf",
    "add_quality_features",
    "add_token_counts",
    "add_language_id",
    "add_language_id_ngram",
    "add_language_id_stopword",
    "add_fingerprint",
    "detect_charset",
    "transcode_to_utf8",
    "extract_links",
    "parse_robots",
    "apply_robots",
]
