"""Deterministic synthetic Common-Crawl-style pages table (FIXTURES.md §A1).

Schema per BASELINE.json input_hint:
    (url string, warc_ts timestamp, html binary, text string, lang string)

Properties engineered into the data:
- Zipf-skewed domains: one hot domain carries ≈10% of rows (exercises
  salting / AQE skew-join handling).
- ~N/5 distinct urls, so every url has a multi-snapshot history for
  as-of joins, lag/lead and sessionization.
- per-url irregular timestamp series (gaps minutes→weeks) over ~2 years.
- `html` is a deterministic template embedding the text payload; the
  pinned extractor (featurewiz_spark.text.extract) must reproduce `text`
  byte-for-byte per row.
- `lang` low-cardinality with ~5% nulls (backfill + rare-class paths).

Generation is distributed: we parallelize over seed ranges with
``spark.range`` + ``mapInPandas`` so a 10^9-row table would generate in
parallel on a cluster — there is no driver-side materialization.
Determinism: every row is a pure function of (seed, row_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

WORDS = np.array(
    "the quick brown fox jumps over lazy dog spark feature engine window "
    "session page crawl web data join merge sort filter select group order "
    "time stamp value signal metric count table column row batch stream".split()
)

LANGS = np.array(["en", "en", "en", "de", "fr", "es", "zh", "it", "pt", "nl"])

_EPOCH = pd.Timestamp("2023-01-01", tz=None)


def pages_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("url", T.StringType(), False),
            T.StructField("warc_ts", T.TimestampType(), False),
            T.StructField("html", T.BinaryType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
        ]
    )


def _render_html(title: str, body: str) -> bytes:
    # deterministic template with title/p/script/style blocks; the
    # extractor must drop <script>/<style> and keep title + paragraphs.
    return (
        "<html><head><title>{t}</title>"
        "<style>body {{ color: #000; }}</style></head>"
        "<body><script>var x = 42;</script>"
        "<p>{b}</p></body></html>"
    ).format(t=title, b=body).encode("utf-8")


def _gen_batch(ids: np.ndarray, seed: int) -> pd.DataFrame:
    """Pure function of (seed, row ids) → pandas batch. Vectorized numpy."""
    n = len(ids)
    rng_base = np.asarray(ids, dtype=np.uint64) * np.uint64(2654435761) + np.uint64(seed)

    def u(salt: int) -> np.ndarray:
        # splitmix-style per-row uniform in [0,1); the salt product is
        # masked in Python ints (same mod-2^64 value as uint64
        # wraparound, without numpy's scalar-overflow RuntimeWarning)
        z = rng_base + np.uint64((salt * 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF)
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        z = z ^ (z >> np.uint64(31))
        return (z >> np.uint64(11)).astype(np.float64) / float(1 << 53)

    # url: ~N/5 distinct; url_idx 0 (the "hot domain") gets ~10% of rows
    n_urls_total = max(len(ids) * 5, 10)  # conservative; actual distinctness from id space
    hot = u(1) < 0.10
    url_idx = np.where(hot, 0, (u(2) * (n_urls_total // 5 - 1)).astype(np.int64) + 1)
    domain = np.where(url_idx == 0, "hot.example.com", None)
    urls = np.array(
        [
            f"https://hot.example.com/p/{i % 97}"
            if h
            else f"https://site{i % 1000}.example.org/page/{i}"
            for i, h in zip(url_idx, hot)
        ],
        dtype=object,
    )

    # warc_ts: base offset per url plus irregular per-row gap, ~2y span
    span_sec = 2 * 365 * 24 * 3600
    ts_off = (u(3) * span_sec).astype(np.int64)
    jitter = (u(4) * 3600 * 24 * 7).astype(np.int64)  # up to a week of jitter
    ts = _EPOCH.value // 10**9 + ts_off + jitter
    warc_ts = pd.to_datetime(ts, unit="s")

    # text: 5–40 words drawn deterministically
    wc = (u(5) * 35).astype(np.int64) + 5
    word_seed = (u(6) * 10**9).astype(np.int64)
    texts = []
    for c, s in zip(wc, word_seed):
        idx = (s + np.arange(c) * 31) % len(WORDS)
        texts.append(" ".join(WORDS[idx]))
    texts = np.array(texts, dtype=object)

    titles = np.array([t.split(" ")[0] for t in texts], dtype=object)
    htmls = [_render_html(t, b) for t, b in zip(titles, texts)]
    # ground-truth extraction = title + "\n" + body (what the extractor yields)
    full_text = np.array([f"{t}\n{b}" for t, b in zip(titles, texts)], dtype=object)

    lang = LANGS[(u(7) * len(LANGS)).astype(np.int64)]
    lang = np.where(u(8) < 0.05, None, lang)

    del domain  # (kept for clarity above)
    return pd.DataFrame(
        {
            "url": urls,
            "warc_ts": warc_ts,
            "html": htmls,
            "text": full_text,
            "lang": lang,
        }
    )


def generate_pages(
    spark: SparkSession, n_rows: int, seed: int = 42, partitions: int | None = None
) -> DataFrame:
    """Distributed deterministic pages table: ``spark.range`` → mapInPandas.

    Scale path: generation is embarrassingly parallel over the id range, so
    the same code produces 2k rows for a unit test or 10^9 rows on a
    cluster with no driver bottleneck.
    """
    if partitions is None:
        partitions = max(spark.sparkContext.defaultParallelism, 8)
    base = spark.range(0, n_rows, numPartitions=partitions)
    schema = pages_schema()

    def gen(batches):
        for pdf in batches:
            yield _gen_batch(pdf["id"].to_numpy(), seed)

    return base.mapInPandas(gen, schema=schema)
