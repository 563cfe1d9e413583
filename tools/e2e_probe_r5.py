"""Round-5 capstone probe: the WHOLE north-star chain in one run.

    raw WARC dump (multi-member gzip, legacy charsets, non-200s, dup
    pages, cross-links)
      → warc_to_pages(charset_aware=True)      [ingest + decode + langid]
      → extract_links → pagerank               [link graph centrality]
      → C4/Gopher gates + exact dedup          [curation]
      → pages_feature_pipeline                 [entity×timestamp features]

Reports rows in/out and wall time per stage to BENCH/E2E.md — the
integration evidence that the pieces the per-operator probes verify in
isolation actually compose: one engine, one DataFrame lineage, raw
crawl bytes to model-ready feature vectors.

Usage: python tools/e2e_probe_r5.py [n_records] [n_files]
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORDS = (
    "the quick brown fox jumps over lazy dog and then walks through the "
    "green field while many other animals watch from their quiet homes"
).split()


def _page_html(i: int, n_urls: int) -> tuple[bytes, str, int]:
    """Deterministic page: body text, 3 outlinks, some legacy charset,
    some non-200, some exact dups. Returns (http_bytes, charset, status)."""
    uid = i % n_urls
    dup_of = uid if uid % 13 != 0 else (uid // 13) % n_urls  # exact dups
    body = " ".join(
        WORDS[(dup_of + j) % len(WORDS)] for j in range(30 + dup_of % 40)
    )
    links = "".join(
        f'<a href="https://site{(dup_of * 7 + k) % 50}.example/p{(dup_of + k * 11) % n_urls}.html">l{k}</a>'
        for k in range(3)
    )
    accent = "café" if uid % 5 == 0 else "plain"
    html = (
        f"<html><title>page {dup_of} {accent}</title><body><p>{body}</p>"
        f"{links}</body></html>"
    )
    if uid % 5 == 0:
        payload, charset = html.encode("cp1252"), "iso-8859-1"
    else:
        payload, charset = html.encode(), "utf-8"
    status = 404 if uid % 29 == 0 else 200
    reason = b"Not Found" if status == 404 else b"OK"
    http = (
        b"HTTP/1.1 " + str(status).encode() + b" " + reason
        + b"\r\nContent-Type: text/html; charset=" + charset.encode()
        + b"\r\n\r\n" + payload
    )
    return http, charset, status


def generate(out_dir: str, n_records: int, n_files: int) -> None:
    n_urls = max(1, n_records // 3)  # ~3 snapshots per url for windows
    handles = [
        open(os.path.join(out_dir, f"seg{i:03d}.warc.gz"), "wb")
        for i in range(n_files)
    ]
    try:
        for i in range(n_records):
            http, _, _ = _page_html(i, n_urls)
            url = f"https://site{(i % n_urls) % 50}.example/p{i % n_urls}.html"
            ts = (
                f"2024-0{1 + (i // n_urls) % 3}-"
                f"{1 + i % 27:02d}T{i % 24:02d}:{i % 60:02d}:00Z"
            )
            rec = (
                f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Date: {ts}\r\n"
                f"WARC-Target-URI: {url}\r\n"
                f"WARC-Record-ID: <urn:e2e:{i}>\r\n"
                f"Content-Length: {len(http)}\r\n\r\n"
            ).encode() + http + b"\r\n\r\n"
            handles[i % n_files].write(gzip.compress(rec, compresslevel=1))
    finally:
        for h in handles:
            h.close()


def main() -> None:
    n_records = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 64

    from featurewiz_spark.operators.pagerank import pagerank
    from featurewiz_spark.plans.pipeline import pages_feature_pipeline
    from featurewiz_spark.session import get_spark
    from featurewiz_spark.sources.warc import warc_to_pages
    from featurewiz_spark.text.heuristics import add_c4_gopher_filters
    from featurewiz_spark.text.links import extract_links

    d = tempfile.mkdtemp(prefix="fw_e2e_")
    stages: list[tuple[str, float, str]] = []
    try:
        t0 = time.time()
        generate(d, n_records, n_files)
        stages.append(("generate dump", time.time() - t0,
                       f"{n_records} records / {n_files} gz files"))

        spark = get_spark("e2e-probe")

        t0 = time.time()
        pages = warc_to_pages(spark, d, charset_aware=True).persist()
        n_pages = pages.count()
        n_langs = pages.select("lang").distinct().count()
        stages.append(("ingest+decode+langid", time.time() - t0,
                       f"{n_pages} pages kept of {n_records} records "
                       f"(non-200s dropped), {n_langs} langs"))
        assert n_pages < n_records  # 404s really dropped

        t0 = time.time()
        cafe = pages.where(F.col("text").contains("café")).count()
        stages.append(("charset fidelity", time.time() - t0,
                       f"{cafe} legacy cp1252 pages decode to 'café' "
                       "(0 would mean mojibake)"))
        assert cafe > 0

        t0 = time.time()
        edges = extract_links(
            pages.withColumn("text_html", F.col("html").cast("string")),
            url_col="url",
            html_col="text_html",
        )
        ranks = pagerank(edges.distinct(), iterations=5)
        n_nodes = ranks.count()
        top = ranks.orderBy(F.desc("rank_fp")).first()
        stages.append(("links+pagerank", time.time() - t0,
                       f"{n_nodes} nodes ranked; top rank_fp="
                       f"{top['rank_fp']}"))

        t0 = time.time()
        gated = add_c4_gopher_filters(pages, text_col="text")
        kept = gated.where("gopher_keep").count()
        deduped = (
            gated.where("gopher_keep")
            .groupBy(F.md5("text").alias("h"))
            .agg(F.min("url").alias("url"), F.count("*").alias("copies"))
        )
        n_unique = deduped.count()
        stages.append(("curation gates+dedup", time.time() - t0,
                       f"{kept} pass Gopher gates; {n_unique} unique "
                       f"texts (dup factor {kept / max(n_unique, 1):.1f}x)"))

        t0 = time.time()
        feats = pages_feature_pipeline(pages, extract=False)
        n_feats = feats.count()
        n_cols = len(feats.columns)
        dt = time.time() - t0
        stages.append(("feature pipeline", dt,
                       f"{n_feats} entity×timestamp vectors × {n_cols} "
                       f"cols ({n_feats / dt:,.0f} rows/s)"))
        pages.unpersist()

        total = sum(s[1] for s in stages)
        md = [
            f"\n## End-to-end chain probe ({n_records} WARC records)\n",
            "| stage | sec | result |",
            "|---|---|---|",
        ]
        for name, sec, note in stages:
            print(f"{name:24s} {sec:7.1f}s  {note}")
            md.append(f"| {name} | {sec:.1f} | {note} |")
        md.append(f"| **total** | **{total:.1f}** | raw crawl bytes → "
                  "model-ready feature vectors, one engine, one lineage |")
        with open(
            os.path.join(os.path.dirname(__file__), "..", "BENCH", "E2E.md"),
            "a",
        ) as f:
            f.write("\n".join(md) + "\n")
        print("appended BENCH/E2E.md")
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    main()
