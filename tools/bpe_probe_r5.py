"""Round-5 at-scale probe: the BPE fit→encode path (text/bpe.py) plus
Unicode normalization (text/normalize.py) on 1,000,000 deterministic
synthetic documents.

Corpus layout (all content xxhash64-derived, no RNG):
- 1M docs of 40 words each; words drawn from a 2,000-word vocabulary of
  Zipf-ish shape (bucket = h % 2000, then folded so low buckets repeat —
  web text's head-heavy word distribution, which the word-count
  aggregate's map-side combine must collapse).
- 10% of docs (id % 10 == 0) get a non-ASCII decoration (decomposed
  e+U+0301 + a C0 control) so the normalize stage's ASCII fast path and
  the real NFC path BOTH run at scale.

Asserts:
1. fit path: bpe_word_counts collapses 40M word occurrences to a
   vocabulary-bounded table; bpe_train learns a non-empty merge list
   from the capped table.
2. encode partition invariance: full (doc_id, n_tokens, head-token)
   output checksum is identical between a 7-partition and a
   64-partition run — the replace-fold is a pure projection, so layout
   must not matter.
3. Plan shape: normalize+encode contains NO Exchange and no
   BatchEvalPython (the only Python is the Arrow-batched NFC kernel).
4. Reconstruction: on a 1k-doc sample, concat(tokens) minus </w>
   markers round-trips the normalized lowercased text exactly.

Reports wall time for word counts, train, and the encode pass
(host-noise caveats as in BENCH/BASELINE.md).

Usage: python tools/bpe_probe_r5.py [n_docs] [cores]
Appends a section to BENCH/BPE.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORDS_PER_DOC = 40
VOCAB = 2000
N_MERGES = 64


def build_docs(spark, n_docs: int, n_parts: int):
    """1M-doc deterministic corpus, Zipf-ish head + 10% non-ASCII."""
    base = spark.range(0, n_docs, 1, n_parts)

    def word(i):
        h = F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(VOCAB * 4))
        # fold: 3/4 of draws land in the 200-word head
        b = F.when(h < VOCAB * 3, F.pmod(h, F.lit(200))).otherwise(
            F.pmod(h, F.lit(VOCAB))
        )
        return F.concat(F.lit("w"), b)

    text = F.concat_ws(" ", *[word(i) for i in range(WORDS_PER_DOC)])
    decor = F.when(
        F.col("id") % 10 == 0, F.lit(" café \x07lab")
    ).otherwise(F.lit(""))
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat(text, decor).alias("text"),
    )


def checksum(df):
    """Order/partition-independent content hash of the full result."""
    return df.select(
        F.sum(
            F.xxhash64(
                F.col("doc_id"), F.col("bpe_n_tokens"), F.col("h")
            ).cast("decimal(38,0)")  # ANSI: raw long sum overflows
        ).alias("cs")
    ).first()["cs"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from featurewiz_spark.session import get_spark
    from featurewiz_spark.text.bpe import bpe_encode, bpe_train, bpe_word_counts
    from featurewiz_spark.text.normalize import add_unicode_normalized

    spark = get_spark("bpe-probe", cores=cores, shuffle_partitions=cores)

    docs = build_docs(spark, n_docs, n_parts=64)
    norm = add_unicode_normalized(docs, "text", out_col="text_norm")

    # 1. fit: ONE hash aggregate + driver merge-learning on the cap
    t0 = time.time()
    wc = bpe_word_counts(norm, "text_norm", max_words=50_000)
    n_vocab = wc.count()
    counts_s = time.time() - t0
    t0 = time.time()
    merges = bpe_train(wc, N_MERGES)
    train_s = time.time() - t0
    assert len(merges) == N_MERGES, f"learned only {len(merges)} merges"

    def encoded(src):
        n = add_unicode_normalized(src, "text", out_col="text_norm")
        e = bpe_encode(n, merges, "text_norm")
        return e.select(
            "doc_id",
            "bpe_n_tokens",
            F.xxhash64(F.element_at("bpe_tokens", 1)).alias("h"),
        )

    # 3. plan shape: no shuffle, no row-at-a-time Python
    plan = encoded(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, "encode plan contains a shuffle"
    assert "BatchEvalPython" not in plan, "row-at-a-time Python UDF"

    t0 = time.time()
    enc64 = encoded(docs)
    n_out = enc64.count()
    cs64 = checksum(encoded(docs))
    enc_s = time.time() - t0
    assert n_out == n_docs

    # 2. partition invariance (7 vs 64 input partitions, same content)
    cs7 = checksum(encoded(build_docs(spark, n_docs, n_parts=7)))
    assert cs7 == cs64, f"partitioning changed the result: {cs7} != {cs64}"

    # 4. reconstruction on a sample: tokens round-trip the text
    sample = add_unicode_normalized(
        docs.filter(F.col("doc_id") % (n_docs // 1000) == 0),
        "text",
        out_col="text_norm",
    )
    rec = bpe_encode(sample, merges, "text_norm").select(
        F.lower(F.col("text_norm")).alias("want"),
        F.regexp_replace(
            F.concat_ws("", "bpe_tokens"), "</w>$", ""
        ).alias("got_raw"),
    )
    bad = rec.where(
        F.replace(F.col("got_raw"), F.lit("</w>"), F.lit(" ")) != F.col("want")
    ).count()
    assert bad == 0, f"{bad} sample docs failed token reconstruction"

    line = (
        f"| {n_docs:,} | local[{cores}] | {n_vocab:,} | {N_MERGES} "
        f"| {counts_s:.1f} | {train_s:.1f} | {enc_s:.1f} "
        f"| {n_docs / enc_s:,.0f} | {cs64} |"
    )
    print(line)

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "BPE.md")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write(
                "# BENCH/BPE.md — normalize→BPE fit/encode probes\n\n"
                "Deterministic Zipf-head synthetic corpus, 10% non-ASCII "
                "decoration (tools/bpe_probe_r5.py); asserts a shuffle-free "
                "BatchEvalPython-free encode plan, 7-vs-64-partition "
                "checksum identity, full learned-merge count, and exact "
                "token→text reconstruction on a 1k-doc sample. encode s "
                "includes the NFC normalize pass.\n\n"
                "| docs | parallelism | vocab rows | merges | counts s "
                "| train s | encode s | docs/s | checksum |\n"
                "|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
