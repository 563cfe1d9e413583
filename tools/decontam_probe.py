"""At-scale probe for decontaminate (round-4 discipline: >=1M-row
hot-key probe for every new distributed operator).

Synthesizes IN SPARK (deterministic, no driver data):

- benchmark: 10,000 rows — one is THE planted sentence (8 tokens),
  the rest unique 8-token filler (so the broadcast gram set is
  realistically sized, not a single hash);
- corpus: 1,000,000 docs — 100,000 "hot" docs contain the planted
  sentence followed by a unique tail (the planted gram hash hits
  100k times through the broadcast semi-join and the per-doc
  aggregate), 900,000 "cold" docs are unique 16-token texts.

Checks (exact, by construction):
  * flagged docs == 100,000, every one with n_contaminated_grams == 1
    (the tail makes every other 8-gram unique);
  * cold docs all clean;
  * drop mode returns exactly 900,000 rows;
  * wall time at local[8] (min of 3).

Usage: python tools/decontam_probe.py [n_docs n_hot n_bench]
Writes BENCH/DECONTAM.md (idempotent overwrite).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANTED = "what is the capital of france answer paris"  # 8 tokens


def _tail(prefix: str, n_words: int, seed0: int):
    from pyspark.sql import functions as F

    return F.concat_ws(
        " ",
        *[
            F.format_string(
                f"{prefix}%d",
                F.pmod(F.xxhash64("id", F.lit(seed0 + k)), F.lit(9999991)),
            )
            for k in range(n_words)
        ],
    )


def build(spark, n_docs: int, n_hot: int, n_bench: int):
    from pyspark.sql import functions as F

    bench = spark.range(n_bench).select(
        F.when(F.col("id") == 0, F.lit(PLANTED))
        .otherwise(_tail("b", 8, 100))
        .alias("text")
    ).repartition(8)
    docs = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < n_hot,
            F.concat(F.lit(PLANTED + " "), _tail("h", 8, 200)),
        )
        .otherwise(_tail("c", 16, 300))
        .alias("text"),
    ).repartition(32)
    return docs, bench


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    n_bench = int(sys.argv[3]) if len(sys.argv) > 3 else 10_000
    from featurewiz_spark import get_spark
    from featurewiz_spark.cache import cache_scope
    from featurewiz_spark.text.decontam import decontaminate
    from pyspark.sql import functions as F

    spark = get_spark("decontam_probe", cores=8, shuffle_partitions=32)
    docs, bench = build(spark, n_docs, n_hot, n_bench)
    docs.persist().count()
    bench.persist().count()

    times = []
    flagged = ones = clean = None
    for _ in range(3):
        with cache_scope():
            t0 = time.time()
            agg = (
                decontaminate(docs, bench, n=8)
                .agg(
                    F.sum("is_contaminated").alias("flagged"),
                    F.sum(
                        (F.col("n_contaminated_grams") == 1).cast("long")
                    ).alias("ones"),
                    F.sum(
                        (F.col("is_contaminated") == 0).cast("long")
                    ).alias("clean"),
                )
                .collect()[0]
            )
            times.append(round(time.time() - t0, 2))
            flagged, ones, clean = agg["flagged"], agg["ones"], agg["clean"]

    with cache_scope():
        kept = decontaminate(docs, bench, n=8, mode="drop").count()

    ok_flag = flagged == n_hot
    ok_ones = ones == n_hot  # every hot doc: exactly the planted gram
    ok_clean = clean == n_docs - n_hot
    ok_drop = kept == n_docs - n_hot
    ok = ok_flag and ok_ones and ok_clean and ok_drop
    lines = [
        "# decontaminate hot-gram probe",
        "",
        "Synthetic corpus (tools/decontam_probe.py): "
        f"{n_docs:,} docs, {n_hot:,} carrying ONE planted benchmark",
        f"sentence (unique tails elsewhere); benchmark set {n_bench:,}",
        "rows. The planted 8-gram hash hits 100k times through the",
        "broadcast semi-join — the hot key.",
        "",
        f"- flagged: {flagged:,} (expected {n_hot:,}) "
        f"-> {'OK' if ok_flag else 'MISMATCH'}",
        f"- flagged with n_contaminated_grams == 1: {ones:,} "
        f"-> {'OK' if ok_ones else 'MISMATCH'}",
        f"- clean: {clean:,} (expected {n_docs - n_hot:,}) "
        f"-> {'OK' if ok_clean else 'MISMATCH'}",
        f"- drop mode kept: {kept:,} (expected {n_docs - n_hot:,}) "
        f"-> {'OK' if ok_drop else 'MISMATCH'}",
        f"- wall time local[8], flag-mode runs: {times} s (min {min(times)})",
        f"- verdict: {'PASS' if ok else 'FAIL'}",
        "",
        "Why this scales: the benchmark gram set (8-byte md5-60 hashes)",
        "is BROADCAST — the corpus is never shuffled for the membership",
        "test; the only corpus-keyed exchange is the per-doc hit",
        "aggregate, whose key (doc_id) cannot be hot. The planted gram's",
        "100k hits collapse map-side in that aggregate. Explode width is",
        "tokens-per-doc bounded; nothing is quadratic in corpus size.",
    ]
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH", "DECONTAM.md"),
        "w",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
