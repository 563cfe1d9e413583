"""Round-6 probe: BPE encode at REALISTIC merge counts (the r5 verdict's
one open scale question: the replace-fold was proven only at 64 merges).

Corpus: the r5 probe's deterministic Zipf-head synthetic corpus
(tools/bpe_probe_r5.py) with a 2,000-word vocabulary — rich enough for
8k+ real merges (words are 2-5 chars, so the trainer can learn ~9k
merges before every word is a single symbol).

Measures, on n_docs (default 1,000,000) docs at local[cores]:
1. trainer wall time at the full merge budget (the r6 incremental
   trainer; the round-rescan reference would be O(merges x vocab)).
2. fold encode wall time at 64 / 256 merges + plan-build time, and the
   fold's structural limit (plan-build at 512/1024/8192 — measured
   driver StackOverflowError between 256 and 512 chained replaces).
3. kernel encode wall time at 64 / 1024 / 8192 merges.
4. checksum identity fold-vs-kernel at every fold-feasible size, and
   7-vs-64-partition checksum identity for the kernel at 8192.

Appends a section to BENCH/BPE.md.

Usage: python tools/bpe_probe_r6.py [n_docs] [cores]
"""

from __future__ import annotations

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

FOLD_SIZES = [64, 256]
FOLD_BUILD_ONLY = [512, 1024, 8192]
KERNEL_SIZES = [64, 1024, 8192]

WORDS_PER_DOC = 40
# r5's 2,000-word vocabulary exhausts the trainer at ~2.1k merges
# (merges are shared across words); 12,000 distinct words support the
# 8k+ budget while keeping the Zipf head (3/4 of draws from a 200-word
# head) that exercises the word cache and map-side combine.
VOCAB = 12000


def build_docs(spark, n_docs: int, n_parts: int):
    """Deterministic Zipf-head corpus (r5 probe shape, larger vocab)."""
    base = spark.range(0, n_docs, 1, n_parts)

    def word(i):
        h = F.pmod(F.xxhash64(F.col("id"), F.lit(i)), F.lit(VOCAB * 4))
        b = F.when(h < VOCAB * 3, F.pmod(h, F.lit(200))).otherwise(
            F.pmod(h, F.lit(VOCAB))
        )
        return F.concat(F.lit("w"), b)

    text = F.concat_ws(" ", *[word(i) for i in range(WORDS_PER_DOC)])
    decor = F.when(
        F.col("id") % 10 == 0, F.lit(" café \x07lab")
    ).otherwise(F.lit(""))
    return base.select(
        F.col("id").alias("doc_id"),
        F.concat(text, decor).alias("text"),
    )


def checksum(df):
    return df.select(
        F.sum(
            F.xxhash64(
                F.col("doc_id"), F.col("bpe_n_tokens"),
                F.element_at(F.col("bpe_tokens"), 1),
            ).cast("decimal(38,0)")
        ).alias("cs")
    ).first()["cs"]


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from featurewiz_spark import get_spark
    from featurewiz_spark.text.bpe import (
        bpe_encode,
        bpe_train,
        bpe_word_counts,
    )

    spark = get_spark("bpe_probe_r6", cores=cores,
                      shuffle_partitions=max(cores, 8))
    docs = build_docs(spark, n_docs, 64).persist()
    docs.count()

    t0 = time.time()
    wc = bpe_word_counts(docs, "text")
    merges_all = bpe_train(wc, max(KERNEL_SIZES))
    t_train = time.time() - t0
    print(f"train {len(merges_all)} merges: {t_train:.1f}s", flush=True)

    lines = [
        "",
        f"## r6 probe — encode at realistic merge counts "
        f"({n_docs:,} docs, local[{cores}])",
        "",
        f"Incremental trainer: {len(merges_all)} merges learned in "
        f"{t_train:.1f}s (driver-side; the r5 round-rescan loop is "
        "O(merges x vocab) and was the binding constraint on probing "
        "beyond 64).",
        "",
        "| merges | engine | plan-build s | encode s | docs/s | checksum = fold? |",
        "|---|---|---|---|---|---|",
    ]

    kernel_cs = {}
    fold_cs = {}
    for m in FOLD_SIZES:
        mg = merges_all[:m]
        t0 = time.time()
        enc = bpe_encode(docs, mg, "text", engine="fold")
        t_build = time.time() - t0
        t0 = time.time()
        enc.write.format("noop").mode("overwrite").save()
        t_enc = time.time() - t0
        fold_cs[m] = checksum(enc)
        lines.append(
            f"| {m} | fold | {t_build:.2f} | {t_enc:.1f} | "
            f"{n_docs / t_enc:,.0f} | (reference) |"
        )
        print(lines[-1], flush=True)

    for m in FOLD_BUILD_ONLY:
        mg = merges_all[:m]
        t0 = time.time()
        try:
            enc = bpe_encode(docs, mg, "text", engine="fold")
            # force analysis/conversion without running the corpus
            enc.limit(1).collect()
            note = f"build+1-row ok in {time.time() - t0:.1f}s"
        except Exception as ex:
            note = f"FAILS: {type(ex).__name__}: {str(ex).splitlines()[0][:80]}"
        except BaseException as ex:  # Py4J surfaces JVM StackOverflowError
            note = f"FAILS: {type(ex).__name__}"
        lines.append(f"| {m} | fold | — | — | — | {note} |")
        print(lines[-1], flush=True)

    for m in KERNEL_SIZES:
        mg = merges_all[:m]
        t0 = time.time()
        enc = bpe_encode(docs, mg, "text", engine="kernel")
        t_build = time.time() - t0
        t0 = time.time()
        enc.write.format("noop").mode("overwrite").save()
        t_enc = time.time() - t0
        kernel_cs[m] = checksum(enc)
        same = ("yes" if m in fold_cs and kernel_cs[m] == fold_cs[m]
                else ("n/a (fold infeasible)" if m not in fold_cs else "NO"))
        lines.append(
            f"| {m} | kernel | {t_build:.2f} | {t_enc:.1f} | "
            f"{n_docs / t_enc:,.0f} | {same} |"
        )
        print(lines[-1], flush=True)

    # partition invariance at the largest kernel size
    m = max(KERNEL_SIZES)
    cs7 = checksum(
        bpe_encode(docs.repartition(7), merges_all[:m], "text",
                   engine="kernel"))
    inv = "identical" if cs7 == kernel_cs[m] else "DIFFERENT"
    lines += [
        "",
        f"Kernel @ {m} merges, 7-vs-64-partition checksum: {inv} "
        f"({cs7}).",
        "",
        "Reading: the fold's plan is O(merges) deep and the driver's "
        "recursive Column→Expression conversion overflows the JVM "
        "thread stack between 256 and 512 chained replaces, so a "
        "production 16k-32k-merge vocabulary cannot run as a fold at "
        "all (its runtime is also O(merges × doc_len)). "
        "bpe_encode(engine='auto') therefore routes above "
        "FOLD_MAX_MERGES=256 to the Arrow kernel (in-rank-order heap "
        "encoder + per-task distinct-word cache, differential-tested "
        "token-identical to the fold).",
    ]
    print(f"partition invariance: {inv}", flush=True)

    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH", "BPE.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
