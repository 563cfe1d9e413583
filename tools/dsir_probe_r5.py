"""Round-5 at-scale probe: DSIR importance resampling (text/dsir.py)
on 1,000,000 deterministic synthetic documents.

Corpus layout (all content xxhash64-derived, no RNG):
- 1M docs of 30 words each (~59 grams/doc after bigrams — ~59M hashed
  grams per full pass, the realistic per-doc cost regime).
- 20% of docs (id % 5 == 0) are "quality"-style: words drawn from a
  100-word core vocabulary. The other 80% draw from a disjoint-ish
  900-word broad vocabulary.
- Target corpus = a 40k-doc slice of the quality style (id % 25 == 0)
  — the small curated reference a real DSIR run would use.

Asserts:
1. Partition invariance: the full scored output (id, logw, key) is
   checksum-identical between a 7-partition and a 64-partition run of
   the same input — the fold order is pinned by array_sort, so the
   result must not depend on physical layout.
2. Separation: mean log-weight of quality-style docs exceeds the
   broad-style mean, and the Gumbel top-k (k=100k of 1M) is >= 95%
   quality-style — the operator actually selects the target
   distribution, it doesn't just run.
3. Plan shape: scoring is shuffle-free (the scored DataFrame's
   physical plan contains no Exchange), and the top-k is a
   TakeOrderedAndProject, not a global Sort.

Reports wall time for fit and for score+select (host-noise caveats as
in BENCH/BASELINE.md).

Usage: python tools/dsir_probe_r5.py [n_docs] [cores]
Appends a section to BENCH/DSIR.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

WORDS_PER_DOC = 30
CORE_VOCAB = 100
BROAD_VOCAB = 900
M_BUCKETS = 2048


def build_docs(spark, n_docs: int, n_parts: int):
    """1M-doc deterministic corpus: 20% core-vocab style, 80% broad."""
    base = spark.range(0, n_docs, 1, n_parts)
    is_core = (F.col("id") % 5) == 0
    def word(i):
        h = F.xxhash64(F.col("id"), F.lit(i))
        return F.when(
            is_core, F.concat(F.lit("c"), F.pmod(h, F.lit(CORE_VOCAB)))
        ).otherwise(
            F.concat(F.lit("w"), F.pmod(h, F.lit(BROAD_VOCAB)))
        )
    text = F.concat_ws(" ", *[word(i) for i in range(WORDS_PER_DOC)])
    return base.select(
        F.col("id").alias("doc_id"),
        text.alias("text"),
        is_core.cast("int").alias("is_core"),
    )


def checksum(df):
    """Order/partition-independent content hash of the full result."""
    return df.select(
        F.sum(
            F.xxhash64(F.col("doc_id"), F.col("dsir_logw"), F.col("dsir_key"))
            .cast("decimal(38,0)")  # ANSI mode: a raw long sum overflows
        ).alias("cs")
    ).first()["cs"]


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    k = n_docs // 10

    from featurewiz_spark.session import get_spark
    from featurewiz_spark.text.dsir import dsir_fit, dsir_score

    spark = get_spark("dsir-probe", cores=cores, shuffle_partitions=cores)

    docs = build_docs(spark, n_docs, n_parts=64)
    target = docs.filter(F.col("doc_id") % 25 == 0).select("doc_id", "text")

    t0 = time.time()
    lam, stats = dsir_fit(target, docs, m=M_BUCKETS)
    fit_s = time.time() - t0

    t0 = time.time()
    scored = dsir_score(docs, lam)
    top = (
        scored.orderBy(F.desc("dsir_key"), F.asc("doc_id"))
        .limit(k)
        .select("doc_id", "is_core")
    )
    top_rows = top.collect()
    score_s = time.time() - t0

    # 3. plan shape: shuffle-free scoring, TakeOrderedAndProject top-k
    score_plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in score_plan, "scoring plan contains a shuffle"
    top_plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in top_plan, "top-k is not TakeOrdered"
    assert "Exchange" not in top_plan, "top-k plan contains a shuffle"

    # 2. separation
    means = {
        r["is_core"]: r["m"]
        for r in scored.groupBy("is_core")
        .agg(F.avg("dsir_logw").alias("m"))
        .collect()
    }
    core_frac = sum(r["is_core"] for r in top_rows) / len(top_rows)
    assert means[1] > means[0], f"no separation: {means}"
    assert core_frac >= 0.95, f"top-k only {core_frac:.3f} core-style"

    # 1. partition invariance (7 vs 64 input partitions, same content)
    cs64 = checksum(scored)
    docs7 = build_docs(spark, n_docs, n_parts=7)
    cs7 = checksum(dsir_score(docs7, lam))
    assert cs7 == cs64, f"partitioning changed the result: {cs7} != {cs64}"

    line = (
        f"| {n_docs:,} | local[{cores}] | m={M_BUCKETS} "
        f"| {stats['r_grams']:,} | {fit_s:.1f} | {score_s:.1f} "
        f"| {n_docs / score_s:,.0f} | {means[1] - means[0]:.2f} "
        f"| {core_frac:.3f} | {cs64} |"
    )
    print(line)

    path = os.path.join(os.path.dirname(__file__), "..", "BENCH", "DSIR.md")
    new = not os.path.exists(path)
    with open(path, "a") as f:
        if new:
            f.write(
                "# BENCH/DSIR.md — DSIR importance-resampling probes\n\n"
                "Deterministic 20%-core / 80%-broad synthetic corpus "
                "(tools/dsir_probe_r5.py); asserts shuffle-free scoring "
                "plan, TakeOrderedAndProject top-k, mean-score "
                "separation, top-k purity >= 0.95, and 7-vs-64-partition "
                "checksum identity.\n\n"
                "| docs | parallelism | buckets | raw grams | fit s "
                "| score+select s | docs/s | mean gap | top-k core frac "
                "| checksum |\n|---|---|---|---|---|---|---|---|---|---|\n"
            )
        f.write(line + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
