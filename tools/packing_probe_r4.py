"""Round-4 at-scale probe: GPT-style sequence packing
(text/chunking.py::pack_sequences) at ~1M documents.

Evidences (per-round probe discipline):

1. **Partition invariance**: the full (doc_id, pack_id, pack_offset)
   assignment is bit-identical between the default layout and a
   repartition(7) layout at two parallelism levels — the md5-60 shard
   hash + per-shard ordered cumsum leave nothing to scheduling.
2. **The n_shards knob bounds the window partition**: per-shard row
   counts stay near corpus/n_shards (max/mean reported) — a shard IS
   the window partition, so the knob directly caps the sort task.
3. **Exact accounting**: per shard, the number of distinct packs equals
   ceil(shard_tokens / budget) ± the final partial pack, and every
   offset < budget.
4. Wall time, min-of-2.

Usage: python tools/packing_probe_r4.py [n_docs] [cores]
Appends a section to BENCH/SEMANTIC.md (the round-4 probe doc).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BUDGET = 256
N_SHARDS = 64


def build(spark, n_docs: int):
    """Deterministic corpus: doc i has (i % 37) + 1 tokens."""
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), (F.col("id") % 37 + 1).cast("int")),
                lambda j: F.concat(F.lit("t"), j.cast("string")),
            ),
        ).alias("text"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from featurewiz_spark import get_spark
    from featurewiz_spark.text.chunking import pack_sequences

    spark = get_spark("packing_probe", cores=cores,
                      shuffle_partitions=cores * 4)
    df = build(spark, n_docs).persist()
    df.count()

    times = []
    out = None
    for _ in range(2):
        if out is not None:
            out.unpersist()
        t0 = time.time()
        out = pack_sequences(df, budget=BUDGET, n_shards=N_SHARDS).persist()
        out.count()
        times.append(time.time() - t0)

    alt = pack_sequences(
        df.repartition(7), budget=BUDGET, n_shards=N_SHARDS
    ).select("doc_id", "pack_id", "pack_offset")
    base = out.select("doc_id", "pack_id", "pack_offset")
    mismatch = base.exceptAll(alt).count() + alt.exceptAll(base).count()

    shard_stats = out.groupBy("pack_shard").agg(
        F.count(F.lit(1)).alias("rows"),
        F.sum("n_tokens").alias("tokens"),
        F.countDistinct("pack_id").alias("packs"),
        F.max_by("n_tokens", "doc_id").alias("last_ntok"),
    )
    agg = shard_stats.agg(
        F.max("rows").alias("max_rows"),
        F.avg("rows").alias("avg_rows"),
        F.count(F.lit(1)).alias("shards"),
    ).collect()[0]
    # distinct STARTING packs per shard == floor(last_start/budget)+1
    # where last_start = tokens - last_doc_tokens: doc lengths < budget
    # mean every pack up to the last start position has a starter; the
    # final pack may hold only the spill of the last doc (no starter)
    bad_packs = shard_stats.filter(
        F.col("packs")
        != F.floor((F.col("tokens") - F.col("last_ntok")) / F.lit(BUDGET)) + 1
    ).count()
    bad_offsets = out.filter(
        (F.col("pack_offset") < 0) | (F.col("pack_offset") >= BUDGET)
    ).count()

    ok = (
        mismatch == 0
        and bad_packs == 0
        and bad_offsets == 0
        and agg["shards"] == N_SHARDS
        and agg["max_rows"] < 1.2 * agg["avg_rows"]
    )
    lines = [
        "",
        f"## Sequence-packing probe — {n_docs:,} docs, budget {BUDGET}, "
        f"{N_SHARDS} shards, local[{cores}] ({time.strftime('%Y-%m-%d')})",
        "",
        f"- partition invariance: {mismatch} mismatching rows vs a "
        f"repartition(7) run (bit-identical assignment)",
        f"- shard balance (the window-partition cap): max {agg['max_rows']:,}"
        f" rows vs mean {agg['avg_rows']:,.0f} over {agg['shards']} shards"
        f" (max/mean {agg['max_rows']/agg['avg_rows']:.3f})",
        f"- exact accounting: {bad_packs} shards violate packs == "
        f"floor((tokens - last_doc)/budget) + 1; "
        f"{bad_offsets} offsets outside [0, {BUDGET})",
        f"- wall {' / '.join(f'{t:.1f}s' for t in times)} "
        f"(min {min(times):.1f}s)",
        f"- verdict: {'PASS' if ok else 'FAIL'}",
    ]
    with open(os.path.join(os.path.dirname(__file__), "..",
                           "BENCH", "SEMANTIC.md"), "a") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    print("PROBE", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
