"""At-scale probe for duplicate_segment_filter (round-4 discipline:
every new distributed operator gets a ≥1M-row hot-key probe before it
is trusted at 100×).

Synthesizes 1.05M documents IN SPARK (fully distributed, deterministic
— xxhash64-derived word tails, no driver-side data): 100k "hot" docs
share one exact 8-token boilerplate chunk (a cookie banner) followed by
a unique 8-token tail; 950k "cold" docs are two unique chunks. The
boilerplate hash therefore appears 100k times — the skewed probe side
of the frequency join — while every other chunk is unique.

Checks:
  * every hot doc loses EXACTLY the boilerplate chunk (text_clean ==
    tail, n_removed == 1);
  * every cold doc is untouched;
  * total removed == 100k — i.e. the hot hash rode the aggregate and
    the 1:N join without dropping or duplicating rows;
  * wall time at local[8] (steady state, min of 3).

Plan properties this validates at scale: the doc-frequency aggregate
gets map-side partials (100k copies collapse to one row per partition
before the shuffle), the join build side is one row per DISTINCT hash,
and the reassembly aggregate is keyed on doc_id (no hot key). No
windows anywhere — nothing serializes on the hot hash.

Usage: python tools/segments_probe.py [n_docs n_hot]
Appends nothing; writes BENCH/SEGMENTS.md (idempotent overwrite).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BOILER = "please accept our cookie policy and terms today"  # 8 tokens


def build_corpus(spark, n_docs: int, n_hot: int):
    from pyspark.sql import functions as F

    tail = F.concat_ws(
        " ",
        *[
            F.format_string(
                "w%d", F.pmod(F.xxhash64("id", F.lit(k)), F.lit(99991))
            )
            for k in range(8)
        ],
    )
    return spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < n_hot, F.concat(F.lit(BOILER + " "), tail))
        .otherwise(tail)
        .alias("text"),
    )


def main():
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_050_000
    n_hot = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000

    from pyspark.sql import functions as F

    from featurewiz_spark.session import get_spark
    from featurewiz_spark.text.segments import duplicate_segment_filter

    spark = get_spark(app_name="segments_probe", cores=8, shuffle_partitions=16)
    docs = build_corpus(spark, n_docs, n_hot).persist()
    docs.count()

    times = []
    for _ in range(3):
        t0 = time.time()
        out = duplicate_segment_filter(
            docs, "text", "doc_id", chunk_tokens=8, min_docs=2
        )
        agg = out.agg(
            F.sum("n_removed").alias("removed"),
            F.sum("n_segments").alias("segments"),
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                (
                    (F.col("doc_id") < n_hot)
                    & (F.col("n_removed") == 1)
                    & (~F.col("text_clean").contains(BOILER))
                    & (F.length("text_clean") > 0)
                ).cast("long")
            ).alias("hot_ok"),
            F.sum(
                ((F.col("doc_id") >= n_hot) & (F.col("n_removed") == 0)).cast(
                    "long"
                )
            ).alias("cold_ok"),
        ).first()
        times.append(time.time() - t0)

    ok = (
        agg["rows"] == n_docs
        and agg["removed"] == n_hot
        and agg["hot_ok"] == n_hot
        and agg["cold_ok"] == n_docs - n_hot
        and agg["segments"] == n_hot * 2 + (n_docs - n_hot) * 1
    )
    lines = [
        "# duplicate_segment_filter hot-boilerplate probe",
        "",
        "Synthetic corpus generated in Spark (tools/segments_probe.py):",
        f"{n_docs:,} docs, {n_hot:,} of them sharing ONE exact 8-token",
        "boilerplate chunk (unique 8-token tails everywhere else) — the",
        "boilerplate hash is a 100k-row hot key through the frequency",
        "aggregate and the 1:N join.",
        "",
        f"- rows out: {agg['rows']:,} (== input)",
        f"- removed segments: {agg['removed']:,} (expected {n_hot:,})",
        f"- hot docs cleaned exactly (banner gone, tail intact): {agg['hot_ok']:,}",
        f"- cold docs untouched: {agg['cold_ok']:,}",
        f"- total segments seen: {agg['segments']:,}",
        f"- wall time local[8], runs: {[round(t, 2) for t in times]} s"
        f" (min {min(times):.2f})",
        f"- verdict: {'PASS' if ok else 'FAIL'}",
        "",
        "Why this scales: the doc-frequency aggregate collapses the",
        "100k-copy hash to one row per map task before the shuffle",
        "(partial aggregation); the join's build side is one row per",
        "DISTINCT hash so the hot key skews only the probe side, which",
        "AQE skew-join splits; reassembly groups by doc_id (no hot key).",
        "No window operators — nothing serializes on the hot hash.",
        "",
    ]
    report = "\n".join(lines)
    print(report)
    bench = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH",
        "SEGMENTS.md",
    )
    with open(bench, "w") as f:
        f.write(report)
    if not ok:
        raise SystemExit(1)
    spark.stop()


if __name__ == "__main__":
    main()
