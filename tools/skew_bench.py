"""Skew evidence for the as-of join (SURVEY.md §7.4 risk: hot-url skew;
north rule: "partitioning / shuffle / skew handled explicitly").

Builds a hot-entity fixture (one user owns `hot_frac` of all rows — the
SURVEY's 10% scenario), then compares the plain union-window as-of
(q04 plan: ALL of an entity's history in ONE sorted task) against the
skew-bounded bucketed as-of on two axes:

1. wall time at local[N] (min-of-k, warm-up discarded);
2. the metric that actually predicts 100TB behavior: MAX ROWS PER
   WINDOW TASK — the plain variant's max task grows linearly with the
   hot entity's history (no AQE remedy: windows cannot be salted), the
   bucketed variant's is bounded by bucket width regardless of skew.

Usage: python tools/skew_bench.py [rows] [hot_frac] [cores]
Writes BENCH/SKEW.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot_frac = float(sys.argv[2]) if len(sys.argv) > 2 else 0.10
    cores = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    from featurewiz_spark import get_spark
    from featurewiz_spark.operators.asof import asof_join, bucketed_asof_join

    spark = get_spark("skew_bench", cores=cores, shuffle_partitions=cores * 4)

    n_users = 100_000
    hot_rows = int(rows * hot_frac)
    # deterministic synthetic: hot user 0 gets hot_frac of all rows
    base = spark.range(rows).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") < hot_rows, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(n_users)))
        .alias("user_id"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=F.pmod(F.xxhash64("id", F.lit(2)), F.lit(90 * 86400)))
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10000)) / 100.0).alias("value"),
    )
    ev = base.repartition(cores * 4).cache()
    ev.count()
    snaps = ev.filter(F.pmod(F.xxhash64("event_id", F.lit(4)), F.lit(20)) == 0).select(
        "user_id", F.col("ts").alias("snap_ts"), F.col("value").alias("pv")
    )

    def run(fn, label):
        times = []
        for i in range(4):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            times.append(time.time() - t0)
        return {"label": label, "sec": min(times[1:]), "all": times}

    plain = run(
        lambda: asof_join(ev, snaps, "user_id", "ts", "snap_ts",
                          tolerance="7 days", strict=True),
        "plain union-window as-of",
    )
    bucketed = run(
        lambda: bucketed_asof_join(ev, snaps, "user_id", "ts", "snap_ts",
                                   tolerance="7 days", strict=True,
                                   bucket="3 days"),
        "skew-bounded bucketed as-of (3-day buckets)",
    )

    # the scale metric: rows the largest single window task must sort
    plain_max = ev.groupBy("user_id").count().agg(F.max("count")).first()[0]
    sec = 3 * 86400
    bucketed_max = (
        ev.withColumn("__b", F.floor(F.unix_timestamp("ts") / sec))
        .groupBy("user_id", "__b").count().agg(F.max("count")).first()[0]
    )

    lines = [
        "# BENCH/SKEW.md — hot-entity as-of join evidence",
        "",
        f"Fixture: {rows:,} events, {n_users:,} users, user 0 holds "
        f"{hot_frac:.0%} of ALL rows; local[{cores}]; min-of-3 after "
        "warm-up (noisy-host caveats as in BENCH/BASELINE.md).",
        "",
        "| variant | wall sec | max rows in one window task |",
        "|---|---|---|",
        f"| {plain['label']} | {plain['sec']:.2f} | {plain_max:,} |",
        f"| {bucketed['label']} | {bucketed['sec']:.2f} | {bucketed_max:,} |",
        "",
        f"raw plain: {[round(t, 2) for t in plain['all']]}; "
        f"raw bucketed: {[round(t, 2) for t in bucketed['all']]}",
        "",
        "The max-task metric is the one that scales: the plain variant's "
        "largest task grows LINEARLY with the hot entity's history "
        "(windows cannot be salted and AQE cannot split a sort-within-key), "
        "while the bucketed variant's is bounded by bucket width whatever "
        "the skew. At this fixture size the hot task already holds "
        f"{plain_max/rows:.0%} of the table; at 100TB with the same skew "
        "the plain plan is a guaranteed straggler while the bucketed plan "
        "is flat. Wall times at small scale mostly reflect fixed "
        "per-stage overheads (the bucketed variant runs 3 extra small "
        "shuffles), so the crossover favors bucketing only once the hot "
        "task dominates the stage — exactly the 100TB regime.",
    ]
    os.makedirs("/root/repo/BENCH", exist_ok=True)
    with open("/root/repo/BENCH/SKEW.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines[4:10]))
    spark.stop()


if __name__ == "__main__":
    main()
