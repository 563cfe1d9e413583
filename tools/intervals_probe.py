"""At-scale probe for interval_join (round-4 discipline: every new
distributed operator gets a >=1M-row hot-key probe before it is
trusted at 100x).

Synthesizes IN SPARK (deterministic, no driver data):

- 100 shards x 96 hourly-spaced intervals of length EXACTLY 2h
  (9,600 intervals). Because length == 2 x spacing, every point whose
  timestamp lies in [H, 95H) is covered by EXACTLY TWO intervals —
  an analytic invariant the probe checks to the row.
- 1,000,000 points, 50% of them on ONE hot shard (shard 0) — the
  bucketed equality join's skewed probe side.

Checks:
  * total matches == 2 x points (exact, by construction);
  * per-point match count is exactly 2 for every point (min==max==2);
  * value-level equivalence vs the naive conditional join
    (shard equality + range residual) on a 2-shard subset (one hot,
    one cold) — same (pid, iid) pair multiset;
  * wall time of bucketed vs naive full-corpus join at local[8] —
    the naive key-only join evaluates |points_in_shard| x
    |intervals_in_shard| residual pairs per shard (480M on the hot
    shard alone), the bucketed join touches only same-bucket pairs.

Usage: python tools/intervals_probe.py [n_points]
Writes BENCH/INTERVALS.md (idempotent overwrite).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

H_US = 3_600_000_000  # 1 hour in microseconds
N_SHARDS = 100
K_IVALS = 960  # per shard, hourly spacing, length 2h


def build(spark, n_points: int):
    from pyspark.sql import functions as F

    # intervals: shard s, k = 0..K-1, [k*H, k*H + 2H)
    iv = (
        spark.range(N_SHARDS * K_IVALS)
        .select(
            (F.col("id") % N_SHARDS).alias("shard"),
            F.col("id").alias("iid"),
            F.timestamp_micros(
                (F.col("id") / N_SHARDS).cast("long") * H_US
            ).alias("s"),
            F.timestamp_micros(
                (F.col("id") / N_SHARDS).cast("long") * H_US + 2 * H_US
            ).alias("e"),
        )
        .repartition(32)
    )
    # points: ts deterministic-pseudorandom in [H, 95H); 50% on shard 0
    pts = (
        spark.range(n_points)
        .select(
            F.col("id").alias("pid"),
            F.when(F.pmod(F.col("id"), 2) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(7)), F.lit(N_SHARDS)))
            .cast("long")
            .alias("shard"),
            F.timestamp_micros(
                H_US
                + F.pmod(
                    F.xxhash64("id", F.lit(13)), F.lit((K_IVALS - 2) * H_US)
                )
            ).alias("ts"),
        )
        .repartition(32)
    )
    return pts, iv


def main():
    n_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    from featurewiz_spark import get_spark
    from featurewiz_spark.operators.intervals import interval_join
    from pyspark.sql import functions as F

    spark = get_spark("intervals_probe", cores=8, shuffle_partitions=32)
    pts, iv = build(spark, n_points)
    pts.persist().count()
    iv.persist().count()

    # --- bucketed operator, timed (min of 3) ---
    def run_bucketed():
        return interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["shard"], bucket="1 hour",
        )

    times = []
    total = per_min = per_max = None
    for _ in range(3):
        t0 = time.time()
        agg = (
            run_bucketed()
            .groupBy("pid")
            .agg(F.count(F.lit(1)).alias("m"))
            .agg(
                F.sum("m").alias("total"),
                F.min("m").alias("mn"),
                F.max("m").alias("mx"),
                F.count(F.lit(1)).alias("npts"),
            )
            .collect()[0]
        )
        times.append(round(time.time() - t0, 2))
        total, per_min, per_max, npts = (
            agg["total"], agg["mn"], agg["mx"], agg["npts"],
        )
    ok_total = total == 2 * n_points and npts == n_points
    ok_each = per_min == 2 and per_max == 2

    # --- naive conditional join, timed once (the pathology baseline) ---
    t0 = time.time()
    naive_total = (
        pts.join(iv, "shard")
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .count()
    )
    naive_time = round(time.time() - t0, 2)
    ok_naive_total = naive_total == 2 * n_points

    # --- value-level equivalence on a 2-shard subset (hot + cold) ---
    sub_p = pts.where(F.col("shard").isin(0, 17))
    sub_i = iv.where(F.col("shard").isin(0, 17))
    b = interval_join(
        sub_p, sub_i, point_ts="ts", start_col="s", end_col="e",
        keys=["shard"], bucket="1 hour",
    ).select("pid", "iid")
    nv = (
        sub_p.join(sub_i, "shard")
        .where((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .select("pid", "iid")
    )
    diff = b.exceptAll(nv).count() + nv.exceptAll(b).count()
    ok_equiv = diff == 0

    ok = ok_total and ok_each and ok_naive_total and ok_equiv
    lines = [
        "# interval_join hot-shard probe",
        "",
        "Synthetic grid (tools/intervals_probe.py): "
        f"{n_points:,} points, 50% on ONE hot shard; "
        f"{N_SHARDS * K_IVALS:,} intervals (length = 2x spacing, so every",
        "point is covered by EXACTLY two intervals — an analytic",
        "row-count invariant, not a sampled check).",
        "",
        f"- bucketed matches: {total:,} (expected {2 * n_points:,}) "
        f"-> {'OK' if ok_total else 'MISMATCH'}",
        f"- per-point match count min/max: {per_min}/{per_max} "
        f"(expected 2/2) -> {'OK' if ok_each else 'MISMATCH'}",
        f"- naive conditional-join total: {naive_total:,} "
        f"-> {'OK' if ok_naive_total else 'MISMATCH'}",
        "- (pid, iid) pair multiset, bucketed vs naive, hot+cold "
        f"2-shard subset: diff {diff} -> {'OK' if ok_equiv else 'MISMATCH'}",
        f"- wall time local[8], bucketed runs: {times} s (min {min(times)})",
        f"- wall time local[8], naive full corpus: {naive_time} s",
        f"- verdict: {'PASS' if ok else 'FAIL'}",
        "",
        "Why this scales: the join is an EQUALITY join on (shard,",
        "bucket) — hash partitioned, AQE-skew-splittable — with the",
        "containment residual applied per same-bucket pair only. The",
        "naive key-only join evaluates |P_k| x |I_k| residual pairs per",
        f"shard ({n_points // 2 * K_IVALS / 1e6:,.0f}M on the hot shard"
        " here, and it only stays",
        "feasible at this scale because 96k intervals BROADCAST; at",
        "10^12 docs the interval side is billions of sessions, the",
        "broadcast is impossible, and the key-only SMJ buffers every",
        "hot-shard pair through one task). The bucketed plan's work is",
        "linear in matches + the interval-length/bucket blow-up at any",
        "scale.",
    ]
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH", "INTERVALS.md"),
        "w",
    ) as f:
        f.write("\n".join(lines) + "\n")
    print("\n".join(lines))
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
