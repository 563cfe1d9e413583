"""Round-4 skew evidence: the last two "one key = one task" windows,
rewritten (VERDICT r3 item 1), probed at 1M rows with hot keys.

1. trend_seasonality — was ``sum(value) over (partitionBy(ts))``: every
   row sharing a timestamp in ONE window task. Now two hash aggregates
   (map-side partials) + a broadcastable join. Probe: coarse daily ts
   where one day holds 30% of all rows.
2. ordered_target_encode — was ``Window.partitionBy(cat).orderBy(ts)``:
   a whole category in one sorted task, and featurewiz categories are
   ≤35-cardinality so at scale EVERY category is hot. Now bucketed:
   in-bucket running window + per-bucket carry spine. Probe: 5
   categories over 1M rows (max category ≈ 40%).

Each probe reports (a) bit-level equivalence of old vs new at round(6)
via a full-result checksum, (b) the scale metric — max rows any single
window task must hold, (c) wall sec (min-of-k, warm-up dropped; host
noise caveats as in BENCH/BASELINE.md).

Usage: python tools/skew_bench_r4.py [rows] [cores]
Appends results to BENCH/SKEW.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def _run(fn, k=4):
    times = []
    for _ in range(k):
        t0 = time.time()
        fn().write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    return min(times[1:]), times


def _checksum(df, cols):
    """Order-insensitive checksum of the full result (xor of row hashes
    — same discipline as BENCH/SKEW.md's as-of probes). bit_xor, not
    sum: ANSI mode throws on long-sum overflow."""
    h = F.xxhash64(*[F.col(c).cast("string") for c in cols])
    return df.select(h.alias("h")).agg(F.expr("bit_xor(h)").alias("c")).first()["c"]


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from featurewiz_spark import get_spark
    from featurewiz_spark.operators.encoders import ordered_target_encode
    from featurewiz_spark.operators.groupby import trend_seasonality

    spark = get_spark("skew_r4", cores=cores, shuffle_partitions=cores * 4)

    # ---- fixture: 1M events, 90 distinct days, day 0 holds 30% of rows,
    # 5 categories with category 'c0' holding 40% ----
    hot_ts_rows = int(rows * 0.30)
    base = spark.range(rows).select(
        F.col("id"),
        F.when(F.col("id") < int(rows * 0.40), F.lit("c0"))
        .otherwise(
            F.concat(F.lit("c"), F.pmod(F.xxhash64("id", F.lit(1)), F.lit(5)))
        )
        .alias("cat"),
        F.to_date(
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(
                days=F.when(F.col("id") < hot_ts_rows, F.lit(0)).otherwise(
                    F.pmod(F.xxhash64("id", F.lit(2)), F.lit(90))
                )
            )
        ).alias("day"),
        # micro-second jittered timestamp for the ordered-TE probe
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(
                secs=F.pmod(F.xxhash64("id", F.lit(5)), F.lit(360 * 86400))
                + F.pmod(F.xxhash64("id", F.lit(6)), F.lit(1000)) / 1000.0
            )
        ).alias("ts"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(10000)) / 100.0).alias("value"),
    )
    ev = base.repartition(cores * 4).cache()
    n = ev.count()

    lines = [
        "",
        "## Round-4: the last two one-key-one-task windows, rewritten",
        "",
        f"Fixture: {n:,} rows; day 0 holds 30% of all timestamps; 5 "
        f"categories, hottest 40%; local[{cores}]; min-of-3 after "
        "warm-up.",
        "",
    ]

    # ================= probe 1: trend_seasonality =================
    def old_trend():
        w_ct = Window.partitionBy("cat", "day")
        w_t = Window.partitionBy("day")
        t = F.try_divide(F.sum("value").over(w_ct), F.sum("value").over(w_t))
        return ev.withColumn("trend", t).withColumn(
            "season", F.try_divide(F.col("value"), F.col("trend"))
        )

    def new_trend():
        return trend_seasonality(ev, "cat", "day", "value",
                                 season_col="season")

    r6 = lambda d: d.select(
        "id", F.round("trend", 6).alias("t"), F.round("season", 6).alias("s")
    )
    cs_old = _checksum(r6(old_trend()), ["id", "t", "s"])
    cs_new = _checksum(r6(new_trend()), ["id", "t", "s"])
    eq1 = "EQUAL" if cs_old == cs_new else "MISMATCH"
    sec_old, all_old = _run(old_trend)
    sec_new, all_new = _run(new_trend)
    # scale metric: rows the largest single window task holds (old) vs
    # the largest post-aggregation group the new plan ever materializes
    # (= 1 row per (cat,day) group — map-side partials collapse dups)
    max_ts_rows = ev.groupBy("day").count().agg(F.max("count")).first()[0]
    n_groups = ev.select("cat", "day").distinct().count()
    lines += [
        "### trend_seasonality: hot-ts window → two hash aggregates + join",
        "",
        "| variant | wall sec | max rows in one window task |",
        "|---|---|---|",
        f"| old: sum over (partitionBy ts) window | {sec_old:.2f} | "
        f"{max_ts_rows:,} (hot day, unsplittable) |",
        f"| new: groupBy(cat,ts)+groupBy(ts)+join | {sec_new:.2f} | "
        f"0 (no window; agg tables {n_groups:,} rows, broadcast join) |",
        "",
        f"checksum old {cs_old} vs new {cs_new} → **{eq1}** at round(6), "
        f"{n:,} rows",
        f"raw old: {[round(t, 2) for t in all_old]}; "
        f"raw new: {[round(t, 2) for t in all_new]}",
        "",
    ]

    # ================= probe 2: ordered_target_encode =================
    def plain_ote():
        return ordered_target_encode(ev, "cat", "value", "ts", prior=50.0)

    def bucketed_ote():
        return ordered_target_encode(ev, "cat", "value", "ts", prior=50.0,
                                     bucket="7 days")

    # equivalence criterion: max |plain − bucketed| over ALL rows. A
    # round-k checksum is the wrong tool here — cumulative bucket sums
    # associate differently than one 500k-element running sum, giving
    # ~1e-12 diffs that land a handful of 1M rows exactly on a rounding
    # cliff (measured: max_abs 1.0e-12, 22/1M round(6)-cliff rows, 0
    # rows beyond 1e-9). The probe passes iff max_abs ≤ 1e-9, i.e. the
    # variants agree to far below any output rounding the engine ships.
    j = (
        plain_ote().select("id", F.col("cat_ordered_te").alias("pe"))
        .join(bucketed_ote().select("id", F.col("cat_ordered_te").alias("be")),
              "id")
    )
    d_stats = j.select(
        F.max(F.abs(F.col("pe") - F.col("be"))).alias("mx"),
        F.sum((F.round("pe", 6) != F.round("be", 6)).cast("long")).alias("cliff"),
    ).first()
    max_abs, cliff = float(d_stats["mx"]), int(d_stats["cliff"])
    eq2 = "EQUAL" if max_abs <= 1e-9 else "MISMATCH"
    sec_p, all_p = _run(plain_ote)
    sec_b, all_b = _run(bucketed_ote)
    max_cat = ev.groupBy("cat").count().agg(F.max("count")).first()[0]
    max_bkt = (
        ev.groupBy("cat", F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                                  / (7 * 86400 * 1_000_000)))
        .count().agg(F.max("count")).first()[0]
    )
    n_bkts = (
        ev.select("cat", F.floor(F.unix_micros(F.col("ts").cast("timestamp"))
                                 / (7 * 86400 * 1_000_000)).alias("b"))
        .distinct().groupBy("cat").count().agg(F.max("count")).first()[0]
    )
    lines += [
        "### ordered_target_encode: per-category window → bucketed + carry spine",
        "",
        "| variant | wall sec | max rows in one window task |",
        "|---|---|---|",
        f"| plain: running window per category | {sec_p:.2f} | "
        f"{max_cat:,} (hottest category; ALL categories hot at scale) |",
        f"| bucketed (7-day): in-bucket window + carry | {sec_b:.2f} | "
        f"{max_bkt:,} (bounded by bucket width; carry spine ≤ "
        f"{n_bkts:,} rows/category) |",
        "",
        f"max |plain − bucketed| = {max_abs:.2e} over {n:,} rows → "
        f"**{eq2}** (gate 1e-9; {cliff} rows land on a round(6) cliff "
        "at that ~1e-12 float-association scale — see tool docstring)",
        f"raw plain: {[round(t, 2) for t in all_p]}; "
        f"raw bucketed: {[round(t, 2) for t in all_b]}",
        "",
        "Same story as the as-of probes above: at this scale wall time "
        "mostly reflects fixed per-stage overheads, but the max-task "
        "column is what survives a 100× scale-up — the old plans' "
        "largest task grows linearly with the hot key while the new "
        "plans' stay bounded (or vanish entirely for "
        "trend_seasonality, which no longer has a window node).",
    ]

    print("\n".join(lines))
    if eq1 == "EQUAL" and eq2 == "EQUAL":
        with open("/root/repo/BENCH/SKEW.md", "a") as f:
            f.write("\n".join(lines) + "\n")
        print("\nappended to BENCH/SKEW.md")
    else:
        print("\nNOT writing SKEW.md — equivalence failed", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
