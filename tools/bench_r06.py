"""Round-6 optimization measurement harness (bench.py is FROZEN).

Per-query noop-sink timing (guide §1.4) with job labels (§1.5), plus
.explain("formatted") capture to plans/r06/<query>_<tag>.txt. Does NOT
touch bench.py or BENCH/BASELINE.md.

Usage:
  python tools/bench_r06.py [--sf /root/testdata/sf1.0] [--tag before]
                            [--queries q31_minhash_lsh,...] [--reps 3]
                            [--plans] [--stages]
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

HEADLINE = [
    "q01_groupby_agg",
    "q02_dim_join_revenue",
    "q04_asof_purchase",
    "q05_sessionize",
    "q06_lag_rolling",
    "q20_exact_dedup",
    "q29_cosine_topk",
    "q31_minhash_lsh",
    "q62_curation_pipeline",
]


def _materialize(df):
    df.write.format("noop").mode("overwrite").save()


def _plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR",
                                                   "/root/testdata/sf1.0"))
    ap.add_argument("--tag", default=None,
                    help="when set, write plans/r06/<q>_<tag>.txt")
    ap.add_argument("--queries", default=None)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--flagship", action="store_true")
    args = ap.parse_args()

    from featurewiz_spark import get_spark
    from featurewiz_spark.cache import release_caches
    import __spark_entry__ as e

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench_r06", cores=cpus, shuffle_partitions=max(cpus, 8))
    sc = spark.sparkContext

    names = args.queries.split(",") if args.queries else list(HEADLINE)
    qs = e.queries()
    out = {}
    for name in names:
        fn = qs[name]
        times = []
        for rep in range(args.reps):
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = fn(spark, args.sf)
            _materialize(df)
            times.append(round(time.time() - t0, 3))
            release_caches()
        sc.setJobDescription(None)
        out[name] = {"min": min(times), "times": times}
        print(f"{name}: min={min(times)} {times}", flush=True)
        if args.tag:
            os.makedirs("/root/repo/plans/r06", exist_ok=True)
            df = fn(spark, args.sf)
            with open(f"/root/repo/plans/r06/{name}_{args.tag}.txt", "w") as f:
                f.write(_plan_str(df))
            release_caches()

    if args.flagship:
        from featurewiz_spark.plans.pipeline import events_feature_pipeline
        ev = spark.read.parquet(os.path.join(args.sf, "events.parquet"))
        times = []
        for rep in range(args.reps):
            sc.setJobDescription(f"flagship rep{rep}")
            t0 = time.time()
            _materialize(events_feature_pipeline(ev))
            times.append(round(time.time() - t0, 3))
        out["flagship_events_pipeline"] = {"min": min(times), "times": times}
        print(f"flagship: min={min(times)} {times}", flush=True)
        if args.tag:
            os.makedirs("/root/repo/plans/r06", exist_ok=True)
            df = events_feature_pipeline(ev)
            with open(f"/root/repo/plans/r06/flagship_events_pipeline_{args.tag}.txt",
                      "w") as f:
                f.write(_plan_str(df))

    print(json.dumps({k: v["min"] for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
