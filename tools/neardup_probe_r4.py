"""Round-4 at-scale probe: banded embedding near-dup (VERDICT r3 item 5/8).

cosine_near_dup_pairs moved from ONE n_planes LSH signature to n_bands
independent signatures (candidate = collide in ANY band). This probe
evidences, at ~1M rows with a genuinely hot direction:

1. **Recall**: planted near-dup pairs at true cosines 0.86/0.90/0.96
   (constructed exactly: v = c*u + sqrt(1-c^2)*w_perp on unit vectors),
   detection threshold 0.85. Reported single-signature (n_bands=1,
   band 0 reuses the same seed) vs banded (n_bands=4) — theory says
   p = (1-acos(c)/pi)^n_planes per band, 1-(1-p)^b overall.
2. **Bounded tasks under a hot key**: 50k vectors share one direction
   (cos ~0.9999 to each other) and therefore land in ONE bucket in
   EVERY band. max_bucket_size drops those (band,bucket) groups — the
   probe reports the max per-(band,bucket) group size actually reaching
   the O(bucket^2) kernel, before and after the cap.
3. Wall time (min-of-k, warm-up dropped; host-noise caveats as in
   BENCH/BASELINE.md).

Vector generation is per-row deterministic — rng seeded by row id, so
the corpus is identical at any partitioning/parallelism.

Usage: python tools/neardup_probe_r4.py [n_base] [cores]
Appends a section to BENCH/ANN.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

DIM = 16
N_PLANES = 10
THRESH = 0.85
CAP = 20000
HOT = 50000
PLANTED = 2000
TARGETS = [0.86, 0.90, 0.96]
HOT_SEED = 2**40


def _unit(v):
    return v / np.linalg.norm(v)


def _base_vec(i: int) -> np.ndarray:
    return np.random.default_rng(np.random.PCG64(int(i))).standard_normal(DIM)


def _gen(n_base: int):
    """mapInPandas generator factory: id -> embedding, deterministic per id."""
    hot_dir = _unit(_base_vec(HOT_SEED))

    def gen(batches):
        for pdf in batches:
            out = []
            for i in pdf["id"]:
                i = int(i)
                if i < n_base:  # organic corpus
                    v = _unit(_base_vec(i))
                elif i < n_base + PLANTED:  # planted near-dup of source
                    src = i - n_base
                    c = TARGETS[src % len(TARGETS)]
                    u = _unit(_base_vec(src))
                    w = _base_vec(i)
                    w = w - (w @ u) * u
                    v = c * u + np.sqrt(1.0 - c * c) * _unit(w)
                else:  # hot cluster: one direction, tiny jitter
                    v = _unit(hot_dir + 0.005 * _base_vec(i))
                out.append(v.tolist())
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": out})

    return gen


def main() -> None:
    global N_PLANES, CAP
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # r5: n_planes scales with log2(n) to keep organic buckets under the
    # cap (avg bucket = n / 2^n_planes) — 10M run: 14 planes
    if len(sys.argv) > 3:
        N_PLANES = int(sys.argv[3])
    if len(sys.argv) > 4:
        CAP = int(sys.argv[4])

    from featurewiz_spark import get_spark
    from featurewiz_spark.operators.similarity import (
        cosine_near_dup_pairs,
        lsh_bucket_bands,
    )

    spark = get_spark("neardup_r4", cores=cores, shuffle_partitions=cores * 4)
    n_total = n_base + PLANTED + HOT
    df = (
        spark.range(n_total)
        .repartition(cores * 4)
        .mapInPandas(_gen(n_base), "vec_id long, embedding array<double>")
        .persist()
    )
    df.count()

    # planted truth: (src, dup_id, true cosine) — all above THRESH
    planted = {(s, n_base + s) for s in range(PLANTED)}

    # --- bucket-size evidence (hot key) --------------------------------
    sizes = (
        lsh_bucket_bands(df, n_planes=N_PLANES, n_bands=4, dim=DIM)
        .groupBy("lsh_band", "lsh_bucket")
        .count()
    )
    pre = sizes.agg(F.max("count")).first()[0]
    post = sizes.filter(F.col("count") <= CAP).agg(F.max("count")).first()[0]
    dropped = sizes.filter(F.col("count") > CAP).count()

    # --- recall + wall: single signature vs banded ---------------------
    def run(n_bands: int):
        t, found = [], None
        for k in range(3):
            t0 = time.time()
            pairs = cosine_near_dup_pairs(
                df, threshold=THRESH, n_planes=N_PLANES,
                n_bands=n_bands, max_bucket_size=CAP,
            )
            got = {
                (r["a"], r["b"])
                for r in pairs.filter(
                    (F.col("a") < n_base) & (F.col("b") >= n_base)
                    & (F.col("b") < n_base + PLANTED)
                ).collect()
            }
            t.append(time.time() - t0)
            found = got
        return min(t[1:]), t, len(found & planted)

    s_sec, s_all, s_found = run(1)
    b_sec, b_all, b_found = run(4)

    lines = [
        "",
        f"## Round-4 banded near-dup probe ({n_total:,} rows, dim {DIM}, "
        f"local[{cores}])",
        "",
        f"Corpus: {n_base:,} organic + {PLANTED} planted dup pairs (true "
        f"cosines {TARGETS}) + {HOT:,}-vector hot cluster sharing one "
        f"direction. threshold={THRESH}, n_planes={N_PLANES}, cap={CAP}.",
        "",
        "| variant | planted recall | wall sec (min-of-k) | runs |",
        "|---|---|---|---|",
        f"| single signature (n_bands=1) | {s_found}/{PLANTED} = "
        f"{s_found/PLANTED:.3f} | {s_sec:.2f} | "
        f"{', '.join(f'{x:.1f}' for x in s_all)} |",
        f"| banded (n_bands=4) | {b_found}/{PLANTED} = "
        f"{b_found/PLANTED:.3f} | {b_sec:.2f} | "
        f"{', '.join(f'{x:.1f}' for x in b_all)} |",
        "",
        f"Hot-key task bound: max per-(band,bucket) group {pre:,} rows "
        f"pre-cap -> {post:,} post-cap ({dropped} capped groups dropped "
        "— the documented coverage guard; every hot-cluster bucket is "
        "one of them, so no O(bucket^2) kernel ever sees the hot key).",
        "",
    ]
    out = "\n".join(lines)
    print(out)
    bench = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "ANN.md")
    with open(bench, "a") as f:
        f.write(out)
    spark.stop()


if __name__ == "__main__":
    main()
