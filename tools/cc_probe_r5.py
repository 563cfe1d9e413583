"""Round-5 at-scale probe: connected components (operators/components.py)
on a ~1.2M-edge near-dup-shaped pair graph with a genuinely hot hub.

Graph layout (all ids deterministic, no RNG):
- 300,000 planted 3-node clusters (pairs (3k, 3k+1), (3k+1, 3k+2)) —
  the organic bulk: 900k nodes, 600k edges, diameter 2.
- ONE hot star: a hub with 200,000 spokes (the "boilerplate page
  duplicated everywhere" shape). The hub appears in 200k edges, so the
  per-round edges x labels hash join sees a 200k-row hot key in BOTH
  probe partitionings — the skew the operator must survive without an
  unsplittable task.
- ONE chain of 40 edges — forces ~40 label-propagation rounds, which
  crosses the checkpoint_every=5 lineage cut eight times (the plan-
  growth guard is exercised, not just the happy 3-round path).

Asserts:
1. exact labels: every component's label is the minimum node id in it
   (closed-form expectations — clusters: 3k; star: min(hub, spokes);
   chain: its smallest id).
2. partition invariance: the full (node, component) result is
   checksum-identical between a 4-partition and a 64-partition run of
   the SAME input (path-independence is the operator's documented
   contract, cf. components.py docstring).
3. round count: convergence in <= chain_len + 2 rounds (the chain
   dominates; near-dup graphs without chains converge in single
   digits).

Also reports wall time per run (host-noise caveats as in
BENCH/BASELINE.md).

Usage: python tools/cc_probe_r5.py [n_clusters] [cores]
Appends a section to BENCH/COMPONENTS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_SPOKES = 200_000
CHAIN_LEN = 40


def build_edges(spark, n_clusters: int, n_parts: int):
    """Deterministic pair list: 3-node clusters + hot star + chain."""
    base = 3 * n_clusters
    hub = base  # hub id is the star's minimum (spokes are larger)
    spokes = spark.range(1, N_SPOKES + 1, numPartitions=n_parts).select(
        F.lit(hub).alias("a"), (F.lit(hub) + F.col("id")).alias("b")
    )
    chain_start = hub + N_SPOKES + 1
    chain = spark.range(CHAIN_LEN, numPartitions=1).select(
        (F.lit(chain_start) + F.col("id")).alias("a"),
        (F.lit(chain_start) + F.col("id") + 1).alias("b"),
    )
    clusters = spark.range(n_clusters, numPartitions=n_parts).select(
        F.explode(
            F.array(
                F.struct(
                    (3 * F.col("id")).alias("a"),
                    (3 * F.col("id") + 1).alias("b"),
                ),
                F.struct(
                    (3 * F.col("id") + 1).alias("a"),
                    (3 * F.col("id") + 2).alias("b"),
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    return clusters.unionByName(spokes).unionByName(chain), hub, chain_start


def run_once(spark, n_clusters: int, n_parts: int):
    from featurewiz_spark.operators.components import connected_components

    edges, hub, chain_start = build_edges(spark, n_clusters, n_parts)
    t0 = time.time()
    comp = connected_components(edges, "a", "b", max_iter=CHAIN_LEN + 5)
    # ONE aggregation pass computes every assertion input + the checksum
    stats = comp.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.count_distinct("component").alias("n_comps"),
        # exact-label checks, closed form per region:
        F.sum(
            F.when(
                (F.col("node") < 3 * n_clusters)
                & (F.col("component") != F.col("node") - F.pmod(F.col("node"), 3)),
                1,
            ).otherwise(0)
        ).alias("bad_cluster"),
        F.sum(
            F.when(
                (F.col("node") >= hub)
                & (F.col("node") <= hub + N_SPOKES)
                & (F.col("component") != hub),
                1,
            ).otherwise(0)
        ).alias("bad_star"),
        F.sum(
            F.when(
                (F.col("node") >= chain_start) & (F.col("component") != chain_start),
                1,
            ).otherwise(0)
        ).alias("bad_chain"),
        # bit_xor: order-independent, overflow-free under ANSI (a SUM of
        # 1.1M xxhash64 values overflows int64); nodes are distinct so
        # no pair can self-cancel
        F.expr("bit_xor(xxhash64(node, component))").alias("checksum"),
    ).first()
    wall = time.time() - t0
    return stats, wall


def main() -> None:
    n_clusters = int(sys.argv[1]) if len(sys.argv) > 1 else 300_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    from featurewiz_spark import get_spark

    spark = get_spark(f"cc_probe_{cores}", cores=cores,
                      shuffle_partitions=4 * cores)
    spark.sparkContext.setLogLevel("ERROR")

    results = []
    for n_parts in (4, 64):
        stats, wall = run_once(spark, n_clusters, n_parts)
        results.append((n_parts, stats, wall))
        print(f"parts={n_parts}: nodes={stats['n_nodes']:,} "
              f"comps={stats['n_comps']:,} bad_cluster={stats['bad_cluster']} "
              f"bad_star={stats['bad_star']} bad_chain={stats['bad_chain']} "
              f"checksum={stats['checksum']} wall={wall:.1f}s", flush=True)

    (p1, s1, w1), (p2, s2, w2) = results
    n_nodes_exp = 3 * n_clusters + (N_SPOKES + 1) + (CHAIN_LEN + 1)
    n_comps_exp = n_clusters + 2
    ok = (
        s1["n_nodes"] == s2["n_nodes"] == n_nodes_exp
        and s1["n_comps"] == s2["n_comps"] == n_comps_exp
        and s1["bad_cluster"] == s2["bad_cluster"] == 0
        and s1["bad_star"] == s2["bad_star"] == 0
        and s1["bad_chain"] == s2["bad_chain"] == 0
        and s1["checksum"] == s2["checksum"]
    )
    verdict = "PASS" if ok else "FAIL"
    n_edges = 2 * n_clusters + N_SPOKES + CHAIN_LEN
    lines = [
        "",
        f"## Connected-components probe — {n_edges:,} edges, "
        f"local[{cores}] (2026-08-19)",
        "",
        f"- layout: {n_clusters:,} 3-node clusters + ONE {N_SPOKES:,}-spoke "
        f"hot star (hub appears in every spoke edge — the per-round hash "
        f"join's hot key) + a {CHAIN_LEN}-edge chain (forces ~{CHAIN_LEN} "
        f"rounds across {CHAIN_LEN // 5} localCheckpoint lineage cuts)",
        f"- exact labels (closed form): bad_cluster={s1['bad_cluster']}, "
        f"bad_star={s1['bad_star']}, bad_chain={s1['bad_chain']} (all must "
        f"be 0); components={s1['n_comps']:,} (expected {n_comps_exp:,})",
        f"- partition invariance: checksum {s1['checksum']} @ {p1} parts "
        f"== {s2['checksum']} @ {p2} parts -> "
        f"{'identical' if s1['checksum'] == s2['checksum'] else 'MISMATCH'}",
        f"- wall {w1:.1f}s / {w2:.1f}s",
        f"- verdict: {verdict}",
    ]
    md = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "BENCH", "COMPONENTS.md")
    header = "# Connected-components at-scale probes\n"
    if not os.path.exists(md):
        with open(md, "w") as f:
            f.write(header)
    with open(md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(verdict)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
