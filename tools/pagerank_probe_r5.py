"""Round-5 at-scale probe: fixed-point PageRank (operators/pagerank.py)
at 1M+ edges with a 200k-spoke hot hub and real dangling mass.

Evidences (per-round probe discipline):

1. **Partition invariance at volume**: the full rank vector is
   bit-identical between parallelism 4 and 32 (XOR-fold checksum of
   xxhash64(node, rank_fp)) — integer arithmetic leaves nothing to
   scheduling, even with a 200k-in-degree hub.
2. **Cross-engine exactness at volume**: the same 1M-edge graph through
   the unrolled MATERIALIZED-CTE DuckDB mirror produces the identical
   checksum — the fixed-point recurrence is engine-free.
3. **Wall time** per iteration at both parallelism levels.

Graph (deterministic, no RNG): nodes 0..N-1.
- chain edges i -> (i+1) % N for i % 17 != 0   (most nodes have deg 1)
- hub spokes: i -> 0 for i in [1, 200k]        (hot aggregation key)
- fan-out from hub: 0 -> 7j+1 (j<50)           (hub has deg 50)
- danglers: nodes with i % 17 == 0 and not spokes emit nothing

Usage: python tools/pagerank_probe_r5.py [n_nodes] [iterations]
Appends a section to BENCH/PAGERANK.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SPOKES = 200_000


def edges_df(spark, n_nodes: int):
    base = spark.range(n_nodes)
    chain = base.where("id % 17 != 0").selectExpr(
        "id AS src", f"(id + 1) % {n_nodes} AS dst"
    )
    spokes = spark.range(1, SPOKES + 1).selectExpr(
        "id AS src", "CAST(0 AS BIGINT) AS dst"
    )
    fan = spark.range(50).selectExpr(
        "CAST(0 AS BIGINT) AS src", f"(7 * id + 1) % {n_nodes} AS dst"
    )
    return chain.unionAll(spokes).unionAll(fan)


def edges_sql(n_nodes: int) -> str:
    return f"""(
        SELECT i AS src, (i + 1) % {n_nodes} AS dst
        FROM range({n_nodes}) t(i) WHERE i % 17 <> 0
        UNION ALL
        SELECT i, 0 FROM range(1, {SPOKES + 1}) t(i)
        UNION ALL
        SELECT 0, (7 * i + 1) % {n_nodes} FROM range(50) t(i)
    )"""


def checksum(df) -> int:
    return df.select(
        F.bit_xor(F.xxhash64("node", "rank_fp")).alias("x")
    ).first()["x"]


def main() -> None:
    n_nodes = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from featurewiz_spark.operators.pagerank import pagerank, pagerank_sql
    from featurewiz_spark.session import get_spark

    spark = get_spark("pagerank-probe")
    n_edges = edges_df(spark, n_nodes).count()
    print(f"graph: {n_nodes} nodes, {n_edges} edges, hub in-degree {SPOKES}")

    results = {}
    for par in (4, 32):
        e = edges_df(spark, n_nodes).repartition(par, "src")
        t0 = time.time()
        ranks = pagerank(e, iterations=iters)
        cs = checksum(ranks)
        dt = time.time() - t0
        results[par] = (cs, dt)
        print(f"parallelism={par}: checksum={cs:#x}, "
              f"{dt:.1f}s ({dt/iters:.2f}s/iter)")
    assert results[4][0] == results[32][0], "partition-variant ranks!"

    # cross-engine: the identical recurrence in DuckDB
    import duckdb

    t0 = time.time()
    con = duckdb.connect()
    rows = con.execute(
        pagerank_sql(edges_sql(n_nodes), iterations=iters)
    ).fetchall()
    duck_s = time.time() - t0
    # same checksum via Spark's xxhash64 over the DuckDB result
    ddf = spark.createDataFrame(rows, "node long, rank_fp long")
    duck_cs = checksum(ddf)
    print(f"duckdb mirror: {len(rows)} rows, checksum={duck_cs:#x}, "
          f"{duck_s:.1f}s")
    assert duck_cs == results[4][0], "engine-divergent ranks!"

    md = (
        f"\n## PageRank probe ({n_nodes} nodes, {n_edges} edges, "
        f"{SPOKES}-spoke hub, {iters} iterations)\n\n"
        f"- partition invariance: rank-vector checksum identical at "
        f"parallelism 4 and 32 (`{results[4][0]:#x}`)\n"
        f"- cross-engine exactness: the DuckDB MATERIALIZED-CTE mirror "
        f"reproduces the identical checksum at 1M-edge scale "
        f"({duck_s:.1f}s single-threaded)\n"
        f"- wall: {results[4][1]:.1f}s @4 ({results[4][1]/iters:.2f}s/iter), "
        f"{results[32][1]:.1f}s @32 ({results[32][1]/iters:.2f}s/iter) — "
        f"per-iteration cost is one contrib aggregate (map-side combine "
        f"absorbs the hub's {SPOKES} spokes) + one scalar dangling sum\n"
    )
    with open(
        os.path.join(os.path.dirname(__file__), "..", "BENCH", "PAGERANK.md"),
        "a",
    ) as f:
        f.write(md)
    print("appended BENCH/PAGERANK.md")


if __name__ == "__main__":
    main()
