"""Distributed PageRank over a link graph — fixed-point integer
arithmetic for bit-exact, partition-invariant results.

Web-curation use: link-graph centrality is a classic page/domain
quality signal (alongside the NB classifier and C4/Gopher gates in
text/). The reference has no graph surface; this is engine-side, like
connected components (operators/components.py).

Why fixed-point: floating-point PageRank is not reproducible across
cluster sizes — distributed double sums are order-dependent, so the
same graph yields last-ulp-different ranks on 8 vs 800 executors,
which breaks the repo's partition-invariance discipline AND any exact
oracle compare. Here every quantity is a BIGINT in SCALE=10^12 units
and every step is integer arithmetic with a pinned shape:

    r0[n]     = SCALE DIV N
    contrib   = r[s] DIV out_deg[s]            (per edge s->t)
    inc[t]    = SUM(contrib)                   (exact integer sum)
    dang      = SUM(r[s] : s has no out-edge)
    r'[n]     = (3*(SCALE DIV N)) DIV 20
              + (17*(inc[n] + dang DIV N)) DIV 20

damping 0.85 is the exact rational 17/20, so no floats appear
anywhere; both Spark and any ANSI-SQL engine compute the identical
integers (all values positive — DIV/floor/truncate agree). Total mass
decays by the DIV remainders (bounded by N+1 units per iteration, i.e.
~1e-9 relative at N=1000) — a deterministic, documented semantic, not
an error term.

Scale design: per iteration ONE shuffle (contrib aggregate on dst) +
one broadcast-scalar dangling sum; ranks persist per round with the
previous round released, and lineage is cut by localCheckpoint every
``checkpoint_every`` rounds (same discipline as connected components).
Edges are the big table and are never modified or re-shuffled beyond
the per-iteration join on src — pre-partitioning edges by src lets AQE
reuse the layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 10**12


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    checkpoint_every: int = 5,
    out_col: str = "rank_fp",
) -> DataFrame:
    """Fixed-point PageRank (damping 17/20). Returns (node, rank_fp)
    with rank_fp in SCALE=10^12 units; divide by SCALE for the float
    rank. Deterministic and bit-identical across partitionings."""
    edges = edges.select(
        F.col(src).alias("__src"), F.col(dst).alias("__dst")
    ).where(F.col(src).isNotNull() & F.col(dst).isNotNull())
    # persist the edge list: it is consumed 2+iterations times, and an
    # unpersisted input would re-execute its ENTIRE upstream lineage
    # (e.g. WARC parse + link-extraction regexes) once per iteration —
    # measured 70s -> ~20s on the 100k-page end-to-end probe
    edges = edges.persist()
    # populate NOW: the nodes union below scans edges TWICE (src + dst
    # branches) inside one job — against an unpopulated cache both
    # branches re-execute the entire upstream lineage (WARC parse +
    # link extraction in the E2E probe) before the cache fills
    edges.count()

    nodes = (
        edges.select(F.col("__src").alias("node"))
        .union(edges.select(F.col("__dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.withColumn(out_col, F.lit(0).cast("long"))
    base = SCALE // n_nodes  # SCALE DIV N, computed once

    deg = edges.groupBy("__src").agg(F.count(F.lit(1)).alias("__deg")).persist()
    deg.count()

    # WHICH nodes are dangling (no out-edges) is static — only their
    # rank sum changes per iteration. Flag them once; the per-iteration
    # dangling mass is then a filter + sum over the ranks frame instead
    # of a node-scale anti-join (the old loop repeated that join every
    # round: one extra shuffle per iteration for a set that never
    # changes). Ranks are bit-identical by construction.
    flagged = (
        nodes.join(
            deg.select(F.col("__src").alias("node"),
                       F.lit(True).alias("__has_out")),
            "node",
            "left",
        )
        .select("node", F.col("__has_out").isNull().alias("__dangling"))
        .persist()
    )
    flagged.count()
    nodes.unpersist()

    ranks = flagged.withColumn(out_col, F.lit(base).cast("long")).persist()
    ranks.count()

    for it in range(iterations):
        # dangling mass: nodes with no out-edges (tiny scalar, exact)
        dang_row = (
            ranks.where(F.col("__dangling"))
            .agg(F.sum(out_col).alias("s"))
            .first()
        )
        dang = int(dang_row["s"] or 0)

        contrib = (
            edges.join(ranks, edges["__src"] == ranks["node"])
            .join(deg, "__src")
            .select(
                F.col("__dst").alias("node"),
                # integer division (DIV), NOT `/`: long / long is DOUBLE
                # division in Spark, whose rounding can cross an integer
                # boundary and break the bit-exact contract
                F.expr(f"{out_col} DIV __deg").alias("__c"),
            )
            .groupBy("node")
            .agg(F.sum("__c").alias("__inc"))
        )
        teleport = (3 * base) // 20  # exact Python int
        dang_share = dang // n_nodes
        new_ranks = (
            flagged.join(contrib, "node", "left")
            .select(
                "node",
                "__dangling",
                F.expr(
                    f"CAST({teleport} AS BIGINT) + "
                    f"(17 * (coalesce(__inc, CAST(0 AS BIGINT)) "
                    f"+ CAST({dang_share} AS BIGINT))) DIV 20"
                ).alias(out_col),
            )
        )
        if (it + 1) % checkpoint_every == 0 or it == iterations - 1:
            new_ranks = new_ranks.localCheckpoint()
        else:
            new_ranks = new_ranks.persist()
            new_ranks.count()
        ranks.unpersist()
        ranks = new_ranks

    deg.unpersist()
    flagged.unpersist()
    edges.unpersist()
    return ranks.select("node", out_col)


def pagerank_sql(
    edges_src: str,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    out_col: str = "rank_fp",
) -> str:
    """ANSI-SQL mirror: the SAME fixed-point recurrence unrolled as one
    CTE block per iteration — shares every constant with :func:`pagerank`
    so the two engines cannot drift. Every CTE is MATERIALIZED: DuckDB
    inlines plain CTEs at each reference, which re-evaluates the whole
    iteration chain exponentially (measured: 8 iterations over an
    863-edge graph ran >500 s un-materialized, <1 s materialized). ``edges_src`` is a table name or
    parenthesized subquery with columns (src, dst)."""
    pre = f"""
        __e AS MATERIALIZED (SELECT {src} AS s, {dst} AS t FROM {edges_src}
                WHERE {src} IS NOT NULL AND {dst} IS NOT NULL),
        __nodes AS MATERIALIZED (SELECT s AS node FROM __e UNION SELECT t FROM __e),
        __n AS MATERIALIZED (SELECT COUNT(*) AS n FROM __nodes),
        __base AS MATERIALIZED (SELECT CAST({SCALE} // n AS BIGINT) AS b, n FROM __n),
        __deg AS MATERIALIZED (SELECT s, COUNT(*) AS d FROM __e GROUP BY s),
        __r0 AS MATERIALIZED (SELECT node, (SELECT b FROM __base) AS r FROM __nodes)"""
    blocks = [pre]
    prev = "__r0"
    for i in range(1, iterations + 1):
        cur = f"__r{i}"
        blocks.append(f"""
        __dang{i} AS MATERIALIZED (
            SELECT COALESCE(SUM(r), 0) AS dg FROM {prev}
            WHERE node NOT IN (SELECT s FROM __deg)),
        __inc{i} AS MATERIALIZED (
            SELECT e.t AS node,
                   SUM(CAST(p.r // g.d AS BIGINT)) AS inc
            FROM __e e JOIN {prev} p ON e.s = p.node
                       JOIN __deg g ON e.s = g.s
            GROUP BY e.t),
        {cur} AS MATERIALIZED (
            SELECT n.node,
                   CAST(3 * (SELECT b FROM __base) // 20
                        + 17 * (COALESCE(i.inc, 0)
                                + (SELECT dg FROM __dang{i})
                                  // (SELECT n FROM __base)) // 20
                        AS BIGINT) AS r
            FROM __nodes n LEFT JOIN __inc{i} i ON n.node = i.node)""")
        prev = cur
    return (
        "WITH" + ",".join(blocks)
        + f"\n        SELECT node, r AS {out_col} FROM {prev}"
    )
