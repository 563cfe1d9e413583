"""Fixed-point PageRank (operators/pagerank.py): bit-exact equality
with a pure-Python reference of the same integer recurrence, partition
invariance, dangling-mass handling, and the unrolled SQL mirror."""

from __future__ import annotations

import duckdb
import pytest

from featurewiz_spark.operators.pagerank import SCALE, pagerank, pagerank_sql


def _py_pagerank(edge_list, iterations=10):
    """Reference implementation of the pinned integer recurrence."""
    nodes = sorted({s for s, _ in edge_list} | {t for _, t in edge_list})
    n = len(nodes)
    base = SCALE // n
    deg: dict = {}
    for s, _ in edge_list:
        deg[s] = deg.get(s, 0) + 1
    r = {v: base for v in nodes}
    for _ in range(iterations):
        dang = sum(r[v] for v in nodes if v not in deg)
        inc: dict = {}
        for s, t in edge_list:
            inc[t] = inc.get(t, 0) + r[s] // deg[s]
        r = {
            v: (3 * base) // 20 + (17 * (inc.get(v, 0) + dang // n)) // 20
            for v in nodes
        }
    return r


EDGES = [
    # hub-and-spoke + a chain + a dangling sink (5 receives, no out)
    (1, 2), (1, 3), (1, 4), (2, 1), (3, 1), (4, 5), (2, 5),
    (6, 1), (6, 7), (7, 6),
]


def test_pagerank_bit_exact_vs_python(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(edges, iterations=10).collect()
    }
    assert got == _py_pagerank(EDGES, iterations=10)
    # the hub receives the most link mass
    assert max(got, key=got.get) == 1


def test_pagerank_partition_invariant(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    a = {
        r["node"]: r["rank_fp"]
        for r in pagerank(edges.repartition(1), iterations=7).collect()
    }
    b = {
        r["node"]: r["rank_fp"]
        for r in pagerank(edges.repartition(13, "dst"), iterations=7).collect()
    }
    assert a == b


def test_pagerank_sql_mirror_matches(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    got = {
        r["node"]: r["rank_fp"]
        for r in pagerank(edges, iterations=6).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE e (src BIGINT, dst BIGINT)")
    con.executemany("INSERT INTO e VALUES (?, ?)", EDGES)
    oracle = dict(con.execute(pagerank_sql("e", iterations=6)).fetchall())
    assert got == oracle


def test_pagerank_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert pagerank(edges, iterations=3).count() == 0


def test_pagerank_mass_conservation_bound(spark):
    """Total mass decays only by DIV remainders: bounded, never grows."""
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    out = pagerank(edges, iterations=10).collect()
    total = sum(r["rank_fp"] for r in out)
    n = len({s for s, _ in EDGES} | {t for _, t in EDGES})
    # per iteration the floor losses are < (#edges + 2N + 2) units
    assert 0 < total <= SCALE
    assert total > SCALE - 10 * (len(EDGES) + 2 * n + 2) * 20
