"""Round-6 optimization regression tests.

Every r6 change is a pure performance restructure — these tests pin the
"results identical" half of each claim plus the plan shape the
optimization bought (OPTIMIZATION_r06.md documents the timing half).
"""

import io
import contextlib
import re

from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    # shuffle exchanges only (BroadcastExchange is a different node)
    return len(re.findall(r"\n\(\d+\) Exchange\n", plan))


def _old_events_pipeline(events, gap="30 minutes"):
    """The pre-r6 composition (windows first, as-of last) — kept here
    as the equivalence reference for the reordered flagship."""
    from featurewiz_spark.operators.asof import asof_join
    from featurewiz_spark.operators.timefeatures import add_calendar_features
    from featurewiz_spark.operators.windows import (
        duration_between_rows,
        lag_lead,
        rolling_agg,
        sessionize,
    )

    df = events
    df = lag_lead(df, "user_id", "ts", "value", lags=[1], leads=[1],
                  tie_break=["event_id"])
    df = rolling_agg(df, "user_id", "ts", "value", window_rows=7,
                     aggs=["avg", "sum"], tie_break=["event_id"])
    df = rolling_agg(df, "user_id", "ts", "value", aggs=["cumsum"],
                     tie_break=["event_id"])
    df = sessionize(df, "user_id", "ts", gap=gap)
    df = duration_between_rows(df, "user_id", "ts")
    df = add_calendar_features(df, "ts", prefix="cal", crosses=False)
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("snap_ts"),
        F.col("value").alias("purchase_value"),
    )
    return asof_join(df, purchases, on="user_id", left_ts="ts",
                     right_ts="snap_ts", tolerance="7 days", strict=True,
                     suffix="_asof")


def test_flagship_reorder_identical_and_single_exchange(spark):
    """asof-first composition: same rows, same column order, ONE
    shuffle exchange (the old plan had two — the union re-shuffled all
    43 feature columns)."""
    from featurewiz_spark.plans.pipeline import events_feature_pipeline

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    new = events_feature_pipeline(ev)
    old = _old_events_pipeline(ev)
    assert new.columns == old.columns
    assert new.exceptAll(old).count() == 0
    assert old.exceptAll(new).count() == 0
    assert _n_exchanges(_plan(new)) == 1


def test_lsh_pair_dedup_hashagg_not_sortagg(spark):
    """The (a, b) pair dedup must run as HashAggregate: carrying the
    minhash arrays through dropDuplicates forced a SortAggregate
    fallback pre-r6."""
    from featurewiz_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from featurewiz_spark.cache import release_caches

    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sigs = minhash_signatures(df, "text", "doc_id", num_hashes=16, shingle_k=3)
    cand = minhash_lsh_pairs(sigs, "doc_id", bands=8, rows_per_band=2,
                             jaccard_threshold=0.2, max_bucket_size=500)
    plan = _plan(cand)
    release_caches()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan


def test_lsh_pairs_unique_and_est_exact(spark):
    """Pairs stay unique across bands after the est-before-dedup
    restructure, and jaccard_est still equals the exact fraction of
    equal minhash components."""
    from featurewiz_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from featurewiz_spark.cache import release_caches

    df = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    sigs = minhash_signatures(df, "text", "doc_id", num_hashes=16, shingle_k=3)
    rows = minhash_lsh_pairs(sigs, "doc_id", bands=8, rows_per_band=2,
                             jaccard_threshold=0.2,
                             max_bucket_size=500).collect()
    mh = {r["doc_id"]: r["minhash"] for r in sigs.collect()}
    release_caches()
    seen = set()
    for r in rows:
        a, b = r["a"], r["b"]
        assert a < b
        assert (a, b) not in seen, "duplicate pair across bands"
        seen.add((a, b))
        exact = sum(x == y for x, y in zip(mh[a], mh[b])) / len(mh[a])
        assert abs(r["jaccard_est"] - exact) < 1e-12
    assert seen, "expected at least one candidate pair in the testdata"


def test_apply_robots_preserves_duplicate_urls(spark):
    """The r6 single-pass verdict computes per page ROW (in-plan array
    expression), so duplicate urls keep their multiplicity — the old
    groupBy(url)+join-back shape silently assumed url uniqueness."""
    from featurewiz_spark.text.robots import apply_robots

    rules = spark.createDataFrame(
        [("a.example", False, "/private", 8), ("a.example", True, "/private/ok", 11)],
        "host string, allow boolean, prefix string, prefix_len int",
    )
    pages = spark.createDataFrame(
        [
            ("https://a.example/private/x", 1),
            ("https://a.example/private/x", 2),   # duplicate url, distinct row
            ("https://a.example/private/ok/y", 3),
            ("https://a.example/pub", 4),
            ("https://other.example/anything", 5),
        ],
        "url string, rowid int",
    )
    out = {(r["rowid"], r["robots_allowed"]) for r in apply_robots(pages, rules).collect()}
    assert out == {(1, False), (2, False), (3, True), (4, True), (5, True)}
    assert len(out) == 5  # both duplicate-url rows survived


def test_pagerank_single_contrib_shuffle_per_iteration(spark):
    """Bit-identity of the hoisted dangling set is covered by
    test_pagerank.py; this pins the hoist itself — the dangling mass
    job must not re-run an anti-join per iteration (the flag is
    computed once before the loop)."""
    from featurewiz_spark.operators.pagerank import pagerank

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (4, 1)], "src long, dst long"
    )  # node 5 absent; 4 has out-edge; add a dangling node via dst-only
    edges = edges.union(spark.createDataFrame([(1, 5)], "src long, dst long"))
    r = {row["node"]: row["rank_fp"] for row in pagerank(edges, iterations=3).collect()}
    assert set(r) == {1, 2, 3, 4, 5}
    assert r[5] > 0  # dangling node still receives teleport + shares
    assert list(pagerank(edges, iterations=3).columns) == ["node", "rank_fp"]


def test_scoped_persist_eager_populates_and_releases(spark):
    from featurewiz_spark.cache import release_caches, scoped_persist

    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    p = scoped_persist(df, eager=True)
    # eager=True has already populated the cache
    assert p.storageLevel.useMemory
    assert p.count() == 1000
    assert release_caches() >= 1
    assert not p.storageLevel.useMemory
