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


def test_bpe_kernel_matches_fold_on_trained_merges(spark):
    """The Arrow-kernel encode must be token-identical to the
    plan-folded replace chain on trained merges, including NULL text,
    empty text, delimiter bytes, literal '</w>' inside words, and
    non-ASCII."""
    from featurewiz_spark.text.bpe import (
        bpe_encode,
        bpe_train,
        bpe_word_counts,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog the the"),
        (2, "the quick quick brown brown fox fox"),
        (3, None),
        (4, ""),
        (5, "   \t \n "),
        (6, "café déjà vu café"),
        (7, "weird\x1fdelim\x1f bytes the"),
        (8, "literal </w> marker inside the text the"),
        (9, "aaaa abab ababab the"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = bpe_train(bpe_word_counts(df, "text"), 24)
    assert len(merges) == 24
    fold = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges, "text", engine="fold").collect()
    }
    kern = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, merges, "text", engine="kernel").collect()
    }
    assert fold == kern
    assert fold[3] is None and fold[4] == []


def test_bpe_kernel_matches_fold_fuzz(spark):
    """Deterministic fuzz: random short-alphabet corpora + merge lists
    TRAINED on them (so the lists are constructively ordered the same
    way production lists are), fold vs kernel must agree exactly."""
    import random

    from featurewiz_spark.text.bpe import (
        bpe_encode,
        bpe_train,
        bpe_word_counts,
    )

    rng = random.Random(42)
    for trial in range(4):
        alpha = "abcd"
        docs = []
        for i in range(60):
            words = [
                "".join(rng.choice(alpha) for _ in range(rng.randint(1, 6)))
                for _ in range(rng.randint(1, 8))
            ]
            docs.append((i, " ".join(words)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        merges = bpe_train(bpe_word_counts(df, "text"), 40)
        fold = bpe_encode(df, merges, "text", engine="fold") \
            .select("doc_id", "bpe_tokens").collect()
        kern = bpe_encode(df, merges, "text", engine="kernel") \
            .select("doc_id", "bpe_tokens").collect()
        f = {r["doc_id"]: r["bpe_tokens"] for r in fold}
        k = {r["doc_id"]: r["bpe_tokens"] for r in kern}
        assert f == k, f"trial {trial} diverged"


def test_bpe_auto_routing(spark):
    """engine='auto': plan-folded (zero Python) at or below
    FOLD_MAX_MERGES, Arrow kernel above it."""
    from featurewiz_spark.text import bpe as B

    df = spark.createDataFrame([(1, "ab ab ba")], "doc_id long, text string")
    small = [("a", "b")]
    # a big constructive list: chain merges that never fire
    big = [("a", "b")] + [("q", "x")] * (B.FOLD_MAX_MERGES)
    p_small = _plan(B.bpe_encode(df, small, "text"))
    p_big = _plan(B.bpe_encode(df, big, "text"))
    assert "ArrowEvalPython" not in p_small and "BatchEvalPython" not in p_small
    assert "ArrowEvalPython" in p_big
    # and both engines agree on the firing merge
    t1 = B.bpe_encode(df, small, "text", engine="fold").collect()[0]["bpe_tokens"]
    t2 = B.bpe_encode(df, small, "text", engine="kernel").collect()[0]["bpe_tokens"]
    assert t1 == t2 == ["ab", "</w>", "ab", "</w>", "b", "a", "</w>"]


def _train_reference(counts, num_merges):
    """The pre-r6 round-rescan trainer, kept verbatim as the
    equivalence reference for the incremental train_from_counts."""
    from featurewiz_spark.text.bpe import EOW, _merge_syms

    vocab = {}
    for word, cnt in counts.items():
        syms = tuple(word) + (EOW,)
        vocab[syms] = vocab.get(syms, 0) + int(cnt)
    merges = []
    for _ in range(int(num_merges)):
        pairs = {}
        for syms, cnt in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                if p[0].endswith(EOW):
                    continue
                pairs[p] = pairs.get(p, 0) + cnt
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        nxt = {}
        for syms, cnt in vocab.items():
            m = _merge_syms(syms, best)
            nxt[m] = nxt.get(m, 0) + cnt
        vocab = nxt
    return merges


def test_incremental_trainer_matches_reference():
    import random

    from featurewiz_spark.text.bpe import train_from_counts

    rng = random.Random(7)
    for trial in range(6):
        alpha = "abcdef"
        counts = {}
        for _ in range(rng.randint(5, 120)):
            w = "".join(rng.choice(alpha) for _ in range(rng.randint(1, 9)))
            counts[w] = counts.get(w, 0) + rng.randint(1, 50)
        n = rng.choice([1, 3, 17, 60, 500])
        assert train_from_counts(counts, n) == _train_reference(counts, n), (
            f"trial {trial} diverged"
        )
    # exhaustion: more merges requested than learnable
    assert train_from_counts({"ab": 3}, 100) == _train_reference({"ab": 3}, 100)
    # literal EOW text inside a word
    c = {"x</w>y": 5, "xy": 2}
    assert train_from_counts(c, 20) == _train_reference(c, 20)


def test_write_warc_null_timestamp_no_crash(spark, tmp_path):
    """ADVICE r5: a NULL timestamp arrives as pandas NaT in
    mapInPandas; the old `ts is not None` guard let NaT through and
    pd.Timestamp(NaT).strftime killed the export task. The documented
    epoch fallback must actually engage."""
    import pandas as pd

    from featurewiz_spark.sources.warc import read_warc, write_warc

    rows = [
        ("https://w.example/ok",
         pd.Timestamp("2024-03-01T10:00:00").to_pydatetime(),
         bytearray(b"<p>ok</p>")),
        ("https://w.example/null-ts", None, bytearray(b"<p>null ts</p>")),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary"
    ).coalesce(1)
    out = tmp_path / "export"
    out.mkdir()
    locs = write_warc(pages, str(out)).collect()   # must not raise
    by_url = {r["url"]: r for r in locs}
    assert by_url["https://w.example/null-ts"]["warc_ts"] is None
    # the record itself carries the epoch fallback date
    recs = read_warc(spark, str(out) + "/*.warc.gz").collect()
    dates = {r["url"]: r["warc_ts"] for r in recs}
    assert str(dates["https://w.example/null-ts"]).startswith("1970-01-01")


def test_read_xlsx_stdlib_duplicate_headers(tmp_path):
    """ADVICE r5: duplicate header cells made pdf[col] a DataFrame and
    crashed the dtype-coercion loop; de-duplicate like pandas
    (suffix .1, .2)."""
    import zipfile

    from featurewiz_spark.sources.readers import _read_xlsx_stdlib
    from tests.test_sources import _write_minimal_xlsx

    src = str(tmp_path / "orig.xlsx")
    _write_minimal_xlsx(src)
    dup = str(tmp_path / "dup.xlsx")
    with zipfile.ZipFile(src) as zin, zipfile.ZipFile(dup, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "xl/worksheets/sheet1.xml":
                data = data.replace(b"<is><t>amount</t></is>",
                                    b"<is><t>name</t></is>")
            zout.writestr(item, data)
    pdf = _read_xlsx_stdlib(dup)
    assert list(pdf.columns) == ["name", "name.1", "flag"]
    assert pdf["name.1"].tolist() == [1.5, 2]


def test_scoped_persist_eager_populates_and_releases(spark):
    from featurewiz_spark.cache import release_caches, scoped_persist

    df = spark.range(1000).withColumn("x", F.col("id") * 2)
    p = scoped_persist(df, eager=True)
    # eager=True has already populated the cache
    assert p.storageLevel.useMemory
    assert p.count() == 1000
    assert release_caches() >= 1
    assert not p.storageLevel.useMemory
