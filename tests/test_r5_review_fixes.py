"""Late-round-5 review findings: BPE cross-engine divergences
(line-terminator dot semantics, EOW-left boundary merges, spurious
bare-'</w>' from delimiter-only tokens) and the dsir/bpe double-scan
fit jobs."""

import pytest
from pyspark.sql import functions as F

LS, PS, NEL = "\u2028", "\u2029", "\x85"  # line sep, para sep, NEL


def test_bpe_dotall_line_separators_cross_engine(spark, duck):
    """Java's default dot excludes U+2028/U+2029/U+0085 (RE2's only
    \\n): without DOTALL, Spark glued those codepoints into the next
    symbol while DuckDB and the trainer's tuple(word) split them."""
    from featurewiz_spark.text.bpe import bpe_encode, bpe_encode_sql

    docs = [(1, f"a{LS}b"), (2, f"x{NEL}y"), (3, f"p{PS}q"), (4, "ok")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, [], "text").collect()
    }
    # per-codepoint symbols, marker last — same split tuple(word) sees
    assert got[1] == ["a", LS, "b", "</w>"]
    assert got[2] == ["x", NEL, "y", "</w>"]
    assert got[3] == ["p", PS, "q", "</w>"]
    duck.execute("CREATE OR REPLACE TABLE bdocs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO bdocs VALUES (?, ?)", docs)
    sql = bpe_encode_sql("text", [])
    want = {
        r[0]: r[1]
        for r in duck.execute(f"SELECT doc_id, {sql} FROM bdocs").fetchall()
    }
    assert got == want


def test_bpe_eow_left_merge_guarded_and_never_learned(spark):
    """A merge whose left element ends with '</w>' (spellable only by
    literal '</w>' text inside a word) would merge ACROSS word
    boundaries in the encode fold — the trainer must never learn one
    and the fold must reject lists from other trainers that do."""
    from featurewiz_spark.text.bpe import (
        EOW,
        bpe_encode,
        bpe_encode_sql,
        train_from_counts,
    )

    merges = train_from_counts({"m</w>b": 10, "c</d": 100}, 12)
    assert merges and all(not a.endswith(EOW) for a, _ in merges)
    df = spark.createDataFrame([(1, "cat bat")], "doc_id long, text string")
    with pytest.raises(ValueError, match="across word boundaries"):
        bpe_encode(df, [("</w>", "b")], "text")
    with pytest.raises(ValueError, match="across word boundaries"):
        bpe_encode_sql("text", [("t</w>", "b")])


def test_bpe_delimiter_only_token_no_spurious_eow(spark, duck):
    """A whitespace-separated U+001F-only token must vanish entirely
    (as bpe_word_counts drops it from the fit), not leave a bare
    '</w>' marker for a word the trainer never counted."""
    from featurewiz_spark.text.bpe import bpe_encode, bpe_encode_sql

    rows = [(1, "a \x1f b"), (2, "a b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r["bpe_tokens"]
        for r in bpe_encode(df, [], "text").collect()
    }
    assert got[1] == got[2] == ["a", "</w>", "b", "</w>"]
    duck.execute("CREATE OR REPLACE TABLE ddocs(doc_id BIGINT, text VARCHAR)")
    duck.executemany("INSERT INTO ddocs VALUES (?, ?)", rows)
    sql = bpe_encode_sql("text", [])
    want = {
        r[0]: r[1]
        for r in duck.execute(f"SELECT doc_id, {sql} FROM ddocs").fetchall()
    }
    assert got == want


def test_bpe_pair_counts_excludes_terminal_left(spark):
    """bpe_pair_counts mirrors the trainer's terminal-left exclusion,
    so the distributed round statistics agree with train_from_counts
    even on words containing literal '</w>' text."""
    from featurewiz_spark.text.bpe import EOW, bpe_pair_counts

    wc = spark.createDataFrame(
        [("m</w>b", 10), ("cat", 3)], "word string, cnt long"
    )
    rows = bpe_pair_counts(
        wc, [("<", "/"), ("</", "w"), ("</w", ">")]
    ).collect()
    assert rows and all(not r["left"].endswith(EOW) for r in rows)


def test_dsir_fit_single_pass_totals_unchanged(spark):
    """dsir_fit now derives the gram totals from the collected <=m-row
    count tables (one corpus scan per side) — same lam, same stats."""
    from featurewiz_spark.text.dsir import dsir_fit

    docs = spark.createDataFrame(
        [(1, "the cat sat"), (2, "the dog ran"), (3, "cat cat")],
        "doc_id long, text string",
    )
    target = docs.where(F.col("doc_id") == 3)
    lam, stats = dsir_fit(target, docs, m=32)
    assert len(lam) == 32 and stats["m"] == 32
    # target grams: cat,cat + bigram 'cat cat' = 3; raw = 5+5+3 grams
    assert stats["t_grams"] == 3 and stats["r_grams"] == 13


def test_run_resumable_chunked_commits(spark, tmp_path):
    """chunk_buckets commits progress per chunk (data write BEFORE
    manifest append), and the chunked output equals the one-shot run."""
    from featurewiz_spark.plans.lineage import (
        resume_plan,
        run_resumable,
        validate_stage,
    )

    src = spark.createDataFrame(
        [(f"u{i % 37}", i, float(i)) for i in range(500)],
        "user string, ts long, v double",
    )

    def transform(df):
        return df.withColumn("v2", F.col("v") * 2)

    d1, d2 = str(tmp_path / "chunked"), str(tmp_path / "oneshot")
    a = run_resumable(
        spark, src, transform, d1, "s", ["user"], n_buckets=8, chunk_buckets=3
    )
    b = run_resumable(spark, src, transform, d2, "s", ["user"], n_buckets=8)
    assert resume_plan(spark, d1, "s", 8) == []
    assert validate_stage(spark, d1, "s").count() == 0
    ka = {(r["user"], r["ts"], r["v2"]) for r in a.collect()}
    kb = {(r["user"], r["ts"], r["v2"]) for r in b.collect()}
    assert ka == kb and len(ka) == 500
    # ceil(8/3) = 3 chunks -> manifest accumulated via >=3 append jobs;
    # every bucket has exactly ONE manifest row (no dup credit)
    import os

    man = spark.read.parquet(os.path.join(d1, "_manifest", "s"))
    per_bucket = man.groupBy("__bucket").count().collect()
    assert len(per_bucket) == 8 and all(r["count"] == 1 for r in per_bucket)


# ------------------------------------------------------------------
# Module-sweep review findings: semantic/components/chunking/tfidf
# ------------------------------------------------------------------


def test_semantic_dedup_schema_follows_input(spark):
    """Output (id, cluster) types follow the INPUT schema: long cluster
    ids from a hash assignment must not wrap through int32, string ids
    must work (the min-id rule only needs an ordering)."""
    from featurewiz_spark.operators.semantic import semantic_dedup

    big = 2**31 + 7  # would wrap negative through int32
    rows = [
        ("docB", [1.0, 0.0], big),
        ("docA", [1.0, 0.0], big),
        ("docC", [0.0, 1.0], 5),
    ]
    df = spark.createDataFrame(
        rows, "vec_id string, embedding array<double>, cell long"
    )
    out = semantic_dedup(df, cluster_col="cell", threshold=0.95)
    assert dict(out.dtypes)["cluster"] == "bigint"
    assert dict(out.dtypes)["vec_id"] == "string"
    got = {r["vec_id"]: (r["cluster"], r["keep"]) for r in out.collect()}
    assert got["docA"] == (big, True)   # min string id survives
    assert got["docB"] == (big, False)  # cosine 1.0 vs smaller id
    assert got["docC"] == (5, True)


def test_semantic_dedup_cluster_clash_guards(spark):
    from featurewiz_spark.operators.semantic import semantic_dedup

    df = spark.createDataFrame(
        [(1, [1.0, 0.0], 0, 9)],
        "vec_id long, embedding array<double>, cluster int, cell int",
    )
    with pytest.raises(ValueError, match="already has a 'cluster'"):
        semantic_dedup(df)  # built-in assignment would collide
    with pytest.raises(ValueError, match="reserved"):
        semantic_dedup(df, cluster_col="cell")
    # passing the existing column AS the assignment is fine
    out = semantic_dedup(df.drop("cell"), cluster_col="cluster")
    assert out.count() == 1


def test_attach_components_clash_guard(spark):
    from featurewiz_spark.operators.components import attach_components

    docs = spark.createDataFrame([(1, 0)], "doc_id long, component int")
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    with pytest.raises(ValueError, match="component"):
        attach_components(docs, pairs)


def test_connected_components_releases_superseded_rounds(spark):
    """Each superseded round's labels must leave the scoped-cache
    registry when unpersisted mid-loop — only the final labels (and
    the edges) stay registered for the caller's release."""
    from featurewiz_spark import cache
    from featurewiz_spark.operators.components import connected_components

    cache.release_caches()
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "a long, b long"
    )
    out = connected_components(pairs)
    assert out.count() == 7
    # registry holds exactly the live handles: edges + final labels
    assert len(cache._SCOPED) == 2
    assert cache.release_caches() == 2


def test_random_projection_null_first_vector_raises(spark):
    from featurewiz_spark.operators.semantic import random_projection

    df = spark.createDataFrame(
        [(1, None), (2, [1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="pass in_dim"):
        random_projection(df)
    # explicit in_dim works over the same frame
    out = random_projection(df, in_dim=2, out_dim=2)
    assert out.where(F.col("proj_0").isNotNull()).count() == 1


def test_pack_sequences_shard_uses_shared_h60(spark, duck, tmp_path):
    """Shard assignment must equal pmod(h60(id), n_shards) on both
    engines (the ONE md5-60 definition in _norm)."""
    from featurewiz_spark.text._norm import h60
    from featurewiz_spark.text.chunking import pack_sequences, pack_sequences_sql

    df = spark.createDataFrame(
        [(i, "w " * (i % 5 + 1)) for i in range(40)],
        "doc_id long, text string",
    )
    out = pack_sequences(df, budget=8, n_shards=4)
    chk = out.withColumn(
        "want", F.pmod(h60(F.col("doc_id").cast("string")), F.lit(4)).cast("int")
    )
    assert chk.where(F.col("pack_shard") != F.col("want")).count() == 0
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW pdocs AS SELECT * FROM '{p}/*.parquet'")
    mirror = {
        (r[0], r[1])
        for r in duck.sql(
            "SELECT doc_id, pack_shard FROM ("
            + pack_sequences_sql("pdocs", budget=8, n_shards=4)
            + ")"
        ).fetchall()
    }
    got = {(r["doc_id"], r["pack_shard"]) for r in out.collect()}
    assert got == mirror


# ------------------------------------------------------------------
# Text-module sweep findings: classifier/lm/decontam
# ------------------------------------------------------------------


def test_classifier_null_labels_train_nothing(spark):
    """NULL-label rows must not inflate the vocabulary: a NULL-labeled
    doc with otherwise-unseen tokens must leave model/vocab/scores
    identical to training without that row."""
    from featurewiz_spark.text.classifier import (
        add_quality_score,
        train_quality_classifier,
    )

    base = [
        (1, "good clean prose", True),
        (2, "solid useful text", True),
        (3, "spam spam junk", False),
        (4, "junk junk junk", False),
    ]
    extra = [(5, "zebra quark xylophone unseen tokens", None)]
    schema = "doc_id long, text string, label boolean"
    m1, s1 = train_quality_classifier(
        spark.createDataFrame(base, schema), "label"
    )
    m2, s2 = train_quality_classifier(
        spark.createDataFrame(base + extra, schema), "label"
    )
    assert s1 == s2  # vocab / token totals / doc priors identical
    assert m2.where(F.col("c_pos").isNull() & F.col("c_neg").isNull()).count() == 0
    score = {
        r["doc_id"]: r["quality_score"]
        for r in add_quality_score(
            spark.createDataFrame(base, schema), m2, s2
        ).collect()
    }
    want = {
        r["doc_id"]: r["quality_score"]
        for r in add_quality_score(
            spark.createDataFrame(base, schema), m1, s1
        ).collect()
    }
    assert score == want


def test_quality_score_sql_one_class_errors(duck):
    from featurewiz_spark.text.classifier import quality_score_sql

    duck.execute("CREATE OR REPLACE TABLE qdocs(doc_id BIGINT, text VARCHAR)")
    duck.execute("INSERT INTO qdocs VALUES (1, 'all the same class')")
    sql = quality_score_sql("qdocs", "TRUE")
    with pytest.raises(Exception, match="both classes"):
        duck.execute(sql).fetchall()


def test_add_lm_score_clash_guard_and_prefix_equivalence(spark):
    """out_col clash raises; the struct-carried prefix scores exactly
    like the old regexp-derived one (same bits per token)."""
    from featurewiz_spark import cache
    from featurewiz_spark.text.lm import add_lm_score, train_bigram_lm

    docs = spark.createDataFrame(
        [(1, "the cat sat on the mat"), (2, "the dog"), (3, "solo")],
        "doc_id long, text string",
    )
    uni, big = train_bigram_lm(docs)
    out = add_lm_score(docs, uni, big)
    with pytest.raises(ValueError, match="already exists"):
        add_lm_score(out, uni, big)
    got = {r["doc_id"]: r["lm_bits_per_token"] for r in out.collect()}
    assert got[3] is None  # < 2 tokens
    # independent check for doc 2: bigram 'the dog' count 1, prefix
    # 'the' count 3 in train corpus; V = distinct unigrams + 1
    import math

    v = uni.count() + 1
    want = -math.log2((1 + 0.1) / (3 + 0.1 * v))
    assert abs(got[2] - round(want, 6)) < 1e-9
    cache.release_caches()


def test_decontaminate_flag_clash_guard(spark):
    from featurewiz_spark.text.decontam import decontaminate

    docs = spark.createDataFrame(
        [(1, "a b c d e f g h", 0)],
        "doc_id long, text string, is_contaminated int",
    )
    bench = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(ValueError, match="output columns exist"):
        decontaminate(docs, bench)
    # drop mode is unaffected by the pre-existing column
    assert decontaminate(docs, bench, mode="drop").count() == 1


# ------------------------------------------------------------------
# Sampling/segments/urls/stats sweep findings
# ------------------------------------------------------------------


def test_url_norm_sql_no_stray_question_mark(spark, duck, tmp_path):
    """DuckDB array_to_string([]) is NULL: without coalesce, every URL
    with no kept query params grew a trailing '?' only in the mirror,
    splitting its canonical-dedup key across engines."""
    from featurewiz_spark.text.urls import add_url_features, url_features_sql

    urls = [
        (1, "https://example.com/a"),
        (2, "https://example.com/a?utm_source=x"),  # only tracking params
        (3, "https://example.com/a?id=7"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    got = {
        r["doc_id"]: r["url_norm"]
        for r in add_url_features(df, "url").collect()
    }
    assert got[1] == got[2] == "https://example.com/a"
    p = str(tmp_path / "u.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW udocs AS SELECT * FROM '{p}/*.parquet'")
    expr = url_features_sql("url")["url_norm"]
    want = {
        r[0]: r[1]
        for r in duck.sql(f"SELECT doc_id, {expr} FROM udocs").fetchall()
    }
    assert got == want


def test_quality_word_stats_irregular_whitespace(spark):
    """Word stats follow the shared tokenizer: ' hi ' is ONE word,
    'a  b' has mean word length 1.0 (the raw split counted empty edge
    tokens and the old mean assumed exactly one separator char)."""
    from featurewiz_spark.text.stats import add_quality_features, add_token_counts

    df = spark.createDataFrame(
        [(1, "a  b"), (2, " hi "), (3, ""), (4, "one\n\n\ntwo")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["q_n_words"], r["q_mean_word_len"])
        for r in add_quality_features(df, "text").collect()
    }
    assert got[1] == (2, 1.0)
    assert got[2] == (1, 2.0)
    assert got[3] == (0, 0.0)
    assert got[4] == (2, 3.0)
    toks = {
        r["doc_id"]: r["tok_ws"]
        for r in add_token_counts(df, "text").collect()
    }
    assert toks == {1: 2, 2: 1, 3: 0, 4: 2}


def test_fingerprint_trims_edge_whitespace(spark):
    from featurewiz_spark.text.stats import add_fingerprint

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world\n"), (3, "  HELLO  world")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp_md5"] for r in add_fingerprint(df, "text").collect()}
    assert fp[1] == fp[2] == fp[3]


def test_mixing_rate_rounding_half_away(spark, duck, tmp_path):
    """Rate rounding must match DuckDB's half-away round(): an exact
    binary tie (rate 0.125 at 2 dp) rounds to 0.13 on both engines —
    Python's banker's round gave 0.12."""
    from featurewiz_spark.operators.sampling import (
        temperature_mixing_sample,
        temperature_mixing_sql,
    )

    # 2 strata, 4 rows each, T=1 -> rate = target_frac exactly; pick
    # target_frac=0.125 and rounding=2 to force the tie
    rows = [(i, "ab"[i % 2]) for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = temperature_mixing_sample(
        df, "lang", "doc_id", temperature=1.0, target_frac=0.125, rounding=2
    )
    rates = {r["mix_rate"] for r in out.select("mix_rate").distinct().collect()}
    assert rates == {0.13}
    p = str(tmp_path / "m.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW mdocs AS SELECT * FROM '{p}/*.parquet'")
    sql = temperature_mixing_sql(
        "mdocs", "lang", "doc_id", temperature=1.0, target_frac=0.125, rounding=2
    )
    want = {r[0] for r in duck.sql(
        f"SELECT DISTINCT mix_rate FROM ({sql})"
    ).fetchall()}
    assert want == {0.13}


def test_segment_filter_join_sep_line_mode(spark):
    """Any separator regex reassembles with newlines (the old exact
    match on r'\\n' flattened CRLF-safe patterns to spaces)."""
    from featurewiz_spark.text.segments import duplicate_segment_filter

    docs = [
        (1, "keep me\r\nshared boilerplate line\r\nalso keep"),
        (2, "other text\r\nshared boilerplate line\r\nmore text"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {
        r["doc_id"]: r["text_clean"]
        for r in duplicate_segment_filter(df, sep=r"\r?\n").collect()
    }
    assert out[1] == "keep me\nalso keep"
    assert out[2] == "other text\nmore text"


def test_repetition_signals_preserves_user_dunder_guard(spark):
    from featurewiz_spark.text.segments import add_repetition_signals

    df = spark.createDataFrame(
        [(1, "a b", "x")], "doc_id long, text string, __meta string"
    )
    with pytest.raises(ValueError, match="__"):
        add_repetition_signals(df)


def test_sampling_internal_column_guards(spark):
    from featurewiz_spark.operators.sampling import (
        split_n_ways,
        stratified_sample,
    )

    df = spark.createDataFrame(
        [(1, "a", 0.5)], "id long, cls string, __strata double"
    )
    with pytest.raises(ValueError, match="__strata"):
        stratified_sample(df, "cls", 1)
    df2 = spark.createDataFrame([(1, 2, 3)], "id long, ts long, __pr long")
    with pytest.raises(ValueError, match="__pr"):
        split_n_ways(df2, [0.5, 0.5], how="sequential", time_col="ts")
