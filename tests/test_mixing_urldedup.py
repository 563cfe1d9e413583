"""Canonical-URL keep-latest dedup (text/urls.py) and temperature-scaled
stratum mixing (operators/sampling.py): rule checks on planted fixtures,
determinism, and plan-shape guards."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# dedup_by_canonical_url
# ------------------------------------------------------------------


def _fetch_rows():
    # 5 raw variants of ONE canonical url + 2 of another + 1 singleton
    return [
        (1, "HTTPS://WWW.Site.Example.COM:443/a/index.html?utm_source=f&id=1", 10),
        (2, "https://site.example.com/a/index.html?id=1&utm_source=x", 30),
        (3, "https://www.site.example.com/a/index.html?id=1#frag", 20),
        (4, "HTTPS://site.EXAMPLE.com/a/index.html?fbclid=z&id=1", 30),
        (5, "https://site.example.com/a/index.html?id=1", 5),
        (6, "https://other.example.com/b/?x=2", 7),
        (7, "https://Other.example.com/b/?x=2", 3),
        (8, "http://lone.example.com/c.html", 1),
    ]


def test_url_dedup_keeps_latest_fetch(spark):
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        _fetch_rows(), "doc_id: long, url: string, fetch_seq: long"
    )
    out = dedup_by_canonical_url(df).collect()
    by_canon = {r["url_canon"]: r for r in out}
    assert len(by_canon) == 3
    big = by_canon["https://site.example.com/a/index.html?id=1"]
    # fetch_seq ties at 30 between doc 2 and doc 4 -> doc_id tie-break
    assert big["doc_id"] == 4 and big["n_fetches"] == 5
    other = by_canon["https://other.example.com/b/?x=2"]
    assert other["doc_id"] == 6 and other["n_fetches"] == 2
    lone = by_canon["http://lone.example.com/c.html"]
    assert lone["doc_id"] == 8 and lone["n_fetches"] == 1


def test_url_dedup_no_window_in_plan(spark):
    """The skew contract: ONE hash aggregate (max_by), no Window
    operator — a hot URL must never become a single sorted task."""
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        _fetch_rows(), "doc_id: long, url: string, fetch_seq: long"
    )
    plan = dedup_by_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "partial_max_by" in plan or "HashAggregate" in plan


def test_url_dedup_canon_clash_raises(spark):
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        [(1, "https://a.com/x", 1, "y")],
        "doc_id: long, url: string, fetch_seq: long, url_canon: string",
    )
    with pytest.raises(ValueError, match="url_canon"):
        dedup_by_canonical_url(df)


# ------------------------------------------------------------------
# temperature_mixing_sample
# ------------------------------------------------------------------


def _strata_df(spark):
    rows = [(i, "big") for i in range(400)]
    rows += [(1000 + i, "small") for i in range(25)]
    rows += [(2000, None)]
    return spark.createDataFrame(rows, "id: long, s: string")


def test_mixing_upweights_rare_strata(spark):
    from featurewiz_spark.operators.sampling import temperature_mixing_sample

    df = _strata_df(spark)
    out = temperature_mixing_sample(df, "s", "id", temperature=0.5,
                                    target_frac=0.2)
    rates = dict(
        out.where(F.col("s").isNotNull())
        .select("s", "mix_rate").distinct().collect()
    )
    # T=0.5: p_small/p_big = sqrt(25/400) = 1/4, but per-ROW rate is
    # target*N*p_s/n_s -> small rows keep at 4x the big-row rate
    # (target_frac low enough that the small rate stays under the clamp)
    assert rates["small"] > rates["big"]
    assert abs(rates["small"] / rates["big"] - 4.0) < 1e-6
    assert 0 < rates["big"] <= 1.0 and 0 < rates["small"] <= 1.0
    # NULL stratum: NULL rate and NULL keep, never silently kept
    null_row = out.where(F.col("s").isNull()).collect()[0]
    assert null_row["mix_rate"] is None and null_row["mix_keep"] is None


def test_mixing_deterministic_and_partition_invariant(spark):
    from featurewiz_spark.operators.sampling import temperature_mixing_sample

    df = _strata_df(spark)
    a = sorted(map(tuple, temperature_mixing_sample(df, "s", "id").collect()))
    b = sorted(
        map(
            tuple,
            temperature_mixing_sample(df.repartition(13), "s", "id").collect(),
        )
    )
    assert a == b


def test_mixing_hits_target_frac_approximately(spark):
    from featurewiz_spark.operators.sampling import temperature_mixing_sample

    df = _strata_df(spark)
    out = temperature_mixing_sample(df, "s", "id", temperature=0.5,
                                    target_frac=0.5)
    kept = out.where(F.col("mix_keep")).count()
    total = 425
    # md5 coin at rate r over n rows: expect target 212 +- binomial noise
    assert 0.35 * total < kept < 0.65 * total, kept


def test_mixing_rate_caps_at_one(spark):
    """An extreme temperature makes the rare stratum's raw rate exceed
    1 — it must clamp (min(1, .)) and keep every row of that stratum."""
    from featurewiz_spark.operators.sampling import temperature_mixing_sample

    df = _strata_df(spark).where(F.col("s").isNotNull())
    out = temperature_mixing_sample(df, "s", "id", temperature=0.0,
                                    target_frac=0.9)
    rates = dict(out.select("s", "mix_rate").distinct().collect())
    assert rates["small"] == 1.0
    kept_small = out.where((F.col("s") == "small") & F.col("mix_keep")).count()
    assert kept_small == 25


def test_mixing_empty_strata_raises(spark):
    from featurewiz_spark.operators.sampling import temperature_mixing_sample

    df = spark.createDataFrame([(1, None)], "id: long, s: string")
    with pytest.raises(ValueError, match="no non-null strata"):
        temperature_mixing_sample(df, "s", "id")


def test_mixing_sql_mirror_parity(spark, duck, tmp_path):
    """Strict parity with the generated DuckDB mirror (counts, pinned
    normalizer sum, rounded rates, md5 coin)."""
    from featurewiz_spark.operators.sampling import (
        temperature_mixing_sample,
        temperature_mixing_sql,
    )

    df = _strata_df(spark)
    p = str(tmp_path / "rows.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    spark_rows = sorted(
        map(
            tuple,
            temperature_mixing_sample(df, "s", "id")
            .select("id", "s", "mix_rate", "mix_keep")
            .collect(),
        )
    )
    duck.sql(f"CREATE VIEW rows AS SELECT * FROM '{p}/*.parquet'")
    sql = temperature_mixing_sql("rows", "s", "id", select_cols="d.id, d.s")
    duck_rows = sorted(map(tuple, duck.sql(sql).fetchall()))
    assert spark_rows == duck_rows


# ------------------------------------------------------------------
# composed web curation pipeline (q92)
# ------------------------------------------------------------------


def test_web_curation_pipeline_stages(spark):
    """Planted fixture exercising every stage: exact dup collapses to
    the min id, the LM filter drops the out-of-distribution doc, the
    decontamination stage drops the benchmark-overlapping doc, and the
    survivors carry mixing rates."""
    from featurewiz_spark.plans.pipeline import web_curation_pipeline
    from featurewiz_spark.text.lm import add_lm_score, train_bigram_lm

    fluent = "the data pipeline cleans the data pipeline cleans the data"
    # doc 3: all-singleton tokens -> the highest self-trained bits.
    # doc 4: fluent vocabulary (passes the LM gate) but its unique
    # 8-token runs match the benchmark -> only decontam can drop it.
    contaminated = "the data pipeline cleans the data corpus again well"
    rows = [
        (0, fluent, "en"),
        (1, fluent, "en"),                      # exact dup of 0
        (2, "the data pipeline cleans the web corpus well", "en"),
        (3, "zq wv xk jn pl mt ry bs dq fw gh kz", "de"),   # OOD tokens
        (4, contaminated, "en"),
        (5, "the web corpus cleans the data pipeline again", "fr"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")
    bench = spark.createDataFrame([(contaminated,)], "text: string")
    # pick a threshold separating doc 3 from the fluent docs — trained
    # on the DEDUPED corpus, exactly what the pipeline's LM stage sees
    # (training on the raw corpus would shift every count and therefore
    # the scores)
    deduped = docs.where(F.col("doc_id") != 1)
    uni, big = train_bigram_lm(deduped)
    scores = dict(
        add_lm_score(deduped, uni, big)
        .select("doc_id", "lm_bits_per_token").collect()
    )
    others = max(scores[0], scores[2], scores[4], scores[5])
    assert scores[3] > others
    thr = (scores[3] + others) / 2

    out = web_curation_pipeline(
        docs, bench, lm_threshold=thr, decontam_n=8,
        temperature=0.5, target_frac=1.0,
    )
    got = {r["doc_id"]: r for r in out.collect()}
    assert 1 not in got          # dup: min id 0 is the survivor
    assert 3 not in got          # OOD doc filtered by the LM gate
    assert 4 not in got          # contaminated vs bench
    # target_frac=1.0 -> every stratum rate clamps to >= its fair
    # share; the surviving fluent docs must all be present
    assert set(got) == {0, 2, 5}
    for r in got.values():
        assert r["mix_rate"] is not None and r["lm_bits_per_token"] is not None


# ------------------------------------------------------------------
# sequence packing (q93)
# ------------------------------------------------------------------


def test_pack_sequences_known_answer(spark):
    from featurewiz_spark.text.chunking import pack_sequences

    rows = [(0, "a b c"), (1, "d e f g"), (2, "h i"), (3, None), (4, "j")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = {
        r["doc_id"]: (r["pack_id"], r["pack_offset"], r["n_tokens"])
        for r in pack_sequences(df, budget=5, n_shards=1).collect()
    }
    # single shard, ordered by id: starts 0, 3, 7, 9, 9
    assert out[0] == (0, 0, 3)
    assert out[1] == (0, 3, 4)   # spills into pack 1 (concat-and-chunk)
    assert out[2] == (1, 2, 2)
    assert out[3] == (1, 4, 0)   # NULL text = zero tokens, still placed
    assert out[4] == (1, 4, 1)


def test_pack_sequences_partition_invariant_and_clash(spark):
    import pytest as _pytest

    from featurewiz_spark.text.chunking import pack_sequences

    rows = [(i, "tok " * (i % 7 + 1)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    a = sorted(map(tuple, pack_sequences(df, budget=16, n_shards=4).collect()))
    b = sorted(
        map(
            tuple,
            pack_sequences(df.repartition(11), budget=16, n_shards=4).collect(),
        )
    )
    assert a == b
    with _pytest.raises(ValueError, match="pack_id"):
        pack_sequences(df.withColumn("pack_id", F.lit(1)))


def test_pack_sequences_sql_mirror_parity(spark, duck, tmp_path):
    from featurewiz_spark.text.chunking import pack_sequences, pack_sequences_sql

    rows = [(i, None if i % 13 == 0 else "w " * (i % 9 + 1)) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    cols = ["doc_id", "pack_shard", "n_tokens", "pack_id", "pack_offset"]
    spark_rows = sorted(
        map(tuple, pack_sequences(df, budget=10, n_shards=3)
            .select(*cols).collect())
    )
    duck.sql(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")
    sql = pack_sequences_sql("docs", budget=10, n_shards=3,
                             select_cols="doc_id")
    duck_rows = sorted(map(tuple, duck.sql(
        f"SELECT {', '.join(cols)} FROM ({sql})"
    ).fetchall()))
    assert spark_rows == duck_rows


# ------------------------------------------------------------------
# vocabulary builder (q94)
# ------------------------------------------------------------------


def test_build_vocabulary_counts_and_cut(spark):
    from featurewiz_spark.text.tfidf import build_vocabulary

    rows = [
        (0, "alpha beta alpha gamma"),
        (1, "alpha beta beta"),
        (2, "gamma delta"),
        (3, None),
        (4, "epsilon"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    vocab = {
        r["token"]: (r["term_freq"], r["doc_freq"])
        for r in build_vocabulary(df, min_df=1, top_k=100).collect()
    }
    assert vocab["alpha"] == (3, 2)
    assert vocab["beta"] == (3, 2)
    assert vocab["gamma"] == (2, 2)
    assert vocab["delta"] == (1, 1) and vocab["epsilon"] == (1, 1)
    # min_df prunes the singletons
    v2 = {r["token"] for r in build_vocabulary(df, min_df=2, top_k=100).collect()}
    assert v2 == {"alpha", "beta", "gamma"}
    # top_k cut uses the (tf DESC, token ASC) tie-break: alpha and beta
    # tie at tf=3 -> k=1 must pick 'alpha'
    top1 = build_vocabulary(df, min_df=1, top_k=1).collect()
    assert len(top1) == 1 and top1[0]["token"] == "alpha"
    # distributed top-k, not a global-sort window
    plan = build_vocabulary(df, top_k=5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan and "Window" not in plan


def test_web_curation_pipeline_empty_survivors(spark):
    """An lm_threshold below every score empties the corpus mid-chain:
    the pipeline must return an empty frame of the output shape (the
    SQL mirror's behavior), not raise from the mixing stage."""
    from featurewiz_spark.plans.pipeline import web_curation_pipeline

    docs = spark.createDataFrame(
        [(0, "the data pipeline cleans text", "en")],
        "doc_id: long, text: string, lang: string",
    )
    bench = spark.createDataFrame([("unrelated benchmark text",)], "text: string")
    out = web_curation_pipeline(docs, bench, lm_threshold=-999.0)
    assert out.count() == 0
    assert out.columns == ["doc_id", "lang", "lm_bits_per_token", "mix_rate"]
