"""Round-5 regression tests: the four ADVICE findings (temperature_mixing_sql
default shape, web_curation all-NULL-strata corner, dedup_by_canonical_url
n_fetches clash + NULL order semantics, snapshot_churn tie-break) and the
VERDICT scale-hygiene item (brute_force_topk driver-collect guard)."""

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------------------------
# ADVICE 1: temperature_mixing_sql default select_cols
# ------------------------------------------------------------------


def test_temperature_mixing_sql_default_shape(spark, duck, tmp_path):
    """Default select_cols must qualify the star to the data table —
    a bare '*' expanded over the LEFT JOIN and duplicated mix_rate."""
    from featurewiz_spark.operators.sampling import (
        temperature_mixing_sample,
        temperature_mixing_sql,
    )

    rows = [(i, ["en", "fr", "de", None][i % 4]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id: long, lang: string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")

    rel = duck.sql(temperature_mixing_sql("docs", "lang", "doc_id"))
    # no duplicate names, no stray rate-table 's' column
    assert rel.columns == ["doc_id", "lang", "mix_rate", "mix_keep"]

    spark_rows = sorted(
        map(
            tuple,
            temperature_mixing_sample(df, "lang", "doc_id")
            .select("doc_id", "lang", "mix_rate", "mix_keep")
            .collect(),
        )
    )
    duck_rows = sorted(map(tuple, rel.fetchall()))
    assert spark_rows == duck_rows


# ------------------------------------------------------------------
# ADVICE 2: web_curation_pipeline all-NULL-strata corner
# ------------------------------------------------------------------


def test_web_curation_all_null_strata_returns_empty(spark):
    """Survivors exist but every stratum is NULL: the composed SQL
    oracle's WHERE mix_keep drops them all (NULL keep), so the engine
    must return the same EMPTY shape instead of raising."""
    from featurewiz_spark.plans.pipeline import web_curation_pipeline

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta words here", None),
            (2, "epsilon zeta eta theta more words", None),
            (3, "iota kappa lambda mu other words", None),
        ],
        "doc_id: long, text: string, lang: string",
    )
    bench = spark.createDataFrame(
        [("never matches anything at all zzz",)], "text: string"
    )
    out = web_curation_pipeline(docs, bench, lm_threshold=1e9)
    assert out.columns == ["doc_id", "lang", "lm_bits_per_token", "mix_rate"]
    assert out.count() == 0


def test_web_curation_zero_survivors_returns_empty(spark):
    """The original guard (zero rows past the filters) still holds."""
    from featurewiz_spark.plans.pipeline import web_curation_pipeline

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en"), (2, "delta epsilon zeta", "fr")],
        "doc_id: long, text: string, lang: string",
    )
    bench = spark.createDataFrame([("x",)], "text: string")
    out = web_curation_pipeline(docs, bench, lm_threshold=-1.0)
    assert out.columns == ["doc_id", "lang", "lm_bits_per_token", "mix_rate"]
    assert out.count() == 0


# ------------------------------------------------------------------
# ADVICE 3: dedup_by_canonical_url clash + NULL order_col
# ------------------------------------------------------------------


def test_url_dedup_n_fetches_clash_raises(spark):
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        [(1, "https://a.example.com/", 1, 9)],
        "doc_id: long, url: string, fetch_seq: long, n_fetches: long",
    )
    with pytest.raises(ValueError, match="n_fetches"):
        dedup_by_canonical_url(df)


def test_url_dedup_null_order_loses_to_nonnull(spark):
    """Pins the documented NULL semantics: a NULL order_col sorts
    before every non-null value in Spark's struct ordering, so the
    NULL-order fetch only survives when ALL fetches have NULL order."""
    from featurewiz_spark.text.urls import dedup_by_canonical_url

    df = spark.createDataFrame(
        [
            (9, "https://a.example.com/x", None),  # NULL order, larger id
            (2, "https://a.example.com/x", 5),
            (3, "https://b.example.com/y", None),  # all-NULL group
            (1, "https://b.example.com/y", None),
        ],
        "doc_id: long, url: string, fetch_seq: long",
    )
    out = {r["url_canon"]: r for r in dedup_by_canonical_url(df).collect()}
    assert out["https://a.example.com/x"]["doc_id"] == 2
    assert out["https://b.example.com/y"]["doc_id"] == 3  # id tie-break


# ------------------------------------------------------------------
# ADVICE 4: snapshot_churn tie-break
# ------------------------------------------------------------------


def test_snapshot_churn_tiebreak_matches_mirror(spark, duck, tmp_path):
    """Duplicate (entity, version) pairs: with tiebreak_col the
    previous-snapshot choice is pinned and Spark == DuckDB exactly."""
    from featurewiz_spark.text.segments import snapshot_churn, snapshot_churn_sql

    rows = [
        (i, i % 3, (i // 3) % 2,  # versions repeat within an entity
         " ".join(f"w{(i * 7 + j) % 11}" for j in range(i % 5 + 1)))
        for i in range(36)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, entity: long, version: long, text: string"
    )
    p = str(tmp_path / "snaps.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    duck.sql(f"CREATE VIEW snaps AS SELECT * FROM '{p}/*.parquet'")
    cols = ["doc_id", "entity", "version",
            "churn_added", "churn_removed", "churn_jaccard"]
    spark_rows = sorted(
        map(tuple,
            snapshot_churn(df, "entity", "version", tiebreak_col="doc_id")
            .select(*cols).collect())
    )
    sql = snapshot_churn_sql("snaps", "entity", "version",
                             tiebreak_col="doc_id")
    duck_rows = sorted(map(tuple, duck.sql(
        f"SELECT {', '.join(cols)} FROM ({sql})"
    ).fetchall()))
    assert spark_rows == duck_rows


# ------------------------------------------------------------------
# VERDICT 1: brute_force_topk driver-collect guard
# ------------------------------------------------------------------


def _vec_df(spark, n, dim=4):
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.array(*[(F.col("id") * (i + 3) % 7).cast("float")
                  for i in range(dim)]).alias("embedding"),
    )


def test_brute_force_topk_guard_raises(spark):
    from featurewiz_spark.operators.similarity import brute_force_topk

    df = _vec_df(spark, 50)
    with pytest.raises(ValueError, match="brute_force_topk_blocked"):
        brute_force_topk(df, k=1, max_corpus_rows=10)


def test_brute_force_topk_guard_allows_and_disables(spark):
    from featurewiz_spark.operators.similarity import brute_force_topk

    df = _vec_df(spark, 20)
    under = brute_force_topk(df, k=1, max_corpus_rows=20)
    forced = brute_force_topk(df, k=1, max_corpus_rows=None)
    assert sorted(map(tuple, under.collect())) == sorted(
        map(tuple, forced.collect())
    )
