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
