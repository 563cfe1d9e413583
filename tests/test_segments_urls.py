"""Edge-case tests for the segment-dedup / repetition / URL operators
(text/segments.py, text/urls.py). The corpus-level behavior is oracle-
gated (q75/q76/q77); these pin the boundaries the testdata never hits:
empty docs, fully-boilerplate docs, separator mode, schemeless URLs,
default-port stripping, all-params-dropped query strings.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from featurewiz_spark.text.segments import (
    add_repetition_signals,
    duplicate_segment_filter,
)
from featurewiz_spark.text.urls import add_url_features, normalize_url


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestDuplicateSegmentFilter:
    def test_chunk_mode_removes_cross_doc_chunks(self, spark):
        # 4-token chunks; "a b c d" appears in docs 1 and 2 -> removed;
        # the unique tails survive with original casing.
        df = _docs(
            spark,
            [
                (1, "a b c d KEEP one"),
                (2, "a b c d other tail"),
                (3, "totally unique text here"),
            ],
        )
        out = {
            r["doc_id"]: r
            for r in duplicate_segment_filter(
                df, chunk_tokens=4, min_docs=2
            ).collect()
        }
        assert out[1]["text_clean"] == "KEEP one"
        assert out[1]["n_segments"] == 2 and out[1]["n_removed"] == 1
        assert out[2]["text_clean"] == "other tail"
        assert out[3]["text_clean"] == "totally unique text here"
        assert out[3]["n_removed"] == 0

    def test_normalize_hashes_case_insensitively(self, spark):
        df = _docs(spark, [(1, "A B C D x"), (2, "a b c d y")])
        out = {
            r["doc_id"]: r["text_clean"]
            for r in duplicate_segment_filter(
                df, chunk_tokens=4, min_docs=2
            ).collect()
        }
        assert out == {1: "x", 2: "y"}

    def test_fully_boilerplate_doc_comes_back_empty(self, spark):
        df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
        rows = duplicate_segment_filter(df, chunk_tokens=4).collect()
        assert len(rows) == 2
        assert all(r["text_clean"] == "" and r["n_removed"] == 1 for r in rows)

    def test_empty_text_doc_survives_with_zero_counts(self, spark):
        df = _docs(spark, [(1, ""), (2, "   "), (3, "real words here")])
        out = {r["doc_id"]: r for r in duplicate_segment_filter(
            df, chunk_tokens=4).collect()}
        for d in (1, 2):
            assert out[d]["text_clean"] == ""
            assert out[d]["n_segments"] == 0
            assert out[d]["n_removed"] == 0
        assert out[3]["text_clean"] == "real words here"

    def test_separator_mode(self, spark):
        df = _docs(
            spark,
            [
                (1, "nav bar\nreal content one\n"),
                (2, "nav bar\nreal content two"),
            ],
        )
        out = {
            r["doc_id"]: r["text_clean"]
            for r in duplicate_segment_filter(
                df, sep=r"\n", min_docs=2
            ).collect()
        }
        assert out == {1: "real content one", 2: "real content two"}

    def test_exactly_one_mode_required(self, spark):
        df = _docs(spark, [(1, "x")])
        import pytest

        with pytest.raises(ValueError):
            duplicate_segment_filter(df)
        with pytest.raises(ValueError):
            duplicate_segment_filter(df, sep=r"\n", chunk_tokens=4)

    def test_min_docs_threshold(self, spark):
        # chunk shared by 2 docs survives min_docs=3
        df = _docs(spark, [(1, "a b c d"), (2, "a b c d")])
        rows = duplicate_segment_filter(
            df, chunk_tokens=4, min_docs=3
        ).collect()
        assert all(r["n_removed"] == 0 for r in rows)


class TestRepetitionSignals:
    def test_known_small_example(self, spark):
        # "x y x y x" -> words: 5 total, 2 distinct -> dup_word 3/5
        # 2-grams: [x y, y x, x y, y x] -> top 2/4
        df = _docs(spark, [(1, "x y x y x")])
        r = add_repetition_signals(df, chunk_tokens=2, ngram_ns=(2,)).collect()[0]
        assert r["rep_dup_word_frac"] == 0.6
        assert r["rep_top2gram_frac"] == 0.5

    def test_duplicate_chunks_within_doc(self, spark):
        # chunks of 2: [a b, a b, c d] -> dup mass 2/3
        df = _docs(spark, [(1, "a b a b c d")])
        r = add_repetition_signals(df, chunk_tokens=2, ngram_ns=(2,)).collect()[0]
        assert abs(r["rep_dup_chunk_frac"] - 2 / 3) < 1e-6

    def test_empty_and_short_docs_zero(self, spark):
        df = _docs(spark, [(1, ""), (2, "word")])
        rows = {r["doc_id"]: r for r in add_repetition_signals(
            df, chunk_tokens=8, ngram_ns=(2, 3)).collect()}
        for d in (1, 2):
            assert rows[d]["rep_dup_chunk_frac"] == 0.0
            assert rows[d]["rep_top2gram_frac"] == 0.0
            assert rows[d]["rep_top3gram_frac"] == 0.0
        assert rows[2]["rep_dup_word_frac"] == 0.0

    def test_case_insensitive_counting(self, spark):
        df = _docs(spark, [(1, "The THE the")])
        r = add_repetition_signals(df, chunk_tokens=1, ngram_ns=(2,)).collect()[0]
        assert abs(r["rep_dup_word_frac"] - 2 / 3) < 1e-6
        assert r["rep_dup_chunk_frac"] == 1.0


class TestUrls:
    def _norm(self, spark, url, **kw):
        df = spark.createDataFrame([(url,)], "url string")
        return df.select(normalize_url(F.col("url"), **kw).alias("u")).collect()[0]["u"]

    def test_full_normalization(self, spark):
        u = self._norm(
            spark,
            "HTTP://WWW.Example.COM:80/a/b?utm_source=x&z=1&a=2#frag",
        )
        assert u == "http://example.com/a/b?a=2&z=1"

    def test_https_default_port_and_keep_nondefault(self, spark):
        assert (
            self._norm(spark, "https://Host.io:443/p") == "https://host.io/p"
        )
        assert (
            self._norm(spark, "https://host.io:8443/p")
            == "https://host.io:8443/p"
        )
        # :80 is only default for http, not https
        assert (
            self._norm(spark, "https://host.io:80/p") == "https://host.io:80/p"
        )

    def test_empty_path_becomes_slash_and_all_params_dropped(self, spark):
        u = self._norm(spark, "https://example.com?utm_campaign=x&gclid=1")
        assert u == "https://example.com/"

    def test_keep_www_option(self, spark):
        u = self._norm(spark, "https://www.example.com/x", strip_www=False)
        assert u == "https://www.example.com/x"

    def test_schemeless_does_not_throw(self, spark):
        u = self._norm(spark, "example.com/a#b")
        assert u == "://example.com/a"

    def test_features(self, spark):
        df = spark.createDataFrame(
            [("https://www.news.example.co:8080/world/europe/story.html?id=1&utm_medium=m",)],
            "url string",
        )
        r = add_url_features(df).collect()[0]
        assert r["url_host"] == "news.example.co:8080"
        assert r["url_domain"] == "example.co"
        assert r["url_depth"] == 3
        assert r["url_n_params"] == 1
        assert r["url_is_https"] == 1
        assert r["url_norm"] == "https://news.example.co:8080/world/europe/story.html?id=1"

    def test_bare_host_domain(self, spark):
        df = spark.createDataFrame([("http://localhost/x",)], "url string")
        r = add_url_features(df).collect()[0]
        assert r["url_domain"] == "localhost"
        assert r["url_depth"] == 1


# ------------------------------------------------------------------
# snapshot churn (q95)
# ------------------------------------------------------------------


def test_snapshot_churn_known_answer(spark):
    from featurewiz_spark.text.segments import snapshot_churn

    rows = [
        (0, 10, 0, "alpha beta gamma"),
        (1, 10, 1, "alpha beta delta epsilon"),   # +delta,epsilon -gamma
        (2, 10, 2, "alpha beta delta epsilon"),   # unchanged
        (3, 10, 3, None),                         # page vanished
        (4, 20, 0, "solo page here"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, entity: long, version: int, text: string"
    )
    out = {
        r["doc_id"]: (r["churn_added"], r["churn_removed"], r["churn_jaccard"])
        for r in snapshot_churn(df, "entity", "version").collect()
    }
    assert out[0] == (None, None, None)           # first snapshot
    assert out[1] == (2, 1, 0.4)                  # |∩|=2, |∪|=5
    assert out[2] == (0, 0, 1.0)
    assert out[3] == (0, 4, 0.0)                  # all tokens removed
    assert out[4] == (None, None, None)


def test_snapshot_churn_sql_mirror_parity(spark, duck, tmp_path):
    from featurewiz_spark.text.segments import snapshot_churn, snapshot_churn_sql

    rows = [
        (i, i % 7, i // 7,
         None if i % 11 == 0 else " ".join(
             f"w{(i * 13 + j) % 23}" for j in range(i % 9 + 1)))
        for i in range(120)
    ]
    df = spark.createDataFrame(
        rows, "doc_id: long, entity: long, version: long, text: string"
    )
    p = str(tmp_path / "snaps.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)
    cols = ["doc_id", "entity", "version",
            "churn_added", "churn_removed", "churn_jaccard"]
    spark_rows = sorted(
        map(tuple, snapshot_churn(df, "entity", "version")
            .select(*cols).collect())
    )
    duck.sql(f"CREATE VIEW snaps AS SELECT * FROM '{p}/*.parquet'")
    sql = snapshot_churn_sql("snaps", "entity", "version")
    duck_rows = sorted(map(tuple, duck.sql(
        f"SELECT {', '.join(cols)} FROM ({sql})"
    ).fetchall()))
    assert spark_rows == duck_rows


def test_snapshot_churn_clash_raises(spark):
    import pytest as _pytest

    from featurewiz_spark.text.segments import snapshot_churn

    df = spark.createDataFrame(
        [(1, 1, 1, "x", 0)],
        "doc_id: long, entity: long, version: int, text: string, churn_added: int",
    )
    with _pytest.raises(ValueError, match="churn_added"):
        snapshot_churn(df, "entity", "version")
