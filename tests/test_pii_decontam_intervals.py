"""Edge-case tests for PII masking (text/pii.py), benchmark
decontamination (text/decontam.py) and the bucketed interval join
(operators/intervals.py). Corpus-level behavior is oracle-gated
(q79/q80/q81); these pin the boundaries the testdata never hits:
cross-engine regex agreement on adversarial strings, NULL/short texts,
drop mode, interval edges (end-exclusive, bucket boundary, empty and
inverted intervals), the left join, and self-join lineage.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from featurewiz_spark.operators.intervals import interval_join, parse_bucket
from featurewiz_spark.text.decontam import decontaminate, decontaminate_sql
from featurewiz_spark.text.pii import PII_RULES, mask_pii, mask_pii_sql

# Adversarial strings: greedy-quantifier overlap (phone vs IP), word
# boundaries, dotted chains, malformed emails, unicode filler.
PII_CASES = [
    "mail me at a.b+c%d@sub.Example.co.uk or x@y.io.",
    "server 10.0.255.1, bad 999.999.999.9999, v6 ::1",
    "call +1 (415) 555-0137 or 415-555-0137 x99",
    "order 1234567890123 total 12.50",
    "a@b a@@b.com @no.com trailing@dot. end",
    "ip.1.2.3.4.5 chained 1.2.3.4.5.6",
    "+49 89 123456 and (020) 7946 0958",
    "no pii here at all",
    "",
    "ué@ex.fr puis 192.168.1.1 et +33 1 44 55 66 77 voilà",
    "x@a.bc 1.2.3.4x 12.34",
]


class TestMaskPii:
    def test_cross_engine_agreement(self, spark, duck):
        """The whole point of RE2-compatible patterns: Spark (Java
        regex) and DuckDB (RE2) must produce byte-identical masked text
        and identical staged counts on adversarial input."""
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(PII_CASES)], "i int, text string"
        )
        got = {
            r["i"]: r
            for r in mask_pii(df).orderBy("i").collect()
        }
        cols = mask_pii_sql("text")
        sel = ", ".join(f"{e} AS {n}" for n, e in cols.items())
        duck.execute("CREATE TABLE t(i INT, text VARCHAR)")
        duck.executemany(
            "INSERT INTO t VALUES (?, ?)", list(enumerate(PII_CASES))
        )
        for row in duck.execute(f"SELECT i, {sel} FROM t").fetchall():
            i, *vals = row
            names = list(cols)
            for name, val in zip(names, vals):
                assert got[i][name] == val, (i, name, PII_CASES[i])

    def test_null_text(self, spark):
        df = spark.createDataFrame([(1, None)], "i int, text string")
        r = mask_pii(df).collect()[0]
        assert r["text_masked"] is None
        assert (
            r["pii_email_n"] == r["pii_ip_n"] == r["pii_phone_n"] == 0
        )

    def test_staged_counts_no_double_mask(self, spark):
        # The IP inside the email is masked AS the email; the 4-digit
        # tail of the masked phone can't re-match.
        s = "bad 1.2.3.4@host.com then 5.6.7.8 call 555-123-4567"
        r = mask_pii(
            spark.createDataFrame([(s,)], "text string")
        ).collect()[0]
        assert r["pii_email_n"] == 1
        assert r["pii_ip_n"] == 1
        assert r["pii_phone_n"] == 1
        assert r["text_masked"] == "bad <EMAIL> then <IP> call <PHONE>"

    def test_rules_have_no_quotes(self):
        for _, pattern, token in PII_RULES:
            assert "'" not in pattern and "'" not in token


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


class TestDecontaminate:
    def test_flag_and_counts(self, spark):
        docs = _docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog today"),
                (2, "completely unrelated words that share no shingle at all"),
                (3, "short doc"),
            ],
        )
        bench = spark.createDataFrame(
            [("prefix the quick brown fox jumps over the lazy dog suffix",)],
            "text string",
        )
        out = {
            r["doc_id"]: r
            for r in decontaminate(docs, bench, n=8).collect()
        }
        # doc 1 has three 8-gram windows; the first two ("the ... lazy",
        # "quick ... dog") appear in the bench text, the third ends in
        # "today" which the bench lacks -> 2 distinct contaminated grams
        assert out[1]["is_contaminated"] == 1
        assert out[1]["n_contaminated_grams"] == 2
        assert out[2]["is_contaminated"] == 0
        assert out[2]["n_contaminated_grams"] == 0
        # shorter than n tokens -> never contaminated
        assert out[3]["is_contaminated"] == 0

    def test_drop_mode(self, spark):
        docs = _docs(
            spark,
            [
                (1, "one two three four five six seven eight"),
                (2, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
            ],
        )
        bench = spark.createDataFrame(
            [("one two three four five six seven eight",)], "text string"
        )
        kept = decontaminate(docs, bench, n=8, mode="drop").collect()
        assert [r["doc_id"] for r in kept] == [2]
        # drop mode returns the input schema unchanged
        assert set(kept[0].asDict()) == {"doc_id", "text"}

    def test_case_and_whitespace_normalized(self, spark):
        docs = _docs(spark, [(1, "A  B\tC d E f G h tail")])
        bench = spark.createDataFrame(
            [("a b c D e F g H",)], "text string"
        )
        out = decontaminate(docs, bench, n=8).collect()[0]
        assert out["is_contaminated"] == 1

    def test_sql_mirror_matches(self, spark, duck):
        rows = [
            (1, "alpha beta gamma delta epsilon zeta eta theta iota"),
            (2, "alpha beta gamma delta different words here now ok"),
            (3, None),
            (4, ""),
        ]
        docs = _docs(spark, rows)
        bench = docs.where(F.col("doc_id") == 1).select("text")
        got = sorted(
            tuple(r)
            for r in decontaminate(docs, bench, n=4)
            .select("doc_id", "is_contaminated", "n_contaminated_grams")
            .collect()
        )
        duck.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in duck.execute(
                decontaminate_sql(
                    "documents",
                    "(SELECT text FROM documents WHERE doc_id = 1) b",
                    n=4,
                )
            ).fetchall()
        )
        assert got == want


def _ts(s):
    return datetime.datetime.fromisoformat(s)


class TestIntervalJoin:
    def _frames(self, spark):
        pts = spark.createDataFrame(
            [
                (1, 10, _ts("2024-01-01 00:00:00")),  # == start
                (2, 10, _ts("2024-01-01 05:59:59")),  # just inside
                (3, 10, _ts("2024-01-01 06:00:00")),  # == end
                (4, 10, _ts("2024-01-02 00:00:00")),  # far outside
                (5, 20, _ts("2024-01-01 01:00:00")),  # wrong key
            ],
            "pid int, k int, ts timestamp",
        )
        iv = spark.createDataFrame(
            [(100, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 06:00:00"))],
            "iid int, k int, s timestamp, e timestamp",
        )
        return pts, iv

    def test_end_exclusive_left_closed(self, spark):
        pts, iv = self._frames(spark)
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour", closed="left",
        )
        assert sorted(r["pid"] for r in out.collect()) == [1, 2]

    def test_both_closed_includes_end(self, spark):
        pts, iv = self._frames(spark)
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour", closed="both",
        )
        assert sorted(r["pid"] for r in out.collect()) == [1, 2, 3]

    def test_left_join_pads_unmatched(self, spark):
        pts, iv = self._frames(spark)
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour", how="left",
        ).collect()
        by_pid = {}
        for r in out:
            by_pid.setdefault(r["pid"], []).append(r)
        assert len(out) == 5  # every point exactly once here
        assert by_pid[1][0]["iid"] == 100
        assert by_pid[4][0]["iid"] is None
        assert by_pid[5][0]["iid"] is None

    def test_overlapping_intervals_multiplicity(self, spark):
        pts = spark.createDataFrame(
            [(1, 10, _ts("2024-01-01 02:00:00"))], "pid int, k int, ts timestamp"
        )
        iv = spark.createDataFrame(
            [
                (100, 10, _ts("2024-01-01 00:00:00"), _ts("2024-01-01 03:00:00")),
                (101, 10, _ts("2024-01-01 01:30:00"), _ts("2024-01-01 02:30:00")),
                (102, 10, _ts("2024-01-01 02:00:01"), _ts("2024-01-01 04:00:00")),
            ],
            "iid int, k int, s timestamp, e timestamp",
        )
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour",
        )
        assert sorted(r["iid"] for r in out.collect()) == [100, 101]

    def test_empty_and_inverted_intervals_dropped(self, spark):
        pts = spark.createDataFrame(
            [(1, 10, _ts("2024-01-01 02:00:00"))], "pid int, k int, ts timestamp"
        )
        iv = spark.createDataFrame(
            [
                (100, 10, _ts("2024-01-01 02:00:00"), _ts("2024-01-01 02:00:00")),
                (101, 10, _ts("2024-01-01 03:00:00"), _ts("2024-01-01 01:00:00")),
            ],
            "iid int, k int, s timestamp, e timestamp",
        )
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour",
        )
        assert out.count() == 0
        # under closed='both' the zero-length interval IS a match
        out2 = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour", closed="both",
        )
        assert [r["iid"] for r in out2.collect()] == [100]

    def test_no_keys_pure_range(self, spark):
        pts = spark.createDataFrame(
            [(1, _ts("2024-01-01 02:00:00")), (2, _ts("2024-01-05 00:00:00"))],
            "pid int, ts timestamp",
        )
        iv = spark.createDataFrame(
            [(100, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
            "iid int, s timestamp, e timestamp",
        )
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e", bucket="6 hours"
        )
        assert [r["pid"] for r in out.collect()] == [1]

    def test_self_join_lineage(self, spark):
        # intervals derived FROM the points frame — the aliasing must
        # keep references unambiguous (q81 does exactly this)
        base = spark.createDataFrame(
            [
                (1, 10, _ts("2024-01-01 00:00:00")),
                (2, 10, _ts("2024-01-01 01:00:00")),
                (3, 10, _ts("2024-01-01 09:00:00")),
            ],
            "eid int, k int, ts timestamp",
        )
        iv = base.where(F.col("eid") == 1).select(
            "k",
            F.col("eid").alias("iid"),
            F.col("ts").alias("s"),
            F.expr("ts + INTERVAL 2 HOURS").alias("e"),
        )
        out = interval_join(
            base, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="1 hour",
        )
        assert sorted(r["eid"] for r in out.collect()) == [1, 2]

    def test_column_clash_raises(self, spark):
        pts, iv = self._frames(spark)
        import pytest

        with pytest.raises(ValueError, match="clash"):
            interval_join(
                pts, iv.withColumnRenamed("iid", "pid"),
                point_ts="ts", start_col="s", end_col="e",
                keys=["k"], bucket="1 hour",
            )

    def test_parse_bucket(self):
        import pytest

        assert parse_bucket("90 minutes") == 90 * 60_000_000
        assert parse_bucket("1 day") == 86_400_000_000
        assert parse_bucket(42) == 42
        with pytest.raises(ValueError):
            parse_bucket("fortnight")
        with pytest.raises(ValueError):
            parse_bucket(0)

    def test_bucket_spanning_interval(self, spark):
        # interval spans many buckets; points land in interior buckets
        pts = spark.createDataFrame(
            [(i, 1, _ts(f"2024-01-0{d} 12:00:00")) for i, d in enumerate((1, 3, 9), 1)],
            "pid int, k int, ts timestamp",
        )
        iv = spark.createDataFrame(
            [(100, 1, _ts("2024-01-01 00:00:00"), _ts("2024-01-05 00:00:00"))],
            "iid int, k int, s timestamp, e timestamp",
        )
        out = interval_join(
            pts, iv, point_ts="ts", start_col="s", end_col="e",
            keys=["k"], bucket="6 hours",
        )
        assert sorted(r["pid"] for r in out.collect()) == [1, 2]


class TestLmScore:
    def test_known_answer_single_bigram(self, spark):
        # train on one doc "a b": c(a b)=1, c(a)=1, c(b)=1, V=3.
        # score of "a b": -log2((1+0.5)/(1+0.5*3)) = -log2(0.6)
        import math

        from featurewiz_spark.text.lm import add_lm_score, train_bigram_lm

        docs = spark.createDataFrame([(1, "a b")], "doc_id int, text string")
        uni, big = train_bigram_lm(docs)
        r = add_lm_score(docs, uni, big, k=0.5).collect()[0]
        assert r["lm_bits_per_token"] == round(-math.log2(1.5 / 2.5), 6)

    def test_fluent_scores_lower_than_gibberish(self, spark):
        from featurewiz_spark.text.lm import add_lm_score, train_bigram_lm

        rows = [(i, "the cat sat on the mat " * 3) for i in range(5)] + [
            (99, "zx qv wk jp bn md hg fs")
        ]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        uni, big = train_bigram_lm(docs)
        out = {
            r["doc_id"]: r["lm_bits_per_token"]
            for r in add_lm_score(docs, uni, big).collect()
        }
        assert out[0] < out[99]

    def test_short_and_null_docs_null(self, spark):
        from featurewiz_spark.text.lm import add_lm_score, train_bigram_lm

        docs = spark.createDataFrame(
            [(1, "hello world again"), (2, "single"), (3, None), (4, "")],
            "doc_id int, text string",
        )
        uni, big = train_bigram_lm(docs)
        out = {
            r["doc_id"]: r["lm_bits_per_token"]
            for r in add_lm_score(docs, uni, big).collect()
        }
        assert out[1] is not None
        assert out[2] is None and out[3] is None and out[4] is None

    def test_sql_mirror_matches(self, spark, duck):
        from featurewiz_spark.text.lm import (
            add_lm_score,
            lm_score_sql,
            train_bigram_lm,
        )

        rows = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown cat naps under the warm sun"),
            (3, "Mixed CASE   and\t whitespace  here the quick"),
            (4, None),
            (5, "one"),
        ]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        uni, big = train_bigram_lm(docs)
        got = sorted(
            tuple(r)
            for r in add_lm_score(docs, uni, big)
            .select("doc_id", "lm_bits_per_token")
            .collect()
        )
        duck.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            tuple(r) for r in duck.execute(lm_score_sql("documents")).fetchall()
        )
        assert got == want


class TestTfidfKeywords:
    def test_known_answer_and_tiebreak(self, spark):
        import math

        from featurewiz_spark.text.tfidf import tfidf_keywords

        docs = spark.createDataFrame(
            [
                (1, "apple apple banana"),
                (2, "banana cherry"),
                (3, ""),
            ],
            "doc_id int, text string",
        )
        out = tfidf_keywords(docs, k=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        # N=3. doc1: apple tf=2 df=1 -> 2*(ln(4/2)+1); banana tf=1 df=2
        apple = round(2 * (math.log(4 / 2) + 1), 6)
        banana = round(1 * (math.log(4 / 3) + 1), 6)
        d1 = sorted(by_doc[1], key=lambda r: r["rank"])
        assert [(r["keyword"], r["tfidf"]) for r in d1] == [
            ("apple", apple), ("banana", banana)]
        # doc2: banana and cherry -> cherry has higher idf (df 1 vs 2)
        d2 = sorted(by_doc[2], key=lambda r: r["rank"])
        assert [r["keyword"] for r in d2] == ["cherry", "banana"]
        # empty doc yields no rows
        assert 3 not in by_doc

    def test_equal_scores_tiebreak_on_token(self, spark):
        from featurewiz_spark.text.tfidf import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "zeta alpha"), (2, "unrelated words")],
            "doc_id int, text string",
        )
        d1 = sorted(
            (r for r in tfidf_keywords(docs, k=2).collect()
             if r["doc_id"] == 1),
            key=lambda r: r["rank"],
        )
        # identical tf and df -> identical score -> token ascending
        assert [r["keyword"] for r in d1] == ["alpha", "zeta"]

    def test_min_df_excludes_rare(self, spark):
        from featurewiz_spark.text.tfidf import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "shared rare1"), (2, "shared rare2")],
            "doc_id int, text string",
        )
        out = tfidf_keywords(docs, k=5, min_df=2).collect()
        assert {r["keyword"] for r in out} == {"shared"}

    def test_sql_mirror_matches(self, spark, duck):
        from featurewiz_spark.text.tfidf import (
            tfidf_keywords,
            tfidf_keywords_sql,
        )

        rows = [
            (1, "the quick brown fox the quick"),
            (2, "the slow green turtle walks"),
            (3, "Mixed   CASE the\tQuick"),
            (4, None),
        ]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got = sorted(tuple(r) for r in tfidf_keywords(docs, k=3).collect())
        duck.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in duck.execute(
                tfidf_keywords_sql("documents", k=3)
            ).fetchall()
        )
        assert got == want


def test_decontam_drop_sql_keeps_null_ids(spark, duck):
    """drop mode, null doc_id: Spark left_anti KEEPS a null-key row;
    the SQL mirror must use ANTI JOIN (NOT IN would silently drop it)."""
    rows = [
        (1, "one two three four five six seven eight"),
        (None, "nine ten eleven twelve thirteen fourteen fifteen sixteen"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    bench = spark.createDataFrame(
        [("one two three four five six seven eight",)], "text string"
    )
    got = sorted(
        (r["doc_id"],)
        for r in decontaminate(docs, bench, n=8, mode="drop").collect()
    )
    duck.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
    duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    want = sorted(
        (r[0],)
        for r in duck.execute(
            decontaminate_sql(
                "documents",
                "(SELECT text FROM documents WHERE doc_id = 1) b",
                n=8,
                mode="drop",
            )
        ).fetchall()
    )
    assert got == want == [(None,)]


class TestNormalizationFixes:
    """Round-4 review fixes: collapse-before-trim (leading \\n/\\t made
    a bogus empty first token), explicit whitespace class (Java \\s
    matches \\x0B, RE2's does not), shared across all text modules."""

    def test_no_empty_token_from_leading_whitespace(self, spark):
        from featurewiz_spark.text.tfidf import tfidf_keywords

        docs = spark.createDataFrame(
            [(1, "\napple banana"), (2, "\t\tapple  cherry\n")],
            "doc_id int, text string",
        )
        kws = {r["keyword"] for r in tfidf_keywords(docs, k=10).collect()}
        assert "" not in kws
        assert kws == {"apple", "banana", "cherry"}

    def test_vertical_tab_cross_engine(self, spark, duck):
        # \x0B is whitespace to Java \s but NOT to RE2 \s — the shared
        # WS_CLASS must make both engines split it identically
        from featurewiz_spark.text.tfidf import (
            tfidf_keywords,
            tfidf_keywords_sql,
        )

        rows = [(1, "foo\x0bbar baz"), (2, "other words entirely")]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got = sorted(tuple(r) for r in tfidf_keywords(docs, k=5).collect())
        duck.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in duck.execute(tfidf_keywords_sql("documents", k=5)).fetchall()
        )
        assert got == want
        assert {t[2] for t in got} >= {"foo", "bar"}  # split, not glued

    def test_segments_leading_newline_no_empty_segment(self, spark):
        from featurewiz_spark.text.segments import duplicate_segment_filter

        df = spark.createDataFrame(
            [(1, "\na b c d tail one"), (2, "a b c d other end")],
            "doc_id int, text string",
        )
        out = {
            r["doc_id"]: r
            for r in duplicate_segment_filter(
                df, chunk_tokens=4, min_docs=2
            ).collect()
        }
        # the leading \n must not shift doc 1's chunking: both docs'
        # first 4-token chunk is "a b c d" -> removed from both
        assert out[1]["text_clean"] == "tail one"
        assert out[2]["text_clean"] == "other end"

    def test_q79_oracle_null_text_parity(self, spark, duck):
        # Spark concat -> NULL row stays NULL; the oracle's CASE guard
        # must pin DuckDB (whose concat skips NULLs) to the same
        import __spark_entry__ as entry
        from featurewiz_spark.text.pii import mask_pii

        rows = [(7, None, "srcx"), (8, "plain words", "srcy")]
        docs = spark.createDataFrame(
            rows, "doc_id long, text string, source string"
        )
        injected = docs.withColumn(
            "text", entry._pii_injected_text(F.col("doc_id"))
        )
        got = sorted(
            tuple(r)
            for r in mask_pii(injected)
            .select("doc_id", "text_masked", "pii_email_n")
            .collect()
        )
        duck.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR, source VARCHAR)"
        )
        duck.executemany("INSERT INTO documents VALUES (?, ?, ?)", rows)
        sql = entry.oracle_sql()["q79_pii_mask"]
        want = sorted(
            tuple(r)
            for r in duck.execute(
                f"SELECT doc_id, text_masked, pii_email_n FROM ({sql})"
            ).fetchall()
        )
        assert got == want
        assert got[0][1] is None  # the NULL-text row stays NULL

    def test_interval_join_reserved_name_raises(self, spark):
        import pytest

        pts = spark.createDataFrame(
            [(1, _ts("2024-01-01 00:00:00"), 0)],
            "pid int, ts timestamp, __ibucket int",
        )
        iv = spark.createDataFrame(
            [(9, _ts("2024-01-01 00:00:00"), _ts("2024-01-02 00:00:00"))],
            "iid int, s timestamp, e timestamp",
        )
        with pytest.raises(ValueError, match="__ibucket"):
            interval_join(
                pts, iv, point_ts="ts", start_col="s", end_col="e",
                bucket="1 day",
            )


class TestChunkDocuments:
    def test_window_rule_exact(self, spark):
        from featurewiz_spark.text.chunking import chunk_documents

        # 20 tokens, max 16, overlap 4 (stride 12): windows [0..15],
        # [12..19] — the second exists because 0*12+16 < 20
        toks = " ".join(f"t{i}" for i in range(20))
        docs = spark.createDataFrame([(1, toks)], "doc_id int, text string")
        out = sorted(
            chunk_documents(docs, max_tokens=16, overlap=4).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert [(r["chunk_idx"], r["chunk_start"], r["chunk_n_tokens"])
                for r in out] == [(0, 0, 16), (1, 12, 8)]
        assert out[1]["chunk_text"] == " ".join(f"t{i}" for i in range(12, 20))

    def test_short_and_exact_and_empty(self, spark):
        from featurewiz_spark.text.chunking import chunk_documents

        docs = spark.createDataFrame(
            [
                (1, "a b c"),                                # < max -> 1 window
                (2, " ".join(f"x{i}" for i in range(16))),   # == max -> 1
                (3, ""),                                     # empty -> none
                (4, None),                                   # null -> none
            ],
            "doc_id int, text string",
        )
        out = chunk_documents(docs, max_tokens=16, overlap=4).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        assert len(by_doc.get(1, [])) == 1
        assert by_doc[1][0]["chunk_n_tokens"] == 3
        assert len(by_doc.get(2, [])) == 1
        assert 3 not in by_doc and 4 not in by_doc

    def test_no_overlap_mode(self, spark):
        from featurewiz_spark.text.chunking import chunk_documents

        docs = spark.createDataFrame(
            [(1, " ".join(f"t{i}" for i in range(10)))],
            "doc_id int, text string",
        )
        out = sorted(
            chunk_documents(docs, max_tokens=4, overlap=0).collect(),
            key=lambda r: r["chunk_idx"],
        )
        assert [(r["chunk_start"], r["chunk_n_tokens"]) for r in out] == [
            (0, 4), (4, 4), (8, 2)]

    def test_param_validation(self, spark):
        import pytest

        from featurewiz_spark.text.chunking import chunk_documents

        docs = spark.createDataFrame([(1, "a")], "doc_id int, text string")
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(docs, max_tokens=8, overlap=8)

    def test_sql_mirror_matches(self, spark, duck):
        from featurewiz_spark.text.chunking import (
            chunk_documents,
            chunk_documents_sql,
        )

        rows = [
            (1, " ".join(f"w{i}" for i in range(40))),
            (2, "short doc here"),
            (3, "\n  leading whitespace doc with some more tokens here ok"),
            (4, None),
            (5, ""),
        ]
        docs = spark.createDataFrame(rows, "doc_id int, text string")
        got = sorted(
            tuple(r)
            for r in chunk_documents(docs, max_tokens=8, overlap=2).collect()
        )
        duck.execute("CREATE TABLE documents(doc_id INT, text VARCHAR)")
        duck.executemany("INSERT INTO documents VALUES (?, ?)", rows)
        want = sorted(
            tuple(r)
            for r in duck.execute(
                chunk_documents_sql("documents", max_tokens=8, overlap=2)
            ).fetchall()
        )
        assert got == want


class TestConnectedComponents:
    def test_transitive_cluster_and_singleton(self, spark):
        from featurewiz_spark.cache import cache_scope
        from featurewiz_spark.operators.components import attach_components

        docs = spark.createDataFrame(
            [(i, f"d{i}") for i in (1, 2, 3, 7, 9)], "doc_id int, text string"
        )
        # 1~2, 2~3 but NEVER 1~3 — the pair set alone can't dedup this
        pairs = spark.createDataFrame([(1, 2), (2, 3)], "a int, b int")
        with cache_scope():
            out = {
                r["doc_id"]: (r["component"], r["is_canonical"])
                for r in attach_components(docs, pairs).collect()
            }
        assert out[1] == (1, 1)
        assert out[2] == (1, 0)
        assert out[3] == (1, 0)
        # docs in no pair are their own canonical component
        assert out[7] == (7, 1) and out[9] == (9, 1)

    def test_long_chain_crosses_checkpoint(self, spark):
        from featurewiz_spark.cache import cache_scope
        from featurewiz_spark.operators.components import (
            connected_components,
        )

        # 0-1-2-...-12: diameter 12 forces many rounds AND crosses the
        # localCheckpoint boundary (checkpoint_every=5)
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(12)], "a int, b int"
        )
        with cache_scope():
            comp = {
                r["node"]: r["component"]
                for r in connected_components(pairs).collect()
            }
        assert comp == {i: 0 for i in range(13)}

    def test_two_clusters_stay_separate(self, spark):
        from featurewiz_spark.cache import cache_scope
        from featurewiz_spark.operators.components import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(10, 11), (11, 12), (20, 21)], "a int, b int"
        )
        with cache_scope():
            comp = {
                r["node"]: r["component"]
                for r in connected_components(pairs).collect()
            }
        assert comp == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_max_iter_raises(self, spark):
        import pytest

        from featurewiz_spark.cache import cache_scope
        from featurewiz_spark.operators.components import (
            connected_components,
        )

        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(8)], "a int, b int"
        )
        with cache_scope(), pytest.raises(RuntimeError, match="converge"):
            connected_components(pairs, max_iter=2)
