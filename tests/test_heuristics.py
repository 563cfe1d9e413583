"""C4 + Gopher heuristic filters (text/heuristics.py): rule checks on
planted fixtures plus strict Spark-vs-generated-DuckDB mirror parity on
adversarial text (the same discipline as the other text modules)."""

import pytest
from pyspark.sql import functions as F


def _fixture_rows():
    good = (
        "The quick brown fox jumps over the lazy dog today.\n"
        "We have plenty of words and that is fine with everyone here.\n"
        "Be sure to read all of it before you decide anything at all.\n"
        "This corpus page is made of honest prose that ends properly.\n"
        "And that should be more than enough to pass the word gate."
    )
    # pad to >=50 words: good already has ~55 words
    rows = [
        (0, good),
        (1, "short line\nno punct here\ntiny"),  # no line survives C4
        (2, "This page mentions lorem ipsum filler text sadly.\n"
            "It has other fine sentences that would pass.\n"
            "And a third one that also ends correctly."),
        (3, "function() { return 1; }\nSome text with code braces.\n"
            "Another sentence ends here.\nAnd one more for the count."),
        (4, "This line talks about JavaScript frameworks today.\n"
            "This other line is clean and ends with a period.\n"
            "A third good line also ends with a question mark?\n"
            "A fourth keeps the page above the line threshold."),
        (5, "• bullet one\n• bullet two\n• bullet three"),
        (6, "Trailing thought goes on and on...\nAnother trailing one…\n"
            "A third trailing line again..."),
        (7, "#### #### #### #### ####"),
        (8, ""),
        (9, None),
        (10, "Zwölf Boxkämpfer jagen Viktor quer über den Sylter Deich.\r\n"
             "Les élèves étudient la leçon avant le déjeuner chaque jour."),
        (11, "数据 管道 清洗 规则 测试 文本 页面 内容 样例 字符."),
        # trailing \r with NO newline: Java's $ would match before it,
        # RE2's would not — the \z anchors must make both engines drop
        (12, "This line ends with a period then a stray CR.\r"),
        # vertical tab: Java \s matches it, RE2 \s does not — the
        # explicit WS_CLASS keeps tokenization identical
        (13, "a\x0Bb word gap test ends here."),
    ]
    return rows


@pytest.fixture(scope="module")
def filtered(spark):
    from featurewiz_spark.text.heuristics import add_c4_gopher_filters

    df = spark.createDataFrame(_fixture_rows(), "doc_id: long, text: string")
    out = add_c4_gopher_filters(df).collect()
    return {r["doc_id"]: r for r in out}


def test_c4_line_rules(filtered):
    r = filtered
    # doc 0: every line ends in '.', >=3 words -> all 5 kept, page keeps
    assert r[0]["c4_n_kept_lines"] == 5 and r[0]["c4_keep"] is True
    # doc 1: no line ends in terminal punctuation -> 0 kept, dropped
    assert r[1]["c4_n_kept_lines"] == 0 and r[1]["c4_keep"] is False
    # doc 2: lorem ipsum kills the page even with 3 kept lines
    assert r[2]["c4_has_lorem"] is True and r[2]["c4_keep"] is False
    # doc 3: curly brace kills the page
    assert r[3]["c4_has_brace"] is True and r[3]["c4_keep"] is False
    # doc 4: the javascript line is removed, the other three survive
    assert r[4]["c4_n_kept_lines"] == 3 and r[4]["c4_keep"] is True
    assert "JavaScript" not in r[4]["c4_clean_text"]
    # doc 10: \r\n split — the \r must not defeat the '.' anchor
    assert r[10]["c4_n_kept_lines"] == 2


def test_gopher_rules(filtered):
    r = filtered
    # doc 0: >=50 words of fluent prose -> passes every gate
    assert r[0]["gopher_n_words"] >= 50 and r[0]["gopher_keep"] is True
    # doc 5: all lines bullets -> frac_bullet = 1.0 > 0.9 (and word gate)
    assert r[5]["gopher_frac_bullet"] == 1.0 and r[5]["gopher_keep"] is False
    # doc 6: all lines end with ellipsis (both '...' and '…' forms)
    assert r[6]["gopher_frac_ellipsis"] == 1.0
    # doc 7: pure '#' symbols -> symbol ratio high, alpha frac 0
    assert r[7]["gopher_symbol_ratio"] > 0.1
    assert r[7]["gopher_frac_alpha"] == 0.0
    # doc 11: CJK — \p{L} counts Han as letters, page is not punished
    assert r[11]["gopher_frac_alpha"] == 1.0


def test_null_and_empty_contract(filtered):
    r = filtered
    assert r[8]["c4_n_lines"] == 1 and r[8]["c4_n_kept_lines"] == 0
    assert r[8]["gopher_n_words"] == 0 and r[8]["gopher_keep"] is False
    assert r[9]["c4_clean_text"] is None and r[9]["c4_keep"] is None
    assert r[9]["gopher_n_words"] == 0 and r[9]["gopher_keep"] is False


def test_column_clash_raises(spark):
    from featurewiz_spark.text.heuristics import add_c4_gopher_filters

    df = spark.createDataFrame([(1, "x", True)],
                               "doc_id: long, text: string, c4_keep: boolean")
    with pytest.raises(ValueError, match="columns exist"):
        add_c4_gopher_filters(df)


def test_sql_mirror_parity(spark, duck, tmp_path):
    """Strict value parity Spark vs the generated DuckDB mirror on the
    full adversarial fixture — every output column, no canonicalization
    beyond column ordering."""
    from featurewiz_spark.text.heuristics import (
        add_c4_gopher_filters,
        c4_gopher_sql,
    )

    df = spark.createDataFrame(_fixture_rows(), "doc_id: long, text: string")
    p = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.mode("overwrite").parquet(p)

    out_cols = [
        "doc_id", "c4_clean_text", "c4_n_lines", "c4_n_kept_lines",
        "c4_has_lorem", "c4_has_brace", "c4_keep", "gopher_n_words",
        "gopher_mean_word_len", "gopher_symbol_ratio", "gopher_frac_bullet",
        "gopher_frac_ellipsis", "gopher_frac_alpha", "gopher_stop_hits",
        "gopher_keep",
    ]
    spark_rows = sorted(
        map(tuple, add_c4_gopher_filters(df).select(*out_cols).collect())
    )
    duck.sql(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")
    sql = c4_gopher_sql("docs")
    duck_rows = sorted(map(tuple, duck.sql(
        f"SELECT {', '.join(out_cols)} FROM ({sql})"
    ).fetchall()))
    assert len(spark_rows) == len(duck_rows)
    for s, d in zip(spark_rows, duck_rows):
        assert s == d, (s, d)


def test_terminal_anchor_is_strict_end_of_text(filtered):
    # the '.\r' line is the whole doc: \z rejects it in BOTH engines
    assert filtered[12]["c4_n_kept_lines"] == 0
