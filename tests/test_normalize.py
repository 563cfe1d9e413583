"""Unicode normalization (text/normalize.py): NFC known answers,
byte-identity vs the DuckDB mirror on an adversarial corpus, the NFKC
form vs unicodedata, and NULL/empty/plan contracts."""

import unicodedata

import pandas as pd
import pytest
from pyspark.sql import functions as F

from featurewiz_spark.text.normalize import (
    CONTROL_CLASS,
    add_unicode_normalized,
    unicode_normalize_col,
    unicode_normalize_sql,
)

# decomposed sequences, singletons, jamo, ligatures, stacked marks,
# C0/C1 controls, every whitespace char, astral plane, pure ASCII
CASES = [
    "café society",
    "Ångström units",
    "가 hangul jamo",
    "already é composed",
    "ligature ﬁle",  # NFC keeps ﬁ, NFKC folds to 'fi'
    "Å angstrom sign",  # singleton -> U+00C5
    "ö́ stacked marks",
    "ctrl\x07chars\x00here\x9d!",
    "tabs\there\nand\x0bmore\f\r end",
    "zero​width stays",  # ZWSP is NOT control/whitespace
    "astral \U0001d518 char",
    "ascii only text 123",
    "",
    "   \t\n  ",
    None,
    "\x07\x9f",  # all-junk -> ''
]


def _pyref(t, form="NFC"):
    import re

    if t is None:
        return None
    t = re.sub(r"[\x00-\x08\x0E-\x1F\x7F\x80-\x9F]", "", t)
    t = unicodedata.normalize(form, t)
    return re.sub(r"[ \t\n\x0B\f\r]+", " ", t).strip()


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i long, text string"
    )


def test_nfc_known_answers(spark):
    got = {
        r["i"]: r["text_norm"]
        for r in add_unicode_normalized(_df(spark), "text").collect()
    }
    assert got[0] == "café society"
    assert got[1] == "Ångström units"
    assert got[2] == "가 hangul jamo"  # U+1100 U+1161 -> U+AC00
    assert got[4] == "ligature ﬁle"  # NFC preserves compat ligature
    assert got[5] == "Å angstrom sign"
    assert got[7] == "ctrlcharshere!"
    assert got[8] == "tabs here and more end"
    assert got[12] == "" and got[13] == "" and got[14] is None
    assert got[15] == ""


def test_matches_python_reference_all_cases(spark):
    got = {
        r["i"]: r["text_norm"]
        for r in add_unicode_normalized(_df(spark), "text").collect()
    }
    for i, t in enumerate(CASES):
        assert got[i] == _pyref(t), (i, t)


def test_matches_duckdb_mirror_byte_identical(spark, duck):
    got = {
        r["i"]: r["text_norm"]
        for r in add_unicode_normalized(_df(spark), "text").collect()
    }
    duck.register(
        "t", pd.DataFrame({"i": range(len(CASES)), "text": pd.Series(CASES, dtype=object)})
    )
    for i, n in duck.execute(
        f'select i, {unicode_normalize_sql("text")} from t'
    ).fetchall():
        assert n == got[i], (i, repr(n), repr(got[i]))


def test_nfkc_form(spark):
    got = {
        r["i"]: r["t2"]
        for r in _df(spark)
        .withColumn("t2", unicode_normalize_col("text", form="NFKC"))
        .collect()
    }
    assert got[4] == "ligature file"  # ﬁ folded
    for i, t in enumerate(CASES):
        assert got[i] == _pyref(t, "NFKC"), (i, t)


def test_no_collapse_option(spark, duck):
    df = _df(spark).withColumn(
        "t2", unicode_normalize_col("text", collapse_ws=False)
    )
    got = {r["i"]: r["t2"] for r in df.collect()}
    assert got[8] == "tabs\there\nand\x0bmore\f\r end"
    duck.register(
        "t", pd.DataFrame({"i": range(len(CASES)), "text": pd.Series(CASES, dtype=object)})
    )
    for i, n in duck.execute(
        f'select i, {unicode_normalize_sql("text", collapse_ws=False)} from t'
    ).fetchall():
        assert n == got[i], i


def test_control_strip_before_compose(spark):
    # a control byte BETWEEN base and combining mark: stripping first
    # lets NFC compose; stripping after would leave it decomposed.
    df = spark.createDataFrame([("e\x07́",)], "text string")
    assert add_unicode_normalized(df, "text").first()["text_norm"] == "é"


def test_bad_form_and_clash_guards(spark):
    df = _df(spark)
    with pytest.raises(ValueError, match="form"):
        add_unicode_normalized(df, "text", form="NFX")
    with pytest.raises(ValueError, match="already exists"):
        add_unicode_normalized(df.withColumn("text_norm", F.lit("x")), "text")


def test_plan_shape_no_shuffle(spark):
    plan = (
        add_unicode_normalized(_df(spark), "text")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "ArrowEvalPython" in plan  # the NFC kernel is Arrow-batched


def test_control_class_is_shared_text():
    # the regex TEXT is identical across engines by construction
    assert CONTROL_CLASS in unicode_normalize_sql("text")
