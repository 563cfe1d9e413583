"""Source-reader tests (SURVEY §2.1 S1-S3): extension dispatch,
encoding-fallback chain, feather, codec'd CSV, xlsx gate."""

import gzip
import os

import pandas as pd
import pytest

from featurewiz_spark.sources.readers import detect_encoding, read_any


def test_read_csv_latin1_auto_detect(spark, tmp_path):
    p = str(tmp_path / "latin.csv")
    with open(p, "wb") as f:
        f.write("name,v\ncafé,1\nmüller,2\n".encode("latin1"))
    assert detect_encoding(p) == "iso-8859-1"  # first chain hit that decodes
    df = read_any(spark, p)
    names = {r["name"] for r in df.collect()}
    assert names == {"café", "müller"}


def test_read_csv_ascii_detects_ascii(spark, tmp_path):
    p = str(tmp_path / "plain.csv")
    with open(p, "w") as f:
        f.write("a,b\n1,2\n")
    assert detect_encoding(p) == "ascii"
    assert read_any(spark, p).count() == 1


def test_read_feather_roundtrip(spark, tmp_path):
    p = str(tmp_path / "t.feather")
    pdf = pd.DataFrame({"x": [1, 2, 3], "s": ["a", "b", "c"]})
    pdf.to_feather(p)
    got = read_any(spark, p).toPandas().sort_values("x").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, pdf)


def test_read_csv_gz_codec(spark, tmp_path):
    p = str(tmp_path / "z.csv.gz")
    with gzip.open(p, "wt") as f:
        f.write("a,b\n1,x\n2,y\n")
    df = read_any(spark, p)
    assert df.count() == 2 and set(df.columns) == {"a", "b"}


def test_read_tsv_dispatch(spark, tmp_path):
    p = str(tmp_path / "t.tsv")
    with open(p, "w") as f:
        f.write("a\tb\n1\t2\n")
    df = read_any(spark, p)
    assert df.columns == ["a", "b"] and df.first()["b"] == 2


def test_read_xlsx_gated(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    open(p, "wb").close()
    try:
        import openpyxl  # noqa: F401

        pytest.skip("openpyxl present; gate not applicable")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError, match="openpyxl"):
        read_any(spark, p)
