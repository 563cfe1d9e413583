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


def test_table_io_parquet_roundtrip(spark, tmp_path):
    from featurewiz_spark.sources.table_io import read_table, write_table

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    p = str(tmp_path / "t")
    write_table(df, p, table_format="parquet")
    back = read_table(spark, p, table_format="parquet")
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_table_io_iceberg_gate_and_ddl(spark):
    import pytest as _pytest

    from featurewiz_spark.sources.table_io import (
        dedup_merge_sql,
        pages_table_ddl,
        read_table,
    )

    # no Iceberg catalog in this sandbox → explicit, named failure
    with _pytest.raises(RuntimeError, match="Iceberg catalog"):
        read_table(spark, "lake.web.pages", table_format="iceberg")
    ddl = pages_table_ddl()
    assert "days(warc_ts)" in ddl and "bucket(1024, url)" in ddl
    assert "USING iceberg" in ddl
    merge = dedup_merge_sql("lake.web.pages_dedup", "new_batch")
    assert merge.startswith("MERGE INTO") and "WHEN NOT MATCHED" in merge
