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


def _write_minimal_xlsx(path: str) -> None:
    """Hand-built OOXML workbook: shared + inline strings, int/float
    numbers, a boolean, and a sparse row (C3 missing)."""
    import zipfile

    ct = (
        '<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats'
        '.org/package/2006/content-types">'
        '<Default Extension="rels" ContentType="application/vnd.openxml'
        'formats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        "vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"
        '"/></Types>'
    )
    root_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
        'xmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/officeDocument" Target="xl/'
        'workbook.xml"/></Relationships>'
    )
    wb = (
        '<?xml version="1.0"?><workbook xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.'
        'openxmlformats.org/officeDocument/2006/relationships"><sheets>'
        '<sheet name="Sheet1" sheetId="1" r:id="rId1"/></sheets></workbook>'
    )
    wb_rels = (
        '<?xml version="1.0"?><Relationships xmlns="http://schemas.open'
        'xmlformats.org/package/2006/relationships">'
        '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/'
        'officeDocument/2006/relationships/worksheet" Target="worksheets/'
        'sheet1.xml"/></Relationships>'
    )
    sst = (
        '<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats'
        '.org/spreadsheetml/2006/main" count="3" uniqueCount="3">'
        "<si><t>name</t></si><si><t>alpha</t></si>"
        "<si><r><t>be</t></r><r><t>ta</t></r></si></sst>"
    )
    sheet = (
        '<?xml version="1.0"?><worksheet xmlns="http://schemas.openxml'
        'formats.org/spreadsheetml/2006/main"><sheetData>'
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t>amount</t></is></c>'
        '<c r="C1" t="inlineStr"><is><t>flag</t></is></c></row>'
        '<row r="2">'
        '<c r="A2" t="s"><v>1</v></c>'
        '<c r="B2"><v>1.5</v></c>'
        '<c r="C2" t="b"><v>1</v></c></row>'
        '<row r="3">'
        '<c r="A3" t="s"><v>2</v></c>'
        '<c r="B3"><v>2</v></c></row>'
        "</sheetData></worksheet>"
    )
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", sst)
        z.writestr("xl/worksheets/sheet1.xml", sheet)


def test_read_xlsx_stdlib(spark, tmp_path):
    p = str(tmp_path / "t.xlsx")
    _write_minimal_xlsx(p)
    df = read_any(spark, p)
    assert df.columns == ["name", "amount", "flag"]
    rows = {r["name"]: r for r in df.collect()}
    assert rows["alpha"]["amount"] == 1.5 and rows["alpha"]["flag"] is True
    # rich-text shared string concatenates runs; sparse C3 -> NULL
    assert rows["beta"]["amount"] == 2.0 and rows["beta"]["flag"] is None


def test_read_xlsx_stdlib_int_downcast(tmp_path):
    # integral no-NaN numeric column -> int64 (pandas.read_excel parity)
    from featurewiz_spark.sources.readers import _read_xlsx_stdlib

    p = str(tmp_path / "ints.xlsx")
    _write_minimal_xlsx(p)
    pdf = _read_xlsx_stdlib(p)
    assert str(pdf["amount"].dtype) == "float64"  # 1.5 present
    pdf2 = _read_xlsx_stdlib(p, header=False)
    assert list(pdf2.columns) == ["_c0", "_c1", "_c2"]
    assert pdf2["_c0"].tolist() == ["name", "alpha", "beta"]


def test_read_xls_gated(spark, tmp_path):
    p = str(tmp_path / "t.xls")
    open(p, "wb").close()
    with pytest.raises(NotImplementedError, match="xlrd"):
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
