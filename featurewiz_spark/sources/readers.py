"""Source readers (SURVEY.md §2.1 S1–S5).

The reference auto-detects CSV/Excel/feather with an encoding-fallback
chain (``load_file_dataframe``, reference featurewiz/featurewiz.py:186-280).
Spark-first equivalent: ``spark.read`` with format inference from the
extension; Parquet is the standard interchange (feather's role). Encoding
fallback is a single explicit option, not a retry chain — Spark's CSV
reader handles utf-8/latin1 via ``encoding``; malformed rows land in a
corrupt-record column instead of raising.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver testdata table (TESTDATA.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in _TABLES}


# temp files created by driver-side decompression, removed at exit
_TMP_FILES: list[str] = []


def _register_tmp_cleanup(name: str) -> None:
    if not _TMP_FILES:
        import atexit

        @atexit.register
        def _cleanup() -> None:
            for p in _TMP_FILES:
                try:
                    os.unlink(p)
                except OSError:
                    pass

    _TMP_FILES.append(name)


# Reference encoding fallback chain, featurewiz/featurewiz.py:233-244
_ENCODING_CHAIN = ["ascii", "utf-8", "iso-8859-1", "cp1252", "latin1"]

# Spark's CSVOptions accepts only a charset whitelist; map the chain's
# Python codec names onto it. cp1252/latin1 → ISO-8859-1: ISO-8859-1
# accepts every byte, so reads succeed; the 0x80-0x9F printables of
# cp1252 land as C1 controls (documented deviation — Spark has no
# windows-1252 charset).
_SPARK_CHARSET = {
    "ascii": "US-ASCII",
    "utf-8": "UTF-8",
    "iso-8859-1": "ISO-8859-1",
    "cp1252": "ISO-8859-1",
    "latin1": "ISO-8859-1",
}


def _probe_head(path: str, probe_bytes: int) -> bytes:
    """First bytes of the DECOMPRESSED content: probing the raw bytes of
    a .gz/.bz2/.xz/.zip file always fails ascii/utf-8 (binary magic) and
    falls through to iso-8859-1, mojibaking UTF-8 content on read."""
    low = path.lower()
    try:
        if low.endswith(".gz"):
            import gzip

            with gzip.open(path, "rb") as f:
                return f.read(probe_bytes)
        if low.endswith(".bz2"):
            import bz2

            with bz2.open(path, "rb") as f:
                return f.read(probe_bytes)
        if low.endswith(".xz"):
            import lzma

            with lzma.open(path, "rb") as f:
                return f.read(probe_bytes)
        if low.endswith(".zip"):
            import zipfile

            with zipfile.ZipFile(path) as z:
                names = z.namelist()
                if not names:
                    return b""
                with z.open(names[0]) as f:
                    return f.read(probe_bytes)
    except Exception:
        return b""
    with open(path, "rb") as f:
        return f.read(probe_bytes)


def detect_encoding(path: str, probe_bytes: int = 65536) -> str:
    """S1 multi-encoding CSV support, Spark-style: pandas raises
    UnicodeDecodeError and the reference retries the whole read with the
    next encoding; Spark instead silently mojibakes, so we probe the
    first 64KB driver-side against the same chain and hand the first
    clean encoding to the distributed reader (one tiny read, not N full
    ones). Compressed files are probed on DECOMPRESSED bytes, and a
    multibyte sequence cut at the probe boundary does not disqualify an
    encoding. Directories/globs fall back to utf-8."""
    import glob as _glob
    import os

    candidates = [path]
    if os.path.isdir(path):
        candidates = sorted(_glob.glob(os.path.join(path, "*")))
    if not candidates or not os.path.isfile(candidates[0]):
        return "utf-8"
    head = _probe_head(candidates[0], probe_bytes)
    for enc in _ENCODING_CHAIN:
        try:
            head.decode(enc)
            return enc
        except LookupError:
            continue
        except UnicodeDecodeError as ex:
            # an error within 4 bytes of the probe end is (likely) a
            # truncated multibyte sequence, not a wrong encoding —
            # retry on the trimmed head before rejecting
            if ex.start >= len(head) - 4:
                try:
                    head[: ex.start].decode(enc)
                    return enc
                except UnicodeDecodeError:
                    pass
            continue
    return "utf-8"


def _xlsx_col_index(cell_ref: str) -> int:
    """'B2' -> 1 (0-based column). Letters prefix only; row digits ignored."""
    idx = 0
    for ch in cell_ref:
        if ch.isalpha():
            idx = idx * 26 + (ord(ch.upper()) - 64)
        else:
            break
    return idx - 1


def _read_xlsx_stdlib(path: str, header: bool = True):
    """Minimal OOXML .xlsx reader on stdlib only (zipfile + ElementTree).

    Reads the FIRST worksheet of the workbook: shared and inline
    strings, numbers (integral columns downcast to int64, matching
    pandas.read_excel), booleans, formula cached values (<v> of a
    formula cell), sparse cells (missing -> None). Out of scope, by
    design: date-style detection (serials stay numeric), merged cells,
    formula recalculation — convert via pandas+openpyxl for those.

    Reference parity target: load_file_dataframe's pd.read_excel branch
    (reference featurewiz/featurewiz.py:245-247).
    """
    import xml.etree.ElementTree as ET
    import zipfile

    import pandas as _pd

    def _local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    with zipfile.ZipFile(path) as z:
        names = set(z.namelist())

        # workbook -> first sheet's relationship id -> sheet part path
        sheet_part = "xl/worksheets/sheet1.xml"
        if "xl/workbook.xml" in names:
            wb = ET.fromstring(z.read("xl/workbook.xml"))
            rid = None
            for el in wb.iter():
                if _local(el.tag) == "sheet":
                    for k, v in el.attrib.items():
                        if _local(k) == "id":
                            rid = v
                    break
            rels_name = "xl/_rels/workbook.xml.rels"
            if rid is not None and rels_name in names:
                rels = ET.fromstring(z.read(rels_name))
                for el in rels.iter():
                    if _local(el.tag) == "Relationship" and el.get("Id") == rid:
                        target = el.get("Target", "")
                        sheet_part = (
                            target.lstrip("/")
                            if target.startswith("/")
                            else "xl/" + target
                        )
                        break
        if sheet_part not in names:
            raise ValueError(
                f"no worksheet part found in {path} (looked for {sheet_part})"
            )

        # shared strings: one <si> per entry; rich-text runs are the
        # concatenation of every descendant <t>
        shared: list[str] = []
        if "xl/sharedStrings.xml" in names:
            sst = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in sst:
                if _local(si.tag) != "si":
                    continue
                shared.append(
                    "".join(
                        t.text or ""
                        for t in si.iter()
                        if _local(t.tag) == "t"
                    )
                )

        rows: list[dict[int, object]] = []
        for row_el in ET.fromstring(z.read(sheet_part)).iter():
            if _local(row_el.tag) != "row":
                continue
            cells: dict[int, object] = {}
            auto_col = 0
            for c in row_el:
                if _local(c.tag) != "c":
                    continue
                ref = c.get("r")
                col = _xlsx_col_index(ref) if ref else auto_col
                auto_col = col + 1
                ctype = c.get("t", "n")
                v_text, inline = None, None
                for child in c:
                    lc = _local(child.tag)
                    if lc == "v":
                        v_text = child.text or ""
                    elif lc == "is":  # inline string
                        inline = "".join(
                            t.text or ""
                            for t in child.iter()
                            if _local(t.tag) == "t"
                        )
                if ctype == "s":
                    cells[col] = shared[int(v_text)] if v_text else None
                elif ctype == "inlineStr":
                    cells[col] = inline
                elif ctype == "b":
                    cells[col] = None if v_text is None else v_text == "1"
                elif ctype in ("str", "e"):  # formula string / error text
                    cells[col] = v_text
                else:  # "n" and default: numeric
                    cells[col] = None if v_text in (None, "") else float(v_text)
            rows.append(cells)

    ncols = max((max(r) + 1 for r in rows if r), default=0)
    matrix = [[r.get(i) for i in range(ncols)] for r in rows]
    if header and matrix:
        colnames = [
            str(v) if v is not None else f"_c{i}"
            for i, v in enumerate(matrix[0])
        ]
        matrix = matrix[1:]
        # de-duplicate like pandas.read_excel (suffix .1, .2, ...):
        # with two identical header cells, pdf[col] below would return
        # a DataFrame and the dtype-coercion loop would crash or
        # misclassify the column rewrite
        seen: dict[str, int] = {}
        for i, c in enumerate(colnames):
            n = seen.get(c, 0)
            seen[c] = n + 1
            if n:
                colnames[i] = f"{c}.{n}"
    else:
        colnames = [f"_c{i}" for i in range(ncols)]

    pdf = _pd.DataFrame(matrix, columns=colnames)
    for col in pdf.columns:
        s = pdf[col]
        nonnull = s.dropna()
        if nonnull.empty:
            continue
        if all(isinstance(v, float) for v in nonnull):
            # pandas.read_excel parity: integral no-NaN column -> int64
            if not s.isna().any() and all(v == int(v) for v in nonnull):
                pdf[col] = s.astype("int64")
            else:
                pdf[col] = s.astype("float64")
        elif all(isinstance(v, bool) for v in nonnull):
            if not s.isna().any():
                pdf[col] = s.astype("bool")
            # else: leave object (True/False/None) — Spark infers a
            # nullable boolean from it; stringifying would lose type
        else:
            pdf[col] = s.map(lambda v: None if v is None else str(v))
    return pdf


def read_any(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    encoding: str = "auto",
) -> DataFrame:
    """Extension-dispatched read: parquet/csv/tsv/json/feather;
    compressed CSV (gz/bz2/zip/xz) is decoded by Spark's codec
    inference (S3); encoding='auto' runs the reference's fallback
    chain via a driver-side probe (S1).

    Reference: load_file_dataframe, featurewiz/featurewiz.py:186-280
    (CSV encodings :233-244, xlsx :245-247, compression :248-257,
    feather :513-517). Feather is not a splittable format, so it is
    read driver-side via pyarrow and parallelized — appropriate for the
    reference's single-node-sized feather files; convert to Parquet for
    anything larger. .xlsx prefers pandas+openpyxl (full fidelity) and
    falls back to a pure-stdlib zip+XML parser when openpyxl is absent;
    legacy binary .xls stays gated (needs xlrd).
    """
    low = path.lower()
    stripped = low
    for comp in (".gz", ".bz2", ".zip", ".xz"):
        if stripped.endswith(comp):
            stripped = stripped[: -len(comp)]
    if low.endswith((".zip", ".xz")):
        # Hadoop ships NO zip/xz codec: Spark would parse the raw
        # archive bytes as CSV mojibake with no error. Decompress
        # driver-side to a temp file (what the reference's pandas read
        # does) and re-dispatch — appropriate for the single-node-sized
        # files these extensions imply; recompress to gz/parquet for
        # anything that must be read distributed.
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile

        suffix = "_" + _os.path.basename(stripped)
        # stream-copy in bounded chunks: f.read() would materialize the
        # whole decompressed payload in driver RAM (a multi-GB archive
        # OOMs the driver for no reason); copyfileobj keeps RSS flat at
        # the chunk size. The temp file is registered for interpreter-
        # exit cleanup so repeated reads don't accumulate full-size
        # decompressed copies in the temp dir.
        with _tempfile.NamedTemporaryFile(delete=False, suffix=suffix) as tmp:
            if low.endswith(".zip"):
                import zipfile

                with zipfile.ZipFile(path) as z:
                    names = z.namelist()
                    if not names:  # same guard as the probe helper
                        raise ValueError(f"empty zip archive: {path}")
                    with z.open(names[0]) as f:
                        _shutil.copyfileobj(f, tmp, length=1 << 20)
            else:
                import lzma

                with lzma.open(path, "rb") as f:
                    _shutil.copyfileobj(f, tmp, length=1 << 20)
        _register_tmp_cleanup(tmp.name)
        return read_any(spark, tmp.name, sep=sep, header=header, encoding=encoding)
    if stripped.endswith((".parquet", ".pq")):
        return spark.read.parquet(path)
    if stripped.endswith((".feather", ".ftr")):
        import pyarrow.feather as _feather

        return spark.createDataFrame(_feather.read_table(path).to_pandas())
    if stripped.endswith(".xls"):
        # legacy BIFF binary workbook — no stdlib parser exists; xlrd
        # is absent here, so this stays an explicit gate.
        raise NotImplementedError(
            "legacy .xls read requires xlrd (not installed); convert to "
            ".xlsx/CSV/Parquet, or install xlrd and read via pandas"
        )
    if stripped.endswith(".xlsx"):
        try:
            import openpyxl  # noqa: F401

            import pandas as _pd

            return spark.createDataFrame(_pd.read_excel(path))
        except ImportError:
            # full-fidelity path needs openpyxl; fall back to the
            # stdlib zip+XML parser below (values + types; no date
            # styles / merged cells / formula recalculation).
            pass
        pdf = _read_xlsx_stdlib(path, header=header)
        if len(pdf) == 0:
            # Spark cannot infer a schema from an empty pandas frame;
            # derive it from the dtypes the parser settled on
            from pyspark.sql import types as _T

            _DT = {"int64": _T.LongType(), "float64": _T.DoubleType(),
                   "bool": _T.BooleanType()}
            schema = _T.StructType(
                [
                    _T.StructField(
                        c, _DT.get(str(pdf[c].dtype), _T.StringType()), True
                    )
                    for c in pdf.columns
                ]
            )
            return spark.createDataFrame([], schema)
        return spark.createDataFrame(pdf)
    if stripped.endswith(".json") or stripped.endswith(".jsonl"):
        return spark.read.json(path)
    if stripped.endswith(".tsv"):
        sep = "\t"
    if encoding == "auto":
        encoding = detect_encoding(path)
    encoding = _SPARK_CHARSET.get(encoding.lower(), encoding)
    return (
        spark.read.option("header", str(header).lower())
        .option("sep", sep)
        .option("encoding", encoding)
        .option("inferSchema", "true")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )


def sample_rows(
    df: DataFrame, n: int, target: str | None = None, seed: int = 42
) -> DataFrame:
    """S4/P10: bounded row sample. Classification (target given) →
    per-class proportional Bernoulli sample (EXPECTED size n — sampleBy
    is per-row coin flips, the result can exceed n); regression/none →
    limit(n). NULL-target rows form their own stratum via a sentinel
    key — sampleBy treats a missing key as fraction 0, which silently
    dropped the whole NULL class.

    Reference: nrows branch featurewiz/featurewiz.py:267-276 and
    EDA_randomly_select_rows_from_dataframe :2842-2870.
    """
    total = df.count()
    if total <= n:
        return df
    if target is None:
        return df.limit(n)
    frac = n / total
    skey = F.coalesce(F.col(target).cast("string"), F.lit("__fw_null__"))
    kdf = df.withColumn("__fw_skey", skey)
    fractions = {
        r[0]: frac for r in kdf.select("__fw_skey").distinct().collect()
    }
    return kdf.sampleBy("__fw_skey", fractions=fractions, seed=seed).drop(
        "__fw_skey"
    )


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """S6 sink: Parquet with optional partition columns. At scale the
    north rule targets an Iceberg table partitioned by days(warc_ts) /
    bucket(url); plain Parquet partitioning is the sandbox stand-in."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
