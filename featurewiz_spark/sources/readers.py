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


def read_any(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    header: bool = True,
    encoding: str = "utf-8",
) -> DataFrame:
    """Extension-dispatched read: parquet/csv/tsv/json; compressed CSV
    (gz/bz2/zip/xz) is decoded by Spark's codec inference (S3).

    Reference: load_file_dataframe, featurewiz/featurewiz.py:186-280
    (CSV encodings :233-244, xlsx :245-247, compression :248-257,
    feather :513-517). Excel is out of scope (no distributed reader);
    callers convert to CSV/Parquet first.
    """
    low = path.lower()
    stripped = low
    for comp in (".gz", ".bz2", ".zip", ".xz"):
        if stripped.endswith(comp):
            stripped = stripped[: -len(comp)]
    if stripped.endswith((".parquet", ".pq")):
        return spark.read.parquet(path)
    if stripped.endswith(".json") or stripped.endswith(".jsonl"):
        return spark.read.json(path)
    if stripped.endswith(".tsv"):
        sep = "\t"
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
    per-class proportional sample; regression/none → limit(n).

    Reference: nrows branch featurewiz/featurewiz.py:267-276 and
    EDA_randomly_select_rows_from_dataframe :2842-2870.
    """
    total = df.count()
    if total <= n:
        return df
    if target is None:
        return df.limit(n)
    frac = n / total
    fractions = {
        r[0]: frac for r in df.select(target).distinct().collect() if r[0] is not None
    }
    return df.sampleBy(target, fractions=fractions, seed=seed)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None,
                  mode: str = "overwrite") -> None:
    """S6 sink: Parquet with optional partition columns. At scale the
    north rule targets an Iceberg table partitioned by days(warc_ts) /
    bucket(url); plain Parquet partitioning is the sandbox stand-in."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)
