"""Checkpoint / lineage manifests for resumable pipelines (north rule:
"resumable from checkpoint with per-partition lineage + metrics").

Design (SURVEY.md §4): each pipeline stage writes its output Parquet
partitioned by a bucket key, PLUS a manifest table with one row per
bucket: (stage, bucket, row_count, value_checksum, written_at_commit).
Resume = anti-join of the plan's bucket list vs the manifest — only
missing/invalid buckets recompute. The checksum is an order-insensitive
xor-aggregate of row hashes, so it is partition-layout independent.

This is the plain-Parquet stand-in for Iceberg snapshot + manifest
metadata; the API would be unchanged over an Iceberg catalog.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_DIR = "_manifest"


def _bucketed(df: DataFrame, keys: list[str], n_buckets: int) -> DataFrame:
    return df.withColumn(
        "__bucket", F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets))
    )


def _bucket_manifest(df: DataFrame, stage: str) -> DataFrame:
    """Per-bucket row counts + order-insensitive checksum over ALL
    columns (xor of row xxhash64 — commutative, so layout-independent)."""
    data_cols = [c for c in df.columns if c != "__bucket"]
    cols_sql = ", ".join(f"`{c}`" for c in data_cols)
    return df.groupBy("__bucket").agg(
        F.count(F.lit(1)).alias("row_count"),
        # bit_xor of per-row hashes: commutative → identical regardless
        # of partition layout or row order
        F.expr(f"bit_xor(xxhash64({cols_sql}))").alias("checksum"),
    ).withColumn("stage", F.lit(stage))


def _pad_manifest(spark: SparkSession, man: DataFrame, stage: str, buckets) -> DataFrame:
    """Empty buckets produce no groupBy row; record them as done with
    row_count=0 so resume_plan doesn't retry them forever. The bucket
    list is metadata-scale (≤ thousands), so driver-side is fine."""
    have = {r["__bucket"] for r in man.select("__bucket").collect()}
    missing = [int(b) for b in buckets if b not in have]
    if not missing:
        return man
    pad = spark.createDataFrame(
        [(b, 0, 0, stage) for b in missing],
        "`__bucket` long, row_count long, checksum long, stage string",
    )
    return man.unionByName(pad)


def write_stage(
    df: DataFrame,
    out_dir: str,
    stage: str,
    keys: list[str],
    n_buckets: int = 64,
) -> None:
    """Write stage output partitioned by bucket + its manifest."""
    b = _bucketed(df, keys, n_buckets)
    b.write.mode("overwrite").partitionBy("__bucket").parquet(
        os.path.join(out_dir, stage)
    )
    man = _pad_manifest(
        df.sparkSession, _bucket_manifest(b, stage), stage, range(n_buckets)
    )
    man.write.mode("overwrite").parquet(os.path.join(out_dir, MANIFEST_DIR, stage))


def resume_plan(
    spark: SparkSession, out_dir: str, stage: str, n_buckets: int = 64
) -> list[int]:
    """Buckets still to compute: all buckets minus valid manifest rows.
    A bucket is valid if its manifest row exists and re-reading the data
    reproduces (row_count) — the checksum re-validation is optional/deep.
    """
    man_path = os.path.join(out_dir, MANIFEST_DIR, stage)
    try:
        man = spark.read.parquet(man_path)
        done = {r["__bucket"] for r in man.select("__bucket").collect()}
    except Exception:
        done = set()
    return [b for b in range(n_buckets) if b not in done]


def run_resumable(
    spark: SparkSession,
    source: DataFrame,
    transform,
    out_dir: str,
    stage: str,
    keys: list[str],
    n_buckets: int = 16,
    chunk_buckets: int | None = None,
) -> DataFrame:
    """Execute `transform(bucket_subset)` only for buckets missing from
    the manifest; append results + manifest rows. Returns the full stage
    output (all buckets). Kill/restart-safe: a bucket either has its
    data AND manifest row, or is recomputed from scratch (the data write
    commits BEFORE the manifest append, so a manifest row never points
    at uncommitted data).

    ``chunk_buckets``: commit granularity. None (default) runs every
    missing bucket as ONE job — cheapest, but a crash mid-run loses all
    in-flight progress (Spark's commit protocol is all-or-nothing per
    write job). Setting it (e.g. n_buckets // 8) processes the todo
    list in chunks, each with its own data-write + manifest-append —
    a kill preserves every completed chunk and the rerun recomputes
    only the rest, at the cost of one job submission per chunk. At
    cluster scale, size chunks so each is several minutes of work:
    progress checkpoints are then cheap relative to the compute.

    Bucket-granular writes: data lands under __bucket=N directories via
    dynamic partition overwrite, so a retry replaces only its bucket.
    """
    todo = resume_plan(spark, out_dir, stage, n_buckets)
    if todo:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        step = len(todo) if not chunk_buckets else max(1, int(chunk_buckets))
        for i in range(0, len(todo), step):
            chunk = todo[i : i + step]
            b = _bucketed(source, keys, n_buckets).filter(
                F.col("__bucket").isin(chunk)
            )
            out = transform(b)
            if "__bucket" not in out.columns:
                out = _bucketed(out, keys, n_buckets)
            out.write.mode("overwrite").partitionBy("__bucket").parquet(
                os.path.join(out_dir, stage)
            )
            man = _pad_manifest(spark, _bucket_manifest(out, stage), stage, chunk)
            man.write.mode("append").parquet(
                os.path.join(out_dir, MANIFEST_DIR, stage)
            )
    return spark.read.parquet(os.path.join(out_dir, stage))


def validate_stage(spark: SparkSession, out_dir: str, stage: str) -> DataFrame:
    """Deep re-validation: recompute per-bucket count+checksum from the
    stored data and join against the manifest; returns mismatching rows
    (empty = intact)."""
    data = spark.read.parquet(os.path.join(out_dir, stage))
    man = spark.read.parquet(os.path.join(out_dir, MANIFEST_DIR, stage))
    current = _bucket_manifest(data, stage).withColumnRenamed(
        "row_count", "rc_now"
    ).withColumnRenamed("checksum", "ck_now")
    j = man.join(current, on=["__bucket", "stage"], how="full")
    return j.filter(
        (F.coalesce(F.col("row_count"), F.lit(-1)) != F.coalesce(F.col("rc_now"), F.lit(0)))
        | (F.coalesce(F.col("checksum"), F.lit(-1)) != F.coalesce(F.col("ck_now"), F.lit(0)))
    )
