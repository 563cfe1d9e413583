"""Lakehouse table IO — format routing for the north-rule Iceberg target.

The north rule stores Common-Crawl-style pages in an Iceberg table
partitioned by ``days(warc_ts) / bucket(url)`` at 10^12-document scale.
This sandbox's pyspark install carries no Iceberg/Delta runtime jars, so
the engine runs on partitioned Parquet — but the ROUTING is a config
choice, not a rewrite: every reader/writer below dispatches on
``table_format`` and degrades explicitly (raises with the exact missing
dependency) rather than silently falling back.

Why Iceberg matters at the target scale (and what Parquet loses):
- hidden partitioning (``days(ts)``, ``bucket(n, url)``): queries prune
  without knowing the partition layout; Parquet needs explicit partition
  columns baked into every query.
- snapshot isolation + incremental reads: the curation pipeline can
  consume only appended files since the last run; Parquet reruns scan
  everything (our lineage manifests — plans/lineage.py — reimplement the
  resume half of this for the sandbox).
- MERGE INTO for dedup upserts instead of full rewrites.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_FORMATS = ("parquet", "iceberg", "delta")


def _require_catalog(spark: SparkSession, fmt: str) -> None:
    if fmt == "iceberg":
        ok = any(
            k.startswith("spark.sql.catalog.") and "iceberg" in v.lower()
            for k, v in spark.sparkContext.getConf().getAll()
        )
        if not ok:
            raise RuntimeError(
                "table_format='iceberg' needs an Iceberg catalog "
                "(spark.sql.catalog.<name>=org.apache.iceberg.spark."
                "SparkCatalog + the iceberg-spark-runtime jar); none is "
                "configured in this session — use 'parquet' here"
            )
    elif fmt == "delta":
        try:
            spark._jvm.io.delta.tables.DeltaTable  # noqa: B018
        except Exception as ex:  # pragma: no cover - env without delta
            raise RuntimeError(
                "table_format='delta' needs delta-spark on the classpath"
            ) from ex


def read_table(
    spark: SparkSession, location: str, table_format: str = "parquet"
) -> DataFrame:
    """Read a table by location (parquet path) or catalog identifier
    (iceberg/delta). Column pruning and partition/file pruning flow
    through whichever source is used — the downstream operators are
    format-agnostic DataFrames either way."""
    if table_format not in _FORMATS:
        raise ValueError(f"table_format must be one of {_FORMATS}")
    if table_format == "parquet":
        return spark.read.parquet(location)
    _require_catalog(spark, table_format)
    if table_format == "iceberg":
        return spark.read.format("iceberg").load(location)
    return spark.read.format("delta").load(location)


def write_table(
    df: DataFrame,
    location: str,
    table_format: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Write with the format's native partitioning. For parquet,
    `partition_by` must be real columns (derive `warc_day` etc. first);
    iceberg accepts hidden-partition TRANSFORMS at table-create time
    (see pages_table_ddl) so the write itself needs no extra columns.

    mode semantics on the iceberg/delta branch mirror parquet's:
    'overwrite' → createOrReplace (replaces table contents + schema),
    'append' → append to the EXISTING table (raises if absent — the
    incremental-ingest call must never silently destroy table history,
    which is exactly what an unconditional createOrReplace did).
    partition_by applies at table creation only, so append+partition_by
    is rejected explicitly (the table's partition spec is already
    fixed)."""
    if table_format not in _FORMATS:
        raise ValueError(f"table_format must be one of {_FORMATS}")
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be 'overwrite' or 'append', got {mode!r}")
    if table_format == "parquet":
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(location)
        return
    _require_catalog(df.sparkSession, table_format)
    writer = df.writeTo(location).using(table_format)
    if mode == "append":
        if partition_by:
            raise ValueError(
                "partition_by is fixed at table creation for "
                f"{table_format}; append cannot change the partition spec"
            )
        writer.append()
        return
    if partition_by:
        from pyspark.sql import functions as F

        writer = writer.partitionedBy(*[F.col(c) for c in partition_by])
    writer.createOrReplace()


def pages_table_ddl(
    identifier: str = "lake.web.pages", url_buckets: int = 1024
) -> str:
    """The north-rule pages table as Iceberg DDL: hidden partitioning by
    day + url bucket gives (a) partition pruning for time-sliced reads,
    (b) a co-location key for the per-url as-of sort so the range
    partitioner's shuffle reads are bucket-local. 1024 url buckets keeps
    each (day, bucket) cell in the low-GB range at 10^12 docs."""
    return (
        f"CREATE TABLE {identifier} (\n"
        "  url STRING,\n"
        "  warc_ts TIMESTAMP,\n"
        "  html BINARY,\n"
        "  text STRING,\n"
        "  lang STRING\n"
        ") USING iceberg\n"
        f"PARTITIONED BY (days(warc_ts), bucket({url_buckets}, url))\n"
        "TBLPROPERTIES (\n"
        "  'write.distribution-mode' = 'hash',\n"
        "  'write.target-file-size-bytes' = '536870912'\n"
        ")"
    )


def dedup_merge_sql(
    target: str, source_view: str, key: str = "content_hash"
) -> str:
    """Iceberg MERGE INTO for incremental exact-dedup upserts: new docs
    whose content hash already exists keep the min-id keeper row;
    genuinely new content inserts. Avoids the full-table rewrite a
    Parquet dedup requires on every batch."""
    return (
        f"MERGE INTO {target} t\n"
        f"USING {source_view} s\n"
        f"ON t.{key} = s.{key}\n"
        "WHEN MATCHED AND s.keeper_id < t.keeper_id THEN\n"
        "  UPDATE SET t.keeper_id = s.keeper_id, t.n_dups = t.n_dups + s.n_dups\n"
        "WHEN MATCHED THEN\n"
        "  UPDATE SET t.n_dups = t.n_dups + s.n_dups\n"
        "WHEN NOT MATCHED THEN INSERT *"
    )
