"""spark-submit entry point for the flagship pages feature pipeline.

North-rule packaging contract: runs on a multi-executor cluster via

    bash scripts/package.sh     # builds dist/featurewiz_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/featurewiz_spark.zip \
        jobs/pages_pipeline_job.py \
        --input  s3://…/pages  --output s3://…/features \
        [--input-format warc [--charset-aware]]   # raw crawl dump in
        [--snapshots s3://…/snaps --tolerance '7 days'] \
        [--resume-dir s3://…/checkpoints --buckets 256]

With --resume-dir the job is kill/restart-safe: output is written
bucket-by-bucket with per-bucket lineage manifests (row count +
order-insensitive checksum); a rerun recomputes only missing buckets
(featurewiz_spark.plans.lineage). Without it, a plain overwrite write.

JVM flags CANNOT be set from inside the job (both driver and executor
JVMs are already running when this code executes) — pass them at
submit, or wide feature projections run interpreted (8.5x measured):
    --conf spark.driver.extraJavaOptions='-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m' \
    --conf spark.executor.extraJavaOptions='-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m'
Session-level engine configs (UTC timezone — required for NTZ
timestamp inputs, AQE skew handling) ARE set below.
"""

from __future__ import annotations

import argparse


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages parquet/iceberg path, or a WARC dir/glob with --input-format warc")
    ap.add_argument("--input-format", default="table", choices=("table", "warc"),
                    help="'table' reads --table-format at --input; 'warc' "
                         "ingests raw crawl archives via "
                         "sources.warc.warc_to_pages (url/warc_ts/html/"
                         "text/lang), so the job runs straight off a "
                         "Common-Crawl-style dump")
    ap.add_argument("--charset-aware", action="store_true",
                    help="with --input-format warc: transcode "
                         "legacy-encoded pages to UTF-8 (HTTP charset "
                         "param > meta sniff) before extraction")
    ap.add_argument("--output", required=True, help="feature output path")
    ap.add_argument("--snapshots", default=None, help="optional snapshot table for as-of join")
    ap.add_argument("--gap", default="30 minutes", help="sessionization gap")
    ap.add_argument("--tolerance", default="7 days", help="as-of tolerance")
    ap.add_argument("--no-extract", action="store_true", help="skip html→text extraction")
    ap.add_argument("--resume-dir", default=None, help="lineage/checkpoint dir for resumable runs")
    ap.add_argument("--buckets", type=int, default=256, help="lineage bucket count")
    ap.add_argument("--resume-chunk", type=int, default=None,
                    help="buckets per committed chunk (crash-durable "
                         "progress granularity); default = all missing "
                         "buckets in one job")
    ap.add_argument("--table-format", default="parquet",
                    choices=("parquet", "iceberg", "delta"),
                    help="input/output table format; iceberg/delta need "
                         "their catalog/jars configured on the cluster")
    args = ap.parse_args()

    # imports AFTER arg parsing so --help works without the zip
    from pyspark.sql import SparkSession

    from featurewiz_spark.plans.lineage import run_resumable
    from featurewiz_spark.plans.pipeline import pages_feature_pipeline
    from featurewiz_spark.sources.table_io import read_table, write_table

    spark = (
        SparkSession.builder.appName("pages_feature_pipeline")
        # master/deploy-mode come from spark-submit; these are the
        # engine invariants: UTC session tz (NTZ gap/bucket arithmetic
        # requires a DST-free zone — the ops raise otherwise) + AQE
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .getOrCreate()
    )
    if args.input_format == "warc":
        from featurewiz_spark.sources.warc import warc_to_pages

        pages = warc_to_pages(
            spark, args.input, charset_aware=args.charset_aware
        )
        # warc_to_pages already produced the canonical text column
        args.no_extract = True
    else:
        pages = read_table(spark, args.input, args.table_format)
    snapshots = (
        read_table(spark, args.snapshots, args.table_format)
        if args.snapshots else None
    )

    if args.resume_dir:
        out = run_resumable(
            spark,
            pages,
            lambda df: pages_feature_pipeline(
                df, snapshots=snapshots, gap=args.gap,
                tolerance=args.tolerance, extract=not args.no_extract,
            ),
            args.resume_dir,
            stage="pages_features",
            keys=["url"],
            n_buckets=args.buckets,
            chunk_buckets=args.resume_chunk,
        )
        # __bucket is lineage-internal (partition-discovered on the
        # resume read); dropping it keeps resume and non-resume output
        # schemas identical
        write_table(out.drop("__bucket"), args.output, args.table_format)
    else:
        out = pages_feature_pipeline(
            pages, snapshots=snapshots, gap=args.gap,
            tolerance=args.tolerance, extract=not args.no_extract,
        )
        write_table(out, args.output, args.table_format)
    spark.stop()


if __name__ == "__main__":
    main()
