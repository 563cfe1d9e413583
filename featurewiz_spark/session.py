"""SparkSession factory tuned for the engine's workload.

Local-mode defaults match the sandbox (single JVM, N threads); on a real
cluster the same builder flags hold — AQE does runtime re-planning,
skew-join splitting handles hot url domains, and shuffle partitions are
sized by the cluster, not hardcoded 200.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "featurewiz_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    cores=None → local[*]. shuffle_partitions defaults to the core count
    (local mode: shuffles are on-box; 200 partitions of tiny files only
    add scheduling overhead). On a cluster, callers should size this to
    ~2-3× total executor cores, or simply leave AQE to coalesce.
    """
    if cores is None:
        cores_env = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cores_env}]" if cores_env else "local[*]"
        ncores = int(cores_env) if cores_env else (os.cpu_count() or 8)
    else:
        master = f"local[{cores}]"
        ncores = cores
    if shuffle_partitions is None:
        shuffle_partitions = max(ncores, 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # AQE's post-shuffle coalescing floors partitions at 1MB
        # (minPartitionSize), which collapses small-but-CPU-heavy stages
        # — e.g. the Arrow-batched langid kernel over a few MB of deduped
        # documents — to ONE task, serializing a 32-core stage (measured:
        # q62 langid stage 0.9s→0.6s, q62 1.9s→1.5s at sf0.1). 32k keeps
        # such stages at full parallelism; at 100TB exchange sizes dwarf
        # both floors and the knob is inert.
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "32k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Wide feature projections generate codegen methods >8000 bytecodes;
        # HotSpot's DontCompileHugeMethods (on by default) then NEVER JITs
        # them and the hot loop runs interpreted (measured 8.5x slower on
        # the flagship pages pipeline). Compile them anyway + roomy code
        # cache. Same flags go to executors on a real cluster.
        .config("spark.driver.extraJavaOptions",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m")
        .config("spark.executor.extraJavaOptions",
                "-XX:-DontCompileHugeMethods -XX:ReservedCodeCacheSize=512m")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, str(v))
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
