"""SparkSession construction with scale-appropriate defaults.

Local mode is the test harness; the configs are chosen so the same
code runs unchanged on a multi-executor cluster (AQE on, Arrow on,
shuffle partitions sized to the parallelism level).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "entityframe_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to $SPARK_GRAFT_CPUS or all local cores. On a
    real cluster the master/resource configs come from spark-submit;
    everything here is safe to keep.
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 4)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        # this sandbox's page-fault path is a contended host resource
        # that ANTI-SCALES past ~8 threads (measured 0.60 GiB/s fresh-
        # page touch at 8 threads vs 0.20 at 32 — see BENCH.md): pre-
        # touch the whole heap once at JVM startup so steady-state
        # allocation and GC never fault fresh pages mid-query. Xms=Xmx
        # makes the pretouch cover everything. Harmless elsewhere.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:+AlwaysPreTouch -Xms"
            + os.environ.get("SPARK_DRIVER_MEMORY", "16g"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
