"""SparkSession factory with scale-oriented defaults.

All knobs here are the ones that matter at 100 TB: AQE (runtime
coalescing + skew-join splitting), Arrow-batched Python UDF transfer
with small batches (the html column is fat — SURVEY.md §4.3), explicit
shuffle partitions scaled with parallelism (north_rule: "explicit
control of shuffle partitions").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: "str | None" = None,
    app_name: str = "supacrawler-spark",
    shuffle_partitions: "int | None" = None,
    arrow_batch: int = 512,
    extra_conf: "dict | None" = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env) or
    ``local[*]``. ``shuffle_partitions`` defaults to the local core
    count so one wave's shuffle saturates the executors without tiny
    partitions; on a real cluster pass ~2-3x total cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        if master.startswith("local[") and master[6:-1].isdigit():
            shuffle_partitions = max(8, int(master[6:-1]))
        else:
            shuffle_partitions = os.cpu_count() or 8

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        # fat binary/html columns: 4096-row vectorized reader batches
        # would buffer ~100MB+ per task at Common-Crawl page weights
        .config("spark.sql.parquet.columnarReaderBatchSize", "512")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
