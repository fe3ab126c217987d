"""SparkSession factory with the engine's standard configuration.

Local mode here (`local[N]`, one JVM); on a real cluster the same confs apply
per executor — nothing below is local-mode-specific except driver memory.
AQE is on (skew-join splitting + partition coalescing handle hot LSH bands at
runtime, SURVEY.md O20); Arrow transfer is on for every pandas UDF boundary.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    parallelism: int | None = None,
    app_name: str = "simhash_spark",
    shuffle_partitions: int | None = None,
    driver_memory: str = "48g",
    arrow_batch_rows: int = 10_000,
) -> SparkSession:
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        # ~2x cores: enough granularity for AQE to coalesce, not so many that
        # task overhead dominates at local scale. On a 1000-executor cluster
        # this would be set to ~2-3x total cores instead.
        shuffle_partitions = max(parallelism * 2, 8)
    builder = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
