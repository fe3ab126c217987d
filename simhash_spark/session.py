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
        # ObjectHashAggregate (collect_list/collect_set) falls back to a full
        # SORT-based agg after only 128 distinct keys per partition by
        # default; the bucket-pair agg has ~1 group per bucket with bounded
        # (<= bucket_cap) values each, so in-memory hash agg is both safe
        # and ~3x faster. Per-partition bound at cluster scale comes from
        # sizing shuffle partitions, not from this threshold.
        .config("spark.sql.execution.objectHashAggregate.sortBased.fallbackThreshold", "10000000")
        # local-mode shuffle files on tmpfs: this sandbox has very expensive
        # syscalls (70%+ system time on disk-backed shuffle); on a real
        # cluster this conf is per-node spark.local.dir as usual.
        # SPARK_GRAFT_LOCAL_DIR overrides (comma-separated dirs round-robin,
        # like any spark.local.dir): the wide-index design run shuffles more
        # bytes than tmpfs-plus-JVM can hold, so it splits across tmpfs+disk.
        .config(
            "spark.local.dir",
            os.environ.get("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local"),
        )
        # Catalyst's Union constraint rewrite crashes with
        # "NoSuchElementException: key not found: <attr>" on the candidate
        # union plan once localCheckpoint re-analyzes it (Spark 4.1,
        # UnionBase.rewriteConstraints). The engine's joins/filters all carry
        # explicit predicates, so inferred constraints buy nothing here.
        .config("spark.sql.constraintPropagation.enabled", "false")
        # bypass-merge shuffle writes reducers x mappers files; with this
        # sandbox's syscall cost that dominated candidate generation (thread
        # dumps: FileChannel.map0/transferTo). Sort-based writer = one file
        # per map task.
        .config("spark.shuffle.sort.bypassMergeThreshold", "1")
        # straggler mitigation FOR CLUSTER DEPLOYMENTS: speculation is a
        # deliberate no-op in local mode (TaskSchedulerImpl.start() skips
        # the speculation scheduler when isLocal), so it neither helps nor
        # hurts here — it is set so the same session factory shipped to a
        # real cluster clones genuine stragglers (quantile 0.75,
        # multiplier 1.5), the standard defense against slow executors.
        .config("spark.speculation", "true")
        .config("spark.speculation.multiplier", "1.5")
        .config("spark.speculation.quantile", "0.75")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def spread_small_input(df, min_partitions: int | None = None):
    """Round-robin repartition a NARROW input scan up to session parallelism.

    A single-file, single-row-group parquet table (the driver's sf tables)
    is an unsplittable scan: every downstream CPU-heavy stage (fingerprint /
    winnow / shingle explode) then runs as ONE task no matter how many cores
    the session has. This guard repartitions only when the scan has fewer
    partitions than the session's default parallelism — at production scale
    the input already has thousands of splits, the condition is false, and
    NO shuffle is added. The added exchange for small inputs moves the raw
    rows once, before any per-row expansion multiplies the volume.
    """
    if df.isStreaming:  # .rdd is undefined for streaming plans
        return df
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
