"""SparkSession factory tuned for the entity-resolution workload.

Defaults are chosen for the local[N] sandbox but every knob matters at
cluster scale: AQE (adaptive coalescing + skew-join splitting) is the first
line of defense against hot blocking keys; Arrow batching feeds the pairwise
scoring pandas UDFs; shuffle partition count tracks parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hamerkop-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    :param cores: local parallelism; defaults to $SPARK_GRAFT_CPUS or '*'.
    :param shuffle_partitions: defaults to 2x cores (AQE coalesces down).
    """
    if cores is None:
        env = os.environ.get("SPARK_GRAFT_CPUS")
        cores_str = env if env else "*"
    else:
        cores_str = str(cores)
    if shuffle_partitions is None:
        try:
            shuffle_partitions = max(8, 2 * int(cores_str))
        except ValueError:
            shuffle_partitions = 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cores_str}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ER rows are small but compute-dense (nested string-distance
        # expressions): the 64MB size-based coalesce target would fold
        # mid-pipeline shuffles down to one task and serialize the
        # scoring stage. Keep partitions fine-grained; parallelismFirst
        # then respects cluster parallelism instead of byte size.
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4m")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "256k")
        # Scan split size, env-parameterised (r6). The default 128m
        # yields TWO tasks for the driver's 132 MB 6-row-group lineitem
        # file — a 16m split lets every row group scan in its own task
        # (row groups are the minimum split unit, so smaller values
        # change nothing further). Production: raise via
        # HK_MAX_PARTITION_BYTES to 128m-1g for many-file tables where
        # task-count, not per-file parallelism, is the constraint
        # (guide §6); the local default only matters when files are few
        # relative to cores.
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("HK_MAX_PARTITION_BYTES", "16m"),
        )
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # INT96 (Spark's legacy parquet timestamp encoding) carries NO
        # min/max statistics in the footer, which blinds the catalog's
        # manifest-based file skipping on timestamp columns (warc_ts
        # range scans are the canonical crawl query). TIMESTAMP_MICROS
        # is the modern annotated type: same values on read, and every
        # writer-side stat (footer + page index) works.
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # InferFiltersFromGenerate synthesizes `size(e)>0 AND isnotnull(e)`
        # from every explode(e) and pushes it through projects AND
        # exchanges. Every explode in this engine is over a COMPUTED
        # array (char n-grams, word shingles, LSH bands, salts), so the
        # inferred filter re-evaluates the full expression tree per row
        # — and when it lands below a repartition it serializes the
        # hottest compute into the pre-shuffle scan task (measured 4x on
        # 20k-doc minhash banding: 6.5s -> 1.5s without the rule).
        # Generate itself already skips empty/null arrays, so exclusion
        # is semantics-neutral; nothing here explodes a stored column
        # where scan-pruning could pay for the recompute.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
