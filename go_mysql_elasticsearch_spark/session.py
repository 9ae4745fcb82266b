"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would
submit with ``spark-submit --py-files`` on a multi-executor cluster —
nothing here is local-mode-specific except the master URL.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "go-mysql-elasticsearch-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing + skew-join splitting are our first
      line of defense against head-term skew at scale.
    - Arrow on: every custom operator is a vectorized pandas/Arrow UDF;
      Arrow batch transfer is mandatory for that to be fast.
    - UTC session TZ: parity with DuckDB's UTC-naive timestamps in the
      correctness oracle.
    - shuffle.partitions ~ cores locally; on a real cluster this would
      be ~2-3x total executor cores (AQE coalesces the excess).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k rows/batch: the build packer streams token-level rows
        # (small fixed-width columns); 10k batches made it flush tiny
        # regions and carry groups across batches far more often
        # (measured ~5% build wall on the packer stage)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # parquet scan granularity: at 100 TB this bounds per-task input
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
