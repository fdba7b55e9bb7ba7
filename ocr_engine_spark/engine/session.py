"""SparkSession construction with scale-appropriate defaults.

One place for the knobs that matter at 100 TB (AQE, skew-join handling,
Arrow batch sizing for the Python kernels) so tests, bench, and
spark-submit entry points agree. In the sandbox we run local[N]; on a
real cluster the same config applies per-executor.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(app: str = "ocr-engine-spark", master: str | None = None,
                  shuffle_partitions: int | None = None,
                  arrow_batch_rows: int = 256) -> SparkSession:
    """Arrow batch size is deliberately LOW (rows are whole web pages,
    multi-KB to multi-MB each; extraction cost varies ~100x per doc) —
    batches are sized by bytes-in-flight, not row count
    (SURVEY.md §7.2 kernel-cost-variance note).
    """
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '*')}]"
    cores = os.cpu_count() or 8
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(2 * cores)))
    b = (
        SparkSession.builder.appName(app).master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch",
                str(arrow_batch_rows))
        # pages rows are fat (binary html) — keep scan splits modest so a
        # partition of payloads fits executor memory at any SF
        .config("spark.sql.files.maxPartitionBytes", str(64 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    return b.getOrCreate()
