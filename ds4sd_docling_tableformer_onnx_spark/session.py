"""SparkSession factory with the engine's scale-oriented defaults.

The same configuration is used by tests (small core counts), the
benchmark (local[8] / local[32] scaling evidence) and — unchanged — a
real multi-executor cluster via ``spark-submit --py-files``: everything
here is partition-count / AQE tuning, nothing is local-mode specific.
"""

from __future__ import annotations

import os


def build_session(
    app_name: str = "ds4sd-docling-tableformer-onnx-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
):
    from pyspark.sql import SparkSession

    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        # one shuffle partition per core by default; a real cluster would
        # size this to total executor cores (AQE coalesces the excess)
        shuffle_partitions = max(cores, 8)

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        # AQE: runtime coalescing + skew-join splitting (north_rule: heavy
        # conversations must not pin single tasks)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow is the vectorization backbone for every pandas UDF stage
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        # keep parquet scans prunable
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # the target storage is object-store-backed Iceberg: no block
        # locality exists, so delay scheduling only wastes time (in
        # local mode it measurably idles ~50 ms/task waiting for a
        # better offer that cannot exist)
        .config("spark.locality.wait", "0s")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
