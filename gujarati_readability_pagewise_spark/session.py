"""Canonical SparkSession factory for the engine.

Centralizes the configs the graft's north_rule requires (AQE + skew-join
handling, Arrow batching, UTC timestamps for oracle parity) so every entry
point — tests, bench, driver contract — runs the same way.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "ARROW_BATCH_SIZE"]

# The Arrow batch is the analogue of the reference's DataLoader batch
# (batch_size=16 at extract_pagewise_features.py:450) — but text kernels are
# cheap per row, so we use large batches to amortize the JVM<->Python hop.
ARROW_BATCH_SIZE = 2048


def get_spark(
    app_name: str = "gujarati_readability_pagewise_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    # local[N] → one JVM; match shuffle partitions to cores, not 200
    n = shuffle_partitions or int(cpus if cpus.isdigit() else 32)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_SIZE))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", "128m")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
