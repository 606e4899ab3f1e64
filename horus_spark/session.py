"""SparkSession builder tuned for the extraction workload.

Settings rationale (100 TB design, tested on local[N]):
- AQE on (runtime coalesce + skew-join splitting).
- Arrow on for pandas UDFs; batch size tuned for wide span arrays.
- Nested schema pruning so `spans.text`-only stages don't read media blobs.
- shuffle.partitions sized O(cores x 4) locally; on a real cluster this is
  set to O(total-cores x 2-3) or left to AQE's coalescing from a high value.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "horus_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # derive from the master's core count when local[N]
        n = cpus
        if master.startswith("local[") and master[6:-1].isdigit():
            n = int(master[6:-1])
        shuffle_partitions = max(n, 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.optimizer.nestedSchemaPruning.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Tungsten execution memory off-heap: shuffle/sort/join buffers stop
        # churning the GC heap (measured: per-run GC fell from 1-21s to
        # <0.7s on the extraction pipeline and run-to-run variance with it)
        .config("spark.memory.offHeap.enabled", "true")
        .config("spark.memory.offHeap.size", os.environ.get("SPARK_OFFHEAP", "8g"))
        # throughput-batch workload: ParallelGC beat G1 ~2x on the regex/
        # struct-heavy interpreted projections (G1 hit 100s+ mixed-GC storms)
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
