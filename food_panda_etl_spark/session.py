"""SparkSession factory with scale-oriented defaults.

The reference has no session concept — its "config universe" is a YAML
Settings struct (/root/reference/src/config.rs:6-25). Here the analog is a
SparkSession tuned for large-cluster execution while remaining correct on
local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "food-panda-etl-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with scale-aware defaults.

    - UTC session timezone: deterministic date/time semantics that match the
      reference's Utc::now() usage (/root/reference/src/main.rs:39) and the
      DuckDB oracle's naive timestamps.
    - AQE on: runtime join-strategy switching, skew-join splitting, and
      partition coalescing — the "optimizer" the reference hand-codes
      (SURVEY.md §4.1) plus everything it lacks.
    - Arrow on: vectorized pandas-UDF boundary for the few operators that
      need Python (similarity/multimodal), never row-at-a-time.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    shuffle = str(shuffle_partitions or os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": shuffle,
        # AQE: re-plan at runtime — broadcast switch, skew split, coalesce.
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        # Dimension tables (region/nation/part at most SFs) broadcast freely.
        "spark.sql.autoBroadcastJoinThreshold": "64m",
        # Scan-side: pushdown + pruning must reach the parquet reader.
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.files.maxPartitionBytes": "128m",
        # Arrow transfer for the pandas-UDF boundary.
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        # events.parquet stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as epoch-nanos long, converted in tables.py.
        "spark.sql.legacy.parquet.nanosAsLong": "true",
        # Partitioned-sink hygiene at scale: never let one task own a
        # thousand partitions' writers.
        "spark.sql.sources.partitionOverwriteMode": "dynamic",
        # Driver heap: local-mode executors share the driver JVM, whose
        # default (~1 GiB) is sized for a thin cluster driver, not for
        # 32 executor threads plus accumulated localCheckpoint blocks —
        # an 88-query sf0.1 drive OOM-killed the JVM under the default
        # (r7). Only read at JVM launch; a no-op on an already-running
        # session; overridable via extra_conf / SPARK_GRAFT_DRIVER_MEM.
        "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        # Long driver sessions (the 133-key bench, multi-query drives)
        # accumulate localCheckpoint blocks until a JVM GC lets the
        # ContextCleaner unpersist them — the default periodicGC
        # interval (30 min) never fires inside a bench run, so late-
        # suite queries measurably pay the accumulated heap (r19:
        # byte-identical keys ran 2x slower in-suite than isolated).
        # 2 min bounds the accumulation window; a no-op for short
        # sessions and for cluster drivers with idle heap.
        "spark.cleaner.periodicGC.interval": "2min",
    }
    if extra_conf:
        conf.update(extra_conf)

    builder = SparkSession.builder.appName(app_name).master(master)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
