"""Streaming sources and a deterministic test runner.

File-based micro-batching stands in for the reference's paginated polling
loop (``/root/reference/src/main.rs:136-143``): each dropped file ≈ one
fetched page. ``availableNow`` + ``maxFilesPerTrigger=1`` replays a
directory one file per micro-batch — watermark advancement between batches
becomes observable and deterministic, which is what the late-data tests
need.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

#: Streaming twin of the ``events`` test table (FIXTURES.md §A).
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    *,
    max_files_per_trigger: int | None = 1,
) -> DataFrame:
    """readStream over a directory of JSONL event files (one file ≈ one
    micro-batch when ``max_files_per_trigger=1``)."""
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def run_available_now(
    stream_df: DataFrame,
    *,
    output_mode: str = "update",
    timeout_s: int = 120,
) -> DataFrame:
    """Run a streaming query to completion over all currently-available
    input (``trigger(availableNow=True)``) into an in-memory table and
    return it as a DataFrame. Test-only — real deployments use parquet/
    kafka sinks with checkpoints."""
    name = "q_" + uuid.uuid4().hex[:12]
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"streaming query {name} exceeded {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    return stream_df.sparkSession.table(name)
