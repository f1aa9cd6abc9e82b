"""Table catalog over the driver-generated parquet test tables.

Reads are plain ``spark.read.parquet`` — schemas come from parquet footers
(already explicit/typed; see FIXTURES.md §A). Keeping the scan declarative
is what lets Catalyst push filters and prune columns into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

# Tables small enough (at any SF — nation/region are fixed-size; part/
# supplier/customer grow slowly) that broadcast-joining them is the right
# physical plan at 100 TB. lineitem/orders/events/documents are fact-sized.
DIMENSION_TABLES = {"region", "nation", "supplier", "part"}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    # The engine's determinism contract (SURVEY.md §7) is UTC sessions:
    # every declared query's timestamp math must hash-match a naive-UTC
    # DuckDB oracle. Pin it here so sessions we did not build (the
    # correctness driver's, a notebook's) behave identically on a
    # non-UTC host. Runtime-settable, idempotent.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.parquet carries INT64 TIMESTAMP(NANOS), which Spark
        # rejects outright unless nanos are surfaced as epoch-nanos longs.
        # The conf is runtime-settable, and setting it here (not only in
        # session.py's builder) means sessions we did NOT build — the
        # correctness driver's, a notebook's — can read the table too.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # TIMESTAMP(NANOS) read as epoch-nanos long (see session.py);
        # truncate to micros exactly like DuckDB does (floor division —
        # values are post-1970, so `div` == floor).
        from pyspark.sql import functions as F

        df = df.withColumn(
            "ts",
            F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz"),
        )
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
