"""Reference-parity vendor pipeline as one declarative DataFrame lineage.

The reference's enrichment loop (``/root/reference/src/services/vendor.rs:20-132``)
is, semantically, three left-outer equi-joins of the vendor-code universe
against detail / reviews / ratings relations, with:

- ``name`` extracted from the details JSON, defaulting to ``"Unknown"``
  (``src/services/vendor.rs:61-64``),
- HTTP-400 / failed lookups degrading to NULL payload columns rather than
  dropping the row (``src/services/vendor.rs:82-115`` — left-outer, not inner),
- reviews capped at the newest 30 per vendor (``src/services/api.rs:190-191``),
- a per-page ``batch_number`` stamp, page size 48 (``src/main.rs:120,136-160``),
- extraction timestamps serialized as epoch seconds
  (``src/models/vendor.rs:12-15``, ``src/storage/parquet.rs:69-75``).

Here the whole thing is a single lineage Catalyst can optimize end-to-end:
no spool file, no mutex-guarded single writer, no driver-side loop. At 100 TB
the three joins shuffle on ``code`` once each (or broadcast if the enrichment
side is dim-sized); the row_number window partitions by ``city_id`` so no
single task sees more than one city's codes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Exact mirror of the reference's 8-column Parquet schema, including
#: nullability (``/root/reference/src/storage/parquet.rs:17-26``).
VENDOR_SCHEMA = StructType(
    [
        StructField("code", StringType(), nullable=False),
        StructField("name", StringType(), nullable=False),
        StructField("details", StringType(), nullable=True),
        StructField("batch_number", IntegerType(), nullable=False),
        StructField("reviews", StringType(), nullable=True),
        StructField("ratings", StringType(), nullable=True),
        StructField("extraction_started_at", LongType(), nullable=False),
        StructField("extraction_completed_at", LongType(), nullable=False),
    ]
)

PAGE_SIZE = 48  # listing page size, src/main.rs:120
REVIEWS_CAP = 30  # newest-30 server-side limit, src/services/api.rs:190-191


def read_vendor_json(spark, path: str) -> DataFrame:
    """Read a spooled vendor JSON array file (S5, ``src/main.rs:224-227``).

    The spool file is one JSON array of Vendor objects whose ``details`` /
    ``reviews`` / ``ratings`` are *dynamic* JSON (``serde_json::Value``).
    Declaring those fields as StringType makes Spark capture the raw nested
    JSON text — schema-on-read, matching the reference's erase-to-string
    columnar boundary (``src/storage/parquet.rs:29-42``).
    """
    spool_schema = StructType(
        [
            StructField("code", StringType(), False),
            StructField("name", StringType(), False),
            StructField("details", StringType(), True),
            StructField("batch_number", IntegerType(), False),
            StructField("reviews", StringType(), True),
            StructField("ratings", StringType(), True),
            StructField("extraction_started_at", LongType(), False),
            StructField("extraction_completed_at", LongType(), False),
        ]
    )
    return spark.read.schema(spool_schema).json(path, multiLine=True)


def enrich_vendors(
    codes: DataFrame,
    details: DataFrame,
    reviews: DataFrame,
    ratings: DataFrame,
    *,
    page_size: int = PAGE_SIZE,
    reviews_cap: int = REVIEWS_CAP,
    started_at: int = 0,
    completed_at: int = 0,
) -> DataFrame:
    """``process_vendor_batch`` (``src/services/vendor.rs:20-132``) as one plan.

    Inputs:
      codes    — ``(city_id, code)`` the listing-scan key universe
      details  — ``(code, details)`` detail JSON text, 1:1
      reviews  — ``(code, review, created_at)`` review JSON text, 1:N
      ratings  — ``(code, ratings)`` ratings JSON text, 1:1

    Output matches :data:`VENDOR_SCHEMA` exactly (plus ``city_id`` for the
    partitioned sink). ``started_at``/``completed_at`` are injected epoch
    seconds — deterministic, unlike the reference's per-row ``Utc::now()``.
    """
    # Newest-N reviews per vendor, then packed into ONE JSON array string —
    # byte-compatible with serde_json::to_string(Vec<Value>) because each
    # element is already its raw JSON text.
    w_rev = Window.partitionBy("code").orderBy(
        F.desc("created_at"), F.desc("review")
    )
    top_reviews = (
        reviews.withColumn("__rn", F.row_number().over(w_rev))
        .filter(F.col("__rn") <= reviews_cap)
        .groupBy("code")
        .agg(
            F.concat(
                F.lit("["),
                F.array_join(
                    # collect_list inside agg loses window order after the
                    # shuffle; re-sort by the stamped rank for determinism.
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("__rn", "review"))),
                        lambda s: s["review"],
                    ),
                    ",",
                ),
                F.lit("]"),
            ).alias("reviews")
        )
    )

    # Per-city page numbering: ceil(rank/page_size), pages 1-based — the
    # batch stamp of src/services/vendor.rs:66 with src/main.rs:136-160's
    # page arithmetic. Partitioned by city so the window never globalizes.
    w_page = Window.partitionBy("city_id").orderBy("code")
    enriched = (
        codes.join(details, "code", "left")
        .join(top_reviews, "code", "left")
        .join(ratings, "code", "left")
        .withColumn(
            "name",
            F.coalesce(F.get_json_object("details", "$.name"), F.lit("Unknown")),
        )
        .withColumn(
            "batch_number",
            F.ceil(F.row_number().over(w_page) / F.lit(page_size)).cast("int"),
        )
        .withColumn("extraction_started_at", F.lit(started_at).cast("long"))
        .withColumn("extraction_completed_at", F.lit(completed_at).cast("long"))
    )
    return enriched.select(
        "city_id", *[f.name for f in VENDOR_SCHEMA.fields]
    )
