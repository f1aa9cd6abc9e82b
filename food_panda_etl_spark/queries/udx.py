"""Map-typed columns, custom aggregates (UDAF), and struct→JSON
serialization — SURVEY.md §2.8 (map family), §2.4 A8, §2.2 P3.

The reference touches these shapes driver-side only (config header map,
``/root/reference/src/config.rs:24``; JSON stringification at the parquet
boundary, ``src/storage/parquet.rs:29-42``); here they are engine
operators.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           event_type AS type_v,
           CAST(user_id AS VARCHAR) AS user_v,
           2 AS n_keys,
           'type,user' AS keys_csv
    FROM events
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 map family — build a map column, read it back via element_at /
    map_keys / size. The oracle states the expected values in plain SQL
    (DuckDB's MAP element_at wraps values in lists, so the parity check is
    on extracted scalars, which is what matters)."""
    e = load_table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        F.element_at(m, "type").alias("type_v"),
        F.element_at(m, "user").alias("user_v"),
        F.size(m).alias("n_keys"),
        F.array_join(F.sort_array(F.map_keys(m)), ",").alias("keys_csv"),
    )


def _second_largest_udaf():
    """GROUPED_AGG pandas UDAF: second-largest value per group. Pure
    selection (no float arithmetic) → bit-exact against any engine.
    Built lazily — pandas_udf parses its DDL return type against the
    active session, so decorating at import time crashes sessionless."""

    @pandas_udf("double")
    def second_largest(v: pd.Series) -> float:
        if len(v) < 2:
            return float("nan")
        return float(v.nlargest(2).iloc[1])

    return second_largest


@query(
    "q_udaf",
    oracle="""
    SELECT event_type, second AS second_value
    FROM (
      SELECT event_type,
             (SELECT value FROM events e2 WHERE e2.event_type = e1.event_type
              ORDER BY value DESC LIMIT 1 OFFSET 1) AS second
      FROM events e1
      GROUP BY event_type
    )
    WHERE second IS NOT NULL
    """,
)
def q_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.4 A8 — custom aggregate surface: Arrow-batched GROUPED_AGG
    pandas_udf (never a row-at-a-time Python UDF). Selection-only math so
    the result hashes exactly."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(_second_largest_udaf()(F.col("value")).alias("second_value"))
        .filter(~F.isnan("second_value"))
    )


@query("q_to_json", oracle=None)  # JSON text formatting differs per engine
def q_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.2 P3 — struct→JSON-string serialization at the sink boundary
    (``src/storage/parquet.rs:29-42``). Rows-only: key order/whitespace are
    engine-specific, exactly why SURVEY.md flags it non-hashable."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.to_json(F.struct("event_type", "user_id", "value")).alias("payload"),
    )
