"""The reference-parity composite query: the entire enrichment pipeline
(``/root/reference/src/services/vendor.rs:20-132``) as one declared,
DuckDB-oracled lineage — codes ⟕ details ⟕ newest-N reviews ⟕ ratings with
name-default, page numbering, and epoch extraction stamps.

Inputs are fixed literal frames (the vendor universe is not part of the
synthetic test tables), so the query is deterministic and independent of
``sf_dir``; the DuckDB oracle builds the identical relations with VALUES.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.vendor import enrich_vendors

_CODES = [(1, f"v{i:03d}") for i in range(1, 6)] + [(2, "v900"), (2, "v901")]
_DETAILS = [
    ("v001", '{"name":"Alpha Grill","cuisine":"bbq"}'),
    ("v002", '{"cuisine":"thai"}'),
    ("v004", '{"name":"Delta Diner"}'),
    ("v005", '{"name":"Echo Eats"}'),
    ("v900", '{"name":"Zed Cafe"}'),
]
_REVIEWS = [
    ("v001", '{"i":0}', 1000),
    ("v001", '{"i":1}', 1001),
    ("v001", '{"i":2}', 1002),
    ("v001", '{"i":3}', 1003),
    ("v001", '{"i":4}', 1004),
    ("v004", '{"t":"only"}', 1),
    ("v900", '{"t":"a"}', 7),
    ("v900", '{"t":"b"}', 7),  # created_at tie → review-text tie-break
]
_RATINGS = [("v001", '{"total_count":10}'), ("v004", '{"total_count":3}')]

_T0, _T1 = 1_742_500_000, 1_742_500_009
_PAGE, _CAP = 2, 3


def _values(rows) -> str:
    out = []
    for r in rows:
        cells = ", ".join(
            str(c) if isinstance(c, int) else "'" + c.replace("'", "''") + "'"
            for c in r
        )
        out.append(f"({cells})")
    return ", ".join(out)


@query(
    "q_vendor_enrich",
    oracle=f"""
    WITH codes(city_id, code) AS (VALUES {_values(_CODES)}),
    details(code, details) AS (VALUES {_values(_DETAILS)}),
    reviews(code, review, created_at) AS (VALUES {_values(_REVIEWS)}),
    ratings(code, ratings) AS (VALUES {_values(_RATINGS)}),
    ranked AS (
      SELECT code, review,
             row_number() OVER (
               PARTITION BY code ORDER BY created_at DESC, review DESC
             ) AS rn
      FROM reviews
    ),
    top_reviews AS (
      SELECT code,
             '[' || string_agg(review, ',' ORDER BY rn) || ']' AS reviews
      FROM ranked WHERE rn <= {_CAP} GROUP BY code
    )
    SELECT CAST(c.city_id AS INT) AS city_id,
           c.code,
           coalesce(json_extract_string(d.details, '$.name'), 'Unknown') AS name,
           d.details AS details,
           CAST(ceil(row_number() OVER (
             PARTITION BY c.city_id ORDER BY c.code
           ) / {_PAGE}.0) AS INT) AS batch_number,
           tr.reviews AS reviews,
           rt.ratings AS ratings,
           CAST({_T0} AS BIGINT) AS extraction_started_at,
           CAST({_T1} AS BIGINT) AS extraction_completed_at
    FROM codes c
    LEFT JOIN details d ON c.code = d.code
    LEFT JOIN top_reviews tr ON c.code = tr.code
    LEFT JOIN ratings rt ON c.code = rt.code
    """,
)
def q_vendor_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = spark.createDataFrame(_CODES, "city_id int, code string")
    details = spark.createDataFrame(_DETAILS, "code string, details string")
    reviews = spark.createDataFrame(
        _REVIEWS, "code string, review string, created_at long"
    )
    ratings = spark.createDataFrame(_RATINGS, "code string, ratings string")
    return enrich_vendors(
        codes, details, reviews, ratings,
        page_size=_PAGE, reviews_cap=_CAP, started_at=_T0, completed_at=_T1,
    )
