"""As-of join (SURVEY.md §2.3 J7) — latest right row strictly before each
left row, per key. Spark's DataFrame API has no native ASOF JOIN; the
scalable formulation is the union-and-window trick:

  1. tag left rows (side=1) and right rows (side=0), union by name;
  2. window over (key) ordered by (ts, side, tie) — right rows sort before
     left rows at identical ts only if inclusive; for strict '<' left rows
     sort first at equal ts;
  3. last(right_payload, ignoreNulls) over rows UNBOUNDED PRECEDING..CURRENT
     gives every left row the most recent right payload;
  4. filter back to left rows.

One shuffle on the key (same as any windowed op), no cross product, no
per-key collect. This mirrors how as-of joins are done in Flink SQL
temporal joins and kdb-style engines, expressed with stock Spark ops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    strict: bool = True,
    tie_break: str | None = None,
) -> DataFrame:
    """For each left row, attach the payload of the right row with the
    greatest ``right_ts`` such that ``right_ts < left_ts`` (strict) or
    ``right_ts <= left_ts``; ties on right_ts resolved by ``tie_break``
    (take the greatest) for determinism.
    """
    lcols = left.columns
    # The payload travels as ONE struct so the as-of match is atomic per
    # right row: last(ignorenulls) applied per-column could stitch together
    # values from different right rows whenever a right row holds NULL in
    # some payload column but not others.
    payload_type = right.select(F.struct(*right_payload)).schema[0].dataType
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(0 if strict else 1).alias("__side"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(payload_type).alias("__p"),
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(1 if strict else 0).alias("__side"),
        F.lit(None).cast(left.select(F.struct(*lcols)).schema[0].dataType).alias("__lrow"),
        F.struct(*right_payload).alias("__p"),
    )
    # strict: at equal ts, left (__side=0) sorts BEFORE right (__side=1) in
    # a DESCENDING-exclusive sense — we order ascending so rows visible to
    # last(...) at a left row are exactly those with ts < left ts.
    order = [F.col("__ts").asc(), F.col("__side").asc()]
    if tie_break is not None:
        order.append(F.col("__p")[tie_break].asc_nulls_first())
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = l.unionByName(r)
    matched = unioned.select(
        "__lrow",
        F.last("__p", ignorenulls=True).over(w).alias("__m"),
    ).filter(F.col("__lrow").isNotNull())
    return matched.select(
        *[F.col("__lrow")[c].alias(c) for c in lcols],
        *[F.col("__m")[c].alias(f"asof_{c}") for c in right_payload],
    )
