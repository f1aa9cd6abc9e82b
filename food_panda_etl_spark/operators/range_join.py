"""Bucketed band/range join — the scale path for non-equi interval joins.

A naive theta join (`l.x BETWEEN r.lo AND r.hi`) plans as a broadcast
nested-loop join: O(|L|·|R|) comparisons — fine at 60k×2k, fatal at 100 TB.
The standard distributed strategy (used by e.g. Spark's range-join hints in
Databricks runtime, and interval-join in Flink) is bucketing:

  1. pick a bucket width w;
  2. each right row covering [lo, hi) is exploded to every bucket id in
     [floor(lo/w), floor(hi/w)];
  3. each left row maps to the single bucket floor(x/w);
  4. equi-join on bucket id (hash join, shuffle on bucket) + residual
     predicate re-check.

Cost: |R| × (band/w + 1) replication instead of a cross product; the join
becomes a plain shuffled hash join that AQE can skew-split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_value: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``left`` to rows of ``right`` where
    ``right[right_lo] <= left[left_value] < right[right_hi]``.

    Right rows are exploded to the bucket range they span; the join runs as
    an equi-join on the bucket id with the exact interval predicate applied
    as a residual filter.
    """
    if how != "inner":
        raise NotImplementedError("bucketed range_join supports inner joins")

    w = float(bucket_width)
    lo_b = F.floor(F.col(right_lo) / w).cast("long")
    hi_b = F.floor(F.col(right_hi) / w).cast("long")
    r = right.withColumn("__bucket", F.explode(F.sequence(lo_b, hi_b)))
    l = left.withColumn("__bucket", F.floor(F.col(left_value) / w).cast("long"))
    cond = (
        (l["__bucket"] == r["__bucket"])
        & (l[left_value] >= r[right_lo])
        & (l[left_value] < r[right_hi])
    )
    return l.join(r, cond).drop("__bucket")
