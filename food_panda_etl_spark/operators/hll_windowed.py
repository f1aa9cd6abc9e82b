"""Windowed / re-bucketed HLL — distinct counts over ONLY a trailing
window (or any group subset) from per-bucket sketches, at bounded
state: the `operators/cms_windowed.py` pattern applied to the HLL
register table (`operators/hll.py`). Per-day sketches are m-row
register tables; "distinct users over the trailing 7 days" is filter
the day groups → max registers across the day dimension → estimate —
NO rescan of the fact, state m rows per surviving group whatever the
event volume. This is the sliding-window COUNT DISTINCT every
ingest/abuse/telemetry pipeline wants at 100 TB, where the exact
re-count over the window is the thing that doesn't fit.

A SEPARATE module so `hll.py` stays byte-stable (the cms_windowed
convention — its declared queries keep their recorded evidence).

`hll_merge` (hll.py) merges SAME-shape sketches; `hll_merge_groups`
here is the re-bucketing combine: registers max'd across any group
dimensions NOT kept (day-sketches → week-sketches, (day, lang) →
lang). Register max is HLL's union, so the re-bucketed sketch is
IDENTICAL to sketching the concatenated buckets directly
(property-tested) — the linearity that makes window queries correct,
with max playing CMS's sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sketch_checks import check_merge_columns


def hll_merge_groups(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Max registers across sketches AND across any group dimensions
    not in ``group_cols``. With the default ``group_cols=()`` the
    result is a plain (reg, rho) sketch usable with
    `hll.hll_estimate`; keeping a prefix re-buckets. Every input must
    come from `hll_sketch` with the SAME m AND the SAME mixer (the
    hll_merge contract — cross-mixer register spaces max into garbage,
    undetectable by shape) and must CONTAIN the (reg, rho) register
    columns plus ``group_cols`` (shape-asserted: ``group_cols`` must
    be a SUBSET of each input's group dims — the dims being dropped
    are whatever else the input carries)."""
    if not sketches:
        raise ValueError("hll_merge_groups: need at least one sketch")
    check_merge_columns(
        "hll_merge_groups", {*group_cols, "reg", "rho"}, sketches
    )
    parts = [s.select(*group_cols, "reg", "rho") for s in sketches]
    out = parts[0]
    for s in parts[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))
