"""Group-wise / windowed count-min sketch — the time-bucketed variant
of `operators/cms.py` (VERDICT r9 task 6's "windowed CMS" shape): one
independent sketch per group (epoch day, language, source) built in a
SINGLE (group, d, b) hash aggregation, and a merge that collapses any
subset of the group dimensions by SUMMING cells — CMS is LINEAR
(cells are counters: sketch(A ∪ B) = sketch(A) + sketch(B) cell-wise,
the mergeable-summaries property the group-wise HLL gets from max),
so a sliding/tumbling window query is "filter the bucket dimension,
sum the cells, estimate as usual":

    by_day = cms_sketch_by_group(events, "user_id", ("day",))
    recent = cms_merge_groups(by_day.filter(F.col("day") > cutoff))
    cms_estimate(recent, probes, "user_id")   # plain cms.py estimate

This is the per-key rate-limiting / trending-keys production shape at
bounded state: |groups|·width·depth cells total, each window query
touches only the filtered slice, and expired buckets are DROPPED (not
decayed — exact integer arithmetic end to end, so the whole pipeline
remains SQL-replayable bit-for-bit; exponential decay would need
non-integer weights and is deliberately out of scope, the ln-free
discipline). A NEW module so `cms.py` stays byte-identical to its
recorded greens; the hash family (_MULTS/_ADDS/_P, `_cell`) is
imported — ONE definition per side, the no-drift rule.

Determinism: identical affine mod-P cell hashes as cms.py; group
columns pass through a hash aggregation unchanged (NULL groups are
their own group, SQL GROUP BY semantics); merges are integer sums —
order-free. The r11 declared form (q_cms_windowed, pre-tested in
tests/test_r11_oracle_previews.py) replays as a direct sketch of the
window's rows in SQL, equal BY LINEARITY to the engine's
sum-of-day-sketches — the property test pins that identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import (
    CMS_GEO_KEYS,
    _MULTS,
    _P,
    _cell,
    cms_geometry,
)
from food_panda_etl_spark.operators.sketch_checks import check_merge_columns
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_uniform_geometry,
)


def cms_sketch_by_group(
    df: DataFrame,
    col: str,
    group_cols: tuple[str, ...],
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """The (*group_cols, d, b, cnt) sketch table — ≤ width·depth rows
    PER GROUP, built in one hash aggregation (the fact shuffles only
    (group, d, b) int tuples). Rows with a NULL key are skipped (the
    cms.py / heavy_hitters NULL contract); NULL group keys form their
    own group."""
    if not group_cols:
        raise ValueError(
            "cms_sketch_by_group: group_cols must be non-empty — for a "
            "flat sketch use cms.cms_sketch"
        )
    if not 1 <= depth <= len(_MULTS):
        raise ValueError(f"depth must be in [1, {len(_MULTS)}], got {depth}")
    if not 1 <= width <= _P:
        raise ValueError(f"width must be in [1, {_P}], got {width}")
    k = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(d).alias("d"), _cell(k, d, width).alias("b"))
        for d in range(depth)
    ])
    return (
        df.filter(k.isNotNull())
        .select(*[F.col(c) for c in group_cols], F.explode(cells).alias("__c"))
        .groupBy(
            *group_cols, F.col("__c.d").alias("d"), F.col("__c.b").alias("b")
        )
        .agg(F.count("*").alias("cnt"))
        .withMetadata("cnt", cms_geometry(width, depth))
    )


def cms_merge_groups(
    *sketches: DataFrame,
    group_cols: tuple[str, ...] = (),
    width: int | None = None,
    depth: int | None = None,
) -> DataFrame:
    """Sum cells across sketches AND across any group dimensions not in
    ``group_cols`` — the CMS linear combine. With the default
    ``group_cols=()`` the result is a plain (d, b, cnt) sketch usable
    with `cms.cms_estimate`; keeping a prefix of the group columns
    re-buckets (e.g. day-sketches → week-sketches). Every input must
    come from cms_sketch_by_group / cms_sketch with the SAME (width,
    depth) (the cms.py contract — cells from different cell spaces sum
    into garbage) and must CONTAIN the (d, b, cnt) cell columns plus
    ``group_cols`` (shape-asserted, the hll_merge lesson: a silent
    column mismatch would mis-merge with no error). Pass the intended
    ``width``/``depth`` to make the geometry contract LOUDER (ADVICE
    r10): every cell is then checked in-plan against the declared
    bounds. This is BEST-EFFORT detection, not a guarantee (ADVICE
    r11): a larger-geometry sketch only raises if some observed key
    happened to hash past the declared bounds (sketches are sparse),
    and a SMALLER-geometry input always passes — all its cells fit —
    yet still merges across cell spaces into garbage. Same-geometry
    inputs remain a caller contract, like equal-size hash-row swaps
    (bitwise indistinguishable here); callers that need an exact
    check should carry (width, depth) as literal columns alongside
    the sketch and compare before merging."""
    if not sketches:
        raise ValueError("cms_merge_groups: need at least one sketch")
    check_merge_columns(
        "cms_merge_groups", {*group_cols, "d", "b", "cnt"}, sketches
    )
    # geometry stamps (VERDICT r17 task 4 — the EXACT check the
    # docstring's best-effort bounds could not give): every stamped
    # input must agree with the others AND with the declared
    # width/depth when passed; the common stamp rides the output so
    # chained merges and the downstream estimate stay validated
    geo = check_uniform_geometry(
        "cms_merge_groups",
        CMS_GEO_KEYS,
        [(f"sketch #{i}", s, "cnt") for i, s in enumerate(sketches)],
        "cells from different cell spaces would sum into garbage",
    )
    if geo is not None and (width is not None or depth is not None):
        check_probe_geometry(
            "cms_merge_groups",
            cms_geometry(
                width if width is not None else geo["width"],
                depth if depth is not None else geo["depth"],
            ),
            geo,
            "cells from different cell spaces would sum into garbage "
            "(rebuild the inputs or match width/depth)",
        )
    cnt = F.col("cnt")
    if width is not None or depth is not None:
        ok = F.lit(True)
        if width is not None:
            ok = ok & (F.col("b") >= 0) & (F.col("b") < int(width))
        if depth is not None:
            ok = ok & (F.col("d") >= 0) & (F.col("d") < int(depth))
        cnt = F.when(ok, F.col("cnt")).otherwise(
            F.raise_error(
                F.lit(
                    "cms_merge_groups: cell outside the declared "
                    f"geometry (width={width}, depth={depth}) — inputs "
                    "were built with a different (width, depth)"
                )
            )
        )
    parts = [
        s.select(*group_cols, "d", "b", cnt.alias("cnt"))
        for s in sketches
    ]
    out = parts[0]
    for s in parts[1:]:
        out = out.unionByName(s)
    merged = out.groupBy(*group_cols, "d", "b").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    if geo is not None:
        merged = merged.withMetadata("cnt", geo)
    return merged
