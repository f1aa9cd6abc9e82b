"""Group-wise / windowed CMS (r10 build-ahead, declared r11):
per-group independence, the linearity identity that makes window
queries correct (sum of bucket sketches == direct sketch of the
window's rows — cell-exact), re-bucketing, shape validation, and NULL
contracts. The flat `cms_sketch` baseline is itself property-tested
against an independent Python sketch in tests/test_cms.py, so
cell-equality against it inherits that independence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch
from food_panda_etl_spark.operators.cms_windowed import (
    cms_merge_groups,
    cms_sketch_by_group,
)

W, D = 64, 3


def _cells(df) -> dict:
    return {
        (r["d"], r["b"]): r["cnt"]
        for r in df.collect()
    }


def _mk(spark, rows):
    return spark.createDataFrame(rows, "g long, k long").repartition(3)


def test_groupwise_equals_flat_per_group(spark):
    rows = [(g, (g * 37 + i * 13) % 50) for g in range(3) for i in range(40)]
    df = _mk(spark, rows)
    grouped = cms_sketch_by_group(df, "k", ("g",), width=W, depth=D)
    for g in range(3):
        got = _cells(
            grouped.filter(F.col("g") == g).drop("g")
        )
        want = _cells(
            cms_sketch(df.filter(F.col("g") == g), "k", width=W, depth=D)
        )
        assert got == want


def test_merge_linearity_is_cell_exact(spark):
    """Σ_g sketch_g == sketch(all rows), cell for cell — the identity
    every window query rests on (and what the r11 oracle exploits:
    DuckDB sketches the filtered window directly, the engine sums the
    per-bucket sketches)."""
    rows = [(i % 7, (i * 31) % 90) for i in range(500)]
    df = _mk(spark, rows)
    merged = _cells(
        cms_merge_groups(cms_sketch_by_group(df, "k", ("g",), width=W, depth=D))
    )
    flat = _cells(cms_sketch(df, "k", width=W, depth=D))
    assert merged == flat
    # windowed slice: days g >= 4 only
    merged_df = cms_merge_groups(
        cms_sketch_by_group(df, "k", ("g",), width=W, depth=D).filter(
            F.col("g") >= 4
        )
    )
    flat_win = _cells(
        cms_sketch(df.filter(F.col("g") >= 4), "k", width=W, depth=D)
    )
    assert _cells(merged_df) == flat_win
    # and the merged slice estimates like the direct sketch (same cells)
    probes = spark.range(10).select(F.col("id").alias("k"))
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(merged_df, probes, "k", width=W, depth=D).collect()
    }
    exact = {
        r["k"]: r["c"]
        for r in df.filter((F.col("g") >= 4) & (F.col("k") < 10))
        .groupBy("k").agg(F.count("*").alias("c")).collect()
    }
    for k, e in est.items():
        assert e >= exact.get(k, 0)  # one-sided, inherited through merge


def test_multi_sketch_merge_adds(spark):
    a = _mk(spark, [(0, i % 20) for i in range(100)])
    b = _mk(spark, [(0, i % 30) for i in range(150)])
    sa = cms_sketch(a, "k", width=W, depth=D)
    sb = cms_sketch(b, "k", width=W, depth=D)
    both = cms_sketch(
        a.unionByName(b), "k", width=W, depth=D
    )
    assert _cells(cms_merge_groups(sa, sb)) == _cells(both)


def test_rebucketing_keeps_prefix_groups(spark):
    rows = [(g, (g + i) % 25) for g in range(6) for i in range(30)]
    df = _mk(spark, rows).withColumn("week", F.expr("g div 2"))
    by_day = cms_sketch_by_group(df, "k", ("week", "g"), width=W, depth=D)
    by_week = cms_merge_groups(by_day, group_cols=("week",))
    for wk in range(3):
        got = _cells(by_week.filter(F.col("week") == wk).drop("week"))
        want = _cells(
            cms_sketch(df.filter(F.col("week") == wk), "k", width=W, depth=D)
        )
        assert got == want


def test_null_contracts_and_validation(spark):
    df = spark.createDataFrame(
        [(None, 1), (None, 1), (0, None), (0, 2)], "g long, k long"
    )
    sk = cms_sketch_by_group(df, "k", ("g",), width=W, depth=D)
    # NULL group is its own group; NULL key skipped (g=0 keeps 1 row)
    rows = sk.collect()
    assert {r["g"] for r in rows} == {None, 0}
    assert all(r["cnt"] == 2 for r in rows if r["g"] is None)
    assert all(r["cnt"] == 1 for r in rows if r["g"] == 0)
    with pytest.raises(ValueError, match="group_cols must be non-empty"):
        cms_sketch_by_group(df, "k", (), width=W, depth=D)
    with pytest.raises(ValueError, match="depth must be"):
        cms_sketch_by_group(df, "k", ("g",), width=W, depth=99)
    with pytest.raises(ValueError, match="at least one"):
        cms_merge_groups()
    flat = cms_sketch(df, "k", width=W, depth=D)
    with pytest.raises(ValueError, match="lacks columns"):
        cms_merge_groups(flat, group_cols=("g",))


def test_merge_geometry_guard_fires_and_is_best_effort(spark):
    """The declared-geometry check's raise paths. STAMPED inputs
    (cms_sketch_by_group output since r18) are checked EXACTLY and
    eagerly against the declared (width, depth) — including the
    NARROWER build that the in-plan bounds check provably cannot see
    (it fits the declared bounds; VERDICT r17 task 4 closed that
    mode). With the stamp stripped (hand-built state) the legacy
    behavior remains: larger width raises in-plan once an
    out-of-bounds cell is read; smaller width merges without error —
    best-effort, same-geometry the caller's contract (ADVICE r11)."""
    df = spark.createDataFrame(
        [(0, i) for i in range(200)], "g long, k long"
    )
    big = cms_sketch_by_group(df, "k", ("g",), width=4 * W, depth=D)
    with pytest.raises(ValueError, match="does not match the supplied"):
        cms_merge_groups(big, group_cols=("g",), width=W, depth=D)
    small = cms_sketch_by_group(df, "k", ("g",), width=W // 2, depth=D)
    with pytest.raises(ValueError, match="does not match the supplied"):
        cms_merge_groups(small, group_cols=("g",), width=W, depth=D)
    # mixed-geometry INPUTS are caught against each other even with no
    # declared width/depth at all
    ok = cms_sketch_by_group(df, "k", ("g",), width=W, depth=D)
    with pytest.raises(ValueError, match="different geometries"):
        cms_merge_groups(ok, small, group_cols=("g",))
    # stripped stamps: the legacy best-effort paths
    with pytest.raises(Exception, match="outside the declared"):
        cms_merge_groups(
            big.withMetadata("cnt", {}), group_cols=("g",), width=W, depth=D
        ).collect()
    rows = cms_merge_groups(
        small.withMetadata("cnt", {}), group_cols=("g",), width=W, depth=D
    ).collect()
    assert rows  # fits the bounds — undetectable without the stamp


def test_merge_groups_rejects_duplicate_columns(spark):
    """Review-caught r12 (the hll_merge ADVICE r11 lesson): duplicated
    needed columns fail loudly at the merge, not downstream."""
    df = spark.createDataFrame([(0, 1)], "g long, k long")
    sk = cms_sketch_by_group(df, "k", ("g",), width=W, depth=D)
    dup = sk.select("g", "d", "b", "cnt", "cnt")
    with pytest.raises(ValueError, match="duplicated columns"):
        cms_merge_groups(dup, group_cols=("g",))
