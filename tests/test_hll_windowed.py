"""Windowed / re-bucketed HLL (r12 build-ahead, declared r13): the
re-bucketing combine must equal sketching the concatenated buckets
directly (register max IS HLL union — the linearity that makes
trailing-window distinct counts correct at m-row state), estimates
through the re-bucketed path must match the direct path bit-for-bit,
and shape validation. The flat sketch/merge/estimate machinery is
itself pinned in tests/test_hll.py."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.hll import hll_estimate, hll_sketch
from food_panda_etl_spark.operators.hll_windowed import hll_merge_groups


def _regs(df) -> dict:
    return {r["reg"]: r["rho"] for r in df.collect()}


def test_rebucket_equals_direct_sketch(spark):
    df = spark.createDataFrame(
        [((i * 7919) % 400, i % 5) for i in range(2000)], "k long, day int"
    )
    by_day = hll_sketch(df, "k", group_cols=("day",))
    rebucketed = hll_merge_groups(by_day)
    direct = hll_sketch(df, "k")
    assert _regs(rebucketed) == _regs(direct)


def test_window_filter_then_rebucket_equals_window_sketch(spark):
    """The declared-query shape (slated r13): filter the day groups to
    the trailing window, drop the day dimension, estimate — identical
    registers AND identical estimate record to sketching the window's
    rows directly."""
    df = spark.createDataFrame(
        [((i * 104729) % 900, i % 10) for i in range(3000)],
        "k long, day int",
    )
    by_day = hll_sketch(df, "k", group_cols=("day",))
    recent = hll_merge_groups(by_day.filter(F.col("day") >= 7))
    direct = hll_sketch(df.filter(F.col("day") >= 7), "k")
    assert _regs(recent) == _regs(direct)
    got = hll_estimate(recent).collect()[0]
    want = hll_estimate(direct).collect()[0]
    assert got == want


def test_keep_prefix_rebuckets(spark):
    df = spark.createDataFrame(
        [((i * 31) % 50, i % 4, i % 2) for i in range(400)],
        "k long, day int, lang int",
    )
    fine = hll_sketch(df, "k", group_cols=("day", "lang"))
    coarse = hll_merge_groups(fine, group_cols=("lang",))
    direct = hll_sketch(df, "k", group_cols=("lang",))
    got = {(r["lang"], r["reg"]): r["rho"] for r in coarse.collect()}
    want = {(r["lang"], r["reg"]): r["rho"] for r in direct.collect()}
    assert got == want


def test_merge_groups_validates(spark):
    with pytest.raises(ValueError, match="at least one"):
        hll_merge_groups()
    df = spark.createDataFrame([(1, 0)], "k long, day int")
    flat = hll_sketch(df, "k")
    with pytest.raises(ValueError, match="lacks columns"):
        hll_merge_groups(flat, group_cols=("day",))


def test_merge_groups_rejects_duplicate_columns(spark):
    """Review-caught r12 (the hll_merge ADVICE r11 lesson applied to
    the subset check): a duplicated needed column must fail loudly
    here, not as a downstream ambiguous-reference error."""
    df = spark.createDataFrame([(1, 0)], "k long, day int")
    sk = hll_sketch(df, "k", group_cols=("day",))
    dup = sk.select("day", "reg", "rho", "rho")
    with pytest.raises(ValueError, match="duplicated columns"):
        hll_merge_groups(dup, group_cols=("day",))
