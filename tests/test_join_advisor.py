"""Sketch-driven join advice (operators/join_advisor.py, r14
build-ahead for r15): decision branches pinned on engineered frames,
the sketch-derived counts against exact, and the top-count contract
(exact above n/64, literal 0 below)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.join_advisor import (
    _n_from_sketch,
    _top_count,
    join_advice,
)


def _uniform(spark, n, name="k"):
    return spark.range(n).select(F.col("id").alias(name))


def _skewed(spark, n, name="k"):
    # key 0 holds half the rows, the rest are unique
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.col("id"))
        .alias(name)
    )


def test_broadcast_branch(spark):
    row = join_advice(
        _uniform(spark, 50), "k", _uniform(spark, 5000), "k",
        join_id="t", broadcast_rows=100,
    ).collect()[0]
    assert row.advice == "broadcast"
    assert (row.n_a, row.n_b) == (50, 5000)


def test_salt_branch(spark):
    # both sides above the broadcast bar, side a skewed (top share 1/2)
    row = join_advice(
        _skewed(spark, 400), "k", _uniform(spark, 400), "k",
        join_id="t", broadcast_rows=100,
    ).collect()[0]
    assert row.advice == "shuffle_salt"
    assert row.top_cnt_a == 200  # exact: half the rows on key 0
    assert row.top_cnt_b == 0  # uniform side: nothing above n/64


def test_shuffle_branch_and_estimate_bound(spark):
    a, b = _uniform(spark, 400), _uniform(spark, 300)
    row = join_advice(
        a, "k", b, "k", join_id="t", broadcast_rows=100
    ).collect()[0]
    assert row.advice == "shuffle"
    # exact join size: keys 0..299 match once each
    assert row.est_join_size >= 300  # one-sided CMS bound


def test_null_keys_excluded_from_counts(spark):
    a = spark.range(100).select(
        F.when(F.col("id") < 40, None).otherwise(F.col("id")).alias("k")
    )
    from food_panda_etl_spark.operators.cms import cms_sketch

    n = _n_from_sketch(cms_sketch(a, "k")).collect()[0]["n"]
    assert n == 60


def test_top_count_threshold_contract(spark):
    # 10 keys x 10 rows over n=100: top = 10 > 100/64 → reported exact
    a = spark.range(100).select((F.col("id") % 10).alias("k"))
    assert _top_count(a, "k").collect()[0]["c"] == 10
    # uniform: top = 1 < n/64 for n = 100? 1*64 < 100 → 0
    b = spark.range(100).select(F.col("id").alias("k"))
    assert _top_count(b, "k").collect()[0]["c"] == 0


def test_skew_ratio_validation(spark):
    with pytest.raises(ValueError, match="need 0 < skew_num <= skew_den"):
        join_advice(
            _uniform(spark, 10), "k", _uniform(spark, 10), "k",
            skew_num=0,
        )


def test_prebuilt_summaries_match_raw_path(spark):
    """The zero-rescan mode (ADVICE r15): advice computed from
    MAINTAINED summaries must equal the raw-DataFrame path row-for-row
    — same sketches, same heavy hitters, so same integers and the same
    decision on every branch the suite pins."""
    from food_panda_etl_spark.operators.cms import cms_sketch
    from food_panda_etl_spark.operators.heavy import heavy_hitters

    a, b = _skewed(spark, 400), _uniform(spark, 400)
    want = join_advice(
        a, "k", b, "k", join_id="t", broadcast_rows=100
    ).collect()

    def summaries(df):
        keyed = df.select(F.col("k").alias("__k")).filter(
            F.col("__k").isNotNull()
        )
        return (
            cms_sketch(df, "k"),
            heavy_hitters(keyed, "__k", fraction=1.0 / 64.0),
        )

    sk_a, hh_a = summaries(a)
    sk_b, hh_b = summaries(b)
    got = join_advice(
        None, "k", None, "k", join_id="t", broadcast_rows=100,
        sketch_a=sk_a, sketch_b=sk_b, top_a=hh_a, top_b=hh_b,
    ).collect()
    assert got == want
    assert got[0].advice == "shuffle_salt"


def test_skew_bar_finer_than_hh_fraction_raises(spark):
    """ADVICE r16: heavy_hitters(1/64) cannot see keys at or below
    n/64 (its threshold is STRICT while the salt test uses >=), so a
    requested skew bar at or finer than 1/64 would silently read
    top_cnt=0 for boundary keys and never salt — it must raise
    instead (the == case was the review-caught survivor of the first
    < form of the guard)."""
    with pytest.raises(ValueError, match="strictly coarser"):
        join_advice(
            _uniform(spark, 10), "k", _uniform(spark, 10), "k",
            skew_num=1, skew_den=128,
        )
    with pytest.raises(ValueError, match="strictly coarser"):
        join_advice(
            _uniform(spark, 10), "k", _uniform(spark, 10), "k",
            skew_num=1, skew_den=64,
        )
    # strictly coarser than 1/64 is legal
    join_advice(
        _uniform(spark, 10), "k", _uniform(spark, 10), "k",
        skew_num=1, skew_den=32,
    ).collect()


def test_maintained_sketch_grid_mismatch_raises(spark):
    """ADVICE r16/r17 + VERDICT r17 task 4: a maintained sketch built
    at a different (width, depth) must throw, not silently
    mis-estimate cms_inner_product and the d=0 row counts. STAMPED
    sketches (cms_sketch output since r18) raise from the exact, lazy
    stamp comparison — including the NARROWER build the observational
    screen provably cannot see; with the stamp stripped (hand-built
    state) the r17 driver-side grid check remains the fallback. The
    expected type stays the broad Exception on purpose — the message
    is the stable contract, not where in the lifecycle it fires."""
    from food_panda_etl_spark.operators.cms import cms_sketch

    a, b = _uniform(spark, 50000), _uniform(spark, 50000)
    # depth mismatch: built at depth=2, requested depth=4
    sk_wrong_d = cms_sketch(a, "k", width=1024, depth=2)
    with pytest.raises(Exception, match="does not match the supplied"):
        join_advice(
            a, "k", b, "k", sketch_a=sk_wrong_d,
            width=1024, depth=4,
        ).collect()
    # width mismatch: built WIDER (2048) than requested (1024)
    sk_wrong_w = cms_sketch(a, "k", width=2048, depth=4)
    with pytest.raises(Exception, match="does not match the supplied"):
        join_advice(
            a, "k", b, "k", sketch_a=sk_wrong_w,
            width=1024, depth=4,
        ).collect()
    # width mismatch: built NARROWER (512) than requested — every cell
    # fits the requested bounds, indistinguishable from sparsity for
    # the observational check; ONLY the stamp catches it (the mode
    # VERDICT r17 task 4 existed to close)
    sk_narrow = cms_sketch(a, "k", width=512, depth=4)
    with pytest.raises(Exception, match="does not match the supplied"):
        join_advice(
            a, "k", b, "k", sketch_a=sk_narrow,
            width=1024, depth=4,
        ).collect()
    # stripped stamps: the r17 driver-side observational fallback
    with pytest.raises(Exception, match="grid mismatch"):
        join_advice(
            a, "k", b, "k",
            sketch_a=sk_wrong_d.withMetadata("cnt", {}),
            width=1024, depth=4,
        ).collect()
    with pytest.raises(Exception, match="grid mismatch"):
        join_advice(
            a, "k", b, "k",
            sketch_a=sk_wrong_w.withMetadata("cnt", {}),
            width=1024, depth=4,
        ).collect()


def test_check_grid_escape_hatch(spark):
    """ADVICE r17 #2 (the edit_join degenerate_factor=0 convention):
    check_grid=False skips the EAGER driver-side fallback for
    plan-only callers — an unstamped wrong-grid sketch then reverts to
    the caller's contract (documented) and the call stays fully lazy;
    STAMPED sketches are still validated (the check is free and
    lazy)."""
    from food_panda_etl_spark.operators.cms import cms_sketch

    a, b = _uniform(spark, 5000), _uniform(spark, 5000)
    bare_wrong = cms_sketch(a, "k", width=2048, depth=4).withMetadata(
        "cnt", {}
    )
    # plan-only: constructing the advice frame performs NO eager
    # action and no raise — the caller owns the geometry contract
    df = join_advice(
        a, "k", b, "k", sketch_a=bare_wrong,
        width=1024, depth=4, check_grid=False,
    )
    assert df.columns[0] == "join_id"
    # a STAMPED wrong sketch still raises even with check_grid=False
    sk_wrong = cms_sketch(a, "k", width=2048, depth=4)
    with pytest.raises(Exception, match="does not match the supplied"):
        join_advice(
            a, "k", b, "k", sketch_a=sk_wrong,
            width=1024, depth=4, check_grid=False,
        )


def test_maintained_empty_sketch_passes_grid_check(spark):
    """An EMPTY maintained sketch (empty side) is legitimate — n=0
    reads broadcast; the grid guard must not fire on it."""
    from food_panda_etl_spark.operators.cms import cms_sketch
    from food_panda_etl_spark.operators.heavy import heavy_hitters

    empty = _uniform(spark, 10).filter(F.lit(False))
    sk_e = cms_sketch(empty, "k")
    hh_e = heavy_hitters(
        empty.select(F.col("k").alias("__k")), "__k", fraction=1.0 / 64.0
    )
    row = join_advice(
        empty, "k", _uniform(spark, 500), "k",
        sketch_a=sk_e, top_a=hh_e,
    ).collect()[0]
    assert row.n_a == 0 and row.advice == "broadcast"
