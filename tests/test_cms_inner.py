"""cms_inner_product (operators/cms_inner.py): the one-sided
join-size estimate's guarantees — never under the true inner product,
exact when collision-free, ZERO when any depth row shares no cells
(the left-join zero-fill), linear under the cell-sum combine, and the
shape/overflow guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import cms_sketch
from food_panda_etl_spark.operators.cms_inner import cms_inner_product
from food_panda_etl_spark.operators.cms_windowed import cms_merge_groups
from food_panda_etl_spark.tables import load_table

_W, _D = 1024, 4


def _exact_inner(a, b, col):
    fa = a.filter(F.col(col).isNotNull()).groupBy(col).count()
    fb = b.filter(F.col(col).isNotNull()).groupBy(col).count()
    return (
        fa.withColumnRenamed("count", "na")
        .join(fb.withColumnRenamed("count", "nb"), col)
        .agg(F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("x"))
        .collect()[0]["x"]
    )


def _est(spark, a, b, col, width=_W, depth=_D):
    return cms_inner_product(
        cms_sketch(a, col, width=width, depth=depth),
        cms_sketch(b, col, width=width, depth=depth),
    ).collect()[0]["est"]


def test_never_underestimates_fixture(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "R")
    b = li.filter(F.col("l_returnflag") == "A")
    est = _est(spark, a, b, "l_partkey")
    exact = _exact_inner(a, b, "l_partkey")
    assert est >= exact
    # and the overshoot obeys the min-over-depths bound with slack
    n_a, n_b = a.count(), b.count()
    assert (est - exact) * _W <= 3 * n_a * n_b + 8 * _W


def test_exact_when_collision_free(spark):
    # 8 distinct keys into 1024 buckets across 4 independent depth rows:
    # a cross-key bucket collision in EVERY depth row is what it takes
    # to inflate the min — with these keys there is none, so est == exact
    a = spark.range(8).select((F.col("id") * 7 + 1).alias("k"))
    b = spark.range(8).select((F.col("id") * 7 + 1).alias("k"))
    assert _est(spark, a, b, "k") == 8  # each key once on each side


def test_zero_when_disjoint(spark):
    # disjoint key sets CAN still collide in some depth row, but any
    # depth row with no shared cells forces the min to 0 — with 2+2
    # keys in 1024 buckets all four rows are collision-free, so the
    # left-join zero-fill must deliver 0 (an inner-join-only plan
    # would min over ABSENT rows and report garbage)
    a = spark.range(2).select((F.col("id") + 1).alias("k"))
    b = spark.range(2).select((F.col("id") + 100001).alias("k"))
    assert _est(spark, a, b, "k") == 0


def test_empty_side_is_zero_not_null(spark):
    a = spark.range(5).select(F.col("id").alias("k"))
    b = spark.range(0).select(F.col("id").alias("k"))
    assert _est(spark, a, b, "k") == 0


def test_multiplicities(spark):
    # f_a = (3, 1), f_b = (2, 5) on two shared keys → 3·2 + 1·5 = 11
    a = spark.createDataFrame([(1,)] * 3 + [(2,)], "k long")
    b = spark.createDataFrame([(1,)] * 2 + [(2,)] * 5, "k long")
    assert _est(spark, a, b, "k") == 11


def test_linear_under_merge(spark):
    # inner product distributes over the cell-sum combine:
    # ip(sketch(A1 ∪ A2), B) == ip computed from merged partial sketches
    a1 = spark.createDataFrame([(i % 50,) for i in range(300)], "k long")
    a2 = spark.createDataFrame([(i % 70,) for i in range(400)], "k long")
    b = spark.createDataFrame([(i % 60,) for i in range(500)], "k long")
    sk_b = cms_sketch(b, "k", width=_W, depth=_D)
    merged = cms_merge_groups(
        cms_sketch(a1, "k", width=_W, depth=_D),
        cms_sketch(a2, "k", width=_W, depth=_D),
    )
    direct = cms_sketch(a1.unionByName(a2), "k", width=_W, depth=_D)
    est_m = cms_inner_product(merged, sk_b).collect()[0]["est"]
    est_d = cms_inner_product(direct, sk_b).collect()[0]["est"]
    assert est_m == est_d


def test_shape_guard(spark):
    good = cms_sketch(
        spark.range(3).select(F.col("id").alias("k")), "k", width=_W, depth=_D
    )
    bad = spark.createDataFrame([(0, 0)], "d int, b int")
    with pytest.raises(ValueError, match="expected \\[d, b, cnt\\]"):
        cms_inner_product(good, bad)


def test_depth_mismatch_raises_in_plan(spark):
    # geometry contract violation: sk_b built at depth 2 vs sk_a's 4.
    # STAMPED sketches (cms_sketch output since r18) raise EXACTLY and
    # eagerly from the geometry stamp; with the stamps stripped
    # (hand-built state) the in-plan depth-set guard still catches it
    # at execution — the min must not silently run over sk_a's depth
    # rows only (ADVICE r13); like __ok that guard rides the result
    # expression
    a = spark.range(20).select(F.col("id").alias("k"))
    sk4 = cms_sketch(a, "k", width=_W, depth=4)
    sk2 = cms_sketch(a, "k", width=_W, depth=2)
    with pytest.raises(ValueError, match="different geometries"):
        cms_inner_product(sk4, sk2)
    bare4, bare2 = sk4.withMetadata("cnt", {}), sk2.withMetadata("cnt", {})
    with pytest.raises(Exception, match="disagree on 2 depth rows"):
        cms_inner_product(bare4, bare2).collect()
    # and symmetrically when sk_b has the EXTRA depths
    with pytest.raises(Exception, match="disagree on 2 depth rows"):
        cms_inner_product(bare2, bare4).collect()


def test_width_mismatch_raises_from_stamp(spark):
    """The mode no bounds check could see (VERDICT r17 task 4): a
    NARROWER-width build occupies only valid cells of the wider grid —
    indistinguishable from sparsity — but the r18 geometry stamp
    catches it exactly, eagerly, at plan-construction time."""
    a = spark.range(20).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="different geometries"):
        cms_inner_product(
            cms_sketch(a, "k", width=_W, depth=_D),
            cms_sketch(a, "k", width=_W // 2, depth=_D),
        )


def test_overflow_guard_raises_in_plan(spark):
    # hand-built sketches whose depth-0 totals multiply past 4e18: the
    # guard must raise at EXECUTION (it rides the result expression —
    # Catalyst cannot prune it away)
    huge = spark.createDataFrame(
        [(d, 0, 3 * 10**9) for d in range(_D)], "d int, b int, cnt long"
    )
    with pytest.raises(Exception, match="int64 inner-product bound"):
        cms_inner_product(huge, huge).collect()
