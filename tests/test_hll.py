"""HLL-style distinct sketch (r10 build-ahead): register-exact
equality with an independent Python reference under any partitioning,
duplicate-invariance, mergeability, estimate accuracy in the raw
regime, and validation. The r10 declared-query oracle form is the full
register replay these tests pin (reg/rank arithmetic is pure integer —
`bit_count((w & -w) - 1)` verified identical in Spark and DuckDB)."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.hll import (
    _HASH_MOD,
    _rank_cap,
    hll_estimate,
    hll_merge,
    hll_sketch,
)


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def _ref_sketch(keys, m=256) -> dict:
    cap = _rank_cap(m)
    regs: dict = {}
    for k in keys:
        h = ((k % _HASH_MOD) + _HASH_MOD) % _HASH_MOD
        for _ in range(2):
            h = ((h * h) % _HASH_MOD * 1315423911) % _HASH_MOD
        reg, w = h % m, h // m
        if w == 0:
            rho = cap
        else:
            rho = 1
            while w % 2 == 0:
                rho += 1
                w //= 2
        regs[reg] = max(regs.get(reg, 0), rho)
    return regs


def _spark_sketch(spark, keys, parts, m=256) -> dict:
    df = spark.createDataFrame(
        [(int(k),) for k in keys], "k long"
    ).repartition(parts)
    return {
        r["reg"]: r["rho"] for r in hll_sketch(df, "k", m=m).collect()
    }


@SET
@given(
    keys=st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                  min_size=1, max_size=80),
    parts=st.integers(min_value=1, max_value=5),
)
def test_sketch_equals_reference(spark, keys, parts):
    assert _spark_sketch(spark, keys, parts) == _ref_sketch(keys)


def test_sketch_depends_only_on_distinct_set(spark):
    keys = [3, 17, 99, 12345]
    assert _spark_sketch(spark, keys, 2) == _spark_sketch(
        spark, keys * 7, 3
    )


def test_merge_equals_union_sketch(spark):
    a = list(range(0, 500))
    b = list(range(300, 900))
    sa = hll_sketch(
        spark.createDataFrame([(k,) for k in a], "k long"), "k"
    )
    sb = hll_sketch(
        spark.createDataFrame([(k,) for k in b], "k long"), "k"
    )
    merged = {
        r["reg"]: r["rho"] for r in hll_merge(sa, sb).collect()
    }
    assert merged == _ref_sketch(set(a) | set(b))


def test_estimate_accuracy_in_raw_regime(spark):
    """m=256 raw HLL has ~6.5% standard error; at 1,000-5,000
    distinct keys (above the 2.5·m bias floor) the estimate must land
    within 25% of truth — deterministic-stable (measured 4-12% on
    these exact sets), yet a broken harmonic sum or a degenerate hash
    is off by 2x or more."""
    for n in (1000, 5000):
        df = spark.range(n).select(F.col("id").alias("k"))
        est = hll_estimate(hll_sketch(df, "k")).collect()[0]
        assert est["dyadic_sum"] > 0
        assert abs(est["raw_estimate"] - n) / n < 0.25, (
            n, est["raw_estimate"]
        )


def test_null_keys_are_ignored_and_empty_sketch_estimates(spark):
    """NULL keys are not distinct values — they must not forge a
    phantom max-rank register (code-review regression); and an EMPTY
    input yields the alpha·m zero-cardinality plateau, never NULL."""
    from food_panda_etl_spark.operators.hll import HLL_M, _ALPHA

    with_null = spark.createDataFrame(
        [(1,), (2,), (None,)], "k long"
    )
    plain = spark.createDataFrame([(1,), (2,)], "k long")
    assert (
        {(r["reg"], r["rho"]) for r in hll_sketch(with_null, "k").collect()}
        == {(r["reg"], r["rho"]) for r in hll_sketch(plain, "k").collect()}
    )
    empty = spark.createDataFrame([], "k long")
    est = hll_estimate(hll_sketch(empty, "k")).collect()[0]
    assert est["nonzero_regs"] == 0
    assert est["dyadic_sum"] > 0 and est["raw_estimate"] is not None
    assert abs(est["raw_estimate"] - _ALPHA[HLL_M] * HLL_M) < 1e-9


def test_hll_validates(spark):
    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="m must be"):
        hll_sketch(df, "k", m=100)
    with pytest.raises(ValueError, match="at least one"):
        hll_merge()
    with pytest.raises(ValueError, match="mixer must be"):
        hll_sketch(df, "k", mixer="md5")
    with pytest.raises(ValueError, match="mixer must be"):
        hll_estimate(hll_sketch(df, "k"), mixer="md5")


def test_estimate_rejects_out_of_grid_ranks(spark):
    """An xxhash64-built sketch fed to a portable-mixer estimate (the
    forgotten mixer= kwarg) carries ranks above the portable cap —
    shiftleft(1, negative) would wrap into ~2^57 garbage addends that
    only corrupt at PRODUCTION cardinalities (review-caught): the
    in-plan range guard must raise instead. rho=30 is a legal xxhash64
    register but impossible under the portable grid (cap 24)."""
    bad = spark.createDataFrame([(0, 30)], "reg int, rho int")
    with pytest.raises(Exception, match="different mixer"):
        hll_estimate(bad).collect()
    # the same register is fine under its own mixer's grid
    ok = hll_estimate(bad, mixer="xxhash64").collect()[0]
    assert ok["nonzero_regs"] == 1 and ok["raw_estimate"] > 0


def test_merge_rejects_group_shape_mismatch(spark):
    """A group-wise sketch merged under the default group_cols=() would
    silently max registers ACROSS groups (ADVICE r9) — the shape check
    must refuse it, and also a plain column-order drift."""
    df = spark.createDataFrame(
        [("a", 1), ("b", 2)], "g string, k long"
    )
    grouped = hll_sketch(df, "k", group_cols=("g",))
    with pytest.raises(ValueError, match="group_cols must match"):
        hll_merge(grouped, grouped)
    flat = hll_sketch(df, "k")
    with pytest.raises(ValueError, match="group_cols must match"):
        hll_merge(flat, grouped, group_cols=("g",))


def test_int32_keys_sketch_like_bigint(spark):
    """An INT key column (allowed by the contract) must produce the
    identical sketch to the same values as BIGINT — the ADVICE r9 fix:
    without the engine-side CAST the int32 path overflows at
    `(k % P) + P` (ANSI job abort, or silent wraparound with ANSI
    off)."""
    keys = [0, 1, 2**31 - 1, -(2**31), 12345, -7]
    i32 = spark.createDataFrame([(k,) for k in keys], "k int")
    i64 = spark.createDataFrame([(k,) for k in keys], "k long")
    got32 = {(r["reg"], r["rho"]) for r in hll_sketch(i32, "k").collect()}
    got64 = {(r["reg"], r["rho"]) for r in hll_sketch(i64, "k").collect()}
    assert got32 == got64 == {
        (reg, rho) for reg, rho in _ref_sketch(keys).items()
    }


def test_xxhash64_mixer_gate(spark):
    """The PRODUCTION mixer (module-docstring ceiling swap-out, now
    code): build the sketch with mixer="xxhash64" and check the
    estimate through the gate form — the q_approx_distinct convention,
    since a 64-bit avalanche hash has no SQL oracle. Same raw-regime
    tolerance as the portable mixer, same mergeability, and the
    sequential-key set that collapses a linear hash must hold too (an
    avalanche mixer has no progression pathology by construction)."""
    for n in (1000, 5000):
        df = spark.range(n).select(F.col("id").alias("k"))
        sk = hll_sketch(df, "k", mixer="xxhash64")
        est = hll_estimate(sk, mixer="xxhash64").collect()[0]
        assert est["dyadic_sum"] > 0
        assert abs(est["raw_estimate"] - n) / n < 0.25, (
            n, est["raw_estimate"]
        )
    # mergeability holds under the production mixer as well
    a = spark.range(0, 2000).select(F.col("id").alias("k"))
    b = spark.range(1000, 3000).select(F.col("id").alias("k"))
    merged = hll_merge(
        hll_sketch(a, "k", mixer="xxhash64"),
        hll_sketch(b, "k", mixer="xxhash64"),
    )
    both = hll_sketch(
        a.unionAll(b), "k", mixer="xxhash64"
    )
    assert (
        {(r["reg"], r["rho"]) for r in merged.collect()}
        == {(r["reg"], r["rho"]) for r in both.collect()}
    )
    est = hll_estimate(merged, mixer="xxhash64").collect()[0]
    assert abs(est["raw_estimate"] - 3000) / 3000 < 0.25


def test_groupwise_sketch_and_estimate(spark):
    """Group-wise HLL: each group's register table equals the flat
    sketch of that group's keys alone (independence), the grouped
    estimate matches the flat estimate per group, and NULL group keys
    are their own group."""
    rows = (
        [("a", k) for k in range(0, 2000)]
        + [("b", k) for k in range(500, 1200)]
        + [(None, k) for k in range(0, 300)]
    )
    df = spark.createDataFrame(rows, "g string, k long").repartition(4)
    grouped = hll_sketch(df, "k", group_cols=("g",))
    by_g: dict = {}
    for r in grouped.collect():
        by_g.setdefault(r["g"], {})[r["reg"]] = r["rho"]
    assert by_g["a"] == _ref_sketch(range(0, 2000))
    assert by_g["b"] == _ref_sketch(range(500, 1200))
    assert by_g[None] == _ref_sketch(range(0, 300))

    est = {
        r["g"]: r["raw_estimate"]
        for r in hll_estimate(grouped, group_cols=("g",)).collect()
    }
    flat = {
        g: hll_estimate(
            hll_sketch(df.filter(F.col("g").eqNullSafe(g)), "k")
        ).collect()[0]["raw_estimate"]
        for g in ("a", "b")
    }
    assert est["a"] == flat["a"] and est["b"] == flat["b"]
    assert abs(est["a"] - 2000) / 2000 < 0.25


def test_merge_accepts_reordered_rejects_duplicate_columns(spark):
    """Order-insensitive, multiplicity-sensitive (ADVICE r10/r11): a
    column-reordering select is the same sketch and must merge (and
    merge(x, x) == x — idempotent max); a duplicated column name must
    fail HERE with the clear message, not later inside select(*want)
    as an ambiguous-reference error."""
    df = spark.createDataFrame([("a", 1), ("b", 2)], "g string, k long")
    grouped = hll_sketch(df, "k", group_cols=("g",))
    reordered = grouped.select("rho", "reg", "g")
    merged = hll_merge(grouped, reordered, group_cols=("g",))
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, grouped.collect())
    )
    dup = grouped.select("g", "reg", "rho", "rho")
    with pytest.raises(ValueError, match="group_cols must match"):
        hll_merge(dup, group_cols=("g",))
