"""Group-wise bottom-k sampling (r10 build-ahead, declared r11):
set-equality with an
independent Python reference under any partitioning (hypothesis),
mergeability (the bottom-k combine), NULL-group support, validation,
and the WindowGroupLimit plan gate."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sampling_group import (
    group_bottomk_sample,
)

SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def _ref(rows, k) -> set:
    """Independent bottom-k per group over (g, id) pairs: k smallest by
    the shared multiplicative hash with id tiebreak, 1-based rank."""
    by_g: dict = {}
    for g, i in rows:
        by_g.setdefault(g, set()).add(i)
    out = set()
    for g, ids in by_g.items():
        ordered = sorted(ids, key=lambda i: ((i * 1315423911) % 1000003, i))
        for rk, i in enumerate(ordered[:k], start=1):
            out.add((g, i, rk))
    return out


def _got(df) -> set:
    return {(r["g"], r["i"], r["rk"]) for r in df.collect()}


@SET
@given(
    rows=st.sets(
        st.tuples(st.integers(0, 3), st.integers(0, 500)),
        min_size=1, max_size=60,
    ),
    k=st.integers(min_value=1, max_value=6),
    parts=st.integers(min_value=1, max_value=5),
)
def test_bottomk_equals_reference(spark, rows, k, parts):
    df = spark.createDataFrame(
        sorted(rows), "g long, i long"
    ).repartition(parts)
    got = _got(group_bottomk_sample(df, ("g",), k, id_col="i"))
    assert got == _ref(rows, k)


def test_bottomk_is_mergeable(spark):
    """bottomk(A ∪ B) == bottomk(bottomk(A) ∪ bottomk(B)) per group —
    shards sample independently, partials merge at ≤ k rows per group
    each (the HLL/CMS combine discipline applied to row sampling)."""
    a = [(g, i) for g in range(3) for i in range(0, 40)]
    b = [(g, i) for g in range(3) for i in range(25, 80)]
    mk = lambda rows: spark.createDataFrame(rows, "g long, i long")  # noqa: E731
    k = 7
    whole = _got(group_bottomk_sample(mk(sorted(set(a) | set(b))), ("g",), k, id_col="i"))
    pa = group_bottomk_sample(mk(a), ("g",), k, id_col="i").drop("rk")
    pb = group_bottomk_sample(mk(b), ("g",), k, id_col="i").drop("rk")
    merged = _got(
        group_bottomk_sample(
            pa.unionByName(pb).distinct(), ("g",), k, id_col="i"
        )
    )
    assert merged == whole


def test_bottomk_null_group_and_small_groups(spark):
    """NULL group keys are their own group; a group smaller than k
    returns all its rows with contiguous ranks."""
    rows = [(None, 1), (None, 2), ("a", 10)]
    df = spark.createDataFrame(rows, "g string, i long")
    got = _got(group_bottomk_sample(df, ("g",), 5, id_col="i"))
    assert {g for g, _, _ in got} == {None, "a"}
    assert {rk for g, _, rk in got if g is None} == {1, 2}
    assert {rk for g, _, rk in got if g == "a"} == {1}


def test_bottomk_carries_and_validates(spark):
    df = spark.createDataFrame(
        [("a", 1, "x"), ("a", 2, "y")], "g string, i long, t string"
    )
    out = group_bottomk_sample(
        df, ("g",), 1, id_col="i", carry_cols=("t",)
    )
    assert out.columns == ["g", "i", "t", "rk"]
    assert out.count() == 1
    with pytest.raises(ValueError, match="k must be"):
        group_bottomk_sample(df, ("g",), 0, id_col="i")
    with pytest.raises(ValueError, match="group_cols"):
        group_bottomk_sample(df, (), 1, id_col="i")
    null_id = spark.createDataFrame([("a", None)], "g string, i long")
    with pytest.raises(Exception, match="must be non-NULL"):
        group_bottomk_sample(null_id, ("g",), 1, id_col="i").collect()


def test_order_hash_exact_across_full_id_range(spark):
    """The SHARED sample_order_hash (now pre-reduced in place — ADVICE
    r11 moved the r10 overflow fix into the one definition every
    sampler uses) answers Python-exact on small ids AND at ids where
    the raw multiply would wrap int64 (|id| ≳ 7.0e9: ANSI Spark would
    abort the whole job, DuckDB would raise) — Python bigints never
    overflow, so (i * M) % P is the ground truth on both ranges."""
    from food_panda_etl_spark.operators.sampling import sample_order_hash

    _MUL, _P = 1315423911, 1000003
    ids = [0, 1, 999, 1000003, 7_000_000_000,
           7_010_988_561, 2**62, 2**63 - 1]
    rows = (
        spark.createDataFrame([(i,) for i in ids], "i long")
        .select("i", sample_order_hash("i").alias("h"))
        .collect()
    )
    for r in rows:
        assert r["h"] == (r["i"] * _MUL) % _P  # Python-exact


def test_bottomk_exact_at_large_ids(spark):
    """End-to-end: the sample at snowflake-scale ids matches the exact
    Python reference — the raw hash would wrap and reorder here."""
    base = 2**62
    rows = {(0, base + i * 7919) for i in range(50)}
    df = spark.createDataFrame(sorted(rows), "g long, i long").repartition(3)
    got = _got(group_bottomk_sample(df, ("g",), 5, id_col="i"))
    assert got == _ref(rows, 5)


def test_bottomk_plan_is_window_group_limit(spark, sf_dir):
    """The rank filter must rewrite to WindowGroupLimit — per-partition
    partial top-k heaps BEFORE the shuffle, ≤ k rows per (group,
    partition) moving (the q_topk_per_group convention)."""
    from food_panda_etl_spark.plans import plan_summary
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    s = plan_summary(group_bottomk_sample(d, ("lang",), 10))
    assert s.window_group_limits >= 1
    assert s.cartesian_products == 0 and s.nested_loop_joins == 0


def _pri_ref(rows, k):
    """rows = {(g, id, w)}; returns {(g, id, rk)} by h/w, id."""
    _MUL, _P = 1315423911, 1000003
    out = set()
    by_g = {}
    for g, i, w in rows:
        if w > 0:
            by_g.setdefault(g, []).append(i)
    for g, ids in by_g.items():
        wmap = {i: w for gg, i, w in rows if gg == g}
        order = sorted(
            ids, key=lambda i: (((i * _MUL) % _P) / wmap[i], i)
        )
        out.update((g, i, r + 1) for r, i in enumerate(order[:k]))
    return out


@pytest.mark.parametrize("parts", [1, 4])
def test_group_priority_equals_reference(spark, parts):
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )

    rows = {(i % 3, i, (i * 7) % 11) for i in range(60)}
    df = spark.createDataFrame(
        sorted(rows), "g long, doc_id long, w long"
    ).repartition(parts)
    got = {
        (r["g"], r["doc_id"], r["rk"])
        for r in group_priority_sample(df, ("g",), "w", 5).collect()
    }
    assert got == _pri_ref(rows, 5)


def test_group_priority_unit_weights_coincide_with_bottomk(spark):
    """Unit weights make weighted-bottom-k select the SAME ids in the
    SAME per-group order as the unweighted sampler (priority = h/1 —
    the module-docstring coincidence, now machine-checked)."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )

    df = spark.createDataFrame(
        [(i % 3, i, 1) for i in range(60)], "g long, doc_id long, w long"
    )
    got = {
        (r["g"], r["doc_id"], r["rk"])
        for r in group_priority_sample(df, ("g",), "w", 5).collect()
    }
    want = {
        (r["g"], r["doc_id"], r["rk"])
        for r in group_bottomk_sample(df, ("g",), 5).collect()
    }
    assert got == want


def test_group_priority_weights_bias_and_validation(spark):
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )

    # zero-weight rows never selected; heavy row ~always first at
    # extreme weight ratios (h < P while h/w -> 0 for w >> P)
    df = spark.createDataFrame(
        [(0, i, 0) for i in range(10)] + [(0, 99, 10**9), (0, 7, 1)],
        "g long, doc_id long, w long",
    )
    got = group_priority_sample(df, ("g",), "w", 2).collect()
    assert [r["doc_id"] for r in sorted(got, key=lambda r: r["rk"])] == [
        99,
        7,
    ]
    with pytest.raises(ValueError, match="k must be"):
        group_priority_sample(df, ("g",), "w", 0)
    with pytest.raises(ValueError, match="group_cols must be non-empty"):
        group_priority_sample(df, (), "w", 1)
    neg = spark.createDataFrame([(0, 1, -2)], "g long, doc_id long, w long")
    with pytest.raises(Exception, match="non-negative"):
        group_priority_sample(neg, ("g",), "w", 1).collect()
    null_id = spark.createDataFrame(
        [(0, None, 3)], "g long, doc_id long, w long"
    )
    with pytest.raises(Exception, match="must be non-NULL"):
        group_priority_sample(null_id, ("g",), "w", 1).collect()


def test_group_priority_is_mergeable_and_plan_gated(spark, sf_dir):
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )
    from food_panda_etl_spark.plans import plan_summary
    from food_panda_etl_spark.tables import load_table

    rows = {(i % 2, i, 1 + (i * 13) % 7) for i in range(80)}
    a = [r for r in rows if r[1] % 3 == 0]
    b = [r for r in rows if r[1] % 3 != 0]
    schema = "g long, doc_id long, w long"
    pa_ = group_priority_sample(
        spark.createDataFrame(a, schema), ("g",), "w", 6
    ).select("g", "doc_id", F.col("weight").alias("w"))
    pb = group_priority_sample(
        spark.createDataFrame(b, schema), ("g",), "w", 6
    ).select("g", "doc_id", F.col("weight").alias("w"))
    remerged = {
        (r["g"], r["doc_id"], r["rk"])
        for r in group_priority_sample(
            pa_.unionByName(pb), ("g",), "w", 6
        ).collect()
    }
    assert remerged == _pri_ref(rows, 6)
    d = load_table(spark, sf_dir, "documents")
    s = plan_summary(group_priority_sample(d, ("lang",), "n_chars", 10))
    assert s.window_group_limits >= 1
    assert s.cartesian_products == 0 and s.nested_loop_joins == 0
