"""Count-min sketch invariants: NEVER underestimates (the one-sided
error guarantee, under any keys and partitioning), exact when the
sketch is collision-free, equivalence with an independent pure-Python
sketch (same multiplicative hashes), mergeability (sketch of a union ==
cell-wise sum of sketches), and input validation."""

from __future__ import annotations

from collections import Counter

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _python_cms(keys, width, depth):
    from food_panda_etl_spark.operators.cms import _ADDS, _MULTS, _P

    cells: Counter = Counter()
    for k in keys:
        for d in range(depth):
            cells[(d, ((k % _P) * _MULTS[d] + _ADDS[d]) % _P % width)] += 1
    return cells


def _python_est(cells, k, width, depth):
    from food_panda_etl_spark.operators.cms import _ADDS, _MULTS, _P

    return min(
        cells.get((d, ((k % _P) * _MULTS[d] + _ADDS[d]) % _P % width), 0)
        for d in range(depth)
    )


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(
    # full-int64 keys (hash/id domain), including negatives: the mod-P
    # pre-reduction must keep Spark's pmod grid equal to Python's %
    # with no int64 wrap anywhere
    keys=st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=200),
            st.integers(min_value=-(2**62), max_value=2**62),
        ),
        min_size=1, max_size=60,
    ),
    parts=st.integers(min_value=1, max_value=5),
    width=st.sampled_from([8, 32, 1024]),
)
def test_cms_matches_reference_and_never_underestimates(spark, keys, parts, width):
    from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch

    depth = 4
    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(parts)
    sk = cms_sketch(df, "k", width=width, depth=depth)
    got_cells = {(r["d"], r["b"]): r["cnt"] for r in sk.collect()}
    want_cells = _python_cms(keys, width, depth)
    assert got_cells == dict(want_cells)

    probes = spark.createDataFrame(
        [(k,) for k in sorted({*keys, 777})], "k long"
    )
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, probes, "k", width=width, depth=depth).collect()
    }
    true = Counter(keys)
    for k, e in est.items():
        assert e >= true.get(k, 0)  # the one-sided guarantee
        assert e == _python_est(want_cells, k, width, depth)


def test_cms_exact_when_collision_free(spark):
    """width ≥ grid: every key owns its cells at every depth, so the
    estimate IS the exact count."""
    from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch

    keys = [1, 1, 2, 3, 3, 3]
    df = spark.createDataFrame([(k,) for k in keys], "k long")
    sk = cms_sketch(df, "k", width=1000003, depth=2)
    probes = spark.createDataFrame([(1,), (2,), (3,), (9,)], "k long")
    est = {
        r["k"]: r["est"]
        for r in cms_estimate(sk, probes, "k", width=1000003, depth=2).collect()
    }
    assert est == {1: 2, 2: 1, 3: 3, 9: 0}


def test_cms_merges_by_union(spark):
    """Sketch(A ∪ B) == cell-wise sum of Sketch(A) and Sketch(B) — the
    mergeable-summary property that makes per-shard sketches combinable."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.cms import cms_sketch

    a = spark.createDataFrame([(k,) for k in [1, 2, 2, 5]], "k long")
    b = spark.createDataFrame([(k,) for k in [2, 5, 9]], "k long")
    whole = {
        (r["d"], r["b"]): r["cnt"]
        for r in cms_sketch(a.union(b), "k", width=16, depth=3).collect()
    }
    merged = {
        (r["d"], r["b"]): r["cnt"]
        for r in (
            cms_sketch(a, "k", width=16, depth=3)
            .union(cms_sketch(b, "k", width=16, depth=3))
            .groupBy("d", "b")
            .agg(F.sum("cnt").alias("cnt"))
        ).collect()
    }
    assert whole == merged


def test_cms_no_universal_fixed_point(spark):
    """The affine hash must NOT send any single residue class to the
    same bucket at every depth (the flaw of a purely multiplicative
    hash, whose degenerate residue collapses min-over-depths to one
    shared cell). Checked for the residues that are fixed points of the
    multiplicative form (0 and P-1) and a sample of others."""
    from food_panda_etl_spark.operators.cms import _ADDS, _MULTS, _P

    depth, width = 4, 1024
    for r in (0, _P - 1, 1, 12345, 999999):
        buckets = {
            (r * _MULTS[d] + _ADDS[d]) % _P % width for d in range(depth)
        }
        assert len(buckets) > 1, f"residue {r} collapses to one bucket"


def test_cms_validates_geometry(spark):
    from food_panda_etl_spark.operators.cms import cms_sketch

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="depth"):
        cms_sketch(df, "k", depth=0)
    with pytest.raises(ValueError, match="width"):
        cms_sketch(df, "k", width=0)


def test_dm_fragment_oracles_build_on_the_shared_builder():
    """One-definition pin (the r15 gram-builder convention): every
    declared oracle that replays the affine (d, A_d, B_d) hash rows
    must embed the ONE shared builder's output — the r16 dm-fragment
    consolidation retired the last two inline copies (sketch.py's
    _DM_VALUES, sketch_extras.py's _CMSW_DM); a drifted copy would
    silently hash-match a different hash family."""
    from food_panda_etl_spark.operators.cms import oracle_dm_sql
    from food_panda_etl_spark.queries import ORACLES

    assert oracle_dm_sql(4) in ORACLES["q_cms_counts"]
    assert oracle_dm_sql(4) in ORACLES["q_cms_windowed"]
    assert oracle_dm_sql(4) in ORACLES["q_join_advice"]
