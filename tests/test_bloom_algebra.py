"""Bloom AND combine (operators/bloom_algebra.py, r17 build-ahead for
r18): the intersected bit table must contain every bit of the direct
A∩B build (no false negatives for the intersection — the one-sided
contract), probe verdicts must never miss a truly-shared key, the
grouped form must AND per group independently, and malformed inputs
must fail loudly."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import bloom_probe, bloom_sketch
from food_panda_etl_spark.operators.bloom_algebra import bloom_intersect

_M, _K = 4096, 4


def _keys(spark, lo, hi, name="k"):
    return spark.range(lo, hi).select(F.col("id").alias(name))


def test_and_contains_direct_intersection_bits(spark):
    """bits(A) ∧ bits(B) ⊇ bits(A ∩ B), row-for-row on the (j, b)
    relation — the containment that makes the probe one-sided."""
    a = bloom_sketch(_keys(spark, 0, 600), "k", m_bits=_M, k_hashes=_K)
    b = bloom_sketch(_keys(spark, 400, 1000), "k", m_bits=_M, k_hashes=_K)
    both = bloom_intersect(a, b)
    direct = bloom_sketch(
        _keys(spark, 400, 600), "k", m_bits=_M, k_hashes=_K
    )
    missing = direct.join(both, ["j", "b"], "anti").count()
    assert missing == 0
    # and the AND is genuinely a subset of either side
    assert both.join(a, ["j", "b"], "anti").count() == 0
    assert both.join(b, ["j", "b"], "anti").count() == 0


def test_probe_never_misses_shared_keys(spark):
    """Every key present in BOTH builds probes 1 through the ANDed
    sketch (no false negatives); keys in only one side are NOT
    guaranteed 0 (false positives allowed) but the audit holds."""
    a = bloom_sketch(_keys(spark, 0, 600), "k", m_bits=_M, k_hashes=_K)
    b = bloom_sketch(_keys(spark, 400, 1000), "k", m_bits=_M, k_hashes=_K)
    both = bloom_intersect(a, b)
    probes = _keys(spark, 0, 1200)
    got = bloom_probe(both, probes, "k", m_bits=_M, k_hashes=_K)
    shared_missed = got.filter(
        (F.col("k") >= 400) & (F.col("k") < 600)
        & (F.col("maybe_present") == 0)
    ).count()
    assert shared_missed == 0
    # sanity: the screen actually screens — most non-shared probes read 0
    fp = got.filter(
        ((F.col("k") < 400) | (F.col("k") >= 600))
        & (F.col("maybe_present") == 1)
    ).count()
    assert fp < 200  # 1000 non-shared probes; FPR far below 20%


def test_grouped_and_is_per_group(spark):
    """Groups AND independently: a group present in only one input has
    an EMPTY intersection (no all-input rows), and shared groups AND
    their own bits only."""
    a_rows = spark.createDataFrame(
        [("x", i) for i in range(300)] + [("y", i) for i in range(300)],
        "g string, k long",
    )
    b_rows = spark.createDataFrame(
        [("x", i) for i in range(200, 500)],
        "g string, k long",
    )
    a = bloom_sketch(a_rows, "k", m_bits=_M, k_hashes=_K, group_cols=("g",))
    b = bloom_sketch(b_rows, "k", m_bits=_M, k_hashes=_K, group_cols=("g",))
    both = bloom_intersect(a, b, group_cols=("g",))
    assert both.filter(F.col("g") == "y").count() == 0
    direct_x = bloom_sketch(
        spark.createDataFrame(
            [("x", i) for i in range(200, 300)], "g string, k long"
        ),
        "k", m_bits=_M, k_hashes=_K, group_cols=("g",),
    )
    assert direct_x.join(both, ["g", "j", "b"], "anti").count() == 0


def test_shard_duplicate_rows_do_not_fake_hits(spark):
    """A naively-unioned shard sketch carries duplicate (j, b) rows —
    the per-input distinct must keep them from counting as two
    inputs."""
    a = bloom_sketch(_keys(spark, 0, 300), "k", m_bits=_M, k_hashes=_K)
    a_dup = a.unionByName(a)  # shard union, same bits twice
    b = bloom_sketch(_keys(spark, 1000, 1300), "k", m_bits=_M, k_hashes=_K)
    both = bloom_intersect(a_dup, b)
    # disjoint key ranges: the AND keeps only cell-collision bits,
    # and a_dup's duplicates must not resurrect a-only bits
    only_a = a.join(b, ["j", "b"], "anti")
    assert both.join(only_a, ["j", "b"], "semi").count() == 0


def test_validation(spark):
    a = bloom_sketch(_keys(spark, 0, 10), "k", m_bits=_M, k_hashes=_K)
    with pytest.raises(ValueError, match="at least two"):
        bloom_intersect(a)
    with pytest.raises(ValueError, match="lacks columns"):
        bloom_intersect(a, a.drop("set"))


def test_geometry_stamp_mismatch_raises(spark):
    """ADVICE r17 #4 — THE bloom_intersect failure mode: two
    same-SHAPED sketches built at different widths AND to a
    meaningless near-empty bit table with no error. The r18 geometry
    stamp (`bloom.BLOOM_GEO_KEYS`) catches it exactly and eagerly;
    stripped stamps (hand-built state) revert to the caller's
    contract, the family convention."""
    a = bloom_sketch(_keys(spark, 0, 600), "k", m_bits=_M, k_hashes=_K)
    b_wrong = bloom_sketch(
        _keys(spark, 400, 1000), "k", m_bits=_M // 2, k_hashes=_K
    )
    with pytest.raises(ValueError, match="different geometries"):
        bloom_intersect(a, b_wrong)
    # k_hashes mismatch at equal m_bits is the same silent class
    b_wrong_k = bloom_sketch(
        _keys(spark, 400, 1000), "k", m_bits=_M, k_hashes=2
    )
    with pytest.raises(ValueError, match="different geometries"):
        bloom_intersect(a, b_wrong_k)
    # stripped stamps: accepted (the caller's contract — hand-built
    # state keeps working, the test_hand_built convention)
    out = bloom_intersect(
        a.withMetadata("set", {}), b_wrong.withMetadata("set", {})
    )
    assert sorted(out.columns) == ["b", "j", "set"]


def test_intersect_output_carries_the_stamp(spark):
    """The AND's output is itself a same-geometry sketch — the stamp
    rides it so the downstream probe stays validated: probing the
    intersected table at a different geometry raises."""
    a = bloom_sketch(_keys(spark, 0, 600), "k", m_bits=_M, k_hashes=_K)
    b = bloom_sketch(_keys(spark, 400, 1000), "k", m_bits=_M, k_hashes=_K)
    both = bloom_intersect(a, b)
    with pytest.raises(ValueError, match="does not match the supplied"):
        bloom_probe(both, _keys(spark, 0, 10), "k",
                    m_bits=_M // 2, k_hashes=_K)
    ok = bloom_probe(both, _keys(spark, 0, 10), "k",
                     m_bits=_M, k_hashes=_K)
    assert ok.count() == 10
