"""Bloom-screened decontamination (operators/decontam_bloom.py, r14
build-ahead for r15): the composite must be BIT-IDENTICAL to the
unscreened `ngram_contamination` (the Bloom's one-sided contract plus
exact verify — the screen-completeness theorem), while the screen
actually prunes (survivor volume pinned) and the fact side stays
map-only before the verify join (exchange accounting)."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import bloom_prefilter, bloom_sketch
from food_panda_etl_spark.operators.decontam_bloom import (
    bloom_screened_contamination,
)
from food_panda_etl_spark.operators.dedup import (
    ngram_contamination,
    shingle_table,
)
from food_panda_etl_spark.tables import load_table


def _split(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    return d.filter(F.col("doc_id") % 7 != 0), d.filter(F.col("doc_id") % 7 == 0)


def test_equals_unscreened_exact(spark, sf_dir):
    train, evals = _split(spark, sf_dir)
    got = bloom_screened_contamination(train, evals, "doc_id", "text", n=5)
    want = ngram_contamination(train, evals, "doc_id", "text", n=5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    assert want.count() > 0  # non-vacuous: the fixture is contaminated


def test_equals_exact_under_tiny_sketch(spark, sf_dir):
    """Shrink the sketch until false positives are guaranteed (m=64,
    k=2 over thousands of eval shingles): the exact verify must still
    remove every one of them — correctness can never depend on FPR."""
    train, evals = _split(spark, sf_dir)
    got = bloom_screened_contamination(
        train, evals, "doc_id", "text", n=5, m_bits=64, k_hashes=2
    )
    want = ngram_contamination(train, evals, "doc_id", "text", n=5)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )


def test_screen_prunes(spark, sf_dir):
    """At the default geometry the screen must actually drop the bulk
    of the uncontaminated train shingles (the scale claim: only
    contaminated mass + FP mass reaches the verify join)."""
    train, evals = _split(spark, sf_dir)
    tr = shingle_table(train, "doc_id", "text", n=5)
    ev = (
        shingle_table(evals, "doc_id", "text", n=5)
        .select("shingle")
        .distinct()
    )
    sk = bloom_sketch(
        ev.select(F.xxhash64("shingle").alias("k")), "k",
        m_bits=1 << 16, k_hashes=4,
    )
    screened = bloom_prefilter(
        sk, tr.withColumn("__k", F.xxhash64("shingle")), "__k",
        m_bits=1 << 16, k_hashes=4,
    )
    n_total = screened.count()
    n_surv = screened.filter(F.col("maybe_present") == 1).count()
    n_true = tr.join(ev, "shingle").count()
    assert n_surv >= n_true  # one-sided: never drops contamination
    assert n_surv < n_total / 2  # and actually prunes


def test_survivor_side_never_misses(spark, sf_dir):
    """Every truly-contaminated (doc, shingle) row survives the screen
    row-for-row (the no-false-negative contract at row granularity,
    stronger than the aggregate equality above)."""
    train, evals = _split(spark, sf_dir)
    tr = shingle_table(train, "doc_id", "text", n=5)
    ev = (
        shingle_table(evals, "doc_id", "text", n=5)
        .select("shingle")
        .distinct()
    )
    sk = bloom_sketch(
        ev.select(F.xxhash64("shingle").alias("k")), "k",
        m_bits=1 << 16, k_hashes=4,
    )
    screened = bloom_prefilter(
        sk, tr.withColumn("__k", F.xxhash64("shingle")), "__k",
        m_bits=1 << 16, k_hashes=4,
    )
    missed = (
        screened.join(ev, "shingle")
        .filter(F.col("maybe_present") == 0)
        .count()
    )
    assert missed == 0


def test_derived_m_bits_sizing_rule():
    """m ≈ 1.44·k·n/ln2 rounded UP to a power of two, floored at 2^16
    (the ADVICE r16 stronger variant: the default is derived from the
    eval shingle count instead of a fixed constant)."""
    from food_panda_etl_spark.operators.decontam_bloom import derived_m_bits

    from food_panda_etl_spark.operators.bloom import _validate

    # tiny evals keep the old fixture default
    assert derived_m_bits(0, 4) == 1 << 16
    assert derived_m_bits(1000, 4) == 1 << 16
    # ~18k shingles at k=4 → 1.44·4·18000/ln2 ≈ 149k → 2^18
    assert derived_m_bits(18_000, 4) == 1 << 18
    # the bench_scale regime that degraded at a fixed 2^16: millions
    # of shingles now size themselves — capped at the hash grid's
    # per-row ceiling (width ≤ 2^19 < P), where the screen saturates
    # gracefully instead of requesting an invalid geometry
    assert derived_m_bits(2_000_000, 4) == 4 * (1 << 19)
    # monotone in k
    assert derived_m_bits(100_000, 8) >= derived_m_bits(100_000, 4)
    # every k in bloom's legal range gets a geometry _validate accepts
    # (review-caught r16: a pure power of two is NOT a multiple of
    # k = 3, 5, 6, 7)
    for k in range(1, 9):
        for n in (0, 1000, 50_000, 3_000_000):
            m = derived_m_bits(n, k)
            assert _validate(m, k) == m // k
