"""Weighted (multiset) Jaccard prefix join (operators/weighted_jaccard.py,
r14 build-ahead for r15): the occurrence-expansion reduction makes the
existing prefix machinery exact for Σmin/Σmax — completeness is checked
against the brute-force count-join, pruning volume and expansion factor
are pinned directly (the prefix_candidates lesson: completeness holds
under ANY order; only volume assertions see destroyed pruning)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.prefix_join import prefix_candidates
from food_panda_etl_spark.operators.weighted_jaccard import (
    occurrence_expand,
    shingle_multiset_table,
    weighted_jaccard_join,
)
from food_panda_etl_spark.tables import load_table


def _brute_force(shc, num: int, den: int):
    """Reference Σmin/Σmax pairs straight from the count table."""
    tot = shc.groupBy("doc").agg(F.sum("c").cast("bigint").alias("nw"))
    a = shc.select(F.col("doc").alias("doc_a"), "shingle", F.col("c").alias("ca"))
    b = shc.select(F.col("doc").alias("doc_b"), "shingle", F.col("c").alias("cb"))
    wi = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum(F.least("ca", "cb")).cast("bigint").alias("wi"))
    )
    ta = tot.select(F.col("doc").alias("doc_a"), F.col("nw").alias("na"))
    tb = tot.select(F.col("doc").alias("doc_b"), F.col("nw").alias("nb"))
    return (
        wi.join(ta, "doc_a")
        .join(tb, "doc_b")
        .filter(
            F.col("wi") * den >= num * (F.col("na") + F.col("nb") - F.col("wi"))
        )
        .select("doc_a", "doc_b", "wi")
    )


@pytest.mark.parametrize("num,den", [(7, 10), (1, 2)])
def test_completeness_equals_brute_force(spark, sf_dir, num, den):
    d = load_table(spark, sf_dir, "documents")
    got = (
        weighted_jaccard_join(d, "doc_id", "text", n=3, threshold_num=num,
                              threshold_den=den)
        .select("doc_a", "doc_b", "wi")
        .collect()
    )
    shc = shingle_multiset_table(d, "doc_id", "text", n=3)
    want = _brute_force(shc, num, den).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0  # non-vacuous: the fixture has near-dup pairs


def test_multiset_is_not_degenerate(spark, sf_dir):
    """The fixture corpus carries real 3-gram repetition (c > 1), so
    the weighted semantics are exercised, not just reduced to the
    distinct case."""
    d = load_table(spark, sf_dir, "documents")
    shc = shingle_multiset_table(d, "doc_id", "text", n=3)
    assert shc.filter(F.col("c") > 1).count() > 0


def test_expansion_tracks_repetition_mass(spark, sf_dir):
    """|expanded| = Σ c  and  |expanded| − |distinct| = repeated mass
    only — the expansion must never blow up beyond the multiset size."""
    d = load_table(spark, sf_dir, "documents")
    shc = shingle_multiset_table(d, "doc_id", "text", n=3)
    n_distinct = shc.count()
    total = shc.agg(F.sum("c")).collect()[0][0]
    n_exp = occurrence_expand(shc).count()
    assert n_exp == total
    extra = shc.filter(F.col("c") > 1).agg(
        F.sum(F.col("c") - 1)
    ).collect()[0][0]
    assert n_exp - n_distinct == (extra or 0)


def test_pruning_volume(spark, sf_dir):
    """Candidates from the expanded prefix join must be well below the
    brute-force co-occurring pair count (the assertion that actually
    detects a destroyed canonical order)."""
    d = load_table(spark, sf_dir, "documents")
    shc = shingle_multiset_table(d, "doc_id", "text", n=3)
    exp = occurrence_expand(shc)
    n_cand = prefix_candidates(exp, 7, 10).count()
    a = shc.select(F.col("doc").alias("doc_a"), "shingle")
    b = shc.select(F.col("doc").alias("doc_b"), "shingle")
    n_brute = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    assert n_cand < n_brute / 10
    assert n_cand > 0


def test_threshold_validation():
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        weighted_jaccard_join(None, "doc_id", "text", threshold_num=0)
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        weighted_jaccard_join(None, "doc_id", "text", threshold_num=11,
                              threshold_den=10)


def test_short_documents_survive_the_ansi_guard(spark, sf_dir):
    """Documents shorter than n tokens must yield ZERO shingle rows
    (not a sequence(1,0)-descends crash under ANSI) — exercised through
    the shared gram builder the multiset table now rides (the r14
    distinct-collapse behavior pin was retired when the r15
    consolidation made both tables share `dedup.gram_table`)."""
    d = load_table(spark, sf_dir, "documents")
    short = d.limit(2).select(
        (F.col("doc_id") + 10**9).alias("doc_id"),
        F.lit("one two").alias("text"),
        *[F.col(c) for c in d.columns if c not in ("doc_id", "text")],
    )
    shc = shingle_multiset_table(d.unionByName(short), "doc_id", "text", n=5)
    assert shc.filter(F.col("doc") >= 10**9).count() == 0
    assert shc.count() > 0
