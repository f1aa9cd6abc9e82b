"""overlap_join (operators/overlap_join.py): completeness vs the
brute-force inverted-index join (the theorem the r14 declared oracle
re-proves through the driver), PINNED pruning volume (the
prefix_candidates lesson — completeness holds under ANY order, only
candidate counts see destroyed pruning), and the guards."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.operators.overlap_join import (
    overlap_candidates,
    overlap_join,
)
from food_panda_etl_spark.tables import load_table


def _brute_force(sh, c):
    a = sh.select(F.col("doc").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc").alias("doc_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").cast("bigint").alias("overlap"))
        .filter(F.col("overlap") >= c)
    )


@pytest.mark.parametrize("c", [10, 20, 40])
def test_completeness_matches_brute_force(spark, sf_dir, c):
    d = load_table(spark, sf_dir, "documents")
    sh = shingle_table(d, "doc_id", "text", 5).localCheckpoint(eager=False)
    got = sorted(
        (r.doc_a, r.doc_b, r.overlap)
        for r in overlap_join(d, "doc_id", "text", 5, c).collect()
    )
    want = sorted(
        (r.doc_a, r.doc_b, r.overlap) for r in _brute_force(sh, c).collect()
    )
    assert got == want and (c > 40 or got)  # non-vacuous at c ≤ 40


def test_candidate_volume_is_pruned(spark, sf_dir):
    """The point of the prefix: candidates must be a small fraction of
    the brute-force co-occurring pair count, and pinned so a regression
    that silently destroys pruning (df DESC, widened prefix) fails here
    rather than nowhere."""
    d = load_table(spark, sf_dir, "documents")
    sh = shingle_table(d, "doc_id", "text", 5).localCheckpoint(eager=False)
    cand = overlap_candidates(sh, 20).count()
    cooc = (
        sh.select(F.col("doc").alias("doc_a"), "shingle")
        .join(sh.select(F.col("doc").alias("doc_b"), "shingle"), "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
        .count()
    )
    true_pairs = _brute_force(sh, 20).count()
    # every true pair is a candidate; candidates ≤ 70% of co-occurring
    # pairs (measured: cand == true_pairs == 23 vs 36 co-occurring at
    # sf0.001 — PERFECT pruning at c=20; the 0.7 factor leaves room for
    # fixture drift, not for a destroyed prefix)
    assert true_pairs <= cand <= max(int(cooc * 0.7), true_pairs)
    assert cand < cooc


def test_synthetic_known_overlaps(spark):
    # doc 1 and 2 share exactly 6 5-grams ("w0 .. w9" sliding windows
    # over a shared 10-token run); doc 3 is disjoint
    shared = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, shared + " a1 a2 a3"),
        (2, shared + " b1 b2 b3"),
        (3, " ".join(f"z{i}" for i in range(12))),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b): r.overlap
        for r in overlap_join(d, "doc_id", "text", 5, 6).collect()
    }
    assert got == {(1, 2): 6}
    assert overlap_join(d, "doc_id", "text", 5, 7).count() == 0


def test_min_overlap_one_equals_cooccurrence(spark):
    rows = [(1, "a b c d e f"), (2, "b c d e f g"), (3, "x y z q r s")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    # c=1: prefix is the whole doc, candidates == co-occurring pairs
    assert overlap_join(d, "doc_id", "text", 5, 1).count() == 1


def test_short_docs_never_reach_threshold(spark):
    # a 6-token doc has 2 5-gram shingles: with c=3 it cannot qualify
    # and must not crash the n_sh ≥ c prefix filter
    rows = [(1, "a b c d e f"), (2, "a b c d e f")]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert overlap_join(d, "doc_id", "text", 5, 3).count() == 0
    assert overlap_join(d, "doc_id", "text", 5, 2).count() == 1


def test_guards(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="min_overlap >= 1"):
        overlap_join(d, "doc_id", "text", 5, 0)
    sh = shingle_table(d, "doc_id", "text", 5)
    with pytest.raises(ValueError, match="min_overlap >= 1"):
        overlap_candidates(sh, -2)


def test_plan_has_no_global_window(spark, sf_dir):
    """The canonical ranking must stay a doc-partitioned window (never
    a global sort): every windowspecdefinition in the optimized plan
    leads with a partition column (the test_plan_quality shape — a
    global window's first argument is an ORDER field carrying
    ASC/DESC)."""
    import re

    d = load_table(spark, sf_dir, "documents")
    plan = overlap_join(d, "doc_id", "text", 5, 20)._jdf.queryExecution().optimizedPlan().toString()
    specs = re.findall(r"windowspecdefinition\(([^,]*)", plan)
    assert specs, "expected the per-doc rank window in the plan"
    for spec in specs:
        assert " ASC" not in spec and " DESC" not in spec, (
            f"partition-less window: windowspecdefinition({spec}, ..."
        )
