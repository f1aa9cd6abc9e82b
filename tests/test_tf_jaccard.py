"""Exact TF-normalized weighted Jaccard join (operators/tf_jaccard.py,
r16 build-ahead for r17): completeness against the brute-force
count-join on the fixture corpus AND on random hypothesis-generated
documents (boundary mass splits included), the exact-boundary ≥
semantics, the shape-vs-length distinction the regime exists for, and
the guards."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.tf_jaccard import (
    tf_jaccard_join,
    tf_prefix_candidates,
)
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_table,
)
from food_panda_etl_spark.tables import load_table

_NUM, _DEN = 7, 10


def _brute_force(shc, num, den):
    """Reference UNFILTERED count-join — test-only (the quadratic
    shape the weighted prefixes exist to avoid)."""
    sz = shc.groupBy("doc").agg(F.sum("c").cast("bigint").alias("n"))
    return (
        shc.alias("a")
        .join(
            shc.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .join(
            sz.select(F.col("doc").alias("da"), F.col("n").alias("na")),
            F.col("a.doc") == F.col("da"),
        )
        .join(
            sz.select(F.col("doc").alias("db"), F.col("n").alias("nb")),
            F.col("b.doc") == F.col("db"),
        )
        .groupBy(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            "na",
            "nb",
        )
        .agg(
            F.sum(
                F.least(
                    F.col("a.c") * F.col("nb"), F.col("b.c") * F.col("na")
                )
            )
            .cast("bigint")
            .alias("wi_scaled")
        )
        .filter(
            F.col("wi_scaled") * (den + num)
            >= 2 * num * F.col("na") * F.col("nb")
        )
        .select("doc_a", "doc_b", "wi_scaled")
    )


def test_equals_brute_force_on_fixture(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    got = sorted(
        map(
            tuple,
            tf_jaccard_join(
                d, "doc_id", "text", n=3,
                threshold_num=_NUM, threshold_den=_DEN,
            )
            .select("doc_a", "doc_b", "wi_scaled")
            .collect(),
        )
    )
    shc = shingle_multiset_table(d, "doc_id", "text", 3)
    want = sorted(map(tuple, _brute_force(shc, _NUM, _DEN).collect()))
    assert got == want
    assert len(want) > 0  # the fixture near-dups qualify at 7/10


SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

docs_strategy = st.lists(
    st.lists(
        st.sampled_from("abcdefg"), min_size=1, max_size=12
    ),  # words from a 7-token vocabulary → heavy overlap + repetition
    min_size=2,
    max_size=10,
)


@SET
@given(
    docs=docs_strategy,
    thr=st.sampled_from([(1, 3), (1, 2), (7, 10), (9, 10), (1, 1)]),
)
def test_equals_brute_force_random_docs(spark, docs, thr):
    """Random short documents over a tiny vocabulary: repeated grams,
    identical docs (J=1), disjoint docs, and masses landing exactly on
    the prefix keep-rule boundary. Output must equal brute force for
    every threshold."""
    num, den = thr
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            tf_jaccard_join(
                d, "doc_id", "text", n=1,
                threshold_num=num, threshold_den=den,
            )
            .select("doc_a", "doc_b", "wi_scaled")
            .collect(),
        )
    )
    shc = shingle_multiset_table(d, "doc_id", "text", 1)
    want = sorted(map(tuple, _brute_force(shc, num, den).collect()))
    assert got == want


def test_boundary_pair_at_exact_threshold_is_emitted(spark):
    """A = {a, b}, B = {a, c} (unigrams): J_tf = 1/3 exactly; at
    τ = 1/3 the ≥ contract must emit the pair — the integer keep rule
    uses ≤ so the excluded suffix mass is STRICTLY below τ' and the
    boundary pair always survives the prefix stage."""
    d = spark.createDataFrame(
        [(1, "a b"), (2, "a c")], "doc_id long, text string"
    )
    rows = tf_jaccard_join(
        d, "doc_id", "text", n=1, threshold_num=1, threshold_den=3
    ).collect()
    assert [(r.doc_a, r.doc_b, r.wi_scaled) for r in rows] == [(1, 2, 2)]
    assert rows[0].tf_jaccard == pytest.approx(1.0 / 3.0)


def test_shape_not_length(spark):
    """The regime's reason to exist: a doc and its 3× repetition have
    IDENTICAL TF shape (J_tf = 1) while multiset Jaccard reads 1/3."""
    d = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c a b c a b c")],
        "doc_id long, text string",
    )
    rows = tf_jaccard_join(
        d, "doc_id", "text", n=1, threshold_num=99, threshold_den=100
    ).collect()
    assert len(rows) == 1
    assert rows[0].tf_jaccard == 1.0


def test_prefix_candidates_prune(spark, sf_dir):
    """The weighted prefixes must actually prune: candidate volume on
    the fixture corpus strictly below the all-pairs count (the
    prefix_candidates volume convention)."""
    d = load_table(spark, sf_dir, "documents")
    shc = shingle_multiset_table(d, "doc_id", "text", 3)
    n_docs = shc.select("doc").distinct().count()
    n_cand = tf_prefix_candidates(shc, _NUM, _DEN).count()
    assert n_cand < n_docs * (n_docs - 1) // 2


def test_validation():
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        tf_jaccard_join(None, "doc_id", "text", threshold_num=0)
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        tf_jaccard_join(
            None, "doc_id", "text", threshold_num=3, threshold_den=2
        )
