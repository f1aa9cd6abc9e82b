"""k-core peeling: equality with an independent Python reference under
any partitioning (hypothesis over random graphs), the fixpoint and
cascade hand cases, and validation."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


def _ref_peel(pairs: set, k: int, rounds: int) -> dict:
    """Independent synchronous peel on undirected pairs (a, b), a != b:
    returns {node: degree} of the surviving edge set."""
    edges = {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}
    for _ in range(rounds):
        deg: dict = {}
        for a, _b in edges:
            deg[a] = deg.get(a, 0) + 1
        alive = {n for n, d in deg.items() if d >= k}
        edges = {(a, b) for a, b in edges if a in alive and b in alive}
    out: dict = {}
    for a, _b in edges:
        out[a] = out.get(a, 0) + 1
    return out


def _spark_peel(spark, pairs, k, rounds, parts):
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.kcore import kcore_peel

    e = spark.createDataFrame(sorted(pairs), "sa long, sb long").repartition(
        parts
    )
    edges = e.select(
        F.col("sa").alias("src"), F.col("sb").alias("dst")
    ).unionAll(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
    return {
        r["src"]: r["deg"]
        for r in kcore_peel(edges, k=k, n_rounds=rounds).collect()
    }


@SET
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).map(
            lambda t: (min(t), max(t))
        ).filter(lambda t: t[0] != t[1]),
        min_size=1, max_size=40,
    ),
    k=st.integers(min_value=1, max_value=5),
    parts=st.integers(min_value=1, max_value=5),
)
def test_kcore_equals_reference(spark, pairs, k, parts):
    assert _spark_peel(spark, pairs, k, 3, parts) == _ref_peel(pairs, k, 3)


def test_kcore_clique_is_fixpoint_and_tail_cascades(spark):
    """A 5-clique with a pendant path: at k=2 the path peels one node
    per round (the cascade the round replay must capture) while the
    clique is a fixpoint — extra rounds change nothing."""
    clique = {(a, b) for a in range(5) for b in range(a + 1, 5)}
    path = {(4, 10), (10, 11), (11, 12)}
    pairs = clique | path
    # after 3 rounds at k=2 the path has peeled back to the clique
    got3 = _spark_peel(spark, pairs, 2, 3, 3)
    assert got3 == {n: 4 for n in range(5)}
    # fixpoint: more rounds are a no-op
    assert _spark_peel(spark, pairs, 2, 5, 3) == got3
    # mid-cascade snapshot: after ONE round only the path tip is gone
    assert _ref_peel(pairs, 2, 1) == _spark_peel(spark, pairs, 2, 1, 3)


def test_kcore_empties_below_threshold(spark):
    """k above every degree empties the graph — legal, not an error
    (the q_kcore sf0.001 regime)."""
    pairs = {(0, 1), (1, 2)}
    assert _spark_peel(spark, pairs, 5, 2, 2) == {}


def test_kcore_validates(spark):
    from food_panda_etl_spark.operators.kcore import (
        degree_scaled_k,
        kcore_peel,
    )

    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="k must be"):
        kcore_peel(df, k=0, n_rounds=1)
    with pytest.raises(ValueError, match="n_rounds"):
        kcore_peel(df, k=1, n_rounds=0)
    with pytest.raises(ValueError, match="num/den"):
        degree_scaled_k(df, num=0)


def test_kcore_scaled_k_on_empty_graph(spark):
    """degree_scaled_k on an EMPTY edge table must yield k=1 (and the
    tuple-k peel an empty result), not an ANSI divide-by-zero abort —
    degenerate inputs are legal (review-caught; the tick_count
    zero-mass convention)."""
    from food_panda_etl_spark.operators.kcore import (
        degree_scaled_k,
        kcore_peel,
    )

    empty = spark.createDataFrame([], "src long, dst long")
    assert degree_scaled_k(empty).collect()[0]["__k"] == 1
    assert kcore_peel(empty, k=(3, 4), n_rounds=2).count() == 0


def _scaled_k_ref(pairs: set, num: int = 3, den: int = 4) -> int:
    """The degree-scaled threshold, independently: num/den of mean
    degree of the symmetrized graph, integer div, floored at 1."""
    n_edges = 2 * len(pairs)
    nodes = {a for a, _ in pairs} | {b for _, b in pairs}
    return max((num * n_edges) // (den * len(nodes)), 1)


@SET
@given(
    pairs=st.sets(
        st.tuples(st.integers(0, 14), st.integers(0, 14)).map(
            lambda t: (min(t), max(t))
        ).filter(lambda t: t[0] != t[1]),
        min_size=1, max_size=40,
    ),
    parts=st.integers(min_value=1, max_value=5),
)
def test_kcore_scaled_k_equals_explicit(spark, pairs, parts):
    """The (num, den) tuple form must peel exactly like the int form
    with k computed by the same integer formula — the r10 q_kcore
    declared shape (degree_scaled_k over the pre-peel checkpoint)."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.kcore import kcore_peel

    e = spark.createDataFrame(sorted(pairs), "sa long, sb long").repartition(
        parts
    )
    edges = e.select(
        F.col("sa").alias("src"), F.col("sb").alias("dst")
    ).unionAll(e.select(F.col("sb").alias("src"), F.col("sa").alias("dst")))
    got = {
        r["src"]: r["deg"]
        for r in kcore_peel(edges, k=(3, 4), n_rounds=3).collect()
    }
    k = _scaled_k_ref(pairs)
    assert got == _ref_peel(pairs, k, 3)
