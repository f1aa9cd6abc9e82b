"""connected_components / dedup_keep_representative (operators/components)."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.components import (
    connected_components,
    dedup_keep_representative,
)


def _cc(spark, node_ids, edge_pairs, **kw):
    nodes = spark.createDataFrame([(i,) for i in node_ids], "id bigint")
    edges = spark.createDataFrame(
        [(a, b) for a, b in edge_pairs], "src bigint, dst bigint"
    )
    out = connected_components(nodes, edges, **kw)
    return {r["id"]: r["component"] for r in out.collect()}


def test_two_clusters_and_singleton(spark):
    got = _cc(spark, range(7), [(1, 2), (2, 3), (5, 6), (3, 1)])
    assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 6 - 1}


def test_chain_needs_diameter_rounds(spark):
    # a 12-node path: the min label must walk 11 hops — exercises the
    # multi-round fixpoint, not just one propagation step
    got = _cc(spark, range(12), [(i, i + 1) for i in range(11)])
    assert set(got.values()) == {0}


def test_edge_orientation_and_duplicates_irrelevant(spark):
    a = _cc(spark, range(5), [(4, 3), (3, 4), (0, 4), (4, 0), (0, 4)])
    assert a == {0: 0, 3: 0, 4: 0, 1: 1, 2: 2}


def test_non_convergence_raises(spark):
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, range(12), [(i, i + 1) for i in range(11)], max_iter=3)


def test_keep_representative(spark):
    docs = spark.createDataFrame(
        [(i, f"text{i}") for i in range(6)], "doc_id bigint, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5)], "doc_a bigint, doc_b bigint"
    )
    kept = {
        r["doc_id"]: r["cluster_size"]
        for r in dedup_keep_representative(docs, pairs).collect()
    }
    # cluster {1,2,5} → rep 1 with size 3; singletons keep themselves
    assert kept == {0: 1, 1: 3, 3: 1, 4: 1}
