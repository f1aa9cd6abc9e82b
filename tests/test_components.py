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


def test_one_action_per_round_beats_eager_checkpoint(spark):
    """The CC loop's lazy checkpoint + convergence aggregate must launch
    strictly fewer Spark jobs than the eager-checkpoint-then-aggregate
    shape it replaced (one data scan per round, not two). Job counts are
    AQE-noisy, so the assertion is relative — same fixture, same session,
    reference variant inlined with eager=True."""
    from pyspark.sql import functions as F

    sc = spark.sparkContext
    nodes = spark.createDataFrame([(i,) for i in range(10)], "id bigint")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 8)],
        "doc_a bigint, doc_b bigint",
    )

    def eager_reference():
        sym = (
            edges.select(F.col("doc_a").alias("s"), F.col("doc_b").alias("d"))
            .unionAll(
                edges.select(F.col("doc_b").alias("s"), F.col("doc_a").alias("d"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = nodes.select("id", F.col("id").alias("comp")).localCheckpoint(
            eager=True
        )
        prev = labels.agg(F.sum("comp")).collect()[0][0]
        for _ in range(25):
            nbr = (
                sym.join(labels, sym["d"] == labels["id"])
                .groupBy("s")
                .agg(F.min("comp").alias("nbr_comp"))
            )
            labels = (
                labels.join(nbr, labels["id"] == nbr["s"], "left")
                .select(
                    "id",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                    ).alias("comp"),
                )
                .localCheckpoint(eager=True)
            )
            cur = labels.agg(F.sum("comp")).collect()[0][0]
            if cur == prev:
                return labels
            prev = cur

    sc.setJobGroup("cc_eager_ref", "cc_eager_ref")
    ref = {r["id"]: r["comp"] for r in eager_reference().collect()}
    sc.setJobGroup("cc_lazy", "cc_lazy")
    got = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges, src_col="doc_a", dst_col="doc_b").collect()
    }
    sc.setJobGroup("cc_done", "cc_done")
    assert got == ref
    n_eager = len(sc.statusTracker().getJobIdsForGroup("cc_eager_ref"))
    n_lazy = len(sc.statusTracker().getJobIdsForGroup("cc_lazy"))
    assert n_lazy < n_eager, (n_lazy, n_eager)


def _star(spark, n, es, **kw):
    from food_panda_etl_spark.operators.components import connected_components_star

    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = (
        spark.createDataFrame(es, "src bigint, dst bigint")
        if es
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    return {
        r["id"]: r["component"]
        for r in connected_components_star(nodes, edges, **kw).collect()
    }


@pytest.mark.parametrize(
    "n,es",
    [
        (10, [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 8)]),
        (5, [(4, 3), (3, 4), (0, 4), (4, 0), (0, 4)]),  # dups + orientation
        (8, [(7, i) for i in range(7)]),  # pre-existing star, max root
        (6, []),  # all singletons
    ],
)
def test_star_equals_propagation(spark, n, es):
    """large-star/small-star must reach the identical fixpoint as
    min-label propagation (same min-id component labels)."""
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = (
        spark.createDataFrame(es, "src bigint, dst bigint")
        if es
        else spark.createDataFrame([], "src bigint, dst bigint")
    )
    prop = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert _star(spark, n, es) == prop


def test_star_equals_propagation_random(spark):
    import random

    rng = random.Random(3)
    n, es = 200, [(rng.randrange(200), rng.randrange(200)) for _ in range(150)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = spark.createDataFrame(es, "src bigint, dst bigint")
    prop = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    assert _star(spark, n, es) == prop


def test_star_handles_deep_chain_beyond_propagation_budget(spark):
    """The reason the variant exists: a 256-node path has diameter 255 —
    min-label propagation moves the label ONE hop per round and blows its
    25-round budget, while star contraction re-points whole neighborhoods
    and converges in ~log D alternations within its default budget."""
    es = [(i, i + 1) for i in range(255)]
    with pytest.raises(RuntimeError, match="did not converge"):
        _cc(spark, range(256), es)  # default max_iter=25
    got = _star(spark, 256, es)
    assert set(got.values()) == {0} and len(got) == 256
