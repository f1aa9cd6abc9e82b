"""Distributed k-means: Lloyd-descent invariants and plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.kmeans import (
    assign_cells,
    inertia,
    kmeans_fit,
)
from food_panda_etl_spark.tables import load_table


def test_inertia_monotonically_decreases(spark, sf_dir):
    """Each Lloyd round must not increase the sum of squared distances —
    the textbook descent property, on the real fixture."""
    e = load_table(spark, sf_dir, "embeddings")
    prev = None
    for iters in (0, 1, 2, 3):
        cents = (
            kmeans_fit(e, k=8, iters=iters)
            if iters
            else [[float(x) for x in r[0]] for r in
                  e.orderBy("vec_id").limit(8).select("embedding").collect()]
        )
        cur = inertia(e, cents)
        if prev is not None:
            assert cur <= prev + 1e-9, (iters, cur, prev)
        prev = cur


def test_every_cell_keeps_members_on_fixture(spark, sf_dir):
    """The min-id init must not strand an empty cluster on the fixtures
    (the empty-cell carry branch exists for adversarial inputs; the
    declared oracle relies on it never firing here)."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, iters=3)
    n = assign_cells(e, cents).select("cell").distinct().count()
    assert n == 8


def test_empty_cell_carry_forward_matches_oracle(spark, out_dir):
    """ADVICE r4: the empty-cell guard must be ORACLE-VERIFIABLE, not a
    silently-unoracled branch. Adversarial fixture: vec 1 duplicates
    vec 0, so init cell 1's centroid ties cell 0's everywhere and the
    (dist, cell)-min tie-break starves cell 1 of members in round 1 —
    the carry-forward branch fires. The DuckDB replay (which now
    left-joins each round's means onto the previous centroid table) must
    still hash-match bit-for-bit, carried-forward cells included."""
    import os

    from food_panda_etl_spark.operators.kmeans import kmeans_centroids_df
    from food_panda_etl_spark.queries.clustering import _kmeans_oracle
    from tests.oracle_compare import compare

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),  # duplicate of vec 0 → cell 1 empties in round 1
        (2, [10.0, 0.0]),
        (3, [0.1, 0.2]),
        (4, [9.8, 0.3]),
        (5, [0.2, -0.1]),
        (6, [10.2, -0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    df.write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))

    got = kmeans_centroids_df(df, k=3, iters=2)
    # cell 1 must appear (carried forward), proving the guard branch ran
    assert got.filter(F.col("cell") == 1).count() == 2  # dim 0 and 1
    problems = compare(got, _kmeans_oracle(3, 2), out_dir)
    assert not problems, problems


def test_fewer_than_k_vectors_raises(spark):
    df = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="fewer than k"):
        kmeans_fit(df, k=8, iters=1)


def test_hof_assignment_matches_unrolled_reference(spark, sf_dir):
    """The r19 optimization rebuilt assign_cells as one lambda over a
    k×dim literal matrix (see its docstring). Assignment must be
    BIT-IDENTICAL to the pre-r19 unrolled form — k separate _dist_sq
    folds argmin'd via F.least over (dist, cell) structs — including
    the smaller-cell-id tie-break (this is what keeps q_kmeans /
    q_semantic_dedup / IVF cell routing, and therefore their oracle
    hashes, unchanged)."""
    from food_panda_etl_spark.operators.kmeans import _dist_sq

    e = load_table(spark, sf_dir, "embeddings")
    cents = [[float(x) for x in r[0]] for r in
             e.orderBy("vec_id").limit(8).select("embedding").collect()]
    # duplicate centroid 0 as centroid 7: forces exact distance ties so
    # the tie-break path is exercised, not just measure-zero-avoided
    cents[7] = list(cents[0])
    ref_best = F.least(
        *[
            F.struct(
                _dist_sq(F.col("embedding"), c).alias("d"),
                F.lit(i).cast("int").alias("c"),
            )
            for i, c in enumerate(cents)
        ]
    )
    ref = (
        e.withColumn("cell", ref_best["c"])
        .select("vec_id", "cell")
        .collect()
    )
    got = assign_cells(e, cents).select("vec_id", "cell").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, ref))


def test_one_round_is_projection_plus_single_exchange(spark, sf_dir):
    """Scale gate: assignment compiles to a row expression (no join
    node of any kind) and the centroid update is ONE hash-aggregate
    exchange — the whole round's plan."""
    from food_panda_etl_spark.plans.lint import plan_summary

    e = load_table(spark, sf_dir, "embeddings")
    cents = [[float(x) for x in r[0]] for r in
             e.orderBy("vec_id").limit(8).select("embedding").collect()]
    one_round = (
        assign_cells(e, cents)
        .select("cell", F.posexplode("embedding").alias("dim", "v"))
        .groupBy("cell", "dim")
        .agg(
            (
                F.sum(F.col("v").cast("double").cast("decimal(18,9)")).cast("double")
                / F.count("*").cast("double")
            ).alias("c")
        )
    )
    s = plan_summary(one_round)
    assert s.exchanges == 1, s
    assert (
        s.broadcast_joins == s.sort_merge_joins == s.nested_loop_joins
        == s.cartesian_products == 0
    )


def test_ivf_refined_centroids_still_clear_recall_floor(spark, sf_dir):
    """ivf_topk(refine_iters=2) — sampled centroids tightened by two
    Lloyd rounds — must actually move the centroids and keep recall at or
    above the q_ivf_gate floor (0.25). On the isotropic fixture the
    refinement balances cell sizes rather than reliably raising
    recall@nprobe (no cluster structure to find); clustered real corpora
    are where it pays."""
    from food_panda_etl_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
    )

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = {(r["qid"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=10).collect()}
    plain = {(r["qid"], r["neighbor_id"]) for r in ivf_topk(e, q, k=10).collect()}
    refined = {
        (r["qid"], r["neighbor_id"])
        for r in ivf_topk(e, q, k=10, refine_iters=2).collect()
    }
    assert refined != plain or len(refined) == 0  # refinement changed the cells
    assert len(exact & refined) / len(exact) >= 0.25


def test_cell_neardup_pairs_subset_and_colocated(spark, sf_dir):
    """SemDeDup pair semantics: (a) every within-cell pair is also an
    exact all-pairs cosine pair at the same threshold (same scoring
    fold), (b) both endpoints of every emitted pair share a k-means
    cell, and (c) the within-cell set is exactly the all-pairs set
    restricted to co-located endpoints — missed pairs are precisely the
    cross-cell ones (the documented SemDeDup approximation)."""
    from food_panda_etl_spark.operators.similarity import (
        cell_neardup_pairs,
        cosine_neardup_pairs,
    )

    e = load_table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(e, k=8, iters=2)
    within = {
        (r["id_a"], r["id_b"])
        for r in cell_neardup_pairs(e, cents, threshold=0.4).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in cosine_neardup_pairs(e, threshold=0.4).collect()
    }
    cell_of = {
        r["vec_id"]: r["cell"] for r in assign_cells(e, cents).select("vec_id", "cell").collect()
    }
    assert within, "vacuous fixture: no within-cell pairs at threshold 0.4"
    assert within <= exact
    assert all(cell_of[a] == cell_of[b] for a, b in within)
    colocated_exact = {(a, b) for a, b in exact if cell_of[a] == cell_of[b]}
    assert within == colocated_exact


def test_arrow_assignment_matches_fold(spark, sf_dir):
    """The production matmul assignment must agree with the oracle-exact
    literal-fold projection on the fixture (no distance ties on
    real-valued data), at both small and SemDeDup-scale k."""
    from food_panda_etl_spark.operators.kmeans import assign_cells_arrow

    e = load_table(spark, sf_dir, "embeddings")
    for k in (8, 64):
        cents = [
            [float(x) for x in r[0]]
            for r in e.orderBy("vec_id").limit(k).select("embedding").collect()
        ]
        fold = {r["vec_id"]: r["cell"] for r in assign_cells(e, cents).collect()}
        arrow = {
            r["vec_id"]: r["cell"] for r in assign_cells_arrow(e, cents).collect()
        }
        assert fold == arrow
