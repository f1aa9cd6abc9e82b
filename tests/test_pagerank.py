"""PageRank invariants: equivalence with an independent pure-Python
power iteration (same dangling-mass-dropped variant, same decimal
quantization), bit-exact partition invariance, and the textbook sanity
case (a hub pointed at by everyone outranks everything)."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _python_pagerank(n, edges, damping=0.85, n_iter=10):
    """Independent reference: contributions quantized onto the 1e-12
    integer grid — round half-away-from-zero of the IEEE double
    (rank/deg)·1e12, matching Spark's round() and DuckDB's — summed as
    exact integers, mirroring the operator's determinism discipline.
    (Python's builtin round() is banker's — HALF_EVEN — so the
    reference rounds via Decimal HALF_UP on the exact double value.)"""
    ranks = {i: 1.0 / n for i in range(n)}
    outdeg: dict[int, int] = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    one = Decimal(1)
    for _ in range(n_iter):
        incoming = {i: 0 for i in range(n)}
        for s, d in edges:
            x = ranks[s] / outdeg[s] * 1e12
            incoming[d] += int(Decimal(x).quantize(one, ROUND_HALF_UP))
        ranks = {
            i: (1.0 - damping) / n + damping * (float(incoming[i]) / 1e12)
            for i in range(n)
        }
    return ranks


SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@SET
@given(
    n=st.integers(min_value=2, max_value=12),
    edge_seed=st.integers(min_value=0, max_value=10_000),
    parts=st.integers(min_value=1, max_value=5),
)
def test_pagerank_matches_reference_and_partitioning(spark, n, edge_seed, parts):
    import random

    from food_panda_etl_spark.operators.pagerank import pagerank

    rng = random.Random(edge_seed)
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(2 * n)]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long").repartition(parts)
    got = {
        r["id"]: r["rank"].hex()
        for r in pagerank(nodes, edf, n_iter=4).collect()
    }
    want = {
        i: v.hex() for i, v in _python_pagerank(n, edges, n_iter=4).items()
    }
    assert got == want


def test_pagerank_hub_outranks(spark):
    """Star graph: every spoke points at the hub; the hub must outrank
    every spoke, spokes (symmetric) must tie bit-exactly."""
    from food_panda_etl_spark.operators.pagerank import pagerank

    n = 6
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edges = spark.createDataFrame(
        [(i, 0) for i in range(1, n)], "src long, dst long"
    )
    ranks = {r["id"]: r["rank"] for r in pagerank(nodes, edges).collect()}
    assert all(ranks[0] > ranks[i] for i in range(1, n))
    assert len({ranks[i] for i in range(1, n)}) == 1
