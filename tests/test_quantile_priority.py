"""r10 build-ahead operators: exact rank-quantile bucketing and
sequential Poisson (priority) sampling — reference equality under any
partitioning, bucket-balance and inclusion-monotonicity invariants,
validation. The r10 declared-query oracle forms are the naive
window/ORDER BY replays these tests pin."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


SET = settings(max_examples=5, deadline=None,
               suppress_health_check=[HealthCheck.function_scoped_fixture])


@SET
@given(
    scores=st.lists(st.integers(min_value=-50, max_value=50),
                    min_size=1, max_size=60),
    b=st.integers(min_value=1, max_value=7),
    parts=st.integers(min_value=1, max_value=5),
)
def test_buckets_equal_reference_and_balance(spark, scores, b, parts):
    from food_panda_etl_spark.operators.quantile_bucket import (
        rank_quantile_buckets,
    )

    rows = [(i, s) for i, s in enumerate(scores)]
    df = spark.createDataFrame(rows, "doc_id long, score long").repartition(
        parts
    )
    got = {
        r["doc_id"]: r["bucket"]
        for r in rank_quantile_buckets(
            df, "score", b, tiebreak_cols=("doc_id",)
        ).collect()
    }
    # reference: exact empirical quantile of the (score, id) total order
    n = len(rows)
    order = sorted(rows, key=lambda r: (r[1], r[0]))
    want = {doc: (pos * b) // n for pos, (doc, _s) in enumerate(order)}
    assert got == want
    # balance: bucket sizes differ by at most 1; ids within range(b);
    # all b buckets are populated whenever n >= b
    sizes: dict = {}
    for v in got.values():
        sizes[v] = sizes.get(v, 0) + 1
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert set(got.values()) <= set(range(b))
    if n >= b:
        assert set(sizes) == set(range(b))


def test_buckets_exact_quarters_at_5k(spark):
    """Regression for the r10 sf0.1 sweep catch: at 5,000 rows the
    operator's old `ranked.localCheckpoint(eager=False)` corrupted the
    two-phase ranks (duplicates + max > N — checkpointing a
    global_row_number OUTPUT breaks the exchange-reuse consistency its
    offsets rely on; see operators/order.py), which showed up as
    off-quarter bucket sizes (1274/1221/1248/1257 instead of 1250×4).
    Any correct rank permutation gives EXACT equal quarters, so this
    asserts the strongest invariant at the size that reproduced it."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.quantile_bucket import (
        rank_quantile_buckets,
    )

    n = 5000
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.pmod(F.xxhash64("id"), F.lit(100000)).alias("score"),
    ).repartition(8)
    out = rank_quantile_buckets(df, "score", 4, tiebreak_cols=("doc_id",))
    sizes = {
        r["bucket"]: r["c"]
        for r in out.groupBy("bucket").agg(F.count("*").alias("c")).collect()
    }
    assert sizes == {0: n // 4, 1: n // 4, 2: n // 4, 3: n // 4}
    # cross-ACTION consistency: the original corruption assigned a row
    # DIFFERENT buckets in different actions over the same DataFrame
    # (each action re-drew range boundaries); post-pin, two collects
    # must agree row for row, and agree with the brute-force rank
    a1 = {r["doc_id"]: r["bucket"] for r in out.collect()}
    a2 = {r["doc_id"]: r["bucket"] for r in out.collect()}
    assert a1 == a2
    ordered = sorted(
        ((r["score"], r["doc_id"]) for r in df.collect())
    )
    brute = {
        did: (rank * 4) // n for rank, (_, did) in enumerate(ordered)
    }
    assert a1 == brute


def test_buckets_validate(spark):
    from food_panda_etl_spark.operators.quantile_bucket import (
        rank_quantile_buckets,
    )

    df = spark.createDataFrame([(0, 1)], "doc_id long, score long")
    with pytest.raises(ValueError, match="n_buckets"):
        rank_quantile_buckets(df, "score", 0, tiebreak_cols=("doc_id",))
    with pytest.raises(ValueError, match="total"):
        rank_quantile_buckets(df, "score", 2, tiebreak_cols=())


@SET
@given(
    weights=st.lists(st.integers(min_value=0, max_value=100),
                     min_size=1, max_size=60),
    k=st.integers(min_value=1, max_value=10),
    parts=st.integers(min_value=1, max_value=5),
)
def test_priority_sample_equals_reference(spark, weights, k, parts):
    from food_panda_etl_spark.operators.sampling_priority import (
        priority_sample,
    )

    rows = [(i, w) for i, w in enumerate(weights)]
    df = spark.createDataFrame(rows, "doc_id long, w long").repartition(parts)
    got = [r["doc_id"] for r in priority_sample(df, "w", k=k).collect()]
    # independent reference: the samplers' shared hash, same priority
    # order (h/w asc, id tiebreak), zero weights excluded
    pos = [(((i * 1315423911) % 1000003) / w, i) for i, w in rows if w > 0]
    want = [i for _p, i in sorted(pos)[:k]]
    assert got == want  # order included — priority ascending
    assert len(got) == min(k, len(pos))


def test_priority_sample_prefers_heavy_rows(spark):
    """Inclusion monotonicity, demonstrated not proven: with ~200 rows
    where a tenth are 100x heavier, the heavy tenth must be strongly
    over-represented in a k=40 sample (under proportional-to-size they
    get ~92% of the mass; uniform would give them ~10%)."""
    from food_panda_etl_spark.operators.sampling_priority import (
        priority_sample,
    )

    rows = [(i, 1000 if i % 10 == 0 else 10) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = priority_sample(df, "w", k=40).collect()
    heavy = sum(1 for r in got if r["doc_id"] % 10 == 0)
    assert heavy >= 15  # 20 heavy rows exist; uniform expectation is 4


def test_priority_sample_validates_and_skips_zero(spark):
    from food_panda_etl_spark.operators.sampling_priority import (
        priority_sample,
    )

    df = spark.createDataFrame([(0, 0), (1, 5)], "doc_id long, w long")
    got = priority_sample(df, "w", k=5).collect()
    assert [r["doc_id"] for r in got] == [1]
    with pytest.raises(ValueError, match="k must be"):
        priority_sample(df, "w", k=0)
    neg = spark.createDataFrame([(0, -1)], "doc_id long, w long")
    with pytest.raises(Exception, match="non-negative non-NULL"):
        priority_sample(neg, "w", k=1).collect()
