"""Per-group rank-quantile bucketing
(operators/quantile_bucket_group.py, r18 build-ahead for r19): exact
per-group quartiles — sizes differ by ≤ 1 within every group, the
assignment equals the flat operator applied group-by-group, NULL
scores pin NULLS FIRST cross-engine, and malformed calls are loud."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.quantile_bucket import (
    rank_quantile_buckets,
)
from food_panda_etl_spark.operators.quantile_bucket_group import (
    group_rank_quantile_buckets,
)
from food_panda_etl_spark.tables import load_table

_B = 4


def test_bucket_sizes_exact_within_every_group(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    out = group_rank_quantile_buckets(
        d, ("lang",), "n_chars", _B, ("doc_id",)
    )
    sizes = (
        out.groupBy("lang", "bucket")
        .agg(F.count("*").alias("c"))
        .groupBy("lang")
        .agg((F.max("c") - F.min("c")).alias("spread"))
        .collect()
    )
    assert sizes and all(r.spread <= 1 for r in sizes)
    assert out.filter(
        (F.col("bucket") < 0) | (F.col("bucket") >= _B)
    ).count() == 0


def test_equals_flat_operator_per_group(spark, sf_dir):
    """The group face must agree with the flat operator run on each
    group separately — same ranks, same integer arithmetic."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    langs = [r.lang for r in d.select("lang").distinct().collect()]
    out = group_rank_quantile_buckets(
        d, ("lang",), "n_chars", _B, ("doc_id",)
    )
    for lang in langs[:3]:
        got = {
            (r.doc_id, r.bucket)
            for r in out.filter(F.col("lang") == lang).collect()
        }
        want = {
            (r.doc_id, r.bucket)
            for r in rank_quantile_buckets(
                d.filter(F.col("lang") == lang),
                "n_chars",
                _B,
                ("doc_id",),
            ).collect()
        }
        assert got == want


def test_small_groups_and_null_scores(spark):
    """Groups smaller than n_buckets leave buckets empty (pure rank
    arithmetic); NULL scores rank FIRST (the cross-engine pin — DuckDB
    would default them last)."""
    df = spark.createDataFrame(
        [("a", 1, None), ("a", 2, 10), ("a", 3, 5), ("b", 4, 7)],
        "g string, id long, s long",
    )
    out = {
        (r.g, r.id): r.bucket
        for r in group_rank_quantile_buckets(
            df, ("g",), "s", _B, ("id",)
        ).collect()
    }
    # group a: order NULL(1) < 5(3) < 10(2) → ranks 1,2,3 of n=3
    assert out[("a", 1)] == 0 and out[("a", 3)] == 1 and out[("a", 2)] == 2
    # singleton group: rank 1 of 1 → bucket 0
    assert out[("b", 4)] == 0


def test_validation(spark):
    df = spark.createDataFrame([("a", 1, 2)], "g string, id long, s long")
    with pytest.raises(ValueError, match="n_buckets"):
        group_rank_quantile_buckets(df, ("g",), "s", 0, ("id",))
    with pytest.raises(ValueError, match="group_cols"):
        group_rank_quantile_buckets(df, (), "s", _B, ("id",))
    with pytest.raises(ValueError, match="tiebreak"):
        group_rank_quantile_buckets(df, ("g",), "s", _B, ())
    with pytest.raises(ValueError, match="collide"):
        group_rank_quantile_buckets(
            df.withColumnRenamed("s", "bucket"), ("g",), "bucket", _B,
            ("id",),
        )


def test_plan_is_one_exchange_one_window(spark, sf_dir):
    """The group face's engine-shape claim: ONE hash-partition
    exchange on the group columns, one sort — no second exchange, no
    broadcast rebase (the flat operator needs the two-phase global
    rank; the group face must not pay it). Spark stacks the two window
    functions as two Window nodes over the SAME partitioning (the
    count's frame is unordered), so the gate pins exchanges and sorts,
    not node count."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    plan = (
        group_rank_quantile_buckets(d, ("lang",), "n_chars", _B, ("doc_id",))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert plan.count("+- Sort") == 1
    assert plan.count("Window") == 2
    assert "BroadcastExchange" not in plan
