"""Skew-salting operators preserve semantics; bucketed tables kill the
join shuffle. Both are the targeted 100 TB tools documented in SCALE.md."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.skew import (
    hot_keys,
    replicated_skew_join,
    salted_count_sum,
    top_keys_by_frequency,
)
from food_panda_etl_spark.plans import plan_summary
from food_panda_etl_spark.sinks import write_bucketed


def _skewed_df(spark, n_hot=5000, n_cold=50):
    rows = [("hot", float(i % 97)) for i in range(n_hot)] + [
        (f"k{i}", float(i)) for i in range(n_cold)
    ]
    return spark.createDataFrame(rows, "k string, v double")


def test_salted_agg_equals_plain_agg(spark):
    df = _skewed_df(spark)
    plain = {
        r["k"]: (r["cnt"], r["sum_value"])
        for r in df.groupBy("k")
        .agg(
            F.count("*").alias("cnt"),
            F.sum(F.col("v").cast("decimal(18,2)")).cast("double").alias("sum_value"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["cnt"], r["sum_value"])
        for r in salted_count_sum(df, ["k"], "v", salt=16).collect()
    }
    assert salted == plain  # bit-identical: decimal partials re-aggregate losslessly


def test_replicated_skew_join_equals_plain_join(spark):
    big = _skewed_df(spark, n_hot=2000, n_cold=30)
    small = spark.createDataFrame(
        [("hot", 1), ("k3", 2), ("k7", 3), ("absent", 4)], "k string, tag int"
    )
    plain = sorted(
        (r["k"], r["v"], r["tag"]) for r in big.join(small, "k", "inner").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["tag"])
        for r in replicated_skew_join(big, small, "k", salt=8).collect()
    )
    assert salted == plain
    # left join keeps unmatched big rows exactly once
    n_left = replicated_skew_join(big, small, "k", salt=8, how="left").count()
    assert n_left == big.count()


def test_replicated_skew_join_rejects_right_and_full(spark):
    """ADVICE r1: under right/full joins every unmatched replicated
    small-side row would surface `salt` times — the operator must refuse
    rather than silently corrupt."""
    import pytest

    big = _skewed_df(spark, n_hot=10, n_cold=3)
    small = spark.createDataFrame([("hot", 1), ("absent", 2)], "k string, tag int")
    for how in ("right", "full", "outer", "full_outer"):
        with pytest.raises(NotImplementedError):
            replicated_skew_join(big, small, "k", salt=4, how=how)


def test_skew_profilers(spark):
    df = _skewed_df(spark)
    top = top_keys_by_frequency(df, "k", n=1).collect()
    assert top[0]["k"] == "hot" and top[0]["count"] == 5000
    hot = hot_keys(df, "k", factor=10.0).collect()
    assert [r["k"] for r in hot] == ["hot"]


def test_aqe_skew_join_split_triggers(spark):
    """VERDICT r2 task 5: SCALE.md claims AQE skew-join splitting is the
    first-line defense before manual salting — prove it. A join whose
    shuffle puts ~100x the median bytes in one partition, with the split
    thresholds lowered to fixture scale, must show `skew=true` on the
    SortMergeJoin in the FINAL adaptive plan (i.e. the hot partition was
    actually split into sub-partitions at runtime)."""
    hot = spark.range(0, 200_000).select(
        F.lit("hot").alias("k"), F.col("id").alias("v")
    )
    cold = spark.range(0, 3_000).select(
        F.concat(F.lit("k"), (F.col("id") % 30).cast("string")).alias("k"),
        F.col("id").alias("v"),
    )
    big = hot.unionAll(cold)
    small = spark.createDataFrame(
        [("hot", 1)] + [(f"k{i}", i) for i in range(30)], "k string, tag int"
    )
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.enabled",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.coalescePartitions.enabled",
        )
    }
    try:
        # Fixture-scale thresholds: the hot partition is ~MBs, the median
        # ~KBs — the same 100x ratio a 100 TB hot key produces against
        # the production 256 MB defaults.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "100KB"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
        j = big.join(small, "k")
        # collect() (not count()) — count() wraps a NEW query execution,
        # leaving j's own adaptive plan unexecuted/non-final.
        assert len(j.collect()) == 203_000
        final_plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in final_plan
        assert "skew=true" in final_plan, f"no skew split in final plan:\n{final_plan[:2000]}"
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_bucketed_join_skips_shuffle(spark):
    """Both sides bucketed on the join key → SortMergeJoin with zero
    Exchange nodes (the co-located read is the point of bucketing)."""
    li = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 100).alias("v")
    )
    od = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    write_bucketed(li, "b_li", "k", num_buckets=8)
    write_bucketed(od, "b_od", "k", num_buckets=8)
    try:
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("b_li").join(spark.table("b_od"), "k")
            s = plan_summary(j)
            assert s.sort_merge_joins == 1
            assert s.exchanges == 0  # bucket co-location replaced the shuffle
            assert j.count() == 10_000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS b_li")
        spark.sql("DROP TABLE IF EXISTS b_od")
