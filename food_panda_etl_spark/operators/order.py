"""Global ordering operators that avoid the single-partition window.

``row_number() OVER (ORDER BY k)`` with no PARTITION BY collapses the
whole table onto one task — correct, but serial and OOM-prone at 100 TB.
The scalable equivalent is the classic two-phase scheme every MPP engine
uses: range-partition by the key, rank locally, then add per-partition
offsets (a tiny P-row side table) back to every row.

CORRECTNESS PIN (r10) — the (row, pid) binding is materialized ONCE
(lazy ``localCheckpoint`` on the pid-stamped table) before ANY
consumer. The scheme needs the counts/offsets subtree and the main
pass to see the SAME partition assignment, and without the pin that
only holds while ``ReuseExchange`` happens to unify their range
exchanges: range-boundary sampling is seeded per RDD id, so two
physical instances of the "same" ``repartitionByRange`` draw DIFFERENT
boundaries, offsets stop matching pids, and ranks silently corrupt —
duplicates, max > N. Reuse is an optimization, not a contract: the
r10 sf0.1 oracle sweep caught a plan (quantile bucketing under an
aggregation) where the optimizer planned THREE separate range
exchanges with zero reuse, producing off-quarter buckets at 5,000 rows
on local[8] under every eager/lazy/AQE-on/AQE-off variant, while the
same operator standalone (reuse kicked in) was exact. With the pin,
pid is DATA: every consumer reads the one materialized assignment, and
the output is rerun-deterministic because a consistent two-phase rank
IS the row's position in the (unique-key) total order — a pure
function of the data, not of where the sampled boundaries fell. The
pin costs one executor-local materialization of the post-shuffle fact
(MEMORY_AND_DISK — the price of correctness; on a cluster it is the
same magnitude as the shuffle the plan already pays) AND truncates
lineage non-recoverably: if an executor holding checkpointed blocks is
lost, the job FAILS instead of recomputing (Spark's documented
localCheckpoint caveat). That loud failure is the chosen trade — a
recomputation (or a persist() eviction) would re-draw range boundaries
and reintroduce exactly the silent corruption the pin exists to
prevent; production deployments wanting fault tolerance use reliable
`checkpoint()` to HDFS instead, same semantics. Regression:
tests/test_quantile_priority.py::test_buckets_exact_quarters_at_5k and
the naive-plan equality tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row number by ``order_cols`` without a global sort
    on one task.

    Phase 1: ``repartitionByRange`` on the keys — each partition holds a
    contiguous key range. Phase 2: rank within each partition (window
    partitioned by ``spark_partition_id()``, so the sort is local), count
    rows per partition (P tiny rows), prefix-sum those counts (a window
    over the P-row side table — single-partition but O(P), not O(N)), and
    broadcast-join the offsets back. Output is identical to the global
    window whenever ``order_cols`` form a total order (unique keys) —
    asserted against the naive plan in tests.

    Two narrow shuffles of the fact (range + pid hash) replace one
    single-partition sort of the fact: the difference between a plan that
    scales with the cluster and one that scales with a single executor's
    heap."""
    par = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(par, *[F.col(c) for c in order_cols])
    # the correctness pin (module docstring): freeze the (row, pid)
    # binding before the counts and main subtrees consume it
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    counts = with_pid.groupBy("__pid").agg(F.count("*").alias("__cnt"))
    # Prefix-sum over the P-row counts table WITHOUT a window node: an
    # unpartitioned window would serialize on one task and spam the
    # "No Partition Defined" warning channel (and a constant partition
    # key gets folded away by Catalyst, warning anyway). A triangular
    # self-join + aggregate is O(P²) on P ≈ parallelism rows — nothing —
    # and keeps the whole plan warning-free so a real fact-sized
    # single-partition window regression stays visible.
    preceding = counts.select(
        F.col("__pid").alias("__pid_prev"), F.col("__cnt").alias("__cnt_prev")
    )
    offsets = (
        counts.join(preceding, F.col("__pid_prev") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__cnt_prev"), F.lit(0)).alias("__off"))
    )
    w_local = Window.partitionBy("__pid").orderBy(*[F.col(c) for c in order_cols])
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.row_number().over(w_local) + F.col("__off"))
        .drop("__pid", "__off")
    )


def batch_number(rn: Column, page_size: int = 48) -> Column:
    """ceil(rn / page_size) — the reference's page stamp arithmetic
    (/root/reference/src/main.rs:120-123)."""
    return F.ceil(rn.cast("double") / float(page_size)).cast("int")


def global_running_sum(
    df: DataFrame,
    order_cols: list[str],
    value_col: str,
    out_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global prefix sum of ``value_col`` by ``order_cols`` without a
    single-partition window — same two-phase scheme as
    :func:`global_row_number`: range-partition on the keys, cumulative
    sum locally (window partitioned by ``spark_partition_id()``), then
    add per-partition value totals prefix-summed over the tiny P-row
    side table (triangular join, no window node) back to every row.

    Exact for integer/decimal values (sum re-association is lossless);
    for doubles the result can differ from the naive global window by
    addend order, so callers needing bit-stability pass integers or
    decimals — the packing use case (token counts) is integral.

    This is the scalable substrate for sequence PACKING: a global token
    prefix-sum turns "concatenate the corpus and cut every B tokens"
    into pure arithmetic per row (see queries/storage.py::q_pack_chunks).
    """
    par = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(par, *[F.col(c) for c in order_cols])
    # same correctness pin as global_row_number (module docstring)
    with_pid = ranged.withColumn(
        "__pid", F.spark_partition_id()
    ).localCheckpoint(eager=False)
    totals = with_pid.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    preceding = totals.select(
        F.col("__pid").alias("__pid_prev"), F.col("__tot").alias("__tot_prev")
    )
    offsets = (
        totals.join(preceding, F.col("__pid_prev") < F.col("__pid"), "left")
        .groupBy("__pid")
        .agg(F.coalesce(F.sum("__tot_prev"), F.lit(0)).alias("__off"))
    )
    w_local = (
        Window.partitionBy("__pid")
        .orderBy(*[F.col(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        with_pid.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.sum(value_col).over(w_local) + F.col("__off"))
        .drop("__pid", "__off")
    )
