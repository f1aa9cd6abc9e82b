"""Skew mitigation: salted aggregation and salted broadcast-replicated
joins.

AQE's skew-join splitting (on in `session.py`) handles sort-merge skew
automatically; these operators cover the cases AQE does not: a grouped
aggregation where one key dominates (salting splits the hot key's partial
aggregation across `salt` reducers), and an equi-join against a skewed
build side where replication is cheaper than splitting.

Both are *semantics-preserving rewrites*: tests assert bit-equality with
the unsalted plan. Use when a profile shows a hot key — salting costs an
extra shuffle stage, so it is a targeted tool, not a default.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_sum(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe `groupBy(keys).agg(count, sum)`.

    Phase 1 groups by (keys, random salt) — the hot key's rows spread over
    `salt` reducers; phase 2 re-aggregates the tiny partial frame by keys
    alone. count/sum re-aggregate losslessly (sum-of-sums); avg derives as
    sum/count downstream. The value is cast to decimal first so the two
    plans stay bit-identical regardless of addend order (same convention
    as the declared queries)."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.count("*").alias("__cnt"),
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__sum"),
    )
    return partial.groupBy(*keys).agg(
        F.sum("__cnt").alias("cnt"),
        F.sum("__sum").cast("double").alias("sum_value"),
    )


def replicated_skew_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed big side against a small side by salting:
    big rows get a random salt in [0, salt); the small side is replicated
    `salt`× with every salt value; the join key becomes (key, salt) so one
    hot key's rows land on `salt` different reducers instead of one.

    The small side must tolerate `salt`× replication (it is usually
    broadcast-sized but pushed over the broadcast threshold by a hot-key
    build). Join semantics are unchanged — each big row still matches
    exactly the small rows with its key, under exactly one salt value."""
    # The rewrite is only semantics-preserving when unmatched SMALL-side
    # rows are never emitted: under right/full joins each replicated small
    # row that matches nothing would surface `salt` times. Refuse those.
    if how not in {"inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "semi", "left_anti", "leftanti", "anti"}:
        raise NotImplementedError(
            f"replicated_skew_join does not preserve {how!r} semantics: "
            "the replicated small side would emit unmatched rows salt "
            "times; use AQE skew-join splitting for right/full joins"
        )
    big_s = big.withColumn("__salt", (F.rand(seed=11) * salt).cast("int"))
    small_r = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_r, [key, "__salt"], how)
    return out.drop("__salt")


def top_keys_by_frequency(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Skew profiler: the n heaviest keys with their row counts — run this
    (cheap: one partial-agg shuffle) before reaching for the operators
    above."""
    return (
        df.groupBy(key)
        .count()
        .orderBy(F.desc("count"), F.col(key))
        .limit(n)
    )


def hot_keys(df: DataFrame, key: str, factor: float = 10.0) -> DataFrame:
    """Keys whose row count exceeds factor × the mean per-key count —
    the candidates worth salting. One aggregation, no collect."""
    counts = df.groupBy(key).count()
    thresh = counts.agg((F.avg("count") * factor).alias("__threshold"))
    return (
        counts.crossJoin(F.broadcast(thresh))
        .filter(F.col("count") > F.col("__threshold"))
        .select(key, "count")
    )
