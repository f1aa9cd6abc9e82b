"""Stratified systematic PPS sampling — per-stratum weighted quotas
over ONE global prefix sum (the balanced-mixture selection step: "keep
k_en PPS-weighted documents from English, k_de from German, …" — the
composition of `operators/sampling.py`'s systematic selection with
`queries/storage.py`'s per-stratum quota discipline, as a single
operator because the naive composition runs one prefix-sum job per
stratum).

The scale trick: a per-stratum running sum via a window PARTITION BY
stratum would put each stratum in one task — the single-partition
hazard for any large stratum. Instead the operator computes ONE
two-phase GLOBAL prefix sum over the (stratum, hash, id) total order
(`global_running_sum` — strata are contiguous ranges under that
order), derives each stratum's base offset from the tiny per-stratum
totals table (cumulative over strata — a window over ≤ |strata| rows,
prefix-summed with the same triangular-join scheme to avoid even that
window), and rebases: stratum-local cum = global cum − stratum base.
Tick membership is then the same pure integer test as the flat
sampler, per stratum: (k_s·cum_local) div T_s > (k_s·(cum_local−w))
div T_s.

Everything stays INTEGER arithmetic — bit-deterministic, partitioning-
invariant, replayable in SQL (declared-query slated for the r8
window). Inclusion probability within stratum s is exactly
min(1, k_s·w/T_s); exactly k_s rows per stratum whenever every w <
T_s/k_s (heavier certainty units absorb multiple ticks, flagged by
n_ticks). Weight validation matches the flat sampler: non-negative,
non-NULL, non-NaN, checked on the RAW column in-plan.

Quotas: a {stratum: k} dict (driver-side, strata are few — the
language/source-mix use case). Strata present in the data but absent
from the quota dict are dropped (sampled at k=0) — the caller's mix
spec IS the selection; strata in the dict but absent from the data
yield nothing (can't sample what isn't there).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from food_panda_etl_spark.localrel import values_df

from food_panda_etl_spark.operators.order import global_running_sum
from food_panda_etl_spark.operators.sampling import (
    guarded_weight,
    sample_order_hash,
    tick_count,
)


def pps_stratified_sample(
    df: DataFrame,
    stratum_col: str,
    weight_col: str,
    quotas: dict,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """~k_s rows per stratum s, selected with probability proportional
    to the integer ``weight_col`` within the stratum. Returns
    (id_col, stratum_col, *carry_cols, weight bigint, cum_weight bigint
    — the STRATUM-LOCAL cumulative — and n_ticks bigint), selected rows
    only. ``carry_cols`` ride through the prefix sum unchanged (the
    flat sampler's convention), so composites keep their upstream
    scores without a sample-sized re-join. As with the flat sampler, an
    EXPENSIVE upstream pipeline should be lazily checkpointed before
    being passed in — the prefix-sum machinery references ``df``
    multiple times.
    """
    if not quotas:
        raise ValueError("pps_stratified_sample: quotas must be non-empty")
    if len(quotas) > 10_000:
        # the per-stratum offset rebase below is a triangular join —
        # O(|strata|²) pairs. Bounded and broadcast-cheap at mixture
        # cardinalities (languages, domains, quality tiers), quadratic
        # garbage at key-like cardinalities — refuse loudly.
        raise ValueError(
            f"pps_stratified_sample: {len(quotas)} strata — the offset "
            "rebase is O(|strata|²); this sampler is for mixture-"
            "sized strata (languages/domains). For key-like strata use "
            "group_bottomk_sample or pre-aggregate."
        )
    for s, k in quotas.items():
        # ADVICE r8: a None key would pass straight through to the
        # stratum equi-join, which can never match a NULL stratum —
        # {None: k} would silently select nothing, contradicting the
        # repo's NULL-groups-are-their-own-group contract
        # (operators/heavy_group.py). The join is deliberately NOT
        # null-safe (eqNullSafe would also null-join the rebase/base
        # tables); NULL strata are out of the sampler's domain, so
        # fail loudly here instead of silently under-delivering.
        if s is None:
            raise ValueError(
                "pps_stratified_sample: quota keys must be non-NULL "
                "strata (a NULL stratum can never match the stratum "
                "equi-join; filter or fillna the stratum column first)"
            )
        # reject fractional quotas too — int() would silently truncate
        # 2.9 -> 2 and under-sample the stratum with no signal (the
        # sessionize gap convention)
        if k != int(k) or int(k) < 0:
            raise ValueError(
                f"pps_stratified_sample: quota for stratum {s!r} must "
                f"be a non-negative integer, got {k!r}"
            )
    spark = df.sparkSession
    stratum_type = df.schema[stratum_col].dataType.simpleString()
    qdf = values_df(
        spark,
        [(s, int(k)) for s, k in quotas.items()],
        f"{stratum_col} {stratum_type}, __k bigint",
    )
    # the weight guard and ordering hash are the flat sampler's OWN
    # definitions — the composition-equivalence invariant (and the r8
    # oracle replay) depends on the two samplers never drifting
    keyed = df.select(
        F.col(id_col),
        F.col(stratum_col),
        *[F.col(c) for c in carry_cols],
        guarded_weight(weight_col, "pps_stratified_sample").alias("__w"),
        sample_order_hash(id_col).alias("__h"),
    ).join(F.broadcast(qdf), stratum_col)
    # ONE global prefix sum over the (stratum, hash, id) total order —
    # strata are contiguous ranges under it, so the stratum-local
    # cumulative is a rebase, not a second prefix-sum job
    cum = global_running_sum(
        keyed, [stratum_col, "__h", id_col], "__w", out_col="__gcum"
    )
    stot = keyed.groupBy(stratum_col).agg(F.sum("__w").alias("__tot"))
    # per-stratum base offsets via the triangular join over the tiny
    # strata table (the global_running_sum offset scheme — no window).
    # O(|strata|²) pairs by construction — fine at language-mix
    # cardinalities (quotas are a broadcast dict, so |strata| is
    # already bounded by what fits in the plan); the guard below makes
    # the bound loud rather than letting a degenerate quota dict build
    # a quadratic join.
    prev = stot.select(
        F.col(stratum_col).alias("__sp"), F.col("__tot").alias("__tp")
    )
    base = (
        stot.join(prev, F.col("__sp") < F.col(stratum_col), "left")
        .groupBy(stratum_col, "__tot")
        .agg(F.coalesce(F.sum("__tp"), F.lit(0)).alias("__base"))
    )
    local = cum.join(F.broadcast(base), stratum_col).withColumn(
        "__cum", F.col("__gcum") - F.col("__base")
    )
    return (
        local.withColumn("__ticks", tick_count("__k"))
        .filter(F.col("__ticks") > 0)
        .select(
            id_col,
            stratum_col,
            *carry_cols,
            F.col("__w").alias("weight"),
            F.col("__cum").cast("bigint").alias("cum_weight"),
            F.col("__ticks").alias("n_ticks"),
        )
    )
