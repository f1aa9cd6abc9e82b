"""Group-wise bottom-k sampling — deterministic uniform-without-
replacement sampling of (up to) k rows PER GROUP in one pass: order
each group's rows by a pseudo-random hash of the id and keep the k
smallest. This is the bottom-k sketch of the mergeable-summaries
family (the classic distributed "reservoir" replacement: a true
reservoir is visit-order dependent and unreplayable, while bottom-k is
a pure function of the SET of ids — same sample under any
partitioning, any merge order, any rerun), and the per-group sibling
of `operators/sampling_priority.py` (priority sampling IS weighted
bottom-k; with unit weights the two coincide).

Mergeability (property-tested): bottomk(A ∪ B) == bottomk(bottomk(A)
∪ bottomk(B)) per group — shards can be sampled independently and the
k-row-per-group partials merged, the HLL/CMS combine discipline
applied to row sampling. This is what makes it the 100 TB shape:
per-group state is ≤ k rows regardless of group size. The identity is
over SETS while DataFrames are bags: partials from OVERLAPPING shards
(shared snapshots, at-least-once ingestion) must be deduplicated on
(group, id) before re-sampling — a shared row would otherwise take
two ranks and displace the legitimate k-th smallest (the same
unique-ids-per-group contract as a direct call; the merge recipe is
``bottomk(pa.unionByName(pb).dropDuplicates([*group_cols, id_col]))``).

Engine shape: ONE narrow projection (group, hash, id, carries) + ONE
per-group window with a rank filter that Spark's optimizer rewrites to
WindowGroupLimit — per-partition PARTIAL top-k heaps BEFORE the
shuffle, so at most k rows per (group, input partition) ever move
(plan-gated, the q_topk_per_group / q_tfidf convention). No groupBy
re-aggregation, no collect, no UDF.

Determinism: the ordering key is the samplers' SHARED multiplicative
hash (`operators/sampling.py::sample_order_hash` — one definition,
the guarded_weight no-drift rule; since ADVICE r11 the shared helper
itself pre-reduces the id mod P, so it is int64-overflow-free for
every id — see its docstring for the bound). The order
is TOTAL when ids are unique per group (the caller contract —
duplicate ids would make rank assignment partitioning-dependent in
BOTH engines) and the selected set replays exactly as
`row_number() OVER (PARTITION BY g ORDER BY ((id % P) * M) % P, id)
<= k` (the r11 declared-query form). NULL ids raise in-plan (Spark
sorts NULLs first, DuckDB last — a silent cross-engine divergence
otherwise); NULL GROUP keys are fine and form their own group
(identical PARTITION BY semantics in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sampling import (
    guarded_weight,
    priority_expr,
    sample_order_hash,
)


def _guarded_hash(id_col: str, op_name: str):
    """sample_order_hash with the NULL-id raise both group samplers
    share (review-caught r12: the guard had been duplicated verbatim —
    the guarded_weight no-drift rule applies to guards too)."""
    return F.when(
        F.col(id_col).isNotNull(), sample_order_hash(id_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"{op_name}: {id_col} must be non-NULL (NULL sort "
                "position differs across engines)"
            )
        )
    )


def _check_reserved(
    op_name: str,
    reserved: tuple[str, ...],
    group_cols: tuple[str, ...],
    id_col: str,
    carry_cols: tuple[str, ...],
) -> None:
    """The samplers APPEND output columns; a group/id/carry column
    named like one would be silently overwritten (review-caught r12:
    carry_cols=("priority",) returned the internal h/w values in the
    caller's column) — refuse loudly instead."""
    clash = sorted(
        set(reserved) & {*group_cols, id_col, *carry_cols}
    )
    if clash:
        raise ValueError(
            f"{op_name}: column(s) {clash} collide with the sampler's "
            f"output columns {list(reserved)} — rename them first"
        )


def group_bottomk_sample(
    df: DataFrame,
    group_cols: tuple[str, ...],
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The ≤ k rows with the smallest id-hash per group. Returns
    (*group_cols, id_col, *carry_cols, rk int) with rk the 1-based
    within-group rank — exactly min(k, |group|) rows per group."""
    if int(k) < 1:
        raise ValueError(
            f"group_bottomk_sample: k must be >= 1, got {k!r}"
        )
    if not group_cols:
        raise ValueError(
            "group_bottomk_sample: group_cols must be non-empty — for a "
            "global sample use priority_sample with unit weights"
        )
    _check_reserved(
        "group_bottomk_sample", ("rk", "__h"), group_cols, id_col,
        carry_cols,
    )
    w = Window.partitionBy(*group_cols).orderBy("__h", id_col)
    return (
        df.select(
            *[F.col(c) for c in group_cols],
            F.col(id_col),
            *[F.col(c) for c in carry_cols],
            _guarded_hash(id_col, "group_bottomk_sample").alias("__h"),
        )
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= int(k))
        .drop("__h")
    )


def group_priority_sample(
    df: DataFrame,
    group_cols: tuple[str, ...],
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Weighted bottom-k PER GROUP — sequential Poisson (priority)
    sampling (`operators/sampling_priority.py`, Ohlsson 1998) with the
    group dimension threaded through: the ≤ k rows with the smallest
    hash/weight priority in each group, inclusion approximately
    proportional to weight WITHIN the group. The weighted counterpart
    of :func:`group_bottomk_sample` exactly as flat priority sampling
    is the weighted counterpart of flat bottom-k (unit weights make
    the two coincide — property-tested), and the same engine shape:
    ONE narrow projection + ONE per-group window whose rank filter
    rewrites to WindowGroupLimit (≤ k rows per (group, partition) move;
    plan-gated), vs the stratified systematic sampler's global prefix
    sum + broadcast rebase — use this for "per language, ~k docs,
    longer ones more often" selection where plan cost dominates, the
    stratified sampler when exact per-stratum inclusion probabilities
    feed a weighted estimator.

    Returns (*group_cols, id_col, *carry_cols, weight bigint,
    priority double, rk int) — exactly min(k, #w>0 rows) per group.
    Determinism: priority = ONE IEEE division of integer-derived
    doubles on the shared hash (the priority_sample convention —
    bit-equal cross-engine), total order via the id tiebreak, so the
    selected set replays as `row_number() OVER (PARTITION BY g ORDER
    BY CAST(h AS DOUBLE)/w, id) <= k`. Zero weights are never
    selected; negative/NULL/NaN weights raise in-plan
    (`guarded_weight`); NULL ids raise (NULL sort position differs
    across engines); NULL groups are their own group; mergeable like
    bottom-k (over SETS — dedup (group, id) on overlapping shards
    before re-sampling)."""
    if int(k) < 1:
        raise ValueError(
            f"group_priority_sample: k must be >= 1, got {k!r}"
        )
    if not group_cols:
        raise ValueError(
            "group_priority_sample: group_cols must be non-empty — for "
            "a global sample use priority_sample"
        )
    _check_reserved(
        "group_priority_sample",
        ("weight", "priority", "rk", "__w", "__h"),
        group_cols, id_col, carry_cols,
    )
    keyed = df.select(
        *[F.col(c) for c in group_cols],
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        guarded_weight(weight_col, "group_priority_sample").alias("__w"),
        _guarded_hash(id_col, "group_priority_sample").alias("__h"),
    ).filter(F.col("__w") > 0)
    pri = priority_expr()
    w = Window.partitionBy(*group_cols).orderBy("priority", id_col)
    return (
        keyed.withColumn("priority", pri)
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= int(k))
        .select(
            *group_cols,
            id_col,
            *carry_cols,
            F.col("__w").alias("weight"),
            "priority",
            "rk",
        )
    )
