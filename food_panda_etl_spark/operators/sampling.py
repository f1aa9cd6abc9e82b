"""Weighted sampling: systematic probability-proportional-to-size (PPS)
selection — the deterministic resampling half of importance weighting
(`operators/dsir.py` scores; this picks), and the classic survey-
sampling primitive (Madow's systematic selection).

Semantics: lay the documents end to end on a line segment of length
T = Σw in a fixed pseudo-random order, then drop k equally spaced ticks
(at T/k, 2T/k, …); a document is selected iff a tick lands inside its
weight interval. Inclusion probability is exactly min(1, k·w/T) —
proportional to weight — and exactly k rows are selected whenever every
w < T/k (heavier "certainty units" absorb multiple ticks but appear
once, flagged by how many ticks they absorbed).

Everything is INTEGER arithmetic on a global prefix sum, so the sample
is bit-deterministic, partitioning-invariant, and replayable in any SQL
engine: tick membership is `(k·cum) div T > (k·(cum−w)) div T` — no
floats, no RNG. The "random" order is the repo's keyed multiplicative
hash (the q_shuffle_order permutation), so the systematic grid is
decorrelated from insertion order, reruns see the same sample, and a
resumed pipeline can re-derive it from nothing but the data.

Scale shape: one range exchange for the prefix sum (the two-phase
`global_running_sum` — never a single-partition window), one broadcast
1-row total, then a narrow filter. k·T must stay < 2^63 for the integer
form (fixture scales: trivially; a true 100 TB corpus with k ~ 10^6
ticks would overflow — switch the two div operands to DECIMAL(38,0),
same exactness, at ~1.3× the arithmetic cost, the repo's standard
decimal insurance).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.order import global_running_sum


def pps_systematic_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Select ~k rows of ``df`` with probability proportional to the
    integer ``weight_col``. Returns
    (id_col, *carry_cols, weight bigint, cum_weight bigint,
    n_ticks bigint) — only selected rows; ``n_ticks`` > 1 marks
    certainty units that absorbed several ticks (callers replicating
    for true with-replacement semantics multiply by it). ``carry_cols``
    ride through the prefix sum unchanged, so composites keep their
    upstream scores without a re-join.

    NB for composite callers: the prefix-sum machinery references
    ``df`` three times (per-partition totals, offsets, main pass) plus
    the grand-total aggregate — a cheap scan re-executes harmlessly,
    but an EXPENSIVE upstream pipeline should be lazily checkpointed
    before being passed in (see q_select_pipeline; measured 5.0 → 3.6 s
    at sf0.1)."""
    keyed = df.select(
        F.col(id_col),
        *[F.col(c) for c in carry_cols],
        guarded_weight(weight_col, "pps_systematic_sample").alias("__w"),
        sample_order_hash(id_col).alias("__h"),
    )
    cum = global_running_sum(keyed, ["__h", id_col], "__w", out_col="__cum")
    total = keyed.agg(F.sum("__w").alias("__tot"))
    return (
        cum.crossJoin(F.broadcast(total))
        .withColumn("__ticks", tick_count(int(k)))
        .filter(F.col("__ticks") > 0)
        .select(
            id_col,
            *carry_cols,
            F.col("__w").alias("weight"),
            F.col("__cum").cast("bigint").alias("cum_weight"),
            F.col("__ticks").alias("n_ticks"),
        )
    )


def guarded_weight(weight_col: str, op_name: str):
    """The samplers' shared weight projection — ONE definition so the
    flat and stratified samplers (whose composition-equivalence
    property depends on identical semantics) can never drift.

    ADVICE r6: a negative (or NULL) weight would silently corrupt the
    sample — Spark's `div` truncates toward zero while DuckDB's `//`
    floors, so a negative cumulative interval diverges across engines
    and breaks the tick-membership invariant. Fail loudly in-plan
    (the guard is the consumed column itself, pruning-proof); zero
    weights are fine — an empty interval is never selected. The guard
    tests the RAW column, not the bigint cast: a fractional negative
    like -0.5 truncates to 0 and would slip past a post-cast check —
    and rejects NaN explicitly (Spark orders NaN GREATER than every
    number, so `NaN >= 0` is true, and the non-ANSI bigint cast would
    silently turn it into weight 0)."""
    w_raw = F.col(weight_col)
    w_ok = (w_raw >= 0) & ~F.isnan(w_raw.cast("double"))
    return F.when(w_ok, w_raw.cast("bigint")).otherwise(
        F.raise_error(
            F.lit(
                f"{op_name}: {weight_col} must be a "
                "non-negative non-NULL integer weight"
            )
        )
    )


def sample_order_hash(id_col: str):
    """The samplers' shared pseudo-random ordering key (the
    q_shuffle_order multiplicative hash) — shared for the same
    no-drift reason as :func:`guarded_weight`. The id is PRE-REDUCED
    mod P before the multiply (ADVICE r11, the cms.py `_cell`
    discipline): ((id % P) · M) % P is residue-identical to
    (id · M) % P for every int64 id in both engines' truncated-modulo
    semantics, but the raw product leaves int64 at |id| ≳ 7.0e9 —
    ANSI Spark aborts the whole job and DuckDB raises — exactly the
    regime snowflake-style 64-bit ids live in. Pre-reduced, the
    product is bounded by P·M < 2^51, safe on the full id range."""
    return ((F.col(id_col) % 1000003) * 1315423911) % 1000003


def priority_expr(h_col: str = "__h", w_col: str = "__w"):
    """The priority samplers' shared h/w priority — ONE IEEE division
    of integer-derived doubles (bit-equal cross-engine: identical
    int64→double casts, identical division — the repo's division
    convention). Shared by the flat and group-wise priority samplers
    for the same no-drift reason as :func:`guarded_weight` — a change
    to one side's division would silently break the documented
    unit-weight coincidence and both oracle replays (review-caught
    r12: the expression had been defined independently twice)."""
    return F.col(h_col).cast("double") / F.col(w_col).cast("double")


def tick_count(k_expr):
    """Systematic ticks inside the row's weight interval:
    (k·cum) div T − (k·(cum−w)) div T over the in-scope __cum/__w/__tot
    columns (``k_expr`` is an int literal or a column name string
    resolving to the per-stratum quota). A zero-mass total selects
    NOTHING instead of dividing by zero — Spark 4's ANSI mode would
    otherwise abort the whole job when one (sub)population is all
    zero-weight, which is a legal input (zero weights are individually
    legal, so all-zero must be too)."""
    hi = F.expr(f"({k_expr} * __cum) div __tot")
    lo = F.expr(f"({k_expr} * (__cum - __w)) div __tot")
    return F.when(F.col("__tot") > 0, hi - lo).otherwise(F.lit(0)).cast(
        "bigint"
    )
