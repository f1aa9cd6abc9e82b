"""Exact rank-quantile bucketing — assign every row its b-quantile
bucket of a score column (the curriculum/mix primitive: "split the
corpus into quality quartiles, then weight each quartile's sampling
rate"). Unlike `approxQuantile` the buckets are EXACT and
deterministic: rank comes from the two-phase `global_row_number` over
the (score, tiebreak) total order, and the bucket is pure integer
arithmetic on the rank — bucket = ((rank−1)·b) div N — so the cut
points are the exact b-quantiles of the empirical distribution, every
bucket's size differs by at most 1, and the whole assignment is
replayable in SQL as `(row_number() − 1) * b // count(*)` (the r10
declared-query form).

Scale shape: ONE range exchange for the rank (never a single-partition
window), then a narrow projection. The total row count is max(rank)
off the ranked table itself — self-consistent with the ranks it
divides, and cheap post-pin (both references bottom out at the pinned
materialization). This operator is where the r10 sf0.1
oracle sweep exposed the two-phase rank machinery's reuse fragility
(off-quarter bucket sizes at 5,000 rows — this plan was the first to
get THREE separate range exchanges instead of a reused one); the root
fix is the (row, pid) correctness pin inside `operators/order.py`
(see its module docstring), and
tests/test_quantile_priority.py::test_buckets_exact_quarters_at_5k
pins the exact-quarters invariant at the size that reproduced it.
An EXPENSIVE upstream pipeline should be lazily checkpointed by the
caller before being passed in (the q_select_pipeline convention).
Ties are broken by the caller's
``tiebreak_cols`` (MUST make the order total — the q_shuffle_order /
sessionize convention; a non-total order would be
partitioning-dependent in BOTH engines and hash-diverge), so equal
scores straddling a cut land deterministically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.order import global_row_number


def rank_quantile_buckets(
    df: DataFrame,
    score_col: str,
    n_buckets: int,
    tiebreak_cols: tuple[str, ...],
    out_col: str = "bucket",
) -> DataFrame:
    """All input columns plus ``out_col`` (int, 0-based bucket id in
    ascending ``score_col`` order: bucket 0 = lowest scores)."""
    if int(n_buckets) < 1:
        raise ValueError(
            f"rank_quantile_buckets: n_buckets must be >= 1, got {n_buckets!r}"
        )
    if not tiebreak_cols:
        raise ValueError(
            "rank_quantile_buckets: tiebreak_cols must make the order "
            "total (equal scores would otherwise bucket "
            "partitioning-dependently)"
        )
    ranked = global_row_number(df, [score_col, *tiebreak_cols], out_col="__rn")
    # N = max(rank) off the ranked table itself — SELF-CONSISTENT with
    # the ranks it divides (an independent count of df would re-execute
    # the input and could disagree with the ranked row count if the
    # source moved between scans), and cheap post-pin: both references
    # bottom out at order.py's pinned (row, pid) materialization, so
    # the ranks agree across them by construction.
    total = ranked.agg(F.max("__rn").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            out_col,
            F.expr(f"((__rn - 1) * {int(n_buckets)}) div __n").cast("int"),
        )
        .drop("__rn", "__n")
    )
