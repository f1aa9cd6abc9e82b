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
window), then a narrow projection. The ranked table is lazily
checkpointed INSIDE the operator and the total row count is read off
it as max(rank) — one cheap pass over the checkpoint, never a second
scan of the raw input (the samplers' re-execution lesson, pre-applied).
`global_row_number` itself still references the input for its range/
counts/main passes, so an EXPENSIVE upstream pipeline should be lazily
checkpointed by the caller before being passed in (the
q_select_pipeline convention). Ties are broken by the caller's
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
    ranked = global_row_number(
        df, [score_col, *tiebreak_cols], out_col="__rn"
    ).localCheckpoint(eager=False)
    # ranks are 1..N and total, so N = max(rank): read it off the
    # checkpointed ranked table instead of re-aggregating the raw input
    total = ranked.agg(F.max("__rn").alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn(
            out_col,
            F.expr(f"((__rn - 1) * {int(n_buckets)}) div __n").cast("int"),
        )
        .drop("__rn", "__n")
    )
