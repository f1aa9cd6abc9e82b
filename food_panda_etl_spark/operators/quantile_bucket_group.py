"""Per-group exact rank-quantile bucketing — the GROUP face of
`operators/quantile_bucket.py` (the r17 registry notes' named
candidate): assign every row its b-quantile bucket of a score column
WITHIN its group ("per language, split into quality quartiles; then
mix per-(lang, quartile)"), the curriculum/mix primitive at the
grouping the mixing actually runs at. Buckets are EXACT and
deterministic, like the flat operator: rank = row_number over the
group's (score, tiebreak) total order, bucket = ((rank−1)·b) div n_g
pure integer arithmetic — the exact b-quantiles of each group's
empirical distribution, per-group bucket sizes differing by at most
one, replayable in SQL as
``(row_number() OVER (PARTITION BY g ORDER BY ...) − 1) * b //
count(*) OVER (PARTITION BY g)``.

Engine shape — and why the group face is CHEAPER than the flat one:
the flat operator needs the two-phase `global_row_number` (a global
rank must never be a single-partition window); per group, Spark's own
Window machinery already distributes — ONE hash-partition exchange on
the group columns, one sort, and BOTH window functions (row_number +
count) evaluate over the same partitioning in a single Window node: no
second exchange, no broadcast rebase, no driver participation. Groups
are the unit of parallelism; skewed groups sort within their partition
(the window family's standard posture, same as q_topk_per_group).

Determinism: ``tiebreak_cols`` MUST make the per-group order total
(the flat operator's contract — equal scores straddling a cut would
otherwise bucket partitioning-dependently in BOTH engines); NULL
scores sort via the explicit NULLS FIRST pin so Spark (nulls first
default ASC) and DuckDB (nulls last default) agree by construction
rather than by accident. NULL GROUP keys form their own group
(identical PARTITION BY semantics in both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def group_rank_quantile_buckets(
    df: DataFrame,
    group_cols: tuple[str, ...],
    score_col: str,
    n_buckets: int,
    tiebreak_cols: tuple[str, ...],
    out_col: str = "bucket",
) -> DataFrame:
    """All input columns plus ``out_col`` (int, 0-based bucket id in
    ascending ``score_col`` order WITHIN the row's group: bucket 0 =
    the group's lowest scores). Every group's bucket sizes differ by
    at most 1 (exact empirical quantiles of n_g rows); groups smaller
    than ``n_buckets`` leave some buckets empty (rank arithmetic, no
    special case)."""
    if int(n_buckets) < 1:
        raise ValueError(
            f"group_rank_quantile_buckets: n_buckets must be >= 1, "
            f"got {n_buckets!r}"
        )
    if not group_cols:
        raise ValueError(
            "group_rank_quantile_buckets: group_cols must be non-empty "
            "— for the global split use rank_quantile_buckets (the "
            "two-phase global rank; a per-group window with no groups "
            "would be a single-partition window)"
        )
    if not tiebreak_cols:
        raise ValueError(
            "group_rank_quantile_buckets: tiebreak_cols must make each "
            "group's order total (equal scores would otherwise bucket "
            "partitioning-dependently)"
        )
    clash = sorted({out_col, "__rn", "__n"} & set(df.columns))
    if clash:
        raise ValueError(
            f"group_rank_quantile_buckets: column(s) {clash} collide "
            "with the operator's output/temp columns — rename them or "
            "pass a different out_col"
        )
    # explicit NULLS FIRST on every sort key: Spark's ASC default, but
    # DuckDB defaults NULLS LAST — the oracle must write NULLS FIRST
    # too, and pinning it here makes the contract visible in the plan
    order = [
        F.col(c).asc_nulls_first() for c in (score_col, *tiebreak_cols)
    ]
    wp = Window.partitionBy(*[F.col(c) for c in group_cols])
    ranked = df.withColumn(
        "__rn", F.row_number().over(wp.orderBy(*order))
    ).withColumn("__n", F.count("*").over(wp))
    return ranked.withColumn(
        out_col,
        F.expr(f"((__rn - 1) * {int(n_buckets)}) div __n").cast("int"),
    ).drop("__rn", "__n")
