"""Mergeable equi-width histogram state — the maintained-state and
windowed faces of the RANK/QUANTILE family, completing its symmetry
with the other summary families: exact bucketing is
`operators/quantile_bucket.py`, the per-group face
`operators/quantile_bucket_group.py`, the approximate gate
`q_approx_quantile_gate` — but until now no face answered "keep the
quantiles CURRENT as batches arrive, without re-ranking the corpus"
(refresh) or "the quantiles of the last N days from per-day summaries"
(window), the questions every other family already answers
(`heavy_incremental.py`, `cms_windowed.py`, `hll_windowed.py`,
`sampling_incremental.py`, `q_bloom_window`).

State = ONE DataFrame (*group_cols, bucket, cnt) with ≤ n_buckets rows
per group over a FIXED grid: bucket = min(n_buckets−1,
floor((clamp(v, lo, hi) − lo) / step)) with hi = lo + n_buckets·step —
the value is clamped into the grid FIRST, so the subtraction is
non-negative and floor == truncation in every engine, and out-of-range
mass lands in the edge buckets (documented contract: the in-bucket
guarantee below holds for in-range data; clamped tails degrade the
edge estimates to the grid boundary, never crash). NULL values are
skipped, and NaN on float/double columns with them — greatest/least
would otherwise propagate NaN into the TOP bucket in both engines,
silently drifting the upper quantiles (the heavy_hitters NULL
contract, extended: count NULL/NaN mass separately if it matters);
NULL GROUP keys form their own group (SQL GROUP BY
semantics — no joins anywhere in this module, so there is no
eqNullSafe hazard to carry).

Histograms are LINEAR (cells are counters, exactly the CMS argument —
`cms_windowed.py`): hist(A ∪ B) = hist(A) + hist(B) cell-wise, the
mergeable-summaries property (Agarwal, Cormode, Huang, Phillips, Wei,
Yi, PODS 2012) in its trivial exact form. So unlike the Misra-Gries
state (lossy truncate, superset screen + exact recount), the
maintained histogram is IDENTICAL to the from-scratch histogram under
ANY refresh chain or merge tree — the declared queries' hash-match is
the linearity identity itself, and the quantile read needs no repair
pass against the fact.

Quantile read (`hist_quantiles`), integer-exact: for a rational
q = num/den, the target rank is the smallest r with r·den ≥ num·n,
and the answer bucket is the smallest b whose cumulative count reaches
it — cum(b)·den ≥ num·n, all integer arithmetic (the registry's
determinism rules: no float thresholds cross-engine). The estimate is
the bucket's UPPER edge, est = lo + (b+1)·step. Guarantee: the chosen
bucket contains the ⌈q·n⌉-th smallest value (cum(b−1) < r ≤ cum(b)),
so for in-range data  est − step ≤ true_q < est — a one-sided bound
within one bucket width, by construction (equi-width histograms are
folklore; Ioannidis, "The History of Histograms", VLDB 2003 surveys
the family). Choose step against the value span, n_buckets bounds the
error; the grid is the accuracy contract and is therefore STAMPED.

Cross-engine replay note: the oracle replays floor((v − lo)/step) as
DOUBLE division in both engines; with power-of-two steps (the declared
grids: 16, 8.0) the division is an exact scaling, so the floor — and
hence every cell, every cumulative count, every estimate — is
bit-identical in Spark and DuckDB with no rounding anywhere.

Geometry: the grid (lo, step, n_buckets, value_col, builder version)
rides the state as column metadata (`operators/state_geometry.py`) and
every consumer validates it — cells from a different grid would sum
into garbage (the cms_merge lesson), and a probe at another grid reads
the wrong edges, wrong-but-plausible forever. Hand-built state with
matching geometry stays accepted as the caller's contract, as
everywhere.

Scale: the fact is touched once per summary build, shuffling
(*group, bucket) tuples into a ≤ n_buckets-row-per-group hash
aggregation (map-side combined); refreshes cost one batch-sized
histogram + a state-sized union-sum; window combines re-aggregate
≤ days·n_buckets summary rows, never the fact; the quantile read's
windows partition over ≤ n_buckets rows per group. Nothing here is
fact-sized after the first aggregation — the sketch-state regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sketch_checks import check_merge_columns
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_uniform_geometry,
    state_geometry,
)

_GEO_KEYS = ("lo", "step", "n_buckets", "value_col", "summarizer")
# bump when the bucket rule (clamp/floor/edge handling) changes —
# state from an older builder must fail the refresh's geometry check
_SUMMARIZER = "histogram_state.equi-width/v1"


def hist_geometry(
    lo, step, n_buckets: int, value_col: str
) -> dict:
    """The metadata dict `hist_summary` stamps and every consumer
    validates. ``lo``/``step`` are stored as floats so the stamp
    compares identically whether the grid was declared with ints or
    floats (the bucket arithmetic itself is the same double math
    either way — module docstring)."""
    return {
        "lo": float(lo),
        "step": float(step),
        "n_buckets": int(n_buckets),
        "value_col": str(value_col),
        "summarizer": _SUMMARIZER,
    }


def _check_grid(op: str, lo, step, n_buckets: int) -> None:
    if int(n_buckets) < 1:
        raise ValueError(f"{op}: n_buckets must be >= 1, got {n_buckets!r}")
    if not float(step) > 0:
        raise ValueError(f"{op}: step must be > 0, got {step!r}")


def _bucket(value_col: str, lo, step, n_buckets: int):
    """min(n_buckets−1, floor((clamp(v, lo, hi) − lo) / step)) as a
    bigint Column — clamp FIRST so the numerator is non-negative
    (floor == truncation in every engine) and v == hi exactly (or
    above) lands in the top bucket."""
    hi = float(lo) + float(n_buckets) * float(step)
    v = F.col(value_col).cast("double")
    vc = F.least(F.lit(hi), F.greatest(F.lit(float(lo)), v))
    raw = F.floor((vc - F.lit(float(lo))) / F.lit(float(step)))
    return F.least(F.lit(int(n_buckets) - 1).cast("long"), raw)


def hist_summary(
    df: DataFrame,
    value_col: str,
    lo,
    step,
    n_buckets: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The (*group_cols, bucket, cnt) state — ≤ n_buckets rows per
    group, one hash aggregation over the input (the fact shuffles only
    (*group, bucket) tuples). NULL values are skipped, and so are NaN
    values on float/double columns (review r18: greatest/least
    propagate NaN to the TOP bucket in both engines, so un-skipped
    NaNs would silently drift every upper-quantile estimate to the hi
    edge — count NULL/NaN mass separately if it matters, the
    heavy_hitters contract); NULL group keys form their own group.
    The grid rides the output as column metadata and every consumer
    validates it."""
    _check_grid("hist_summary", lo, step, n_buckets)
    clash = sorted({"bucket", "cnt"} & {*group_cols, value_col})
    if clash:
        raise ValueError(
            f"hist_summary: column(s) {clash} collide with the state's "
            "output columns — rename them first"
        )
    keep = F.col(value_col).isNotNull()
    if dict(df.dtypes).get(value_col) in ("float", "double"):
        keep = keep & ~F.isnan(F.col(value_col))
    return (
        df.filter(keep)
        .groupBy(
            *group_cols,
            _bucket(value_col, lo, step, n_buckets).alias("bucket"),
        )
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .withMetadata("cnt", hist_geometry(lo, step, n_buckets, value_col))
    )


def _check_state(
    op: str, state: DataFrame, lo, step, n_buckets: int, value_col: str
) -> None:
    # validate the declared grid UNCONDITIONALLY (review r18: without
    # this, a degenerate grid probed against hand-built unstamped
    # state — step 0, n_buckets 0 — would read wrong-but-plausible
    # estimates instead of raising, the exact mode these guards exist
    # to prevent; stamped state only caught it via the stamp compare)
    _check_grid(op, lo, step, n_buckets)
    check_probe_geometry(
        op,
        hist_geometry(lo, step, n_buckets, value_col),
        state_geometry(state, "cnt", _GEO_KEYS),
        "cells from a different grid would merge into garbage and "
        "every estimate would read the wrong bucket edges — silently "
        "wrong, never an error (rebuild the state or match the grid)",
    )


def incremental_hist_refresh(
    state: DataFrame,
    batch: DataFrame,
    value_col: str,
    lo,
    step,
    n_buckets: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The refreshed state — the linear combine: the batch is
    summarized on the SAME grid (validated against the state's stamp)
    and cells union-sum per (*group, bucket). The output IS the next
    round's state (the stamp rides it forward) and is IDENTICAL to
    the from-scratch histogram of corpus ∪ batch — histograms merge
    exactly (module docstring), so there is no deficit bookkeeping and
    no repair pass. State stamped by :func:`hist_summary` (or a prior
    refresh) is geometry-validated; hand-built state with matching
    geometry is the caller's contract, as everywhere."""
    _check_state(
        "incremental_hist_refresh", state, lo, step, n_buckets, value_col
    )
    b = hist_summary(batch, value_col, lo, step, n_buckets, group_cols)
    return hist_merge_groups(
        [state, b],
        lo,
        step,
        n_buckets,
        value_col,
        group_cols=group_cols,
    )


def hist_merge_groups(
    states: list[DataFrame],
    lo,
    step,
    n_buckets: int,
    value_col: str,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Sum cells across states AND across any group dimensions not in
    ``group_cols`` — the windowed/re-bucketing combine (per-day
    summaries, day-filtered by the caller, become "the histogram of
    the window" at ≤ inputs·days·n_buckets merge cost, no rescan of
    the fact — the `cms_merge_groups` shape). Every stamped input must
    carry the SAME grid (validated; also checked against the declared
    grid), and every input must contain (bucket, cnt) plus
    ``group_cols`` (shape-asserted, the hll_merge lesson)."""
    if not states:
        raise ValueError("hist_merge_groups: need at least one state")
    _check_grid("hist_merge_groups", lo, step, n_buckets)
    check_merge_columns(
        "hist_merge_groups", {*group_cols, "bucket", "cnt"}, states
    )
    geo = check_uniform_geometry(
        "hist_merge_groups",
        _GEO_KEYS,
        [(f"state #{i}", s, "cnt") for i, s in enumerate(states)],
        "cells from different grids would sum into garbage",
    )
    check_probe_geometry(
        "hist_merge_groups",
        hist_geometry(lo, step, n_buckets, value_col),
        geo,
        "cells from different grids would sum into garbage (rebuild "
        "the inputs or match the grid)",
    )
    parts = [s.select(*group_cols, "bucket", "cnt") for s in states]
    out = parts[0]
    for s in parts[1:]:
        out = out.unionByName(s)
    return (
        out.groupBy(*group_cols, "bucket")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
        .withMetadata("cnt", hist_geometry(lo, step, n_buckets, value_col))
    )


def hist_quantiles(
    state: DataFrame,
    quantiles: list[tuple[int, int]],
    value_col: str,
    lo,
    step,
    n_buckets: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, q_num, q_den, bucket, est) — for each rational
    quantile num/den, the smallest bucket whose cumulative count
    reaches rank ⌈(num/den)·n⌉ (integer comparison cum·den ≥ num·n)
    and its upper-edge estimate est = lo + (bucket+1)·step (DOUBLE —
    exact for the power-of-two grids, module docstring). One-sided
    bound: est − step ≤ true quantile < est for in-range data. Groups
    absent from the state (no non-NULL rows) produce no output row.
    Everything here runs over state-sized frames: the cumulative
    window partitions over ≤ n_buckets rows per group and the
    quantile fan-out is a literal-array explode, never a join."""
    _check_state("hist_quantiles", state, lo, step, n_buckets, value_col)
    if not quantiles:
        raise ValueError("hist_quantiles: need at least one quantile")
    for num, den in quantiles:
        if not 0 < int(num) <= int(den):
            raise ValueError(
                f"hist_quantiles: need 0 < num <= den, got {num}/{den}"
            )
    parts = (
        [F.col(c) for c in group_cols] if group_cols else [F.lit(0)]
    )
    w_cum = (
        Window.partitionBy(*parts)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(*parts)
    q_arr = F.array(*[
        F.struct(
            F.lit(int(num)).alias("q_num"), F.lit(int(den)).alias("q_den")
        )
        for num, den in quantiles
    ])
    cum = state.select(
        *group_cols,
        "bucket",
        F.sum("cnt").over(w_cum).alias("__cum"),
        F.sum("cnt").over(w_all).alias("__n"),
    )
    return (
        cum.select(*group_cols, "bucket", "__cum", "__n",
                   F.explode(q_arr).alias("__q"))
        .filter(
            F.col("__cum") * F.col("__q.q_den")
            >= F.col("__q.q_num") * F.col("__n")
        )
        .groupBy(
            *group_cols,
            F.col("__q.q_num").alias("q_num"),
            F.col("__q.q_den").alias("q_den"),
        )
        .agg(F.min("bucket").alias("bucket"))
        .withColumn(
            "est",
            F.lit(float(lo)) + (F.col("bucket") + F.lit(1)) * F.lit(
                float(step)
            ),
        )
    )
