"""Incremental / windowed heavy hitters — the maintained-state faces
of the exact-FREQUENT-ITEMS family (`operators/heavy.py`), completing
its symmetry with the sketches: CMS has `cms_windowed.py` + the
streamed state suite, HLL has `hll_windowed.py`, Bloom has
`bloom_group.py`/`bloom_algebra.py` + `q_bloom_window`, sampling has
`sampling_incremental.py` — heavy hitters' incremental face was only
the streaming test until now. The questions: "keep 'which keys exceed
f·N' CURRENT as batches arrive, without re-summarizing the corpus"
(refresh face) and "which keys exceed f·N over the last N days" from
per-day summaries (window face).

State = a Misra-Gries summary as a DataFrame pair: ``counters``
(*group_cols, key, cnt) with ≤ k rows per group, and ``totals``
(*group_cols, n, deficit) — exact non-null row count and the
cumulative subtracted MG mass. Unlike `heavy.py`'s one-pass
per-partition summaries (layout-dependent by design, repaired by the
exact recount), the MAINTAINED summary is built exact-then-truncate:
one exact hash aggregation over the batch, then the deterministic MG
step — subtract the (k+1)-th largest count (ties broken by key, so
the subtracted VALUE is total-order deterministic) and drop the
non-positive rows. That makes the state itself replayable in SQL
(rank → delta → subtract → filter), so the declared queries'
oracles can cover the merge algebra, not just the final screen — the
trade-off is one vocabulary-wide hash aggregation per BATCH (batch-
sized, map-side combined; the corpus is summarized once per version),
where `heavy.py` pays none, which is the right trade for state that
must be audited and chained.

Guarantee (Misra-Gries '82; mergeable form Agarwal et al., PODS'12
§3): every subtraction event removes (k+1)·δ mass from the summed
counters and total mass is N, so Σδ = deficit ≤ N/(k+1) under ANY
merge tree — true_cnt − deficit ≤ stored cnt ≤ true_cnt, and every
key with true count > deficit survives in the state. With
k ≥ slack·den/num (slack 2, the `heavy.py` convention) every key at
the num/den threshold survives every refresh chain, so
:func:`heavy_candidates` is a provable SUPERSET of the true heavy
hitters and the exact candidates-only recount (broadcast semi-join —
map-only over the standing fact, the incremental_neardup verify
discipline) reproduces ``GROUP BY key HAVING cnt·den > num·n``
row-for-row: the declared-query oracle is the brute-force HAVING and
the hash-match IS the no-heavy-key-lost-across-refreshes theorem.

Scale: state is ≤ k rows per group + one totals row per group —
geometry-bounded, never vocabulary-sized; a refresh costs one
batch-sized hash agg + a ≤ (k + batch-distinct)-row merge; the window
combine re-aggregates ≤ days·k summary rows, never the fact. The
truncate's rank window partitions by the GROUP columns, and the flat
(single constant group) path pre-truncates to the global top-(k+1)
with a distributed sort+limit first — so even the INITIAL corpus
build's constant-partition window sees ≤ k+1 rows, never the
vocabulary (ADVICE r18; `_mg_truncate` docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_state_pair,
)

_GEO_KEYS = ("k", "key_col", "summarizer")
# bump when the truncate's rank order / deficit bookkeeping change —
# state from an older builder must fail the refresh's geometry check
_SUMMARIZER = "heavy_incremental.exact-mg/v1"


def _geo(k: int, key_col: str) -> dict:
    return {
        "k": int(k),
        "key_col": str(key_col),
        "summarizer": _SUMMARIZER,
    }


def _flat_top_counts(counts: DataFrame, key_col: str, k: int) -> DataFrame:
    """Global top-(k+1) of an exact (key, cnt) table by the truncate's
    (cnt desc, key) total order. sort+limit compiles to per-partition
    local top-(k+1) plus a (k+1)-row single-partition merge — no task
    ever sorts the vocabulary — and any superset of the global
    top-(k+1) yields identical kept/delta rows downstream
    (:func:`_mg_truncate` docstring), so the pre-truncate cannot
    change output. Plan-gated in tests/test_heavy_incremental.py."""
    return counts.orderBy(F.col("cnt").desc(), F.col(key_col)).limit(
        int(k) + 1
    )


def _mg_truncate(
    counts: DataFrame,
    key_col: str,
    k: int,
    group_cols: tuple[str, ...],
) -> tuple[DataFrame, DataFrame]:
    """The deterministic MG step over an exact (*group_cols, key, cnt)
    table: subtract the (k+1)-th largest count per group (0 when the
    group has ≤ k keys) and drop non-positive rows. Returns (kept
    rows, per-group delta table) — the delta comes from the RANKED
    frame, not the survivors, so a group whose boundary ties truncate
    it to ZERO rows still records the subtracted mass in the deficit
    (k+1 equal counts: delta == cnt, every row drops — the mass left
    the counters and the bound bookkeeping must know). Rank ties break
    by key, so the subtracted VALUE is total-order deterministic
    (equal boundary counts yield the same delta whichever key ranks
    k+1).

    Flat (no group_cols) inputs are pre-truncated to the global
    top-(k+1) by the same (cnt desc, key) total order BEFORE the rank
    window (ADVICE r18): only ranks 1..k+1 ever reach the output —
    rows beyond carry cnt ≤ delta and drop in the filter — so any
    superset of the global top-(k+1) yields identical kept/delta
    rows, and sort+limit compiles to per-partition local top-(k+1)
    plus a (k+1)-row single-partition merge (the two-phase
    global-rank trade, `operators/order.py`). Without it the initial
    corpus build ranked the entire distinct-key vocabulary through
    one constant-partition task; with it that window sees ≤ k+1
    rows. Grouped inputs keep the plain per-group window — the frame
    is one group's distinct keys, distributed across groups."""
    if not group_cols:
        counts = _flat_top_counts(counts, key_col, k)
    parts = (
        [F.col(c) for c in group_cols] if group_cols else [F.lit(0)]
    )
    w = Window.partitionBy(*parts).orderBy(
        F.col("cnt").desc(), F.col(key_col)
    )
    ranked = counts.withColumn(
        "__r", F.row_number().over(w)
    ).localCheckpoint(eager=False)  # consumers: kept rows + deltas
    delta_of = F.coalesce(
        F.max(F.when(F.col("__r") == int(k) + 1, F.col("cnt"))),
        F.lit(0),
    ).cast("bigint")
    deltas = (
        ranked.groupBy(*group_cols).agg(delta_of.alias("__delta"))
        if group_cols
        else ranked.agg(delta_of.alias("__delta"))
    )
    dw = Window.partitionBy(*parts)
    kept = (
        ranked.withColumn(
            "__delta",
            F.coalesce(
                F.max(
                    F.when(F.col("__r") == int(k) + 1, F.col("cnt"))
                ).over(dw),
                F.lit(0),
            ).cast("bigint"),
        )
        .filter(F.col("cnt") > F.col("__delta"))
        .select(
            *group_cols,
            key_col,
            (F.col("cnt") - F.col("__delta")).cast("bigint").alias("cnt"),
        )
    )
    return kept, deltas


def mg_summary(
    df: DataFrame,
    key_col: str,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """(counters, totals) for one batch/corpus version — the
    maintained state: ``counters`` is (*group_cols, key, cnt) with
    ≤ k rows per group, ``totals`` (*group_cols, n, deficit). NULL
    keys are skipped from the counters but counted in ``n`` (the
    `heavy.py` NULL contract: the HAVING denominator is the row
    count); NULL GROUP keys form their own group. Both frames carry
    the geometry stamp (k, key_col, builder version) as column
    metadata (`operators/state_geometry.py`) and every consumer
    validates it."""
    if int(k) < 1:
        raise ValueError(f"mg_summary: k must be >= 1, got {k!r}")
    clash = sorted({"cnt", "n", "deficit", "__r", "__delta"} & {
        *group_cols, key_col
    })
    if clash:
        raise ValueError(
            f"mg_summary: column(s) {clash} collide with the state's "
            "output columns — rename them first"
        )
    geo = _geo(k, key_col)
    counts = (
        df.filter(F.col(key_col).isNotNull())
        .groupBy(*group_cols, key_col)
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    kept, deltas = _mg_truncate(counts, key_col, k, group_cols)
    counters = kept.withMetadata("cnt", geo)
    # n counts EVERY row of the group (NULL keys included — the HAVING
    # denominator); the delta table is ≤ 1 row per group off the
    # ranked frame, so a group with only NULL keys (no counts, no
    # delta row) left-joins to deficit 0
    n_tbl = df.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n")
    )
    joined = _join_totals(n_tbl, deltas, group_cols)
    totals = joined.select(
        *group_cols,
        "n",
        F.coalesce(F.col("__delta"), F.lit(0)).cast("bigint").alias(
            "deficit"
        ),
    ).withMetadata("n", geo)
    return counters, totals


def _join_totals(
    n_tbl: DataFrame, deltas: DataFrame, group_cols: tuple[str, ...]
) -> DataFrame:
    """(*group_cols, n, [prior deficit,] __delta) — NULL-SAFE left
    join on the group keys (review r18: a plain string-list join
    drops the NULL group's delta row, so its deficit would record 0
    and the screen's superset guarantee would silently break for that
    group — the documented 'NULL GROUP keys form their own group'
    contract demands eqNullSafe, the heavy_group.py convention).
    String aliases, never frame refs (the self-join attribute-id
    gotcha — both sides derive from the same source plan)."""
    if not group_cols:
        return n_tbl.crossJoin(F.broadcast(deltas))
    keep = [c for c in n_tbl.columns if c not in group_cols]
    return (
        n_tbl.alias("nt")
        .join(
            deltas.alias("dl"),
            [
                F.col(f"nt.{c}").eqNullSafe(F.col(f"dl.{c}"))
                for c in group_cols
            ],
            "left",
        )
        .select(
            *[F.col(f"nt.{c}") for c in group_cols],
            *[F.col(f"nt.{c}") for c in keep],
            F.col("dl.__delta"),
        )
    )


def _check_state(
    op: str,
    counters: DataFrame,
    totals: DataFrame,
    key_col: str,
    k: int,
) -> None:
    geo = check_state_pair(
        op,
        "mg_summary",
        _GEO_KEYS,
        ("counters", counters, "cnt"),
        ("totals", totals, "n"),
    )
    check_probe_geometry(
        op,
        _geo(k, key_col),
        geo,
        "a summary truncated at a different k carries different "
        "residual counts and deficit mass — the merged state would be "
        "silently wrong (rebuild the state or match k/key_col)",
    )


def incremental_heavy_refresh(
    counters: DataFrame,
    totals: DataFrame,
    batch: DataFrame,
    key_col: str,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """The refreshed (counters, totals) — the mergeable-MG combine:
    the batch is summarized exactly the same way (exact hash agg +
    deterministic truncate), counter rows union-sum per key, and one
    more truncate brings the merged summary back to ≤ k rows per
    group; n and deficit add (plus the merge truncate's own delta).
    The output IS the next round's state (stamps ride it forward) and
    total deficit stays ≤ N/(k+1) under any refresh chain (module
    docstring) — so the candidate screen never loses a key at the
    threshold. State stamped by :func:`mg_summary` (or a prior
    refresh) is geometry-validated; hand-built state with matching
    geometry is the caller's contract, as everywhere."""
    _check_state(
        "incremental_heavy_refresh", counters, totals, key_col, k
    )
    b_counters, b_totals = mg_summary(batch, key_col, k, group_cols)
    return _merge_summaries(
        [(counters, totals), (b_counters, b_totals)],
        key_col,
        k,
        group_cols,
    )


def mg_merge_groups(
    summaries: list[tuple[DataFrame, DataFrame]],
    key_col: str,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> tuple[DataFrame, DataFrame]:
    """Merge MG summary pairs ACROSS inputs and across any group
    dimensions not in ``group_cols`` — the re-bucketing combine
    completing the family symmetry (`cms_merge_groups` sums cells,
    `bloom_merge_groups` unions bits, `group_priority_rebucket`
    re-ranks priorities, THIS union-sums counters and re-truncates):
    per-(day, ...) summaries, day-filtered by the caller, become "the
    frequent keys of the window" at ≤ inputs·days·k merge cost, no
    rescan of the fact. Every input pair must carry the SAME stamped
    geometry (validated; the dims being dropped are whatever state
    columns are not in ``group_cols``)."""
    if not summaries:
        raise ValueError("mg_merge_groups: need at least one summary")
    for counters, totals in summaries:
        _check_state("mg_merge_groups", counters, totals, key_col, k)
        missing = sorted(
            ({*group_cols, key_col, "cnt"} - set(counters.columns))
            | ({*group_cols, "n", "deficit"} - set(totals.columns))
        )
        if missing:
            raise ValueError(
                f"mg_merge_groups: state lacks columns {missing} — "
                "group_cols must be a subset of the state's own"
            )
    return _merge_summaries(summaries, key_col, k, group_cols)


def _merge_summaries(
    summaries: list[tuple[DataFrame, DataFrame]],
    key_col: str,
    k: int,
    out_groups: tuple[str, ...],
) -> tuple[DataFrame, DataFrame]:
    """union-sum + truncate over already-validated summary pairs,
    projected down to ``out_groups`` (extra state columns are the dims
    being dropped — the re-bucketing path)."""
    geo = _geo(k, key_col)
    cparts = [
        c.select(*out_groups, key_col, "cnt") for c, _ in summaries
    ]
    tparts = [t.select(*out_groups, "n", "deficit") for _, t in summaries]
    cu = cparts[0]
    for c in cparts[1:]:
        cu = cu.unionByName(c)
    tu = tparts[0]
    for t in tparts[1:]:
        tu = tu.unionByName(t)
    summed = cu.groupBy(*out_groups, key_col).agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )
    kept, deltas = _mg_truncate(summed, key_col, k, out_groups)
    counters = kept.withMetadata("cnt", geo)
    base = tu.groupBy(*out_groups).agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("deficit").cast("bigint").alias("deficit"),
    )
    joined = _join_totals(base, deltas, out_groups)
    totals = joined.select(
        *out_groups,
        "n",
        (F.col("deficit") + F.coalesce(F.col("__delta"), F.lit(0)))
        .cast("bigint")
        .alias("deficit"),
    ).withMetadata("n", geo)
    return counters, totals


def heavy_candidates(
    counters: DataFrame,
    totals: DataFrame,
    key_col: str,
    threshold_num: int,
    threshold_den: int,
    k: int,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(*group_cols, key) — every key that COULD exceed
    threshold_num/threshold_den of its group: stored cnt + deficit ≥
    true cnt, so keys with (cnt + deficit)·den ≤ num·n are provably
    light and pruned. A SUPERSET of the true heavy hitters whenever
    k ≥ 2·den/num (deficit ≤ n/(k+1) < num·n/(2·den) — module
    docstring); the caller recounts candidates exactly against the
    fact (broadcast semi-join, the `heavy.py` verify shape) to get
    the HAVING-identical answer."""
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"heavy_candidates: need 0 < num <= den, got {num}/{den}"
        )
    if int(k) * num < 2 * den:
        raise ValueError(
            f"heavy_candidates: k={k} is too small for the "
            f"{num}/{den} threshold — the deficit bound n/(k+1) must "
            f"stay under half the threshold mass (need k >= "
            f"{-(-2 * den // num)}) or the screen can lose a true "
            "heavy hitter"
        )
    _check_state("heavy_candidates", counters, totals, key_col, k)
    if group_cols:
        # null-safe on the group keys (review r18 — a plain key-list
        # join would drop the NULL group's counters, silently voiding
        # the superset guarantee for that group); string aliases per
        # the self-join convention
        joined = (
            counters.alias("ct")
            .join(
                totals.alias("tt"),
                [
                    F.col(f"ct.{c}").eqNullSafe(F.col(f"tt.{c}"))
                    for c in group_cols
                ],
            )
            .select(
                *[F.col(f"ct.{c}") for c in group_cols],
                F.col(f"ct.{key_col}"),
                F.col("ct.cnt"),
                F.col("tt.n"),
                F.col("tt.deficit"),
            )
        )
    else:
        joined = counters.crossJoin(F.broadcast(totals))
    return joined.filter(
        (F.col("cnt") + F.col("deficit")) * den > F.col("n") * num
    ).select(*group_cols, key_col)
