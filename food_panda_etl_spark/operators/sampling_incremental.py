"""Incremental group-wise priority sampling — the maintained-state
face of `operators/sampling_group.py::group_priority_sample`,
completing the incremental-refresh symmetry for the SAMPLING family
(sketches got their maintained faces in the CMS/HLL/Bloom state
suites; the dedup/similarity screens in incremental_neardup /
incremental_embed / incremental_containment / incremental_icws; this
is the same question for samples: "keep a ≤ k-row weighted sample per
group CURRENT as batches arrive, without rescanning the corpus").
The module carries BOTH faces the sketch families have: the
incremental refresh (:func:`incremental_group_priority_sample`) and
the re-bucketing combine (:func:`group_priority_rebucket` — per-day
fine-group samples re-ranked across a dropped dimension, the
trailing-window question).

Why it works (the mergeable bottom-k identity the batch operator
already documents and property-tests): priority sampling is weighted
bottom-k on priority = h(id)/w — a pure function of the row — so
    bottomk(S ∪ B) == bottomk(bottomk(S) ∪ bottomk(B))
per group. The maintained state IS the current sample (≤ k rows per
group, the `group_priority_sample` output shape with its priorities);
a refresh computes priorities for the BATCH rows only, unions the two
≤ k / ≤ batch-sized frames, and re-ranks — O(batch + k·groups) work
per refresh, zero corpus rescans, and the result is row-identical to
re-sampling corpus ∪ batch from scratch (the declared query's oracle
replays exactly that full-union row_number — the hash-match IS the
merge theorem).

Determinism: priorities ride the state (ONE IEEE division of
integer-derived doubles at first sight of each row — recomputing them
on refresh would be identical anyway, the expression is a pure
function of (id, w), but carrying them keeps refreshes
projection-free); the re-rank orders by (priority, id), total while
ids are unique per group across state ∪ batch — the SAME caller
contract as the batch sampler's merge recipe (dedup (group, id)
first on overlapping shards; a re-ingested id with a CHANGED weight
is two different rows and must be resolved upstream — CDC-apply
`operators/diff.py::upsert` exists for exactly that).

Scale: the union is ≤ k·groups + batch rows; the re-rank's window
rewrites to WindowGroupLimit exactly like the batch sampler
(per-partition partial top-k heaps before the shuffle), so a refresh
moves ≤ k rows per (group, partition). The batch side pre-truncates
to its own ≤ k per group FIRST (the merge identity's right-hand side)
— a 100× over-k batch contributes k rows per group to the union, not
its whole self.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.sampling_group import (
    group_priority_sample,
)
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)

_GEO_KEYS = ("k", "group_cols", "id_col", "sampler")
# bump when the sampler's hash/priority semantics change — state from
# an older sampler must fail the refresh's geometry check
_SAMPLER = "sampling_group.group_priority_sample/v1"


def _sample_geo(
    k: int, group_cols: tuple[str, ...], id_col: str
) -> dict:
    """The sampling family's geometry stamp (ADVICE r17: the same-k
    contract was docstring-only — a state truncated at a smaller k
    silently yields a wrong sample). group_cols ride as ONE
    comma-joined string: metadata survives a json round-trip and a
    flat string dodges list-vs-tuple type drift across it."""
    return {
        "k": int(k),
        "group_cols": ",".join(group_cols),
        "id_col": str(id_col),
        "sampler": _SAMPLER,
    }


def build_group_priority_state(
    df: DataFrame,
    group_cols: tuple[str, ...],
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """`group_priority_sample` with the sampling geometry (k,
    group_cols, id_col, sampler version) stamped as column metadata on
    ``priority`` (the sampler-owned column — the stamp survives
    select/checkpoint/parquet, `operators/state_geometry.py`) — the
    ``build_*_state`` face of the sampling family: state built here
    and probed by :func:`incremental_group_priority_sample` or
    :func:`group_priority_rebucket` at a mismatched geometry fails
    loudly instead of silently yielding a wrong sample (a state
    truncated at a smaller k has already discarded rows; a different
    id_col or grouping re-ranks a different population). Hand-built
    `group_priority_sample` output (no stamp) stays accepted with
    matching geometry as the CALLER's contract, as everywhere in the
    incremental family."""
    return group_priority_sample(
        df, group_cols, weight_col, k, id_col, carry_cols
    ).withMetadata("priority", _sample_geo(k, group_cols, id_col))


def group_priority_rebucket(
    state: DataFrame,
    group_cols: tuple[str, ...],
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Re-rank a `group_priority_sample` state sampled at FINER groups
    down to ``group_cols`` — the RE-BUCKETING combine completing the
    family symmetry with the sketches (`cms_merge_groups` sums cells,
    `hll_merge_groups` maxes registers, `bloom_merge_groups` unions
    bits, THIS re-ranks priorities): per-day (day, g) samples →
    "a weighted sample of the last N days per g" after the caller's
    day filter, at ≤ days·groups·k re-rank cost, NO rescan of the
    fact. Correct because being among the k smallest priorities of the
    whole window-group implies being among the k smallest of its own
    finer group (priorities are row-pure), so the coarse bottom-k is
    contained in the union of fine bottom-k's — the same identity the
    incremental refresh rides, across a dropped dimension instead of
    across time.

    ``state`` must carry ``group_cols``, ``id_col``, ``carry_cols``
    and the sampler's (weight, priority, rk) columns; EXTRA columns
    are the dims being dropped (checked via the family's shared
    `check_merge_columns` — subset semantics plus the
    duplicated-column guard). The state's own per-fine-group k must be
    ≥ this ``k`` (a state truncated below it has already discarded
    candidate rows — validated against the stamp when the state came
    from :func:`build_group_priority_state` or a refresh, ADVICE r17;
    the caller's contract when hand-built), and
    ids must be unique per COARSE group: dropping a dimension
    re-introduces duplicate ids by construction whenever the same id
    was sampled in several fine groups, and while (weight, priority)
    are row-pure (identical for every copy), copies differing in
    ``carry_cols`` tie exactly on (priority, id) and their relative
    rank — including which survives at the k boundary — would be
    partitioning-dependent (review r17). Dedup
    ``dropDuplicates([*group_cols, id_col])`` first when the dropped
    dimension can repeat ids with distinct carries; with no
    carry_cols the copies are identical rows and any one surviving is
    the same answer. Returns the `group_priority_sample` output shape
    at the coarse grouping."""
    from food_panda_etl_spark.operators.sketch_checks import (
        check_merge_columns,
    )

    if int(k) < 1:
        raise ValueError(
            f"group_priority_rebucket: k must be >= 1, got {k!r}"
        )
    if not group_cols:
        raise ValueError(
            "group_priority_rebucket: group_cols must be non-empty — "
            "re-bucketing to the global sample is priority_sample's job"
        )
    want = [*group_cols, id_col, *carry_cols, "weight", "priority", "rk"]
    check_merge_columns("group_priority_rebucket", set(want), [state])
    geo = state_geometry(state, "priority", _GEO_KEYS)
    if geo is not None:
        fine_groups = set(str(geo["group_cols"]).split(","))
        problems = []
        if int(geo["k"]) < int(k):
            problems.append(
                f"state was truncated at k={geo['k']} < requested "
                f"k={k} — rows ranked {int(geo['k']) + 1}..{k} were "
                "already discarded and a sample cannot be widened"
            )
        if not set(group_cols) <= fine_groups:
            problems.append(
                f"requested groups {sorted(group_cols)} are not a "
                f"subset of the state's fine groups "
                f"{sorted(fine_groups)} — re-bucketing only DROPS "
                "dimensions"
            )
        if str(geo["id_col"]) != str(id_col) or geo["sampler"] != _SAMPLER:
            problems.append(
                f"state rows were ranked by ({geo['id_col']}, "
                f"{geo['sampler']}), probe asks ({id_col}, {_SAMPLER})"
            )
        if problems:
            raise ValueError(
                "group_priority_rebucket: probe geometry does not "
                f"match the supplied state's {geo}: "
                + "; ".join(problems)
                + " (rebuild the state or match the parameters)"
            )
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        "priority", id_col
    )
    out = (
        state.select(*[c for c in want if c != "rk"])
        .withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= int(k))
        .select(*want)
    )
    # propagate the stamp only when the INPUT carried one (review r18:
    # stamping hand-built state would fabricate builder provenance —
    # the exact false confidence the stamp exists to prevent; the
    # bloom/cms combines' convention)
    if geo is not None:
        out = out.withMetadata(
            "priority", _sample_geo(k, group_cols, id_col)
        )
    return out


def incremental_group_priority_sample(
    state: DataFrame,
    batch: DataFrame,
    group_cols: tuple[str, ...],
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The refreshed per-group weighted sample — row-identical to
    ``group_priority_sample(corpus ∪ batch, ...)`` while ``state`` is
    the maintained sample of the corpus (the merge theorem, module
    docstring). Returns the state SHAPE (*group_cols, id_col,
    *carry_cols, weight bigint, priority double, rk int), so the
    output IS the next round's state.

    ``state`` must be a `group_priority_sample`-shaped frame at the
    SAME (group_cols, id_col, carry_cols, k) — shape is validated
    here, and state stamped by :func:`build_group_priority_state` (or
    a prior refresh — the output carries the stamp forward) is
    geometry-validated: a state truncated at a SMALLER k has already
    discarded rows rank k'+1..k and cannot be widened, so a mismatched
    k/grouping/id raises (ADVICE r17 — previously docstring-only).
    Unstamped state is accepted with matching geometry as the caller's
    contract. ``batch`` is raw rows carrying
    ``weight_col``; ids must be unique per group across state ∪ batch
    (the batch sampler's documented merge contract)."""
    if int(k) < 1:
        raise ValueError(
            f"incremental_group_priority_sample: k must be >= 1, got {k!r}"
        )
    if not group_cols:
        raise ValueError(
            "incremental_group_priority_sample: group_cols must be "
            "non-empty — for a global sample keep a flat priority state"
        )
    want = [*group_cols, id_col, *carry_cols, "weight", "priority", "rk"]
    if list(state.columns) != want:
        raise ValueError(
            f"incremental_group_priority_sample: state has columns "
            f"{list(state.columns)}, expected {want} — the "
            "group_priority_sample output shape at the same "
            "(group_cols, id_col, carry_cols)"
        )
    geo = state_geometry(state, "priority", _GEO_KEYS)
    check_probe_geometry(
        "incremental_group_priority_sample",
        _sample_geo(k, group_cols, id_col),
        geo,
        "a state truncated at a smaller k has already discarded rows "
        "and cannot be widened, and a different grouping/id ranks a "
        "different population (rebuild the state or match the "
        "parameters)",
    )
    # the merge identity's right-hand side: pre-truncate the batch to
    # its own ≤ k per group before the union (batch-sized work, and a
    # huge batch contributes ≤ k rows per group downstream)
    b = group_priority_sample(
        batch, group_cols, weight_col, k, id_col, carry_cols
    )
    merged = state.drop("rk").unionByName(b.drop("rk"))
    w = Window.partitionBy(*[F.col(c) for c in group_cols]).orderBy(
        "priority", id_col
    )
    out = (
        merged.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= int(k))
        .select(*want)
    )
    if geo is not None:  # propagate, never fabricate (review r18)
        out = out.withMetadata(
            "priority", _sample_geo(k, group_cols, id_col)
        )
    return out
