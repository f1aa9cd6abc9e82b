"""Incremental count-min sketch — the maintained-state refresh face of
the FREQUENCY-sketch family, the second-to-last gap in the incremental
matrix (every other summary family already has one:
`incremental_neardup/embed/containment/icws`, `sampling_incremental`,
`heavy_incremental`, `histogram_state`; HLL's lands beside this in
`hll_incremental.py`). CMS cells are counters, so the combine is the
LINEAR merge `cms_windowed.py` already provides —
sketch(A ∪ B) = sketch(A) + sketch(B) cell-wise — and this face is
deliberately THIN: summarize the batch with the ONE sketch builder,
merge with the ONE linear combine (no second definition of either —
the no-drift rule), and let `cms_merge_groups`' stamp validation
(VERDICT r17 task 4) enforce that state and batch sketches share a
cell grid. What the face adds is the maintained-state CONTRACT in one
place: the refreshed output is the next round's state, the stamp rides
it forward, and refresh(state(corpus), batch) is IDENTICAL to
sketch(corpus ∪ batch) under any refresh chain — the declared query's
hash-match (the full DuckDB cell replay, the `q_cms_counts` oracle
family) is that identity, not just an estimate gate.

Streamed maintenance of exactly this combine is already proven over
versioned parquet (`tests/test_streaming_sketches.py` drives
`cms_merge_groups` per micro-batch); this face is the batch-side
operator those pipelines name.

Scale: a refresh touches the BATCH once (narrow depth-way explode +
one (group, d, b) hash agg, map-side combined) and re-aggregates
≤ 2·|groups|·width·depth state cells — never the corpus. Estimates
probe the merged ≤ width·depth-row table broadcast (`cms.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from food_panda_etl_spark.operators.cms import (
    CMS_GEO_KEYS,
    cms_geometry,
    cms_sketch,
)
from food_panda_etl_spark.operators.cms_windowed import (
    cms_merge_groups,
    cms_sketch_by_group,
)
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)


def incremental_cms_refresh(
    state: DataFrame,
    batch: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The refreshed (≤ |groups|·width·depth)-row sketch state — the
    CMS linear combine: the batch is sketched on the SAME (width,
    depth) grid and cells union-sum per (*group, d, b). The output IS
    the next round's state (the stamp rides it forward, re-applied by
    the merge) and is IDENTICAL to the from-scratch sketch of
    corpus ∪ batch — CMS is linear, so there is no truncation
    bookkeeping and no repair pass. State stamped by
    `cms.cms_sketch` / `cms_windowed.cms_sketch_by_group` (or a prior
    refresh) is geometry-validated; hand-built state with matching
    geometry is the caller's contract, as everywhere."""
    check_probe_geometry(
        "incremental_cms_refresh",
        cms_geometry(width, depth),
        state_geometry(state, "cnt", CMS_GEO_KEYS),
        "batch cells would sum into a different cell grid — every "
        "downstream estimate silently wrong, never an error (rebuild "
        "the state or match width/depth)",
    )
    if group_cols:
        b = cms_sketch_by_group(batch, col, group_cols, width, depth)
    else:
        b = cms_sketch(batch, col, width, depth)
    return cms_merge_groups(
        state, b, group_cols=group_cols, width=width, depth=depth
    )
