"""Incremental HyperLogLog — the maintained-state refresh face of the
DISTINCT-sketch family, closing the LAST gap in the incremental matrix
(`cms_incremental.py` is its frequency-side twin; module docstring
there lists the full matrix). HLL registers merge by MAX —
sketch(A ∪ B) ≡ merge(sketch(A), sketch(B)), the mergeable-summaries
property `hll.hll_merge` already provides and property-tests — so the
face is deliberately THIN: sketch the batch with the ONE register
builder, combine with the ONE register-max merge (no drift), and the
refreshed output is the next round's state, IDENTICAL to the
from-scratch sketch of corpus ∪ batch under any refresh chain. The
declared query's hash-match (the full register replay — the
`q_hll_counts` oracle family) is that identity.

What this face ADDS over the raw merge is the geometry-stamp
discipline the rest of the incremental family carries
(`operators/state_geometry.py`) and plain HLL sketches lack: `hll.py`
validates column SHAPE and the estimate's rank-range guard catches the
xxhash64-into-portable direction downstream, but state built at a
DIFFERENT m — or with the other mixer in the portable direction — is
shape-identical and would max into garbage with no error across a
parquet round-trip. :func:`build_hll_state` stamps (m, mixer, builder
version) as column metadata on the register table (survives selects /
checkpoints / parquet — the family convention) and the refresh
validates it on every batch; hand-built unstamped state stays accepted
with matching geometry as the caller's contract, as everywhere.

Streamed maintenance of exactly this combine is already proven over
versioned parquet (`tests/test_streaming_sketches.py` drives
`hll_merge` per micro-batch); this face is the batch-side operator
those pipelines name.

Scale: a refresh touches the BATCH once (one register hash agg,
map-side combined — the key never shuffles, only (group, reg, rho))
and re-aggregates ≤ 2·|groups|·m state rows — never the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from food_panda_etl_spark.operators.hll import (
    HLL_M,
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)

HLL_STATE_GEO_KEYS = ("m", "mixer", "summarizer")
# bump when the register rule (mix, rank grid) changes — state from an
# older builder must fail the refresh's geometry check
_SUMMARIZER = "hll_incremental.registers/v1"


def hll_state_geometry(m: int, mixer: str) -> dict:
    """The metadata dict :func:`build_hll_state` stamps and the
    refresh validates (unstamped sketches stay accepted with matching
    geometry as the CALLER's contract — the incremental-state
    convention)."""
    return {"m": int(m), "mixer": str(mixer), "summarizer": _SUMMARIZER}


def build_hll_state(
    df: DataFrame,
    key_col: str,
    m: int = HLL_M,
    group_cols: tuple[str, ...] = (),
    mixer: str = "portable",
) -> DataFrame:
    """`hll.hll_sketch` with the state stamp — the ≤ |groups|·m-row
    register table that begins a refresh chain. All sketch semantics
    (NULL keys filtered, NULL groups their own group, mixer grids)
    are the ONE builder's; this adds only the stamp."""
    return hll_sketch(df, key_col, m, group_cols, mixer).withMetadata(
        "rho", hll_state_geometry(m, mixer)
    )


def incremental_hll_refresh(
    state: DataFrame,
    batch: DataFrame,
    key_col: str,
    m: int = HLL_M,
    group_cols: tuple[str, ...] = (),
    mixer: str = "portable",
) -> DataFrame:
    """The refreshed register state — register-wise MAX of the state
    with the batch sketch (the `hll_merge` combine; column shape
    validated there, geometry validated against the stamp HERE —
    same-m same-mixer state merged at a different declared geometry,
    or state from a different builder version, raises instead of
    maxing rank grids into garbage). The output carries the stamp
    forward and estimates exactly like any `hll_sketch` result
    (`hll.hll_estimate` with the SAME m/mixer)."""
    check_probe_geometry(
        "incremental_hll_refresh",
        hll_state_geometry(m, mixer),
        state_geometry(state, "rho", HLL_STATE_GEO_KEYS),
        "registers from a different (m, mixer) rank space would max "
        "into garbage — estimates silently wrong at production "
        "cardinalities only (rebuild the state or match m/mixer)",
    )
    b = hll_sketch(batch, key_col, m, group_cols, mixer)
    return hll_merge(state, b, group_cols=group_cols).withMetadata(
        "rho", hll_state_geometry(m, mixer)
    )


def hll_state_estimate(
    state: DataFrame,
    m: int = HLL_M,
    group_cols: tuple[str, ...] = (),
    mixer: str = "portable",
) -> DataFrame:
    """`hll.hll_estimate` with the stamp validated first (review r18:
    the refresh path alone validating the stamp leaves the estimate
    open to the exact mode the stamp exists to close — stamped m=256
    state read at m=128 passes the rank-range guard, since a smaller
    m has a LARGER cap on the portable grid, and yields a
    plausibly-positive but wrong estimate: wrong alpha, wrong m², and
    a wrong absent-register term). All estimator semantics are the
    ONE `hll_estimate`'s; this adds only the check — use it whenever
    the input is maintained state, `hll_estimate` directly for
    throwaway sketches you just built."""
    check_probe_geometry(
        "hll_state_estimate",
        hll_state_geometry(m, mixer),
        state_geometry(state, "rho", HLL_STATE_GEO_KEYS),
        "the estimator's alpha/m²/absent-register arithmetic would run "
        "on a different register space — plausibly-positive but wrong, "
        "never an error (match m/mixer to the state's stamp)",
    )
    return hll_estimate(state, m, group_cols, mixer)
