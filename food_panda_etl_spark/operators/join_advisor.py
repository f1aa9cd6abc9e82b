"""Sketch-driven equi-join strategy advice — the composition the
sketch family exists for: decide broadcast / shuffle / salted-shuffle
for a planned join from BOUNDED summaries, without running the join
to find out it was the wrong shape. (Spark's own AQE re-plans at
runtime from shuffle statistics — AFTER paying for the map stages;
this answers at plan time.)

Inputs per side: ONE CMS sketch (`operators/cms.py`) — which already
carries the row count (every depth row sums to n, so n_a/n_b are read
from the d=0 cells, no extra scan on top of the sketch) — plus the
exact Misra-Gries heavy hitters (`operators/heavy.py`) for the
top-key frequency. When a pipeline MAINTAINS these summaries
(per-partition / per-day, cf. `tests/test_streaming_sketches.py`),
pass them in via ``sketch_x`` / ``top_x`` and the advisor touches
neither fact at all — zero rescans; from raw DataFrames it costs one
CMS pass plus one Misra-Gries pass per side. NULL join keys are
excluded from every summary (a NULL never matches an equi-join), so
``n_a``/``n_b`` are NON-NULL-key row counts — consistent with the
skew test's denominator; a side dominated by NULL keys can therefore
read "broadcast" while its raw row count is far larger, which is the
RIGHT call for the rows that actually participate in the join (the
caller handles null routing separately, e.g. a null-splitting outer
join). The verdict columns and the decision are PURE INTEGERS end to
end:

- ``est_join_size``: `cms_inner_product` (never under, the
  Cormode-Muthukrishnan §4.2 one-sided bound) — the join's output
  volume, the number the shuffle will pay for;
- ``top_cnt_x``: the exact count of side x's most frequent key IF it
  exceeds n/64, else 0 — `heavy_hitters(fraction=1/64)` returns
  exactly the keys with cnt > n/64 (output == GROUP BY ... HAVING
  under any partitioning, the operator's proven contract), and 1/64
  is a POWER OF TWO so the operator's double compare cnt > n/64.0 is
  bit-equivalent to the oracle's integer cnt·64 > n (division by 2^6
  is exact for n < 2^53);
- ``advice``: broadcast if either side fits
  (min(n) ≤ broadcast_rows — a row-count proxy for Spark's byte
  threshold, documented as such), else salted shuffle if either
  side's top key holds ≥ skew_num/skew_den of its rows
  (top·den ≥ n·num, integer), else plain shuffle.

Every component is SQL-replayable (the CMS cell grid, the
HAVING-equivalent heavy hitters, integer CASE logic), so the whole
advisor oracles exactly — the driver hash-match covers the DECISION,
not just the inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import (
    CMS_GEO_KEYS,
    cms_geometry,
    cms_sketch,
)
from food_panda_etl_spark.operators.cms_inner import cms_inner_product
from food_panda_etl_spark.operators.heavy import heavy_hitters
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)

#: Broadcast row-count proxy. Spark's real gate is BYTES
#: (autoBroadcastJoinThreshold); a planner integrating this advisor
#: would multiply by an avg-row-width estimate — the decision SHAPE is
#: what the oracle pins.
BROADCAST_ROWS = 10_000

#: Salt when one key holds ≥ 1/8 of its side. 8 and the 64 in the
#: candidate fraction are powers of two — see module docstring.
SKEW_NUM, SKEW_DEN = 1, 8
_HH_FRACTION = 1.0 / 64.0


def _top_count(df: DataFrame, key: str) -> DataFrame:
    """One row (c bigint): the exact count of the most frequent key if
    it exceeds n/64, else 0 — candidates from the Misra-Gries pass,
    never a vocabulary-wide shuffle."""
    keyed = df.select(F.col(key).alias("__k")).filter(
        F.col("__k").isNotNull()
    )
    return _top_from_hh(heavy_hitters(keyed, "__k", fraction=_HH_FRACTION))


def _top_from_hh(hh: DataFrame) -> DataFrame:
    """One row (c bigint) from a maintained heavy-hitters summary
    (`heavy_hitters(fraction=1/64)` shape: a ``cnt`` column of exact
    counts for every key above n/64) — the zero-rescan reduction."""
    return hh.agg(
        F.coalesce(F.max("cnt"), F.lit(0)).cast("bigint").alias("c")
    )


def _n_from_sketch(sk: DataFrame) -> DataFrame:
    """One row (n bigint) from the d=0 cells — every depth row of a
    CMS sums to the sketched row count, so the count rides the sketch
    for free (no extra scan of the side)."""
    return sk.filter(F.col("d") == 0).agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("n")
    )


def _grid_check(sk: DataFrame, width: int, depth: int, label: str) -> None:
    """RAISES when a supplied maintained sketch does not sit on the
    requested (width, depth) grid (ADVICE r16): ``max(d) == depth-1``
    exactly (every key populates every depth row, so any non-empty
    sketch has all depth rows) and ``max(b) < width`` (cells may be
    sparse, so width is screened one-sided — a sketch built WIDER than
    requested is certain to be caught, one built narrower is
    indistinguishable from sparsity). An EMPTY sketch passes (an empty
    side is a legitimate broadcast verdict).

    DRIVER-SIDE (ADVICE r17): one bounded 2-number collect over the
    ≤ width·depth-row sketch — never a fact scan. The r16 form was an
    in-plan F.assert_true riding a crossJoin, which survived only
    because Catalyst cannot yet prune the 1-row join feeding an
    always-NULL filter; a future optimizer improvement would have
    silently dropped the guard. A deterministic plan-construction-time
    check cannot be optimized away, and the existing execution-time
    tests pin the raise either way."""
    row = sk.agg(F.max("d").alias("d"), F.max("b").alias("b")).collect()[0]
    if row.d is None:
        return
    if row.d != depth - 1 or row.b >= width:
        raise ValueError(
            f"join_advice: {label} grid mismatch — maintained sketch "
            f"has max d={row.d}, max b={row.b} but the requested "
            f"geometry is width={width}, depth={depth}; "
            f"cms_inner_product and the d=0 row counts would be "
            f"silently wrong (rebuild the sketch at this geometry or "
            f"pass its own width/depth)"
        )


def join_advice(
    a: DataFrame,
    key_a: str,
    b: DataFrame,
    key_b: str,
    join_id: str = "join",
    width: int = 1024,
    depth: int = 4,
    broadcast_rows: int = BROADCAST_ROWS,
    skew_num: int = SKEW_NUM,
    skew_den: int = SKEW_DEN,
    sketch_a: DataFrame | None = None,
    sketch_b: DataFrame | None = None,
    top_a: DataFrame | None = None,
    top_b: DataFrame | None = None,
    check_grid: bool = True,
) -> DataFrame:
    """ONE row (join_id, n_a, n_b, est_join_size, top_cnt_a,
    top_cnt_b, advice) for the planned equi-join a.key_a == b.key_b.
    See the module docstring for the decision contract; every column
    is integer-exact and the whole row oracles.

    ``sketch_x`` (a `cms_sketch` frame at the SAME width/depth over
    the side's non-null keys) and ``top_x`` (a `heavy_hitters`
    frame at fraction 1/64) are optional MAINTAINED summaries: when
    all four are supplied neither fact is scanned at all (the
    zero-rescan mode — ADVICE r15); any omitted summary is built here
    with one pass over its side. Supplied sketches are geometry-checked
    against (width, depth):

    - STAMPED sketches (`cms_sketch` output since the r18 stamp —
      `CMS_GEO_KEYS` column metadata) are checked EXACTLY and lazily
      at plan-construction time, including the one mode the
      observational check cannot see: a sketch built NARROWER than
      requested has every cell inside the requested bounds —
      indistinguishable from sparsity, but not from its stamp
      (VERDICT r17 task 4);
    - UNSTAMPED sketches (older checkpoints, ad-hoc frames) fall back
      to the observational grid check — ONE bounded 2-number
      driver-side collect per sketch, an EAGER action over the
      ≤ width·depth-row summary, never a fact scan (ADVICE r16/r17:
      the deterministic driver-side form cannot be optimized away the
      way the r16 in-plan assert could). ``check_grid=False`` skips
      THIS eager fallback for plan-only callers needing full laziness
      (ADVICE r17, the edit_join degenerate_factor=0 convention) —
      same-geometry then reverts to the caller's contract; stamped
      sketches are still validated (free, no action)."""
    if not (0 < skew_num <= skew_den):
        raise ValueError(
            f"join_advice: need 0 < skew_num <= skew_den, "
            f"got {skew_num}/{skew_den}"
        )
    if skew_num * 64 <= skew_den:
        # heavy_hitters(fraction=1/64) reports ONLY keys STRICTLY
        # above n/64 while the salt test uses ≥, so a bar of exactly
        # 1/64 still misses a key sitting exactly AT n/64 (the silent
        # boundary mode review r16 caught in the first < form of this
        # guard) — the bar must be strictly coarser than the candidate
        # fraction. Fail loudly instead (ADVICE r16).
        raise ValueError(
            f"join_advice: skew bar {skew_num}/{skew_den} is not "
            f"strictly coarser than the heavy-hitter candidate fraction "
            f"1/64 — keys at or between the two thresholds would be "
            f"invisible (top_cnt=0, never salted); use "
            f"skew_num/skew_den > 1/64"
        )
    sk_a = (
        sketch_a
        if sketch_a is not None
        else cms_sketch(a, key_a, width=width, depth=depth)
    ).localCheckpoint(eager=False)
    sk_b = (
        sketch_b
        if sketch_b is not None
        else cms_sketch(b, key_b, width=width, depth=depth)
    ).localCheckpoint(eager=False)
    # geometry guards for SUPPLIED sketches only (built ones match by
    # construction, and the no-summaries plan stays fully lazy and
    # byte-identical): the stamp check is exact and lazy; the eager
    # driver-side collect is the fallback for unstamped sketches (its
    # collect also materializes the checkpoint the downstream estimate
    # reuses), skippable via check_grid=False for plan-only callers
    for label, supplied, sk in (
        ("sketch_a", sketch_a, sk_a),
        ("sketch_b", sketch_b, sk_b),
    ):
        if supplied is None:
            continue
        geo = state_geometry(supplied, "cnt", CMS_GEO_KEYS)
        if geo is not None:
            check_probe_geometry(
                f"join_advice: {label}",
                cms_geometry(width, depth),
                geo,
                "cms_inner_product and the d=0 row counts would be "
                "silently wrong (rebuild the sketch at this geometry "
                "or pass its own width/depth)",
            )
        elif check_grid:
            _grid_check(sk, width, depth, label)
    est = cms_inner_product(sk_a, sk_b)
    na = _n_from_sketch(sk_a)
    nb = _n_from_sketch(sk_b)
    ta = _top_from_hh(top_a) if top_a is not None else _top_count(a, key_a)
    tb = _top_from_hh(top_b) if top_b is not None else _top_count(b, key_b)
    skew = (F.col("__ta") * skew_den >= F.col("n_a") * skew_num) | (
        F.col("__tb") * skew_den >= F.col("n_b") * skew_num
    )
    out = (
        na.select(F.col("n").alias("n_a"))
        .crossJoin(F.broadcast(nb.select(F.col("n").alias("n_b"))))
        .crossJoin(F.broadcast(est))
        .crossJoin(F.broadcast(ta.select(F.col("c").alias("__ta"))))
        .crossJoin(F.broadcast(tb.select(F.col("c").alias("__tb"))))
    )
    return (
        out
        .select(
            F.lit(join_id).alias("join_id"),
            "n_a",
            "n_b",
            F.col("est").alias("est_join_size"),
            F.col("__ta").alias("top_cnt_a"),
            F.col("__tb").alias("top_cnt_b"),
            F.when(
                F.least("n_a", "n_b") <= F.lit(broadcast_rows), "broadcast"
            )
            .when(skew, "shuffle_salt")
            .otherwise("shuffle")
            .alias("advice"),
        )
    )
