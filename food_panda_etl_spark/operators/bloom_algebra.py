"""Bloom set algebra — the AND combine completing the membership
family's cross-sketch symmetry (`queries/cross_sketches.py` gives HLL
its intersection gate; CMS has the cross-sketch join-size inner
product; Bloom had only the OR merge `bloom_merge` /
`bloom_merge_groups`). The intersection question at 100 TB: "has this
key been seen in BOTH corpora / BOTH windows?" — retention overlap,
cross-dataset contamination, repeat-visitor membership — answered
from two ≤ m-row summaries with NO rescan of either fact.

Soundness (the classic result, e.g. Broder & Mitzenmacher's Bloom
filter survey, Internet Mathematics 2004 §5): bitwise AND of two
same-geometry filters contains every bit of the filter built directly
from A ∩ B — a key in both sets has all k cells set in BOTH inputs,
so the AND keeps them and the probe answers 1: NO false negatives for
the intersection, the family's one-sided contract preserved. The
price is a false-positive rate ABOVE the direct build's (a cell can
be set in both filters by different keys — bits(A) ∧ bits(B) ⊇
bits(A ∩ B), strictly when distinct keys collide cell-wise), so the
AND is a SCREEN: exact confirmation joins run on survivors only,
exactly the `bloom_prefilter` discipline.

Representation: the partitioned sketch IS a (j, b) relation of set
bits (`operators/bloom.py`), so bitwise AND == row-set INTERSECTION —
one count-filtered aggregation over the unioned rows (a key row
survives iff present in ALL n inputs), mergeable and engine-neutral.
Determinism: cells are the CMS affine family, so the AND table, every
probe verdict, and the audit are bit-identical in any engine — the
declared query hash-matches the FULL replay of both sides' bits ANDed
in SQL, not just a gate verdict.

Scale: each input is ≤ m rows per group (geometry-bounded, never
fact-sized); the combine shuffles ≤ n·m rows keyed on (group, j, b);
the probe stays `bloom_probe`'s broadcast equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import BLOOM_GEO_KEYS
from food_panda_etl_spark.operators.sketch_checks import check_merge_columns
from food_panda_etl_spark.operators.state_geometry import (
    check_uniform_geometry,
)


def bloom_intersect(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Bitwise-AND of any number of same-geometry sketches == the
    set-bit rows present in ALL of them — ≥ the direct sketch of the
    key-set intersection (no false negatives; see module docstring).
    Same caller contracts as `bloom_merge_groups`: identical (m_bits,
    k_hashes) geometry — validated EXACTLY when the inputs carry the
    r18 geometry stamp (`BLOOM_GEO_KEYS`, ADVICE r17; unstamped inputs
    remain the caller's contract), shape checked via the shared
    `check_merge_columns` (subset semantics — extra columns are dims
    being dropped; duplicated needed columns rejected loudly). With
    ``group_cols``, bits AND within each group INDEPENDENTLY (a group
    absent from any input has no all-input rows and probes 0 — an
    empty intersection has no members). Needs ≥ 2 sketches: the AND of
    one input is itself, and a silent identity pass would hide a
    caller bug (review convention: fail loudly)."""
    if len(sketches) < 2:
        raise ValueError(
            "bloom_intersect: need at least two sketches — the AND of "
            "one input is the input itself (use it directly)"
        )
    check_merge_columns(
        "bloom_intersect", {*group_cols, "j", "b", "set"}, sketches
    )
    # geometry stamps (ADVICE r17 #4 — THE bloom_intersect failure
    # mode: two same-SHAPED sketches built at different widths AND to
    # a meaningless near-empty bit table with no error): every stamped
    # input must agree; the common stamp rides the output so the
    # downstream probe stays validated
    geo = check_uniform_geometry(
        "bloom_intersect",
        BLOOM_GEO_KEYS,
        [(f"sketch #{i}", s, "set") for i, s in enumerate(sketches)],
        "bits from different (m_bits, k_hashes) cell spaces would AND "
        "into a meaningless near-empty table",
    )
    # DISTINCT per input first: naively-unioned shard sketches carry
    # duplicate (j, b) rows whose counts would fake an all-inputs hit
    # (the bloom_prefilter distinct lesson applied to counting)
    parts = [
        s.select(*group_cols, "j", "b", "set").distinct() for s in sketches
    ]
    out = parts[0]
    for s in parts[1:]:
        out = out.unionByName(s)
    anded = (
        out.groupBy(*group_cols, "j", "b")
        .agg(F.count("*").alias("__n"), F.max("set").alias("set"))
        .filter(F.col("__n") == len(sketches))
        .drop("__n")
    )
    if geo is not None:
        anded = anded.withMetadata("set", geo)
    return anded
