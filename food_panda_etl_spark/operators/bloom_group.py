"""Group-wise Bloom membership probe — the per-group form completing
the sketch family's last symmetry gap: CMS has flat / grouped /
windowed / cross-sketch forms, HLL has flat / grouped / windowed, and
Bloom had flat build+probe plus a grouped BUILD (`bloom_sketch`
already threads ``group_cols``) and the re-bucketing merge
(`bloom_merge_groups`) — but no grouped PROBE: `bloom_probe` and
`bloom_prefilter` deliberately reject grouped sketches ("filter to
ONE group first"), which is right for a handful of groups and wrong
for thousands (per-group filtering re-plans the probe per group).

This module adds the missing form: probe (group, key) pairs against a
grouped sketch in ONE equi-join on (*group_cols, j, b) — "has user u
been seen in THIS day's stream?", "is this shingle in THIS language's
boilerplate set?" — the per-stratum membership question a mixture
pipeline asks at refresh time. Same one-sided contract as the flat
probe: a key present in its group's build ALWAYS probes 1 (no false
negatives — the audit column the declared query carries); a probe
whose group never built a sketch has zero set cells and probes 0 (an
empty set has no members — and no false positives either).

Determinism: the bit cells reuse the CMS affine family (`cms._cell`),
so every per-group verdict is bit-identical in any engine and the
declared query hash-matches the FULL per-group set-bit replay in
DuckDB (`bloom.oracle_bloom_dm_sql` + a GROUP BY threaded through
every stage — the `q_hll_by_group` oracle convention).

Scale: the probe is one equi-join keyed on (group, j, b) — the
grouped sketch is ≤ m_bits rows PER GROUP, so it broadcasts while
groups × m is broadcast-sized and shuffles on the same key otherwise
(the planner's call; no hint is forced here precisely because
groups × m is unbounded), then one per-probe-row agg. The fact side
is touched once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import (
    BLOOM_GEO_KEYS,
    _exploded_cells,
    _validate,
    bloom_geometry,
)
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)


def bloom_probe_by_group(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    group_cols: tuple[str, ...],
    m_bits: int = 4096,
    k_hashes: int = 4,
) -> DataFrame:
    """(*probes.columns, maybe_present int) — 1 iff every one of the
    key's k cells is set IN THE PROBE ROW'S OWN GROUP; one row per
    distinct probe row (the flat `bloom_probe` contract with the group
    threaded through the join and the agg). ``probes`` must carry the
    ``group_cols`` and the key ``col``; (m_bits, k_hashes) MUST match
    the build — validated against the sketch's geometry stamp when
    present (`BLOOM_GEO_KEYS`; unstamped sketches are the family's
    caller contract). NULL keys probe 0 (a
    NULL never matches the equi-join a filter guards); NULL GROUP
    keys match the build's NULL group via the null-safe join keys —
    identical grouping semantics to `bloom_sketch`."""
    width = _validate(m_bits, k_hashes)
    check_probe_geometry(
        "bloom_probe_by_group",
        bloom_geometry(m_bits, k_hashes),
        state_geometry(sketch, "set", BLOOM_GEO_KEYS),
        "probe cells would be read from a different bit space "
        "(rebuild the sketch or match m_bits/k_hashes)",
    )
    if not group_cols:
        raise ValueError(
            "bloom_probe_by_group: group_cols is empty — use bloom_probe "
            "for the flat form"
        )
    want = sorted([*group_cols, "j", "b", "set"])
    if sorted(sketch.columns) != want:
        raise ValueError(
            f"bloom_probe_by_group: sketch has columns "
            f"{list(sketch.columns)}, expected {want} — build with "
            f"bloom_sketch(..., group_cols={tuple(group_cols)})"
        )
    clash = sorted({"j", "b", "set", "__c"} & set(probes.columns))
    if clash:
        raise ValueError(
            f"bloom_probe_by_group: probe columns {clash} collide with "
            "the sketch's reserved (j, b, set) / __c temp — rename first"
        )
    missing = sorted(set(group_cols) - set(probes.columns))
    if missing:
        raise ValueError(
            f"bloom_probe_by_group: probes lack group columns {missing}"
        )
    # ONE cell expansion for build + both probes (`bloom._exploded_cells`
    # — the r16-deferred consolidation, landed r17 with bloom.py's keys
    # in the window; test_matches_flat_probe_per_group remains as the
    # grouped == flat-per-group behavior check).
    exploded = _exploded_cells(probes, col, k_hashes, width, probes.columns)
    # null-safe on the group keys (NULL group == NULL group, the
    # bloom_sketch grouping contract), plain equi on the cell keys
    on = [exploded[g].eqNullSafe(sketch[g]) for g in group_cols] + [
        exploded["j"] == sketch["j"],
        exploded["b"] == sketch["b"],
    ]
    hits = exploded.join(sketch, on, "left")
    return (
        hits.groupBy(*[exploded[c] for c in probes.columns])
        .agg(
            (
                F.count_distinct(
                    F.when(sketch["set"].isNotNull(), exploded["j"])
                )
                == k_hashes
            )
            .cast("int")
            .alias("maybe_present")
        )
    )
