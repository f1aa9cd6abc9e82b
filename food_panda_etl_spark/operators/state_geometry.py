"""ONE definition of the incremental-family state-geometry contract
(ADVICE r17 — the stamp/validate block had grown near-verbatim copies
across `incremental_embed.py`, `incremental_containment.py`, and
`incremental_icws.py`, against the repo's one-definition/no-drift
convention; this module is the single home, a NEW module rather than
`sketch_checks.py` so the merge-shape helper's importers stay
byte-identical to their recorded evidence).

The contract: every maintained-state operator stamps its build
parameters (its GEOMETRY — gram size, hash family, band split, seed,
builder version, ...) as column metadata on the state frames it
returns. `df.withMetadata(col, geo)` survives selects, aliases,
checkpoints, AND a parquet round-trip, so the stamp rides the state
through persistence — and the probe side validates it, so state built
at one geometry can never be silently probed at another (mismatched
probes yield wrong-but-plausible values: intersections counted across
gram sizes, band values from different plane families, samples
truncated below the requested k — never an error, unless stamped).

Hand-built (unstamped) state stays accepted with matching geometry as
the CALLER's contract — the stamp is a safety net for the
``build_*_state`` path, not a new input requirement; every consumer
documents this and tests pin it (the `test_hand_built_state_still_
accepted` convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def state_geometry(
    df: DataFrame, col: str, keys: tuple[str, ...]
) -> dict | None:
    """The geometry dict stamped on ``col`` by a ``build_*_state``
    builder, or None for hand-built state (older checkpoints, ad-hoc
    frames — no stamp, or a stamp missing any of ``keys``)."""
    try:
        meta = df.schema[col].metadata
    except KeyError:
        return None
    if not meta or any(k not in meta for k in keys):
        return None
    return {k: meta[k] for k in keys}


def check_state_pair(
    op_name: str,
    builder_name: str,
    keys: tuple[str, ...],
    a: tuple[str, DataFrame, str],
    b: tuple[str, DataFrame, str],
) -> dict | None:
    """Validate that the two frames of a ``build_*_state`` pair carry
    the SAME stamped geometry (a mixed pair from two different builds
    would probe one frame's index against the other frame's value
    domain) and return it — or None when neither frame is stamped.
    ``a``/``b`` are (caller-facing frame name, frame, stamped column).
    One-sided stamps return the stamped side's geometry (the unstamped
    side is then the caller's contract, as everywhere)."""
    name_a, df_a, col_a = a
    name_b, df_b, col_b = b
    geo_a = state_geometry(df_a, col_a, keys)
    geo_b = state_geometry(df_b, col_b, keys)
    if geo_a is not None and geo_b is not None and geo_a != geo_b:
        raise ValueError(
            f"{op_name}: {name_a} and {name_b} carry different "
            f"geometries ({geo_a} vs {geo_b}) — they are not the same "
            f"{builder_name} pair"
        )
    return geo_a or geo_b


def check_uniform_geometry(
    op_name: str,
    keys: tuple[str, ...],
    inputs: list[tuple[str, DataFrame, str]],
    combine_desc: str,
) -> dict | None:
    """Validate that every STAMPED input of an n-ary combine
    (merge/intersect/inner-product) carries the same geometry and
    return it — None when no input is stamped (same-geometry is then
    the caller's contract, as everywhere). Inputs are (caller-facing
    name, frame, stamped column); unstamped inputs are skipped, so a
    mixed stamped/unstamped batch validates the stamped subset only.
    ``combine_desc`` names what would silently go wrong."""
    found: dict | None = None
    found_name = ""
    for name, df, col in inputs:
        geo = state_geometry(df, col, keys)
        if geo is None:
            continue
        if found is not None and geo != found:
            raise ValueError(
                f"{op_name}: {found_name} and {name} carry different "
                f"geometries ({found} vs {geo}) — {combine_desc}"
            )
        if found is None:
            found, found_name = geo, name
    return found


def check_probe_geometry(
    op_name: str, asked: dict, geo: dict | None, consequence: str
) -> None:
    """Raise when a probe's requested geometry differs from the
    supplied state's stamp; no-op for unstamped state (``geo`` None —
    matching geometry is then the caller's contract). ``consequence``
    names what would silently go wrong, plus the remedy."""
    if geo is not None and asked != geo:
        raise ValueError(
            f"{op_name}: probe geometry {asked} does not match the "
            f"supplied state's {geo} — {consequence}"
        )
