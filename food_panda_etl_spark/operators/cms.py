"""Count-min sketch over a key column — the mergeable point-frequency
summary (Cormode & Muthukrishnan, J. Algorithms 2005) that answers
"roughly how often does key k occur?" in O(width·depth) space no matter
the key cardinality. The complement of `operators/heavy.py`:
Misra-Gries finds WHICH keys are frequent; CMS answers point queries
about ANY key (join-cardinality hints, per-key rate limiting, feature
hashing diagnostics) with a one-sided error — estimates NEVER
underestimate, and overshoot by more than 2N/width on a given row with
probability ≤ 1/2 per row, driven to 1/2^depth by taking the min.

Engine shape (everything is hash aggregation — no UDFs, no sketches in
driver memory):

1. sketch build — each row increments depth cells (d, h_d(k)): one
   narrow depth-way explode + ONE (d, b) hash aggregation. The sketch
   IS a DataFrame of ≤ width·depth rows — mergeable by construction
   (CMS cells are counters: the partial aggregates Spark's map side
   already computes ARE partial sketches; union+re-agg merges sketches
   across corpora for free);
2. estimate — probe keys join the sketch on the same depth cell keys;
   the estimate is min over d: one ≤(width·depth)-row join (broadcast
   at any realistic geometry) + one per-key MIN aggregation.

Determinism: the row hashes are multiplicative integer hashes on the
portable grid (distinct odd multipliers per depth row, mod 1000003 —
the q_fingerprint/q_shuffle_order constant family, no engine hash
functions), so the sketch, the estimates, and the error bounds are
bit-identical in any engine — the declared query (slated r8) can
hash-match the FULL sketch replay in DuckDB, not just a gate verdict.

Scale: the fact table is touched once, shuffling (depth, bucket) int
pairs; width·depth bounds state regardless of key cardinality (the
point of CMS — a billion-key stream still summarizes into the same
4×1024 cells). Key column must be integral (LLM-pipeline keys are
hashes/ids; string keys pre-fold with the portable polynomial).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)

#: Per-depth odd multipliers on the 1000003 grid (the repo's portable
#: multiplicative-hash family; pairwise-distinct, all coprime to 2^64).
_MULTS = (1315423911, 2654435761, 2246822519, 3266489917,
          668265263, 374761393, 2166136261, 40503)

#: Per-depth additive constants: the hash must be AFFINE
#: ((k·A_d + B_d) mod P), not purely multiplicative — a multiplicative
#: hash has a universal fixed point (the residue that maps the product
#: to 0 mod P lands in bucket 0 at EVERY depth, voiding the
#: min-over-depths independence for that residue class). With distinct
#: B_d, two depths agree on a key's bucket only on pair-specific
#: residues, never universally.
_ADDS = (402653189, 805306457, 201326611, 100663319,
         50331653, 25165843, 12582917, 6291469)

_P = 1000003

#: The sketch-geometry stamp keys (`operators/state_geometry.py` —
#: VERDICT r17 task 4): (width, depth) ride `cms_sketch` output as
#: column metadata so a consumer at another geometry fails LOUDLY.
#: This closes the mode the best-effort bounds checks could not: a
#: sketch built NARROWER than requested has every cell inside the
#: requested bounds and is indistinguishable from sparsity — but not
#: from its stamp. "family" versions the hash constants: cells from a
#: different (A_d, B_d) family occupy the same grid but count
#: different keys.
CMS_GEO_KEYS = ("width", "depth", "family")
_FAMILY = "cms.affine/v1"


def cms_geometry(width: int, depth: int) -> dict:
    """The metadata dict `cms_sketch`/`cms_sketch_by_group` stamp and
    every consumer validates (unstamped sketches stay accepted with
    matching geometry as the CALLER's contract — the incremental-state
    convention)."""
    return {"width": int(width), "depth": int(depth), "family": _FAMILY}


def oracle_dm_sql(depth: int, dim: str = "d") -> str:
    """The DuckDB replay of the affine hash rows — the SAME
    (dim, A_i, B_i) rows interpolated from the operator's constants:
    ONE builder for every oracle that cross-joins the depth/row table
    and computes ``(((key % P) + P) % P * a + c) % P % width`` (the +P
    re-reduction matters: `_cell` uses pmod where DuckDB's % truncates,
    so the raw ``key % P`` form diverges on NEGATIVE keys). ``dim``
    names the row column ("d" for CMS depths, "j" for Bloom hash rows
    via `bloom.oracle_bloom_dm_sql`). Review r13: this consolidates
    what had grown to four hand-joined copies of the fragment —
    queries/sketch.py and queries/sketch_extras.py still carry inline
    copies byte-frozen to their recorded evidence and switch here when
    their files next rotate (r14 plan)."""
    if not 1 <= depth <= len(_MULTS):
        # loud, at the cause: depth 0 would emit 'VALUES ' (a DuckDB
        # syntax error surfacing only when the assembled oracle parses)
        # and depth 9 a bare IndexError mid-f-string
        raise ValueError(
            f"oracle_dm_sql: depth must be in [1, {len(_MULTS)}], got {depth}"
        )
    rows = ", ".join(
        f"({i}, {_MULTS[i]}, {_ADDS[i]})" for i in range(depth)
    )
    return f"(SELECT * FROM (VALUES {rows}) AS t({dim}, a, c))"


def _cell(key_col, d: int, width: int):
    """Depth-d bucket of an integral key: ((k mod P)·A_d + B_d) mod P
    mod width — the key is reduced mod P BEFORE the multiply so the
    product stays ≤ 1000003·A_max + B ≈ 3.3e15 < 2^63 for ANY int64 key
    (hash/id keys span the full range; an unreduced multiply silently
    wraps in Spark and overflows outright in DuckDB/ANSI). pmod keeps
    negative keys on the same non-negative residue grid as Python's %."""
    return (
        F.pmod(key_col.cast("long"), F.lit(_P)) * _MULTS[d] + _ADDS[d]
    ) % _P % width


def cms_sketch(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Build the (d, b, cnt) sketch table — ≤ width·depth rows.

    Rows with a NULL key are skipped (count them separately if NULL
    mass matters — the heavy_hitters NULL contract)."""
    if not 1 <= depth <= len(_MULTS):
        raise ValueError(f"depth must be in [1, {len(_MULTS)}], got {depth}")
    if not 1 <= width <= _P:
        # effective buckets come from a mod-P residue, so width > P
        # would silently deliver a P-wide sketch with a worse error
        # bound than the caller asked for
        raise ValueError(f"width must be in [1, {_P}], got {width}")
    k = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(d).alias("d"), _cell(k, d, width).alias("b"))
        for d in range(depth)
    ])
    return (
        df.filter(k.isNotNull())
        .select(F.explode(cells).alias("__c"))
        .groupBy(F.col("__c.d").alias("d"), F.col("__c.b").alias("b"))
        .agg(F.count("*").alias("cnt"))
        .withMetadata("cnt", cms_geometry(width, depth))
    )


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
) -> DataFrame:
    """Point-frequency estimates for ``probes[col]`` against a sketch
    built with the SAME (width, depth) — validated against the
    sketch's geometry stamp when present (`CMS_GEO_KEYS`; unstamped
    sketches are the caller's contract). Returns (col, est bigint);
    est >= the true count always (one-sided error), with absent cells
    counting 0 (a key hashing only to untouched cells genuinely never
    occurred).

    NULL probes are dropped, mirroring the build side: NULL rows never
    enter the sketch (`cms_sketch` filters them — the heavy_hitters
    NULL-key contract), so a NULL estimate would read as "never
    occurred" while NULL mass may dominate the sketched column; count
    NULLs separately if they matter."""
    check_probe_geometry(
        "cms_estimate",
        cms_geometry(width, depth),
        state_geometry(sketch, "cnt", CMS_GEO_KEYS),
        "probe cells would be read from a different cell grid — "
        "estimates silently wrong, never an error (rebuild the sketch "
        "or match width/depth)",
    )
    probes = probes.filter(F.col(col).isNotNull())
    k = F.col(col)
    cells = F.array(*[
        F.struct(F.lit(d).alias("d"), _cell(k, d, width).alias("b"))
        for d in range(depth)
    ])
    probe_cells = probes.select(col, F.explode(cells).alias("__c")).select(
        col, F.col("__c.d").alias("d"), F.col("__c.b").alias("b")
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["d", "b"], "left")
        .groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
    )
