"""Z-order (Morton) clustering keys — multi-dimensional data layout.

The reference lays data out along ONE dimension chain (hive keys
``city_id=/year=/month=/day=``, ``/root/reference/src/main.rs:236-244``),
which prunes perfectly on city+date but not on any second independent
predicate. A Z-order key interleaves the bits of several bucketed
dimensions so that range-partitioning + per-file min/max statistics prune
on EVERY participating dimension at once — the standard lakehouse layout
trick for multi-predicate scans over 100 TB.

Scale shape: the key itself is pure whole-stage-codegen bit arithmetic
(shiftright/and/shiftleft/or — no UDF, no shuffle); clustering is ONE
``repartitionByRange`` exchange on the key, the same cost as any sort-based
write. Everything downstream is free: parquet row-group min/max on the
z-key column, or on the original columns (whose per-file spans shrink by
construction), turns point/range predicates into file skips.
"""

from __future__ import annotations

from functools import reduce
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(cols: Sequence[Column], bits: int = 8) -> Column:
    """Morton-interleave the low ``bits`` bits of each bucketed column.

    ``cols[i]`` must already be a non-negative bucket id < 2**bits (the
    caller chooses the bucketing, e.g. ``col % 256`` or a range quantile);
    bit ``b`` of column ``i`` lands at output position ``b*len(cols)+i``,
    so the resulting long orders space along the Z-curve. All arithmetic
    is JVM-side integer ops inside one codegen stage.
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) = {bits * n} exceeds a signed long")
    mask = (1 << bits) - 1
    # Inputs are masked to their low `bits` bits FIRST: an out-of-range or
    # negative bucket id folds to (id mod 2**bits) deterministically in
    # both engines, instead of silently scrambling via two's-complement
    # high bits (callers should still bucket properly — the fold degrades
    # clustering quality, never correctness).
    parts = [
        F.shiftleft(
            F.shiftright(
                c.cast("long").bitwiseAND(F.lit(mask).cast("long")), b
            ).bitwiseAND(F.lit(1)),
            b * n + i,
        )
        for b in range(bits)
        for i, c in enumerate(cols)
    ]
    # positions are disjoint, so OR == +; OR keeps intent obvious
    return reduce(lambda a, b2: a.bitwiseOR(b2), parts)


def zorder_key_sql(col_exprs: Sequence[str], bits: int = 8) -> str:
    """The identical interleave as ANSI-SQL text (for oracles / SQL users).

    Mirrors :func:`zorder_key` bit-for-bit: column ``i`` bit ``b`` →
    position ``b*n+i``, with every term CAST to BIGINT before shifting —
    on 32-bit INT inputs the naive form wraps negative once a position
    passes 31 (and DuckDB raises on ``1 << 31``), which is exactly the
    regime this function exists to oracle. Same input masking and the
    same ``bits*n > 63`` guard as :func:`zorder_key`.
    """
    n = len(col_exprs)
    if n < 1:
        raise ValueError("zorder_key_sql needs at least one column")
    if bits * n > 63:
        raise ValueError(f"bits*len(cols) = {bits * n} exceeds a signed long")
    mask = (1 << bits) - 1
    terms = [
        f"(((CAST(({e}) AS BIGINT) & {mask}) >> {b} & 1) << {b * n + i})"
        for b in range(bits)
        for i, e in enumerate(col_exprs)
    ]
    return " | ".join(terms)


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[Column],
    bits: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """Physically cluster ``df`` along the Z-curve of ``cols``.

    One range exchange on the interleaved key + an intra-partition sort —
    the write-side half of data skipping. Each output partition then
    covers a contiguous Z-range, i.e. a small axis-aligned box in every
    participating dimension, so per-file min/max stats prune multi-column
    predicates. The helper key column is dropped before return.
    """
    if num_partitions is not None and num_partitions <= 0:
        raise ValueError(f"num_partitions must be positive, got {num_partitions}")
    zcol = "__zkey"
    while zcol in df.columns:  # collision-safe: never clobber user data
        zcol += "_"
    keyed = df.withColumn(zcol, zorder_key(cols, bits))
    part = (
        keyed.repartitionByRange(num_partitions, zcol)
        if num_partitions is not None
        else keyed.repartitionByRange(zcol)
    )
    return part.sortWithinPartitions(zcol).drop(zcol)
