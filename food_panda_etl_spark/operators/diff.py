"""Snapshot differencing — the change-data-capture primitive for batch
lakes.

The reference pipeline is append-only (each run stamps a new batch,
``/root/reference/src/main.rs:136-160``); the operation it leaves to the
reader is "what changed since the last run?" — which is exactly what an
incremental training-data refresh needs: re-embed only changed docs,
re-run dedup only against added ones, tombstone removed ones. This
module computes that diff as one co-partitioned full-outer join.

Scale shape: both snapshots shuffle once on the key columns (or not at
all when both sides are bucketed on the keys — ``sinks.write_bucketed``
— since the sort-merge join then reads co-located buckets); the compare
is a null-safe column-wise predicate evaluated inside whole-stage
codegen, so unchanged rows are dropped before anything else happens. No
window, no collect, no state: at 100 TB the diff costs one join of two
scans.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str] | None = None,
    keep_images: bool = False,
) -> DataFrame:
    """Key-level diff of two snapshots with identical schemas.

    Returns one row per key whose state differs, with ``change_type`` ∈
    {'added', 'removed', 'changed'}: added = key only in ``new``,
    removed = key only in ``old``, changed = present in both with any
    ``compare_cols`` differing (null-safe: NULL→value and value→NULL are
    changes, NULL→NULL is not). Unchanged keys are dropped. Key columns
    are returned coalesced, so the output is a complete change manifest.

    ``compare_cols`` defaults to every non-key column of ``old``.
    With ``keep_images`` the manifest also carries the before/after
    images ``old_<c>`` / ``new_<c>`` of every compare column (NULL on
    the absent side) — what a real CDC stream ships, and what lets
    downstream consumers (``incremental_agg_refresh``) stay
    change-proportional instead of re-joining the full snapshots.
    """
    compare_cols = list(
        compare_cols
        if compare_cols is not None
        else [c for c in old.columns if c not in keys]
    )
    # presence flags: a compare column's null-ness can't signal presence
    # (all compare columns could be legitimately NULL) — sentinel lits do
    o = old.select(
        *keys,
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__o_present"),
    )
    n = new.select(
        *keys,
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__n_present"),
    )
    joined = o.join(n, on=list(keys), how="full_outer")
    differs = F.lit(False)
    for c in compare_cols:
        differs = differs | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__o_present").isNull(), F.lit("added"))
        .when(F.col("__n_present").isNull(), F.lit("removed"))
        .when(differs, F.lit("changed"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            *keys,
            "change_type",
            *(
                [F.col(f"__o_{c}").alias(f"old_{c}") for c in compare_cols]
                + [F.col(f"__n_{c}").alias(f"new_{c}") for c in compare_cols]
                if keep_images
                else []
            ),
        )
    )


def upsert_snapshot(
    base: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    deletes: DataFrame | None = None,
) -> DataFrame:
    """Apply a change set to a snapshot — the MERGE counterpart of
    :func:`snapshot_diff`: for every key in ``updates`` the update row
    wins (matched keys overwrite, new keys insert); keys in ``deletes``
    (key columns only) are removed. ``upsert_snapshot(old, updates,
    keys, deletes)`` applied to ``snapshot_diff``'s manifest
    reconstructs ``new`` exactly — the diff→apply round trip the
    declared ``q_upsert`` oracle proves.

    Scale shape mirrors the diff: ONE co-partitioned full-outer join on
    the keys (zero exchanges when both sides are bucketed on them), a
    presence-sentinel pick per value column in codegen — NULL update
    values overwrite, absent rows do not, which is why the sentinel
    exists — and an optional broadcast-able anti join for tombstones.
    No window, no collect."""
    value_cols = [c for c in base.columns if c not in keys]
    u = updates.select(
        *keys,
        *[F.col(c).alias(f"__u_{c}") for c in value_cols],
        F.lit(1).alias("__u_present"),
    )
    merged = base.join(u, on=list(keys), how="full_outer").select(
        *keys,
        *[
            F.when(F.col("__u_present").isNotNull(), F.col(f"__u_{c}"))
            .otherwise(F.col(c))
            .alias(c)
            for c in value_cols
        ],
    )
    if deletes is not None:
        merged = merged.join(deletes.select(*keys), on=list(keys), how="anti")
    return merged


def incremental_agg_refresh(
    old_agg: DataFrame,
    manifest: DataFrame,
    old: DataFrame | None = None,
    new: DataFrame | None = None,
    *,
    keys: Sequence[str],
    group_col: str,
    value_col: str,
    cnt_col: str = "cnt",
    sum_col: str = "total",
) -> DataFrame:
    """Materialized-view maintenance for (count, sum) aggregates: fold a
    CDC change manifest into a pre-computed per-group aggregate WITHOUT
    rescanning the fact table — the incremental-refresh counterpart of
    `snapshot_diff`/`upsert_snapshot`, and the batch analog of streaming
    update-mode aggregation.

    Every manifest row contributes a retraction (its OLD image, for
    removed/changed) and/or an insertion (its NEW image, for
    added/changed); a changed row whose GROUP moved is handled for free
    because the retraction and insertion land in different groups. The
    deltas fold into ``old_agg`` with one manifest-group-sized
    full-outer join; groups whose count reaches zero disappear, groups
    born in the delta appear.

    Exactness contract: ``value_col`` must already be quantized (e.g.
    DECIMAL(18,2)) so sums are associative — then maintained ≡
    recomputed BIT-FOR-BIT, which is what the declared query's oracle
    (a direct aggregation of the new snapshot) proves. Scale shape:
    with an image-carrying manifest (``snapshot_diff(keep_images=True)``
    or a real CDC stream with before/after images) the refresh touches
    NOTHING but the manifest — genuinely change-proportional; when the
    manifest has keys only, the images are recovered by joining the
    (change-sized) manifest against the two snapshots, which re-scans
    them once. NULL group keys merge null-safely."""
    keys = list(keys)
    has_images = f"old_{group_col}" in manifest.columns
    if has_images:
        # change-proportional path: the manifest already carries
        # before/after images (snapshot_diff keep_images=True, or a
        # real CDC stream) — no snapshot re-join at all
        minus = manifest.filter(
            F.col("change_type").isin("removed", "changed")
        ).select(
            F.col(f"old_{group_col}").alias("__g"),
            F.lit(-1).cast("bigint").alias("__dc"),
            (-F.col(f"old_{value_col}")).alias("__dv"),
        )
        plus = manifest.filter(
            F.col("change_type").isin("added", "changed")
        ).select(
            F.col(f"new_{group_col}").alias("__g"),
            F.lit(1).cast("bigint").alias("__dc"),
            F.col(f"new_{value_col}").alias("__dv"),
        )
    else:
        minus = (
            manifest.filter(F.col("change_type").isin("removed", "changed"))
            .join(old, keys)
            .select(
                F.col(group_col).alias("__g"),
                F.lit(-1).cast("bigint").alias("__dc"),
                (-F.col(value_col)).alias("__dv"),
            )
        )
        plus = (
            manifest.filter(F.col("change_type").isin("added", "changed"))
            .join(new, keys)
            .select(
                F.col(group_col).alias("__g"),
                F.lit(1).cast("bigint").alias("__dc"),
                F.col(value_col).alias("__dv"),
            )
        )
    delta = (
        minus.unionByName(plus)
        .groupBy("__g")
        .agg(F.sum("__dc").alias("__dcnt"), F.sum("__dv").alias("__dsum"))
    )
    zero_v = F.lit(0).cast(delta.schema["__dsum"].dataType)
    return (
        # null-safe: a NULL group key is a legitimate aggregate row and
        # must MERGE with its delta, not survive the full-outer unmatched
        old_agg.join(
            delta, old_agg[group_col].eqNullSafe(delta["__g"]), "full_outer"
        )
        .select(
            F.coalesce(F.col(group_col), F.col("__g")).alias(group_col),
            (
                F.coalesce(F.col(cnt_col), F.lit(0))
                + F.coalesce(F.col("__dcnt"), F.lit(0))
            ).alias(cnt_col),
            (
                F.coalesce(F.col(sum_col), zero_v)
                + F.coalesce(F.col("__dsum"), zero_v)
            ).alias(sum_col),
        )
        .filter(F.col(cnt_col) > 0)
    )
