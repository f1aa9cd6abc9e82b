"""Shared shape validation for sketch group-merges — ONE definition of
the "needed columns present, none duplicated" invariant so the
cms_windowed / hll_windowed combines can't drift (review-caught r12:
the duplicated-column guard had been copy-pasted into both, the exact
divergence risk the hll_merge ADVICE r11 lesson warns about)."""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame


def check_merge_columns(
    op_name: str, need: set[str], sketches: Iterable[DataFrame]
) -> None:
    """Raise unless every sketch CONTAINS the ``need`` columns exactly
    once. Subset semantics (extra columns are the group dimensions
    being dropped — allowed); duplicated needed columns fail HERE with
    a clear message instead of later inside a select with an
    ambiguous-reference error (the hll_merge ADVICE r11 lesson applied
    to subset checks)."""
    for i, s in enumerate(sketches):
        missing = sorted(need - set(s.columns))
        if missing:
            raise ValueError(
                f"{op_name}: sketch #{i} lacks columns {missing} "
                f"(has {list(s.columns)}) — group_cols must be a subset "
                "of every input's group dimensions"
            )
        dups = sorted(c for c in need if s.columns.count(c) > 1)
        if dups:
            raise ValueError(
                f"{op_name}: sketch #{i} has duplicated columns "
                f"{dups} (has {list(s.columns)}) — deduplicate before "
                "merging"
            )
