"""r19 declarations, registry-driven: the r18 build-ahead component
families' query bodies and oracle strings moved VERBATIM from this
file's r18 preview form into `queries/summary_state_ops.py` (per the
rotation contract), so this file now exercises the DECLARED registry
entries — the exact (body, oracle) pairs the driver records — through
the same compare harness at two scale factors, instead of duplicating
the bodies.

Family-identity pins also live here: the incremental-heavy oracle is
the brute-force HAVING over the WHOLE token stream (corpus ∪ batch =
the full documents table — the oracle must not mention the split, or
the hash-match would stop being the merge theorem), both windowed
faces' oracles replay the trailing window over the RAW rows (never
the state — the dropped-day identity is only evidence if the oracle
is state-free), and the incremental-quantile oracles carry BOTH the
histogram estimate and the exact ⌈q·n⌉-rank audit columns (est and
exact must ride one row, or the in-bucket guarantee isn't being
checked row-for-row).

Pinned constants (measured at sf0.001/0.01/0.1 before pinning, r18 —
see queries/summary_state_ops.py for the realized numbers).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R19_NEW = [
    "q_incremental_heavy",
    "q_heavy_window",
    "q_quantile_bucket_by_group",
    "q_incremental_quantile",
    "q_quantile_window",
]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R19_NEW)
def test_r19_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_r19_oracles_are_state_free_replays():
    """The identity theorems are only evidence if the oracle side
    never sees the engine's split or state (module docstring)."""
    for name in _R19_NEW:
        assert "% 10" not in ORACLES[name], name  # no corpus/batch split
    for name in ("q_heavy_window", "q_quantile_window"):
        sql = ORACLES[name]
        assert "max(day)" in sql and "md - 7" in sql, name  # raw-row window
    for est_col, exact_col, name in (
        ("est_chars", "exact_chars", "q_incremental_quantile"),
        ("est_value", "exact_value", "q_quantile_window"),
    ):
        sql = ORACLES[name]
        assert est_col in sql and exact_col in sql, name  # audit rides the row
