"""r14 declarations, registry-driven: the three build-ahead
components' query bodies and oracle strings moved VERBATIM from this
file's r13 preview form into `queries/cross_sketches.py` (per the
rotation contract), so this file now exercises the DECLARED registry
entries — the exact (body, oracle) pairs the driver records — through
the same compare harness at two scale factors, instead of duplicating
the bodies.

The ONE-definition pins also live here: the r14 similarity.py rotation
consolidated every shingle-replay oracle onto
`overlap_join.SHINGLE5_CTE_SQL` and retired `_load_all`'s post-import
ORACLES alias for `q_jaccard_prefix_join` in favor of the shared
`overlap_join.NGRAM_JACCARD_ORACLE_SQL` constant — both pinned below
(drift between the pruning-scheme oracles and the brute-force form
would silently weaken the completeness theorems).

Pinned constants (measured at sf0.001/sf0.01/sf0.1 before pinning,
r13 — see queries/cross_sketches.py for the realized numbers).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.overlap_join import (
    NGRAM_JACCARD_ORACLE_SQL,
    SHINGLE5_CTE_SQL,
)
from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R14_NEW = [
    "q_overlap_join",
    "q_cms_join_size",
    "q_hll_intersect_gate",
]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R14_NEW)
def test_r14_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_jaccard_oracles_are_the_shared_brute_force_sql():
    """ONE oracle definition for exact Jaccard: both the brute-force
    query and the prefix-join's declared oracle must BE the shared
    constant (the completeness theorem is only meaningful against the
    unpruned form — a drifted copy would hash-match a weaker claim)."""
    assert ORACLES["q_ngram_jaccard"] == NGRAM_JACCARD_ORACLE_SQL
    assert ORACLES["q_jaccard_prefix_join"] == NGRAM_JACCARD_ORACLE_SQL


def test_shingle_replay_oracles_build_on_the_shared_cte():
    """ONE shingle replay definition: every declared oracle that
    replays the shingle table carries the constant verbatim (the
    similarity.py near-dup cluster oracles assemble it into their
    recursive CTEs; q_overlap_join's oracle prepends WITH)."""
    for name in (
        "q_ngram_jaccard",
        "q_jaccard_prefix_join",
        "q_overlap_join",
        "q_dedup_components",
        "q_dedup_keep_rep",
    ):
        assert SHINGLE5_CTE_SQL in ORACLES[name], name
