"""r16 declarations, registry-driven: the five build-ahead
components' query bodies and oracle strings moved VERBATIM from this
file's r15 preview form into `queries/incremental_ops.py` (per the
rotation contract), so this file now exercises the DECLARED registry
entries — the exact (body, oracle) pairs the driver records — through
the same compare harness at two scale factors, instead of duplicating
the bodies.

The ONE-definition pins also live here: all three shingle-replay
oracles must build on their shared CTE constants — the incremental
near-dup and containment-join brute-force forms replay
`SHINGLE5_CTE_SQL` (the distinct replay owned by
operators/overlap_join.py) and the weighted MinHash gate's exact side
replays `shingle_multiset_cte_sql(3)` (the multiset replay owned by
operators/weighted_jaccard.py) — drift between a pruning/screening
scheme's oracle and the brute-force form would silently weaken the
completeness theorems.

Pinned constants (measured at sf0.001/sf0.01/sf0.1 before pinning,
r15 — see queries/incremental_ops.py for the realized numbers).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.overlap_join import SHINGLE5_CTE_SQL
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_cte_sql,
)
from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R16_NEW = [
    "q_incremental_neardup",
    "q_incremental_embed_neardup",
    "q_weighted_minhash_gate",
    "q_containment_join",
    "q_edit_distance_join",
]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R16_NEW)
def test_r16_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_r16_shingle_replay_oracles_build_on_the_shared_ctes():
    """All three set-join oracles must embed the ONE shared CTE
    definition for their table shape (see module docstring)."""
    assert SHINGLE5_CTE_SQL in ORACLES["q_incremental_neardup"]
    assert SHINGLE5_CTE_SQL in ORACLES["q_containment_join"]
    assert shingle_multiset_cte_sql(3) in ORACLES["q_weighted_minhash_gate"]
