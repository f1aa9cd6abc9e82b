"""r18 declarations, registry-driven: the three r17 build-ahead
component families' query bodies and oracle strings moved VERBATIM
from this file's r17 preview form into `queries/state_ops.py` (per the
rotation contract), so this file now exercises the DECLARED registry
entries — the exact (body, oracle) pairs the driver records — through
the same compare harness at two scale factors, instead of duplicating
the bodies.

The ONE-definition pins also live here: the incremental-ICWS
brute-force oracle must replay `shingle_multiset_cte_sql(3)` (the
multiset replay owned by operators/weighted_jaccard.py — drift between
the banded screen's oracle and the brute-force form would silently
weaken the recall evidence), the Bloom-intersect verdict-table oracle
must build on `oracle_bloom_dm_sql` (the family dm replay, so the bit
cells cannot drift from the engine's affine family), and BOTH sampling
faces' oracles must rank by the engine's own priority hash
`((id % 1000003) * 1315423911) % 1000003` (the q_priority_sample /
q_group_priority_sample family hash — the identity theorems are only
as strong as the shared ranking function).

Pinned constants (measured at sf0.001/sf0.01/sf0.1 before pinning,
r17 — see queries/state_ops.py for the realized numbers).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.bloom import oracle_bloom_dm_sql
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_cte_sql,
)
from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R18_NEW = [
    "q_incremental_icws",
    "q_incremental_group_priority",
    "q_group_priority_window",
    "q_bloom_intersect",
]

_PRIORITY_HASH = "((doc_id % 1000003) * 1315423911) % 1000003"
_PRIORITY_HASH_EV = "((event_id % 1000003) * 1315423911) % 1000003"


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R18_NEW)
def test_r18_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_r18_oracles_build_on_the_shared_replays():
    """All four oracles must embed the ONE shared definition for their
    family (see module docstring)."""
    assert shingle_multiset_cte_sql(3) in ORACLES["q_incremental_icws"]
    assert oracle_bloom_dm_sql(4) in ORACLES["q_bloom_intersect"]
    assert _PRIORITY_HASH in ORACLES["q_incremental_group_priority"]
    assert _PRIORITY_HASH_EV in ORACLES["q_group_priority_window"]
