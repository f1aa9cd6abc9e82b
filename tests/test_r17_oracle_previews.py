"""r17 declarations, registry-driven: the four r16 build-ahead
components' query bodies and oracle strings moved VERBATIM from this
file's r16 preview form into `queries/weighted_ops.py` (per the
rotation contract), so this file now exercises the DECLARED registry
entries — the exact (body, oracle) pairs the driver records — through
the same compare harness at two scale factors, instead of duplicating
the bodies. The trailing-window Bloom membership query
(`q_bloom_window`, VERDICT r16 task 3 — declared the same round it
was built, no preview generation) is exercised here too.

The ONE-definition pins also live here: the incremental-containment
brute-force oracle must replay `SHINGLE5_CTE_SQL` (the distinct
replay owned by operators/overlap_join.py) and the TF-weighted
Jaccard / ICWS-gate exact sides must replay
`shingle_multiset_cte_sql(3)` (the multiset replay owned by
operators/weighted_jaccard.py) — drift between a pruning/screening
scheme's oracle and the brute-force form would silently weaken the
completeness theorems. The two Bloom verdict-table oracles must build
on `oracle_bloom_dm_sql` (the family dm replay) so the bit cells
cannot drift from the engine's affine family.

Pinned constants (measured at sf0.001/sf0.01/sf0.1 before pinning,
r16 — see queries/weighted_ops.py for the realized numbers).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.bloom import oracle_bloom_dm_sql
from food_panda_etl_spark.operators.overlap_join import SHINGLE5_CTE_SQL
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_cte_sql,
)
from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R17_NEW = [
    "q_incremental_containment",
    "q_tf_jaccard",
    "q_icws_gate",
    "q_bloom_by_group",
    "q_bloom_window",
]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R17_NEW)
def test_r17_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_r17_oracles_build_on_the_shared_replays():
    """All five oracles must embed the ONE shared replay definition
    for their family (see module docstring)."""
    assert SHINGLE5_CTE_SQL in ORACLES["q_incremental_containment"]
    assert shingle_multiset_cte_sql(3) in ORACLES["q_tf_jaccard"]
    assert shingle_multiset_cte_sql(3) in ORACLES["q_icws_gate"]
    assert oracle_bloom_dm_sql(4) in ORACLES["q_bloom_by_group"]
    assert oracle_bloom_dm_sql(4) in ORACLES["q_bloom_window"]
