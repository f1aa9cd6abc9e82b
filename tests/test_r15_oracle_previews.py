"""r15 declarations, registry-driven: the three build-ahead
components' query bodies and oracle strings moved VERBATIM from this
file's r14 preview form into `queries/scale_ops.py` (per the rotation
contract), so this file now exercises the DECLARED registry entries —
the exact (body, oracle) pairs the driver records — through the same
compare harness at two scale factors, instead of duplicating the
bodies.

The ONE-definition pins also live here: the r15 dedup.py rotation
consolidated the gram construction onto `dedup.gram_table` (the
weighted-Jaccard multiset table's mirrored copy retired), and both new
shingle-replay oracles must build on their shared CTE constants —
drift between a pruning/screening scheme's oracle and the brute-force
form would silently weaken the completeness theorems.

Pinned constants (measured at sf0.001/sf0.01/sf0.1 before pinning,
r14 — see queries/scale_ops.py for the realized numbers).
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

_R15_NEW = [
    "q_weighted_jaccard",
    "q_decontaminate_bloom",
    "q_join_advice",
]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R15_NEW)
def test_r15_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_r15_shingle_replay_oracles_build_on_the_shared_ctes():
    """Both new shingle-replay oracles must embed the ONE shared CTE
    definition for their table shape: the weighted-Jaccard brute-force
    count-join replays `shingle_multiset_cte_sql(3)` (the multiset
    replay owned by operators/weighted_jaccard.py), and the Bloom
    decontamination exact SQL replays `SHINGLE5_CTE_SQL` (the distinct
    replay owned by operators/overlap_join.py) — a drifted copy would
    hash-match a weaker completeness claim."""
    assert shingle_multiset_cte_sql(3) in ORACLES["q_weighted_jaccard"]
    assert SHINGLE5_CTE_SQL in ORACLES["q_decontaminate_bloom"]
