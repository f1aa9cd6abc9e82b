"""r10 declarations, registry-driven: the three build-ahead operators'
query bodies and oracle strings moved VERBATIM from this file's r9
preview form into `queries/curation.py` (per the rotation contract),
so this file now exercises the DECLARED registry entries — the exact
(body, oracle) pairs the driver records — through the same compare
harness at two scale factors, instead of duplicating the bodies."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.hll import HLL_M
from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R10_NEW = ["q_curriculum_mix", "q_priority_sample", "q_hll_counts"]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R10_NEW)
def test_r10_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_hll_counts_informative(spark):
    """Accuracy holds in the raw regime (n ≳ 2.5·m — the documented
    small-range bias floor): sf0.01 has ~2000 distinct partkeys
    (in-regime; sf0.001's ~200 is below it — the estimate still
    hash-matches there, it is just biased high, as documented)."""
    [row] = QUERIES["q_hll_counts"](spark, _SF01).collect()
    assert row["n_exact"] >= 3 * HLL_M
    assert 0.7 < row["ratio"] < 1.3, row
