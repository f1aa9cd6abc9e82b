"""r13 declarations, registry-driven: the five build-ahead operators'
query bodies and oracle strings moved VERBATIM from this file's r12
preview form into `queries/scale_sketches.py` (per the rotation
contract), so this file now exercises the DECLARED registry entries —
the exact (body, oracle) pairs the driver records — through the same
compare harness at two scale factors, instead of duplicating the
bodies. The sixth key (`q_bloom_fpr_gate`, VERDICT r12 task 6) was
born declared in the same module and is covered here too. The
`q_jaccard_prefix_join` oracle is the brute-force `q_ngram_jaccard`
SQL — since the r14 rotation both are the shared
`operators/overlap_join.py::NGRAM_JACCARD_ORACLE_SQL` constant
(byte-identical to the r13-recorded string) — checked below (one
definition, no drift)."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.queries import ORACLES, QUERIES
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R13_NEW = [
    "q_bloom_filter",
    "q_bloom_prefilter",
    "q_bloom_fpr_gate",
    "q_hll_windowed",
    "q_group_priority_sample",
    "q_jaccard_prefix_join",
]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R13_NEW)
def test_r13_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_prefix_join_oracle_is_the_brute_force_sql():
    """ONE oracle definition for exact Jaccard: the prefix-join's
    declared oracle must BE the brute-force q_ngram_jaccard SQL (the
    completeness theorem is only meaningful against the unpruned
    form — a drifted copy would hash-match a weaker claim)."""
    assert ORACLES["q_jaccard_prefix_join"] == ORACLES["q_ngram_jaccard"]
