"""r20-banked declarations, registry-driven EARLY: the late-r18
build-ahead pair (`q_incremental_cms` + `q_incremental_hll`) was
promoted at r19 — one round ahead of its guard — because both were
pre-verified through the driver's own compare harness alongside the
r19 bank and the r19 window had the slack (see the R20 ROTATION PLAN
note in queries/__init__.py: the pull-forward frees r20 for
hardening). Bodies and oracle strings moved VERBATIM from this file's
preview form into `queries/summary_state_ops.py`, so this file now
exercises the DECLARED registry entries — the exact (body, oracle)
pairs the driver records — through the same compare harness at two
scale factors.

The ONE-definition pins also live here: the incremental-CMS oracle
must build on `oracle_dm_sql` (the family dm replay owned by
operators/cms.py — the cell family cannot drift from the engine's
affine hashes), and the incremental-HLL oracle must BE
`_hll_oracle(key="l_orderkey")` (the ONE register replay owned by
queries/curation.py — relation/key parameterized, no drift).

This file ALSO banks the r19-built `q_incremental_dsir` preview — the
maintained-state refresh face of the CLASSIFIER/score family
(`operators/dsir_incremental.py`, VERDICT r18 task 7's named optional
candidate, closing the LAST unmirrored summary family): hashed-bigram
(bucket → raw count, target count) state built on the doc_id%10
corpus split, refreshed with the batch split (counts are LINEAR, so
refresh ≡ from-scratch), and the WHOLE documents table scored against
the maintained state — bit-identical to `dsir_weights` because
identical integer counts give identical ρ-grid values give identical
decimal sums. The oracle IS `ORACLES["q_dsir_weight"]`, the
one-definition rule at its strongest: the full-corpus replay already
declared green is exactly what linearity promises the refreshed state
reproduces. Declaration due r20 (this preview arms the promotion
guard at WINDOW_ROUND=20).
"""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.cms import oracle_dm_sql
from food_panda_etl_spark.queries import ORACLES, QUERIES
from food_panda_etl_spark.queries.curation import _hll_oracle
from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_R20_BANK = ["q_incremental_cms", "q_incremental_hll"]


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


@pytest.mark.parametrize("name", _R20_BANK)
def test_r20_declared_matches_oracle(spark, any_sf, name):
    assert compare(QUERIES[name](spark, any_sf), ORACLES[name], any_sf) == []


def test_r20_oracles_build_on_the_shared_replays():
    """Both oracles must embed the ONE shared definition for their
    family (see module docstring)."""
    assert oracle_dm_sql(3) in ORACLES["q_incremental_cms"]
    assert ORACLES["q_incremental_hll"] == _hll_oracle(key="l_orderkey")


def test_incremental_dsir_preview(spark, any_sf):
    """Incremental DSIR from maintained hashed-bigram count state
    (operators/dsir_incremental.py): corpus-state + batch refresh →
    the WHOLE documents table scored against the maintained state,
    bit-identical to `dsir_weights` over corpus ∪ batch by linearity.
    The oracle IS the declared `q_dsir_weight` replay (module
    docstring)."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.dsir_incremental import (
        build_dsir_state,
        dsir_score_against_state,
        incremental_dsir_refresh,
    )
    from food_panda_etl_spark.queries.text import _DSIR_BUCKETS, _DSIR_KEEP

    d = load_table(spark, any_sf, "documents")
    st = build_dsir_state(
        d.filter(F.col("doc_id") % 10 != 0),
        F.col("lang") == "en",
        buckets=_DSIR_BUCKETS,
    )
    # pin the refreshed state (the maintained-state regime: state IS a
    # materialized table between refreshes)
    st = incremental_dsir_refresh(
        st,
        d.filter(F.col("doc_id") % 10 == 0),
        F.col("lang") == "en",
        buckets=_DSIR_BUCKETS,
    ).localCheckpoint(eager=False)
    got = dsir_score_against_state(
        d, st, buckets=_DSIR_BUCKETS, keep_threshold=_DSIR_KEEP
    )
    assert compare(got, ORACLES["q_dsir_weight"], any_sf) == []
