"""r15 declaration previews: the r14 build-ahead operators' future
declared queries, run against their EXACT intended DuckDB oracle SQL
through the same compare harness the driver uses — everything but the
registry entries (which must wait for the r15 window per the rotation
contract). When r15 declares them, the bodies and oracle strings move
VERBATIM into a queries/ module and this file is rewritten
registry-driven (the r10/r12/r13/r14 convention, ENFORCED by
tests/test_registry_rotation.py::test_preview_verified_queries_get_declared
— these ``*_preview`` functions fail the build if WINDOW_ROUND reaches
15 without the declarations landing).

Pinned constants (measured at sf0.001/sf0.01/sf0.1 before pinning):
- weighted Jaccard n=3, τ=7/10 → 28/25 pairs at the preview SFs (256
  at sf0.1) — the pair set is stable from τ=0.5 through 0.7 (the
  fixture's near-dups are sharply separated) and the fixture carries
  real 3-gram multiplicities (c=2 shingles exist at every SF), so the
  multiset semantics are exercised, not degenerate;
- Bloom-screened decontamination m=2^16, k=4 over the doc_id%7 split —
  output is BIT-IDENTICAL to the unscreened exact computation by the
  one-sided-contract + exact-verify argument, so the oracle is the
  plain exact SQL built on the shared SHINGLE5_CTE_SQL (hash-match ==
  screen-completeness theorem; same evidence pattern as
  q_jaccard_prefix_join / q_overlap_join).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.overlap_join import SHINGLE5_CTE_SQL
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_cte_sql,
)
from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_WJ_N = 3
_WJ_NUM, _WJ_DEN = 7, 10

_DB_M, _DB_K = 1 << 16, 4


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_weighted_jaccard_preview(spark, any_sf):
    """Exact WEIGHTED (multiset) n-gram Jaccard pairs: Σmin/Σmax over
    3-gram shingle counts at τ=7/10 via occurrence-expansion through
    the existing prefix machinery (operators/weighted_jaccard.py). The
    oracle is the brute-force count-join: hash-matching it IS the
    expanded-set prefix-filter completeness theorem."""
    from food_panda_etl_spark.operators.weighted_jaccard import (
        weighted_jaccard_join,
    )

    d = load_table(spark, any_sf, "documents")
    got = weighted_jaccard_join(
        d, "doc_id", "text", n=_WJ_N,
        threshold_num=_WJ_NUM, threshold_den=_WJ_DEN,
    )
    oracle = f"""
    WITH {shingle_multiset_cte_sql(_WJ_N)},
    tot AS (SELECT doc, CAST(sum(c) AS BIGINT) AS nw FROM shm GROUP BY doc),
    wi AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
                  CAST(sum(least(a.c, b.c)) AS BIGINT) AS wi
           FROM shm a JOIN shm b ON a.shingle = b.shingle AND a.doc < b.doc
           GROUP BY 1, 2)
    SELECT doc_a, doc_b, wi,
           CAST(wi AS DOUBLE) / CAST(ta.nw + tb.nw - wi AS DOUBLE) AS wjaccard
    FROM wi
    JOIN tot ta ON doc_a = ta.doc
    JOIN tot tb ON doc_b = tb.doc
    WHERE wi * {_WJ_DEN} >= {_WJ_NUM} * (ta.nw + tb.nw - wi)
    """
    assert compare(got, oracle, any_sf) == []


def test_decontaminate_bloom_preview(spark, any_sf):
    """Bloom-screened benchmark decontamination
    (operators/decontam_bloom.py): fixed-size sketch pre-screen keeps
    the train side map-only (no broadcast of the eval shingle strings
    anywhere), exact verify on survivors only — output bit-identical
    to the unscreened computation, so the oracle is the plain exact
    SQL on the shared shingle replay and the driver hash-match is the
    screen-completeness theorem."""
    from food_panda_etl_spark.operators.decontam_bloom import (
        bloom_screened_contamination,
    )

    d = load_table(spark, any_sf, "documents")
    got = bloom_screened_contamination(
        d.filter(F.col("doc_id") % 7 != 0),
        d.filter(F.col("doc_id") % 7 == 0),
        "doc_id",
        "text",
        n=5,
        m_bits=_DB_M,
        k_hashes=_DB_K,
    )
    oracle = f"""
    WITH {SHINGLE5_CTE_SQL},
    ev AS (SELECT DISTINCT shingle FROM sh WHERE doc % 7 = 0),
    tr AS (SELECT * FROM sh WHERE doc % 7 <> 0)
    SELECT tr.doc AS doc_id, CAST(count(*) AS BIGINT) AS n_shared
    FROM tr JOIN ev ON tr.shingle = ev.shingle
    GROUP BY tr.doc
    """
    assert compare(got, oracle, any_sf) == []
