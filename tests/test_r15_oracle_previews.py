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
  q_jaccard_prefix_join / q_overlap_join);
- join advice W=1024 D=4, broadcast bar 10k rows, salt at top-key ≥
  1/8 — three planned joins whose decisions exercise every branch
  across the verified SFs (sf0.01: broadcast/broadcast/shuffle_salt;
  sf0.1: shuffle/shuffle/shuffle_salt — the l_linenumber halves sit at
  a 14.4–15.3% top-key share at every SF).
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


_JA_W, _JA_D = 1024, 4
_JA_BC = 10_000
_JA_NUM, _JA_DEN = 1, 8

_JA_PAIRS = [
    ("cust_orders",
     "SELECT c_custkey AS k FROM customer WHERE c_custkey IS NOT NULL",
     "SELECT o_custkey AS k FROM orders WHERE o_custkey IS NOT NULL"),
    ("part_li",
     "SELECT p_partkey AS k FROM part WHERE p_partkey IS NOT NULL",
     "SELECT l_partkey AS k FROM lineitem WHERE l_partkey IS NOT NULL"),
    ("li_halves",
     "SELECT l_linenumber AS k FROM lineitem "
     "WHERE l_orderkey % 2 = 0 AND l_linenumber IS NOT NULL",
     "SELECT l_linenumber AS k FROM lineitem "
     "WHERE l_orderkey % 2 = 1 AND l_linenumber IS NOT NULL"),
]


def _advice_oracle_sql() -> str:
    """Full integer replay of the advisor per pair: CMS cell grids
    (shared dm builder), per-depth inner products with zero-fill, d=0
    row counts, the HAVING-equivalent top-count (cnt·64 > n — the
    power-of-two form bit-equivalent to the operator's double
    compare), and the decision CASE — the oracle pins the ADVICE, not
    just the inputs."""
    from food_panda_etl_spark.operators.cms import _P, oracle_dm_sql

    blocks, rows = [], []
    for p, a_src, b_src in _JA_PAIRS:
        for side, src in (("a", a_src), ("b", b_src)):
            blocks.append(
                f"""{p}_c{side} AS (
        SELECT d, (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_JA_W} AS b,
               CAST(count(*) AS BIGINT) AS cnt
        FROM ({src}) t CROSS JOIN dm GROUP BY 1, 2)"""
            )
            blocks.append(
                f"""{p}_n{side} AS (
        SELECT CAST(coalesce(sum(cnt), 0) AS BIGINT) AS n
        FROM {p}_c{side} WHERE d = 0)"""
            )
            blocks.append(
                f"""{p}_t{side} AS (
        SELECT CAST(coalesce(max(c), 0) AS BIGINT) AS c
        FROM (SELECT count(*) AS c FROM ({src}) t GROUP BY k) g
        WHERE c * 64 > (SELECT n FROM {p}_n{side}))"""
            )
        blocks.append(
            f"""{p}_es AS (
        SELECT CAST(min(s) AS BIGINT) AS est FROM (
          SELECT dd.d, coalesce(s.s, 0) AS s
          FROM (SELECT DISTINCT d FROM dm) dd
          LEFT JOIN (SELECT ca.d AS d, sum(ca.cnt * cb.cnt) AS s
                     FROM {p}_ca ca JOIN {p}_cb cb
                       ON ca.d = cb.d AND ca.b = cb.b
                     GROUP BY ca.d) s ON dd.d = s.d))"""
        )
        rows.append(
            f"""SELECT '{p}' AS join_id, na.n AS n_a, nb.n AS n_b,
               es.est AS est_join_size,
               ta.c AS top_cnt_a, tb.c AS top_cnt_b,
               CASE WHEN least(na.n, nb.n) <= {_JA_BC} THEN 'broadcast'
                    WHEN ta.c * {_JA_DEN} >= na.n * {_JA_NUM}
                      OR tb.c * {_JA_DEN} >= nb.n * {_JA_NUM}
                      THEN 'shuffle_salt'
                    ELSE 'shuffle' END AS advice
        FROM {p}_na na CROSS JOIN {p}_nb nb CROSS JOIN {p}_es es
        CROSS JOIN {p}_ta ta CROSS JOIN {p}_tb tb"""
        )
    joined = ",\n    ".join(blocks)
    unioned = "\n    UNION ALL\n    ".join(rows)
    return f"""
    WITH dm AS {oracle_dm_sql(_JA_D)},
    {joined}
    {unioned}
    """


def test_join_advice_preview(spark, any_sf):
    """Sketch-driven join strategy advice (operators/join_advisor.py):
    broadcast / shuffle / salted-shuffle decided from CMS sketches
    (counts ride the d=0 cells, join size from the inner product) plus
    the exact Misra-Gries top-key counts — three planned joins whose
    decisions between them exercise every branch across the verified
    SFs (broadcast at sf0.01 flips to shuffle at sf0.1 as the dims
    outgrow the row bar; the l_linenumber halves stay shuffle_salt at
    14.5% top-key share). Integer end to end; the oracle replays the
    DECISION, not just the inputs."""
    from food_panda_etl_spark.operators.join_advisor import join_advice

    c = load_table(spark, any_sf, "customer")
    o = load_table(spark, any_sf, "orders")
    p = load_table(spark, any_sf, "part")
    li = load_table(spark, any_sf, "lineitem")
    rows = [
        join_advice(c, "c_custkey", o, "o_custkey", "cust_orders",
                    width=_JA_W, depth=_JA_D),
        join_advice(p, "p_partkey", li, "l_partkey", "part_li",
                    width=_JA_W, depth=_JA_D),
        join_advice(
            li.filter(F.col("l_orderkey") % 2 == 0), "l_linenumber",
            li.filter(F.col("l_orderkey") % 2 == 1), "l_linenumber",
            "li_halves", width=_JA_W, depth=_JA_D,
        ),
    ]
    got = rows[0].unionByName(rows[1]).unionByName(rows[2])
    assert compare(got, _advice_oracle_sql(), any_sf) == []
