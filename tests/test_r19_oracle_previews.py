"""r19 declaration previews: the r18 build-ahead operators' future
declared queries, run against their EXACT intended DuckDB oracle SQL
through the same compare harness the driver uses — everything but the
registry entries (which must wait for the r19 window per the rotation
contract). When r19 declares them, the bodies and oracle strings move
VERBATIM into a queries/ module and this file is rewritten
registry-driven (the r10–r18 convention, ENFORCED by
tests/test_registry_rotation.py::test_preview_verified_queries_get_declared
— these ``*_preview`` functions fail the build if WINDOW_ROUND reaches
19 without the declarations landing).

Two component families, three declarations:

- q_incremental_heavy — the maintained-state refresh face of the
  exact-FREQUENT-ITEMS family (`operators/heavy_incremental.py`): a
  deterministic exact-then-truncate Misra-Gries summary of the corpus
  token stream (k=200, ≤ k rows + one totals row of state), refreshed
  with the batch split, screened at 1/100, exact-recounted on
  candidates only (broadcast semi-join — map-only over the standing
  fact, the incremental_neardup verify discipline). Corpus/batch split
  doc_id%10; corpus ∪ batch = the whole documents table, so the
  oracle is the brute-force HAVING over all tokens — the hash-match
  IS the no-heavy-key-lost-across-refreshes theorem (Agarwal et al.
  PODS'12: deficit ≤ N/(k+1) under any merge tree; 30 heavy tokens at
  every verified SF — non-vacuous).

- q_heavy_window — the WINDOWED face of the same family ("the
  frequent event types of the last 7 days" from per-day summaries,
  day-filtered and merged across the dropped day dimension via
  `mg_merge_groups` — the q_cms_windowed / q_bloom_window /
  q_group_priority_window convention applied to FREQUENT-ITEMS).
  k=10, threshold 1/5: the five event types split across the
  threshold at every verified SF (measured shares 16–28%) — a real
  split, not a constant verdict. The oracle replays the window's
  brute-force HAVING.

- q_quantile_bucket_by_group — the per-group face of the
  rank-quantile bucketing family
  (`operators/quantile_bucket_group.py`, the r17 registry notes'
  named candidate): per-language n_chars quartiles, bucket =
  ((rank−1)·4) div n_g on the (n_chars, doc_id) total order with the
  NULLS FIRST pin. ONE exchange + one sort (plan-gated in
  tests/test_quantile_bucket_group.py) vs the flat operator's
  two-phase global rank; the oracle is the direct window replay.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.tables import load_table
from tests.oracle_compare import compare

_SF01 = "/root/testdata/sf0.01"

_IH_K, _IH_NUM, _IH_DEN = 200, 1, 100
_HW_K, _HW_NUM, _HW_DEN, _HW_WIN = 10, 1, 5, 7
_QB_B = 4
_DAY_US = 86_400_000_000


@pytest.fixture(params=["sf0.001", "sf0.01"])
def any_sf(request, sf_dir):
    return _SF01 if request.param == "sf0.01" else sf_dir


def test_incremental_heavy_preview(spark, any_sf):
    """Incremental exact heavy hitters from maintained MG state
    (operators/heavy_incremental.py): corpus-state + batch refresh →
    candidate screen → exact candidates-only recount over
    corpus ∪ batch (= the whole token stream), equal row-for-row to
    the brute-force HAVING."""
    from food_panda_etl_spark.operators.heavy_incremental import (
        heavy_candidates,
        incremental_heavy_refresh,
        mg_summary,
    )

    d = load_table(spark, any_sf, "documents")
    tok = F.explode(F.split(F.col("text"), " ")).alias("token")
    corpus_t = (
        d.filter(F.col("doc_id") % 10 != 0)
        .select(tok)
        .localCheckpoint(eager=False)  # consumers: state build + recount
    )
    batch_t = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select(tok)
        .localCheckpoint(eager=False)  # consumers: refresh + recount
    )
    c, t = mg_summary(corpus_t, "token", _IH_K)
    # pin the refreshed state (the maintained-state regime: state IS a
    # materialized table between refreshes; un-pinned, the summary
    # subtrees re-expand once per downstream consumer)
    c, t = incremental_heavy_refresh(c, t, batch_t, "token", _IH_K)
    c = c.localCheckpoint(eager=False)
    t = t.localCheckpoint(eager=False)
    cand = heavy_candidates(c, t, "token", _IH_NUM, _IH_DEN, _IH_K)
    got = (
        corpus_t.unionByName(batch_t)
        .join(F.broadcast(cand), "token", "semi")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(t.select("n")))
        .filter(F.col("cnt") * _IH_DEN > F.col("n") * _IH_NUM)
        .select("token", "cnt")
    )
    oracle = f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM tok
    GROUP BY token
    HAVING count(*) * {_IH_DEN} > {_IH_NUM} * (SELECT count(*) FROM tok)
    """
    assert compare(got, oracle, any_sf) == []


def test_heavy_window_preview(spark, any_sf):
    """Trailing-window heavy hitters from per-day MG summaries
    (operators/heavy_incremental.py::mg_merge_groups): day-filtered
    state merged across the dropped day dimension, screened, and
    exact-recounted over the window rows. The oracle replays the
    window's brute-force HAVING."""
    from food_panda_etl_spark.operators.heavy_incremental import (
        heavy_candidates,
        mg_merge_groups,
        mg_summary,
    )

    ev = (
        load_table(spark, any_sf, "events")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
            ).alias("day"),
        )
        .localCheckpoint(eager=False)  # consumers: state, max-day, recount
    )
    by_day_c, by_day_t = mg_summary(
        ev, "event_type", _HW_K, group_cols=("day",)
    )
    # pin the per-day state (materialized between days in real use)
    by_day_c = by_day_c.localCheckpoint(eager=False)
    by_day_t = by_day_t.localCheckpoint(eager=False)
    mx = ev.agg(F.max("day").alias("md"))
    c_f = (
        by_day_c.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _HW_WIN)
        .drop("md")
    )
    t_f = (
        by_day_t.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _HW_WIN)
        .drop("md")
    )
    mc, mt = mg_merge_groups([(c_f, t_f)], "event_type", _HW_K)
    mt = mt.localCheckpoint(eager=False)  # consumers: screen + threshold n
    cand = heavy_candidates(mc, mt, "event_type", _HW_NUM, _HW_DEN, _HW_K)
    win = ev.crossJoin(F.broadcast(mx)).filter(
        F.col("day") > F.col("md") - _HW_WIN
    )
    got = (
        win.join(F.broadcast(cand), "event_type", "semi")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(mt.select("n")))
        .filter(F.col("cnt") * _HW_DEN > F.col("n") * _HW_NUM)
        .select("event_type", "cnt")
    )
    oracle = f"""
    WITH ev AS (SELECT event_type, epoch_us(ts) // {_DAY_US} AS day
                FROM events
                WHERE event_type IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS (SELECT event_type FROM ev CROSS JOIN mx
            WHERE day > md - {_HW_WIN}),
    c AS (SELECT event_type, CAST(count(*) AS BIGINT) AS cnt
          FROM win GROUP BY event_type),
    n AS (SELECT count(*) AS nw FROM win)
    SELECT event_type, cnt
    FROM c CROSS JOIN n
    WHERE cnt * {_HW_DEN} > {_HW_NUM} * nw
    """
    assert compare(got, oracle, any_sf) == []


def test_quantile_bucket_by_group_preview(spark, any_sf):
    """Per-group rank-quantile bucketing
    (operators/quantile_bucket_group.py): per-language n_chars
    quartiles on the (n_chars, doc_id) total order. The oracle is the
    direct window replay — NULLS FIRST pinned on both sides."""
    from food_panda_etl_spark.operators.quantile_bucket_group import (
        group_rank_quantile_buckets,
    )

    d = load_table(spark, any_sf, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    got = group_rank_quantile_buckets(
        d, ("lang",), "n_chars", _QB_B, ("doc_id",)
    ).select("lang", "doc_id", "bucket")
    oracle = f"""
    SELECT lang, doc_id,
           CAST(((row_number() OVER (
                      PARTITION BY lang
                      ORDER BY n_chars ASC NULLS FIRST,
                               doc_id ASC NULLS FIRST) - 1) * {_QB_B})
                // (count(*) OVER (PARTITION BY lang)) AS INT) AS bucket
    FROM documents
    """
    assert compare(got, oracle, any_sf) == []
