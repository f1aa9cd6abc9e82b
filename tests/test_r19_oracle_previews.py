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

Three component families, five declarations:

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

- q_incremental_quantile — the maintained-state refresh face of the
  SAME rank/quantile family (`operators/histogram_state.py`): a
  mergeable equi-width histogram of per-language n_chars (grid
  lo=0 step=16 n_buckets=40, ≤ 40 rows of state per language),
  refreshed with the doc_id%10 batch split — histograms are LINEAR,
  so the refreshed state is IDENTICAL to the from-scratch histogram
  of corpus ∪ batch (no deficit bookkeeping, no repair pass) and the
  hash-match IS the linearity identity. Output: per-language
  quartile upper-edge estimates PLUS the exact integer-rank
  quantiles as the audit side — the ⌈q·n⌉ rank rule on both sides,
  est − step ≤ exact < est row-for-row by the in-bucket guarantee.

- q_quantile_window — the WINDOWED face of the same family ("the
  value quantiles of the last 7 days" from per-day histograms,
  day-filtered and merged across the dropped day dimension via
  `hist_merge_groups` — the q_cms_windowed / q_heavy_window
  convention applied to QUANTILES). Grid lo=0.0 step=8.0
  n_buckets=80 (power-of-two step: the double division is an exact
  scaling, so every cell is bit-identical cross-engine); reads
  median + p90 with the exact window quantiles as the audit side.
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


_IQ_LO, _IQ_STEP, _IQ_NB = 0, 16, 40
_QW_LO, _QW_STEP, _QW_NB, _QW_WIN = 0.0, 8.0, 80, 7


def test_incremental_quantile_preview(spark, any_sf):
    """Incremental per-language quantiles from maintained equi-width
    histogram state (operators/histogram_state.py): corpus-state +
    batch refresh → quartile reads over corpus ∪ batch (= the whole
    documents table, by linearity), with the exact integer-rank
    quantiles as the audit side."""
    from pyspark.sql import Window

    from food_panda_etl_spark.operators.histogram_state import (
        hist_quantiles,
        hist_summary,
        incremental_hist_refresh,
    )

    d = (
        load_table(spark, any_sf, "documents")
        .filter(F.col("n_chars").isNotNull())
        .select("lang", "doc_id", "n_chars")
        .localCheckpoint(eager=False)  # consumers: state build + audit
    )
    st = hist_summary(
        d.filter(F.col("doc_id") % 10 != 0),
        "n_chars", _IQ_LO, _IQ_STEP, _IQ_NB, ("lang",),
    )
    # pin the refreshed state (the maintained-state regime: state IS a
    # materialized table between refreshes)
    st = incremental_hist_refresh(
        st, d.filter(F.col("doc_id") % 10 == 0),
        "n_chars", _IQ_LO, _IQ_STEP, _IQ_NB, ("lang",),
    ).localCheckpoint(eager=False)
    est = hist_quantiles(
        st, [(1, 4), (2, 4), (3, 4)],
        "n_chars", _IQ_LO, _IQ_STEP, _IQ_NB, ("lang",),
    ).select(
        "lang", "q_num", F.col("est").cast("bigint").alias("est_chars")
    )
    # exact audit side: min value whose cumulative row count reaches
    # rank ceil(q·n) — integer comparison cum·4 >= q_num·n, the same
    # rank rule the histogram read implements
    vc = d.groupBy("lang", "n_chars").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("lang")
    q_arr = F.array(*[
        F.struct(F.lit(q).alias("q_num")) for q in (1, 2, 3)
    ])
    exact = (
        vc.select(
            "lang",
            "n_chars",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        .select("lang", "n_chars", "cum", "n", F.explode(q_arr).alias("__q"))
        .filter(F.col("cum") * 4 >= F.col("__q.q_num") * F.col("n"))
        .groupBy("lang", F.col("__q.q_num").alias("q_num"))
        .agg(F.min("n_chars").cast("bigint").alias("exact_chars"))
    )
    got = est.join(exact, ["lang", "q_num"])
    oracle = f"""
    WITH d AS (SELECT lang, n_chars FROM documents
               WHERE n_chars IS NOT NULL),
    h AS (SELECT lang,
                 LEAST({_IQ_NB - 1}, CAST(floor(
                     (LEAST({_IQ_LO + _IQ_NB * _IQ_STEP}.0, GREATEST(
                          {_IQ_LO}.0, CAST(n_chars AS DOUBLE)))
                      - {_IQ_LO}.0) / {_IQ_STEP}.0) AS BIGINT)) AS bucket,
                 count(*) AS cnt
          FROM d GROUP BY 1, 2),
    c AS (SELECT lang, bucket,
                 sum(cnt) OVER (PARTITION BY lang ORDER BY bucket) AS cum,
                 sum(cnt) OVER (PARTITION BY lang) AS n
          FROM h),
    q AS (SELECT * FROM (VALUES (1), (2), (3)) AS t(qn)),
    est AS (SELECT lang, qn AS q_num,
                   CAST({_IQ_STEP} * (min(bucket) + 1) AS BIGINT)
                       AS est_chars
            FROM c CROSS JOIN q
            WHERE cum * 4 >= qn * n
            GROUP BY lang, qn),
    vc AS (SELECT lang, n_chars, count(*) AS c FROM d GROUP BY 1, 2),
    vv AS (SELECT lang, n_chars,
                  sum(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
                  sum(c) OVER (PARTITION BY lang) AS n
           FROM vc),
    ex AS (SELECT lang, qn AS q_num,
                  CAST(min(n_chars) AS BIGINT) AS exact_chars
           FROM vv CROSS JOIN q
           WHERE cum * 4 >= qn * n
           GROUP BY lang, qn)
    SELECT est.lang, est.q_num, est.est_chars, ex.exact_chars
    FROM est JOIN ex USING (lang, q_num)
    """
    assert compare(got, oracle, any_sf) == []


def test_quantile_window_preview(spark, any_sf):
    """Trailing-window value quantiles from per-day histogram state
    (operators/histogram_state.py::hist_merge_groups): day-filtered
    state merged across the dropped day dimension, read at median +
    p90, with the exact window quantiles as the audit side. The
    oracle replays the window's histogram directly — equal BY
    LINEARITY to the engine's sum-of-day-states."""
    from pyspark.sql import Window

    from food_panda_etl_spark.operators.histogram_state import (
        hist_merge_groups,
        hist_quantiles,
        hist_summary,
    )

    ev = (
        load_table(spark, any_sf, "events")
        # NaN filtered with NULL, mirroring hist_summary's skip (the
        # audit side must see the same row set as the state build)
        .filter(
            F.col("value").isNotNull()
            & ~F.isnan(F.col("value"))
            & F.col("ts").isNotNull()
        )
        .select(
            "value",
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
            ).alias("day"),
        )
        .localCheckpoint(eager=False)  # consumers: state, max-day, audit
    )
    by_day = hist_summary(
        ev, "value", _QW_LO, _QW_STEP, _QW_NB, ("day",)
    ).localCheckpoint(eager=False)  # per-day state (materialized in real use)
    mx = ev.agg(F.max("day").alias("md"))
    filt = (
        by_day.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _QW_WIN)
        .drop("md")
    )
    merged = hist_merge_groups([filt], _QW_LO, _QW_STEP, _QW_NB, "value")
    est = hist_quantiles(
        merged, [(1, 2), (9, 10)], "value", _QW_LO, _QW_STEP, _QW_NB
    ).withColumnRenamed("est", "est_value")
    win = (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _QW_WIN)
        .select("value")
    )
    vc = win.groupBy("value").agg(F.count("*").alias("c"))
    w_cum = (
        Window.partitionBy(F.lit(0))
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy(F.lit(0))
    q_arr = F.array(
        F.struct(F.lit(1).alias("q_num"), F.lit(2).alias("q_den")),
        F.struct(F.lit(9).alias("q_num"), F.lit(10).alias("q_den")),
    )
    exact = (
        vc.select(
            "value",
            F.sum("c").over(w_cum).alias("cum"),
            F.sum("c").over(w_all).alias("n"),
        )
        .select("value", "cum", "n", F.explode(q_arr).alias("__q"))
        .filter(
            F.col("cum") * F.col("__q.q_den")
            >= F.col("__q.q_num") * F.col("n")
        )
        .groupBy(
            F.col("__q.q_num").alias("q_num"),
            F.col("__q.q_den").alias("q_den"),
        )
        .agg(F.min("value").alias("exact_value"))
    )
    got = est.join(exact, ["q_num", "q_den"])
    oracle = f"""
    WITH ev AS (SELECT value, epoch_us(ts) // {_DAY_US} AS day
                FROM events
                WHERE value IS NOT NULL AND NOT isnan(value)
                  AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS (SELECT value FROM ev CROSS JOIN mx
            WHERE day > md - {_QW_WIN}),
    h AS (SELECT LEAST({_QW_NB - 1}, CAST(floor(
                     (LEAST({_QW_LO + _QW_NB * _QW_STEP}, GREATEST(
                          {_QW_LO}, value)) - {_QW_LO}) / {_QW_STEP})
                     AS BIGINT)) AS bucket,
                 count(*) AS cnt
          FROM win GROUP BY 1),
    c AS (SELECT bucket,
                 sum(cnt) OVER (ORDER BY bucket) AS cum,
                 sum(cnt) OVER () AS n
          FROM h),
    q AS (SELECT * FROM (VALUES (1, 2), (9, 10)) AS t(qn, qd)),
    est AS (SELECT qn AS q_num, qd AS q_den, min(bucket) AS bucket
            FROM c CROSS JOIN q
            WHERE cum * qd >= qn * n
            GROUP BY qn, qd),
    vc AS (SELECT value, count(*) AS c FROM win GROUP BY 1),
    vv AS (SELECT value,
                  sum(c) OVER (ORDER BY value) AS cum,
                  sum(c) OVER () AS n
           FROM vc),
    ex AS (SELECT qn AS q_num, qd AS q_den, min(value) AS exact_value
           FROM vv CROSS JOIN q
           WHERE cum * qd >= qn * n
           GROUP BY qn, qd)
    SELECT est.q_num, est.q_den, est.bucket,
           CAST({_QW_LO} + {_QW_STEP} * (est.bucket + 1) AS DOUBLE)
               AS est_value,
           ex.exact_value
    FROM est JOIN ex USING (q_num, q_den)
    """
    assert compare(got, oracle, any_sf) == []
