"""Declared maintained-summary-state queries (r19) — driver evidence
for the FIVE r18 build-ahead declarations plus the two late-r18-banked
r20 faces, pulled forward one round (both were pre-verified through
the driver's own compare harness alongside the r19 bank, so early
evidence beats an idle slack slot; the r20 window is freed for
hardening). Together they close the incremental-state matrix: every
summary family now has a refresh face and (where a day dimension
exists) a windowed face with driver evidence —

- FREQUENT-ITEMS (exact): `q_incremental_heavy` + `q_heavy_window`
  (`operators/heavy_incremental.py`) — exact-then-truncate
  Misra-Gries state (Misra-Gries '82; mergeable form Agarwal et al.
  PODS'12 §3), deficit ≤ N/(k+1) under any merge tree, so the
  candidate screen is a provable superset and the exact
  candidates-only recount reproduces the brute-force HAVING
  row-for-row — the hash-match IS the
  no-heavy-key-lost-across-refreshes theorem.
- RANK/QUANTILE: `q_quantile_bucket_by_group`
  (`operators/quantile_bucket_group.py`, one exchange + one sort,
  plan-gated) and `q_incremental_quantile` + `q_quantile_window`
  (`operators/histogram_state.py`) — mergeable equi-width histogram
  state (Ioannidis, VLDB 2003 survey lineage); histograms are
  LINEAR, so refresh ≡ from-scratch and the hash-match IS the
  linearity identity, with exact integer-rank audit sides riding
  every read.
- FREQUENCY (sketch): `q_incremental_cms`
  (`operators/cms_incremental.py`) — CMS cell state is linear, same
  identity, with the one-sided never_under audit.
- CARDINALITY: `q_incremental_hll` (`operators/hll_incremental.py`)
  — registers merge by MAX, refresh ≡ from-scratch, read through the
  stamp-validated `hll_state_estimate` path.

A NEW module (the `queries/state_ops.py` r18 convention) so every
previously-green queries file stays byte-identical to its recorded
evidence. Query bodies and oracle strings moved VERBATIM from
`tests/test_r19_oracle_previews.py` / `tests/test_r20_oracle_previews.py`,
where they were pre-verified end to end at sf0.001/0.01 (and once at
sf0.1, SCALE.md r18). Pinned constants (measured at all three SFs
before pinning, r18):

- incremental heavy k=200 at threshold 1/100 over the doc_id%10
  corpus/batch token split: corpus ∪ batch = the WHOLE documents
  table, so the oracle is the brute-force HAVING over all tokens
  (30 heavy tokens at every verified SF — non-vacuous);
- heavy window k=10, threshold 1/5, 7 trailing days of per-day MG
  summaries merged across the dropped day dimension
  (`mg_merge_groups` — the q_cms_windowed convention applied to
  FREQUENT-ITEMS): the five event types split across the threshold
  at every verified SF (measured shares 16–28%);
- per-language quartile buckets on the (n_chars, doc_id) total order
  with the NULLS FIRST pin — bucket = ((rank−1)·4) div n_g;
- incremental quantile grid lo=0 step=16 n_buckets=40 over per-lang
  n_chars, split doc_id%10, quartile reads + exact ⌈q·n⌉-rank audit
  (est − step ≤ exact < est row-for-row by the in-bucket guarantee);
- quantile window grid lo=0.0 step=8.0 n_buckets=80 (power-of-two
  step: the double division is an exact scaling, bit-identical
  cross-engine), 7 trailing days, median + p90 reads;
- incremental CMS 3×512 (non-default geometry — the stamp path off
  the defaults; ~2k distinct part keys into 512 buckets collide for
  real at sf0.01) over the l_orderkey%10 split, 150 probes;
- incremental HLL over lineitem l_orderkey (~15k distinct at sf0.01
  — the raw-estimator regime n ≳ 2.5·m), split l_orderkey%7,
  estimate + exact-distinct audit via the ONE shared `_hll_oracle`
  builder (`queries/curation.py` — relation/key parameterized, no
  drift).

Reference parity: the reference pipeline (food-panda-etl) maintains no
summary state at all — it re-scrapes and re-aggregates per run
(/root/reference/src/main.rs:75-141); these faces are the
LLM-pipeline extension surface (SURVEY.md §2.10) that makes CDC-style
refreshes batch-bounded at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import (
    _P,
    cms_estimate,
    cms_sketch,
    oracle_dm_sql,
)
from food_panda_etl_spark.operators.cms_incremental import (
    incremental_cms_refresh,
)
from food_panda_etl_spark.operators.heavy_incremental import (
    heavy_candidates,
    incremental_heavy_refresh,
    mg_merge_groups,
    mg_summary,
)
from food_panda_etl_spark.operators.histogram_state import (
    hist_merge_groups,
    hist_quantiles,
    hist_summary,
    incremental_hist_refresh,
)
from food_panda_etl_spark.operators.hll_incremental import (
    build_hll_state,
    hll_state_estimate,
    incremental_hll_refresh,
)
from food_panda_etl_spark.operators.quantile_bucket_group import (
    group_rank_quantile_buckets,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.queries.curation import _hll_oracle
from food_panda_etl_spark.tables import load_table

_IH_K, _IH_NUM, _IH_DEN = 200, 1, 100
_HW_K, _HW_NUM, _HW_DEN, _HW_WIN = 10, 1, 5, 7
_QB_B = 4
_DAY_US = 86_400_000_000

_IQ_LO, _IQ_STEP, _IQ_NB = 0, 16, 40
_QW_LO, _QW_STEP, _QW_NB, _QW_WIN = 0.0, 8.0, 80, 7

_IC_W, _IC_D, _IC_PROBES = 512, 3, 150


@query(
    "q_incremental_heavy",
    oracle=f"""
    WITH tok AS (SELECT unnest(string_split(text, ' ')) AS token
                 FROM documents)
    SELECT token, CAST(count(*) AS BIGINT) AS cnt
    FROM tok
    GROUP BY token
    HAVING count(*) * {_IH_DEN} > {_IH_NUM} * (SELECT count(*) FROM tok)
    """,
)
def q_incremental_heavy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact heavy hitters from maintained MG state
    (operators/heavy_incremental.py): corpus-state + batch refresh →
    candidate screen → exact candidates-only recount over
    corpus ∪ batch (= the whole token stream), equal row-for-row to
    the brute-force HAVING."""
    d = load_table(spark, sf_dir, "documents")
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
    return (
        corpus_t.unionByName(batch_t)
        .join(F.broadcast(cand), "token", "semi")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(t.select("n")))
        .filter(F.col("cnt") * _IH_DEN > F.col("n") * _IH_NUM)
        .select("token", "cnt")
    )


@query(
    "q_heavy_window",
    oracle=f"""
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
    """,
)
def q_heavy_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window heavy hitters from per-day MG summaries
    (operators/heavy_incremental.py::mg_merge_groups): day-filtered
    state merged across the dropped day dimension, screened, and
    exact-recounted over the window rows. The oracle replays the
    window's brute-force HAVING."""
    ev = (
        load_table(spark, sf_dir, "events")
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
    return (
        win.join(F.broadcast(cand), "event_type", "semi")
        .groupBy("event_type")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(mt.select("n")))
        .filter(F.col("cnt") * _HW_DEN > F.col("n") * _HW_NUM)
        .select("event_type", "cnt")
    )


@query(
    "q_quantile_bucket_by_group",
    oracle=f"""
    SELECT lang, doc_id,
           CAST(((row_number() OVER (
                      PARTITION BY lang
                      ORDER BY n_chars ASC NULLS FIRST,
                               doc_id ASC NULLS FIRST) - 1) * {_QB_B})
                // (count(*) OVER (PARTITION BY lang)) AS INT) AS bucket
    FROM documents
    """,
)
def q_quantile_bucket_by_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-group rank-quantile bucketing
    (operators/quantile_bucket_group.py): per-language n_chars
    quartiles on the (n_chars, doc_id) total order. The oracle is the
    direct window replay — NULLS FIRST pinned on both sides."""
    d = load_table(spark, sf_dir, "documents").select(
        "lang", "doc_id", "n_chars"
    )
    return group_rank_quantile_buckets(
        d, ("lang",), "n_chars", _QB_B, ("doc_id",)
    ).select("lang", "doc_id", "bucket")


@query(
    "q_incremental_quantile",
    oracle=f"""
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
    """,
)
def q_incremental_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental per-language quantiles from maintained equi-width
    histogram state (operators/histogram_state.py): corpus-state +
    batch refresh → quartile reads over corpus ∪ batch (= the whole
    documents table, by linearity), with the exact integer-rank
    quantiles as the audit side."""
    d = (
        load_table(spark, sf_dir, "documents")
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
    return est.join(exact, ["lang", "q_num"])


@query(
    "q_quantile_window",
    oracle=f"""
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
    """,
)
def q_quantile_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window value quantiles from per-day histogram state
    (operators/histogram_state.py::hist_merge_groups): day-filtered
    state merged across the dropped day dimension, read at median +
    p90, with the exact window quantiles as the audit side. The
    oracle replays the window's histogram directly — equal BY
    LINEARITY to the engine's sum-of-day-states."""
    ev = (
        load_table(spark, sf_dir, "events")
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
    return est.join(exact, ["q_num", "q_den"])


@query(
    "q_incremental_cms",
    oracle=f"""
    WITH dm AS {oracle_dm_sql(_IC_D)},
    sk AS MATERIALIZED (
      SELECT d, ((l_partkey % {_P}) * a + c) % {_P} % {_IC_W} AS b,
             count(*) AS cnt
      FROM lineitem CROSS JOIN dm
      GROUP BY d, ((l_partkey % {_P}) * a + c) % {_P} % {_IC_W}),
    pr AS (SELECT unnest(generate_series(1, {_IC_PROBES})) AS k),
    pc AS (SELECT k, d, ((k % {_P}) * a + c) % {_P} % {_IC_W} AS b
           FROM pr CROSS JOIN dm),
    est AS (SELECT k, min(coalesce(cnt, 0)) AS est
            FROM pc LEFT JOIN sk USING (d, b) GROUP BY k),
    ex AS (SELECT l_partkey AS k, count(*) AS exact_cnt FROM lineitem
           WHERE l_partkey BETWEEN 1 AND {_IC_PROBES} GROUP BY l_partkey)
    SELECT CAST(est.k AS BIGINT) AS k,
           CAST(est.est AS BIGINT) AS est,
           CAST(coalesce(ex.exact_cnt, 0) AS BIGINT) AS exact_cnt,
           CAST(est.est >= coalesce(ex.exact_cnt, 0) AS INT) AS never_under
    FROM est LEFT JOIN ex USING (k)
    """,
)
def q_incremental_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental CMS from maintained cell state
    (operators/cms_incremental.py): corpus-state + batch refresh →
    probe estimates + exact recount over corpus ∪ batch (= all of
    lineitem, by linearity) with the one-sided never_under audit."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .localCheckpoint(eager=False)  # consumers: state build + recount
    )
    st = cms_sketch(
        li.filter(F.col("l_orderkey") % 10 != 0), "l_partkey", _IC_W, _IC_D
    )
    # pin the refreshed state (the maintained-state regime: state IS a
    # materialized table between refreshes)
    st = incremental_cms_refresh(
        st, li.filter(F.col("l_orderkey") % 10 == 0), "l_partkey",
        _IC_W, _IC_D,
    ).localCheckpoint(eager=False)
    probes = spark.range(1, _IC_PROBES + 1).select(F.col("id").alias("k"))
    est = cms_estimate(st, probes, "k", _IC_W, _IC_D)
    exact = (
        li.filter(
            (F.col("l_partkey") >= 1) & (F.col("l_partkey") <= _IC_PROBES)
        )
        .groupBy(F.col("l_partkey").alias("k"))
        .agg(F.count("*").alias("exact_cnt"))
    )
    return (
        est.join(exact, "k", "left")
        .select(
            "k",
            "est",
            F.coalesce(F.col("exact_cnt"), F.lit(0)).alias("exact_cnt"),
            (F.col("est") >= F.coalesce(F.col("exact_cnt"), F.lit(0)))
            .cast("int")
            .alias("never_under"),
        )
    )


@query("q_incremental_hll", oracle=_hll_oracle(key="l_orderkey"))
def q_incremental_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental HLL from stamped register state
    (operators/hll_incremental.py): corpus-state + batch refresh →
    the one-row estimate record with the exact-distinct audit, equal
    to the from-scratch sketch of all of lineitem by register-max
    mergeability."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .localCheckpoint(eager=False)  # consumers: state build + audit
    )
    st = build_hll_state(
        li.filter(F.col("l_orderkey") % 7 != 0), "l_orderkey"
    )
    st = incremental_hll_refresh(
        st, li.filter(F.col("l_orderkey") % 7 == 0), "l_orderkey"
    ).localCheckpoint(eager=False)
    est = hll_state_estimate(st)  # the stamp-validated read
    exact = li.agg(
        F.countDistinct("l_orderkey").cast("bigint").alias("n_exact")
    )
    return est.crossJoin(F.broadcast(exact)).select(
        "nonzero_regs",
        "dyadic_sum",
        "raw_estimate",
        "n_exact",
        (F.col("raw_estimate") / F.col("n_exact").cast("double")).alias(
            "ratio"
        ),
    )
