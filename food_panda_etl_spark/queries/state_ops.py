"""Declared maintained-state / set-algebra queries (r18) — the three
r17 build-ahead component families' first driver evidence: the ICWS
real-weight incremental screen (`operators/incremental_icws.py` — a
refresh batch probed against a standing corpus' maintained
counted-shingle table + ICWS band index, completing the
incremental-refresh symmetry for REAL weights), BOTH faces of the
incremental sampling component (`operators/sampling_incremental.py` —
the per-group weighted bottom-k state refresh whose hash-match IS the
mergeable bottom-k identity, and the trailing-window re-bucketing
combine, the q_cms_windowed/q_hll_windowed/q_bloom_window convention
applied to SAMPLING), and Bloom set algebra
(`operators/bloom_algebra.py` — the AND combine completing the
membership family's cross-sketch symmetry with q_hll_intersect_gate
(cardinality) and q_cms_join_size (frequency)). A NEW module (the
`queries/weighted_ops.py` / `queries/incremental_ops.py` convention)
so every previously-green queries file stays byte-identical to its
recorded evidence.

The query bodies and oracle strings moved VERBATIM from
`tests/test_r18_oracle_previews.py`, where they were pre-verified end
to end through the driver's own compare harness at sf0.001 and sf0.01
(and once at sf0.1, SCALE.md r17). Pinned constants (measured at all
three SFs before pinning, r17):

- incremental ICWS n=3, τ=7/10, r=2 b=16 over the corpus/batch split
  (doc_id%10, +1e6 injection of corpus%7 docs — the
  q_incremental_neardup shape): the oracle is the brute-force
  cross-side count-join on the shared multiset replay, so the
  hash-match measures the cross-side ICWS banding recall at the
  fixture similarities (measured: zero misses at every verified SF —
  the injected dups sit at J_tf=1 where banding never misses, the
  organic pairs at J_tf ≥ 0.7 where the per-pair miss is ≤ 2e-5);
- incremental group priority k=7 per lang, weight = n_chars, split
  doc_id%10: corpus ∪ batch = the WHOLE documents table, so the
  oracle replays the plain full-table row_number-over-(h/w, id) —
  the hash-match IS the merge theorem;
- group priority window k=5 per event_type, weight =
  CAST(round(value·100) AS BIGINT)+1 (the registry's integer-grid
  rounding convention — identical half-away-from-zero in both
  engines on positive values), window 7 days: per-(day, type)
  bottom-k states day-filtered and re-ranked across the dropped day
  dimension; the oracle replays the direct bottom-k over the
  window's raw rows, so the hash-match IS the dropped-dimension
  identity;
- Bloom intersect m=2^16, k=4, probes [0, 3000), split at
  max(day) − 15: two per-half sketches bitwise-ANDed (row-set
  intersection of the (j, b) relations — no false negatives for the
  key-set intersection, Broder–Mitzenmacher 2004 §5); deterministic
  affine cells, so maybe_present, the exact truly_present, and the
  no-false-negatives audit hash-match bit-for-bit (unlike the
  family's ESTIMATE gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import oracle_bloom_dm_sql
from food_panda_etl_spark.operators.cms import _P
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_cte_sql,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_II_NUM, _II_DEN = 7, 10
_IGP_K = 7
_GPW_K, _GPW_WIN = 5, 7
_DAY_US = 86_400_000_000

_BI_M, _BI_K, _BI_PROBES, _BI_SPLIT = 1 << 16, 4, 3000, 15
_BI_WIDTH = _BI_M // _BI_K


@query(
    "q_incremental_icws",
    oracle=f"""
    WITH {shingle_multiset_cte_sql(3)},
    bsm AS (SELECT doc, shingle, c FROM shm WHERE doc % 10 = 0
            UNION ALL
            SELECT doc + 1000000 AS doc, shingle, c FROM shm
            WHERE doc % 10 <> 0 AND doc % 7 = 0),
    csm AS (SELECT doc, shingle, c FROM shm WHERE doc % 10 <> 0),
    bt AS (SELECT doc, CAST(sum(c) AS BIGINT) AS nw FROM bsm GROUP BY doc),
    ct AS (SELECT doc, CAST(sum(c) AS BIGINT) AS nw FROM csm GROUP BY doc),
    wi AS (SELECT b.doc AS bdoc, c.doc AS cdoc,
                  CAST(sum(least(b.c * ct.nw, c.c * bt.nw)) AS BIGINT) AS wi
           FROM bsm b
           JOIN csm c ON b.shingle = c.shingle
           JOIN bt ON b.doc = bt.doc
           JOIN ct ON c.doc = ct.doc
           GROUP BY 1, 2)
    SELECT bdoc AS doc_id, cdoc AS dup_of, wi AS wi_scaled,
           CAST(wi AS DOUBLE)
             / CAST(2 * bt.nw * ct.nw - wi AS DOUBLE) AS tf_jaccard
    FROM wi
    JOIN bt ON bdoc = bt.doc
    JOIN ct ON cdoc = ct.doc
    WHERE wi * {_II_DEN + _II_NUM} >= 2 * {_II_NUM} * bt.nw * ct.nw
    """,
)
def q_incremental_icws(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 incremental ICWS real-weight near-dup screen (r17
    operator, declared r18): a refresh batch probed against the
    standing corpus' maintained band index
    (`operators/incremental_icws.py`), exact TF-weighted verify on
    candidates only (the shared `tf_count_table_verify`, cross-side
    mode). Corpus = doc_id%10 <> 0; batch = doc_id%10 = 0 plus
    corpus%7 docs re-id'd at +1e6 (injected J_tf-1 rows, non-vacuous
    at every SF). The oracle is the brute-force cross-side count-join
    on the shared multiset replay."""
    from food_panda_etl_spark.operators.incremental_icws import (
        incremental_icws_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = (
        d.filter(F.col("doc_id") % 10 == 0)
        .select("doc_id", "text")
        .unionByName(
            corpus.filter(F.col("doc_id") % 7 == 0).select(
                (F.col("doc_id") + 1000000).alias("doc_id"), "text"
            )
        )
    )
    return incremental_icws_pairs(
        corpus, batch, "doc_id", "text", n=3,
        threshold_num=_II_NUM, threshold_den=_II_DEN,
    )


@query(
    "q_incremental_group_priority",
    oracle=f"""
    WITH h AS (SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS w,
                      ((doc_id % 1000003) * 1315423911) % 1000003 AS h
               FROM documents),
    p AS (SELECT lang, doc_id, w,
                 CAST(h AS DOUBLE) / CAST(w AS DOUBLE) AS priority
          FROM h WHERE w > 0),
    r AS (SELECT lang, doc_id, w, priority,
                 CAST(row_number() OVER (PARTITION BY lang
                      ORDER BY priority, doc_id) AS INT) AS rk
          FROM p)
    SELECT lang, doc_id, w AS weight, priority, rk
    FROM r WHERE rk <= {_IGP_K}
    """,
)
def q_incremental_group_priority(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """§2.10 incremental group-wise priority sampling (r17 operator,
    declared r18 — `operators/sampling_incremental.py`): maintained
    per-lang weighted bottom-7 state (from the corpus split) refreshed
    with the batch split — corpus ∪ batch is the whole documents
    table, so the oracle is the plain full-table replay and the
    hash-match IS the mergeable bottom-k identity."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )
    from food_panda_etl_spark.operators.sampling_incremental import (
        incremental_group_priority_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    batch = d.filter(F.col("doc_id") % 10 == 0)
    state = group_priority_sample(corpus, ("lang",), "n_chars", _IGP_K)
    return incremental_group_priority_sample(
        state, batch, ("lang",), "n_chars", _IGP_K
    )


@query(
    "q_group_priority_window",
    oracle=f"""
    WITH ev AS (SELECT event_type, event_id,
                       CAST(round(value * 100) AS BIGINT) + 1 AS w,
                       epoch_us(ts) // {_DAY_US} AS day
                FROM events
                WHERE event_id IS NOT NULL AND ts IS NOT NULL
                  AND value IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    win AS (SELECT event_type, event_id, w FROM ev CROSS JOIN mx
            WHERE day > md - {_GPW_WIN}),
    p AS (SELECT event_type, event_id, w,
                 CAST(((event_id % 1000003) * 1315423911) % 1000003
                      AS DOUBLE) / CAST(w AS DOUBLE) AS priority
          FROM win WHERE w > 0),
    r AS (SELECT event_type, event_id, w, priority,
                 CAST(row_number() OVER (PARTITION BY event_type
                      ORDER BY priority, event_id) AS INT) AS rk
          FROM p)
    SELECT event_type, event_id, w AS weight, priority, rk
    FROM r WHERE rk <= {_GPW_K}
    """,
)
def q_group_priority_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 trailing-window group-wise priority sampling (r17
    operator, declared r18 —
    `operators/sampling_incremental.py::group_priority_rebucket`): a
    weighted sample of the last 7 days' events per event_type from
    per-(day, type) bottom-k states, re-ranked across the dropped day
    dimension. The oracle replays the direct bottom-k over the
    window's raw rows — the hash-match IS the dropped-dimension
    identity."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )
    from food_panda_etl_spark.operators.sampling_incremental import (
        group_priority_rebucket,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(
            F.col("event_id").isNotNull()
            & F.col("ts").isNotNull()
            & F.col("value").isNotNull()
        )
        .select(
            "event_type",
            "event_id",
            (F.round(F.col("value") * 100).cast("bigint") + 1).alias("w"),
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
            ).alias("day"),
        )
    )
    ev = ev.localCheckpoint(eager=False)  # consumers: sampler, max-day
    by_day = group_priority_sample(
        ev, ("event_type", "day"), "w", _GPW_K, id_col="event_id"
    )
    # anchor the window on the RAW events' max day, exactly as the
    # oracle's mx CTE does — anchoring on the sampled state would
    # diverge if the newest day held only zero-weight rows (review
    # r17; impossible on this fixture where w = round(value·100)+1 ≥ 2
    # since value > 0, but this declaration is the operator's spec)
    mx = ev.agg(F.max("day").alias("md"))
    recent = (
        by_day.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _GPW_WIN)
        .drop("md")
    )
    return group_priority_rebucket(
        recent, ("event_type",), _GPW_K, id_col="event_id"
    )


@query(
    "q_bloom_intersect",
    oracle=f"""
    WITH dm AS {oracle_bloom_dm_sql(_BI_K)},
    ev AS (SELECT user_id AS k, epoch_us(ts) // {_DAY_US} AS day
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    ka AS (SELECT DISTINCT k AS key FROM ev CROSS JOIN mx
           WHERE day <= md - {_BI_SPLIT}),
    kb AS (SELECT DISTINCT k AS key FROM ev CROSS JOIN mx
           WHERE day > md - {_BI_SPLIT}),
    ba AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BI_WIDTH} AS b
        FROM ka CROSS JOIN dm),
    bb AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BI_WIDTH} AS b
        FROM kb CROSS JOIN dm),
    bits AS (SELECT ba.j, ba.b, 1 AS st FROM ba JOIN bb
             ON ba.j = bb.j AND ba.b = bb.b),
    pr AS (SELECT unnest(generate_series(0, {_BI_PROBES - 1})) AS k),
    pc AS (SELECT k, j,
                  (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BI_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    hit AS (SELECT k,
                   CAST(sum(coalesce(st, 0)) = {_BI_K} AS INT)
                     AS maybe_present
            FROM pc LEFT JOIN bits USING (j, b) GROUP BY k),
    tr AS (SELECT pr.k,
                  CAST(ka.key IS NOT NULL AND kb.key IS NOT NULL AS INT)
                    AS truly_present
           FROM pr LEFT JOIN ka ON pr.k = ka.key
           LEFT JOIN kb ON pr.k = kb.key)
    SELECT CAST(hit.k AS BIGINT) AS k, hit.maybe_present,
           tr.truly_present,
           CAST(hit.maybe_present >= tr.truly_present AS INT) AS never_miss
    FROM hit JOIN tr ON hit.k = tr.k
    """,
)
def q_bloom_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 Bloom set algebra (r17 operator, declared r18 —
    `operators/bloom_algebra.py`): "seen in BOTH halves of the month?"
    from two per-half sketches bitwise-ANDed, probed on a fixed id
    range spanning shared, one-sided, and absent users. The oracle
    replays both halves' bit tables and ANDs them in SQL —
    deterministic affine cells, so maybe_present, the exact
    truly_present, and the never_miss audit hash-match bit-for-bit."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_probe,
        bloom_sketch,
    )
    from food_panda_etl_spark.operators.bloom_algebra import bloom_intersect

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("k"),
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
            ).alias("day"),
        )
        .filter(F.col("k").isNotNull() & F.col("day").isNotNull())
        .localCheckpoint(eager=False)  # consumers: split, truth, max-day
    )
    mx = ev.agg(F.max("day").alias("md"))
    withmx = ev.crossJoin(F.broadcast(mx))
    first = withmx.filter(F.col("day") <= F.col("md") - _BI_SPLIT)
    second = withmx.filter(F.col("day") > F.col("md") - _BI_SPLIT)
    sk_a = bloom_sketch(first, "k", m_bits=_BI_M, k_hashes=_BI_K)
    sk_b = bloom_sketch(second, "k", m_bits=_BI_M, k_hashes=_BI_K)
    both = bloom_intersect(sk_a, sk_b)
    probes = spark.range(_BI_PROBES).select(F.col("id").alias("k"))
    mp = bloom_probe(both, probes, "k", m_bits=_BI_M, k_hashes=_BI_K)
    truth = (
        first.select("k")
        .distinct()
        .join(second.select("k").distinct(), "k", "semi")
        .withColumn("__t", F.lit(1))
    )
    return mp.join(truth, ["k"], "left").select(
        F.col("k").cast("bigint").alias("k"),
        "maybe_present",
        F.coalesce(F.col("__t"), F.lit(0)).cast("int").alias(
            "truly_present"
        ),
        (F.col("maybe_present") >= F.coalesce(F.col("__t"), F.lit(0)))
        .cast("int")
        .alias("never_miss"),
    )
