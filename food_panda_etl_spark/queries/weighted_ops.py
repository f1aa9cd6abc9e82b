"""Declared TF-weighted-set-family / grouped-membership queries (r17)
— the four r16 build-ahead components' first driver evidence: the
incremental set-CONTAINMENT screen (`operators/incremental_containment
.py` — a refresh batch's directional quote/subsumption question
answered against a standing corpus' MAINTAINED shingle index), the
exact TF-normalized weighted Jaccard join (`operators/tf_jaccard.py` —
the real-weight regime no occurrence expansion can express, mass-form
weighted prefix filtering), the ICWS real-weight MinHash recall gate
(`operators/icws.py` — Ioffe ICDM 2010 consistent weighted sampling,
gate evidence for the banded approximate face of the same family), and
the group-wise Bloom membership probe (`operators/bloom_group.py` —
per-group verdicts with the per-group bit replay). A NEW module (the
`queries/scale_ops.py` / `queries/incremental_ops.py` convention) so
every previously-green queries file stays byte-identical to its
recorded evidence.

The query bodies and oracle strings moved VERBATIM from
`tests/test_r17_oracle_previews.py`, where they were pre-verified end
to end through the driver's own compare harness at sf0.001 and sf0.01
(and once manually at sf0.1, SCALE.md r16). Pinned constants (measured
at all three SFs before pinning, r16):

- incremental containment n=5, τ=4/5 over the corpus/batch split
  (doc_id%10, +1e6 injection of corpus%7 docs — the
  q_incremental_neardup shape): the operator is EXACT (prefix
  completeness, no LSH miss), so the oracle is the brute-force
  cross-side inverted-index SQL and the hash-match IS the cross-side
  containment completeness theorem; corpus-absent batch shingles rank
  first (df 0 → empty posting lists), so novel batch docs cost zero
  candidates;
- TF-normalized weighted Jaccard n=3, τ=7/10: the real-weight regime
  (w_s = c_s/n — no occurrence expansion can express 1/n), exact via
  the integer cross-multiplied form wi = Σ min(c_a·n_b, c_b·n_a) with
  J_tf = wi/(2·n_a·n_b − wi); the oracle is the brute-force count-join
  so the hash-match IS the WEIGHTED prefix-filter completeness theorem
  (mass-form keep rule, `operators/tf_jaccard.py`);
- ICWS gate n=3, τ=7/10, r=2 b=16: measured recall 1.0 at the
  verified SFs (the fixture pairs sit at J_tf ≈ 0.8–0.98 where the
  banding miss is ≤ 1e-5); floor pinned at 0.90, the
  q_weighted_minhash_gate convention (oracle recomputes the EXACT
  real-weight pair set: count + integer pair checksum + pinned
  meets_target=1);
- group-wise Bloom m=2^16, k=4 over (l_returnflag, l_partkey), probes
  = flags × [0, 2000): per-group membership with the per-group bit
  replay — deterministic affine cells, so maybe_present, the exact
  truly_present, and the never_miss audit all hash-match bit-for-bit
  (the q_bloom_filter convention with the group threaded through
  every stage, `operators/bloom_group.py`).

The module ALSO declares the trailing-window Bloom membership query
q_bloom_window (VERDICT r16 task 3 — the "seen in the last N days?"
question the q_cms_windowed/q_hll_windowed convention asks for the
frequency and cardinality families, here asked for MEMBERSHIP):
per-day sketches OR-merged across the trailing window via
`bloom_merge_groups` (bit union == key-set union, and the affine
cells are deterministic, so the merged bit table is bit-identical to
a direct build over the window's distinct keys — which is exactly
what the oracle replays), probed on a fixed id range spanning present
AND absent users. m=2^16, k=4, probes [0, 3000), window 7 days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import oracle_bloom_dm_sql
from food_panda_etl_spark.operators.cms import _P
from food_panda_etl_spark.operators.overlap_join import SHINGLE5_CTE_SQL
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_cte_sql,
)
from food_panda_etl_spark.queries import query
from food_panda_etl_spark.tables import load_table

_IC_NUM, _IC_DEN = 4, 5

_TF_NUM, _TF_DEN = 7, 10
_ICWS_TARGET = 0.90

_BG_M, _BG_K, _BG_PROBES = 1 << 16, 4, 2000
_BG_WIDTH = _BG_M // _BG_K

_BW_M, _BW_K, _BW_PROBES, _BW_WIN = 1 << 16, 4, 3000, 7
_BW_WIDTH = _BW_M // _BW_K
_DAY_US = 86_400_000_000


@query(
    "q_incremental_containment",
    oracle=f"""
    WITH {SHINGLE5_CTE_SQL},
    bsh AS (SELECT doc, shingle FROM sh WHERE doc % 10 = 0
            UNION ALL
            SELECT doc + 1000000 AS doc, shingle FROM sh
            WHERE doc % 10 <> 0 AND doc % 7 = 0),
    csh AS (SELECT doc, shingle FROM sh WHERE doc % 10 <> 0),
    bsz AS (SELECT doc, CAST(count(*) AS BIGINT) AS n_a FROM bsh
            GROUP BY doc),
    inter AS (SELECT b.doc AS bdoc, c.doc AS cdoc,
                     CAST(count(*) AS BIGINT) AS inter
              FROM bsh b JOIN csh c ON b.shingle = c.shingle
              GROUP BY 1, 2)
    SELECT bdoc AS doc_id, cdoc AS contained_in, inter,
           CAST(inter AS DOUBLE) / CAST(bs.n_a AS DOUBLE) AS containment
    FROM inter JOIN bsz bs ON bdoc = bs.doc
    WHERE inter * {_IC_DEN} >= {_IC_NUM} * bs.n_a
    """,
)
def q_incremental_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 incremental set-containment screen (r16 operator,
    declared r17): a refresh batch checked against a standing corpus'
    MAINTAINED shingle index + df table for the directional
    quote/subsumption question (`operators/incremental_containment.py`)
    — batch prefixes ranked by CORPUS df, posting-list probe, exact
    candidates-only verify. Corpus = doc_id%10 <> 0; batch =
    doc_id%10 = 0 plus corpus%7 docs re-id'd at +1e6 (injected
    containment-1 rows, non-vacuous at every SF). The oracle is the
    brute-force cross-side inverted-index SQL on the shared shingle
    replay: hash-matching it IS the cross-side containment
    completeness theorem."""
    from food_panda_etl_spark.operators.incremental_containment import (
        incremental_containment_pairs,
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
    return incremental_containment_pairs(
        corpus, batch, "doc_id", "text", n=5,
        threshold_num=_IC_NUM, threshold_den=_IC_DEN,
    )


@query(
    "q_tf_jaccard",
    oracle=f"""
    WITH {shingle_multiset_cte_sql(3)},
    tot AS (SELECT doc, CAST(sum(c) AS BIGINT) AS nw FROM shm GROUP BY doc),
    wi AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
                  CAST(sum(least(a.c * tb.nw, b.c * ta.nw)) AS BIGINT) AS wi
           FROM shm a
           JOIN shm b ON a.shingle = b.shingle AND a.doc < b.doc
           JOIN tot ta ON a.doc = ta.doc
           JOIN tot tb ON b.doc = tb.doc
           GROUP BY 1, 2)
    SELECT doc_a, doc_b, wi AS wi_scaled,
           CAST(wi AS DOUBLE)
             / CAST(2 * ta.nw * tb.nw - wi AS DOUBLE) AS tf_jaccard
    FROM wi
    JOIN tot ta ON doc_a = ta.doc
    JOIN tot tb ON doc_b = tb.doc
    WHERE wi * {_TF_DEN + _TF_NUM} >= 2 * {_TF_NUM} * ta.nw * tb.nw
    """,
)
def q_tf_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 exact TF-normalized weighted Jaccard join (r16 operator,
    declared r17): the real-weight regime on the integer grid
    (`operators/tf_jaccard.py`) — wi = Σ min(c_a·n_b, c_b·n_a) over
    the shared support, J_tf = wi/(2·n_a·n_b − wi), threshold compare
    pure integer. The oracle is the brute-force count-join:
    hash-matching it IS the weighted (mass-form) prefix-filter
    completeness theorem."""
    from food_panda_etl_spark.operators.tf_jaccard import tf_jaccard_join

    d = load_table(spark, sf_dir, "documents")
    return tf_jaccard_join(
        d, "doc_id", "text", n=3,
        threshold_num=_TF_NUM, threshold_den=_TF_DEN,
    )


@query(
    "q_icws_gate",
    oracle=f"""
    WITH {shingle_multiset_cte_sql(3)},
    tot AS (SELECT doc, CAST(sum(c) AS BIGINT) AS nw FROM shm GROUP BY doc),
    wi AS (SELECT a.doc AS doc_a, b.doc AS doc_b,
                  CAST(sum(least(a.c * tb.nw, b.c * ta.nw)) AS BIGINT) AS wi
           FROM shm a
           JOIN shm b ON a.shingle = b.shingle AND a.doc < b.doc
           JOIN tot ta ON a.doc = ta.doc
           JOIN tot tb ON b.doc = tb.doc
           GROUP BY 1, 2),
    exact AS (SELECT doc_a, doc_b FROM wi
              JOIN tot ta ON doc_a = ta.doc
              JOIN tot tb ON doc_b = tb.doc
              WHERE wi * {_TF_DEN + _TF_NUM}
                    >= 2 * {_TF_NUM} * ta.nw * tb.nw)
    SELECT CAST(count(*) AS BIGINT) AS n_exact,
           CAST(SUM(doc_a * doc_b) AS BIGINT) AS sum_ab,
           1 AS meets_target
    FROM exact
    """,
)
def q_icws_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 quality gate for the ICWS real-weight MinHash path (r16
    operator, declared r17; `operators/icws.py`, Ioffe ICDM 2010):
    recall of the exact TF-weighted Jaccard pair set (τ=7/10,
    `tf_jaccard_join`) through the ICWS banded candidates + exact
    verify. The oracle recomputes the EXACT side (count + integer pair
    checksum) and pins meets_target=1 — driver-grade evidence that
    (a) the exact real-weight side is right and (b) the sketch path's
    measured recall clears the 0.90 floor (measured 1.0 at the
    verified SFs)."""
    from food_panda_etl_spark.operators.icws import icws_lsh_pairs
    from food_panda_etl_spark.operators.tf_jaccard import tf_jaccard_join
    from food_panda_etl_spark.queries.approx_gates import _pair_recall_gate

    d = load_table(spark, sf_dir, "documents")
    exact = tf_jaccard_join(
        d, "doc_id", "text", n=3,
        threshold_num=_TF_NUM, threshold_den=_TF_DEN,
    )
    approx = icws_lsh_pairs(
        d, "doc_id", "text", n=3,
        threshold_num=_TF_NUM, threshold_den=_TF_DEN,
    )
    return _pair_recall_gate(exact, approx, target=_ICWS_TARGET)


def q_bloom_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 trailing-window Bloom membership (declared r17, VERDICT
    r16 task 3): "seen in the last 7 days?" answered from per-day
    Bloom state (`bloom_sketch(..., group_cols=('day',))`) OR-merged
    across the window by `bloom_merge_groups` (the re-bucketing
    combine — day-filter → bit union, ≤ m rows, NO rescan of the
    fact), then probed on a fixed id range spanning present AND
    absent users (`bloom_probe`). The q_cms_windowed/q_hll_windowed
    convention applied to the membership family. Bit union equals a
    direct build over the window's distinct keys (deterministic
    affine cells), so the oracle replays exactly that and the whole
    verdict table hash-matches — maybe_present, the exact
    truly_present, and the no-false-negatives audit."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_merge_groups,
        bloom_probe,
        bloom_sketch,
    )

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").alias("k"),
            F.expr(
                f"unix_micros(cast(ts as timestamp)) div {_DAY_US}"
            ).alias("day"),
        )
        .filter(F.col("k").isNotNull() & F.col("day").isNotNull())
    )
    by_day = bloom_sketch(
        ev, "k", m_bits=_BW_M, k_hashes=_BW_K, group_cols=("day",)
    ).localCheckpoint(eager=False)
    mx = by_day.agg(F.max("day").alias("md"))
    recent = bloom_merge_groups(
        by_day.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _BW_WIN)
        .drop("md")
    )
    probes = spark.range(_BW_PROBES).select(F.col("id").alias("k"))
    mp = bloom_probe(recent, probes, "k", m_bits=_BW_M, k_hashes=_BW_K)
    truth = (
        ev.crossJoin(F.broadcast(mx))
        .filter(F.col("day") > F.col("md") - _BW_WIN)
        .select("k")
        .distinct()
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


_BW_ORACLE = f"""
    WITH dm AS {oracle_bloom_dm_sql(_BW_K)},
    ev AS (SELECT user_id AS k, epoch_us(ts) // {_DAY_US} AS day
           FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
    mx AS (SELECT max(day) AS md FROM ev),
    keys AS (SELECT DISTINCT k AS key FROM ev CROSS JOIN mx
             WHERE day > md - {_BW_WIN}),
    bits AS MATERIALIZED (
        SELECT DISTINCT j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BW_WIDTH} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    pr AS (SELECT unnest(generate_series(0, {_BW_PROBES - 1})) AS k),
    pc AS (SELECT k, j,
                  (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BW_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    hit AS (SELECT k,
                   CAST(sum(coalesce(st, 0)) = {_BW_K} AS INT)
                     AS maybe_present
            FROM pc LEFT JOIN bits USING (j, b) GROUP BY k),
    tr AS (SELECT pr.k,
                  CAST(keys.key IS NOT NULL AS INT) AS truly_present
           FROM pr LEFT JOIN keys ON pr.k = keys.key)
    SELECT CAST(hit.k AS BIGINT) AS k, hit.maybe_present,
           tr.truly_present,
           CAST(hit.maybe_present >= tr.truly_present AS INT) AS never_miss
    FROM hit JOIN tr ON hit.k = tr.k
    """
query("q_bloom_window", oracle=_BW_ORACLE)(q_bloom_window)


@query(
    "q_bloom_by_group",
    oracle=f"""
    WITH dm AS {oracle_bloom_dm_sql(_BG_K)},
    keys AS (SELECT DISTINCT l_returnflag AS g, l_partkey AS key
             FROM lineitem WHERE l_partkey IS NOT NULL),
    bits AS MATERIALIZED (
        SELECT DISTINCT g, j,
               (((key % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BG_WIDTH} AS b,
               1 AS st
        FROM keys CROSS JOIN dm),
    gs AS (SELECT DISTINCT l_returnflag AS g FROM lineitem),
    pr AS (SELECT g, unnest(generate_series(0, {_BG_PROBES - 1})) AS k
           FROM gs),
    pc AS (SELECT g, k, j,
                  (((k % {_P}) + {_P}) % {_P} * a + c) % {_P} % {_BG_WIDTH} AS b
           FROM pr CROSS JOIN dm),
    hit AS (SELECT g, k,
                   CAST(sum(coalesce(st, 0)) = {_BG_K} AS INT)
                     AS maybe_present
            FROM pc LEFT JOIN bits USING (g, j, b) GROUP BY g, k),
    tr AS (SELECT pr.g, pr.k,
                  CAST(keys.key IS NOT NULL AS INT) AS truly_present
           FROM pr LEFT JOIN keys
             ON pr.g = keys.g AND pr.k = keys.key)
    SELECT hit.g AS l_returnflag, CAST(hit.k AS BIGINT) AS k,
           hit.maybe_present, tr.truly_present,
           CAST(hit.maybe_present >= tr.truly_present AS INT) AS never_miss
    FROM hit JOIN tr ON hit.g = tr.g AND hit.k = tr.k
    """,
)
def q_bloom_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 group-wise Bloom membership (r16 operator, declared r17;
    `operators/bloom_group.py`): per-return-flag part-key membership
    probed on a fixed id range spanning present AND absent keys per
    group — no false negatives ever (the never_miss audit), per-group
    isolation, and the false positives are THE SAME false positives in
    both engines (deterministic affine cells), so the whole per-group
    verdict table hash-matches, not just a gate."""
    from food_panda_etl_spark.operators.bloom import bloom_sketch
    from food_panda_etl_spark.operators.bloom_group import (
        bloom_probe_by_group,
    )

    li = load_table(spark, sf_dir, "lineitem")
    sk = bloom_sketch(
        li, "l_partkey", m_bits=_BG_M, k_hashes=_BG_K,
        group_cols=("l_returnflag",),
    )
    probes = (
        li.select("l_returnflag").distinct()
        .crossJoin(
            spark.range(_BG_PROBES).select(F.col("id").alias("k"))
        )
    )
    mp = bloom_probe_by_group(
        sk, probes, "k", ("l_returnflag",), m_bits=_BG_M, k_hashes=_BG_K
    )
    truth = (
        li.filter(F.col("l_partkey").isNotNull())
        .select("l_returnflag", F.col("l_partkey").alias("k"))
        .distinct()
        .withColumn("__t", F.lit(1))
    )
    return mp.join(truth, ["l_returnflag", "k"], "left").select(
        "l_returnflag",
        F.col("k").cast("bigint").alias("k"),
        "maybe_present",
        F.coalesce(F.col("__t"), F.lit(0)).cast("int").alias(
            "truly_present"
        ),
        (F.col("maybe_present") >= F.coalesce(F.col("__t"), F.lit(0)))
        .cast("int")
        .alias("never_miss"),
    )
