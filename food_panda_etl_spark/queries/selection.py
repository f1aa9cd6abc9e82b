"""Declared queries, round 9: stratified PPS selection and the
data-budget reports that compose already-green operators (§2.10
training-data pipeline surface).

- q_pps_stratified / q_select_stratified — the balanced-mixture
  selection step ("keep k_en PPS-weighted documents from English, k_de
  from German, …") as a single global-prefix-sum job
  (`operators/sampling_stratified.py`), standalone and composed with
  DSIR keep;
- q_domain_drift — per-language total-variation drift of the hashed
  bigram distribution vs the corpus (the DSIR feature space re-used as
  a drift monitor);
- q_token_fertility — BPE tokens per word per language from the
  oracled BPE train/encode chain (the multilingual tokenizer-equity
  report);
- q_padding_waste — padded-batch vs packed-batch token waste from the
  packing prefix sum (the "why sequence packing" report).

All five follow the registry's determinism conventions: integer
arithmetic end to end, one IEEE division of integer-derived doubles
per emitted ratio, quota/constant interpolation from shared module
constants so Spark and oracle can never desync.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from food_panda_etl_spark.queries import query
from food_panda_etl_spark.queries.text import (
    _DSIR_BUCKETS,
    _DSIR_CTES,
    _DSIR_KEEP,
    _bpe_cte_parts,
    _BPE_MERGES,
    tokens_col,
)
from food_panda_etl_spark.tables import load_table

# Quotas for the standalone stratified sample: es/zh deliberately
# UNQUOTED, exercising the drop-unlisted-strata contract in the
# oracled path (the caller's mix spec IS the selection).
_STRAT_QUOTAS = {"en": 12, "de": 7, "fr": 5}

# Quotas for the DSIR-kept composite: every language quoted; after the
# keep filter the non-English strata hold ~10-14 docs at sf0.01, so
# small quotas keep every stratum genuinely subsampled.
_SEL_QUOTAS = {"en": 8, "de": 3, "es": 2, "fr": 3, "zh": 2}

_PACK_L = 2048  # the q_pack_chunks training-sequence length


def _quota_values(quotas: dict) -> str:
    """The quota dict as a SQL VALUES list (sorted for stability)."""
    return ", ".join(f"('{s}', {int(k)})" for s, k in sorted(quotas.items()))


def _stratified_replay(quotas: dict, extra_col: str = "") -> str:
    """The per-stratum flat-sampler replay the stratified operator must
    equal (its composition-equivalence property, in SQL): a PARTITION BY
    stratum prefix sum over the shared (hash, id) order, per-stratum
    total, and the same integer tick test with the stratum's quota. The
    oracle uses the naive per-stratum window — equality with the
    one-global-prefix-sum rebase plan IS the scale-plan correctness
    proof. ``extra_col`` rides a carry column (e.g. ', dsir_score')
    through the replay. Expects an `sw` CTE with
    (doc_id, lang, wgt, h[, carry]) in scope."""
    return f"""
    q AS (SELECT * FROM (VALUES {_quota_values(quotas)}) AS t(lang, k)),
    sq AS (SELECT sw.*, q.k FROM sw JOIN q USING (lang)),
    c AS (SELECT doc_id, lang, wgt, k{extra_col},
                 sum(wgt) OVER (PARTITION BY lang ORDER BY h, doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum,
                 sum(wgt) OVER (PARTITION BY lang) AS tot
          FROM sq)
    SELECT doc_id, lang, wgt AS weight, CAST(cum AS BIGINT) AS cum_weight,
           CAST((k * cum) // tot
                - (k * (cum - wgt)) // tot AS BIGINT) AS n_ticks{extra_col}
    FROM c
    WHERE (k * cum) // tot > (k * (cum - wgt)) // tot"""


@query(
    "q_pps_stratified",
    oracle=f"""
    WITH sw AS (SELECT doc_id, lang, CAST(n_chars AS BIGINT) AS wgt,
                       ((doc_id % 1000003) * 1315423911) % 1000003 AS h
                FROM documents),
    {_stratified_replay(_STRAT_QUOTAS)}
    """,
)
def q_pps_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 stratified weighted sampling (r7 operator, declared r9) —
    per-language systematic PPS quotas (en 12, de 7, fr 5; es/zh
    unquoted → dropped) over ONE two-phase global prefix sum: strata are
    contiguous ranges under the (stratum, hash, id) total order, so the
    stratum-local cumulative is a broadcast rebase of the global one —
    never a prefix-sum job (or single-partition window) per stratum.
    Inclusion probability within stratum s is exactly min(1, k_s·w/T_s);
    pure integer arithmetic, rerun- and partitioning-invariant. The
    oracle is the naive per-stratum window replay — equality IS the
    scale-plan proof (the same composition-equivalence the operator's
    property test pins). See `operators/sampling_stratified.py`."""
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    return pps_stratified_sample(d, "lang", "n_chars", _STRAT_QUOTAS)


@query(
    "q_select_stratified",
    # Composite oracle = the shared DSIR fragment + the per-stratum
    # replay over the kept subset, chained exactly like
    # q_select_pipeline's flat tail — a wrong keep decision upstream
    # shifts every stratum grid downstream.
    oracle=f"""
    WITH {_DSIR_CTES},
    ds AS (SELECT doc_id,
                  (CAST(sum(rho) AS DOUBLE) / CAST(10000000000 AS DOUBLE))
                    / CAST(count(*) AS DOUBLE) AS dsir_score
           FROM s GROUP BY doc_id),
    sel AS (SELECT doc_id, dsir_score FROM ds
            WHERE dsir_score >= {_DSIR_KEEP}),
    sw AS (SELECT d.doc_id, d.lang, CAST(d.n_chars AS BIGINT) AS wgt,
                  ((d.doc_id % 1000003) * 1315423911) % 1000003 AS h,
                  sel.dsir_score
           FROM documents d JOIN sel ON d.doc_id = sel.doc_id),
    {_stratified_replay(_SEL_QUOTAS, extra_col=", dsir_score")}
    """,
)
def q_select_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 balanced data-selection composite (r9) — DSIR keep →
    per-language stratified PPS, the mixture-controlled variant of
    `q_select_pipeline`: score every document against the lang='en'
    target, keep the target-like subset, then draw fixed per-language
    PPS quotas from the kept rows weighted by n_chars (what a
    multilingual curriculum actually ships — target-likeness must not
    collapse the language mix). dsir_score rides the sampler as a carry
    column (no re-join), the kept seed is lazily checkpointed because
    the prefix-sum machinery references it multiple times (the
    q_select_pipeline convention). Scale cost = DSIR (hash aggs +
    ≤1024-row joins) + ONE range exchange for the global prefix sum +
    broadcast strata tables."""
    from food_panda_etl_spark.operators.dsir import dsir_weights
    from food_panda_etl_spark.operators.sampling_stratified import (
        pps_stratified_sample,
    )

    d = load_table(spark, sf_dir, "documents")
    kept = (
        dsir_weights(
            d,
            F.col("lang") == "en",
            buckets=_DSIR_BUCKETS,
            keep_threshold=_DSIR_KEEP,
        )
        .filter(F.col("keep") == 1)
        .select("doc_id", "dsir_score")
    )
    seed = (
        d.select("doc_id", "lang", "n_chars")
        .join(kept, "doc_id")
        .localCheckpoint(eager=False)
    )
    samp = pps_stratified_sample(
        seed, "lang", "n_chars", _SEL_QUOTAS, carry_cols=("dsir_score",)
    )
    return samp.select(
        "doc_id", "lang", "weight", "cum_weight", "n_ticks", "dsir_score"
    )


@query(
    "q_domain_drift",
    # The bucket arithmetic is q_fingerprint's portable polynomial —
    # the identical fragment _DSIR_CTES uses — so a drift here and a
    # weight in q_dsir_weight are measured in the SAME feature space.
    oracle=f"""
    WITH w AS (SELECT lang, string_split(text, ' ') AS toks FROM documents),
    ix AS (SELECT lang, toks,
                  unnest(generate_series(1, len(toks) - 1)) AS i
           FROM w WHERE len(toks) >= 2),
    bg AS (SELECT lang,
            ((7*31 + (length(toks[i])*131 + ascii(toks[i])))*31
              + (length(toks[i+1])*131 + ascii(toks[i+1])))
             % 1000003 % {_DSIR_BUCKETS} AS b
           FROM ix),
    cl AS (SELECT lang, b, CAST(count(*) AS BIGINT) AS clb
           FROM bg GROUP BY lang, b),
    ct AS (SELECT lang, CAST(sum(clb) AS BIGINT) AS ctl FROM cl GROUP BY lang),
    rb AS (SELECT b, CAST(sum(clb) AS BIGINT) AS rbb FROM cl GROUP BY b),
    rt AS (SELECT CAST(sum(clb) AS BIGINT) AS rtt FROM cl),
    grid AS (SELECT l.lang, rb.b, rb.rbb, CAST(coalesce(cl.clb, 0) AS BIGINT) AS clb
             FROM (SELECT DISTINCT lang FROM cl) l
             CROSS JOIN rb
             LEFT JOIN cl ON cl.lang = l.lang AND cl.b = rb.b)
    SELECT g.lang,
           CAST(ct.ctl AS BIGINT) AS n_bigrams,
           CAST(sum(abs(g.clb * rt.rtt - g.rbb * ct.ctl)) AS BIGINT) AS tv_num,
           CAST(sum(abs(g.clb * rt.rtt - g.rbb * ct.ctl)) AS DOUBLE)
             / CAST(2 * ct.ctl * rt.rtt AS DOUBLE) AS tv
    FROM grid g JOIN ct USING (lang) CROSS JOIN rt
    GROUP BY g.lang, ct.ctl, rt.rtt
    """,
)
def q_domain_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 domain-drift report (r9) — per-language TOTAL-VARIATION
    distance between the language's hashed-bigram distribution and the
    whole corpus's, in DSIR's own feature space: TV(lang) = ½·Σ_b
    |p_b − q_b| with p_b = clb/ctl, q_b = rbb/rtt, computed LOG-FREE as
    Σ|clb·rtt − rbb·ctl| / (2·ctl·rtt) — an exact integer numerator, so
    drift is bit-deterministic with ONE IEEE division per language (no
    KL, no libm). This is the release-time monitor "which language's
    text distribution moved away from the corpus mix": symmetric,
    bounded [0,1], robust to empty buckets (no smoothing term — a
    bucket the language lacks contributes rbb·ctl exactly).

    Scale shape: the fact-wide bigram stream collapses IMMEDIATELY to
    per-(lang, bucket) counts (≤ |langs|·B rows, checkpointed once for
    its four consumers) — text never shuffles; the (lang × bucket)
    comparison grid is a broadcast cross join of two tiny tables.
    Integer ceiling: clb·rtt < 2^63 needs total bigrams < ~3e9 — at
    true 100 TB switch the numerator to the divided-doubles form
    |clb/ctl − rbb/rtt| (same ordering, loses bit-exactness), the
    documented DSIR ratio convention."""
    from food_panda_etl_spark.operators.dsir import _bucket
    from food_panda_etl_spark.operators.lm import bigram_pairs

    d = load_table(spark, sf_dir, "documents")
    cl = (
        d.select("lang", F.explode(bigram_pairs("text")).alias("__bg"))
        .select(
            "lang",
            _bucket(
                F.col("__bg.w1"), F.col("__bg.w2"), _DSIR_BUCKETS
            ).alias("__b"),
        )
        .groupBy("lang", "__b")
        .agg(F.count("*").cast("bigint").alias("__clb"))
        .localCheckpoint(eager=False)
    )
    ct = cl.groupBy("lang").agg(F.sum("__clb").cast("bigint").alias("__ctl"))
    rb = cl.groupBy("__b").agg(F.sum("__clb").cast("bigint").alias("__rbb"))
    rt = cl.agg(F.sum("__clb").cast("bigint").alias("__rtt"))
    langs = cl.select("lang").distinct()
    grid = (
        langs.crossJoin(F.broadcast(rb))
        .join(cl, ["lang", "__b"], "left")
        .withColumn("__clb", F.coalesce(F.col("__clb"), F.lit(0)).cast("bigint"))
    )
    dev = F.abs(F.col("__clb") * F.col("__rtt") - F.col("__rbb") * F.col("__ctl"))
    return (
        grid.join(F.broadcast(ct), "lang")
        .crossJoin(F.broadcast(rt))
        .groupBy("lang", "__ctl", "__rtt")
        .agg(F.sum(dev).cast("bigint").alias("tv_num"))
        .select(
            "lang",
            F.col("__ctl").alias("n_bigrams"),
            "tv_num",
            (
                F.col("tv_num").cast("double")
                / (F.lit(2) * F.col("__ctl") * F.col("__rtt")).cast("double")
            ).alias("tv"),
        )
    )


@query(
    "q_token_fertility",
    # Reuses the oracled BPE train chain's final vocabulary state, so
    # fertility is hash-checked against the SAME merges q_bpe_train /
    # q_bpe_encode pin (the composed-fragment convention).
    oracle=(
        "WITH RECURSIVE "
        + ",\n    ".join(_bpe_cte_parts(_BPE_MERGES))
        + f""",
    enc AS (SELECT d.doc_id, CAST(sum(len(r.syms)) AS BIGINT) AS nb
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                  FROM documents) d
            JOIN r{_BPE_MERGES} r USING (word)
            GROUP BY d.doc_id),
    base AS (SELECT doc_id, lang,
                    CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
             FROM documents)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nw) AS BIGINT) AS n_words,
           CAST(sum(nb) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(nb) AS DOUBLE) / CAST(sum(nw) AS DOUBLE) AS fertility
    FROM base JOIN enc USING (doc_id)
    GROUP BY lang"""
    ),
)
def q_token_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 tokenizer fertility per language (r9) — BPE tokens per
    word, by language, under the q_bpe_train tokenizer: THE multilingual
    tokenizer-equity number (a language with fertility 2× pays 2× the
    compute per word and fits half the text per context window). Pure
    composition of green operators: `bpe_encode_counts` (corpus touched
    twice: histogram + ONE broadcast vocabulary join) + a doc-level
    equi-join to the language key + one hash agg. Fertility is one IEEE
    division of two exact integer sums per language. The oracle replays
    the full 6-merge train chain and computes fertility from the final
    vocabulary state, so tokenizer AND report are hash-checked
    together."""
    from food_panda_etl_spark.operators.bpe import bpe_encode_counts

    d = load_table(spark, sf_dir, "documents")
    enc = bpe_encode_counts(d, "text", n_merges=_BPE_MERGES).select(
        "doc_id", F.col("n_bpe_tokens").alias("__nb")
    )
    base = d.select(
        "doc_id", "lang", F.size(tokens_col()).cast("long").alias("__nw")
    )
    return (
        base.join(enc, "doc_id")
        .groupBy("lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("__nw").cast("bigint").alias("n_words"),
            F.sum("__nb").cast("bigint").alias("n_bpe_tokens"),
            (
                F.sum("__nb").cast("double") / F.sum("__nw").cast("double")
            ).alias("fertility"),
        )
    )


@query(
    "q_padding_waste",
    # Interpolated from _PACK_L (the CHUNK_WINDOW convention); the
    # oracle's prefix sum is the naive global window the two-phase plan
    # must equal.
    oracle=f"""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS BIGINT) AS nw
               FROM documents),
    c AS (SELECT doc_id, nw,
                 sum(nw) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
          FROM t),
    a AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(nw) AS BIGINT) AS total_tokens,
                 CAST(sum((nw + {_PACK_L - 1}) // {_PACK_L}) AS BIGINT)
                   AS pad_sequences,
                 CAST(sum(CASE WHEN (cum - 1) // {_PACK_L}
                                    > (cum - nw) // {_PACK_L}
                               THEN 1 ELSE 0 END) AS BIGINT) AS split_docs
          FROM c)
    SELECT n_docs, total_tokens, pad_sequences,
           CAST(pad_sequences * {_PACK_L} - total_tokens AS BIGINT)
             AS pad_waste,
           CAST((total_tokens + {_PACK_L - 1}) // {_PACK_L} AS BIGINT)
             AS packed_chunks,
           CAST(((total_tokens + {_PACK_L - 1}) // {_PACK_L}) * {_PACK_L}
                - total_tokens AS BIGINT) AS packed_waste,
           split_docs,
           CAST(pad_sequences * {_PACK_L} - total_tokens AS DOUBLE)
             / CAST(pad_sequences * {_PACK_L} AS DOUBLE) AS pad_waste_pct,
           CAST(((total_tokens + {_PACK_L - 1}) // {_PACK_L}) * {_PACK_L}
                - total_tokens AS DOUBLE)
             / CAST(((total_tokens + {_PACK_L - 1}) // {_PACK_L})
                    * {_PACK_L} AS DOUBLE) AS packed_waste_pct
    FROM a
    """,
)
def q_padding_waste(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 padding-waste estimator (r9) — the one-row report that
    justifies sequence packing: pad tokens burned by the naive
    one-doc-per-sequence batch layout (each document padded up to the
    next multiple of L=2048; Σ ceil(nw/L)·L − Σnw) vs the packed layout
    q_pack_chunks ships (concatenate and cut every L tokens; only the
    final chunk pads), plus the packing's own cost signal — split_docs,
    documents whose token span crosses a chunk boundary (they need
    cross-chunk attention masking). Everything is integer ceil-division
    on the SAME two-phase global prefix sum as q_pack_chunks (one range
    exchange at any scale), then two IEEE divisions of integer-derived
    doubles for the waste percentages."""
    from food_panda_etl_spark.operators.order import global_running_sum

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.size(tokens_col()).cast("long").alias("__nw")
    )
    cum = global_running_sum(toks, ["doc_id"], "__nw", "__cum")
    a = cum.agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("__nw").cast("bigint").alias("total_tokens"),
        F.sum(F.expr(f"(__nw + {_PACK_L - 1}) div {_PACK_L}"))
        .cast("bigint")
        .alias("pad_sequences"),
        F.sum(
            F.expr(
                f"CAST((__cum - 1) div {_PACK_L}"
                f" > (__cum - __nw) div {_PACK_L} AS INT)"
            )
        )
        .cast("bigint")
        .alias("split_docs"),
    )
    padded = F.col("pad_sequences") * _PACK_L
    chunks = F.expr(f"(total_tokens + {_PACK_L - 1}) div {_PACK_L}")
    return a.select(
        "n_docs",
        "total_tokens",
        "pad_sequences",
        (padded - F.col("total_tokens")).cast("bigint").alias("pad_waste"),
        chunks.cast("bigint").alias("packed_chunks"),
        (chunks * _PACK_L - F.col("total_tokens"))
        .cast("bigint")
        .alias("packed_waste"),
        "split_docs",
        (
            (padded - F.col("total_tokens")).cast("double")
            / padded.cast("double")
        ).alias("pad_waste_pct"),
        (
            (chunks * _PACK_L - F.col("total_tokens")).cast("double")
            / (chunks * _PACK_L).cast("double")
        ).alias("packed_waste_pct"),
    )
