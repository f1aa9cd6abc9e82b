"""Incremental DSIR — the maintained-state refresh face of the
CLASSIFIER/score family (`operators/dsir.py`), the one summary family
the incremental matrix did not yet mirror (frequency = CMS + MG heavy
hitters, cardinality = HLL, membership = Bloom, sampling = bottom-k,
rank = histogram quantiles, near-dup = the four screens — VERDICT r18
task 7's named optional candidate). The question: "keep the
hashed-bigram importance model CURRENT as batches arrive, without
re-featurizing the corpus" — the production CDC shape is a maintained
(bucket → raw count, target count) table refreshed per batch, with
every incoming document scored against it in one broadcast join.

State = ONE (``__b``, ``__rb``, ``__tb``) frame, ≤ buckets rows:
per-bucket raw and target bigram counts over `dsir.py`'s portable
polynomial feature space (the q_fingerprint fold — no engine hash
functions, bit-identical in Spark and DuckDB). Counts are LINEAR, so
the combine is a union-sum per bucket and
refresh(state(corpus), batch) is IDENTICAL to state(corpus ∪ batch)
under any refresh chain — no truncation bookkeeping, no repair pass;
the declared query's hash-match against the full-corpus DuckDB replay
(the shared ``_DSIR_CTES`` fragment, `queries/text.py`) IS the
linearity identity, through the scoring arithmetic: identical integer
counts give identical ρ grid values give identical decimal sums.

Deliberately THIN by the one-definition rule: the featurizer is
`lm.bigram_pairs` + `dsir._bucket` (the exact pair `dsir_weights`
uses — a second tokenizer/hash definition here could drift), and the
scoring replays `dsir_weights`' ρ-grid arithmetic against the state's
counts (same 1e-10 integer grid, same decimal(10,0)×decimal(19,0)
product, same loud empty-target guard).

Geometry stamp (`operators/state_geometry.py` contract): (buckets,
featurizer version) as column metadata on ``__rb`` — state built at
1024 buckets probed at 2048 folds every feature into the wrong cell
and yields plausible-but-wrong scores, never an error, unless
stamped; the stamp survives parquet, and hand-built state with
matching geometry stays the caller's contract, as everywhere.

Probe semantics off the identity path: a document may carry a bucket
the state has never seen (``__rb`` NULL after the left join). Its ρ
is 0 — an unseen feature is maximally non-target-like, the
conservative reading, and the bucket still counts in the n_bigrams
denominator (same treatment as a bucket with no TARGET mass, which
`dsir_weights` already scores as ρ=0).

Scale: a refresh touches the BATCH once (bigram explode + one
bucket hash agg, map-side combined) and union-sums ≤ 2·buckets state
rows — never the corpus. Scoring probes the ≤ buckets-row state
broadcast (AQE — 1024 rows always fits); totals ride in-plan as a
broadcast 1-row aggregate over the STATE (the `dsir.py` convention,
zero collects).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dsir import DSIR_BUCKETS, _bucket
from food_panda_etl_spark.operators.lm import bigram_pairs
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    state_geometry,
)

DSIR_STATE_GEO_KEYS = ("buckets", "featurizer")
# bump when the bucket fold / tokenizer change — state from an older
# builder must fail the refresh's geometry check
_FEATURIZER = "dsir_incremental.hashed-bigram/v1"


def _geo(buckets: int) -> dict:
    return {"buckets": int(buckets), "featurizer": _FEATURIZER}


def _bucket_stream(
    df: DataFrame, target: Column, text_col: str, buckets: int
) -> DataFrame:
    """(__tgt, __b) — one row per bigram occurrence, the shared
    featurizer (`lm.bigram_pairs` + `dsir._bucket`). Documents with
    fewer than 2 tokens contribute nothing (empty bigram array),
    matching the oracle's generate_series emptiness."""
    return df.select(
        target.cast("int").alias("__tgt"),
        F.explode(bigram_pairs(text_col)).alias("__bg"),
    ).select(
        "__tgt",
        _bucket(F.col("__bg.w1"), F.col("__bg.w2"), buckets).alias("__b"),
    )


def build_dsir_state(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The (≤ buckets)-row (``__b``, ``__rb``, ``__tb``) count state
    for one corpus version: per-bucket raw bigram count and
    target-subset bigram count, geometry-stamped. ``target`` is the
    membership predicate of the distribution being matched (the
    `dsir_weights` argument); its semantics ride with the CALLER
    across refreshes — the stamp pins the feature space, not the
    predicate."""
    if int(buckets) < 1:
        raise ValueError(
            f"build_dsir_state: buckets must be >= 1, got {buckets!r}"
        )
    counts = (
        _bucket_stream(df, target, text_col, buckets)
        .groupBy("__b")
        .agg(
            F.count("*").cast("bigint").alias("__rb"),
            F.sum("__tgt").cast("bigint").alias("__tb"),
        )
    )
    return counts.withMetadata("__rb", _geo(buckets))


def incremental_dsir_refresh(
    state: DataFrame,
    batch: DataFrame,
    target: Column,
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
) -> DataFrame:
    """The refreshed (≤ buckets)-row state — the linear combine: the
    batch is featurized by the SAME builder and counts union-sum per
    bucket. The output IS the next round's state (the stamp rides it
    forward) and is IDENTICAL to ``build_dsir_state`` over
    corpus ∪ batch. State stamped by :func:`build_dsir_state` (or a
    prior refresh) is geometry-validated; hand-built state with
    matching geometry is the caller's contract, as everywhere."""
    check_probe_geometry(
        "incremental_dsir_refresh",
        _geo(buckets),
        state_geometry(state, "__rb", DSIR_STATE_GEO_KEYS),
        "batch counts would sum into a different feature space — every "
        "downstream score silently wrong, never an error (rebuild the "
        "state or match buckets)",
    )
    b = build_dsir_state(batch, target, text_col, buckets)
    merged = (
        state.select("__b", "__rb", "__tb")
        .unionByName(b.select("__b", "__rb", "__tb"))
        .groupBy("__b")
        .agg(
            F.sum("__rb").cast("bigint").alias("__rb"),
            F.sum("__tb").cast("bigint").alias("__tb"),
        )
    )
    return merged.withMetadata("__rb", _geo(buckets))


def dsir_score_against_state(
    df: DataFrame,
    state: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    keep_threshold: float | None = None,
) -> DataFrame:
    """Per-document importance weight of ``df`` against a MAINTAINED
    count state — `dsir_weights`' scoring arithmetic (ρ quantized on
    the 1e-10 integer grid; exact decimal cnt·ρ products; one IEEE
    division per ρ) with (rb, tb, RT, TT) read from the state instead
    of recomputed from the corpus. Returns (id_col, n_bigrams bigint,
    dsir_score double[, keep int]) — the `dsir_weights` schema, so
    the two faces are drop-in interchangeable. When ``df`` is exactly
    the state's corpus the result is bit-identical to
    ``dsir_weights`` (the declared identity); for genuinely NEW
    documents, buckets absent from the state score ρ=0 (module
    docstring). The empty-target guard is the `dsir.py` one: TT = 0
    raises in-plan, inside the consumed column."""
    check_probe_geometry(
        "dsir_score_against_state",
        _geo(buckets),
        state_geometry(state, "__rb", DSIR_STATE_GEO_KEYS),
        "probe buckets would look up the wrong cells — every score "
        "silently wrong, never an error (rebuild the state or match "
        "buckets)",
    )
    dbg = (
        df.select(
            F.col(id_col), F.explode(bigram_pairs(text_col)).alias("__bg")
        )
        .select(
            id_col,
            _bucket(F.col("__bg.w1"), F.col("__bg.w2"), buckets).alias(
                "__b"
            ),
        )
        .groupBy(id_col, "__b")
        .agg(F.count("*").alias("__cnt"))
    )
    totals = state.agg(
        F.sum("__rb").cast("bigint").alias("__rt"),
        F.sum("__tb").cast("bigint").alias("__tt"),
    ).select(
        "__rt",
        # the dsir.py ADVICE r6 guard, verbatim semantics: a state with
        # zero target mass makes every ratio undefined — raise in-plan
        # inside the consumed column so pruning cannot elide it
        F.when(F.col("__tt") > 0, F.col("__tt"))
        .otherwise(
            F.raise_error(
                F.lit(
                    "dsir_score_against_state: state holds no target "
                    "bigrams — importance ratios are undefined"
                )
            )
        )
        .alias("__tt"),
    )
    rho = F.when(F.col("__rb").isNull(), F.lit(0).cast("bigint")).otherwise(
        F.round(
            (
                (F.coalesce(F.col("__tb"), F.lit(0)) * F.col("__rt")).cast(
                    "double"
                )
                / (F.col("__rb") * F.col("__tt")).cast("double")
            )
            * 10000000000.0
        ).cast("bigint")
    )
    scored = (
        dbg.join(state.select("__b", "__rb", "__tb"), ["__b"], "left")
        .crossJoin(F.broadcast(totals))
        .groupBy(id_col)
        .agg(
            F.sum("__cnt").cast("bigint").alias("n_bigrams"),
            # exact decimal product per dsir.py (its overflow ceilings
            # and the rare-target grid headroom argument apply verbatim)
            (
                (
                    F.sum(
                        F.col("__cnt").cast("decimal(10,0)")
                        * rho.cast("decimal(19,0)")
                    ).cast("double")
                    / F.lit(10000000000.0)
                )
                / F.sum("__cnt").cast("double")
            ).alias("dsir_score"),
        )
    )
    if keep_threshold is not None:
        scored = scored.withColumn(
            "keep",
            (F.col("dsir_score") >= F.lit(float(keep_threshold))).cast(
                "int"
            ),
        )
    return scored
