"""ICWS — Ioffe's Consistent Weighted Sampling (Ioffe, ICDM 2010) —
the REAL-weight MinHash the occurrence expansion cannot provide:
`operators/weighted_minhash.py` handles INTEGER multiplicities by
expanding (s, c) to c set elements; TF-normalized weights c/n (or any
positive reals) have no such expansion, and ICWS samples an (element,
level) pair per hash such that
P[sample_A(i) == sample_B(i)] = J_w(A, B) — exact under Ioffe's
formal assumption of fully independent uniforms; THIS implementation
derives each Gamma draw's two uniforms from disjoint bit ranges of
ONE xxhash64 value (`_units` — bits 0–30 and 33–63), a per-hash
approximation to that independence (ADVICE r17), whose practical
effect is bounded empirically by the 4σ estimator property test
(`tests/test_icws.py`) and by the declared recall gate. The collision
probability tracks the real-weight Jaccard closely enough that the
banding analysis of every other LSH path here applies verbatim.

Construction (Ioffe 2010, §4, the standard ICWS sampler) per element
s with weight w > 0 and hash index i, from deterministic per-(s, i)
uniforms (the seeded affine/xxhash discipline — both sides of any
join draw the SAME stream, so cross-side signatures are comparable by
construction):

    r ~ Gamma(2,1)   = −ln(u1·u2)
    c ~ Gamma(2,1)   = −ln(u3·u4)
    β ~ Uniform(0,1) = u5
    t   = ⌊ln(w)/r + β⌋
    ln a = ln(c) − r·(t + 1 − β)

and the hash-i sample is the (s, t) of the minimal ln a; the
signature component stored is xxhash64(s, t) (64-bit, band-foldable —
only the identity of the winning (element, level) matters, exactly as
MinHash stores a hash, not the element). The min is taken over a
STRUCT (ln a, sig) so ties — probability-zero but partition-order
visible — break deterministically at any parallelism.

All of this is engine-internal floating point: ln/exp never cross to
an oracle (the q_minhash_gate rule — sketches are gate-evidenced, the
EXACT side oracles). The declared companion gate
(`q_icws_gate`, slated r17) measures candidate recall against
`operators/tf_jaccard.py`'s exact join with the oracle recomputing
the exact pair set — the `q_weighted_minhash_gate` evidence pattern.

Scale: the per-row work is 32 independent (ln, mul, floor, hash)
chains — one map-only projection, whole-stage codegen, no UDF; the
signature agg is one hash aggregate (map-side combinable min per
component); candidates are the shared `dedup.band_rows` /
`_band_candidates` equi-join; the verify is candidate-bounded and
shared with the exact path (`tf_count_table_verify` — ONE definition,
no drift).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import _band_candidates
from food_panda_etl_spark.operators.tf_jaccard import (
    tf_count_table_verify,
    tf_weights,
)
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_table,
)

#: 2^31 — the uniform grid; (31 hash bits + 0.5) / 2^31 ∈ (0, 1)
#: keeps every ln() argument strictly positive.
_GRID = 1 << 31


def _units(element, i, j, seed: int):
    """TWO deterministic Uniform(0,1) draws per (element, hash i,
    slot j) — one xxhash64 split into its low and high 31-bit halves
    (each uniform on the grid; the middle bits separate them). Halving
    the hash count matters here: the ICWS projection is the per-row
    hot loop (5 uniforms × num_hashes per element). ``i``/``j`` may be
    Python ints or int Columns — ``i * 4 + j`` stays IntegerType either
    way, so the xxhash64 input types (and therefore every draw) are
    bit-identical across the two call shapes."""
    h = F.xxhash64(element, i * 4 + j, F.lit(seed))
    lo = F.pmod(h, F.lit(_GRID)).cast("double")
    hi = F.pmod(F.shiftrightunsigned(h, 33), F.lit(_GRID)).cast("double")
    g = F.lit(float(_GRID))
    # the two halves of one hash are not formally independent draws
    # (module docstring / ADVICE r17) — the estimator property test
    # bounds the practical effect at 4σ
    return (lo + 0.5) / g, (hi + 0.5) / g


def icws_signatures(
    wt: DataFrame,
    num_hashes: int = 32,
    seed: int = 42,
    id_col: str = "doc",
    element_col: str = "shingle",
    weight_col: str = "w",
) -> DataFrame:
    """Per-doc ICWS signature (columns m0..m{k-1}) from a
    (doc, element, w double) table with w > 0 — the weighted
    counterpart of `dedup.minhash_from_shingles`, band-compatible with
    `dedup.band_rows` by construction (64-bit components named mI).
    Rows with NULL or non-positive weight are skipped (ln is undefined
    there; a zero-weight element is not in the weighted set).

    Shape (r19 optimization, two steps of evidence): the pre-r19 form
    unrolled k struct columns — its ~k×40-node expression tree made
    Catalyst analysis/codegen the dominant cost of every consumer
    (~3.5 s of driver-side gap per build at sf0.1). A
    transform(sequence(0, k−1), …) lambda fixed the tree size but runs
    on Spark's INTERPRETED expression paths (HOFs are CodegenFallback),
    whose shared virtual-dispatch sites go megamorphic in a long
    driver session: after a 132-query bench pass the identical lambda
    ran 2–3× slower than in a fresh JVM (13.7 s in-suite vs 5.5 s
    isolated for the incremental screen). The final form EXPLODES the
    hash index instead — sequence(0, k−1) → explode → ONE small
    codegen'd chain with ``__i`` as a column → 32 conditional
    min-aggregates (partial-aggregation collapses each doc's rows
    before the exchange, so shuffle bytes are unchanged). Whole-stage
    codegen JITs this monomorphically: aged-JVM A/B 5.1 s → 2.3 s over
    the lambda form, small planning tree, and the expressions are
    bit-identical to both prior forms (``i`` enters only as the
    IntegerType hash salt ``i*4+j``; equality property-tested against
    the unrolled reference in tests/test_icws.py)."""
    el = F.col(element_col)
    lnw = F.log(F.col(weight_col).cast("double"))
    i = F.col("__i")
    u1, u2 = _units(el, i, F.lit(1), seed)
    u3, u4 = _units(el, i, F.lit(2), seed)
    u5, _ = _units(el, i, F.lit(3), seed)
    # Gamma(2,1) as −ln(u·v): ONE ln of the product instead of two
    # (u, v ∈ (2^−32, 1] so the product cannot underflow; the hot
    # loop drops from 5 to 3 ln per (element, hash))
    r = -F.log(u1 * u2)
    cg = -F.log(u3 * u4)
    beta = u5
    t = F.floor(lnw / r + beta)
    lna = F.log(cg) - r * (t.cast("double") + 1.0 - beta)
    sig = F.xxhash64(el, t)
    hashed = (
        wt.filter(F.col(weight_col).isNotNull() & (F.col(weight_col) > 0))
        .select(
            F.col(id_col).alias("doc"),
            el.alias(element_col),
            F.col(weight_col).alias(weight_col),
            F.explode(
                F.sequence(F.lit(0), F.lit(num_hashes - 1))
            ).alias("__i"),
        )
        .select(
            "doc", F.struct(lna.alias("a"), sig.alias("s")).alias("__h"), "__i"
        )
    )
    # TWO-LEVEL aggregation, deliberately: a single groupBy("doc") with
    # k min-over-struct aggregates generates one enormous update method
    # that C2 takes seconds to compile — in a driver JVM already
    # saturated by a multi-query session's compile queue (measured:
    # 290 s of cumulative JIT time over one 133-key bench pass), the
    # first execution ran at interpreter speed for ~10 s. Level 1 is
    # ONE tiny min-over-struct per (doc, i) — partial aggregation
    # collapses to (docs × k) rows before its exchange. Level 2 (r20)
    # folds the k winners into ONE deterministic map — collect_list of
    # (i, s) sorted by i, map_from_entries — and projects m0..m{k-1}
    # out of it: the r19 form's k conditional primitive mins were k
    # agg buffers × k WHEN branches per input row (k² predicate
    # evaluations) and ~5·k py4j/analysis ops to construct; the map
    # agg is one buffer, one O(k log k) sort per doc, and measured
    # 0.95 → 0.57 s at sf0.01 with ~0.14 s less driver-side build
    # time. Values are identical (level-1 winners are unique per
    # (doc, i), so the sorted map is exactly the k winners; pinned by
    # tests/test_icws.py and the driver oracle). Every doc with ≥1
    # positive-weight element carries ALL k indices (the explode
    # generates each i unconditionally), so no m{k} lookup can miss.
    winners = (
        hashed.groupBy("doc", "__i")
        .agg(F.min("__h").getField("s").alias("__s"))
    )
    m = winners.groupBy("doc").agg(
        F.map_from_entries(
            F.sort_array(
                F.collect_list(F.struct(F.col("__i"), F.col("__s")))
            )
        ).alias("__m")
    )
    return m.select(
        "doc", *[F.col("__m")[k].alias(f"m{k}") for k in range(num_hashes)]
    )


def icws_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 7,
    threshold_den: int = 10,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """(doc_a, doc_b, wi_scaled bigint, tf_jaccard double) — the pairs
    with TF-normalized weighted n-gram Jaccard ≥ num/den found via
    banded ICWS signatures, each verified EXACTLY against the count
    tables (same output contract as `tf_jaccard_join`; equality up to
    candidate recall — a true pair at similarity j is missed with
    probability (1−j^r)^bands, the shared banding bound)."""
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"icws_lsh_pairs: need bands >= 1 dividing num_hashes, got "
            f"bands={bands}, num_hashes={num_hashes}"
        )
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"icws_lsh_pairs: need 0 < num <= den, got {num}/{den}"
        )
    shc = shingle_multiset_table(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )  # consumers: weights, verify
    wt = tf_weights(shc)
    # checkpoint the signature: the band self-join reads it on BOTH
    # sides, and without the pin the ln/hash-heavy ICWS projection —
    # the pipeline's hot loop — runs twice (the minhash_lsh_pairs
    # discipline; measured 52 s → 13 s at the 80k curve point)
    sig = icws_signatures(wt, num_hashes, seed).localCheckpoint(
        eager=False
    )
    cand = _band_candidates(sig, num_hashes, bands)
    return tf_count_table_verify(shc, cand, num, den)
