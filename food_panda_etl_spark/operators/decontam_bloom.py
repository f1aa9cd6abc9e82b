"""Bloom-screened benchmark decontamination — the 100 TB composition
of `operators/bloom.py` and `operators/dedup.py::ngram_contamination`.

`ngram_contamination` joins every train shingle against a BROADCAST of
the distinct eval shingle set. That is the right plan while the eval
corpus is small, but the broadcast is the eval SHINGLE STRINGS — a
large benchmark suite is millions of ~50-byte shingles, hundreds of MB
shipped to every executor. This composite replaces the first pass with
a fixed-size Bloom sketch of the eval shingle hashes (m_bits/8 bytes,
folded into ONE broadcast map row by `bloom_prefilter` — the train
side stays MAP-ONLY: zero fact shuffles, zero fact aggregations), and
only the surviving shingles — contaminated mass plus the sketch's
false positives — meet the exact eval set in a small shuffle join that
no longer needs a broadcast at all.

Correctness is the Bloom's one-sided contract: a contaminated shingle
appears in BOTH corpora, hashes identically on both sides, and
therefore ALWAYS survives the screen (no false negatives — regardless
of xxhash64 collisions, which only add false positives); the exact
verify join then removes every false positive. So the output is
bit-identical to the unscreened exact computation — the declared
query's oracle is the plain exact SQL, and the driver hash-match IS
the screen-completeness theorem (the q_jaccard_prefix_join /
q_overlap_join evidence pattern). The shingle→int64 key is xxhash64 —
engine-internal only (it never crosses to the oracle, which replays
nothing), chosen over the portable polynomial for dispersion.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.bloom import bloom_prefilter, bloom_sketch
from food_panda_etl_spark.operators.dedup import shingle_table

_MIN_M_BITS = 1 << 16


def derived_m_bits(n_shingles: int, k_hashes: int) -> int:
    """The sizing rule as code: m ≈ 1.44·k·n/ln2 bits for n distinct
    shingles (the `operators/bloom.py` optimum — ≈ 8.3·n at k=4),
    rounded UP to k·2^⌈log2(want/k)⌉ — a power-of-two PER-ROW width,
    so the result is always the multiple of k_hashes that bloom's
    geometry validation requires (a pure power of two is rejected for
    legal k = 3, 5, 6, 7 — review-caught r16) — floored at 2^16-ish
    (a sketch can never be cheaper than ~8 KiB of broadcast, and tiny
    evals keep the old fixture default) and CAPPED at the affine hash
    grid (per-row width ≤ 2^19 < P = 1000003, the bloom family's own
    ceiling): past ~250k eval shingles per hash row the screen
    saturates and degrades gracefully toward the unscreened cost —
    never toward a wrong answer (the one-sided contract is
    size-independent)."""
    want = max(
        1.44 * k_hashes * max(n_shingles, 1) / math.log(2), _MIN_M_BITS
    )
    per_row = 1 << math.ceil(math.log2(want / k_hashes))
    return k_hashes * min(per_row, 1 << 19)


def bloom_screened_contamination(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    m_bits: int | None = None,
    k_hashes: int = 4,
) -> DataFrame:
    """(``id_col``, n_shared bigint) for every training document
    sharing at least one word n-gram with ANY eval document —
    bit-identical to `ngram_contamination`, executed as Bloom
    pre-screen → exact verify on survivors only.

    ``m_bits`` MUST TRACK THE EVAL SHINGLE COUNT, so the default
    (``None``) now DERIVES it: the eval shingle table — which the
    operator builds anyway — is materialized once, its distinct count
    feeds `derived_m_bits` (m ≈ 1.44·k·n/ln2 rounded to a power of
    two; ONE bounded-scalar count, never fact-sized — the eval side
    is the benchmark suite, not the corpus). An explicit ``m_bits``
    skips the count and keeps the plan action-free. An overloaded
    sketch never breaks correctness (the one-sided contract holds at
    ANY size — tested under a forced-FP m=64 sketch) but silently
    degrades toward the unscreened cost: bench_scale.py measured a
    fixed 2^16 at millions of eval shingles with ~67% of bits set and
    ~20% of CLEAN shingles flooding the verify join (a 1.32 scaling
    exponent), vs near-linear once sized to the eval set — which the
    derived default now does without manual sizing."""
    tr = shingle_table(train, id_col, text_col, n=n)
    ev = (
        shingle_table(evals, id_col, text_col, n=n)
        .select("shingle")
        .distinct()
    )
    if m_bits is None:
        # materialize the eval shingles once (they feed the sketch AND
        # the verify join), count them, size the sketch to them
        ev = ev.localCheckpoint(eager=True)
        m_bits = derived_m_bits(ev.count(), k_hashes)
    sk = bloom_sketch(
        ev.select(F.xxhash64("shingle").alias("k")),
        "k",
        m_bits=m_bits,
        k_hashes=k_hashes,
    )
    screened = bloom_prefilter(
        sk,
        tr.withColumn("__k", F.xxhash64("shingle")),
        "__k",
        m_bits=m_bits,
        k_hashes=k_hashes,
        out_col="maybe_present",
    )
    survivors = screened.filter(F.col("maybe_present") == 1).select(
        "doc", "shingle"
    )
    # exact verify: survivors are the contaminated mass + the sketch's
    # false positives — small, so a plain shuffle join suffices (no
    # broadcast of the full eval shingle strings anywhere)
    return (
        survivors.join(ev, "shingle")
        .groupBy("doc")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .select(F.col("doc").alias(id_col), "n_shared")
    )
