"""Approximate WEIGHTED (multiset) Jaccard near-dup pairs — the LSH
candidate path for `operators/weighted_jaccard.py`, completing the
exact/approximate symmetry the dedup family keeps everywhere else
(exact n-gram Jaccard ↔ MinHash+LSH; exact prefix join ↔ banded
verify; weighted prefix join ↔ THIS).

The sketch is consistent weighted sampling specialized to INTEGER
weights: weighted Jaccard over multisets equals plain Jaccard over the
occurrence-indexed expansion {(s, k) : 1 ≤ k ≤ count(s)} (the
`weighted_jaccard.py` reduction), so MinHashing the EXPANDED set is an
unbiased estimator of the weighted similarity — the classic reduction
(Haveliwala-Gionis-Indyk 2000; Gollapudi-Panigrahy 2006 use it as the
baseline their rounding schemes approximate, and Ioffe 2010's ICWS
generalizes it to real weights). For shingle COUNTS the weights are
small integers and the expansion grows the table by only the
repeated-shingle mass (measured ≲ 0.2% on the fixture corpus), so the
exact expansion beats ICWS's per-element sampling here: no new hash
family, no floats, and the banding math of the unweighted path applies
verbatim.

Shape: expanded elements → `dedup.minhash_from_shingles` (the SAME
seeded coefficient family as every other MinHash consumer, hashing the
(s, k) struct fields) → banded candidates → EXACT verify against the
count tables (Σmin, the `weighted_jaccard_join` verify stage) — every
emitted pair carries the exact weighted intersection and similarity,
so the only approximation is candidate recall: a true pair at weighted
similarity j is missed with probability (1−j^r)^bands (r=2, b=16
defaults: ≈ 2e-5 at j=0.7, ≈ 3e-12 at the fixtures' j≈0.9). The
declared companion gate (`q_weighted_minhash_gate`, r16) measures that
recall against the exact operator with the oracle recomputing the
exact side — the `q_minhash_gate` evidence pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from food_panda_etl_spark.operators.dedup import (
    _band_candidates,
    minhash_from_shingles,
)
from food_panda_etl_spark.operators.weighted_jaccard import (
    count_table_verify,
    occurrence_expand,
    shingle_multiset_table,
)


def weighted_minhash_lsh_pairs(
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
    """(doc_a, doc_b, wi bigint, wjaccard double) — the pairs with
    weighted n-gram Jaccard ≥ threshold_num/threshold_den found via
    banded MinHash over the occurrence expansion, each verified EXACTLY
    against the count tables (same output contract as
    `weighted_jaccard_join`; equality up to candidate recall)."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"weighted_minhash_lsh_pairs: need 0 < num <= den, "
            f"got {num}/{den}"
        )
    shc = shingle_multiset_table(df, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    sig = minhash_from_shingles(
        occurrence_expand(shc),
        num_hashes,
        seed,
        element_cols=("shingle.s", "shingle.k"),
    )
    cand = _band_candidates(sig, num_hashes, bands)
    # exact verify on candidates only — ONE shared definition with the
    # prefix path (count_table_verify), so the two routes cannot drift
    return count_table_verify(shc, cand, num, den)
