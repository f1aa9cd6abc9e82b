"""Incremental REAL-WEIGHT (TF-normalized) near-duplicate screen —
the ICWS maintained-state face, completing the incremental-refresh
family's symmetry for real weights (exact hash:
`q_incremental_dedup`; distinct-set n-gram: `incremental_neardup.py`;
embedding cosine: `incremental_embed.py`; directional containment:
`incremental_containment.py`; TF-weighted Jaccard: THIS). A refresh
batch is checked against a standing corpus for the mixture/shape
question `operators/tf_jaccard.py` answers in batch — "is this NEW
document a TF-weighted near-dup of some corpus document?" — WITHOUT
re-running the self-join family over corpus ∪ batch.

Shape: the corpus's counted shingle table and its ICWS band index are
MAINTAINED STATE (`build_icws_state`, computed once per corpus
version; at scale the counts persist bucketed by doc, the band index
by (band, bh) — the probe then pays zero corpus-side exchanges). Per
refresh, only the batch's counts / TF weights / ICWS signatures are
computed (batch-sized — the ln/hash-heavy projection runs over batch
rows only), the candidate stage is ONE cross-side equi-join of batch
band rows against the corpus band index, and the exact verify first
prunes the corpus count table to candidate docs with a broadcast
semi-join (map-only over the standing corpus), then runs the shared
`tf_count_table_verify` in cross-side mode — ONE definition of the
threshold algebra with the batch/prefix paths, no drift.

Both sides hash with the SAME seeded ICWS draw stream
(`icws.icws_signatures` — deterministic per-(element, hash) uniforms),
so cross-side signatures are comparable by construction, exactly the
`incremental_neardup` cross-side discipline.

Exactness: every emitted pair carries the TRUE integer-exact
TF-weighted Jaccard (`tf_jaccard.py`'s wi/(2·n_a·n_b − wi) algebra);
candidate recall is the shared banding bound — a true pair at
similarity j is missed with probability ≈ (1 − j^r)^bands under the
ICWS collision model (`operators/icws.py` — per-hash bit-split
uniforms, the documented approximation), so the output equals the
brute-force cross-side count-join up to that probability
(machine-checked on the fixtures: the declared query's oracle IS the
brute-force cross-side SQL, the q_incremental_neardup evidence
pattern).

Geometry safety (the ADVICE-r16/r17 family pattern): state stamped by
:func:`build_icws_state` carries (n, num_hashes, bands, seed, builder
version) as column metadata — it survives select/join/checkpoint and
a parquet round-trip — and a probe at a different geometry raises
loudly instead of silently comparing incomparable signatures
(near-zero recall, no error) or counting intersections across gram
sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import band_rows
from food_panda_etl_spark.operators.icws import icws_signatures
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_state_pair,
)
from food_panda_etl_spark.operators.tf_jaccard import (
    tf_count_table_verify,
    tf_weights,
)
from food_panda_etl_spark.operators.weighted_jaccard import (
    shingle_multiset_table,
)

_GEO_KEYS = ("n", "num_hashes", "bands", "seed", "shingler")
# bump when shingle_multiset_table's gram semantics change — state
# built by an older builder must fail the probe's geometry check
_SHINGLER = "weighted_jaccard.shingle_multiset_table/v1"


def build_icws_state(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(counts, band_index) for a corpus version — the maintained
    state: ``counts`` is the (doc, shingle, c) table the verify stage
    resolves corpus docs in, ``band_index`` the (doc, band, bh) rows
    the candidate stage probes. At scale the counts persist bucketed
    by doc and the index by (band, bh); here they are lazy frames the
    caller may checkpoint. The geometry rides BOTH frames as column
    metadata (see module docstring)."""
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"build_icws_state: need bands >= 1 dividing num_hashes, got "
            f"bands={bands}, num_hashes={num_hashes}"
        )
    geo = {
        "n": int(n),
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "seed": int(seed),
        "shingler": _SHINGLER,
    }
    shc = shingle_multiset_table(corpus, id_col, text_col, n).withMetadata(
        "shingle", geo
    )
    index = band_rows(
        icws_signatures(tf_weights(shc), num_hashes, seed),
        num_hashes,
        bands,
    ).withMetadata("bh", geo)
    return shc, index


def incremental_icws_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold_num: int = 7,
    threshold_den: int = 10,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    corpus_counts: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, dup_of, wi_scaled bigint, tf_jaccard double) — the
    (batch doc, corpus doc) pairs with TF-normalized weighted n-gram
    Jaccard ≥ threshold_num/threshold_den: candidates from the
    cross-side ICWS band probe, EXACT integer-grid verify on
    candidates only (`tf_count_table_verify` cross-side mode).
    ``doc_id`` is the batch side, ``dup_of`` the corpus side; batch
    and corpus ids may overlap (each side resolves only in its own
    count table).

    ``corpus_counts``/``corpus_bands`` are the maintained state from
    :func:`build_icws_state` (same n/num_hashes/bands/seed); when
    supplied the standing corpus is NOT rescanned — the refresh cost
    is batch-sized shingling/hashing + the band probe against the
    index + a candidate-bounded verify. State stamped by
    :func:`build_icws_state` is geometry-validated and a mismatched
    or mixed-build probe raises (module docstring)."""
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"incremental_icws_pairs: need bands >= 1 dividing "
            f"num_hashes, got bands={bands}, num_hashes={num_hashes}"
        )
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"incremental_icws_pairs: need 0 < num <= den, got {num}/{den}"
        )
    if (corpus_counts is None) != (corpus_bands is None):
        raise ValueError(
            "incremental_icws_pairs: supply BOTH corpus_counts and "
            "corpus_bands (the build_icws_state pair) or neither"
        )
    if corpus_counts is not None:
        geo = check_state_pair(
            "incremental_icws_pairs",
            "build_icws_state",
            _GEO_KEYS,
            ("corpus_counts", corpus_counts, "shingle"),
            ("corpus_bands", corpus_bands, "bh"),
        )
        check_probe_geometry(
            "incremental_icws_pairs",
            {
                "n": int(n),
                "num_hashes": int(num_hashes),
                "bands": int(bands),
                "seed": int(seed),
                "shingler": _SHINGLER,
            },
            geo,
            "signatures/intersections would be incomparable "
            "(rebuild the state or match the parameters)",
        )
    if corpus_counts is None:
        if corpus is None:
            raise ValueError(
                "incremental_icws_pairs: need a corpus DataFrame when "
                "no prebuilt state is supplied"
            )
        # checkpoint the counts: two consumers (band-index derivation
        # via the ln/hash-heavy ICWS projection, and the verify prune)
        corpus_counts = shingle_multiset_table(
            corpus, id_col, text_col, n
        ).localCheckpoint(eager=False)
        corpus_bands = band_rows(
            icws_signatures(tf_weights(corpus_counts), num_hashes, seed),
            num_hashes,
            bands,
        )
    b_shc = shingle_multiset_table(batch, id_col, text_col, n).localCheckpoint(
        eager=False
    )  # consumers: weights→signatures, verify
    b_bands = band_rows(
        icws_signatures(tf_weights(b_shc), num_hashes, seed),
        num_hashes,
        bands,
    )
    bb, cb = b_bands.alias("bb"), corpus_bands.alias("cb")
    cand = (
        bb.join(
            cb,
            (F.col("bb.band") == F.col("cb.band"))
            & (F.col("bb.bh") == F.col("cb.bh")),
        )
        .select(
            F.col("bb.doc").alias("doc_a"), F.col("cb.doc").alias("doc_b")
        )
        .distinct()
        .localCheckpoint(eager=False)  # two consumers: prune + verify
    )
    # prune the standing count table to candidate corpus docs FIRST
    # (broadcast semi-join on 8-byte ids, bounded by batch size × band
    # collisions) — the verify shuffle carries candidate-doc counts only
    cand_docs = cand.select(F.col("doc_b").alias("doc")).distinct()
    c_shc = corpus_counts.join(F.broadcast(cand_docs), "doc", "semi")
    verified = tf_count_table_verify(b_shc, cand, num, den, shc_b=c_shc)
    return verified.select(
        F.col("doc_a").alias("doc_id"),
        F.col("doc_b").alias("dup_of"),
        "wi_scaled",
        "tf_jaccard",
    )
