"""Incremental NEAR-duplicate detection — the LSH sibling of the
exact-hash refresh path (`queries/aggregates.py::q_incremental_dedup`,
SCALE.md's CDC note: "dedup only against added"). A daily/hourly batch
must be checked against a standing 100 TB corpus for near-duplicates
WITHOUT re-deduping the corpus: re-running any self-join family over
corpus ∪ batch rescans the corpus per refresh, i.e. O(corpus) work for
O(batch) new data.

Shape: MinHash band index as MAINTAINED STATE. The corpus's shingle
table, signatures, and band rows are computed once per corpus version
(`build_neardup_state`) and reused across refreshes — per batch, only
the batch's shingles/signatures/bands are computed (batch-sized), the
band probe is an equi-join of batch band rows against the corpus band
index on (band, bh) (at scale: bucket the corpus index by (band, bh)
and the probe pays zero corpus-side exchanges), and the exact verify
first prunes the corpus shingle table to candidate docs with a
broadcast semi-join (map-only over the standing corpus — no
corpus-wide exchange per refresh), then joins candidates against the
pruned, candidate-bounded remainder — the `verified_jaccard_pairs_lsh`
discipline. Both sides hash with the
SAME seeded coefficient family (`dedup.minhash_from_shingles`), so
cross-side signatures are comparable by construction.

Exactness: every emitted pair carries the TRUE n-gram Jaccard
(verify on real shingle sets); candidate recall is the banding bound —
a true pair at similarity j is missed with probability (1−j^r)^bands,
r = num_hashes/bands (defaults r=2, b=16: ≈ 8e-8 at j=0.8) — so the
output equals the brute-force cross-side join up to that probability
(machine-checked on the fixtures: the declared query's oracle IS the
brute-force cross-side SQL, the q_dedup_components_lsh evidence
pattern).

Reference: the MinHash/LSH construction is Broder 1997 / the banding
analysis of Leskovec-Rajaraman-Ullman (Mining of Massive Datasets
ch. 3); the incremental probe-an-index shape is standard streaming
LSH practice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import (
    band_rows,
    minhash_from_shingles,
    shingle_table,
)
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_state_pair,
)

_GEO_KEYS = ("n", "num_hashes", "bands", "seed", "shingler")
# bump when shingle_table's gram semantics or the minhash coefficient
# family change — state built by an older builder must fail the
# probe's geometry check, not silently band-join incomparable hashes
_SHINGLER = "dedup.shingle_table+minhash_from_shingles/v1"


def build_neardup_state(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, DataFrame]:
    """(shingles, band_index) for a corpus version — the maintained
    state: ``shingles`` is the (doc, shingle) table the verify stage
    probes, ``band_index`` the (doc, band, bh) rows the candidate
    stage probes. At scale both persist partitioned/bucketed (shingles
    by doc, band_index by (band, bh)); here they are lazy frames the
    caller may checkpoint.

    The geometry (n, num_hashes, bands, seed, builder version) rides
    BOTH frames as column metadata (`operators/state_geometry.py` —
    it survives select/join/checkpoint AND a parquet round-trip): a
    probe at a different geometry would band-join incomparable hashes
    (near-zero recall) or verify across different gram sizes (wrong
    Jaccard values), silently — so
    :func:`incremental_neardup_pairs` validates the stamp and raises
    loudly on mismatch (ADVICE r17 / VERDICT r17 task 3, the last
    incremental face to join the pattern)."""
    geo = {
        "n": int(n),
        "num_hashes": int(num_hashes),
        "bands": int(bands),
        "seed": int(seed),
        "shingler": _SHINGLER,
    }
    sh = shingle_table(corpus, id_col, text_col, n).withMetadata(
        "shingle", geo
    )
    return sh, band_rows(
        minhash_from_shingles(sh, num_hashes, seed), num_hashes, bands
    ).withMetadata("bh", geo)


def incremental_neardup_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
    corpus_shingles: DataFrame | None = None,
    corpus_bands: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, dup_of, jaccard double) — EXACTLY the (batch doc,
    corpus doc) pairs with n-gram Jaccard ≥ threshold: candidates from
    the cross-side band probe, TRUE Jaccard verified on candidates
    only. ``doc_id`` is the batch side, ``dup_of`` the corpus side.

    ``corpus_shingles``/``corpus_bands`` are the maintained state from
    :func:`build_neardup_state` (same n/num_hashes/bands/seed); when
    supplied the standing corpus is NOT rescanned — the refresh cost
    is batch-sized plus the candidate-bounded verify. Omitted, the
    state is built here with one pass over the corpus.

    Geometry safety (the incremental-family contract,
    `operators/state_geometry.py`): state stamped by
    :func:`build_neardup_state` carries (n, num_hashes, bands, seed,
    builder version) as column metadata and a probe at a different
    geometry raises — cross-side band joins of incomparable hash
    families are silently near-zero-recall, never an error.
    Hand-built state (no stamp) is accepted with matching geometry as
    the CALLER's contract."""
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    if (corpus_shingles is None) != (corpus_bands is None):
        # a bands frame built under different n/seed than the supplied
        # shingles would be undetectable — partial state fails loudly
        raise ValueError(
            "incremental_neardup_pairs: supply BOTH corpus_shingles and "
            "corpus_bands (the build_neardup_state pair) or neither"
        )
    if corpus_shingles is not None:
        geo = check_state_pair(
            "incremental_neardup_pairs",
            "build_neardup_state",
            _GEO_KEYS,
            ("corpus_shingles", corpus_shingles, "shingle"),
            ("corpus_bands", corpus_bands, "bh"),
        )
        check_probe_geometry(
            "incremental_neardup_pairs",
            {
                "n": int(n),
                "num_hashes": int(num_hashes),
                "bands": int(bands),
                "seed": int(seed),
                "shingler": _SHINGLER,
            },
            geo,
            "cross-side band values / gram sizes would be "
            "incomparable (rebuild the state or match the parameters)",
        )
    if corpus_shingles is None:
        if corpus is None:
            raise ValueError(
                "incremental_neardup_pairs: need a corpus DataFrame when "
                "no prebuilt state is supplied"
            )
        # checkpoint the shingle table: it has two consumers here (the
        # band-index derivation and the semi-join prune below) and
        # without the pin the standing corpus would be shingled twice
        corpus_shingles = shingle_table(
            corpus, id_col, text_col, n
        ).localCheckpoint(eager=False)
        corpus_bands = band_rows(
            minhash_from_shingles(corpus_shingles, num_hashes, seed),
            num_hashes,
            bands,
        )
    # lazy localCheckpoint, not cache(): the exact_jaccard_pairs
    # convention — released by the ContextCleaner, no manual unpersist
    b_sh = shingle_table(batch, id_col, text_col, n).localCheckpoint(
        eager=False
    )
    b_bands = band_rows(
        minhash_from_shingles(b_sh, num_hashes, seed), num_hashes, bands
    )
    bb, cb = b_bands.alias("bb"), corpus_bands.alias("cb")
    cand = (
        bb.join(
            cb,
            (F.col("bb.band") == F.col("cb.band"))
            & (F.col("bb.bh") == F.col("cb.bh")),
        )
        .select(
            F.col("bb.doc").alias("doc_id"), F.col("cb.doc").alias("dup_of")
        )
        .distinct()
        .localCheckpoint(eager=False)  # two consumers: prune + verify
    )
    # Prune the corpus shingle table down to candidate docs FIRST, with
    # a broadcast semi-join on the candidate dup_of list (8-byte ids,
    # bounded by batch size × band collisions — batch-scale by the
    # operator's own regime): the standing corpus' shingle table is
    # then scanned map-only, and the verify shuffle below carries only
    # candidate-doc shingles — no corpus-wide exchange per refresh.
    cand_docs = cand.select(F.col("dup_of").alias("doc")).distinct()
    c_sh = corpus_shingles.join(
        F.broadcast(cand_docs), "doc", "semi"
    ).localCheckpoint(eager=False)  # two consumers: verify + sizes
    # exact verify, candidate-bounded: true intersection per candidate
    # pair via two shingle joins, then |A∩B| / (|A|+|B|−|A∩B|)
    b_sizes = b_sh.groupBy("doc").agg(F.count("*").alias("__nb"))
    c_sizes = c_sh.groupBy("doc").agg(F.count("*").alias("__nc"))
    sa, sb = b_sh.alias("sa"), c_sh.alias("sb")
    inter = (
        cand.join(sa, cand["doc_id"] == F.col("sa.doc"))
        .join(
            sb,
            (cand["dup_of"] == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_id", "dup_of")
        .agg(F.count("*").alias("__inter"))
    )
    jac = F.col("__inter").cast("double") / (
        F.col("__nb") + F.col("__nc") - F.col("__inter")
    ).cast("double")
    return (
        inter.join(b_sizes.withColumnRenamed("doc", "doc_id"), "doc_id")
        .join(c_sizes.withColumnRenamed("doc", "dup_of"), "dup_of")
        .select("doc_id", "dup_of", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )
