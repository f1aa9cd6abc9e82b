"""Incremental set-CONTAINMENT screen — the directional member of the
incremental-refresh family, completing its symmetry with the batch
operators (exact hash: `q_incremental_dedup`; n-gram near-dup:
`operators/incremental_neardup.py`; embedding cosine:
`operators/incremental_embed.py`; directional quote/subsumption:
THIS). A refresh batch is checked against a standing corpus for the
asymmetric question `operators/containment_join.py` answers in batch:
"is this NEW document mostly contained in some corpus document" —
the ingestion-time quote/boilerplate/plagiarism gate — WITHOUT
re-running the self-join family over corpus ∪ batch.

Shape: the corpus's shingle index and its document-frequency table are
MAINTAINED STATE (`build_containment_state`, computed once per corpus
version; at scale both persist bucketed — the index by shingle, the df
table broadcast-sized only when the vocabulary is, which is why it is
a TABLE, not a map). Per refresh, only the batch's shingles are
computed; each batch doc's prefix is ranked by CORPUS df (ASC,
shingle ASC) — rarity must be measured against the index being
probed, and shingles ABSENT from the corpus rank FIRST (df 0): they
carry empty posting lists, so a genuinely novel document generates
ZERO candidates and costs nothing beyond its own shingling — the
refresh-regime property the screen exists for.

Completeness (the Chaudhuri-Ganti-Kaushik prefix lemma, cross-side):
|A ∩ B| ≥ ⌈t·n_a⌉ means A misses at most k = n_a − ⌈t·n_a⌉ of its own
shingles in B, so among ANY k+1 of A's shingles at least one is in B —
the lemma holds for any subset of that size, the order only sets the
cost. A prefix shingle absent from the whole corpus is absent from
every B; if ALL k+1 prefix shingles were corpus-absent, A would miss
k+1 > k in any corpus B — contradiction — so every qualifying pair
surfaces through the posting-list join on a corpus-PRESENT prefix
shingle. The verify stage counts true intersections for candidates
only (corpus index pruned first by a broadcast semi-join on candidate
ids — map-only over the standing corpus, the incremental_neardup
discipline), the threshold is integer (inter·den ≥ num·n_a), and the
reported containment is one IEEE division — so the declared query's
oracle is the brute-force cross-side inverted-index SQL and the
driver hash-match IS the cross-side containment completeness theorem.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window

from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.operators.state_geometry import (
    check_probe_geometry,
    check_state_pair,
)

_GEO_KEYS = ("n", "shingler")
# bump when shingle_table's gram semantics change — state built by an
# older builder must fail the probe's geometry check, not silently
# intersect incompatible gram tables
_SHINGLER = "dedup.shingle_table/v1"


def build_containment_state(
    corpus: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
) -> tuple[DataFrame, DataFrame]:
    """(shingle_index, df_table) for a corpus version — the maintained
    state: ``shingle_index`` is the (doc, shingle) inverted index the
    probe and verify stages join, ``df_table`` the (shingle, __df)
    corpus document frequencies the batch prefixes rank by. At scale
    both persist bucketed by shingle; here they are lazy frames the
    caller may checkpoint.

    The shingling geometry (n, builder version) rides BOTH frames as
    column metadata on ``shingle`` (it survives select/join/checkpoint
    AND a parquet round-trip — the `build_embed_state` pattern, ADVICE
    r17): a probe at a different n would count intersections across
    different gram sizes and silently yield wrong containment values,
    so :func:`incremental_containment_pairs` validates the stamp and
    raises loudly on mismatch."""
    geo = {"n": int(n), "shingler": _SHINGLER}
    sh = shingle_table(corpus, id_col, text_col, n).withMetadata(
        "shingle", geo
    )
    df_tbl = (
        sh.groupBy("shingle")
        .agg(F.count("*").alias("__df"))
        .withMetadata("shingle", geo)
    )
    return sh, df_tbl


def containment_probe_candidates(
    corpus_shingles: DataFrame,
    corpus_df: DataFrame,
    batch_shingles: DataFrame,
    threshold_num: int,
    threshold_den: int,
) -> DataFrame:
    """(doc_id, contained_in, n_a) distinct candidate pairs from the
    batch-prefix × corpus-index probe — the pruning stage, public so
    its VOLUME is testable (the `prefix_candidates` convention; the
    refresh-regime claim "novel batch docs generate ZERO candidates"
    is asserted HERE, not on the verified output, which would stay
    empty even if the pruning silently regressed — review r16).
    Batch prefixes rank by CORPUS df with corpus-absent shingles
    first (df 0, empty posting lists)."""
    num, den = int(threshold_num), int(threshold_den)
    sizes = batch_shingles.groupBy("doc").agg(F.count("*").alias("n_a"))
    ranked = (
        batch_shingles.join(corpus_df, "shingle", "left")
        .withColumn("__df", F.coalesce(F.col("__df"), F.lit(0)))
        .withColumn(
            "__pos",
            F.row_number().over(
                Window.partitionBy("doc").orderBy("__df", "shingle")
            ),
        )
        .join(sizes, "doc")
    )
    # A-prefix length n_a − ⌈t·n_a⌉ + 1 on the integer grid (`div` —
    # exact integer division, identical in Spark and DuckDB)
    ceil_tn = F.expr(f"({num} * n_a + {den - 1}) div {den}")
    pa = ranked.filter(F.col("__pos") <= F.col("n_a") - ceil_tn + 1).select(
        F.col("doc").alias("doc_id"), "shingle", "n_a"
    )
    idx = corpus_shingles.select(F.col("doc").alias("contained_in"), "shingle")
    return (
        pa.join(idx, "shingle")
        .select("doc_id", "contained_in", "n_a")
        .distinct()
    )


def incremental_containment_pairs(
    corpus: DataFrame,
    batch: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold_num: int = 4,
    threshold_den: int = 5,
    corpus_shingles: DataFrame | None = None,
    corpus_df: DataFrame | None = None,
) -> DataFrame:
    """(doc_id, contained_in, inter bigint, containment double) —
    EXACTLY the (batch doc A, corpus doc B) pairs with
    |A ∩ B| ≥ (threshold_num/threshold_den)·|A|, equal row-for-row to
    the brute-force cross-side inverted-index join (the completeness
    property test / declared-query oracle). ``doc_id`` is the batch
    (contained) side. Batch docs shorter than n tokens have empty
    shingle sets: containment is undefined and no row is emitted (the
    containment_join contract).

    ``corpus_shingles``/``corpus_df`` are the maintained state from
    :func:`build_containment_state` (same n); when supplied the
    standing corpus is NOT rescanned — the refresh cost is batch-sized
    shingling + the prefix probe against the index + a
    candidate-bounded verify.

    Geometry safety (ADVICE r17, the `incremental_embed` pattern):
    state stamped by :func:`build_containment_state` carries (n,
    builder version) as column metadata and a probe at a different n
    raises — intersections counted across different gram sizes are
    silently wrong, never loudly. Hand-built state (no stamp) is
    accepted with matching n as the CALLER's contract."""
    num, den = int(threshold_num), int(threshold_den)
    if not (0 < num <= den):
        raise ValueError(
            f"incremental_containment_pairs: need 0 < num <= den, "
            f"got {num}/{den}"
        )
    if (corpus_shingles is None) != (corpus_df is None):
        # a df table built under a different n than the supplied index
        # would silently misrank prefixes — partial state fails loudly
        raise ValueError(
            "incremental_containment_pairs: supply BOTH corpus_shingles "
            "and corpus_df (the build_containment_state pair) or neither"
        )
    if corpus_shingles is not None:
        geo = check_state_pair(
            "incremental_containment_pairs",
            "build_containment_state",
            _GEO_KEYS,
            ("corpus_shingles", corpus_shingles, "shingle"),
            ("corpus_df", corpus_df, "shingle"),
        )
        check_probe_geometry(
            "incremental_containment_pairs",
            {"n": int(n), "shingler": _SHINGLER},
            geo,
            "intersections would be counted across different gram "
            "sizes (rebuild the state or match n)",
        )
    if corpus_shingles is None:
        if corpus is None:
            raise ValueError(
                "incremental_containment_pairs: need a corpus DataFrame "
                "when no prebuilt state is supplied"
            )
        # checkpoint the index: it has three consumers (df derivation,
        # posting-list probe, verify) and without the pin the standing
        # corpus would be shingled three times
        corpus_shingles = shingle_table(
            corpus, id_col, text_col, n
        ).localCheckpoint(eager=False)
        corpus_df = corpus_shingles.groupBy("shingle").agg(
            F.count("*").alias("__df")
        )
    b_sh = shingle_table(batch, id_col, text_col, n).localCheckpoint(
        eager=False
    )  # consumers: ranking, verify
    cand = containment_probe_candidates(
        corpus_shingles, corpus_df, b_sh, num, den
    ).localCheckpoint(eager=False)  # two consumers: prune + verify
    # prune the standing index to candidate corpus docs FIRST (broadcast
    # semi-join on 8-byte ids, bounded by batch size × posting hits) —
    # the verify shuffle then carries candidate-doc shingles only
    cand_docs = cand.select(F.col("contained_in").alias("doc")).distinct()
    c_sh = corpus_shingles.join(F.broadcast(cand_docs), "doc", "semi")
    sa, sb = b_sh.alias("sa"), c_sh.alias("sb")
    inter = (
        cand.join(sa, cand["doc_id"] == F.col("sa.doc"))
        .join(
            sb,
            (cand["contained_in"] == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_id", "contained_in", "n_a")
        .agg(F.count("*").cast("bigint").alias("inter"))
    )
    return (
        inter.filter(F.col("inter") * den >= num * F.col("n_a"))
        .select(
            "doc_id",
            "contained_in",
            "inter",
            (
                F.col("inter").cast("double") / F.col("n_a").cast("double")
            ).alias("containment"),
        )
    )
