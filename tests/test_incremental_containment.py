"""Incremental containment screen
(operators/incremental_containment.py, r16 build-ahead for r17):
cross-side prefix probe + exact verify must equal the brute-force
cross-side inverted-index join (this operator is EXACT — no LSH miss),
the maintained-state path must equal the from-raw path, novel batch
docs must generate zero candidates, and injected copies must surface
at containment 1."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import shingle_table
from food_panda_etl_spark.operators.incremental_containment import (
    build_containment_state,
    incremental_containment_pairs,
)
from food_panda_etl_spark.tables import load_table

_NUM, _DEN = 4, 5


def _split(spark, sf_dir):
    """corpus = doc_id % 10 <> 0; batch = doc_id % 10 = 0 plus every
    corpus doc with doc_id % 7 = 0 re-id'd at +1e6 (guaranteed
    containment-1 rows — the incremental_neardup injection)."""
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
    return corpus, batch


def _brute_force(corpus, batch, num, den):
    """Reference cross-side inverted-index join — test-only (the
    corpus-rescan shape the operator exists to avoid)."""
    bsh = shingle_table(batch, "doc_id", "text", 5)
    csh = shingle_table(corpus, "doc_id", "text", 5)
    na = bsh.groupBy("doc").agg(F.count("*").alias("n_a"))
    return (
        bsh.alias("a")
        .join(csh.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
        .groupBy(
            F.col("a.doc").alias("doc_id"),
            F.col("b.doc").alias("contained_in"),
        )
        .agg(F.count("*").cast("bigint").alias("inter"))
        .join(na.withColumnRenamed("doc", "doc_id"), "doc_id")
        .filter(F.col("inter") * den >= num * F.col("n_a"))
        .select("doc_id", "contained_in", "inter")
    )


def test_equals_brute_force_cross_side(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    got = sorted(
        map(
            tuple,
            incremental_containment_pairs(
                corpus, batch, "doc_id", "text", n=5,
                threshold_num=_NUM, threshold_den=_DEN,
            )
            .select("doc_id", "contained_in", "inter")
            .collect(),
        )
    )
    want = sorted(
        map(tuple, _brute_force(corpus, batch, _NUM, _DEN).collect())
    )
    assert got == want
    assert len(want) > 0  # non-vacuous: the injection guarantees rows


def test_prebuilt_state_matches_raw(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    sh, dfq = build_containment_state(corpus, "doc_id", "text", n=5)
    got = sorted(
        map(
            tuple,
            incremental_containment_pairs(
                None, batch, "doc_id", "text", n=5,
                threshold_num=_NUM, threshold_den=_DEN,
                corpus_shingles=sh, corpus_df=dfq,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            incremental_containment_pairs(
                corpus, batch, "doc_id", "text", n=5,
                threshold_num=_NUM, threshold_den=_DEN,
            ).collect(),
        )
    )
    assert got == want


def test_injected_copies_surface_at_containment_one(spark, sf_dir):
    corpus, batch = _split(spark, sf_dir)
    pairs = incremental_containment_pairs(
        corpus, batch, "doc_id", "text", n=5,
        threshold_num=_NUM, threshold_den=_DEN,
    )
    hits = {
        (r.doc_id, r.contained_in): r.containment
        for r in pairs.filter(F.col("doc_id") >= 1000000).collect()
    }
    injected = [
        r.doc_id
        for r in corpus.filter(F.col("doc_id") % 7 == 0)
        .select("doc_id")
        .collect()
    ]
    assert injected
    for did in injected:
        assert hits[(did + 1000000, did)] == 1.0


def test_novel_batch_docs_generate_zero_candidates(spark):
    """The refresh-regime property the corpus-df ranking buys: a batch
    doc sharing NO shingle with the corpus ranks its (corpus-absent,
    df 0) shingles first, every posting list is empty, and the probe
    emits nothing — novel content costs only its own shingling. The
    assertion is on the CANDIDATE stage, not the verified output
    (which would stay empty even if the pruning silently regressed to
    fact-sized candidate volume — review r16)."""
    from food_panda_etl_spark.operators.dedup import shingle_table
    from food_panda_etl_spark.operators.incremental_containment import (
        containment_probe_candidates,
    )

    corpus = spark.createDataFrame(
        [(1, "aa bb cc dd ee ff gg"), (2, "aa bb cc dd ee hh ii")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "zz yy xx ww vv uu tt ss")], "doc_id long, text string"
    )
    sh, dfq = build_containment_state(corpus, "doc_id", "text", n=2)
    b_sh = shingle_table(batch, "doc_id", "text", 2)
    assert (
        containment_probe_candidates(sh, dfq, b_sh, 1, 2).count() == 0
    )
    # and the end-to-end output is empty too, of course
    out = incremental_containment_pairs(
        corpus, batch, "doc_id", "text", n=2,
        threshold_num=1, threshold_den=2,
    )
    assert out.count() == 0


def test_direction_is_kept(spark):
    """A short batch memo fully quoted by a long corpus doc must
    surface (containment 1 on the batch side) even though symmetric
    Jaccard would be far below threshold."""
    corpus = spark.createDataFrame(
        [(1, "q1 q2 q3 q4 q5 f1 f2 f3 f4 f5 f6 f7 f8 f9 f10 f11 f12")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, "q1 q2 q3 q4 q5")], "doc_id long, text string"
    )
    rows = incremental_containment_pairs(
        corpus, batch, "doc_id", "text", n=3,
        threshold_num=4, threshold_den=5,
    ).collect()
    assert [(r.doc_id, r.contained_in, r.containment) for r in rows] == [
        (10, 1, 1.0)
    ]


def test_partial_state_raises(spark):
    with pytest.raises(ValueError, match="BOTH corpus_shingles"):
        incremental_containment_pairs(
            None, None, "doc_id", "text",
            corpus_shingles=None, corpus_df=object(),  # type: ignore[arg-type]
        )
    with pytest.raises(ValueError, match="need a corpus DataFrame"):
        incremental_containment_pairs(None, None, "doc_id", "text")
    with pytest.raises(ValueError, match="need 0 < num <= den"):
        incremental_containment_pairs(
            None, None, "doc_id", "text", threshold_num=0
        )


SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

docs_strategy = st.lists(
    st.lists(
        st.sampled_from("abcdefg"), min_size=1, max_size=10
    ),  # words from a 7-token vocabulary → heavy cross-side overlap
    min_size=2,
    max_size=10,
)


@SET
@given(
    docs=docs_strategy,
    thr=st.sampled_from([(1, 2), (4, 5), (1, 1)]),
)
def test_equals_brute_force_random_docs(spark, docs, thr):
    """Random short documents over a tiny vocabulary, alternating ids
    split corpus/batch: duplicate docs (containment 1), subset docs,
    empty-shingle docs, and thresholds landing exactly on the integer
    prefix boundary. Output must equal the brute-force cross-side
    inverted-index join for every threshold — at n=1 grams so the
    overlap structure is dense and adversarial."""
    num, den = thr
    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = d.filter(F.col("doc_id") % 2 == 0)
    batch = d.filter(F.col("doc_id") % 2 == 1)
    got = sorted(
        map(
            tuple,
            incremental_containment_pairs(
                corpus, batch, "doc_id", "text", n=1,
                threshold_num=num, threshold_den=den,
            )
            .select("doc_id", "contained_in", "inter")
            .collect(),
        )
    )
    bsh = shingle_table(batch, "doc_id", "text", 1)
    csh = shingle_table(corpus, "doc_id", "text", 1)
    na = bsh.groupBy("doc").agg(F.count("*").alias("n_a"))
    want = sorted(
        map(
            tuple,
            bsh.alias("a")
            .join(csh.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
            .groupBy(
                F.col("a.doc").alias("doc_id"),
                F.col("b.doc").alias("contained_in"),
            )
            .agg(F.count("*").cast("bigint").alias("inter"))
            .join(na.withColumnRenamed("doc", "doc_id"), "doc_id")
            .filter(F.col("inter") * den >= num * F.col("n_a"))
            .select("doc_id", "contained_in", "inter")
            .collect(),
        )
    )
    assert got == want


def test_state_geometry_mismatch_raises(spark, sf_dir):
    """ADVICE r17 (the incremental_embed r16 pattern): probing state
    built at a different n must raise — intersections counted across
    different gram sizes are silently wrong containment values, never
    an error. Mixed pairs from two different builds are caught too."""
    corpus, batch = _split(spark, sf_dir)
    c_sh, c_df = build_containment_state(corpus, "doc_id", "text", n=4)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_containment_pairs(
            None, batch, "doc_id", "text", n=5,
            threshold_num=_NUM, threshold_den=_DEN,
            corpus_shingles=c_sh, corpus_df=c_df,
        )
    c_sh5, c_df5 = build_containment_state(corpus, "doc_id", "text", n=5)
    with pytest.raises(ValueError, match="different geometries"):
        incremental_containment_pairs(
            None, batch, "doc_id", "text", n=5,
            threshold_num=_NUM, threshold_den=_DEN,
            corpus_shingles=c_sh, corpus_df=c_df5,
        )
    # matching geometry passes (and the stamp survives the state's own
    # groupBy derivation — both frames carry it)
    got = incremental_containment_pairs(
        None, batch, "doc_id", "text", n=5,
        threshold_num=_NUM, threshold_den=_DEN,
        corpus_shingles=c_sh5, corpus_df=c_df5,
    )
    assert got.columns == ["doc_id", "contained_in", "inter", "containment"]


def test_hand_built_state_still_accepted(spark, sf_dir):
    """Unstamped (hand-built) state stays accepted with matching n as
    the caller's contract — the stamp is a safety net for the
    build_containment_state path, not a new input requirement."""
    corpus, batch = _split(spark, sf_dir)
    sh = shingle_table(corpus, "doc_id", "text", 5)
    df_tbl = sh.groupBy("shingle").agg(F.count("*").alias("__df"))
    got = incremental_containment_pairs(
        None, batch, "doc_id", "text", n=5,
        threshold_num=_NUM, threshold_den=_DEN,
        corpus_shingles=sh, corpus_df=df_tbl,
    ).count()
    want = incremental_containment_pairs(
        corpus, batch, "doc_id", "text", n=5,
        threshold_num=_NUM, threshold_den=_DEN,
    ).count()
    assert got == want
