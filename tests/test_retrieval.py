"""Unit + plan tests for the retrieval operators (operators/retrieval.py):
sliding-window chunking and log-free BM25 top-k. The oracle-parity sweep
(test_oracle_parity) covers the declared queries; here we pin edge cases
and the plan shapes the docstrings claim."""

from __future__ import annotations

import pytest

from food_panda_etl_spark.operators.retrieval import bm25_topk, chunk_sliding
from food_panda_etl_spark.plans import lint_plan, plan_summary
from food_panda_etl_spark.queries import QUERIES


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunk_short_doc_single_chunk(spark):
    out = chunk_sliding(
        _docs(spark, [(1, "a b c")]), "doc_id", "text", window=32, stride=16
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.chunk_id, r.n_tokens, r.chunk_text) == (0, 3, "a b c")


def test_chunk_overlap_and_truncation(spark):
    # 10 tokens, window 4, stride 2 → starts 0,2,4,6,8; last chunk truncated
    text = " ".join(f"t{i}" for i in range(10))
    out = {
        r.chunk_id: r
        for r in chunk_sliding(
            _docs(spark, [(1, text)]), "doc_id", "text", window=4, stride=2
        ).collect()
    }
    assert sorted(out) == [0, 1, 2, 3, 4]
    assert out[0].chunk_text == "t0 t1 t2 t3"
    assert out[1].chunk_text == "t2 t3 t4 t5"  # 50% overlap
    assert out[4].chunk_text == "t8 t9" and out[4].n_tokens == 2


def test_chunk_exact_multiple_no_empty_tail(spark):
    # 8 tokens, window 4, stride 4 → exactly 2 full chunks, no empty 3rd
    text = " ".join(f"t{i}" for i in range(8))
    out = chunk_sliding(
        _docs(spark, [(1, text)]), "doc_id", "text", window=4, stride=4
    ).collect()
    assert len(out) == 2
    assert all(r.n_tokens == 4 for r in out)


def test_chunk_every_token_covered(spark):
    text = " ".join(f"t{i}" for i in range(37))
    chunks = chunk_sliding(
        _docs(spark, [(1, text)]), "doc_id", "text", window=32, stride=16
    ).collect()
    seen = set()
    for r in chunks:
        seen.update(r.chunk_text.split(" "))
    assert seen == {f"t{i}" for i in range(37)}


def test_chunk_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        chunk_sliding(_docs(spark, [(1, "a")]), "doc_id", "text", stride=0)


def _bm25_py(docs, queries, k1=1.2, b=0.75):
    """Independent pure-Python reimplementation (linear idf)."""
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    tf = {d: Counter(t for t in txt.split(" ") if t) for d, txt in docs}
    dl = {d: sum(c.values()) for d, c in tf.items()}
    n = len(docs)
    avgdl = float(sum(dl.values())) / float(n)
    df = Counter(t for c in tf.values() for t in c)
    scores = {}
    for qid, term in queries:
        for d, c in tf.items():
            if term not in c:
                continue
            idf = float(2 * n - 2 * df[term] + 1) / float(2 * df[term] + 1)
            ts = idf * (
                (c[term] * 2.2)
                / (c[term] + (k1 * ((1.0 - b) + (b * (dl[d] / avgdl)))))
            )
            ts = float(
                Decimal(repr(ts)).quantize(Decimal("0.000001"), ROUND_HALF_UP)
            )
            scores[(qid, d)] = scores.get((qid, d), 0.0) + ts
    return scores


def test_bm25_matches_reference_impl(spark):
    docs = [
        (1, "hash join hash probe"),
        (2, "hash table build side"),
        (3, "sort merge join spill"),
        (4, "scan filter project"),
    ]
    queries = [(0, "hash"), (0, "join")]
    qdf = spark.createDataFrame(queries, "query_id int, term string")
    got = {
        (r.query_id, r.doc_id): r.score
        for r in bm25_topk(_docs(spark, docs), qdf, k=10).collect()
    }
    want = _bm25_py(docs, queries)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], abs=2e-6), key


def test_bm25_tf_monotone_and_rank_order(spark):
    # same length docs; more query-term occurrences → higher score
    docs = [
        (1, "hash hash hash pad"),
        (2, "hash hash pad pad"),
        (3, "hash pad pad pad"),
        (4, "pad pad pad pad"),
    ]
    qdf = spark.createDataFrame([(0, "hash")], "query_id int, term string")
    out = sorted(
        bm25_topk(_docs(spark, docs), qdf, k=10).collect(),
        key=lambda r: r.rnk,
    )
    assert [r.doc_id for r in out] == [1, 2, 3]  # doc 4: no match, absent
    assert out[0].score > out[1].score > out[2].score


def test_chunk_plan_is_narrow(spark, sf_dir):
    # chunking must be a pure projection: zero exchanges, zero joins
    s = plan_summary(QUERIES["q_chunk_text"](spark, sf_dir))
    assert s.exchanges == 0
    assert s.sort_merge_joins + s.broadcast_joins + s.nested_loop_joins == 0
    assert lint_plan(QUERIES["q_chunk_text"](spark, sf_dir)) == []


def test_bm25_plan_topk_and_no_cartesian(spark, sf_dir):
    df = QUERIES["q_bm25"](spark, sf_dir)
    assert lint_plan(df) == []
    s = plan_summary(df)
    assert s.window_group_limits >= 1  # top-k prunes before the sort
    assert s.cartesian_products == 0


def test_hybrid_rrf_plan_bounded_fusion(spark, sf_dir):
    # both arms prune to top-k via WindowGroupLimit BEFORE the fusion
    # join; the final top-10 adds a third — and nothing goes cartesian
    df = QUERIES["q_hybrid_rrf"](spark, sf_dir)
    assert lint_plan(df) == []
    s = plan_summary(df)
    assert s.window_group_limits >= 3
    assert s.cartesian_products == 0


def test_hybrid_rrf_contains_both_arms(spark, sf_dir):
    """The fused lists must actually draw from BOTH arms: recompute each
    arm's top-20 independently and assert every query's fused top-10
    intersects each arm's candidate set (a regression that silently
    drops one arm — e.g. a degraded join condition — still produces 10
    monotone rows, so counts alone cannot catch it)."""
    from pyspark.sql import functions as F

    from food_panda_etl_spark.operators.similarity import brute_force_topk
    from food_panda_etl_spark.queries.retrieval import BM25_QUERIES
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    qdf = spark.createDataFrame(BM25_QUERIES, "query_id int, term string")
    lex_sets: dict = {}
    for r in bm25_topk(d, qdf, k=20).collect():
        lex_sets.setdefault(r.query_id, set()).add(r.doc_id)
    qv = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    dense_sets: dict = {}
    for r in brute_force_topk(e, qv, k=20).collect():
        dense_sets.setdefault(int(r.qid), set()).add(r.neighbor_id)

    rows = QUERIES["q_hybrid_rrf"](spark, sf_dir).collect()
    by_q: dict = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {0, 1, 2}
    for q, rs in by_q.items():
        assert len(rs) == 10
        fused_ids = {r.doc_id for r in rs}
        assert fused_ids & lex_sets[q], f"query {q}: no lexical doc fused"
        assert fused_ids & dense_sets[q], f"query {q}: no dense doc fused"
        # rrf strictly positive and non-increasing in rank order
        rs = sorted(rs, key=lambda r: r.rnk)
        assert all(r.rrf > 0 for r in rs)
        assert all(
            rs[i].rrf >= rs[i + 1].rrf for i in range(len(rs) - 1)
        )


def test_chunk_drops_empty_tokens(spark):
    # double/trailing spaces produce empty split tokens — dropped before
    # windowing, so n_tokens counts real words (bm25's tokenization)
    out = chunk_sliding(
        _docs(spark, [(1, "a  b "), (2, "   ")]), "doc_id", "text",
        window=4, stride=4,
    ).collect()
    assert len(out) == 1  # whitespace-only doc 2 yields no chunks
    r = out[0]
    assert (r.doc_id, r.n_tokens, r.chunk_text) == (1, 2, "a b")


def test_bm25_property_random_corpora(spark):
    """bm25_topk == the independent Python reimplementation on random
    small corpora (hypothesis): catches formula drift in any of tf/df/
    dl/avgdl/idf wiring, not just the one hand-built example."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    vocab = ["hash", "join", "scan", "sort", "pad", "spill"]

    @settings(
        max_examples=5,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=8),
            min_size=1,
            max_size=6,
        ),
        qterms=st.lists(st.sampled_from(vocab), min_size=1, max_size=3, unique=True),
    )
    def run(docs, qterms):
        rows = [(i + 1, " ".join(toks)) for i, toks in enumerate(docs)]
        queries = [(0, t) for t in qterms]
        qdf = spark.createDataFrame(queries, "query_id int, term string")
        got = {
            (r.query_id, r.doc_id): r.score
            for r in bm25_topk(_docs(spark, rows), qdf, k=100).collect()
        }
        want = _bm25_py(rows, queries)
        assert set(got) == set(want)
        for key in want:
            assert got[key] == pytest.approx(want[key], abs=2e-6), key

    run()
