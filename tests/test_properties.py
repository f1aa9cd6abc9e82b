"""Property-based invariants (SURVEY.md §5.5) over seeded random frames:
percentage-of-total closure, dedup idempotence, set-op count algebra,
left-outer row preservation, running-sum totals. Few examples, small
frames — each example runs real Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql.window import Window

SET = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(min_value=0, max_value=1000),
    ),
    min_size=1,
    max_size=40,
)


@SET
@given(rows=rows_strategy)
def test_group_pct_sums_to_100(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    pct = df.groupBy("k").agg(F.count("*").alias("cnt")).select(
        (F.col("cnt") * 100.0 / F.sum("cnt").over(Window.partitionBy())).alias("pct")
    )
    total = pct.agg(F.sum("pct").alias("s")).collect()[0]["s"]
    assert abs(total - 100.0) < 1e-9


@SET
@given(rows=rows_strategy)
def test_dedup_idempotent_and_bounded(spark, rows):
    df = spark.createDataFrame(rows, "k string, v long")
    once = df.dropDuplicates(["k"])
    twice = once.dropDuplicates(["k"])
    n_once, n_twice = once.count(), twice.count()
    assert n_once == n_twice  # idempotent
    assert n_once <= df.count()
    assert n_once == df.select("k").distinct().count()


@SET
@given(a=rows_strategy, b=rows_strategy)
def test_setop_count_algebra(spark, a, b):
    da = spark.createDataFrame(a, "k string, v long")
    db = spark.createDataFrame(b, "k string, v long")
    # union-all additivity
    assert da.unionAll(db).count() == da.count() + db.count()
    # distinct partition: |A| = |A∩B| + |A\B| over distinct rows
    dda, ddb = da.distinct(), db.distinct()
    assert dda.count() == dda.intersect(ddb).count() + dda.subtract(ddb).count()


@SET
@given(
    n_codes=st.integers(min_value=1, max_value=25),
    detail_mask=st.integers(min_value=0, max_value=(1 << 25) - 1),
)
def test_enrich_preserves_code_universe(spark, n_codes, detail_mask):
    """Left-outer semantics: every code survives enrichment no matter which
    subset has details/reviews/ratings (src/services/vendor.rs:82-115)."""
    from food_panda_etl_spark.vendor import enrich_vendors

    codes = spark.createDataFrame(
        [(1, f"v{i:03d}") for i in range(n_codes)], "city_id int, code string"
    )
    details = spark.createDataFrame(
        [(f"v{i:03d}", '{"name":"x"}') for i in range(n_codes) if detail_mask >> i & 1]
        or [("__none__", "{}")],
        "code string, details string",
    )
    empty_reviews = spark.createDataFrame([], "code string, review string, created_at long")
    empty_ratings = spark.createDataFrame([], "code string, ratings string")
    out = enrich_vendors(codes, details, empty_reviews, empty_ratings)
    assert out.count() == n_codes
    assert out.filter(F.col("code").isNull()).count() == 0


@SET
@given(rows=rows_strategy)
def test_running_sum_ends_at_group_total(spark, rows):
    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k string, i long, v long"
    )
    w = Window.partitionBy("k").orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
    run = df.select("k", "i", F.sum("v").over(w).alias("rs"))
    last = run.withColumn(
        "rn", F.row_number().over(Window.partitionBy("k").orderBy(F.desc("i")))
    ).filter("rn = 1")
    totals = df.groupBy("k").agg(F.sum("v").alias("t"))
    joined = last.join(totals, "k")
    assert joined.filter(F.col("rs") != F.col("t")).count() == 0


@SET
@given(
    keys=st.lists(
        st.integers(min_value=-(10**9), max_value=10**9),
        min_size=1, max_size=60, unique=True,
    ),
    nparts=st.integers(min_value=1, max_value=7),
)
def test_global_row_number_is_a_permutation_rank(spark, keys, nparts):
    """Two-phase numbering assigns exactly rank-in-sorted-order for any
    unique key set and any partition count."""
    from food_panda_etl_spark.operators.order import global_row_number

    df = spark.createDataFrame([(k,) for k in keys], "k long").repartition(3)
    got = {
        r["k"]: r["rn"]
        for r in global_row_number(df, ["k"], num_partitions=nparts).collect()
    }
    expect = {k: i + 1 for i, k in enumerate(sorted(keys))}
    assert got == expect


@SET
@given(
    n=st.integers(min_value=2, max_value=40),
    blocks=st.integers(min_value=1, max_value=9),
    seed=st.integers(min_value=0, max_value=10_000),
)
def test_triangle_join_enumerates_every_pair_once(spark, n, blocks, seed):
    """For any block count the triangle equi-join must score every
    unordered pair exactly once: with threshold=-1 (accept all) the output
    is exactly the n*(n-1)/2 pair set, no dups, no misses."""
    import random

    from food_panda_etl_spark.operators.similarity import triangle_neardup_pairs

    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    got = [
        (r["id_a"], r["id_b"])
        for r in triangle_neardup_pairs(df, threshold=-1.0, blocks=blocks).collect()
    ]
    assert len(got) == len(set(got)) == n * (n - 1) // 2
    assert all(a < b for a, b in got)


@SET
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=255),
            st.integers(min_value=0, max_value=255),
        ),
        min_size=1,
        max_size=30,
    )
)
def test_zorder_key_is_invertible(spark, vals):
    """The Morton interleave must be a bijection on its bucket domain:
    de-interleaving the key recovers the exact inputs (no two bucket
    tuples can share a key, no bits are lost or scrambled)."""
    from food_panda_etl_spark.operators.zorder import zorder_key

    df = spark.createDataFrame(vals, "a int, b int")
    got = df.select(
        "a", "b", zorder_key([F.col("a"), F.col("b")], bits=8).alias("k")
    ).collect()
    for r in got:
        a = sum((((r["k"] >> (2 * bit)) & 1) << bit) for bit in range(8))
        b = sum((((r["k"] >> (2 * bit + 1)) & 1) << bit) for bit in range(8))
        assert (a, b) == (r["a"], r["b"]), (r["a"], r["b"], r["k"])


@SET
@given(
    n=st.integers(min_value=2, max_value=30),
    edge_seed=st.integers(min_value=0, max_value=10_000),
)
def test_star_cc_matches_propagation_on_random_graphs(spark, n, edge_seed):
    """large-star/small-star and min-label propagation must agree on the
    unique min-id fixpoint for arbitrary random graphs."""
    import random

    from food_panda_etl_spark.operators.components import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(edge_seed)
    es = [(rng.randrange(n), rng.randrange(n)) for _ in range(max(1, n))]
    nodes = spark.createDataFrame([(i,) for i in range(n)], "id bigint")
    edges = spark.createDataFrame(es, "src bigint, dst bigint")
    prop = {
        r["id"]: r["component"]
        for r in connected_components(nodes, edges).collect()
    }
    star = {
        r["id"]: r["component"]
        for r in connected_components_star(nodes, edges).collect()
    }
    assert star == prop


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    seed=st.integers(min_value=0, max_value=10_000),
    alpha=st.booleans(),
)
def test_png_decode_equals_bmp_decode(w, h, seed, alpha):
    """Property: for any (w, h, seed), the PNG encoder/decoder pair must
    produce the identical grayscale raster as the independently tested
    BMP path (shared pixel formula) — covering every scanline-filter
    type, RGB and RGBA, and degenerate 1-pixel images. Pure-Python, no
    Spark jobs, so examples are cheap."""
    from food_panda_etl_spark.functions.multimodal import (
        _decode_bmp,
        _decode_png,
        synth_bmp_payload,
        synth_png_payload,
    )

    assert _decode_png(synth_png_payload(w, h, seed, alpha)) == _decode_bmp(
        synth_bmp_payload(w, h, seed)
    )


@SET
@given(
    rows=st.lists(
        st.sampled_from(["hot", "warm", "w2", "w3", "x", "y", "z"]),
        min_size=20,
        max_size=120,
    ),
    parts=st.sampled_from([1, 3, 8]),
)
def test_heavy_hitters_exact_under_any_partitioning(spark, rows, parts):
    """Property: heavy_hitters == brute-force HAVING under every
    partition layout — the MG summaries are layout-dependent, the
    verified output must not be."""
    from food_panda_etl_spark.operators.heavy import heavy_hitters

    df = spark.createDataFrame([(v,) for v in rows], "v string").repartition(parts)
    got = {
        (r["v"], r["cnt"]) for r in heavy_hitters(df, "v", fraction=0.15).collect()
    }
    n = len(rows)
    brute = {
        (r["v"], r["cnt"])
        for r in df.groupBy("v")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 0.15 * n)
        .collect()
    }
    assert got == brute


def test_heavy_hitters_edge_cases(spark):
    """Degenerate inputs: a constant column yields one hitter with the
    exact count; an all-distinct column yields none; out-of-range
    fractions are rejected."""
    import pytest as _pytest

    from food_panda_etl_spark.operators.heavy import heavy_hitters

    const = spark.createDataFrame([("x",)] * 50, "v string").repartition(4)
    got = heavy_hitters(const, "v", fraction=0.5).collect()
    assert [(r["v"], r["cnt"]) for r in got] == [("x", 50)]

    distinct = spark.createDataFrame([(str(i),) for i in range(60)], "v string")
    assert heavy_hitters(distinct, "v", fraction=0.5).count() == 0

    for bad in (0.0, 1.0, -0.1, 2.0):
        with _pytest.raises(ValueError):
            heavy_hitters(const, "v", fraction=bad)


@SET
@given(
    n_tokens=st.integers(min_value=1, max_value=120),
    window=st.integers(min_value=1, max_value=40),
    stride=st.integers(min_value=1, max_value=40),
)
def test_chunk_sliding_matches_python_reference(spark, n_tokens, window, stride):
    """chunk_sliding == the obvious Python chunker for ANY (n, w, s):
    starts at 0, s, 2s, … while < n; each chunk is tokens[start:start+w]."""
    from food_panda_etl_spark.operators.retrieval import chunk_sliding

    toks = [f"t{i}" for i in range(n_tokens)]
    df = spark.createDataFrame([(1, " ".join(toks))], "doc_id long, text string")
    got = {
        r.chunk_id: (r.n_tokens, r.chunk_text)
        for r in chunk_sliding(
            df, "doc_id", "text", window=window, stride=stride
        ).collect()
    }
    want = {
        i: (len(toks[s : s + window]), " ".join(toks[s : s + window]))
        for i, s in enumerate(range(0, n_tokens, stride))
    }
    assert got == want


@SET
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "aa", "x"]),
            min_size=0,
            max_size=8,
        ).map(" ".join),
        min_size=1,
        max_size=12,
    )
)
def test_bigram_lm_score_matches_reference_impl(spark, texts):
    """bigram_lm_score == an independent pure-Python bigram LM on random
    corpora: same corpus counts, same mean-probability score, same
    sub-2-token exclusion. Probabilities compared exactly after the same
    DECIMAL(18,12) quantization."""
    from decimal import Decimal

    from food_panda_etl_spark.operators.lm import bigram_lm_score

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["lm_score"])
        for r in bigram_lm_score(df, "doc_id", "text").collect()
    }

    toks = {i: t.split(" ") for i, t in enumerate(texts)}
    cbig: dict = {}
    cctx: dict = {}
    for ws in toks.values():
        for w1, w2 in zip(ws, ws[1:]):
            cbig[(w1, w2)] = cbig.get((w1, w2), 0) + 1
            cctx[w1] = cctx.get(w1, 0) + 1
    want = {}
    for i, ws in toks.items():
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            continue  # excluded from the output, like the operator
        q = Decimal("1.000000000000")
        tot = sum(
            Decimal(cbig[p] / cctx[p[0]]).quantize(q) for p in pairs
        )
        want[i] = (len(pairs), float(tot) / float(len(pairs)))
    assert got == want


def test_dsir_boundary_scores(spark):
    """A document made only of target-exclusive bigrams scores exactly
    RT/TT (every rho hits the ratio ceiling: tb == rb); one sharing no
    bucket with the target scores exactly 0.0. Checked with bucket
    collisions ruled out by construction (distinct leading tokens)."""
    from food_panda_etl_spark.operators.dsir import dsir_weights

    # tgt doc: bigrams (ta tb), (tb tc); raw-only doc: (ra rb), (rb rc)
    rows = [
        (0, "ta tb tc", 1),
        (1, "ra rb rc", 0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, tgt int")
    got = {
        r["doc_id"]: r["dsir_score"]
        for r in dsir_weights(df, F.col("tgt") == 1).collect()
    }
    # RT = 4 bigrams total, TT = 2 target bigrams -> ceiling = 2.0
    assert got[0] == 2.0
    assert got[1] == 0.0


def test_dsir_partition_invariant(spark, sf_dir):
    """Scores are independent of the input partitioning (hash-agg +
    join plan, no order-sensitive float sums: addends are decimal-cast)."""
    from food_panda_etl_spark.operators.dsir import dsir_weights
    from food_panda_etl_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    base = {
        r["doc_id"]: (r["n_bigrams"], r["dsir_score"].hex())
        for r in dsir_weights(d, F.col("lang") == "en").collect()
    }
    for parts in (1, 7):
        got = {
            r["doc_id"]: (r["n_bigrams"], r["dsir_score"].hex())
            for r in dsir_weights(
                d.repartition(parts), F.col("lang") == "en"
            ).collect()
        }
        assert got == base


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    weights=st.lists(st.integers(min_value=1, max_value=50),
                     min_size=3, max_size=40),
    parts=st.integers(min_value=1, max_value=5),
)
def test_pps_sample_ticks_partition_exactly(spark, weights, parts):
    """Systematic PPS invariants under any weights and partitioning:
    Σ n_ticks over selected rows telescopes to exactly k, every selected
    row has n_ticks >= 1, and any row with weight >= T/k (a certainty
    unit) is always selected."""
    from food_panda_etl_spark.operators.sampling import pps_systematic_sample

    k = 7
    df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(weights)], "doc_id long, n_chars long"
    ).repartition(parts)
    rows = pps_systematic_sample(df, "n_chars", k=k).collect()
    total = sum(weights)
    assert sum(r["n_ticks"] for r in rows) == k
    assert all(r["n_ticks"] >= 1 for r in rows)
    picked = {r["doc_id"] for r in rows}
    for i, w in enumerate(weights):
        if w * k >= total + k:  # strictly more than T/k in integer terms
            assert i in picked


def test_temperature_mix_flattens_distribution(spark, sf_dir):
    """α=1/2 quota shares must sit strictly between uniform and the raw
    count shares for every stratum (the definition of flattening), and
    per-stratum keeps can never exceed availability."""
    from food_panda_etl_spark.queries import QUERIES

    rows = QUERIES["q_temperature_mix"](spark, sf_dir).collect()
    n_tot = sum(r["n_total"] for r in rows)
    q_tot = sum(r["quota"] for r in rows)
    k = len(rows)
    for r in rows:
        raw_share = r["n_total"] / n_tot
        q_share = r["quota"] / q_tot
        lo, hi = sorted((raw_share, 1.0 / k))
        # floor() can nudge a share a hair past the open bound
        assert lo - 0.02 <= q_share <= hi + 0.02, (r["lang"], q_share, lo, hi)
        assert r["n_kept"] <= r["n_total"]


def test_unicode_normalization_forms(spark):
    """NFC composes combining sequences without folding compatibility
    characters; NFKC additionally folds ligatures/width variants — and
    both must be idempotent."""
    from food_panda_etl_spark.functions.textnorm import nfc, nfkc

    rows = [(0, "é"), (1, "ﬁle"), (2, "ｆｕｌｌ"), (3, "é")]
    df = spark.createDataFrame(rows, "i long, s string")
    out = {
        r["i"]: (r["c"], r["k"])
        for r in df.select(
            "i", nfc(F.col("s")).alias("c"), nfkc(F.col("s")).alias("k")
        ).collect()
    }
    assert out[0] == ("é", "é")          # composed by both
    assert out[1] == ("ﬁle", "file")  # ligature folds only under NFKC
    assert out[2][0] == "ｆｕｌｌ" and out[2][1] == "full"
    assert out[3] == ("é", "é")          # idempotent on already-NFC


def test_dsir_empty_target_raises(spark):
    """ADVICE r6: an empty target (predicate matches no document with
    >= 2 tokens) must fail loudly in-plan, not silently NULL every
    score."""
    import pytest

    from food_panda_etl_spark.operators.dsir import dsir_weights

    df = spark.createDataFrame(
        [(0, "aa bb cc", 0), (1, "dd ee", 0)],
        "doc_id long, text string, tgt int",
    )
    with pytest.raises(Exception, match="target predicate matched no bigrams"):
        dsir_weights(df, F.col("tgt") == 1).collect()
    # one-token target docs contribute no bigrams -> still empty target
    df2 = spark.createDataFrame(
        [(0, "aa bb cc", 0), (1, "solo", 1)],
        "doc_id long, text string, tgt int",
    )
    with pytest.raises(Exception, match="target predicate matched no bigrams"):
        dsir_weights(df2, F.col("tgt") == 1).collect()


def test_pps_negative_or_null_weight_raises(spark):
    """ADVICE r6: negative weights diverge across engines (div truncates
    vs // floors) and NULL weights corrupt the prefix sum — both must
    fail loudly in-plan instead of silently corrupting the sample."""
    import pytest

    from food_panda_etl_spark.operators.sampling import pps_systematic_sample

    neg = spark.createDataFrame(
        [(0, 5), (1, -3), (2, 7)], "doc_id long, n_chars long"
    )
    with pytest.raises(Exception, match="non-negative non-NULL"):
        pps_systematic_sample(neg, "n_chars", k=2).collect()
    nul = spark.createDataFrame(
        [(0, 5), (1, None), (2, 7)], "doc_id long, n_chars long"
    )
    with pytest.raises(Exception, match="non-negative non-NULL"):
        pps_systematic_sample(nul, "n_chars", k=2).collect()
    # zero weights stay legal: empty interval, never selected
    zero = spark.createDataFrame(
        [(0, 5), (1, 0), (2, 7)], "doc_id long, n_chars long"
    )
    picked = {
        r["doc_id"] for r in pps_systematic_sample(zero, "n_chars", k=3).collect()
    }
    assert 1 not in picked and picked


def test_pagerank_empty_nodes_raises(spark):
    """ADVICE r6: an empty node set is a caller bug (ranks undefined),
    not a ZeroDivisionError deep in the teleport term."""
    import pytest

    from food_panda_etl_spark.operators.pagerank import pagerank

    nodes = spark.createDataFrame([], "id long")
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="nodes is empty"):
        pagerank(nodes, edges)


def test_pps_nan_weight_raises(spark):
    """Spark orders NaN greater than every number, so a `>= 0` guard
    alone would admit NaN and the non-ANSI bigint cast would silently
    zero it — the guard must reject NaN explicitly."""
    import pytest

    from food_panda_etl_spark.operators.sampling import pps_systematic_sample

    df = spark.createDataFrame(
        [(0, 5.0), (1, float("nan")), (2, 7.0)], "doc_id long, n_chars double"
    )
    with pytest.raises(Exception, match="non-negative non-NULL"):
        pps_systematic_sample(df, "n_chars", k=2).collect()


# --- r13 sketch/join family invariants (few examples, real Spark) ---

docs_strategy = st.lists(
    st.lists(
        st.sampled_from([f"w{i}" for i in range(12)]), min_size=3, max_size=12
    ),
    min_size=2,
    max_size=8,
)


@SET
@given(docs=docs_strategy, c=st.integers(min_value=1, max_value=4))
def test_overlap_join_equals_brute_force_random(spark, docs, c):
    """overlap_join completeness on RANDOM corpora (3-gram shingles,
    random thresholds) — the engineered-fixture tests pin known
    shapes; this pins the theorem on shapes nobody engineered."""
    from food_panda_etl_spark.operators.dedup import shingle_table
    from food_panda_etl_spark.operators.overlap_join import overlap_join
    from tests.test_overlap_join import _brute_force

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_a, r.doc_b, r.overlap)
        for r in overlap_join(d, "doc_id", "text", 3, c).collect()
    )
    # ONE brute-force oracle definition (the test_streaming_sketches
    # cross-import convention) — a second inline copy could drift
    want = sorted(
        (r.doc_a, r.doc_b, r.overlap)
        for r in _brute_force(shingle_table(d, "doc_id", "text", 3), c).collect()
    )
    assert got == want


keys_strategy = st.lists(
    st.integers(min_value=-50, max_value=50), min_size=0, max_size=60
)


@SET
@given(a=keys_strategy, b=keys_strategy)
def test_cms_inner_product_never_under_random(spark, a, b):
    """cms_inner_product ≥ the exact inner product on RANDOM multisets
    (negative keys included — the pmod residue grid). Width 8 forces
    heavy collisions on purpose: the one-sided bound must hold under
    collision pressure, not only in the collision-free regime the
    fixture tests exercise."""
    from collections import Counter

    from food_panda_etl_spark.operators.cms import cms_sketch
    from food_panda_etl_spark.operators.cms_inner import cms_inner_product

    da = spark.createDataFrame([(k,) for k in a] or [(None,)], "k long")
    db = spark.createDataFrame([(k,) for k in b] or [(None,)], "k long")
    est = cms_inner_product(
        cms_sketch(da, "k", width=8, depth=3),
        cms_sketch(db, "k", width=8, depth=3),
    ).collect()[0]["est"]
    ca, cb = Counter(a), Counter(b)
    exact = sum(ca[k] * cb[k] for k in ca)
    assert est >= exact
    # and the trivial upper bound: min over depths can never exceed
    # the all-collisions-in-one-bucket mass
    assert est <= sum(ca.values()) * sum(cb.values())


# --- r14 build-ahead invariants (few examples, real Spark) ---


@SET
@given(
    docs=docs_strategy,
    num=st.integers(min_value=1, max_value=4),
)
def test_weighted_jaccard_equals_brute_force_random(spark, docs, num):
    """weighted_jaccard_join completeness on RANDOM corpora — a
    12-word vocabulary over 3-grams guarantees heavy shingle
    multiplicities and hot shingles, the regime the fixture corpus
    barely exercises (its multiplicities are sparse). The brute force
    is the count-join reference from test_weighted_jaccard (ONE
    definition, the cross-import convention). Threshold num/4 sweeps
    0.25..1.0 — τ=1 includes the degenerate keep-only-identical
    regime."""
    from food_panda_etl_spark.operators.weighted_jaccard import (
        shingle_multiset_table,
        weighted_jaccard_join,
    )
    from tests.test_weighted_jaccard import _brute_force

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_a, r.doc_b, r.wi)
        for r in weighted_jaccard_join(
            d, "doc_id", "text", n=3, threshold_num=num, threshold_den=4
        ).collect()
    )
    shc = shingle_multiset_table(d, "doc_id", "text", n=3)
    want = sorted(
        (r.doc_a, r.doc_b, r.wi) for r in _brute_force(shc, num, 4).collect()
    )
    assert got == want


@SET
@given(
    docs=docs_strategy,
    eval_mask=st.integers(min_value=1, max_value=6),
    m_bits=st.sampled_from([16, 64, 4096]),
)
def test_decontam_bloom_equals_exact_random(spark, docs, eval_mask, m_bits):
    """bloom_screened_contamination == ngram_contamination on RANDOM
    corpora and UNDERSIZED sketches (m=16 over dozens of shingles is
    all-FP territory): the one-sided screen + exact verify must be
    bit-identical to the unscreened computation regardless of
    geometry, split, or hash collisions."""
    from food_panda_etl_spark.operators.decontam_bloom import (
        bloom_screened_contamination,
    )
    from food_panda_etl_spark.operators.dedup import ngram_contamination

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    train = d.filter(F.col("doc_id") % (eval_mask + 1) != 0)
    evals = d.filter(F.col("doc_id") % (eval_mask + 1) == 0)
    got = sorted(
        map(
            tuple,
            bloom_screened_contamination(
                train, evals, "doc_id", "text", n=3,
                m_bits=m_bits, k_hashes=2,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ngram_contamination(train, evals, "doc_id", "text", n=3).collect(),
        )
    )
    assert got == want


# --- r15 build-ahead invariants (few examples, real Spark) ---


@SET
@given(
    docs=docs_strategy,
    num=st.integers(min_value=2, max_value=4),
    split=st.integers(min_value=1, max_value=3),
)
def test_incremental_neardup_equals_brute_force_random(spark, docs, num, split):
    """incremental_neardup_pairs == the brute-force cross-side join on
    RANDOM corpora (2-gram shingles over a 12-word vocabulary — heavy
    shingle collisions, the regime the fixture split barely exercises).
    Band geometry r=1, b=32 so the candidate miss probability is
    ≤ (1−τ)^32 ≤ 2e-10 at the swept thresholds τ = num/4 ∈ {1/2, 3/4,
    1} — equality is then certain at test scale, not just likely. The
    brute force is the cross-side reference from
    test_incremental_neardup (ONE definition, the cross-import
    convention)."""
    from food_panda_etl_spark.operators.incremental_neardup import (
        incremental_neardup_pairs,
    )
    from tests.test_incremental_neardup import _brute_force

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = d.filter(F.col("doc_id") % (split + 1) != 0)
    batch = d.filter(F.col("doc_id") % (split + 1) == 0)
    tau = num / 4.0
    got = sorted(
        map(
            tuple,
            incremental_neardup_pairs(
                corpus, batch, "doc_id", "text", n=2, threshold=tau,
                num_hashes=32, bands=32,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            _brute_force(spark, corpus, batch, tau, n=2).collect(),
        )
    )
    assert got == want


@SET
@given(
    docs=docs_strategy,
    num=st.integers(min_value=2, max_value=4),
)
def test_weighted_minhash_equals_exact_random(spark, docs, num):
    """weighted_minhash_lsh_pairs == weighted_jaccard_join on RANDOM
    corpora — the sketch path's only approximation is candidate
    recall, and at r=1, b=32 a true pair at weighted similarity
    j ≥ num/4 ≥ 1/2 is missed with probability ≤ (1−j)^32 ≤ 2e-10, so
    the two routes must agree row-for-row (both verify exactly through
    the shared count_table_verify)."""
    from food_panda_etl_spark.operators.weighted_jaccard import (
        weighted_jaccard_join,
    )
    from food_panda_etl_spark.operators.weighted_minhash import (
        weighted_minhash_lsh_pairs,
    )

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        map(
            tuple,
            weighted_minhash_lsh_pairs(
                d, "doc_id", "text", n=3, threshold_num=num,
                threshold_den=4, num_hashes=32, bands=32,
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            weighted_jaccard_join(
                d, "doc_id", "text", n=3, threshold_num=num,
                threshold_den=4,
            ).collect(),
        )
    )
    assert got == want


@SET
@given(
    docs=docs_strategy,
    num=st.integers(min_value=1, max_value=4),
)
def test_containment_join_equals_brute_force_random(spark, docs, num):
    """containment_join completeness on RANDOM corpora (3-gram
    shingles over a 12-word vocabulary — hot shingles everywhere, the
    regime the A-prefix must survive). The brute force is the
    inverted-index reference from test_containment_join (ONE
    definition, the cross-import convention). Threshold num/4 sweeps
    0.25..1.0 — τ=1 is the full-containment (subset) regime."""
    from food_panda_etl_spark.operators.containment_join import (
        containment_join,
    )
    from food_panda_etl_spark.operators.dedup import shingle_table
    from tests.test_containment_join import _brute_force

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.doc_a, r.doc_b, r.inter)
        for r in containment_join(
            d, "doc_id", "text", n=3, threshold_num=num, threshold_den=4
        ).collect()
    )
    sh = shingle_table(d, "doc_id", "text", 3)
    want = sorted(
        (r.doc_a, r.doc_b, r.inter)
        for r in _brute_force(sh, num, 4).collect()
    )
    assert got == want
