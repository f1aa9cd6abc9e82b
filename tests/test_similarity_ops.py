"""Approximate-vs-exact contracts for the similarity/dedup scale paths:
LSH top-k recall, LSH near-dup recall+precision, MinHash candidate recall
against exact Jaccard."""

from __future__ import annotations

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.dedup import exact_jaccard_pairs, minhash_lsh_pairs
from food_panda_etl_spark.operators.similarity import (
    brute_force_topk,
    cosine_neardup_pairs,
    lsh_bucket_topk,
    lsh_neardup_pairs,
)
from food_panda_etl_spark.tables import load_table


def test_lsh_topk_recall_vs_brute_force(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = {
        (r["qid"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=10).collect()
    }
    approx = {
        (r["qid"], r["neighbor_id"])
        for r in lsh_bucket_topk(e, q, k=10).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH top-k recall {recall:.2f} too low"


def test_lsh_neardup_recall_and_exactness(spark, sf_dir):
    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(e, threshold=0.4).collect()
    }
    approx = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in lsh_neardup_pairs(e, threshold=0.4).collect()
    }
    # every reported pair is exact-verified (no false positives) and the
    # scores are the same doubles the exact path computes
    for pair, score in approx.items():
        assert pair in exact
        assert score == exact[pair]
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.5, f"LSH near-dup recall {recall:.2f} too low"


def test_embed_neardup_auto_matches_exact_bitwise(spark, sf_dir):
    """The declared q_embed_neardup path must reproduce the exact
    operator's output EXACTLY — same pairs, same score bits — because the
    driver hash-compares it against the all-pairs DuckDB oracle.
    exact_max_rows=0 forces the scale path (triangle block join at
    θ=0.4) even on the 500-row fixture."""
    from food_panda_etl_spark.operators.similarity import embed_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(e, threshold=0.4).collect()
    }
    auto = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embed_neardup_pairs(e, threshold=0.4, exact_max_rows=0).collect()
    }
    assert auto == exact  # full recall AND bit-identical scores


def test_triangle_join_every_block_count(spark, sf_dir):
    """The triangle equi-join must enumerate every unordered pair exactly
    once for ANY block count (same-block pairs only in the diagonal
    bucket) — bit-identical to the exact baseline."""
    from food_panda_etl_spark.operators.similarity import triangle_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings").limit(120)
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(e, threshold=0.35).collect()
    }
    for blocks in (1, 2, 3, 7):
        tri = {
            (r["id_a"], r["id_b"]): r["score"]
            for r in triangle_neardup_pairs(e, threshold=0.35, blocks=blocks).collect()
        }
        assert tri == exact, f"blocks={blocks}"


def test_embed_neardup_lsh_branch_high_threshold(spark, sf_dir):
    """θ>=0.6 routes through banded LSH + verify (incl. the wide >64-plane
    branch at θ=0.9): no false positives, and every surviving pair is in
    the exact set with identical bits."""
    from food_panda_etl_spark.operators.similarity import embed_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings")
    for theta in (0.7, 0.9):
        exact = {
            (r["id_a"], r["id_b"]): r["score"]
            for r in cosine_neardup_pairs(e, threshold=theta).collect()
        }
        got = {
            (r["id_a"], r["id_b"]): r["score"]
            for r in embed_neardup_pairs(e, threshold=theta, exact_max_rows=0).collect()
        }
        assert got == exact  # fixture has no pairs that high — both empty


def test_embed_neardup_small_corpus_guard(spark, sf_dir):
    """Under exact_max_rows the guard must route to the exact operator
    (identical output, no signature work)."""
    from food_panda_etl_spark.operators.similarity import embed_neardup_pairs

    e = load_table(spark, sf_dir, "embeddings").limit(100)
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(e, threshold=0.4).collect()
    }
    auto = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embed_neardup_pairs(e, threshold=0.4, exact_max_rows=256).collect()
    }
    assert auto == exact


def test_auto_band_params_regimes(spark):
    from food_panda_etl_spark.operators.similarity import auto_band_params

    for theta in (0.4, 0.7, 0.9):
        planes, bands = auto_band_params(theta)
        r = planes // bands
        assert planes == r * bands
        # low threshold → narrow bands; high threshold → wide bands
        assert r == {0.4: 2, 0.7: 4, 0.9: 8}[theta]
        assert bands % 4 == 0 and bands <= 128


def test_auto_band_params_threshold_one(spark):
    """Regression (ADVICE r2): threshold=1.0 made p=1 and log(1-p^r) a
    math domain error. The clamp must yield a finite, minimal config."""
    from food_panda_etl_spark.operators.similarity import auto_band_params

    planes, bands = auto_band_params(1.0)
    assert planes > 0 and bands > 0 and planes % bands == 0
    assert bands == 4  # l=1 rounded up to the 4-band chunk minimum


def test_embed_neardup_packed_64plane_fast_path(spark):
    """Direct exercise of the <=64-plane packed-signature branch (ADVICE
    r2: auto-routed thresholds 0.4/0.7/0.9 all pick >64 planes, so the
    XOR-chain first-band dedup was otherwise untested). target_miss=0.5
    at θ=0.9 yields (32 planes, 4 bands) → the packed path; the fixture's
    qualifying pairs are near-identical copies (cos > 0.999, per-band
    collision ≈ 0.96), so with the fixed seed the output must be
    bit-identical to the exact operator."""
    import random

    from food_panda_etl_spark.operators.similarity import (
        auto_band_params,
        embed_neardup_pairs,
    )

    planes, bands = auto_band_params(0.9, target_miss=0.5)
    assert planes <= 64, f"({planes}, {bands}) does not force the packed path"

    rng = random.Random(7)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
        if i < 20:  # near-identical copy: tiny perturbation, cos > 0.999
            rows.append((1000 + i, [x + rng.gauss(0, 0.005) for x in v]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(e, threshold=0.9).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in embed_neardup_pairs(
            e, threshold=0.9, exact_max_rows=0, target_miss=0.5
        ).collect()
    }
    assert len(exact) >= 20  # the 20 planted near-dup pairs are present
    assert got == exact


def test_ivf_topk_recall_vs_brute_force(spark, sf_dir):
    from food_panda_etl_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    exact = {
        (r["qid"], r["neighbor_id"]) for r in brute_force_topk(e, q, k=10).collect()
    }
    got = ivf_topk(e, q, k=10, ncells=16, nprobe=8).collect()
    approx = {(r["qid"], r["neighbor_id"]) for r in got}
    # every query must come back with a full probed result set
    assert len(got) == 5 * 10
    recall = len(exact & approx) / len(exact)
    # The fixture embeddings are isotropic noise (no cluster structure),
    # the worst case for IVF: expected recall ~= probed fraction. Probing
    # half the cells must beat that floor — i.e. the centroid ranking
    # carries signal — and clear 0.5 comfortably on clustered real data.
    assert recall >= 0.5, f"IVF top-k recall {recall:.2f} too low"


def test_rhp_signatures_not_degenerate(spark, sf_dir):
    """Regression: hyperplanes built for the wrong dim null-pad through
    zip_with and every signature collapses to 0 — one bucket, silent full
    cross product. With dim inferred from the data the corpus must spread
    across many buckets."""
    import random

    from food_panda_etl_spark.operators.similarity import _infer_dim, rhp_signature

    e = load_table(spark, sf_dir, "embeddings")
    dim = _infer_dim(e, "embedding")
    assert dim == 64
    rng = random.Random(42)
    planes = [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(12)]
    n_sigs = (
        e.select(rhp_signature(F.col("embedding"), planes).alias("s"))
        .distinct()
        .count()
    )
    assert n_sigs > 10, f"only {n_sigs} distinct signatures — degenerate bucketing"


def test_simhash_vectorized_equals_hof_reference(spark, sf_dir):
    """The Arrow pandas_udf signature stage must be bit-identical to the
    pure-JVM HOF fold it replaced — including null text, empty text, and
    single-token docs."""
    from food_panda_etl_spark.operators.dedup import _simhash_hof, simhash

    d = load_table(spark, sf_dir, "documents")
    extra = spark.createDataFrame(
        [(100001, None), (100002, ""), (100003, "one")],
        "doc_id long, text string",
    )
    d = d.select("doc_id", "text").unionByName(extra)
    fast = {r["doc"]: r["simhash"] for r in simhash(d, "doc_id", "text").collect()}
    ref = {r["doc"]: r["simhash"] for r in _simhash_hof(d, "doc_id", "text").collect()}
    assert fast == ref


def test_short_documents_yield_zero_shingles(spark):
    """Regression (ADVICE r1): sequence(1, 0) is DESCENDING [1, 0], not
    empty, so a doc shorter than n tokens used to abort the whole job with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT under ANSI mode. Short docs must
    contribute zero shingles — and the rest of the pipeline must still run."""
    from food_panda_etl_spark.operators.dedup import minhash_lsh_pairs as mlp
    from food_panda_etl_spark.operators.dedup import shingle_table

    d = spark.createDataFrame(
        [
            (1, "one"),  # 1 token < n
            (2, "two tokens"),  # 2 tokens < n
            (3, ""),  # empty text
            (4, "a b c d e f g h"),
            (5, "a b c d e f g h"),  # exact dup of 4
        ],
        "doc_id int, text string",
    )
    sh = shingle_table(d, "doc_id", "text", n=5)
    per_doc = {r["doc"]: r["n"] for r in sh.groupBy("doc").agg(F.count("*").alias("n")).collect()}
    assert 1 not in per_doc and 2 not in per_doc and 3 not in per_doc
    assert per_doc[4] == 4  # 8 tokens → 4 distinct 5-grams
    pairs = mlp(d, "doc_id", "text", num_hashes=16, bands=8, shingle_n=5, threshold=0.9).collect()
    assert {(r["doc_a"], r["doc_b"]) for r in pairs} == {(4, 5)}


def test_minhash_candidates_cover_exact_jaccard(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"])
        for r in exact_jaccard_pairs(d, "doc_id", "text", n=3, threshold=0.9).collect()
    }
    cand = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            d, "doc_id", "text", num_hashes=32, bands=8, shingle_n=3, threshold=0.7
        ).collect()
    }
    if exact:
        recall = len(exact & cand) / len(exact)
        assert recall >= 0.8, f"MinHash recall {recall:.2f} over {len(exact)} true pairs"


def test_packed_fast_path_at_default_params_theta_0996(spark):
    """VERDICT r3 task 9: the ≤64-plane packed-signature branch at its
    NATURAL operating point — θ=0.996 with the DEFAULT target_miss=1e-5
    (auto_band_params resolves to r=8, 8 bands, 64 planes; the only
    regime the default-parameter router reaches the packed path in).
    Pair-set equality with the exact operator, scores bit-identical."""
    import random

    from food_panda_etl_spark.operators.similarity import (
        auto_band_params,
        banded_neardup_pairs,
    )

    planes, bands = auto_band_params(0.996)  # default target_miss
    assert planes <= 64, f"({planes}, {bands}) does not reach the packed path"

    rng = random.Random(11)
    rows = []
    for i in range(40):
        v = [rng.gauss(0, 1) for _ in range(16)]
        rows.append((i, v))
        if i < 15:  # near-identical copy: cos ≈ 0.99999 > 0.996
            rows.append((1000 + i, [x + rng.gauss(0, 0.005) for x in v]))
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in cosine_neardup_pairs(e, threshold=0.996).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in banded_neardup_pairs(e, threshold=0.996).collect()
    }
    assert len(exact) >= 15  # every planted copy qualifies
    assert got == exact


def test_verified_lsh_pairs_equal_exact(spark, sf_dir):
    """The SCALE pair-generation path (MinHash band candidates + exact
    Jaccard verify on candidates, r=2/b=16) must produce EXACTLY the
    pair set of the inverted-index exact operator on the fixture — the
    property that lets q_dedup_components_lsh share the exact recursive-
    CTE oracle (per-pair candidate miss ≈ 8e-8 at j=0.8)."""
    from food_panda_etl_spark.operators.dedup import verified_jaccard_pairs_lsh

    d = load_table(spark, sf_dir, "documents")
    exact = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in exact_jaccard_pairs(d, "doc_id", "text", n=5, threshold=0.8).collect()
    }
    lsh = {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in verified_jaccard_pairs_lsh(
            d, "doc_id", "text", n=5, threshold=0.8, num_hashes=32, bands=16
        ).collect()
    }
    assert exact, "fixture must contain near-dup pairs"
    assert lsh == exact  # jaccard values bit-identical too (same ratio of ints)


class TestQuantizeInt8:
    def test_error_bound_and_code_range(self, spark, sf_dir):
        from food_panda_etl_spark.operators.similarity import quantize_int8
        from food_panda_etl_spark.tables import load_table
        from pyspark.sql import functions as F

        out = quantize_int8(load_table(spark, sf_dir, "embeddings"))
        bad = out.filter(
            (F.col("max_err") > F.col("scale") / 2 + 1e-15)
            | (F.array_max("codes") > 127)
            | (F.array_min("codes") < -127)
        ).count()
        assert bad == 0

    def test_zero_vector_guard(self, spark):
        from food_panda_etl_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [1.0, -2.0])],
            "vec_id long, embedding array<float>",
        )
        rows = {r.vec_id: r for r in quantize_int8(df).collect()}
        assert rows[1].scale == 0.0 and rows[1].codes == [0, 0]
        assert rows[1].max_err == 0.0
        assert rows[2].codes == [64, -127]  # round(1/(2/127)) = 64

    def test_dequantized_dot_close_to_exact(self, spark):
        # the point of int8 ANN: code_a·code_b·scale_a·scale_b ≈ a·b
        import random

        from food_panda_etl_spark.operators.similarity import quantize_int8

        rng = random.Random(7)
        vecs = [
            (i, [rng.uniform(-1, 1) for _ in range(64)]) for i in range(4)
        ]
        rows = {
            r.vec_id: r
            for r in quantize_int8(
                spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
            ).collect()
        }
        a, b = vecs[0][1], vecs[1][1]
        exact = sum(x * y for x, y in zip(a, b))
        qa, qb = rows[0], rows[1]
        approx = (
            sum(x * y for x, y in zip(qa.codes, qb.codes)) * qa.scale * qb.scale
        )
        # per-element error ≤ scale/2 ⇒ dot error ≤ dim·(εa|b|+εb|a|) ≈ 1e-1
        assert abs(approx - exact) < 0.15

    def test_plan_is_narrow(self, spark, sf_dir):
        from food_panda_etl_spark.plans import plan_summary
        from food_panda_etl_spark.queries import QUERIES

        s = plan_summary(QUERIES["q_quantize_embed"](spark, sf_dir))
        assert s.exchanges == 0
        assert s.broadcast_joins + s.sort_merge_joins + s.nested_loop_joins == 0
