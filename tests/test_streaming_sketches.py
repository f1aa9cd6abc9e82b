"""Mergeable sketches under Structured Streaming (the §2.9 extension
for the r10-r12 sketch family): per-micro-batch PARTIAL sketches
merged into a versioned parquet state via foreachBatch must equal the
batch sketch of the full input — HLL (register max, via `hll_merge`)
and CMS (cell sum, via `cms_merge_groups`) — driven through an actual
availableNow file-source replay. This is the 100 TB ingestion story
the operators' mergeability property tests promise: distinct-users-
per-day and per-user frequency maintained INCREMENTALLY at
sketch-sized state, no reprocessing of prior days, and the trailing-
window answers computed from state alone match the batch analogs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import cms_estimate
from food_panda_etl_spark.operators.cms_windowed import (
    cms_merge_groups,
    cms_sketch_by_group,
)
from food_panda_etl_spark.operators.hll import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)
from food_panda_etl_spark.operators.hll_windowed import hll_merge_groups
from food_panda_etl_spark.streaming import read_events_stream
from food_panda_etl_spark.streaming.runner import EVENTS_STREAM_SCHEMA
from tests.test_streaming import _event, _write_files

W, D = 64, 3


def _keyed(df):
    """(k, day) from raw events — one definition for the streaming
    batches and the batch baseline (the no-drift rule)."""
    return df.select(
        F.col("user_id").alias("k"),
        F.to_date("ts").cast("string").alias("day"),
    ).filter(F.col("k").isNotNull() & F.col("day").isNotNull())


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _run_versioned_merge(spark, out_dir, src, tag, step):
    """The shared foreachBatch versioned-parquet maintenance harness
    (review r13 — the Bloom test had copy-pasted it): replay ``src``
    with availableNow, calling ``step(keyed_events, prev)`` per
    micro-batch — ``prev`` is None on the first batch, else a
    ``name -> DataFrame`` loader over the previous version — and
    writing the returned ``{name: DataFrame}`` as version
    ``v{batch_id}``. Returns a loader over the FINAL version. Timeouts
    fail loudly (the run_available_now convention) instead of reading
    half-written state with a misleading diff."""
    state = os.path.join(out_dir, f"{tag}_state")
    ckpt = os.path.join(out_dir, f"{tag}_ckpt")
    latest = os.path.join(out_dir, f"{tag}_latest.txt")

    def loader(vdir):
        return lambda name: spark.read.parquet(os.path.join(vdir, name))

    def merge_batch(df, batch_id):
        prev = None
        if os.path.exists(latest):
            with open(latest) as f:
                prev = loader(f.read().strip())
        out = step(_keyed(df), prev)
        vdir = os.path.join(state, f"v{batch_id}")
        for name, frame in out.items():
            # overwrite, not error-if-exists: foreachBatch may replay a
            # batch_id after a failure, and an idempotent re-write of
            # the SAME version dir is exactly the exactly-once contract
            frame.write.mode("overwrite").parquet(os.path.join(vdir, name))
        with open(latest, "w") as f:
            f.write(vdir)

    q = (
        read_events_stream(spark, src)
        .writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("availableNow replay exceeded 180 s")
    finally:
        q.stop()
    with open(latest) as f:
        return loader(f.read().strip())


def test_streaming_sketch_state_equals_batch(spark, out_dir):
    """Three micro-batches spanning four days, including re-deliveries
    of users across batches: after the replay, the maintained HLL
    state is register-identical and the CMS state cell-identical to
    sketching ALL events at once, and the trailing-2-day window
    answers derived from state alone (re-bucket + estimate) match the
    batch pipeline."""
    batches = [
        [_event(1, "2024-01-01 10:00:00", user=1),
         _event(2, "2024-01-01 11:00:00", user=2),
         _event(3, "2024-01-02 09:00:00", user=1)],
        [_event(4, "2024-01-02 10:00:00", user=3),
         _event(5, "2024-01-03 10:00:00", user=1),
         _event(6, "2024-01-03 11:00:00", user=1)],
        [_event(7, "2024-01-04 08:00:00", user=4),
         _event(8, "2024-01-04 09:00:00", user=2),
         _event(9, "2024-01-01 23:00:00", user=4)],
    ]
    src = _write_files(out_dir, batches)

    def step(ev, prev):
        part_hll = hll_sketch(ev, "k", group_cols=("day",))
        part_cms = cms_sketch_by_group(
            ev, "k", ("day",), width=W, depth=D
        )
        if prev is not None:
            part_hll = hll_merge(prev("hll"), part_hll, group_cols=("day",))
            part_cms = cms_merge_groups(
                prev("cms"), part_cms, group_cols=("day",), width=W, depth=D
            )
        return {"hll": part_hll, "cms": part_cms}

    final = _run_versioned_merge(spark, out_dir, src, "hllcms", step)
    state_hll = final("hll")
    state_cms = final("cms")

    full = _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    batch_hll = hll_sketch(full, "k", group_cols=("day",))
    batch_cms = cms_sketch_by_group(full, "k", ("day",), width=W, depth=D)
    assert _rows(state_hll, ["day", "reg", "rho"]) == _rows(
        batch_hll, ["day", "reg", "rho"]
    )
    assert _rows(state_cms, ["day", "d", "b", "cnt"]) == _rows(
        batch_cms, ["day", "d", "b", "cnt"]
    )

    # trailing-window answers FROM STATE ONLY == batch pipeline
    win = F.col("day") >= "2024-01-03"
    est_state = hll_estimate(hll_merge_groups(state_hll.filter(win)))
    est_batch = hll_estimate(hll_merge_groups(batch_hll.filter(win)))
    assert est_state.collect() == est_batch.collect()
    probes = spark.range(6).select(F.col("id").alias("k"))
    cms_state_win = cms_merge_groups(
        state_cms.filter(win), width=W, depth=D
    )
    cms_batch_win = cms_merge_groups(
        batch_cms.filter(win), width=W, depth=D
    )
    got = cms_estimate(cms_state_win, probes, "k", width=W, depth=D)
    want = cms_estimate(cms_batch_win, probes, "k", width=W, depth=D)
    assert _rows(got, ["k", "est"]) == _rows(want, ["k", "est"])
    # and the window answer is the REAL trailing count: user 1 has 2
    # events on 2024-01-03 and none on the 4th
    est_map = {r["k"]: r["est"] for r in got.collect()}
    assert est_map[1] >= 2  # CMS one-sided: never under


def test_streaming_bloom_state_equals_batch(spark, out_dir):
    """The membership sibling of the HLL/CMS maintenance above (r13 —
    completes the family symmetry in the STREAMING dimension too):
    per-micro-batch per-day Bloom set-bit relations OR-merged into
    versioned parquet state == the batch sketch of the full input, and
    the trailing-2-day "seen this user recently?" verdicts derived
    from state alone match the batch pipeline AND the ground truth
    (never-miss on present keys; the absent probe's 0 is deterministic
    — same affine bits both paths)."""
    from food_panda_etl_spark.operators.bloom import (
        bloom_merge,
        bloom_merge_groups,
        bloom_probe,
        bloom_sketch,
    )

    m_bits, k_hashes = 4096, 4
    batches = [
        [_event(1, "2024-01-01 10:00:00", user=1),
         _event(2, "2024-01-01 11:00:00", user=2),
         _event(3, "2024-01-02 09:00:00", user=3)],
        [_event(4, "2024-01-03 10:00:00", user=1),
         _event(5, "2024-01-04 08:00:00", user=4),
         _event(6, "2024-01-04 09:00:00", user=2)],
        [_event(7, "2024-01-01 23:00:00", user=4)],
    ]
    src = _write_files(out_dir, batches)

    def step(ev, prev):
        part = bloom_sketch(
            ev, "k", m_bits=m_bits, k_hashes=k_hashes, group_cols=("day",)
        )
        if prev is not None:
            part = bloom_merge(prev("bits"), part, group_cols=("day",))
        return {"bits": part}

    state_bits = _run_versioned_merge(spark, out_dir, src, "bloom", step)(
        "bits"
    )

    full = _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    batch_bits = bloom_sketch(
        full, "k", m_bits=m_bits, k_hashes=k_hashes, group_cols=("day",)
    )
    assert _rows(state_bits, ["day", "j", "b", "set"]) == _rows(
        batch_bits, ["day", "j", "b", "set"]
    )

    # trailing-window membership FROM STATE ONLY == batch == truth:
    # window 2024-01-03..04 contains users {1, 2, 4}; user 3 (day 2
    # only) reads 0 — deterministic affine bits, both paths agree
    win = F.col("day") >= "2024-01-03"
    probes = spark.range(1, 5).select(F.col("id").alias("k"))
    got = bloom_probe(
        bloom_merge_groups(state_bits.filter(win)),
        probes, "k", m_bits=m_bits, k_hashes=k_hashes,
    )
    want = bloom_probe(
        bloom_merge_groups(batch_bits.filter(win)),
        probes, "k", m_bits=m_bits, k_hashes=k_hashes,
    )
    assert _rows(got, ["k", "maybe_present"]) == _rows(
        want, ["k", "maybe_present"]
    )
    verdicts = {r["k"]: r["maybe_present"] for r in got.collect()}
    assert verdicts == {1: 1, 2: 1, 3: 0, 4: 1}


def test_streaming_cms_inner_from_state(spark, out_dir):
    """The CROSS-SKETCH extension (r14): the join-size estimate
    (`operators/cms_inner.py`) answered purely from the incrementally
    maintained per-day CMS state — pick two disjoint day ranges,
    re-bucket each to a flat sketch, inner-product them — equals the
    batch composite on the full input, and never under-estimates the
    EXACT cross-period key join size. This is the join-planning
    primitive running with NO fact rescan: state is ≤ |days|·W·D rows
    regardless of event volume."""
    from food_panda_etl_spark.operators.cms_inner import cms_inner_product

    batches = [
        [_event(1, "2024-01-01 10:00:00", user=1),
         _event(2, "2024-01-01 11:00:00", user=2),
         _event(3, "2024-01-02 09:00:00", user=1)],
        [_event(4, "2024-01-02 10:00:00", user=3),
         _event(5, "2024-01-03 10:00:00", user=1),
         _event(6, "2024-01-03 11:00:00", user=1)],
        [_event(7, "2024-01-04 08:00:00", user=4),
         _event(8, "2024-01-04 09:00:00", user=2),
         _event(9, "2024-01-01 23:00:00", user=4)],
    ]
    src = _write_files(out_dir, batches)

    def step(ev, prev):
        part = cms_sketch_by_group(ev, "k", ("day",), width=W, depth=D)
        if prev is not None:
            part = cms_merge_groups(
                prev("cms"), part, group_cols=("day",), width=W, depth=D
            )
        return {"cms": part}

    state = _run_versioned_merge(spark, out_dir, src, "cmsinner", step)(
        "cms"
    )
    early = F.col("day") <= "2024-01-02"
    late = F.col("day") >= "2024-01-03"
    est_state = cms_inner_product(
        cms_merge_groups(state.filter(early), width=W, depth=D),
        cms_merge_groups(state.filter(late), width=W, depth=D),
    ).collect()[0]["est"]

    full = _keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src))
    batch = cms_sketch_by_group(full, "k", ("day",), width=W, depth=D)
    est_batch = cms_inner_product(
        cms_merge_groups(batch.filter(early), width=W, depth=D),
        cms_merge_groups(batch.filter(late), width=W, depth=D),
    ).collect()[0]["est"]
    assert est_state == est_batch

    # exact cross-period join size: early counts {1:2, 2:1, 3:1, 4:1},
    # late {1:2, 2:1, 4:1} (user 3 never recurs) → sum of products
    # over the SHARED keys {1, 2, 4} = 2·2 + 1·1 + 1·1 = 6
    fa = full.filter(early).groupBy("k").agg(F.count("*").alias("na"))
    fb = full.filter(late).groupBy("k").agg(F.count("*").alias("nb"))
    exact = fa.join(fb, "k").agg(
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("x")
    ).collect()[0]["x"]
    assert exact == 6
    assert est_state >= exact  # one-sided: collisions only add


def test_streaming_decontamination_equals_batch(spark, out_dir):
    """The streaming face of `operators/decontam_bloom.py` (the r14
    build-ahead): the benchmark corpus is STATIC, so its Bloom screen
    is built once and every arriving train micro-batch is screened +
    exact-verified as it lands (contamination is per-document — no
    cross-batch state). The union of the per-batch verdicts must equal
    the batch composite over the full input AND the unscreened exact
    computation — the ingestion-time decontamination gate, versioned
    per batch_id so replays stay idempotent."""
    import json as _json

    from food_panda_etl_spark.operators.decontam_bloom import (
        bloom_screened_contamination,
    )
    from food_panda_etl_spark.operators.dedup import ngram_contamination

    eval_rows = [
        {"doc_id": 1001, "text": "alpha beta gamma delta epsilon zeta"},
        {"doc_id": 1002, "text": "lorem ipsum dolor sit amet consectetur"},
    ]
    batches = [
        [{"doc_id": 1, "text": "x alpha beta gamma delta epsilon y"},
         {"doc_id": 2, "text": "one two three four five six seven"}],
        [{"doc_id": 3, "text": "lorem ipsum dolor sit amet here too"},
         {"doc_id": 4, "text": "clean text with nothing shared at all"}],
        [{"doc_id": 5,
          "text": "alpha beta gamma delta epsilon zeta verbatim quote"}],
    ]
    src = os.path.join(out_dir, "dc_in")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i:03d}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    evals = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for r in eval_rows],
        "doc_id long, text string",
    )
    verdicts = os.path.join(out_dir, "dc_verdicts")

    def screen_batch(df, batch_id):
        out = bloom_screened_contamination(
            df, evals, "doc_id", "text", n=5, m_bits=4096, k_hashes=4
        )
        out.write.mode("overwrite").parquet(
            os.path.join(verdicts, f"v{batch_id}")
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        # one file = one micro-batch — without this, availableNow
        # drains every file in ONE batch and the "union of per-batch
        # verdicts" claim is vacuous (review r17; the
        # read_events_stream default applied to the raw sources)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", os.path.join(out_dir, "dc_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("availableNow replay exceeded 180 s")
    finally:
        q.stop()

    got = _rows(
        spark.read.parquet(os.path.join(verdicts, "v*")),
        ["doc_id", "n_shared"],
    )
    full = spark.createDataFrame(
        [(r["doc_id"], r["text"]) for b in batches for r in b],
        "doc_id long, text string",
    )
    want_screened = _rows(
        bloom_screened_contamination(
            full, evals, "doc_id", "text", n=5, m_bits=4096, k_hashes=4
        ),
        ["doc_id", "n_shared"],
    )
    want_exact = _rows(
        ngram_contamination(full, evals, "doc_id", "text", n=5),
        ["doc_id", "n_shared"],
    )
    assert got == want_screened == want_exact
    # non-vacuous: docs 1, 3, 5 are contaminated, 2 and 4 clean
    assert [d for d, _ in got] == [1, 3, 5]


def test_streaming_incremental_neardup_equals_batch(spark, out_dir):
    """The streaming face of `operators/incremental_neardup.py` (the
    r15 build-ahead): the standing corpus is STATIC state — its
    shingle table and MinHash band index are built ONCE
    (`build_neardup_state`) — and every arriving micro-batch of new
    documents is screened against that state as it lands (near-dup
    verdicts are per batch-doc — no cross-batch state). The union of
    the per-batch pair verdicts must equal the batch composite over
    the full arrival set AND the brute-force cross-side Jaccard —
    the ingestion-time near-dup gate, versioned per batch_id so
    replays stay idempotent."""
    import json as _json

    from food_panda_etl_spark.operators.incremental_neardup import (
        build_neardup_state,
        incremental_neardup_pairs,
    )
    from tests.test_incremental_neardup import _brute_force

    corpus_rows = [
        (101, "alpha beta gamma delta epsilon zeta eta"),
        (102, "lorem ipsum dolor sit amet consectetur adipiscing"),
        (103, "one two three four five six seven eight"),
    ]
    batches = [
        # near-copy of 101 (one appended token → j = 3/4 at 5-grams)
        [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta X"},
         {"doc_id": 2, "text": "totally novel text with no shared grams"}],
        # exact copy of 102
        [{"doc_id": 3, "text": "lorem ipsum dolor sit amet consectetur adipiscing"}],
        [{"doc_id": 4, "text": "another clean document arriving later here"}],
    ]
    src = os.path.join(out_dir, "in_nd")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i:03d}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    # static state, built once, cached across micro-batches — the
    # maintained-state regime the operator exists for
    c_sh, c_bands = build_neardup_state(corpus, "doc_id", "text", n=5)
    c_sh, c_bands = c_sh.cache(), c_bands.cache()
    c_sh.count(), c_bands.count()
    verdicts = os.path.join(out_dir, "nd_verdicts")

    def screen_batch(df, batch_id):
        out = incremental_neardup_pairs(
            None, df, "doc_id", "text", n=5, threshold=0.7,
            corpus_shingles=c_sh, corpus_bands=c_bands,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(verdicts, f"v{batch_id}")
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        # one file = one micro-batch — without this, availableNow
        # drains every file in ONE batch and the "union of per-batch
        # verdicts" claim is vacuous (review r17; the
        # read_events_stream default applied to the raw sources)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", os.path.join(out_dir, "nd_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("availableNow replay exceeded 180 s")
    finally:
        q.stop()
    try:
        got = _rows(
            spark.read.parquet(os.path.join(verdicts, "v*")),
            ["doc_id", "dup_of", "jaccard"],
        )
        full = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for b in batches for r in b],
            "doc_id long, text string",
        )
        want_composite = _rows(
            incremental_neardup_pairs(
                None, full, "doc_id", "text", n=5, threshold=0.7,
                corpus_shingles=c_sh, corpus_bands=c_bands,
            ),
            ["doc_id", "dup_of", "jaccard"],
        )
        want_exact = _rows(
            _brute_force(spark, corpus, full, 0.7, n=5),
            ["doc_id", "dup_of", "jaccard"],
        )
        assert got == want_composite == want_exact
        # non-vacuous: doc 1 near-dups 101 at 3/4, doc 3 dups 102 at 1;
        # docs 2 and 4 are clean
        assert got == [(1, 101, 0.75), (3, 102, 1.0)]
    finally:
        c_sh.unpersist()
        c_bands.unpersist()


def test_streaming_embed_copy_screen_equals_batch(spark, out_dir):
    """The streaming face of `operators/incremental_embed.py` (the r15
    build-ahead): the standing corpus' vector table and sign-LSH band
    index are STATIC state built once; every arriving micro-batch of
    vectors is screened against them as it lands. The union of the
    per-batch pair verdicts must equal the batch composite over the
    full arrival set AND the brute-force cross-side cosine join — the
    ingestion-time copy gate, versioned per batch_id."""
    import json as _json

    from food_panda_etl_spark.operators.incremental_embed import (
        build_embed_state,
        incremental_embed_neardup,
    )
    from food_panda_etl_spark.operators.similarity import cosine

    dim = 8

    def vec(seed, eps=0.0):
        # deterministic unit-ish vectors; eps rotates slightly
        base = [((seed * 31 + j * 7) % 19) - 9 + (eps if j == 0 else 0.0)
                for j in range(dim)]
        return [float(v) for v in base]

    corpus_rows = [(101, vec(1)), (102, vec(2)), (103, vec(3))]
    batches = [
        [{"vec_id": 1, "embedding": vec(1, eps=0.05)},   # near-copy of 101
         {"vec_id": 2, "embedding": vec(4)}],   # cos ≤ 0.36 vs corpus
        [{"vec_id": 3, "embedding": vec(2)}],            # exact copy of 102
        [{"vec_id": 4, "embedding": vec(5)}],  # cos ≤ 0.33 vs corpus
    ]
    src = os.path.join(out_dir, "in_ie")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i:03d}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    corpus = spark.createDataFrame(
        corpus_rows, "vec_id long, embedding array<double>"
    )
    c_vec, c_bands = build_embed_state(corpus, threshold=0.9, dim=dim)
    c_vec, c_bands = c_vec.cache(), c_bands.cache()
    c_vec.count(), c_bands.count()
    verdicts = os.path.join(out_dir, "ie_verdicts")

    def screen_batch(df, batch_id):
        out = incremental_embed_neardup(
            None, df, threshold=0.9, dim=dim,
            corpus_vectors=c_vec, corpus_bands=c_bands,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(verdicts, f"v{batch_id}")
        )

    q = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .json(src)
        .writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", os.path.join(out_dir, "ie_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("availableNow replay exceeded 180 s")
    finally:
        q.stop()
    try:
        got = _rows(
            spark.read.parquet(os.path.join(verdicts, "v*")),
            ["vec_id", "dup_of", "score"],
        )
        full = spark.createDataFrame(
            [(r["vec_id"], r["embedding"]) for b in batches for r in b],
            "vec_id long, embedding array<double>",
        )
        want_composite = _rows(
            incremental_embed_neardup(
                None, full, threshold=0.9, dim=dim,
                corpus_vectors=c_vec, corpus_bands=c_bands,
            ),
            ["vec_id", "dup_of", "score"],
        )
        b = full.select(
            F.col("vec_id").alias("bid"), F.col("embedding").alias("vb")
        )
        c = corpus.select(
            F.col("vec_id").alias("dup_of"), F.col("embedding").alias("vc")
        )
        want_exact = _rows(
            b.crossJoin(c)
            .select(
                F.col("bid").alias("vec_id"),
                "dup_of",
                cosine(F.col("vb"), F.col("vc")).alias("score"),
            )
            .filter(F.col("score") >= 0.9),
            ["vec_id", "dup_of", "score"],
        )
        assert got == want_composite == want_exact
        # non-vacuous: 1 near-copies 101, 3 exactly copies 102; 2, 4 clean
        assert [(v, d) for v, d, _ in got] == [(1, 101), (3, 102)]
        # exact copy: dot(v,v)/(sqrt(n)·sqrt(n)) is 1 up to one ulp of
        # the norm-product rounding — bit-identical across engines, but
        # not the literal 1.0
        assert abs(got[1][2] - 1.0) < 1e-12
    finally:
        c_vec.unpersist()
        c_bands.unpersist()


def test_streaming_incremental_containment_equals_batch(spark, out_dir):
    """The streaming face of `operators/incremental_containment.py`
    (the r16 build-ahead): the standing corpus is STATIC state — its
    shingle index and df table are built ONCE
    (`build_containment_state`) — and every arriving micro-batch of
    new documents is screened for quote/subsumption against that
    state as it lands (verdicts are per batch-doc — no cross-batch
    state). The union of the per-batch verdicts must equal the batch
    composite over the full arrival set AND the brute-force cross-side
    inverted-index join — the ingestion-time containment gate,
    versioned per batch_id so replays stay idempotent."""
    import json as _json

    from food_panda_etl_spark.operators.incremental_containment import (
        build_containment_state,
        incremental_containment_pairs,
    )
    from tests.test_incremental_containment import _brute_force

    corpus_rows = [
        (101, "alpha beta gamma delta epsilon zeta eta theta"),
        (102, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
        (103, "one two three four five six seven eight"),
    ]
    batches = [
        # 6-token prefix quote of 101: both of its 5-gram shingles sit
        # in 101 → containment 1
        [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta"},
         {"doc_id": 2, "text": "totally novel text with no shared grams"}],
        # full quote of 102
        [{"doc_id": 3,
          "text": "lorem ipsum dolor sit amet consectetur adipiscing elit"}],
        [{"doc_id": 4, "text": "another clean document arriving later here"}],
    ]
    src = os.path.join(out_dir, "in_ic")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i:03d}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    c_sh, c_df = build_containment_state(corpus, "doc_id", "text", n=5)
    c_sh, c_df = c_sh.cache(), c_df.cache()
    c_sh.count(), c_df.count()
    verdicts = os.path.join(out_dir, "ic_verdicts")

    def screen_batch(df, batch_id):
        out = incremental_containment_pairs(
            None, df, "doc_id", "text", n=5,
            threshold_num=4, threshold_den=5,
            corpus_shingles=c_sh, corpus_df=c_df,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(verdicts, f"v{batch_id}")
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        # one file = one micro-batch — without this, availableNow
        # drains every file in ONE batch and the "union of per-batch
        # verdicts" claim is vacuous (review r17; the
        # read_events_stream default applied to the raw sources)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", os.path.join(out_dir, "ic_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("availableNow replay exceeded 180 s")
    finally:
        q.stop()
    try:
        got = _rows(
            spark.read.parquet(os.path.join(verdicts, "v*")),
            ["doc_id", "contained_in", "inter", "containment"],
        )
        full = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for b in batches for r in b],
            "doc_id long, text string",
        )
        want_composite = _rows(
            incremental_containment_pairs(
                None, full, "doc_id", "text", n=5,
                threshold_num=4, threshold_den=5,
                corpus_shingles=c_sh, corpus_df=c_df,
            ),
            ["doc_id", "contained_in", "inter", "containment"],
        )
        assert got == want_composite
        want_exact = _rows(
            _brute_force(corpus, full, 4, 5),
            ["doc_id", "contained_in", "inter"],
        )
        assert [(a, b, i) for a, b, i, _ in got] == want_exact
        # non-vacuous: doc 1 is a prefix quote of 101 (2/2 shingles),
        # doc 3 a full quote of 102 (4/4); docs 2 and 4 are clean
        assert got == [(1, 101, 2, 1.0), (3, 102, 4, 1.0)]
    finally:
        c_sh.unpersist()
        c_df.unpersist()


def test_streaming_incremental_icws_equals_batch(spark, out_dir):
    """The streaming face of `operators/incremental_icws.py` (the r17
    build-ahead): the standing corpus is STATIC state — its counted
    shingle table and ICWS band index are built ONCE
    (`build_icws_state`) — and every arriving micro-batch of new
    documents is screened for TF-weighted near-duplication against
    that state as it lands (verdicts are per batch-doc — no
    cross-batch state). The union of the per-batch verdicts must equal
    the batch composite over the full arrival set AND the brute-force
    cross-side count-join — the ingestion-time shape gate, versioned
    per batch_id so replays stay idempotent."""
    import json as _json

    from food_panda_etl_spark.operators.incremental_icws import (
        build_icws_state,
        incremental_icws_pairs,
    )
    from tests.test_incremental_icws import _brute_force as _bf_icws

    corpus_rows = [
        (101, "alpha beta gamma delta epsilon zeta eta theta"),
        (102, "lorem ipsum dolor sit amet consectetur adipiscing elit"),
        (103, "one two three four five six seven eight"),
    ]
    batches = [
        # 7-token prefix of 101: 5 of its 6 trigrams shared, counts all
        # 1 → wi = 25, J_tf = 25/35 ≈ 0.714 ≥ 7/10 (integer compare
        # 425 ≥ 420 — a just-over-the-bar pair, deliberately)
        [{"doc_id": 1, "text": "alpha beta gamma delta epsilon zeta eta"},
         {"doc_id": 2, "text": "totally novel text with no shared grams"}],
        # full copy of 102 → J_tf = 1
        [{"doc_id": 3,
          "text": "lorem ipsum dolor sit amet consectetur adipiscing elit"}],
        [{"doc_id": 4, "text": "another clean document arriving later here"}],
    ]
    src = os.path.join(out_dir, "in_ii")
    os.makedirs(src, exist_ok=True)
    for i, rows in enumerate(batches):
        p = os.path.join(src, f"b{i:03d}.jsonl")
        with open(p, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")
        os.utime(p, (1_700_000_000 + i, 1_700_000_000 + i))

    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    c_cnt, c_idx = build_icws_state(corpus, "doc_id", "text", n=3)
    c_cnt, c_idx = c_cnt.cache(), c_idx.cache()
    c_cnt.count(), c_idx.count()
    verdicts = os.path.join(out_dir, "ii_verdicts")

    def screen_batch(df, batch_id):
        out = incremental_icws_pairs(
            None, df, "doc_id", "text", n=3,
            threshold_num=7, threshold_den=10,
            corpus_counts=c_cnt, corpus_bands=c_idx,
        )
        out.write.mode("overwrite").parquet(
            os.path.join(verdicts, f"v{batch_id}")
        )

    q = (
        spark.readStream.schema("doc_id long, text string")
        # one file = one micro-batch — without this, availableNow
        # drains every file in ONE batch and the "union of per-batch
        # verdicts" claim is vacuous (review r17; the
        # read_events_stream default applied to the raw sources)
        .option("maxFilesPerTrigger", 1)
        .json(src)
        .writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", os.path.join(out_dir, "ii_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(180):
            raise TimeoutError("availableNow replay exceeded 180 s")
    finally:
        q.stop()
    try:
        got = _rows(
            spark.read.parquet(os.path.join(verdicts, "v*")),
            ["doc_id", "dup_of", "wi_scaled", "tf_jaccard"],
        )
        full = spark.createDataFrame(
            [(r["doc_id"], r["text"]) for b in batches for r in b],
            "doc_id long, text string",
        )
        want_composite = _rows(
            incremental_icws_pairs(
                None, full, "doc_id", "text", n=3,
                threshold_num=7, threshold_den=10,
                corpus_counts=c_cnt, corpus_bands=c_idx,
            ),
            ["doc_id", "dup_of", "wi_scaled", "tf_jaccard"],
        )
        assert got == want_composite
        want_exact = _rows(
            _bf_icws(corpus, full).select(
                F.col("doc_a").alias("doc_id"),
                F.col("doc_b").alias("dup_of"),
                "wi_scaled",
                "tf_jaccard",
            ),
            ["doc_id", "dup_of", "wi_scaled", "tf_jaccard"],
        )
        assert got == want_exact
        # non-vacuous: doc 1 is the just-over-the-bar prefix pair of
        # 101, doc 3 the exact copy of 102; docs 2 and 4 are clean
        assert [(a, b) for a, b, _, _ in got] == [(1, 101), (3, 102)]
        assert got[1][3] == 1.0
    finally:
        c_cnt.unpersist()
        c_idx.unpersist()


def test_streaming_sample_state_equals_batch(spark, out_dir):
    """The SAMPLING family's streamed state maintenance (the r17
    build-ahead faces composed): a per-(day, cohort) weighted
    bottom-k sample maintained across micro-batches via
    `incremental_group_priority_sample` — re-delivered (day, user)
    rows anti-joined away first, the batch sampler's documented
    over-SETS merge contract — must equal sampling ALL events at once,
    and the trailing-2-day per-cohort answer derived FROM STATE ALONE
    (`group_priority_rebucket` across the dropped day) must match the
    batch pipeline. Sample state is ≤ days·cohorts·k rows — the
    sketch-state regime applied to rows."""
    from food_panda_etl_spark.operators.sampling_group import (
        group_priority_sample,
    )
    from food_panda_etl_spark.operators.sampling_incremental import (
        group_priority_rebucket,
        incremental_group_priority_sample,
    )

    k = 2
    batches = [
        [_event(1, "2024-01-01 10:00:00", user=1),
         _event(2, "2024-01-01 11:00:00", user=2),
         _event(3, "2024-01-02 09:00:00", user=1)],
        [_event(4, "2024-01-02 10:00:00", user=3),
         _event(5, "2024-01-03 10:00:00", user=1),
         _event(6, "2024-01-03 11:00:00", user=4)],
        [_event(7, "2024-01-04 08:00:00", user=4),
         _event(8, "2024-01-04 09:00:00", user=2),
         # re-delivery of (2024-01-01, user=1) — must not double-rank
         _event(9, "2024-01-01 23:00:00", user=1),
         _event(10, "2024-01-03 12:00:00", user=6)],
    ]
    src = _write_files(out_dir, batches)

    def rows_of(ev):
        return ev.select(
            "day",
            F.pmod(F.col("k"), F.lit(2)).cast("string").alias("g"),
            F.col("k").alias("uid"),
            (F.pmod(F.col("k"), F.lit(10)) + 1).alias("w"),
        ).dropDuplicates(["day", "g", "uid"])

    def step(ev, prev):
        rows = rows_of(ev)
        if prev is None:
            part = group_priority_sample(
                rows, ("day", "g"), "w", k, id_col="uid"
            )
        else:
            state = prev("sample")
            fresh = rows.join(
                state.select("day", "g", "uid"), ["day", "g", "uid"], "anti"
            )
            part = incremental_group_priority_sample(
                state, fresh, ("day", "g"), "w", k, id_col="uid"
            )
        return {"sample": part}

    final = _run_versioned_merge(spark, out_dir, src, "sample", step)
    state = final("sample")

    full = rows_of(_keyed(spark.read.schema(EVENTS_STREAM_SCHEMA).json(src)))
    want = group_priority_sample(full, ("day", "g"), "w", k, id_col="uid")
    cols = ["day", "g", "uid", "weight", "priority", "rk"]
    assert _rows(state, cols) == _rows(want, cols)

    # trailing-window answer FROM STATE ONLY == batch pipeline
    win = F.col("day") >= "2024-01-03"
    got_win = group_priority_rebucket(
        state.filter(win), ("g",), k, id_col="uid"
    )
    want_win = group_priority_sample(
        full.filter(win), ("g",), "w", k, id_col="uid"
    )
    wcols = ["g", "uid", "weight", "priority", "rk"]
    assert _rows(got_win, wcols) == _rows(want_win, wcols)
    assert got_win.count() > 0
