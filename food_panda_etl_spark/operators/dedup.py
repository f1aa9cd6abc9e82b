"""Near-duplicate detection operators (SURVEY.md §2.10): MinHash+LSH,
SimHash, exact n-gram Jaccard. All built from DataFrame primitives —
xxhash64 / transform / aggregate stay JVM-side; the only shuffles are the
per-doc signature aggregation and the LSH bucket join.

Scale shape (100 TB corpus):
- shingling is a narrow map (explode before the shuffle);
- MinHash signatures: one hash-partitioned aggregate on doc_id;
- candidate generation: equi-join on (band_id, band_hash) — band buckets
  are small by construction, and AQE skew-split handles hot buckets
  (e.g. boilerplate-heavy shingles never form a bucket key because the
  bucket key is the *signature band*, not the shingle).
"""

from __future__ import annotations

import pandas as pd  # module level: pandas_udf type hints resolve via globals
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# Mersenne prime 2^61-1: standard universal-hash modulus; products of
# (a < 2^31) * (h mod p < 2^61) would overflow — so we pre-fold xxhash64
# into [0, 2^31) and keep all arithmetic < 2^62.
_P = (1 << 31) - 1  # 2^31-1, also prime


def _grams(toks, n: int):
    """ALL word n-grams of a token-array column, in order, WITH
    duplicates — the package's ONE gram-construction definition
    (:func:`_shingles` is its distinct collapse;
    `operators/weighted_jaccard.py::shingle_multiset_table` counts it —
    the r15 consolidation that retired that module's mirrored copy).
    ``toks`` must be a plain column reference (pre-materialized array),
    NOT a split() expression — a non-trivial expression captured inside
    the transform lambda is re-evaluated per element, turning shingling
    quadratic."""
    k = F.size(toks) - (n - 1)
    # sequence(1, 0) is DESCENDING [1, 0] (not empty!), and element_at(0)
    # throws under ANSI — so a doc shorter than n tokens must yield an
    # explicitly empty index array, not sequence-to-zero.
    idx = F.when(k >= 1, F.sequence(F.lit(1), k)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j).cast("int")) for j in range(n)]
        ),
    )


def _shingles(toks, n: int):
    """Distinct word n-gram shingles — the set collapse of :func:`_grams`."""
    return F.array_distinct(_grams(toks, n))


def tokenized(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, __toks) — whitespace tokenization behind the
    repartition-first parallelism pattern: a document corpus often
    arrives as few parquet splits, and without the exchange every
    downstream shingle/hash cycle runs on as many cores as there were
    input files (observed: the whole MinHash pipeline on 1 of 32
    cores). One narrow-row shuffle of (id, text) buys full-width
    parallelism for the expensive part."""
    par = df.sparkSession.sparkContext.defaultParallelism
    return (
        df.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__text"))
        .repartition(par, "doc")  # exchange raw text, tokenize post-shuffle
        .select("doc", F.split(F.col("__text"), " ").alias("__toks"))
    )


def gram_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    *,
    distinct: bool = True,
) -> DataFrame:
    """(doc, shingle) word n-gram rows — the ONE tokenization
    definition every shingle consumer builds on (prefix/overlap joins,
    decontamination, the weighted-Jaccard multiset). ``distinct=True``
    yields each document's shingle SET (:func:`shingle_table`);
    ``distinct=False`` keeps multiplicities, one row per occurrence."""
    toks = tokenized(df, id_col, text_col)
    gram = (_shingles if distinct else _grams)(F.col("__toks"), n)
    return toks.select("doc", F.explode(gram).alias("shingle")).filter(
        F.col("shingle") != ""
    )


def shingle_table(df: DataFrame, id_col: str, text_col: str, n: int = 5) -> DataFrame:
    """(id, shingle) pairs, distinct per document."""
    return gram_table(df, id_col, text_col, n, distinct=True)


def exact_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs: shingle inverted-index
    self-join → intersection counts → |A∩B| / (|A|+|B|-|A∩B|).
    Exact but O(sum of per-shingle doc-frequency²) — the right tool when
    shingle frequencies are bounded; MinHash+LSH when they are not.

    Shared intermediates use ``localCheckpoint(eager=False)`` instead of
    ``cache()`` (ADVICE r4): a ``.cache()`` registers in the
    CacheManager and lives until an explicit unpersist — but these
    operators return LAZY frames, so there is no safe place to unpersist
    inside the operator, and a driver run that builds many of them
    accumulates cached shingle/signature tables. A local checkpoint
    stores the same blocks, is materialized once by the first action,
    and is released by the ContextCleaner when the returned frame is
    garbage-collected — no manual cleanup, no accumulation."""
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .agg(F.count("*").alias("inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_from_shingles(
    sh: DataFrame,
    num_hashes: int = 32,
    seed: int = 42,
    element_cols: tuple[str, ...] = ("shingle",),
) -> DataFrame:
    """Per-doc MinHash signature (columns m0..m{k-1}) from an existing
    (doc, element) table — the shared core of :func:`minhash_signatures`,
    :func:`verified_jaccard_pairs_lsh`, the cross-side incremental path
    (`operators/incremental_neardup.py`), and the occurrence-expanded
    weighted path (`operators/weighted_minhash.py`, which hashes the
    struct fields via ``element_cols``) — so every consumer hashes with
    the SAME seeded coefficient family and signatures built on
    different sides of a join are comparable.

    h_i(s) = (a_i * x + b_i) mod 2^31-1 over x = xxhash64(*element_cols)
    folded into [0, 2^31); signature component i = min over the doc's
    elements. The min-aggregation is one hash aggregate — associative,
    map-side combinable, order-independent: deterministic at any
    parallelism."""
    import random

    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(num_hashes)]
    # Explode + hash + groupBy(min) deliberately: the exploded pipeline is
    # whole-stage-codegen (xxhash + k linear hashes compile to tight JVM
    # loops), and partial aggregation collapses each doc's rows BEFORE the
    # exchange, so the shuffle carries one k-column row per doc. A per-row
    # array_min(transform(...)) formulation avoids the shuffle but runs
    # interpreted (HOF lambdas don't codegen) — measured 3-4x slower.
    x = F.pmod(F.xxhash64(*element_cols), F.lit(_P))
    hashed = sh.select(
        "doc",
        *[
            ((F.lit(a) * x + F.lit(b)) % _P).alias(f"h{i}")
            for i, (a, b) in enumerate(coeffs)
        ],
    )
    return hashed.groupBy("doc").agg(
        *[F.min(f"h{i}").alias(f"m{i}") for i in range(num_hashes)]
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """Per-doc MinHash signature as `num_hashes` columns m0..m{k-1} —
    :func:`minhash_from_shingles` over the document's distinct word
    n-gram shingle set."""
    return minhash_from_shingles(
        shingle_table(df, id_col, text_col, shingle_n), num_hashes, seed
    )


def band_rows(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(doc, band, bh) — the banded-signature index rows: signature
    split into `bands` bands of r = num_hashes/bands components, each
    band folded to one 64-bit hash. The join key of every LSH scheme
    here (self-join in :func:`_band_candidates`, cross-side probe in
    `operators/incremental_neardup.py`); only (doc, band, hash)
    triples ever cross a shuffle, never signatures."""
    r = num_hashes // bands
    return sig.select(
        "doc",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(*[f"m{bi * r + j}" for j in range(r)]).alias("bh"),
                    )
                    for bi in range(bands)
                ]
            )
        ).alias("b"),
    ).select("doc", "b.band", "b.bh")


def _band_candidates(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Distinct candidate pairs (doc_a < doc_b) colliding on ≥1 signature
    band. The join is a plain equi-join on (band, band_hash) — band
    buckets are small by construction and AQE skew-split handles hot ones."""
    rows = band_rows(sig, num_hashes, bands)
    l, rt = rows.alias("l"), rows.alias("r")
    return (
        l.join(
            rt,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(F.col("l.doc").alias("doc_a"), F.col("r.doc").alias("doc_b"))
        .distinct()
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
    threshold: float = 0.7,
    seed: int = 42,
) -> DataFrame:
    """MinHash + banded LSH candidate pairs with estimated Jaccard.

    Signature split into `bands` bands of r = num_hashes/bands rows; docs
    colliding on any full band become candidates (p(collide) = 1-(1-j^r)^b).
    Estimated similarity = fraction of matching signature components.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    # lazy localCheckpoint, not cache(): see exact_jaccard_pairs
    sig = minhash_signatures(
        df, id_col, text_col, num_hashes, shingle_n, seed
    ).localCheckpoint(eager=False)
    cand = _band_candidates(sig, num_hashes, bands)
    sa = sig.select(F.col("doc").alias("doc_a"), *[F.col(f"m{i}").alias(f"a{i}") for i in range(num_hashes)])
    sb = sig.select(F.col("doc").alias("doc_b"), *[F.col(f"m{i}").alias(f"b{i}") for i in range(num_hashes)])
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(num_hashes)
    )
    est = (matches / F.lit(float(num_hashes))).alias("est_jaccard")
    return (
        cand.join(sa, "doc_a").join(sb, "doc_b")
        .select("doc_a", "doc_b", est)
        .filter(F.col("est_jaccard") >= threshold)
    )


def verified_jaccard_pairs_lsh(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
    seed: int = 42,
) -> DataFrame:
    """The SCALE path to an exact-Jaccard pair graph: MinHash band
    candidates → TRUE Jaccard verification on candidates only.

    ``exact_jaccard_pairs`` self-joins the full shingle inverted index —
    O(Σ per-shingle df²), quadratic in boilerplate-heavy corpora. Here
    pair generation is the banded signature equi-join (linear in corpus +
    collisions) and the expensive exact intersection runs ONLY on
    candidate pairs, each verified with its real shingle sets — so every
    emitted pair carries the exact Jaccard, not an estimate.

    Band geometry is chosen for candidate RECALL at the verify threshold:
    with r = num_hashes/bands rows per band, a true pair at similarity j
    is missed with probability (1-j^r)^bands — the default r=2, b=16
    gives (1-0.64)^16 ≈ 8e-8 at j=0.8, i.e. the verified pair set equals
    the exact pair set up to that probability (asserted exactly on the
    fixtures in tests). Verification cost scales with candidate count,
    which the banding keeps near-linear.
    """
    if num_hashes % bands:
        raise ValueError("num_hashes must be divisible by bands")
    # lazy localCheckpoint, not cache(): the shingle table is the LARGE
    # object on this declared 100 TB route — see exact_jaccard_pairs
    sh = shingle_table(df, id_col, text_col, n).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    # Signatures from the SAME shingle set the verify step uses (n-gram,
    # not the default 3-gram) so banding probability math applies to the
    # similarity actually being thresholded.
    sig = minhash_from_shingles(sh, num_hashes, seed)
    cand = _band_candidates(sig, num_hashes, bands)
    # Exact verify, candidate-bounded: |A∩B| per candidate pair via two
    # shingle joins (cand ⋈ sh_a ⋈ sh_b on equal shingle) — cost ~ Σ over
    # candidates of |A|, not Σ over shingles of df².
    sa, sb = sh.alias("sa"), sh.alias("sb")
    inter = (
        cand.join(sa, cand["doc_a"] == F.col("sa.doc"))
        .join(
            sb,
            (cand["doc_b"] == F.col("sb.doc"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("inter"))
    )
    za = sizes.select(F.col("doc").alias("doc_a"), F.col("n_sh").alias("n_a"))
    zb = sizes.select(F.col("doc").alias("doc_b"), F.col("n_sh").alias("n_b"))
    jac = F.col("inter").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("inter")
    ).cast("double")
    return (
        inter.join(za, "doc_a")
        .join(zb, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash per document: per-token xxhash64 (JVM, codegen);
    each output bit is the sign of the sum over tokens of (+1/-1) for that
    bit position.

    The bit-counting stage is an Arrow-batched pandas_udf over the
    JVM-computed hash arrays: one (tokens x 64) sign matrix per batch,
    segment-reduced with np.add.reduceat — replaces the interpreted
    64-slot zip_with fold that was the single costliest op in the round-1
    bench (2.1 s -> sub-second at sf0.1). Token hashing stays JVM-side so
    signatures are bit-identical to the HOF reference implementation
    (asserted in tests); only per-row arithmetic crosses to Python, Arrow
    both ways, no shuffle at all.

    Like shingle_table, repartitions on the id first: a single-split
    parquet corpus would otherwise run the whole stage on one core."""
    from pyspark.sql.functions import pandas_udf

    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.select(F.col(id_col).alias(id_col), F.col(text_col)).repartition(
        par, id_col
    )
    toks = F.split(F.col(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    @pandas_udf("long")
    def _pack_signature(hs: pd.Series) -> pd.Series:
        import numpy as np

        n = len(hs)
        out = np.zeros(n, dtype=np.uint64)
        # null text -> null hash array -> signature 0, matching the HOF
        # fold (its null when-condition falls through to otherwise(0))
        lens = np.fromiter(
            (0 if x is None else len(x) for x in hs), dtype=np.int64, count=n
        )
        nz = np.flatnonzero(lens)  # docs with >=1 token
        if nz.size:
            flat = np.concatenate([np.asarray(hs.iloc[i], dtype=np.int64) for i in nz])
            bits = (
                (flat.view(np.uint64)[:, None] >> np.arange(64, dtype=np.uint64)) & 1
            ).astype(np.int64)
            signs = 2 * bits - 1  # (tokens x 64) in doc order
            offsets = np.zeros(nz.size, dtype=np.int64)
            np.cumsum(lens[nz][:-1], out=offsets[1:])
            counters = np.add.reduceat(signs, offsets, axis=0)  # (docs x 64)
            powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
            out[nz] = (counters > 0).astype(np.uint64) @ powers
        return pd.Series(out.view(np.int64))

    return df.select(
        F.col(id_col).alias("doc"), _pack_signature(hashes).alias("simhash")
    )


def _simhash_hof(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Reference implementation of :func:`simhash` as a pure JVM
    higher-order-function fold — interpreted (HOF lambdas don't codegen),
    ~2x slower, kept as the equality oracle for the vectorized path."""
    par = df.sparkSession.sparkContext.defaultParallelism
    df = df.select(F.col(id_col).alias(id_col), F.col(text_col)).repartition(
        par, id_col
    )
    toks = F.split(F.col(text_col), " ")
    hashes = F.transform(toks, lambda t: F.xxhash64(t))

    def bit_signs(h):
        # +1/-1 per bit position; literal shift amounts (unrolled python
        # loop — shiftright takes a plain int, not a Column).
        return F.array(
            *[
                F.when(
                    F.shiftright(h, i).bitwiseAND(F.lit(1).cast("long")) == 1,
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(-1).cast("long"))
                for i in range(64)
            ]
        )

    counters = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(acc, bit_signs(h), lambda a, b: a + b),
    )
    # materialize counters once, then pack sign bits into a long
    with_counters = df.select(F.col(id_col).alias("doc"), counters.alias("__c"))
    sim = F.lit(0).cast("long")
    for i in range(64):
        sim = sim.bitwiseOR(
            F.when(
                F.element_at("__c", i + 1) > 0,
                F.shiftleft(F.lit(1).cast("long"), i),
            ).otherwise(F.lit(0).cast("long"))
        )
    return with_counters.select("doc", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """SimHash near-dup pairs: band the 64-bit hash into 4×16-bit chunks —
    any pair within hamming distance 3 must agree on ≥1 chunk (pigeonhole)
    — equi-join on (chunk_id, chunk_value), then exact hamming filter via
    bit_count(xor)."""
    # lazy localCheckpoint, not cache(): see exact_jaccard_pairs
    sig = simhash(df, id_col, text_col).localCheckpoint(eager=False)
    chunks = sig.select(
        "doc",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk"),
                        F.shiftright("simhash", 16 * i)
                        .bitwiseAND(F.lit(0xFFFF).cast("long"))
                        .alias("cv"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc", "simhash", "c.chunk", "c.cv")
    l, r = chunks.alias("l"), chunks.alias("r")
    ham = F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash")))
    return (
        l.join(
            r,
            (F.col("l.chunk") == F.col("r.chunk"))
            & (F.col("l.cv") == F.col("r.cv"))
            & (F.col("l.doc") < F.col("r.doc")),
        )
        .select(
            F.col("l.doc").alias("doc_a"),
            F.col("r.doc").alias("doc_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def ngram_contamination(
    train: DataFrame,
    evals: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
) -> DataFrame:
    """Train/eval decontamination flags (the PaLM/GPT-style benchmark-
    overlap check): every training document sharing at least one word
    ``n``-gram with ANY eval document, with the count of distinct shared
    shingles. Returns (``id_col``, ``n_shared``) for flagged docs only.

    Scale shape: two shingle projections (narrow), then ONE equi-join on
    the shingle keyed by the broadcast-able eval side — the eval corpus
    is benchmarks (MBs), the train corpus is the 100 TB side, and unlike
    the dedup self-join there is no df² term: each train shingle meets
    only the eval shingle set. Counting after a distinct per-doc shingle
    projection makes ``n_shared`` the exact distinct-overlap size."""
    tr = shingle_table(train, id_col, text_col, n=n)
    ev = shingle_table(evals, id_col, text_col, n=n).select("shingle").distinct()
    return (
        tr.join(F.broadcast(ev), "shingle")
        .groupBy("doc")
        .agg(F.count("*").alias("n_shared"))
        .select(F.col("doc").alias(id_col), "n_shared")
    )


def duplicated_substring_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Substring-level exact dedup (Lee et al., arXiv:2107.06499): the
    maximal token spans of each document that are covered by word
    ``n``-grams appearing in at least ``min_docs`` DISTINCT documents.
    Doc-level dedup (`q_dedup`) and decontamination (`ngram_contamination`)
    miss repeated PASSAGES inside otherwise-distinct documents —
    boilerplate headers, licence blocks, templated paragraphs — which is
    exactly what LM memorization studies find gets regurgitated. Returns
    (``id_col``, span_start, span_end, span_tokens): 0-based token
    offsets, end exclusive, one row per maximal duplicated extent, ready
    to cut out with `slice()`.

    Spark-first shape (NOT the paper's suffix array — that is a
    single-machine construction): positioned n-gram hash buckets + a
    gaps-and-islands extent merge.
    1. One narrow projection explodes (doc, pos, gram) and immediately
       folds the gram to TWO independent xxhash64 keys — the n-token
       payload never crosses a shuffle, only 16 bytes/shingle (the
       q_dedup / q_incremental_dedup convention; a simultaneous 128-bit
       collision is ~2^-64 per pair, far below any corpus scale).
    2. Bucket on (h1, h2), keep buckets spanning >= min_docs distinct
       docs — one fact-wide hash aggregation, the operator's only
       unavoidable big shuffle (the paper's suffix-array sort plays the
       same role at the same cost class).
    3. Semi-join positions back (shingle table checkpointed once for
       its two consumers) and merge overlapping-or-touching extents
       [pos, pos+n) with a lag/running-sum window PARTITIONED BY doc —
       per-document state only, no global window, scale-free.

    Shared-span growth is near-linear in corpus size (duplicated-bucket
    mass scales with the injected duplication rate, not the pair count)
    — measured in `bench_scale.py`.
    """
    toks = tokenized(df, id_col, text_col)
    k = F.size(F.col("__toks")) - (n - 1)
    # 0-based start positions; explicit empty for short docs (the
    # sequence(1, 0)-descends trap, see _shingles)
    idx = F.when(k >= 1, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    gram_at = lambda i: F.concat_ws(  # noqa: E731
        " ",
        *[F.element_at(F.col("__toks"), (i + j + 1).cast("int")) for j in range(n)],
    )
    pos_gram = F.transform(
        idx, lambda i: F.struct(i.alias("pos"), gram_at(i).alias("g"))
    )
    sh = (
        toks.select("doc", F.explode(pos_gram).alias("__pg"))
        .select(
            "doc",
            F.col("__pg.pos").alias("pos"),
            F.xxhash64(F.col("__pg.g")).alias("__h1"),
            F.xxhash64(F.lit(982451653), F.col("__pg.g")).alias("__h2"),
        )
        .localCheckpoint(eager=False)  # two consumers: buckets + probe
    )
    dup = (
        sh.groupBy("__h1", "__h2")
        .agg(F.count_distinct("doc").alias("__nd"))
        .filter(F.col("__nd") >= min_docs)
        .select("__h1", "__h2")
    )
    hits = sh.join(dup, ["__h1", "__h2"], "semi").select("doc", "pos")
    w = Window.partitionBy("doc").orderBy("pos")
    prev = F.lag("pos").over(w)
    brk = (prev.isNull() | (F.col("pos") > prev + n)).cast("int")
    grp = F.sum(brk).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        hits.withColumn("__grp", grp)
        .groupBy("doc", "__grp")
        .agg(
            F.min("pos").cast("int").alias("span_start"),
            (F.max("pos") + n).cast("int").alias("span_end"),
        )
        .select(
            F.col("doc").alias(id_col),
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        )
    )
