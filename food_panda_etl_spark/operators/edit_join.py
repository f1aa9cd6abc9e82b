"""Edit-distance (Levenshtein) similarity self-join — the string
member of the prefix-filtering family (`prefix_join.py` relative
Jaccard, `overlap_join.py` absolute overlap, `weighted_jaccard.py`
multiset Jaccard, THIS bounded edit distance). The fuzzy-match
workhorse for titles / names / URLs / short fields where token-level
Jaccard is too coarse: find every pair within ``k`` character edits,
exactly.

Theory (Gravano et al., VLDB 2001 q-gram filters; Xiao-Wang-Lin
Ed-Join, VLDB 2008): one character edit changes at most ``q`` of a
string's q-grams, so ED(a, b) ≤ k implies the q-gram MULTISETS
overlap in ≥ max(n_a, n_b) − k·q elements (n = len − q + 1), and
lengths differ by ≤ k. Under the occurrence-indexed expansion
(`weighted_jaccard.occurrence_expand` — multiset overlap IS set
overlap of the expansion) the standard prefix lemma then says a
qualifying pair must share an element among the first k·q + 1 of each
side's expanded q-grams in ONE global canonical order — a CONSTANT
prefix length, the Ed-Join signature. So candidate generation is the
existing machinery verbatim: counted q-grams → occurrence expansion →
`prefix_join.ranked_shingles` (df ASC, element ASC — rarest first) →
keep ``__pos ≤ k·q + 1`` → prefix×prefix equi-join + integer length
filter; the verify is one `F.levenshtein` per candidate — and Spark's
and DuckDB's levenshtein are the same classic unit-cost DP over
characters, so the declared query's integer distances hash-match the
brute-force SQL exactly (the completeness theorem, machine-checked).

Short strings are the one regime the count bound cannot prune: when
n ≤ k·q (len ≤ k·q + q − 1) a pair may be within k edits while
sharing ZERO q-grams ("ab" vs "cd" at k=2). Those rows are split into
a short bucket joined on an exploded length key (each short string
probes the 2k+1 lengths in its window — a plain equi-join the planner
can hash OR shuffle), broadcast only while the bucket is provably
small (``short_broadcast_rows``): on a corpus dominated by short
strings (names, codes) the bucket is NOT a sliver, and an
unconditional broadcast would blow the driver — the guard lets the
planner fall back to a shuffle join instead (ADVICE r16). Exactness
over arbitrary inputs is property-tested in both regimes.

Scale: ONE q-gram pass, the constant-length prefix keeps the
candidate join keyed on the RAREST grams (volume tracks near-match
mass, not hot-gram df²), the verify is candidate-bounded, and every
shuffle is keyed on 8-byte ids / gram structs. The honest boundary:
"rarest" only helps if rare grams EXIST — a corpus confined to a tiny
q-gram alphabet (all-digit keys, hex ids) has ~|Σ|^q distinct grams
total, every prefix gram is hot, and the candidate join degenerates
toward all-pairs: total prefix volume P = N·(k·q+1) spread over G
distinct grams forces ≥ P²/G candidate pairs (Cauchy-Schwarz — a
LOWER bound, not a model), so G ≪ N is quadratic no matter how the
ranking orders the grams (measured: digit-string corpora at q=2
filled the shuffle disk at 1.28M rows where 26-letter corpora at q=4
scale linearly — bench_scale.py's r16 curve note). The operator now
measures G with one cheap agg over the gram table it already builds
and RAISES when ``N_long > degenerate_factor · G`` (default 64 — the
digit corpus sits at N/G ≈ 12,800, the sf0.1 text fixture at ≈ 18),
with the remedy in the error: raise ``q`` until |Σ|^q ≫ N, or use a
token-level similarity join instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.prefix_join import ranked_shingles
from food_panda_etl_spark.operators.weighted_jaccard import occurrence_expand


def qgram_multiset_table(
    df: DataFrame, id_col: str, str_col: str, q: int = 2
) -> DataFrame:
    """(doc, shingle, c bigint) — character q-grams WITH multiplicities
    (named ``shingle`` so the ranked-prefix machinery applies
    verbatim). Strings shorter than q yield zero rows (the short
    bucket covers them)."""
    if q < 1:
        raise ValueError(f"qgram_multiset_table: need q >= 1, got {q}")
    par = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(
        F.col(id_col).alias("doc"), F.col(str_col).alias("__s")
    ).repartition(par, "doc")
    n = F.length("__s") - (q - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(
        F.array().cast("array<int>")
    )
    gram = F.transform(idx, lambda i: F.col("__s").substr(i, F.lit(q)))
    return (
        src.select("doc", F.explode(gram).alias("shingle"))
        .groupBy("doc", "shingle")
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def edit_distance_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    k: int = 2,
    q: int = 2,
    degenerate_factor: int = 64,
    short_broadcast_rows: int = 100_000,
) -> DataFrame:
    """(id_a, id_b, dist int) — EXACTLY the pairs with
    levenshtein(s_a, s_b) ≤ k and id_a < id_b, equal row-for-row to
    the brute-force all-pairs join (the completeness property test /
    declared-query oracle). NULL strings never pair (no edit sequence
    reaches an unknown value). NOTE: with either guard enabled (the
    defaults) this runs ONE EAGER Spark action at plan-construction
    time — a single bounded ≤ 3-number collect over tables the plan
    builds anyway — because both the degeneracy raise and the
    broadcast decision need the scalars before the plan is shaped;
    pass ``degenerate_factor=0`` AND ``short_broadcast_rows=0`` for a
    fully lazy plan with both guards off (ADVICE r17 — plan-only
    callers composing lazily pay no job).

    Raises ValueError when the q-gram alphabet is degenerately small
    for the corpus (``N_long > degenerate_factor · G`` — see module
    docstring; ``degenerate_factor=0`` disables the check). The short
    bucket is broadcast only while it holds ≤ ``short_broadcast_rows``
    rows; above that the length-key equi-join falls back to a shuffle
    join (``short_broadcast_rows=0`` forces the fallback)."""
    if k < 0:
        raise ValueError(f"edit_distance_join: need k >= 0, got {k}")
    if q < 1:
        raise ValueError(f"edit_distance_join: need q >= 1, got {q}")
    par = df.sparkSession.sparkContext.defaultParallelism
    strs = (
        df.select(F.col(id_col).alias("doc"), F.col(str_col).alias("__s"))
        .filter(F.col("__s").isNotNull())
        .repartition(par, "doc")
        .localCheckpoint(eager=False)  # consumers: grams, short, verify
    )
    # long strings: n = len − q + 1 > k·q, where the count bound prunes
    long_side = strs.filter(F.length("__s") - (q - 1) > k * q)
    short_side = strs.filter(F.length("__s") - (q - 1) <= k * q)

    grams = qgram_multiset_table(
        long_side.withColumnRenamed("__s", "s"), "doc", "s", q
    ).localCheckpoint(eager=False)  # consumers: guard agg, expansion

    # Degenerate-alphabet guard + short-bucket size, ONE bounded-scalar
    # action over tables the operator builds anyway (audited collect:
    # a single ≤ 3-number row, never fact-sized) — and ONLY when a
    # decision depends on it: both guards off → fully lazy plan, no
    # job at construction time (ADVICE r17). G ≪ N forces ≥ P²/G
    # candidates (module docstring) — fail loudly with the remedy
    # instead of filling the shuffle disk.
    want_guard = bool(degenerate_factor)
    want_bcast = short_broadcast_rows > 0
    broadcast_short = False
    if want_guard:
        guard_agg = grams.agg(
            F.count_distinct("shingle").alias("g"),
            F.count_distinct("doc").alias("n_long"),
        )
        if want_bcast:
            guard_agg = guard_agg.crossJoin(
                F.broadcast(short_side.agg(F.count("*").alias("n_short")))
            )
        g_row = guard_agg.collect()[0]
        if g_row.n_long > degenerate_factor * g_row.g:
            raise ValueError(
                f"edit_distance_join: degenerate q-gram alphabet — "
                f"{g_row.g} distinct {q}-grams for {g_row.n_long} strings "
                f"(bar: N_long > {degenerate_factor}·G). Every prefix gram "
                f"is hot and the candidate join is provably ≥ P²/G pairs. "
                f"Raise q until |Σ|^q ≫ N (e.g. q={q + 1}), or use a "
                f"token-level similarity join for this corpus."
            )
        if want_bcast:
            broadcast_short = g_row.n_short <= short_broadcast_rows
    elif want_bcast:
        n_short = short_side.agg(F.count("*").alias("n_short")).collect()[
            0
        ].n_short
        broadcast_short = n_short <= short_broadcast_rows

    exp = occurrence_expand(grams)
    ranked = ranked_shingles(exp)
    prefix = ranked.filter(F.col("__pos") <= k * q + 1).select(
        "doc", "shingle", "n_sh"
    )
    a = prefix.select(
        F.col("doc").alias("id_a"), "shingle", F.col("n_sh").alias("__na")
    )
    b = prefix.select(
        F.col("doc").alias("id_b"), "shingle", F.col("n_sh").alias("__nb")
    )
    cand_long = (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter on the integer gram counts: |len_a − len_b| =
        # |n_a − n_b| ≤ k for any qualifying pair
        .filter(F.abs(F.col("__na") - F.col("__nb")) <= k)
        .select("id_a", "id_b")
        .distinct()
    )
    # short bucket: the count bound cannot prune (zero shared q-grams
    # is possible within k edits), so pair the short sliver with
    # everything in its length window via an EXPLODED length key —
    # each short string probes the 2k+1 lengths |Δlen| ≤ k, a plain
    # equi-join the planner can broadcast OR shuffle. Broadcast only
    # while the bucket is provably small (it is 2k+1 rows per short
    # string): a short-dominated corpus (names, codes) falls back to
    # a shuffle hash join instead of blowing the driver (ADVICE r16).
    sh = short_side.select(
        F.col("doc").alias("sid"),
        F.explode(
            F.sequence(
                F.length("__s") - k, F.length("__s") + k
            )
        ).alias("__ol"),
    ).filter(F.col("__ol") >= 0)
    if broadcast_short:
        sh = F.broadcast(sh)
    other = strs.select(
        F.col("doc").alias("oid"),
        F.length("__s").alias("__ol"),
    )
    cand_short = (
        other.join(sh, "__ol")
        .filter(F.col("sid") != F.col("oid"))
        .select(
            F.least("sid", "oid").alias("id_a"),
            F.greatest("sid", "oid").alias("id_b"),
        )
        .distinct()
    )
    # Verify-stage parallelism (r19 optimization): the candidate table
    # is BYTE-tiny (two 8-byte ids per row) but CPU-dense (one
    # Levenshtein DP per row), so AQE's byte-based partition coalescing
    # mis-sizes it — at sf0.1 the whole verify collapsed to ONE task
    # holding a 5.7 s serial DP loop while 31 cores idled. An explicit
    # pair-keyed repartition to defaultParallelism pins the verify at
    # cluster width (user-specified partition counts are exempt from
    # AQE coalescing); dropDuplicates reuses that exchange's
    # partitioning, so candidate dedup still costs the single shuffle
    # it always did.
    cand = (
        cand_long.unionByName(cand_short)
        .repartition(par, "id_a", "id_b")
        .dropDuplicates()
    )
    sa = strs.select(F.col("doc").alias("id_a"), F.col("__s").alias("__sa"))
    sb = strs.select(F.col("doc").alias("id_b"), F.col("__s").alias("__sb"))
    # levenshtein's threshold form (Spark 3.5+) runs the banded
    # O(k·len) DP and returns −1 above the bound — for every kept row
    # (dist ≤ k) the banded value IS the exact distance, so the output
    # is row-identical to the unbounded O(len²) DP at a fraction of
    # the per-pair cost.
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.levenshtein("__sa", "__sb", k).cast("int").alias("dist"),
        )
        .filter((F.col("dist") >= 0) & (F.col("dist") <= k))
    )
