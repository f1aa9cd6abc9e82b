"""HyperLogLog-style distinct sketch as a DataFrame (Flajolet et al.
2007; the CMS sibling in the mergeable-summaries family): m registers,
each holding the maximum rank observed among keys routed to it, where
rank = trailing zeros of the hashed suffix + 1. The WHOLE sketch is a
≤ m-row DataFrame of integers, so — like `operators/cms.py` — it is
EXACTLY SQL-replayable: register routing is modular arithmetic on the
repo's portable multiplicative hash, and rank is
``bit_count((w & -w) - 1) + 1`` — pure integer bit arithmetic with
identical semantics in Spark and DuckDB (verified both engines), no
log2, no floats anywhere in the sketch.

Rank source: TRAILING zeros (the PCSA/Flajolet-Martin observable)
rather than the leading zeros of textbook HLL — identically
geometric(1/2) under a uniform hash, and exactly computable in SQL,
which leading-zero counts are not (no portable clz). The estimator is
the same harmonic mean.

Determinism of the estimate: the harmonic sum Σ 2^(−M_j) is assembled
on an INTEGER grid — Σ 2^(GRID − M_j) as BIGINT (every addend a whole
power of two, GRID bounds the largest; exact, order-independent) — and
the raw estimate is ONE IEEE chain alpha·m²·2^GRID / S of exactly
representable operands (alpha is a decimal literal CAST to double the
same way in both engines; the repo's division convention). Small-range
bias is NOT corrected here: the textbook linear-counting switch needs
ln, which is not oracle-safe — production callers apply it on top of
``nonzero_regs`` (documented, like the rho-overflow note in dsir.py);
the declared-query gate pins accuracy in the raw regime instead.

Scale shape: one narrow hash projection + ONE (register) hash agg with
map-side combine — state is m rows no matter the key cardinality (the
point of HLL); merging shards is `unionByName` + the same max agg, and
every sketch in a merge/estimate MUST share the same m (the cms.py
same-(width, depth) contract — registers from different (modulus,
rank-cap) spaces max together into garbage, and a wrong m in
hll_estimate drives (m − nz) negative).

CARDINALITY CEILING (the portability price): the mod-(2^31−1) hash
bounds distinct hash values, and the squaring rounds are 2-to-1 (x and
P−x collide; −1 is a non-residue mod this Mersenne prime), so the
effective range is ~P/2 ≈ 1.07e9 — expected relative underestimate
≈ n/(2P): negligible below ~1e7 distinct keys, ~2% at 1e8, saturating
near 1e9. Textbook HLL avoids this with a ≥32-bit avalanche hash
(xxhash64), which no SQL oracle can replay — at true 100 TB
cardinalities pass ``mixer="xxhash64"`` (a full 64-bit avalanche path,
IMPLEMENTED below, not just documented) and drop the oracle to the
gate form (the q_approx_distinct convention): accuracy under that
mixer is pinned by ``tests/test_hll.py::test_xxhash64_mixer_gate``.

Input contract: a nullable INTEGER key column (the portable hash needs
integer keys — the repo's q_fingerprint polynomial turns text into
one). NULL keys are NOT a distinct value and are filtered before
hashing (the cms.py NULL contract): an unfiltered NULL would ride the
otherwise(cap) branch and forge a phantom maximum-rank register.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Default register count (power of two). alphas are the published
#: constants (Flajolet et al., Fig. 3; the m >= 128 closed form).
HLL_M = 256
_ALPHA = {
    16: 0.673,
    32: 0.697,
    64: 0.709,
    128: 0.7213 / (1 + 1.079 / 128),
    256: 0.7213 / (1 + 1.079 / 256),
}

#: Hash modulus: the Mersenne prime 2^31 - 1. Residues are < 2^31, so
#: the quadratic-mix squarings stay < 2^62 (int64-exact, no overflow in
#: ANSI mode), and the suffix w = h div m keeps >= 22 geometric bits at
#: m = 256; rank is capped at the suffix width for the all-zero suffix.
_HASH_MOD = 2147483647
_HASH_MUL = 1315423911

#: Register-value ceiling under the xxhash64 mixer: the 64−log2(m)-bit
#: suffix would give ranks up to ~57, but 2^(GRID − rho) sums over m
#: registers must stay in int64, so rho is saturated at 32 (textbook
#: HLL's 6-bit-register discipline). P(rank > 32) = 2^−32 per key — the
#: saturation changes a register's harmonic addend from < 2^−32 to
#: 2^−32, invisible at any cardinality the sketch can resolve.
_XXH_CAP = 32

_MIXERS = ("portable", "xxhash64")


def _rank_cap(m: int, mixer: str = "portable") -> int:
    if mixer == "xxhash64":
        return _XXH_CAP
    return (_HASH_MOD // m).bit_length() + 1


def hll_sketch(
    df: DataFrame,
    key_col: str,
    m: int = HLL_M,
    group_cols: tuple[str, ...] = (),
    mixer: str = "portable",
) -> DataFrame:
    """The ≤ m-row register table (reg int, rho int) of the distinct
    values of integer ``key_col``. Duplicate keys hash identically, so
    the sketch depends only on the distinct set — no pre-distinct pass
    is needed (or wanted: that would shuffle the keys).

    ``group_cols`` makes it GROUP-WISE — one independent sketch per
    group, ≤ m rows each (*group_cols, reg, rho): the "distinct users
    per day / per language" production shape, at per-group state cost
    m·|groups| regardless of key cardinality, in the SAME single hash
    aggregation (the key never shuffles — only (group, reg, rho)).
    Estimate per group by running the hll_estimate arithmetic under a
    groupBy(*group_cols) (see hll_estimate; its global form is the
    one-group special case). NULL group keys are their own group (SQL
    GROUP BY semantics); NULL keys are still filtered.

    ``mixer="portable"`` (default) is the SQL-replayable mod-Mersenne
    quadratic mix (oracle-checkable, ~1e9 cardinality ceiling);
    ``mixer="xxhash64"`` is the production 64-bit avalanche path — not
    SQL-replayable (gate-form checks only), no cardinality ceiling.
    ``hll_estimate`` must be called with the SAME mixer (the rank grid
    differs)."""
    if m not in _ALPHA:
        raise ValueError(
            f"hll_sketch: m must be one of {sorted(_ALPHA)}, got {m!r}"
        )
    if mixer not in _MIXERS:
        raise ValueError(
            f"hll_sketch: mixer must be one of {_MIXERS}, got {mixer!r}"
        )
    cap = _rank_cap(m, mixer)
    if mixer == "xxhash64":
        # reg = low log2(m) bits (two's-complement AND keeps 0..m−1 even
        # for negative hashes), w = the remaining bits as an UNSIGNED
        # shift so the sign bit becomes entropy, not a sticky 1.
        bits = int(m).bit_length() - 1
        h64 = F.xxhash64(F.col(key_col))
        reg = h64.bitwiseAND(m - 1).cast("int")
        w = F.shiftrightunsigned(h64, bits)
        rank = F.when(
            w > 0,
            F.least(
                F.bit_count((w.bitwiseAND(-w)) - 1) + 1, F.lit(int(cap))
            ).cast("int"),
        ).otherwise(F.lit(int(cap)).cast("int"))
        return (
            df.filter(F.col(key_col).isNotNull())
            .select(
                *[F.col(c) for c in group_cols],
                reg.alias("reg"),
                rank.alias("rho"),
            )
            .groupBy(*group_cols, "reg")
            .agg(F.max("rho").alias("rho"))
        )
    # mod-P pre-reduction BEFORE any multiply (the cms.py overflow
    # lesson): ((k % P) + P) % P is the sign-safe residue in both
    # engines (Spark's and DuckDB's % keep the dividend sign). A LINEAR
    # modular hash is NOT enough here: sequential keys map to an
    # arithmetic progression whose low bits carry no entropy, and the
    # trailing-zero observable collapses (measured: 2.4x underestimate
    # on 0..999). Two QUADRATIC rounds h -> (h^2 mod P)·c mod P break
    # the progression (measured max error 7% across sequential and
    # random key sets at m=256) while staying pure */% int64 arithmetic
    # replayable in any SQL engine — squares of residues < 2^62.
    # Route on the LOW bits, rank the HIGH part: reg = h mod m,
    # w = h div m (exact — h is non-negative, div == floor).
    # NB: every round is wrapped in OUTER parens — % and * have equal
    # precedence and left associativity, so an unparenthesised
    # `x % P * y` substituted into the next round's square reassociates
    # to `(x % P * y) % ...` and overflows int64 (found the hard way).
    # The key is pre-cast to BIGINT: an INT32 key (allowed by the
    # contract) would otherwise stay in 32-bit arithmetic where
    # `(k % P) + P` overflows — ANSI job abort, or a silent wraparound
    # (corrupt sketch) with ANSI off. The declared oracle mirrors the
    # cast (value-preserving, so int32 and int64 keys sketch alike).
    key_sql = f"CAST({key_col} AS BIGINT)"
    h_sql = f"((({key_sql} % {_HASH_MOD}) + {_HASH_MOD}) % {_HASH_MOD})"
    for _ in range(2):
        h_sql = (
            f"(((({h_sql} * {h_sql}) % {_HASH_MOD})"
            f" * {_HASH_MUL}) % {_HASH_MOD})"
        )
    h = F.expr(h_sql).cast("long")
    reg = (h % m).cast("int")
    w = F.expr(f"({h_sql}) div {m}").cast("long")
    # trailing zeros of w via bit_count((w & -w) - 1); w == 0 → cap
    rank = F.when(
        w > 0,
        (F.bit_count((w.bitwiseAND(-w)) - 1) + 1).cast("int"),
    ).otherwise(F.lit(int(cap)).cast("int"))
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(
            *[F.col(c) for c in group_cols],
            reg.alias("reg"),
            rank.alias("rho"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_merge(
    *sketches: DataFrame, group_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Register-wise max of any number of shard sketches — the
    mergeable-summaries combine (sketch(A ∪ B) ≡ merge(sketch(A),
    sketch(B)), property-tested). ALL inputs must come from hll_sketch
    with the SAME m, the SAME ``group_cols``, AND the SAME mixer (a
    cross-mixer merge is shape-identical and thus undetectable here —
    registers from different rank spaces max into garbage; the
    estimate's rank-range guard catches the xxhash64-into-portable
    direction downstream). The column shape is validated: a
    group-wise sketch merged with the default ``group_cols=()`` would
    otherwise silently max registers ACROSS groups (groupBy("reg")
    drops the group columns) — a garbage merge with no error. The
    check is order-INSENSITIVE but multiplicity-SENSITIVE (ADVICE
    r11): a sketch that passed through a column-reordering select is
    still the same sketch — inputs are normalized via select(*want) —
    while a duplicated column name (e.g. from a join) fails HERE with
    the clear message instead of later inside select(*want) with an
    ambiguous-reference error (set() comparison collapsed duplicates
    and let that shape through)."""
    if not sketches:
        raise ValueError("hll_merge: need at least one sketch")
    want = [*group_cols, "reg", "rho"]
    norm = []
    for i, s in enumerate(sketches):
        if sorted(s.columns) != sorted(want):
            raise ValueError(
                f"hll_merge: sketch #{i} has columns {list(s.columns)}, "
                f"expected {want} — group_cols must match the sketches' own"
            )
        norm.append(s.select(*want))
    out = norm[0]
    for s in norm[1:]:
        out = out.unionByName(s)
    return out.groupBy(*group_cols, "reg").agg(F.max("rho").alias("rho"))


def hll_estimate(
    sketch: DataFrame,
    m: int = HLL_M,
    group_cols: tuple[str, ...] = (),
    mixer: str = "portable",
) -> DataFrame:
    """One row (per group): (*group_cols, nonzero_regs bigint,
    dyadic_sum bigint, raw_estimate double). dyadic_sum =
    Σ_j 2^(GRID − M_j) over ALL m registers (absent registers
    contribute M_j = 0 → 2^GRID), exact integer; raw_estimate =
    alpha·m²·2^GRID / dyadic_sum — accurate for cardinalities ≳ 2.5·m,
    biased below and ceilinged near ~1e9 (see module docstring).
    ``m``, ``group_cols`` and ``mixer`` must match the sketch's own
    (the mixer sets the rank grid: 2^(GRID − rho) addends live on
    different grids under the two mixers). An EMPTY sketch (empty input
    shard) is legal in the GLOBAL form: all m registers absent →
    dyadic_sum = m·2^GRID, raw_estimate = alpha·m (the estimator's
    zero-cardinality plateau), never NULL; in the grouped form an
    absent group simply has no row."""
    if m not in _ALPHA:
        raise ValueError(
            f"hll_estimate: m must be one of {sorted(_ALPHA)}, got {m!r}"
        )
    if mixer not in _MIXERS:
        raise ValueError(
            f"hll_estimate: mixer must be one of {_MIXERS}, got {mixer!r}"
        )
    cap = _rank_cap(m, mixer)
    grid = cap + 1
    # In-plan rank-range guard (the guarded_weight convention): an
    # xxhash64-built sketch fed to a portable-mixer estimate carries
    # rho up to 32 against a grid of 25 — shiftleft(1, negative) wraps
    # through Java's shift-mod-64 into ~2^57 garbage addends that
    # crush the estimate toward zero ONLY at production cardinalities
    # (small-rho test sets pass), the worst kind of silent wrongness.
    # (The converse mistake is harmless: the estimate is grid-invariant
    # — numerator alpha·m²·2^GRID and every addend 2^(GRID−rho) scale
    # by the same power of two — so only rho > cap can corrupt, and
    # that raises loudly here.)
    addend = F.when(
        (F.col("rho") >= 1) & (F.col("rho") <= cap),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), {grid} - rho)"),
    ).otherwise(
        F.raise_error(
            F.lit(
                f"hll_estimate: register rank outside [1, {cap}] for "
                f"mixer={mixer!r}, m={m} — was the sketch built with a "
                "different mixer or m?"
            )
        )
    )
    present = sketch.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("__nz"),
        # coalesce: F.sum over ZERO rows is NULL, and NULL + the
        # absent-register term would silently NULL the whole estimate
        F.coalesce(F.sum(addend), F.lit(0)).cast("bigint").alias("__sp"),
    )
    # absent registers: (m − nz) · 2^grid, folded in exactly
    alpha = float(_ALPHA[m])
    return present.select(
        *group_cols,
        F.col("__nz").alias("nonzero_regs"),
        (
            F.col("__sp")
            + (F.lit(int(m)) - F.col("__nz")) * F.lit(1 << grid).cast("bigint")
        ).alias("dyadic_sum"),
    ).select(
        *group_cols,
        "nonzero_regs",
        "dyadic_sum",
        (
            F.lit(alpha * m * m * (1 << grid)).cast("double")
            / F.col("dyadic_sum").cast("double")
        ).alias("raw_estimate"),
    )
