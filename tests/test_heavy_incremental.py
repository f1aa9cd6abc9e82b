"""Incremental / windowed heavy hitters
(operators/heavy_incremental.py, r18 build-ahead for r19): the
maintained MG summary must (a) never lose a true heavy hitter across
refresh chains (the candidates-superset guarantee, machine-checked
against brute force on random data), (b) keep deficit ≤ N/(k+1) under
any merge tree, (c) be deterministic under repartitioning (the
exact-then-truncate design's whole point — the state is
SQL-replayable), and (d) be loud on malformed/mismatched state."""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from food_panda_etl_spark.operators.heavy_incremental import (
    heavy_candidates,
    incremental_heavy_refresh,
    mg_merge_groups,
    mg_summary,
)
from food_panda_etl_spark.tables import load_table

_K = 200
_NUM, _DEN = 1, 100


def _tok(df):
    return df.select(F.explode(F.split(F.col("text"), " ")).alias("token"))


def _brute_heavies(tok, num, den):
    n = tok.count()
    return {
        r.token
        for r in tok.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * den > F.lit(n) * num)
        .collect()
    }


def test_refresh_screen_is_exact_on_fixture(spark, sf_dir):
    """corpus-state + batch refresh → candidates → exact recount must
    equal the brute-force HAVING over corpus ∪ batch (= the whole
    documents token stream) — the r19 declared query's shape."""
    d = load_table(spark, sf_dir, "documents")
    corpus_t = _tok(d.filter(F.col("doc_id") % 10 != 0)).localCheckpoint(
        eager=False
    )
    batch_t = _tok(d.filter(F.col("doc_id") % 10 == 0)).localCheckpoint(
        eager=False
    )
    c, t = mg_summary(corpus_t, "token", _K)
    c, t = incremental_heavy_refresh(c, t, batch_t, "token", _K)
    cand = heavy_candidates(c, t, "token", _NUM, _DEN, _K)
    union = corpus_t.unionByName(batch_t)
    got = {
        r.token: r.cnt
        for r in union.join(F.broadcast(cand), "token", "semi")
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .crossJoin(F.broadcast(t.select("n")))
        .filter(F.col("cnt") * _DEN > F.col("n") * _NUM)
        .drop("n")
        .collect()
    }
    want = {
        r.token: r.cnt
        for r in union.groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .filter(
            F.col("cnt") * _DEN > F.lit(union.count()) * _NUM
        )
        .collect()
    }
    assert got == want
    assert len(want) > 0  # non-vacuous at every SF (30 on the fixture)


def test_state_is_deterministic_under_repartitioning(spark, sf_dir):
    """The exact-then-truncate design's point: unlike heavy.py's
    per-partition summaries, the maintained state is a pure function
    of the SET of rows — identical counters/totals under any layout."""
    d = load_table(spark, sf_dir, "documents").limit(200)
    tok = _tok(d)
    c1, t1 = mg_summary(tok.repartition(1), "token", 20)
    c2, t2 = mg_summary(tok.repartition(13), "token", 20)
    assert sorted(map(tuple, c1.collect())) == sorted(
        map(tuple, c2.collect())
    )
    assert t1.collect() == t2.collect()


def test_all_equal_boundary_ties_keep_the_deficit(spark):
    """k+1 equal counts: delta == cnt, every counter drops — the
    subtracted mass must still land in the deficit (the truncate
    reads deltas off the RANKED frame, not the survivors; a zero
    deficit here would let the screen silently prune everything)."""
    rows = [(f"k{i}",) for i in range(6) for _ in range(4)]
    df = spark.createDataFrame(rows, "token string")
    c, t = mg_summary(df, "token", 5)
    assert c.count() == 0
    tot = t.collect()[0]
    assert tot.n == 24 and tot.deficit == 4
    # and the screen correctly keeps EVERY key possible: cnt+deficit
    # bound means no key can be ruled out, so candidates == 0 rows only
    # because the counters are empty — at this k the guard refuses the
    # 1/100 threshold outright (k too small for the bound)
    with pytest.raises(ValueError, match="too small"):
        heavy_candidates(c, t, "token", 1, 100, 5)


def test_deficit_bound_and_superset_random(spark):
    """Σδ ≤ N/(k+1) under chained refreshes, and the candidate set is
    a superset of the brute-force heavies — the Agarwal et al.
    mergeable-summaries guarantee, machine-checked."""
    import random

    rnd = random.Random(7)
    for trial in range(3):
        k = rnd.choice([6, 10, 16])
        vals = [
            (f"v{rnd.randint(0, 40)}",)
            for _ in range(rnd.randint(30, 300))
        ]
        cut1 = len(vals) // 3
        cut2 = 2 * len(vals) // 3
        df = spark.createDataFrame(vals, "token string")
        a = spark.createDataFrame(vals[:cut1] or [("v0",)], "token string")
        b = spark.createDataFrame(
            vals[cut1:cut2] or [("v0",)], "token string"
        )
        c_ = spark.createDataFrame(vals[cut2:] or [("v0",)], "token string")
        n_total = a.count() + b.count() + c_.count()
        cc, tt = mg_summary(a, "token", k)
        cc, tt = incremental_heavy_refresh(cc, tt, b, "token", k)
        cc, tt = incremental_heavy_refresh(cc, tt, c_, "token", k)
        tot = tt.collect()[0]
        assert tot.n == n_total
        assert tot.deficit <= n_total // (k + 1) + 1
        num, den = 1, max(3, k // 2)
        if k * num >= 2 * den:
            union = a.unionByName(b).unionByName(c_)
            cand = {
                r.token
                for r in heavy_candidates(
                    cc, tt, "token", num, den, k
                ).collect()
            }
            assert _brute_heavies(union, num, den) <= cand


def test_merge_groups_equals_direct_when_untruncated(spark, sf_dir):
    """With k above every group's vocabulary the MG step never fires
    and the merged summary must equal the direct build of the union —
    the pure-sum identity (truncated states are screens, compared via
    the superset property above, not row equality)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isNotNull() & F.col("ts").isNotNull())
        .select(
            "event_type",
            F.expr("unix_micros(cast(ts as timestamp)) div 86400000000")
            .alias("day"),
        )
        .localCheckpoint(eager=False)
    )
    k = 10
    by_day = mg_summary(ev, "event_type", k, group_cols=("day",))
    merged_c, merged_t = mg_merge_groups(
        [by_day], "event_type", k, group_cols=()
    )
    direct_c, direct_t = mg_summary(ev.drop("day"), "event_type", k)
    assert sorted(map(tuple, merged_c.collect())) == sorted(
        map(tuple, direct_c.collect())
    )
    assert merged_t.collect() == direct_t.collect()


def test_geometry_stamp_mismatch_raises(spark, sf_dir):
    """The incremental-family geometry contract: refreshing /
    merging / screening state built at a different k (or key) raises;
    mixed pairs are caught; hand-built state with matching geometry
    stays accepted (the family convention)."""
    d = load_table(spark, sf_dir, "documents").limit(100)
    tok = _tok(d)
    c20, t20 = mg_summary(tok, "token", 20)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_heavy_refresh(c20, t20, tok, "token", 30)
    with pytest.raises(ValueError, match="does not match the supplied"):
        heavy_candidates(c20, t20, "token", 1, 4, 30)
    c30, t30 = mg_summary(tok, "token", 30)
    with pytest.raises(ValueError, match="different geometries"):
        incremental_heavy_refresh(c20, t30, tok, "token", 20)
    with pytest.raises(ValueError, match="does not match the supplied"):
        mg_merge_groups([(c20, t20), (c30, t30)], "token", 20)
    # hand-built (stripped) state: accepted with matching geometry
    bare_c, bare_t = c20.withMetadata("cnt", {}), t20.withMetadata("n", {})
    got_c, got_t = incremental_heavy_refresh(
        bare_c, bare_t, tok, "token", 20
    )
    ref_c, ref_t = incremental_heavy_refresh(c20, t20, tok, "token", 20)
    assert sorted(map(tuple, got_c.collect())) == sorted(
        map(tuple, ref_c.collect())
    )
    assert got_t.collect() == ref_t.collect()


def test_input_validation(spark):
    df = spark.createDataFrame([("a",)], "token string")
    with pytest.raises(ValueError, match="k must be"):
        mg_summary(df, "token", 0)
    with pytest.raises(ValueError, match="collide"):
        mg_summary(df.withColumnRenamed("token", "cnt"), "cnt", 5)
    c, t = mg_summary(df, "token", 5)
    with pytest.raises(ValueError, match="need 0 < num"):
        heavy_candidates(c, t, "token", 3, 2, 5)
    with pytest.raises(ValueError, match="at least one"):
        mg_merge_groups([], "token", 5)
    with pytest.raises(ValueError, match="lacks columns"):
        mg_merge_groups([(c, t)], "token", 5, group_cols=("day",))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=25),  # key
            st.integers(min_value=0, max_value=6),  # day
        ),
        min_size=1,
        max_size=120,
    ),
    k=st.integers(min_value=4, max_value=12),
)
def test_window_screen_superset_random(spark, rows, k):
    """Per-day summaries, merged over a trailing window, screen a
    SUPERSET of the window's brute-force heavies — for random data,
    random k, including truncating regimes."""
    df = spark.createDataFrame(
        [(f"u{u}", d) for u, d in rows], "u string, day long"
    ).localCheckpoint(eager=False)
    md = df.agg(F.max("day")).collect()[0][0]
    win = df.filter(F.col("day") > md - 3)
    by_day = mg_summary(df, "u", k, group_cols=("day",))
    c_f = by_day[0].filter(F.col("day") > md - 3)
    t_f = by_day[1].filter(F.col("day") > md - 3)
    mc, mt = mg_merge_groups([(c_f, t_f)], "u", k, group_cols=())
    num, den = 1, 2
    if k * num < 2 * den:
        return
    cand = {
        r.u for r in heavy_candidates(mc, mt, "u", num, den, k).collect()
    }
    want = _brute_heavies(win.select(F.col("u").alias("token")), num, den)
    assert want <= cand
    assert mt.collect()[0].n == win.count()


def test_null_group_keys_form_their_own_group(spark):
    """Review r18: the NULL group's deficit and candidates must
    survive the totals/screen joins (eqNullSafe on the group keys —
    the heavy_group.py convention; a plain key-list join drops the
    NULL group's delta row AND its counter rows, silently voiding the
    superset guarantee for exactly that group)."""
    rows = (
        [(None, f"k{i}") for i in range(6) for _ in range(4)]  # truncates
        + [(None, "hot")] * 30
        + [("g1", "hot")] * 9
        + [("g1", "cold")]
    )
    df = spark.createDataFrame(rows, "g string, token string")
    c, t = mg_summary(df, "token", 5, group_cols=("g",))
    tots = {r.g: (r.n, r.deficit) for r in t.collect()}
    # NULL group: 54 rows; the truncate at k=5 over 7 keys fires —
    # delta is the 6th-largest count (4), deficit records it
    assert tots[None] == (54, 4)
    assert tots["g1"] == (10, 0)
    cand = heavy_candidates(c, t, "token", 1, 2, 5, group_cols=("g",))
    got = {(r.g, r.token) for r in cand.collect()}
    # "hot" holds 30/54 of the NULL group and 9/10 of g1 — both must
    # surface despite the NULL group key
    assert (None, "hot") in got and ("g1", "hot") in got


def test_flat_build_pre_truncates_before_the_rank_window(spark):
    """ADVICE r18: the INITIAL flat build must not rank the whole
    distinct-key vocabulary through one constant-partition task. The
    pre-truncate (`_flat_top_counts`) is the guarantee: its plan is a
    distributed TakeOrdered/limit — per-partition local top-(k+1)
    plus a (k+1)-row merge, no Window node, no vocabulary-wide sort —
    and its OUTPUT is exactly the global top-(k+1) by the truncate's
    (cnt desc, key) total order, which is all ranks 1..k+1 the
    downstream window can ever emit."""
    from food_panda_etl_spark.operators.heavy_incremental import (
        _flat_top_counts,
    )

    k = 7
    counts = (
        spark.range(3000)
        .select((F.col("id") % 999).cast("string").alias("token"))
        .repartition(8)
        .groupBy("token")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )
    top = _flat_top_counts(counts, "token", k)
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan or "Limit" in plan
    assert "Window" not in plan
    got = [(r.token, r.cnt) for r in top.collect()]
    want = sorted(
        ((r.token, r.cnt) for r in counts.collect()),
        key=lambda x: (-x[1], x[0]),
    )[: k + 1]
    assert sorted(got, key=lambda x: (-x[1], x[0])) == want
    # and the full flat summary over the same frame is unchanged by
    # the pre-truncate: survivors are the counts above the (k+1)-th
    # largest, deficit records it (999 keys at cnt 3 or 4: the
    # boundary count is 4 for k=7 → every counter drops, the mass
    # lands in the deficit)
    c, t = mg_summary(
        spark.range(3000)
        .select((F.col("id") % 999).cast("string").alias("token"))
        .repartition(8),
        "token",
        k,
    )
    tot = t.collect()[0]
    assert tot.n == 3000
    boundary = want[k][1] if len(want) > k else 0
    assert tot.deficit == boundary
    assert all(r.cnt > 0 for r in c.collect())
