"""Incremental CMS + HLL refresh faces (operators/cms_incremental.py,
operators/hll_incremental.py — r18 build-aheads for r20, closing the
last two gaps in the incremental-state matrix): the refreshed state
must be IDENTICAL to the from-scratch sketch of corpus ∪ batch under
any refresh chain (CMS linearity / HLL register-max mergeability),
estimates from refreshed state must equal direct estimates, and the
geometry contracts must be loud — including the state stamp HLL
sketches previously lacked (same-shape different-m register tables
merged into garbage with no error; now stamped and validated, and the
stamp survives parquet)."""

from __future__ import annotations

import random

import pytest

from pyspark.sql import functions as F

from food_panda_etl_spark.operators.cms import cms_estimate, cms_sketch
from food_panda_etl_spark.operators.cms_incremental import (
    incremental_cms_refresh,
)
from food_panda_etl_spark.operators.cms_windowed import cms_sketch_by_group
from food_panda_etl_spark.operators.hll import (
    hll_estimate,
    hll_sketch,
)
from food_panda_etl_spark.operators.hll_incremental import (
    HLL_STATE_GEO_KEYS,
    build_hll_state,
    hll_state_estimate,
    incremental_hll_refresh,
)
from food_panda_etl_spark.operators.state_geometry import state_geometry
from food_panda_etl_spark.tables import load_table

_W, _D = 1024, 4


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def _split(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id")
    corpus = ev.filter(F.col("event_id") % 10 != 0)
    batch = ev.filter(F.col("event_id") % 10 == 0)
    return ev, corpus, batch


def test_cms_refresh_equals_from_scratch(spark, sf_dir):
    ev, corpus, batch = _split(spark, sf_dir)
    st = cms_sketch(corpus, "user_id", _W, _D)
    st = incremental_cms_refresh(st, batch, "user_id", _W, _D)
    direct = cms_sketch(ev, "user_id", _W, _D)
    cols = ["d", "b", "cnt"]
    assert _rows(st, cols) == _rows(direct, cols)
    # estimates from the refreshed state == direct estimates
    probes = spark.range(1, 51).select(F.col("id").alias("k"))
    got = cms_estimate(st, probes, "k", _W, _D)
    want = cms_estimate(direct, probes, "k", _W, _D)
    assert _rows(got, ["k", "est"]) == _rows(want, ["k", "est"])


def test_cms_refresh_grouped(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    corpus = ev.filter(F.col("event_id") % 10 != 0)
    batch = ev.filter(F.col("event_id") % 10 == 0)
    st = cms_sketch_by_group(corpus, "user_id", ("event_type",), _W, _D)
    st = incremental_cms_refresh(
        st, batch, "user_id", _W, _D, ("event_type",)
    )
    direct = cms_sketch_by_group(ev, "user_id", ("event_type",), _W, _D)
    cols = ["event_type", "d", "b", "cnt"]
    assert _rows(st, cols) == _rows(direct, cols)


def test_cms_chained_refreshes_random(spark):
    rnd = random.Random(5)
    vals = [(rnd.randint(0, 500),) for _ in range(300)]
    mk = lambda rows: spark.createDataFrame(rows, "v bigint")  # noqa: E731
    st = cms_sketch(mk(vals[:100]), "v", 64, 3)
    st = incremental_cms_refresh(st, mk(vals[100:200]), "v", 64, 3)
    st = incremental_cms_refresh(st, mk(vals[200:]), "v", 64, 3)
    direct = cms_sketch(mk(vals), "v", 64, 3)
    assert _rows(st, ["d", "b", "cnt"]) == _rows(direct, ["d", "b", "cnt"])


def test_cms_stamp_mismatch_raises(spark, sf_dir):
    _, corpus, batch = _split(spark, sf_dir)
    st = cms_sketch(corpus, "user_id", 512, _D)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_cms_refresh(st, batch, "user_id", _W, _D)
    # hand-built (stripped) NON-EMPTY state: accepted with matching
    # geometry and merged identically to the stamped original (review
    # r18 — a limit(0) comparison here was vacuous)
    stripped = spark.createDataFrame(
        st.collect(), "d int, b bigint, cnt bigint"
    )
    out = incremental_cms_refresh(st, batch, "user_id", 512, _D)
    ref = incremental_cms_refresh(stripped, batch, "user_id", 512, _D)
    assert len(_rows(out, ["d", "b", "cnt"])) > 0
    assert _rows(out, ["d", "b", "cnt"]) == _rows(ref, ["d", "b", "cnt"])


def test_hll_refresh_equals_from_scratch(spark, sf_dir):
    ev, corpus, batch = _split(spark, sf_dir)
    st = build_hll_state(corpus, "user_id")
    st = incremental_hll_refresh(st, batch, "user_id")
    direct = hll_sketch(ev, "user_id")
    cols = ["reg", "rho"]
    assert _rows(st, cols) == _rows(direct, cols)
    got = hll_state_estimate(st).collect()
    want = hll_estimate(direct).collect()
    assert got == want
    # the estimate path validates the stamp too (review r18: a
    # smaller-m read passes hll_estimate's rank-range guard — cap
    # GROWS as m shrinks on the portable grid — and would compute a
    # plausibly-positive estimate on the wrong alpha/m² arithmetic)
    with pytest.raises(ValueError, match="does not match the supplied"):
        hll_state_estimate(st, m=128)


def test_hll_refresh_grouped_and_chained(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type"
    )
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    st = build_hll_state(parts[0], "user_id", group_cols=("event_type",))
    for p in parts[1:]:
        st = incremental_hll_refresh(
            st, p, "user_id", group_cols=("event_type",)
        )
    direct = hll_sketch(ev, "user_id", group_cols=("event_type",))
    cols = ["event_type", "reg", "rho"]
    assert _rows(st, cols) == _rows(direct, cols)


def test_hll_stamp_survives_parquet_and_raises(spark, sf_dir, out_dir):
    """The NEW stamp on HLL state (hll.py itself is shape-checked
    only): different-m and different-mixer refreshes raise, the stamp
    survives a parquet round trip (the maintained-state regime), and
    unstamped state stays accepted with matching geometry."""
    import os

    _, corpus, batch = _split(spark, sf_dir)
    st = build_hll_state(corpus, "user_id", m=256)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_hll_refresh(st, batch, "user_id", m=1024)
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_hll_refresh(st, batch, "user_id", mixer="xxhash64")
    p = os.path.join(out_dir, "hll_state")
    st.write.mode("overwrite").parquet(p)
    back = spark.read.parquet(p)
    assert state_geometry(back, "rho", HLL_STATE_GEO_KEYS) is not None
    with pytest.raises(ValueError, match="does not match the supplied"):
        incremental_hll_refresh(back, batch, "user_id", m=1024)
    refreshed = incremental_hll_refresh(back, batch, "user_id")
    # unstamped (hand-built) state with matching geometry: accepted
    plain = hll_sketch(corpus, "user_id")
    assert state_geometry(plain, "rho", HLL_STATE_GEO_KEYS) is None
    ref2 = incremental_hll_refresh(plain, batch, "user_id")
    assert _rows(refreshed, ["reg", "rho"]) == _rows(ref2, ["reg", "rho"])
