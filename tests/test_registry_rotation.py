"""Rotation self-check (VERDICT r8 task 7): the driver-window plan now
lives in code (``DECLARED_WINDOW``), and these asserts make a planned
rotation that fails to land fail loudly — round 8's failure mode was a
plan that existed only as a comment while the registry order silently
re-recorded the previous round's keys."""

from __future__ import annotations

import glob
import json
import os
import re

from food_panda_etl_spark.queries import (
    DECLARED_WINDOW,
    ORACLES,
    QUERIES,
    WINDOW_ROUND,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_window_is_the_registry_head():
    """The registry's iteration order (what the driver records) must
    start with DECLARED_WINDOW, verbatim."""
    assert list(QUERIES)[: len(DECLARED_WINDOW)] == DECLARED_WINDOW


def test_window_shape():
    assert len(DECLARED_WINDOW) == 50  # the driver records ~50 keys
    assert len(set(DECLARED_WINDOW)) == len(DECLARED_WINDOW)
    assert isinstance(WINDOW_ROUND, int) and WINDOW_ROUND >= 9
    missing = [k for k in DECLARED_WINDOW if k not in QUERIES]
    assert not missing, missing


def test_new_declarations_are_in_the_window():
    """Every declared query the driver has NEVER recorded must sit in
    the current window — first evidence for new queries outranks
    refreshing old greens (the invariant round 8 broke for
    q_pps_stratified)."""
    artifacts = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    if not artifacts:  # fresh clone — nothing recorded yet
        return
    seen: set[str] = set()
    for path in artifacts:
        with open(path) as f:
            payload = json.load(f)
        entries = payload.get("queries", payload)
        if isinstance(entries, dict):
            seen.update(entries)
    never_recorded = [k for k in QUERIES if k not in seen]
    out_of_window = [k for k in never_recorded if k not in DECLARED_WINDOW]
    assert not out_of_window, (
        f"declared queries with no driver evidence outside the window: "
        f"{out_of_window} — promote them in DECLARED_WINDOW"
    )


def test_preview_verified_queries_get_declared():
    """The r11 blind spot (VERDICT r11 task 3): the window guard above
    catches declared-but-unwindowed queries (the r8 mode) but not
    preview-tested-but-never-declared (the r11 mode, where five
    finished operators stayed invisible to the driver for two rounds
    because the plan lived only in a comment). A preview file
    tests/test_rN_oracle_previews.py promises its operators' queries
    will be DECLARED once the window reaches round N — so every
    ``def test_<name>_preview`` function still present in a preview
    file whose round is ≤ WINDOW_ROUND means the promotion did not
    land. (After promotion the file is rewritten registry-driven —
    the r10/r12 convention — and carries no ``*_preview`` functions.)"""
    for path in glob.glob(
        os.path.join(REPO, "tests", "test_r*_oracle_previews.py")
    ):
        n = int(re.search(r"test_r(\d+)_", os.path.basename(path)).group(1))
        if WINDOW_ROUND < n:
            continue  # future round's previews — promotion not due yet
        with open(path) as f:
            src = f.read()
        stale = [
            f"q_{m}"
            for m in re.findall(r"def test_(\w+)_preview\(", src)
        ]
        undeclared = [q for q in stale if q not in QUERIES]
        assert not undeclared, (
            f"{os.path.basename(path)} preview-verifies {undeclared} but "
            f"WINDOW_ROUND={WINDOW_ROUND} ≥ {n} and they are not declared "
            "— move the bodies+oracles into a queries/ module and rotate "
            "DECLARED_WINDOW (the promotion this guard exists to force)"
        )


def test_evidence_age():
    """The rotation policy itself, as a failing test (VERDICT r12 task
    8, the preview-guard treatment for task 2's rule): no declared
    key's latest driver evidence may be older than 4 rounds by the END
    of the current round — so every key whose latest CORRECTNESS
    record is ≤ WINDOW_ROUND − 5 must sit in DECLARED_WINDOW (it gets
    re-recorded this round) or the build fails. Keys with NO evidence
    are handled by test_new_declarations_are_in_the_window."""
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")):
        n = int(re.search(r"r(\d+)", os.path.basename(path)).group(1))
        with open(path) as f:
            payload = json.load(f)
        entries = payload.get("queries", payload)
        if isinstance(entries, dict):
            for k in entries:
                latest[k] = max(latest.get(k, 0), n)
    if not latest:  # fresh clone — nothing recorded yet
        return
    overdue = [
        f"{k} (r{latest[k]})"
        for k in QUERIES
        if k in latest
        and latest[k] <= WINDOW_ROUND - 5
        and k not in DECLARED_WINDOW
    ]
    assert not overdue, (
        f"declared keys whose evidence would age past 4 rounds this "
        f"round (WINDOW_ROUND={WINDOW_ROUND}) and are not in the "
        f"window: {overdue} — rotate them into DECLARED_WINDOW"
    )


def test_window_keys_have_usable_oracles():
    """Window keys are what the driver hash-checks this round: each is
    either oracled (non-empty SQL) or one of the documented rows-only
    keys (approx variants whose quality gates are oracled, or
    formatting-only q_to_json)."""
    rows_only_by_design = {
        "q_approx_distinct",
        "q_minhash_neardup",
        "q_simhash_neardup",
        "q_embed_neardup_lsh",
        "q_cosine_topk_lsh",
        "q_ivf_topk",
        "q_to_json",
    }
    for k in DECLARED_WINDOW:
        if k in rows_only_by_design:
            assert k not in ORACLES, k
        else:
            assert ORACLES.get(k, "").strip(), f"{k} has no oracle SQL"
