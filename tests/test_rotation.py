"""Rotation-plan audit: the driver verifies only the first 50 registry
entries per round, so full driver coverage is a cross-round invariant.
These tests make the plan mechanically checkable instead of prose in
ROTATION.md (the r6 verdict found a two-entry hole exactly because the
plan lived only in prose).
"""

import json
import os

from etl_data_spark.catalog import (
    CHANGED_R9,
    CHANGED_R10,
    CHANGED_R11,
    CHANGED_R12,
    CHANGED_R13,
    CHANGED_THIS_ROUND,
    PRIORITY,
    PRIORITY_R7,
    PRIORITY_R8,
    PRIORITY_R9,
    PRIORITY_R10,
    PRIORITY_R11,
    PRIORITY_R12,
    PRIORITY_R13,
    PRIORITY_R14,
    REGISTRY,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _driver_green() -> set[str]:
    """Entries with at least one fully-green driver CORRECTNESS row."""
    green = set()
    for fname in sorted(os.listdir(REPO)):
        if not (fname.startswith("CORRECTNESS_r") and fname.endswith(".json")):
            continue
        with open(os.path.join(REPO, fname)) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
                and not row.get("err")
            ):
                green.add(name)
    return green


def test_window_is_exactly_50_known_entries():
    assert len(PRIORITY) == 50 and len(set(PRIORITY)) == 50
    assert len(PRIORITY_R7) == 50 and len(set(PRIORITY_R7)) == 50
    assert len(PRIORITY_R8) == 50 and len(set(PRIORITY_R8)) == 50
    assert len(PRIORITY_R9) == 50 and len(set(PRIORITY_R9)) == 50
    assert len(PRIORITY_R10) == 50 and len(set(PRIORITY_R10)) == 50
    assert len(PRIORITY_R11) == 50 and len(set(PRIORITY_R11)) == 50
    assert len(PRIORITY_R12) == 50 and len(set(PRIORITY_R12)) == 50
    assert len(PRIORITY_R13) == 50 and len(set(PRIORITY_R13)) == 50
    assert len(PRIORITY_R14) == 50 and len(set(PRIORITY_R14)) == 50
    unknown = [
        n
        for n in PRIORITY
        + PRIORITY_R7
        + PRIORITY_R8
        + PRIORITY_R9
        + PRIORITY_R10
        + PRIORITY_R11
        + PRIORITY_R12
        + PRIORITY_R13
        + PRIORITY_R14
        if n not in REGISTRY
    ]
    assert not unknown, f"window references unregistered queries: {unknown}"
    # consecutive windows must not overlap EXCEPT for changed-path
    # re-entries — a slot spent on an entry the previous window just
    # re-verified is wasted UNLESS its code path changed again this round
    # (ROTATION.md: a changed entry must re-earn its row the same round).
    # Historical pairs are audited against the frozen changed-list of the
    # round that justified the overlap; the latest pair against the
    # current round's list.
    overlap_89 = set(PRIORITY_R8) & set(PRIORITY_R9)
    assert overlap_89 <= set(CHANGED_R9), (
        f"unchanged entries repeated across the r8/r9 windows: "
        f"{sorted(overlap_89 - set(CHANGED_R9))}"
    )
    overlap_910 = set(PRIORITY_R9) & set(PRIORITY_R10)
    assert overlap_910 <= set(CHANGED_R10), (
        f"unchanged entries repeated across the r9/r10 windows: "
        f"{sorted(overlap_910 - set(CHANGED_R10))}"
    )
    overlap_1011 = set(PRIORITY_R10) & set(PRIORITY_R11)
    assert overlap_1011 <= set(CHANGED_R11), (
        f"unchanged entries repeated across the r10/r11 windows: "
        f"{sorted(overlap_1011 - set(CHANGED_R11))}"
    )
    overlap_1112 = set(PRIORITY_R11) & set(PRIORITY_R12)
    assert overlap_1112 <= set(CHANGED_R12), (
        f"unchanged entries repeated across the r11/r12 windows: "
        f"{sorted(overlap_1112 - set(CHANGED_R12))}"
    )
    overlap_1213 = set(PRIORITY_R12) & set(PRIORITY_R13)
    assert overlap_1213 <= set(CHANGED_R13), (
        f"unchanged entries repeated across the r12/r13 windows: "
        f"{sorted(overlap_1213 - set(CHANGED_R13))}"
    )
    overlap_1314 = set(PRIORITY_R13) & set(PRIORITY_R14)
    assert overlap_1314 <= set(CHANGED_THIS_ROUND), (
        f"unchanged entries repeat across consecutive windows: "
        f"{sorted(overlap_1314 - set(CHANGED_THIS_ROUND))}"
    )


def test_active_window_is_the_regression_rotation():
    """Round 8 on: the burn-down is complete, so the active window must be
    the regression rotation, opening with the current round's changed code
    paths (ROTATION.md)."""
    assert PRIORITY is PRIORITY_R14
    # r14 changed paths lead the window: the optimization round's
    # plan-moved entries (SemDeDup Arrow scoring, skew-hardened star
    # rounds, Arrow minhash banding, packed simhash, threshold-curve /
    # Weiszfeld / OPQ action cuts, setsim pairwise prefix bound)
    assert PRIORITY[: len(CHANGED_THIS_ROUND)] == CHANGED_THIS_ROUND


def test_changed_paths_reenter_the_active_window():
    """ROTATION.md rule: an entry whose code path changes this round must
    re-earn a driver row THIS round — its historical green row is stale
    the moment the code under it moves. Membership in the active window
    is the mechanical form of that rule."""
    unknown = [n for n in CHANGED_THIS_ROUND if n not in REGISTRY]
    assert not unknown, f"CHANGED_THIS_ROUND references unregistered: {unknown}"
    stale = [n for n in CHANGED_THIS_ROUND if n not in PRIORITY]
    assert not stale, (
        "entries changed this round but NOT scheduled for driver "
        f"re-verification: {stale} — swap them into PRIORITY"
    )


def test_queries_surface_priority_first():
    """The driver verifies the first 50 of queries() — the dict must open
    with exactly PRIORITY, in order, and every name must carry an oracle
    in oracle_sql() (the contract __spark_entry__ re-exports)."""
    from etl_data_spark.catalog import oracle_sql, queries

    q = list(queries())
    assert q[:50] == PRIORITY
    o = oracle_sql()
    assert all(n in o for n in PRIORITY)


def test_active_window_entries_are_oracle_backed():
    """The driver's hash gate only bites when an oracle exists — a
    rows-only entry in the window wastes a verification slot."""
    weak = [n for n in PRIORITY if REGISTRY[n].oracle is None]
    assert not weak, f"rows-only entries occupy window slots: {weak}"


def test_no_oracle_backed_entry_escapes_driver_coverage():
    """The r6-verdict bar: after the current window lands, the set
    {oracle-backed entries without a driver-green row} must be EMPTY.
    Historical green rows come from the committed CORRECTNESS_r*.json;
    the active window covers the rest. If this fails, an entry gained an
    oracle without being scheduled into any window — amend PRIORITY (or
    the pre-staged next window) in the same commit that registers it.
    """
    covered = _driver_green() | set(PRIORITY)
    missing = [
        n
        for n, spec in REGISTRY.items()
        if spec.oracle is not None and n not in covered
    ]
    assert not missing, (
        "oracle-backed entries scheduled into NO window and never "
        f"driver-green: {missing}"
    )
