"""Machine-checked rotation policy for the driver's 50-slot window.

The driver's per-round correctness gate checks only the first 50
registry entries (queries/__init__.py CHECK_FIRST). The standing policy
— keep every query's green driver evidence fresh, oldest rotated first,
never-checked queries always prioritized — lived in prose comments
through round 6 and silently drifted (41 queries aged past the stated
bound). This module is the r6 verdict's fix: the policy is now DATA
(the computed rotation age bound, ROTATION_EXCEPTIONS) plus these tests, which parse
the actual CORRECTNESS_r*.json evidence and fail the suite when the
planned window would let any non-excepted query age out.
"""

from __future__ import annotations

import json
from pathlib import Path

from multichannel_commerce_data_pipeline_spark.queries import (
    CHECK_FIRST,
    ROTATION_AGE_BOUND_FLOOR,
    ROTATION_EXCEPTIONS,
    load_registry,
)


def rotation_age_bound(reg) -> int:
    """The tightest evidence-age bound a 50-slot window can physically
    sustain: a full sweep of the oracle-paired registry takes
    ceil(n/50) rounds, so demanding fresher-than-that evidence for
    every query is unsatisfiable (the failure mode of the original
    2-round prose bound). Grows automatically with the registry;
    never drops below the historical floor."""
    n = sum(1 for q in reg.values() if q.oracle is not None)
    return max(ROTATION_AGE_BOUND_FLOOR, -(-n // 50))


REPO = Path(__file__).resolve().parents[1]


def _evidence() -> tuple[int, dict[str, int]]:
    """(current_round, latest GREEN driver round per query). A red row
    is not evidence of correctness: only fully-matching rows count.
    current_round = the round whose window CHECK_FIRST currently plans
    (one past the newest recorded file)."""
    latest: dict[str, int] = {}
    rounds = []
    for f in sorted(REPO.glob("CORRECTNESS_r*.json")):
        r = int(f.stem.split("_r")[1])
        rounds.append(r)
        for name, res in json.loads(f.read_text()).items():
            green = (
                res.get("err") is None
                and res.get("rows_match")
                and res.get("schema_match") is not False
                and res.get("hash_match") is not False
            )
            if green:
                latest[name] = max(latest.get(name, 0), r)
    assert rounds, "no CORRECTNESS_r*.json evidence found"
    return max(rounds) + 1, latest


def test_window_is_exactly_the_driver_width():
    """The driver checks registry positions 1-50; a short window wastes
    slots on whatever sorts first in the tail, a long one silently
    truncates. 50 names, no duplicates, all registered, flagship
    first."""
    assert len(CHECK_FIRST) == 50
    assert len(set(CHECK_FIRST)) == 50
    reg = load_registry()
    assert set(CHECK_FIRST) <= set(reg)
    assert CHECK_FIRST[0] == "exec_daily_kpi"


def test_no_query_ages_past_the_bound():
    """A query is DUE when its latest green driver row is
    rotation_age_bound() rounds old (or it has never been green): it must
    hold a slot in the planned window or carry an unexpired declared
    exception. This is the check that would have flagged round 6's 41
    silently-stale queries."""
    current, latest = _evidence()
    reg = load_registry()
    overdue = []
    for name, q in reg.items():
        if q.oracle is None:
            continue  # rows-only checks; the driver records them weaker
        age = current - latest.get(name, -(10**6))
        if age < rotation_age_bound(reg) or name in CHECK_FIRST:
            continue
        exc = ROTATION_EXCEPTIONS.get(name)
        if exc is not None and exc[1] >= current:
            continue
        overdue.append((name, latest.get(name)))
    assert not overdue, (
        f"queries due for rotation but not in CHECK_FIRST and not "
        f"excepted (name, latest green round): {sorted(overdue)}"
    )


def test_exceptions_are_live_and_real():
    """Exceptions are data with an expiry so they cannot silently
    accumulate: each must name a registered query, carry a reason, and
    not be past its expiry round."""
    current, _ = _evidence()
    reg = load_registry()
    for name, (reason, expiry) in ROTATION_EXCEPTIONS.items():
        assert name in reg, f"exception for unregistered query {name}"
        assert reason.strip(), f"exception for {name} has no reason"
        assert expiry >= current, (
            f"exception for {name} expired at round {expiry} "
            f"(current {current}) — rotate it or renew with a reason"
        )
