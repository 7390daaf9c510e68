"""Machine-checked rotation policy for the driver's 50-slot window.

The driver's per-round correctness gate checks only the first 50
registry entries. Through round 9 the window (queries/__init__.py
CHECK_FIRST) was a hand-written tuple, and this suite's job was to
catch a human letting evidence go stale — which it did, but with a
design flaw: the driver writes CORRECTNESS_r{N}.json AFTER the
builder's turn, so the hand-typed window was one round stale (and this
suite red) at every round boundary until someone re-typed 50 names.
Since round 10 the window is COMPUTED from the on-disk evidence by
queries.plan_window(); these tests now guard the PLANNER's invariants
(flagship first, no overdue query omitted, changed/never-green queries
seated, determinism) instead of guarding a human against typos. The
suite is green the moment a new CORRECTNESS file lands, with zero
manual edits.
"""

from __future__ import annotations

from multichannel_commerce_data_pipeline_spark import queries as Q
from multichannel_commerce_data_pipeline_spark.queries import (
    CHANGED_THIS_ROUND,
    FLAGSHIP,
    ROTATION_AGE_BOUND_FLOOR,
    ROTATION_EXCEPTIONS,
    changed_effective,
    evidence,
    load_registry,
    plan_window,
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


def test_window_is_exactly_the_driver_width():
    """The driver checks registry positions 1-50; a short window wastes
    slots on whatever sorts first in the tail, a long one silently
    truncates. 50 names, no duplicates, all registered and
    oracle-paired, flagship first, and load_registry() actually seats
    them in positions 1-50."""
    window = Q.CHECK_FIRST
    assert len(window) == 50
    assert len(set(window)) == 50
    assert window[0] == FLAGSHIP
    reg = load_registry()
    assert set(window) <= set(reg)
    assert all(reg[n].oracle is not None for n in window)
    assert list(reg)[:50] == list(window)


def test_no_query_ages_past_the_bound():
    """A query is DUE when its latest green driver row is
    rotation_age_bound() rounds old (or it has never been green): the
    planner must seat it. Oldest-first filling makes this hold by
    construction for any registry that once swept clean; this test is
    the tripwire against a planner bug (or a registry growth spurt)
    breaking that."""
    current, latest = evidence()
    reg = load_registry()
    window = set(Q.CHECK_FIRST)
    bound = rotation_age_bound(reg)
    overdue = []
    for name, q in reg.items():
        if q.oracle is None:
            continue  # rows-only checks; the driver records them weaker
        age = current - latest.get(name, -(10**6))
        if age < bound or name in window:
            continue
        exc = ROTATION_EXCEPTIONS.get(name)
        # honored only in the exception's DECLARED slip rounds: a
        # shared catch-all expiry must not mask an unrelated planner
        # regression that drops the name in some other round
        # (ADVICE r14)
        if exc is not None and current in exc[1] and exc[2] >= current:
            continue
        overdue.append((name, latest.get(name)))
    assert not overdue, (
        f"queries due for rotation omitted from the planned window and "
        f"not excepted (name, latest green round): {sorted(overdue)}"
    )


def test_changed_and_never_green_are_seated():
    """Priority (2): every LIVE changed declaration and every
    oracle-paired query with no green driver row ever must hold a slot.
    The changed-set comes from changed_effective() — the SAME function
    the planner consumes — so the expiry rule cannot diverge between
    planner and test (the r10 boundary-red bug: this test read the raw
    CHANGED_THIS_ROUND constant while plan_window() correctly expired
    it once the declared round's evidence landed)."""
    current, latest = evidence()
    reg = load_registry()
    window = set(Q.CHECK_FIRST)
    changed = changed_effective(current)
    p2 = {
        n
        for n, q in reg.items()
        if q.oracle is not None and (n in changed or n not in latest)
    }
    assert len(p2) <= 49, f"priority-2 set overflows the window: {len(p2)}"
    unseated = p2 - window
    assert not unseated, f"changed/never-green queries not seated: {sorted(unseated)}"
    for n in CHANGED_THIS_ROUND:
        assert n in reg and reg[n].oracle is not None, (
            f"CHANGED_THIS_ROUND names an unregistered or no-oracle query: {n}"
        )


def test_planner_is_deterministic():
    """Same evidence + same changed-set -> byte-identical window, and
    the cached module attribute agrees with a fresh computation."""
    assert plan_window() == plan_window() == Q.CHECK_FIRST


def test_planner_priorities_on_synthetic_evidence():
    """Unit-test the planner against hand-built evidence: flagship
    first, changed seated even when fresh, never-green seated, then
    strictly oldest-first alphabetical fill."""
    reg = load_registry()
    paired = sorted(n for n in reg if reg[n].oracle is not None)
    # everything green last round except one never-green and one stale
    latest = {n: 9 for n in paired}
    stale = paired[5]
    latest[stale] = 2
    never = paired[7]
    del latest[never]
    fresh_changed = paired[11]
    w = plan_window(latest=latest, changed=(fresh_changed,))
    assert w[0] == FLAGSHIP
    assert set(w[1:3]) == {never, fresh_changed}  # priority 2, alphabetical
    assert w[3] == stale  # oldest green evidence rotates first
    assert len(w) == 50 and len(set(w)) == 50


def test_exceptions_are_live_and_real():
    """Exceptions are data with an expiry so they cannot silently
    accumulate: each must name a registered query, carry a reason, a
    nonempty set of declared slip rounds no later than the expiry, and
    not be past its expiry round."""
    current, _ = evidence()
    reg = load_registry()
    for name, (reason, slip_rounds, expiry) in ROTATION_EXCEPTIONS.items():
        assert name in reg, f"exception for unregistered query {name}"
        assert reason.strip(), f"exception for {name} has no reason"
        assert slip_rounds, f"exception for {name} declares no slip round"
        assert all(r <= expiry for r in slip_rounds), (
            f"exception for {name} declares a slip round past its own "
            f"expiry {expiry}: {sorted(slip_rounds)}"
        )
        assert expiry >= current, (
            f"exception for {name} expired at round {expiry} "
            f"(current {current}) — rotate it or renew with a reason"
        )


def test_changed_declaration_expires_after_its_round():
    """A CHANGED_THIS_ROUND declaration made for round N must be
    ignored when planning round N+1 (the driver has written N's
    evidence by then) — forgetting to clear the tuple can never waste
    priority-2 slots in a later round."""
    from multichannel_commerce_data_pipeline_spark.queries import (
        CHANGED_IN_ROUND,
    )

    if not CHANGED_THIS_ROUND:
        return  # nothing declared this round; nothing to expire
    reg = load_registry()
    paired = sorted(n for n in reg if reg[n].oracle is not None)
    pick = CHANGED_THIS_ROUND[0]
    # declared query FRESH, everything else one round older
    latest = {n: CHANGED_IN_ROUND - 1 for n in paired}
    latest[pick] = CHANGED_IN_ROUND
    # planning the declaration's own round: seated as priority 2
    w_now = plan_window(latest=latest, current=CHANGED_IN_ROUND)
    assert pick in w_now[1 : 1 + len(CHANGED_THIS_ROUND)]
    # planning a later round: expired — fresh evidence, oldest-first
    # fill passes it over (hundreds of older candidates for 49 slots)
    w_next = plan_window(latest=latest, current=CHANGED_IN_ROUND + 1)
    assert pick not in w_next


def test_planner_survives_a_fresh_checkout_with_no_evidence():
    """Before any driver run (no CORRECTNESS_r*.json), every query is
    never-green; the planner must fill the window alphabetically and
    never raise — CHECK_FIRST gates load_registry(), so a crash here
    would take down bench.py, check.py, and the driver contract."""
    w = plan_window(latest={}, changed=(), current=1)
    assert len(w) == 50 and w[0] == FLAGSHIP
    assert list(w[1:]) == sorted(w[1:])


def test_bootstrap_with_live_changed_declaration_does_not_crash():
    """ADVICE r11 (medium): in the zero-evidence bootstrap every query
    is never-green; changed declarations that sort alphabetically past
    slot 49 must still be SEATED (changed-first filling), not dropped —
    the old single alphabetical priority-2 pool raised RuntimeError at
    registry load in exactly the state the evidence() docstring
    promises to survive. Never-green overflow stays a warning."""
    import warnings

    reg = load_registry()
    paired = sorted(n for n in reg if reg[n].oracle is not None)
    late = tuple(n for n in paired if n != FLAGSHIP)[-3:]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        w = plan_window(latest={}, changed=late, current=1)
        # the direct ADVICE repro: defaulted changed-set, no evidence
        w_default = plan_window(latest={}, current=1)
    assert len(w) == 50 and w[0] == FLAGSHIP
    assert set(late) == set(w[1:4])  # declarations seated first
    assert len(w_default) == 50 and w_default[0] == FLAGSHIP
    live = set(changed_effective(1))
    assert live <= set(w_default), "live declarations dropped at bootstrap"


def test_r14_displaced_rows_seat_first_next_round():
    """The five due rows the r14 new-query cohort displaced (declared
    in ROTATION_EXCEPTIONS with slip round 14 and the shared bulge
    expiry, r17) must be the FIRST oldest-
    first seats when round 15 is planned over evidence in which they
    alone remain at the r9 vintage — the planner repays the exception
    automatically, no hand input. Skipped naturally once the r14
    exceptions are rotated out."""
    try:
        from multichannel_commerce_data_pipeline_spark.queries import (
            _R14_DISPLACED,
        )
    except ImportError:
        return  # exceptions rotated out in a later round
    displaced = sorted(_R14_DISPLACED)
    reg = load_registry()
    paired = sorted(n for n in reg if reg[n].oracle is not None)
    # synthetic r15 planning state: everything green at r14 except the
    # displaced five, still carrying their r9 row
    latest = {n: 14 for n in paired}
    for n in displaced:
        latest[n] = 9
    w = plan_window(latest=latest, changed=(), current=15)
    assert w[0] == FLAGSHIP
    assert list(w[1 : 1 + len(displaced)]) == displaced
