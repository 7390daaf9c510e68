"""Generated audit note for the computed 50-slot checked window.

Replaces the hand-written CHECK_FIRST comment (rounds 5-9): prints each
seated query's priority class and evidence age so the round's window
plan is reviewable without reverse-engineering plan_window(). Run from
the repo root:

    python scripts/window_audit.py            # this round's window
    python scripts/window_audit.py --future N # simulate N rounds ahead

The --future mode assumes every planned window sweeps green round after
round (the planner's steady state) and reports, per simulated round,
any due-but-unseated rows and whether a declared exception covers them
— the tool that verified the r14 displacement bulge drains by r17.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from multichannel_commerce_data_pipeline_spark import queries as Q  # noqa: E402
from multichannel_commerce_data_pipeline_spark.queries import (  # noqa: E402
    FLAGSHIP,
    changed_effective,
    evidence,
    load_registry,
)


def main() -> None:
    current, latest = evidence()
    reg = load_registry()
    window = Q.CHECK_FIRST
    # same single-sourced expiry rule the planner and tests consume
    changed = changed_effective(current)
    n_paired = sum(1 for q in reg.values() if q.oracle is not None)
    print(
        f"window plan for round {current}: {len(window)} slots, "
        f"registry {len(reg)} ({n_paired} oracle-paired)"
    )
    counts: dict[str, int] = {}
    for i, name in enumerate(window, 1):
        if name == FLAGSHIP:
            cls = "flagship"
        elif name in changed:
            cls = "changed"
        elif name not in latest:
            cls = "never-green"
        else:
            cls = f"age {current - latest[name]} (last green r{latest[name]})"
        counts[cls] = counts.get(cls, 0) + 1
        print(f"{i:3d}  {name:40s} {cls}")
    print("---")
    for cls, n in sorted(counts.items()):
        print(f"{n:3d}  {cls}")


def simulate_future(n_rounds: int) -> None:
    """Assume each planned window sweeps green and report every future
    round's due-but-unseated rows against the declared exceptions —
    the drain schedule of a displacement bulge, machine-checked."""
    from multichannel_commerce_data_pipeline_spark.queries import (
        ROTATION_EXCEPTIONS,
        plan_window,
    )

    current, latest = evidence()
    reg = load_registry()
    paired = [n for n in reg if reg[n].oracle is not None]
    bound = max(Q.ROTATION_AGE_BOUND_FLOOR, -(-len(paired) // 50))
    lat = dict(latest)
    for n in Q.CHECK_FIRST:  # this round's window, assumed green
        lat[n] = current
    for rnd in range(current + 1, current + 1 + n_rounds):
        w = plan_window(latest=lat, changed=(), current=rnd)
        seated = set(w)
        slips = []
        for n in paired:
            if rnd - lat.get(n, -(10**6)) < bound or n in seated:
                continue
            exc = ROTATION_EXCEPTIONS.get(n)
            # same rule as the overdue test: an exception covers only
            # its DECLARED slip rounds (ADVICE r14)
            covered = exc is not None and rnd in exc[1] and exc[2] >= rnd
            slips.append((n, "excepted" if covered else "UNCOVERED"))
        tag = ", ".join(f"{n} [{c}]" for n, c in sorted(slips)) or "none"
        print(f"r{rnd}: due-but-unseated: {tag}")
        for n in w:
            lat[n] = rnd


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--future":
        simulate_future(int(sys.argv[2]))
    else:
        main()
