"""Generated audit note for the computed 50-slot checked window.

Replaces the hand-written CHECK_FIRST comment (rounds 5-9): prints each
seated query's priority class and evidence age so the round's window
plan is reviewable without reverse-engineering plan_window(). Run from
the repo root:

    python scripts/window_audit.py
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


if __name__ == "__main__":
    main()
