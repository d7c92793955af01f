"""Audit the driver-gate rotation: staleness of every registered query.

The driver's correctness harness checks only the FIRST 50 registry
entries each round, so queries age out of ground-truth coverage unless
the rotation (queries_registry._GATE_HEAD) is recomputed every round.
Two rounds slipped on hand-counted rotations (r4 boundary slip, r5
comment drift) — this tool derives the numbers instead.

Run: python tools/gate_audit.py
Prints, per registered query, the round of its last CORRECTNESS row (or
NEVER), whether it is inside the upcoming window, and fails (exit 1) if
any query would end the upcoming round more than 2 rounds stale.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

REPO = Path(__file__).resolve().parents[1]


def main() -> int:
    from stockpulse_batch_realtime_etl_spark.queries_registry import (
        QUERIES,
        _GATE_HEAD,
        _GATE_NEXT,
    )

    last_row: dict[str, int] = {}
    rounds = sorted(
        int(p.stem.split("_r")[1]) for p in REPO.glob("CORRECTNESS_r*.json")
    )
    for r in rounds:
        for name in json.load(open(REPO / f"CORRECTNESS_r{r:02d}.json")):
            last_row[name] = r
    if not rounds:
        print("no CORRECTNESS artifacts found")
        return 1
    current, upcoming = rounds[-1], rounds[-1] + 1

    head = set(_GATE_HEAD)
    stale_after: list[tuple[str, str]] = []
    late_new: list[str] = []
    for name in QUERIES:
        last = last_row.get(name)
        tag = f"r{last}" if last else "NEVER"
        in_head = name in head
        if last is None:
            # a new registration may lag ONE round: it must be in the
            # upcoming window or at the front of the queue (guaranteed to
            # gate the round after)
            if not in_head and (
                name not in _GATE_NEXT
                or _GATE_NEXT.index(name) >= len(_GATE_HEAD)
            ):
                late_new.append(name)
        else:
            # after the upcoming round runs, how stale is this query?
            effective = upcoming if in_head else last
            if upcoming - effective > 2:
                stale_after.append((name, tag))
        marker = "HEAD" if in_head else (
            f"next[{_GATE_NEXT.index(name)}]" if name in _GATE_NEXT else "tail"
        )
        print(f"  {name:34s} last={tag:6s} {marker}")

    print(
        f"\nregistered={len(QUERIES)}  window={len(_GATE_HEAD)}  "
        f"queued={len(_GATE_NEXT)}  artifacts=r{rounds[0]}..r{current}"
    )
    if late_new:
        print(f"NEVER-GATED and not queued front-of-line: {late_new}")
        return 1
    if stale_after:
        print(
            f"would be >2 rounds stale after r{upcoming} "
            f"({len(stale_after)}): {stale_after}"
        )
        return 1
    print(f"rotation OK: nothing ends r{upcoming} more than 2 rounds stale")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
