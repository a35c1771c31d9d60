"""Per-query bench continuity across rounds: prints a table of every
recorded BENCH_r{N}.json plus (optionally) a fresh local run piped in.

    python scripts/bench_compare.py              # recorded rounds only
    python bench.py | python scripts/bench_compare.py -   # + current

Flags queries whose latest time regressed >20% vs the previous round
(the same threshold the round-1 verdict asked to watch). Note r03+
records best-of-2 per query (see bench.py) — earlier rounds are
single-run, so cross-round deltas before/after the change conflate
methodology; within-method deltas are the signal.
"""

from __future__ import annotations

import glob
import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
rounds: list[tuple[str, dict]] = []
for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
    with open(path) as f:
        d = json.load(f)
    # the driver wraps bench.py's JSON line under "parsed"
    rounds.append((os.path.basename(path)[6:-5], d.get("parsed", d)))
if len(sys.argv) > 1 and sys.argv[1] == "-":
    rounds.append(("cur", json.loads(sys.stdin.read().strip().splitlines()[-1])))

names: list[str] = []
for _, d in rounds:
    for q in d.get("queries", {}):
        if q not in names:
            names.append(q)

w = max(len(n) for n in names) + 1
print(f"{'query':<{w}}" + "".join(f"{r:>8}" for r, _ in rounds))
flagged = []
for n in names:
    vals = [d.get("queries", {}).get(n) for _, d in rounds]
    print(f"{n:<{w}}" + "".join(
        f"{v:>8.2f}" if v is not None else f"{'—':>8}" for v in vals))
    present = [v for v in vals if v is not None]
    if len(present) >= 2 and present[-1] > 1.2 * present[-2]:
        flagged.append((n, present[-2], present[-1]))
print(f"{'TOTAL':<{w}}" + "".join(
    f"{d.get('value', 0):>8.2f}" for _, d in rounds))
if flagged:
    print("\nregressed >20% vs previous recorded round:")
    for n, a, b in flagged:
        print(f"  {n}: {a:.2f} -> {b:.2f}")
