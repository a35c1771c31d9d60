"""Regenerate `_CHECK_FIRST` in plans/queries.py from the CORRECTNESS
record (the rotation duty VERDICT r5–r8 flagged whenever done by hand).

Ordering produced:
  1. names with NO driver row in any CORRECTNESS_r*.json (never
     checked — union coverage first), in registry order;
  2. every other ORACLED name stale-first: ascending by the round of
     its most recent driver row, within-round order preserved;
  3. permanently rows-only names (spec.oracle is None) sunk to the
     back — their driver check can never say more than "ran, n rows",
     so they must not consume front-50 slots (VERDICT r9 nit #4).

The driver checks the first 50 names each round, so after its sweep
lands, re-running this script moves the freshly-checked names to the
back automatically — the standing per-round ritual is exactly:

    python scripts/rotate_check_first.py            # rewrite the list
    python scripts/driver_sim.py /root/testdata/sf0.001   # re-verify
    git commit

Use --dry-run to print the planned front-50 without writing.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QPATH = os.path.join(ROOT, "bigdata_project_hust_spark/plans/queries.py")


def planned_order() -> list[str]:
    from bigdata_project_hust_spark.plans.queries import QUERIES

    last: dict[str, int] = {}
    rounds = sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json")))
    per_round: dict[int, list[str]] = {}
    for path in rounds:
        rnum = int(re.search(r"_r(\d+)\.json$", path).group(1))
        names = list(json.load(open(path)))
        per_round[rnum] = names
        for n in names:
            # max(): order-independent even if a round file is ever
            # unpadded (r9 vs r10) or rounds reach 3 digits (ADVICE r9)
            last[n] = max(last.get(n, -1), rnum)
    order = [n for n in QUERIES if n not in last]  # never checked
    for rnum in sorted(per_round):
        for n in per_round[rnum]:
            if last.get(n) == rnum and n not in order and n in QUERIES:
                order.append(n)
    # sink permanently rows-only names: stable partition, staleness
    # order preserved within each class
    order = ([n for n in order if QUERIES[n].oracle is not None]
             + [n for n in order if QUERIES[n].oracle is None])
    # names green in some round but since renamed/removed drop out via
    # the `n in QUERIES` guard; anything still missing is a bug
    missing = set(QUERIES) - set(order)
    if missing:
        raise SystemExit(f"BUG: names unaccounted for: {sorted(missing)}")
    return order


def main() -> None:
    order = planned_order()
    if "--dry-run" in sys.argv:
        print(f"{len(order)} names; front-50:")
        for n in order[:50]:
            print(f"  {n}")
        return
    src = open(QPATH).read()
    start = src.index("_CHECK_FIRST = [")
    # anchor on the closing bracket at line start: a ']' inside an
    # inline comment or string must not truncate the splice
    m = re.search(r"^\]", src[start:], re.M)
    end = start + m.end()
    body = "".join(f'    "{n}",\n' for n in order)
    src = src[:start] + "_CHECK_FIRST = [\n" + body + "]" + src[end:]
    open(QPATH, "w").write(src)
    print(f"_CHECK_FIRST rewritten: {len(order)} names, "
          f"front-5 = {order[:5]}")


if __name__ == "__main__":
    main()
