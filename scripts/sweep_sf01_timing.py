"""Time EVERY registered query once at sf0.1 (the bench scale) in one
engine-configured session — the slow-tail audit the headline bench set
can't provide (round 5 found an uncapped 123 s query this way; the
headline set had missed it because it was never promoted).

    python scripts/sweep_sf01_timing.py [sf_dir] [top_n]

Prints every query slower than 1 s plus the top-N table, and writes the
full sorted timing list to /tmp/sweep_sf01_timing.json.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bigdata_project_hust_spark.session import get_spark  # noqa: E402

import __spark_entry__ as E  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
TOP = int(sys.argv[2]) if len(sys.argv) > 2 else 25

spark = get_spark()
spark.sparkContext.setLogLevel("ERROR")

qs = E.queries()
times: dict[str, float] = {}
fails: list[str] = []
for i, (name, fn) in enumerate(qs.items()):
    t0 = time.time()
    try:
        n = fn(spark, SF).count()
        dt = time.time() - t0
        times[name] = round(dt, 3)
        if dt > 1.0:
            print(f"{i+1:3d}/{len(qs)} SLOW {name:40s} {dt:6.1f}s "
                  f"n={n}", flush=True)
    except Exception as ex:  # noqa: BLE001
        fails.append(name)
        print(f"{i+1:3d}/{len(qs)} FAIL {name:40s} "
              f"{type(ex).__name__}: {ex}", flush=True)

order = sorted(times.items(), key=lambda kv: -kv[1])
print(f"\n=== top {TOP} of {len(times)} (fails: {len(fails)}) ===")
for name, dt in order[:TOP]:
    print(f"{name:44s} {dt:7.2f}s")
with open("/tmp/sweep_sf01_timing.json", "w") as f:
    json.dump({"sf": SF, "fails": fails, "times": dict(order)}, f, indent=1)
print("\nwrote /tmp/sweep_sf01_timing.json")
sys.exit(1 if fails else 0)
