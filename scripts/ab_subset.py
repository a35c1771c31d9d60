"""Paired same-session A/B of an env toggle over a query subset.

    python scripts/ab_subset.py KEY=valA,valB q1 q2 ... [reps]

One SparkSession; per rep the states run back-to-back (A,B,A,B,...) so
host drift hits both arms equally — the adjudication protocol VERDICT
r7 asked for on the token-frame materialize default.  Queries are
materialized through the noop sink (same protocol as bench.py); cache
is cleared between runs so arms never share a persisted frame.
Prints per-query medians per state and the B/A ratio.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_project_hust_spark.checkpoint import release_all  # noqa: E402
from bigdata_project_hust_spark.plans.queries import QUERIES  # noqa: E402
from bigdata_project_hust_spark.session import get_spark  # noqa: E402

if len(sys.argv) < 3 or "=" not in sys.argv[1]:
    print(__doc__.strip(), file=sys.stderr)
    sys.exit(2)

key, _, vals = sys.argv[1].partition("=")
states = vals.split(",")
reps = int(sys.argv[-1]) if sys.argv[-1].isdigit() else 3
names = [a for a in sys.argv[2:] if not a.isdigit()]
unknown = [n for n in names if n not in QUERIES]
if unknown:
    print(f"unknown queries: {unknown}", file=sys.stderr)
    sys.exit(2)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = os.environ.get("SPARK_GRAFT_WARM_SF_DIR", "/root/testdata/sf0.001")

spark = get_spark("ab-subset")
spark.sparkContext.setLogLevel("ERROR")

for name in names:  # JIT warm-up per state (codegen differs per plan)
    for st in states:
        os.environ[key] = st
        QUERIES[name].fn(spark, WARM).write.format("noop") \
            .mode("overwrite").save()
spark.catalog.clearCache()
release_all(spark)

times: dict[str, dict[str, list[float]]] = {
    n: {s: [] for s in states} for n in names}
for rep in range(reps):
    for name in names:
        for st in states:
            os.environ[key] = st
            spark.catalog.clearCache()
            release_all(spark)
            t0 = time.time()
            QUERIES[name].fn(spark, SF_DIR).write.format("noop") \
                .mode("overwrite").save()
            dt = time.time() - t0
            times[name][st].append(dt)
            print(f"rep{rep} {name:28s} {key}={st:10s} {dt:6.2f}s",
                  flush=True)
os.environ.pop(key, None)

print(f"\n| query | {' | '.join(states)} | {states[-1]}/{states[0]} |")
print("|---|" + "---|" * (len(states) + 1))
for name in names:
    meds = [statistics.median(times[name][s]) for s in states]
    ratio = meds[-1] / meds[0] if meds[0] else float("nan")
    print(f"| {name} | " + " | ".join(f"{m:.2f}s" for m in meds)
          + f" | {ratio:.2f}x |")
