"""Per-component timing for the bench heavy tail at sf0.1.

Times the sub-pipelines of the five heaviest headliners (each stage
fully materialized via the noop sink) to attribute the per-query cost:
edge build vs orientation vs wedge/closure vs label rounds, etc.
Fresh-session numbers; run after an untimed sf0.001 warm-up of the
same plan shapes so JIT cost is excluded (same discipline as bench.py).

Usage: python scripts/profile_heavy.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bigdata_project_hust_spark.session import get_spark  # noqa: E402
from bigdata_project_hust_spark import io as gio  # noqa: E402
from bigdata_project_hust_spark.operators import graph  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
WARM = "/root/testdata/sf0.001"

spark = get_spark("profile_heavy")
spark.sparkContext.setLogLevel("ERROR")


def li(sf):
    return gio.load_table(spark, sf, "lineitem")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


STAGES = {
    # (label, builder(sf) -> DataFrame)
    "edges_build": lambda sf: graph.copurchase_edges(li(sf)),
    "edges+degrees": lambda sf: graph.node_degrees(
        graph.copurchase_edges(li(sf))),
    "triangle_full": lambda sf: graph.triangle_count(
        graph.copurchase_edges(li(sf))),
    "clustering_full": lambda sf: graph.clustering_coefficient(
        graph.copurchase_edges(li(sf))),
    "lpa_full": lambda sf: graph.lpa_communities(
        graph.copurchase_edges(li(sf))),
}


def main():
    out = {}
    for name, build in STAGES.items():
        try:
            noop(build(WARM))  # JIT warm-up, untimed
        except Exception as exc:  # pragma: no cover
            print(f"warmup {name}: {exc}")
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            noop(build(SF))
            runs.append(round(time.time() - t0, 3))
        out[name] = runs
        print(f"{name:20s} median={statistics.median(runs):7.3f}  runs={runs}",
              flush=True)
    print(out)


if __name__ == "__main__":
    main()
