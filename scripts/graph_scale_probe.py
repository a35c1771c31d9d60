"""Graph-family scale probe (VERDICT r6 #5): run the rebuilt graph
plans on the sf0.1 co-purchase graph and on a 10× id-shifted
replication of it, and verify the broadcast gates degrade gracefully
when the edge count crosses TRIANGLE/LPA_BROADCAST_MAX_EDGES.

No sf1 fixture exists in /root/testdata, so the 10× graph is the
sf0.1 edge list unioned with 9 id-shifted copies (offsets of k·10^7 —
far above the sf0.1 max part key, and 10 copies stay under 2^31 so
the packed-key eligibility is preserved). This preserves degree
structure exactly (10 disjoint copies), so per-copy algorithmic cost
is identical and the measured ratio isolates the engine's scaling
behavior.

Gate-crossover check: the 10× graph has ~12M directed-sym edges,
above the 4M broadcast gates, so LPA/triangle fall back to shuffle
joins — the probe asserts they complete (no OOM, no broadcast-size
error) and reports the timing ratio.

Usage: python scripts/graph_scale_probe.py [N] [op ...]
       (default N=10, all ops; name ops to probe a subset, e.g.
        `graph_scale_probe.py 20 lpa_communities k_core` for the
        VERDICT r9 #2 quiet-host 20× re-pin)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SHIFT = 10_000_000  # >> max sf0.1 part key (~20k), << 2^31 / 10


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from bigdata_project_hust_spark.checkpoint import release_all
    from bigdata_project_hust_spark import io as gio
    from bigdata_project_hust_spark.operators.graph import (
        clustering_coefficient, copurchase_edges, k_core,
        lpa_communities, triangle_count)

    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             # local mode = driver heap IS the cluster; the default 1g
             # OOMs on the 10x graph's localCheckpoint blocks — size it
             # like a real executor would be (measured: the 12M-edge
             # probe peaks well under this)
             .config("spark.driver.memory", "48g")
             .appName("graph-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    only = set(sys.argv[2:])
    li = gio.load_table(spark, "/root/testdata/sf0.1", "lineitem")
    e1 = copurchase_edges(li).localCheckpoint()
    n1 = e1.count()
    copies = [e1.select((F.col("pa") + F.lit(k * SHIFT)).alias("pa"),
                        (F.col("pb") + F.lit(k * SHIFT)).alias("pb"))
              for k in range(n_copies)]
    e10 = copies[0]  # "10x" tags kept for log continuity
    for c in copies[1:]:
        e10 = e10.unionAll(c)
    e10 = e10.localCheckpoint()
    n10 = e10.count()
    print(f"edges: 1x={n1:,} 10x={n10:,} "
          f"(gate=4,000,000 -> 1x {'under' if n1 <= 4e6 else 'over'}, "
          f"10x {'under' if n10 <= 4e6 else 'over'})", flush=True)

    ops = {
        "triangle_count": lambda e: triangle_count(e).agg(
            F.sum("n_triangles")).collect(),
        "clustering_coefficient": lambda e: clustering_coefficient(
            e).agg(F.sum("n_triangles")).collect(),
        "lpa_communities": lambda e: lpa_communities(e).groupBy(
            "community").count().orderBy(F.desc("count")).limit(5)
            .collect(),
        # the 3^rounds-lineage loop — the per-round localCheckpoint +
        # re-evaluated broadcast gate are exactly what this probe
        # exists to exercise at 10x
        "k_core": lambda e: k_core(e, k=3, rounds=6).agg(
            F.count("*"), F.sum("core_degree")).collect(),
    }
    if only:
        unknown = only - set(ops)
        if unknown:
            raise SystemExit(f"unknown ops: {sorted(unknown)} "
                             f"(have {sorted(ops)})")
        ops = {k: v for k, v in ops.items() if k in only}
    reps = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "2"))
    for name, fn in ops.items():
        t, tmin = {}, {}
        for tag, e in (("1x", e1), ("10x", e10)):
            times = []
            for _ in range(reps):
                t0 = time.time()
                fn(e)
                times.append(time.time() - t0)
                spark.catalog.clearCache()
                release_all(spark)
            t[tag] = statistics.median(times)
            tmin[tag] = min(times)
            print(f"{name:24s} {tag:>3s} median {t[tag]:6.2f}s "
                  f"min {tmin[tag]:6.2f}s "
                  f"(reps {['%.2f' % x for x in times]})", flush=True)
        import math

        def expo(d):
            r = d["10x"] / d["1x"]
            return math.log(r, n_copies) if r > 0 and n_copies > 1 \
                else float("nan")
        # min-based exponent is the structural number on a co-tenant
        # host: interference only ever ADDS time, so min-of-reps at
        # each size is the cleanest estimate of the engine's own cost
        print(f"{name:24s} ratio {t['10x'] / t['1x']:4.2f}x at "
              f"{n_copies}x edges (exponent median {expo(t):.2f} / "
              f"min {expo(tmin):.2f})", flush=True)


if __name__ == "__main__":
    main()
