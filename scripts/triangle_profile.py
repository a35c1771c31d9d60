"""Profile the triangle-count adjacency-intersection fallback at 10×
(VERDICT r7 #8): attribute time between (a) the oriented-edge build,
(b) the collect_list adjacency build, and (c) the two array joins +
intersection + per-node agg — and A/B whether MATERIALIZING the adj
frame (it feeds BOTH joins; AQE does not reuse an exchange across
consumers, so left lazy its groupBy+collect_list subtree runs twice)
beats the current lazy build.

Usage: python scripts/triangle_profile.py [reps]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SHIFT = 10_000_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from bigdata_project_hust_spark import io as gio
    from bigdata_project_hust_spark.checkpoint import materialize
    from bigdata_project_hust_spark.operators.graph import (
        copurchase_edges, node_degrees)

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .appName("triangle-profile").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    li = gio.load_table(spark, "/root/testdata/sf0.1", "lineitem")
    e1 = copurchase_edges(li).localCheckpoint()
    copies = [e1.select((F.col("pa") + F.lit(k * SHIFT)).alias("pa"),
                        (F.col("pb") + F.lit(k * SHIFT)).alias("pb"))
              for k in range(10)]
    e10 = copies[0]
    for c in copies[1:]:
        e10 = e10.unionAll(c)
    e10 = e10.localCheckpoint()
    print(f"10x edges: {e10.count():,}", flush=True)

    def run_variant(mat_adj: bool) -> dict[str, float]:
        """The intersect fallback, staged so each phase is timed."""
        t: dict[str, float] = {}
        t0 = time.time()
        deg = node_degrees(e10)
        dx = deg.select(F.col("node").alias("x"), F.col("d").alias("dx"))
        dy = deg.select(F.col("node").alias("y"), F.col("d").alias("dy"))
        ranked = e10.select(F.col("pa").alias("x"),
                            F.col("pb").alias("y")) \
            .join(dx, "x").join(dy, "y")
        lower_first = (F.col("dx") < F.col("dy")) | (
            (F.col("dx") == F.col("dy")) & (F.col("x") < F.col("y")))
        oriented = materialize(ranked.select(
            F.when(lower_first, F.col("x")).otherwise(F.col("y"))
             .alias("lo"),
            F.when(lower_first, F.col("y")).otherwise(F.col("x"))
             .alias("hi")), "tp_oriented", strategy="local")
        t["orient"] = time.time() - t0

        t0 = time.time()
        adj = (oriented.groupBy(F.col("lo").alias("n"))
               .agg(F.sort_array(F.collect_list("hi")).alias("nbrs")))
        if mat_adj:
            adj = materialize(adj, "tp_adj", strategy="local")
        t["adj_build"] = time.time() - t0  # ~0 when lazy

        t0 = time.time()
        tris = (oriented
                .join(adj.select(F.col("n").alias("lo"),
                                 F.col("nbrs").alias("na")), "lo")
                .join(adj.select(F.col("n").alias("hi"),
                                 F.col("nbrs").alias("nb")), "hi", "left")
                .select(F.col("lo").alias("c"), F.col("hi").alias("u"),
                        F.explode(F.array_intersect(
                            "na", F.coalesce("nb", F.slice("na", 1, 0))))
                        .alias("v")))
        per_node = (tris.select(F.explode(F.array("c", "u", "v"))
                                .alias("node"))
                    .groupBy("node").agg(F.count("*").alias("n_triangles")))
        total = per_node.agg(F.sum("n_triangles")).collect()[0][0]
        t["intersect"] = time.time() - t0
        t["total"] = sum(t.values())
        t["tri_sum"] = float(total)
        for f in (oriented, adj) if mat_adj else (oriented,):
            f.unpersist()
        return t

    sums = set()
    for tag, mat in (("lazy-adj", False), ("mat-adj", True)):
        per: dict[str, list[float]] = {}
        for _ in range(reps):
            r = run_variant(mat)
            sums.add(r.pop("tri_sum"))
            for k, v in r.items():
                per.setdefault(k, []).append(v)
        meds = {k: statistics.median(v) for k, v in per.items()}
        print(f"{tag:9s} " + "  ".join(
            f"{k}={v:6.2f}s" for k, v in meds.items()), flush=True)
    print(f"triangle sums agree across variants: {len(sums) == 1}")
    spark.stop()


if __name__ == "__main__":
    main()
