"""ANN/embedding-family scale probe (round 8): the 10× evidence for
the similarity operators, completing the probe set (graph:
scripts/graph_scale_probe.py, dedup: scripts/dedup_scale_probe.py).

The N× corpus is the sf0.1 embeddings table unioned with id-shifted
copies whose vectors are CYCLICALLY SHIFTED by the copy index — a
per-copy isometry (norms and all intra-copy distances preserved
exactly, so each copy contributes the same neighbor structure as the
original) while cross-copy neighborhoods are scrambled. What should
scale how:

- ivf_topk / ivf_pq_topk: inverted lists grow N× but nprobe/k stay
  fixed — near-linear in the probed-list size, tiny absolute times
  (serving-path queries).
- lsh_knn_join: bucketed self-join — near-linear while buckets stay
  balanced (the 100 TB claim), quadratic only if bucketing collapsed.
- semantic_dedup: auto-k ∝ n with routed assignment — the documented
  ~n^1.5 envelope; expect an exponent between 1 and 1.5.

Usage: python scripts/ann_scale_probe.py [N] [reps]   (default 10 2)
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

SHIFT = 10_000_000
DIM = 64


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from bigdata_project_hust_spark.checkpoint import release_all
    from bigdata_project_hust_spark import io as gio
    from bigdata_project_hust_spark.operators import similarity
    from bigdata_project_hust_spark.operators.similarity import (
        semantic_dedup)

    n_copies = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions",
                     os.environ.get("SPARK_GRAFT_PROBE_PARTS", "32"))
             .config("spark.driver.memory", "48g")
             .appName("ann-scale-probe").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    e1 = gio.load_table(spark, "/root/testdata/sf0.1", "embeddings") \
        .localCheckpoint()
    copies = []
    for k in range(n_copies):
        s = k % DIM
        emb = F.col("embedding") if s == 0 else F.concat(
            F.slice("embedding", s + 1, DIM - s),
            F.slice("embedding", 1, s))
        copies.append(e1.select(
            (F.col("vec_id") + F.lit(k * SHIFT)).alias("vec_id"),
            emb.alias("embedding"), F.col("label")))
    en = copies[0]
    for c in copies[1:]:
        en = en.unionAll(c)
    en = en.localCheckpoint()
    print(f"vectors: 1x={e1.count():,} {n_copies}x={en.count():,}",
          flush=True)

    ops = {
        "ivf_topk": lambda d: similarity.ivf_topk(
            d, query_id=0, k=10).count(),
        "ivf_pq_topk": lambda d: similarity.ivf_pq_topk(
            d, query_id=0, k=10, n_centroids=8, nprobe=2).count(),
        "lsh_knn_join": lambda d: similarity.lsh_knn_join(
            d, k=3).count(),
        "semantic_dedup": lambda d: semantic_dedup(
            d, k=None, iters=2, min_sim_e6=300000).count(),
    }
    for name, fn in ops.items():
        t = {}
        counts = {}
        for tag, d in (("1x", e1), (f"{n_copies}x", en)):
            times = []
            for _ in range(reps):
                t0 = time.time()
                counts[tag] = fn(d)
                times.append(time.time() - t0)
                spark.catalog.clearCache()
                release_all(spark)
            t[tag] = statistics.median(times)
            print(f"{name:15s} {tag:>4s} median {t[tag]:6.2f}s "
                  f"(rows={counts[tag]:,})", flush=True)
        big = f"{n_copies}x"
        ratio = t[big] / t["1x"] if t["1x"] else float("nan")
        exp = (math.log(ratio) / math.log(n_copies)
               if n_copies > 1 else float("nan"))
        print(f"{name:15s} ratio {ratio:.2f}x at {n_copies}x vectors "
              f"(exponent {exp:.2f})", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
