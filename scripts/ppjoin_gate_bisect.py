"""PPJoin prefix-materialize gate bisect at driver parallelism
(VERDICT r9 #3): A/B SPARK_GRAFT_PPJOIN_PREF=off vs local on
sf0.1 × {1, 4, 10} documents under the driver protocol (local[32],
shuffle=32, clearCache + release_all between reps), bracketing the
1M-shingle auto gate (sf0.1 ≈ 260k shingles → 4× ≈ 1.04M just above,
10× ≈ 2.6M well above).

Replication is the rot-alphabet construction from
tests/test_scale_exponents.py: token boundaries and intra-copy dup
structure preserved exactly, cross-copy shingles disjoint.

Usage: python scripts/ppjoin_gate_bisect.py [reps]   (default 2)
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

ALPHA = "abcdefghijklmnopqrstuvwxyz"
SHIFT = 10_000_000


def main() -> None:
    from pyspark.sql import SparkSession, functions as F

    from bigdata_project_hust_spark import io as gio
    from bigdata_project_hust_spark.checkpoint import release_all
    from bigdata_project_hust_spark.operators import dedup

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .appName("ppjoin-gate-bisect").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    d1 = (gio.load_table(spark, "/root/testdata/sf0.1", "documents")
          .select("doc_id", "text", "source").localCheckpoint())

    def replicate(n: int):
        copies = []
        for k in range(n):
            rot = ALPHA[k % 26:] + ALPHA[:k % 26]
            txt = F.translate(F.col("text"), ALPHA + ALPHA.upper(),
                              rot + rot.upper())
            copies.append(d1.select(
                (F.col("doc_id") + F.lit(k * SHIFT)).alias("doc_id"),
                txt.alias("text"), F.col("source")))
        out = copies[0]
        for c in copies[1:]:
            out = out.unionAll(c)
        return out.localCheckpoint()

    sizes = {1: d1, 4: replicate(4), 10: replicate(10)}
    for n, d in sizes.items():
        n_sh = dedup.shingles(d, "text", "doc_id").count()
        print(f"{n:2d}x: {d.count():,} docs, {n_sh:,} shingles "
              f"({'above' if n_sh >= dedup.PPJOIN_PREF_MAT_MIN_SHINGLES else 'below'} gate)",
              flush=True)

    for n, d in sizes.items():
        row = {}
        for mode in ("off", "local"):
            os.environ["SPARK_GRAFT_PPJOIN_PREF"] = mode
            times = []
            for _ in range(reps):
                t0 = time.time()
                dedup.ngram_jaccard_prefix(d).count()
                times.append(time.time() - t0)
                spark.catalog.clearCache()
                release_all(spark)
            row[mode] = statistics.median(times)
            print(f"{n:2d}x pref={mode:5s} median {row[mode]:6.2f}s "
                  f"(reps {['%.2f' % t for t in times]})", flush=True)
        best = min(row, key=row.get)
        print(f"{n:2d}x WINNER pref={best} "
              f"({row[best]:.2f}s vs {max(row.values()):.2f}s, "
              f"{max(row.values()) / row[best]:.2f}x)", flush=True)
    os.environ.pop("SPARK_GRAFT_PPJOIN_PREF", None)


if __name__ == "__main__":
    main()
