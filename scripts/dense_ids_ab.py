"""A/B the dense_ids rank mechanism at driver parallelism (ADVICE r9 #3).

Old shape: repartitionByRange + Window.partitionBy(spark_partition_id())
— the window's required distribution re-hashes the already-colocated
vocabulary by pid, i.e. a SECOND vocabulary-sized exchange.
New shape (shipped): repartitionByRange + sortWithinPartitions +
monotonically_increasing_id bit-ops — one exchange, one in-partition
sort, no window over the vocabulary.

Both variants are timed end-to-end through the same consumer (the
offsets join + a count over (col, __sid)) under the driver protocol
(local[32], shuffle=32, hygiene per rep).  Usage:

    python scripts/dense_ids_ab.py [mults...]   # default 1 10
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
from pyspark.sql import SparkSession, functions as F, Window  # noqa: E402

from bigdata_project_hust_spark.checkpoint import materialize, release_all  # noqa: E402
from bigdata_project_hust_spark.operators import dedup  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("SPARK_GRAFT_PROBE_REPS", "3"))

spark = (SparkSession.builder.master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "48g")
         .config("spark.ui.enabled", "false")
         .appName("dense-ids-ab").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")


def old_dense_ids(values, col):
    nparts = spark.sparkContext.defaultParallelism
    ranked = (values.repartitionByRange(nparts, col)
              .withColumn("__pid", F.spark_partition_id())
              .withColumn("__rn", F.row_number().over(
                  Window.partitionBy("__pid").orderBy(col))))
    ranked = materialize(ranked, "old_dense_ids_ranked", prefer="local")
    offs = (ranked.groupBy("__pid").agg(F.count("*").alias("__c"))
            .withColumn("__off", F.coalesce(
                F.sum("__c").over(
                    Window.orderBy("__pid")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0)))
            .select("__pid", "__off"))
    return (ranked.join(F.broadcast(offs), "__pid")
            .select(col, (F.col("__off") + F.col("__rn"))
                    .alias("__sid")))


def vocab(n: int):
    """n synthetic distinct ~48-char strings — the shape of a shingle
    vocabulary (string keys, no skew) without the shingling cost
    burying the rank under test."""
    return (spark.range(n)
            .select(F.concat_ws("-", F.md5(F.col("id").cast("string")),
                                F.col("id").cast("string")).alias("sh")))


def run(fn, v):
    t0 = time.time()
    ids = fn(v, "sh")
    n = ids.select(F.count("*"), F.max("__sid"), F.min("__sid")).collect()[0]
    dt = time.time() - t0
    assert n[2] == 1 and n[0] == n[1], n  # dense 1..n both shapes
    return dt, n[0]


for nv in [int(a) for a in sys.argv[1:]] or [5_000_000, 20_000_000]:
    for label, fn in [("old-window", old_dense_ids),
                      ("new-monoid", dedup.dense_ids)]:
        times = []
        for _ in range(REPS):
            spark.catalog.clearCache()
            release_all(spark)
            dt, n = run(fn, vocab(nv))
            times.append(dt)
        times.sort()
        med = times[len(times) // 2]
        print(f"vocab={n:>11,} {label}: "
              f"median {med:6.2f}s  reps {['%.2f' % t for t in times]}",
              flush=True)

spark.stop()
