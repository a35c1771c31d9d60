"""A/B the co-purchase edge-build strategies at sf0.1.

v_join:   lineitem self-join on orderkey + distinct (current).
v_group:  groupBy orderkey -> sorted collect_set(partkey) -> explode
          index pairs executor-side -> distinct (one scan, one agg
          shuffle, combinatorics in the array program).
v_group2: same but pair generation via flatten(transform x transform).
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

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
WARM = "/root/testdata/sf0.001"

spark = get_spark("edge_variants")
spark.sparkContext.setLogLevel("ERROR")


def v_join(sf):
    li = gio.load_table(spark, sf, "lineitem")
    a = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pa"))
    b = li.select(F.col("l_orderkey").alias("ok"),
                  F.col("l_partkey").alias("pb"))
    return (a.join(b, "ok").where(F.col("pa") < F.col("pb"))
            .select("pa", "pb").distinct())


def v_group(sf):
    li = gio.load_table(spark, sf, "lineitem")
    parts = (li.groupBy("l_orderkey")
             .agg(F.array_sort(F.collect_set("l_partkey")).alias("ps")))
    # all index pairs i<j from the sorted per-order part array
    pairs = parts.select(F.explode(F.flatten(F.transform(
        "ps", lambda x, i: F.transform(
            F.slice("ps", i + 2, F.size("ps")),
            lambda y: F.struct(x.alias("pa"), y.alias("pb")))))).alias("e"))
    return pairs.select("e.pa", "e.pb").distinct()


VARIANTS = {"v_join": v_join, "v_group": v_group}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    # cross-validate once
    n1 = v_join(SF).count()
    n2 = v_group(SF).count()
    print(f"counts join={n1} group={n2} equal={n1 == n2}")
    for name, fn in VARIANTS.items():
        noop(fn(WARM))
        runs = []
        for _ in range(REPS):
            t0 = time.time()
            noop(fn(SF))
            runs.append(round(time.time() - t0, 3))
        print(f"{name:10s} median={statistics.median(runs):6.3f} runs={runs}",
              flush=True)


if __name__ == "__main__":
    main()
