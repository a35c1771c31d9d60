"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1)
on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line.

Each query is fully materialized through the noop sink (count() would
let Catalyst prune the expensive columns and under-report).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bigdata_project_hust_spark.plans.queries import QUERIES  # noqa: E402
from bigdata_project_hust_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def sf_of(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> None:
    spark = get_spark("bench")
    # untimed warm-up: JVM class loading / codegen compiler spin-up is
    # session cost, not query cost
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    timings: dict[str, float] = {}
    names = [n for n, s in QUERIES.items() if s.headline]
    for name in names:
        fn = QUERIES[name].fn
        # one warm-up plan build is included — cold cost is the honest cost
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_of(SF_DIR),
        "n_queries": len(timings),
    }))


if __name__ == "__main__":
    main()
