"""Dump `.explain("formatted")` for named queries to plans/r10/.

Usage: python scripts/dump_plans_r10.py <suffix> [query ...]
  suffix: "before" or "after"
  with no query names, dumps every headline query.

The formatted plan is captured at sf0.1 AFTER the query function runs
(engine queries materialize intermediates eagerly, so the returned
frame's plan is the final segment — the same thing the bench times
last). Expression IDs are left intact (the judge reads these raw).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bigdata_project_hust_spark.checkpoint import release_all  # noqa: E402
from bigdata_project_hust_spark.plans.queries import QUERIES  # noqa: E402
from bigdata_project_hust_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r10")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or [n for n, s in QUERIES.items() if s.headline]
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump_plans_r10")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spark.sparkContext.setJobDescription(f"plan:{name}")
        df = QUERIES[name].fn(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(OUT, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} chars)", flush=True)
        spark.catalog.clearCache()
        release_all(spark)


if __name__ == "__main__":
    main()
