"""Simulate the driver: vanilla SparkSession (no engine configs),
import __spark_entry__, smoke entry(), then run every queries() entry
against oracle_sql() via DuckDB at sf0.01."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from bigdata_project_hust_spark.checkpoint import release_all  # noqa: E402
from tests.oracle_harness import (  # noqa: E402
    compare, driver_canon, duck_connection)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (SparkSession.builder.master("local[8]")
         .appName("driver-sim").getOrCreate())  # deliberately vanilla
spark.sparkContext.setLogLevel("ERROR")

t0 = time.time()
df = E.entry(spark)
rows = df.collect()
print(f"entry(): {len(rows)} rows, schema={df.columns}, "
      f"{time.time()-t0:.1f}s", flush=True)
assert len(rows) > 0

qs, oracles = E.queries(), E.oracle_sql()
con = duck_connection(SF)
fails = []
for name, fn in qs.items():
    t0 = time.time()
    try:
        d = fn(spark, SF)
        if name in oracles:
            res = compare(d, con, oracles[name])
            ok = res["hash"]
            detail = "" if ok else f" rows={res['n_spark']}/{res['n_duck']} cols={res['cols']}"
        else:
            # the real driver canonicalizes even rows-only results —
            # replicate so complex-typed outputs fail here first
            rows = [tuple(r) for r in d.collect()]
            driver_canon(d.columns, rows)
            ok, detail = True, f" rows-only n={len(rows)}"
    except Exception as ex:  # noqa: BLE001
        ok, detail = False, f" EXC {type(ex).__name__}: {ex}"
    # free the query's pinned blocks (persisted frames AND
    # localCheckpoint RDDs): 370 sequential queries in one session
    # otherwise accumulate block-manager garbage for the whole run
    spark.catalog.clearCache()
    release_all(spark)
    status = "OK " if ok else "FAIL"
    print(f"{status} {name:32s} {time.time()-t0:5.1f}s{detail}", flush=True)
    if not ok:
        fails.append(name)

print(f"\n{len(qs)-len(fails)}/{len(qs)} pass")
sys.exit(1 if fails else 0)
