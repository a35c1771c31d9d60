"""Targeted oracle-parity check: run only the named queries() entries
against their DuckDB oracles (driver-identical compare) at a given SF.

Usage: python scripts/parity_subset.py <sf_dir> name1 name2 ...
       python scripts/parity_subset.py <sf_dir> --grep substr
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as E  # noqa: E402
from tests.oracle_harness import (  # noqa: E402
    compare, driver_canon, duck_connection)

if len(sys.argv) < 3 or (sys.argv[2] == "--grep" and len(sys.argv) < 4):
    print(__doc__.strip(), file=sys.stderr)
    sys.exit(2)
SF = sys.argv[1]
if sys.argv[2] == "--grep":
    pat = sys.argv[3]
    names = [n for n in E.queries() if pat in n]
else:
    names = sys.argv[2:]

spark = (SparkSession.builder.master("local[8]")
         .appName("parity-subset").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

qs, oracles = E.queries(), E.oracle_sql()
con = duck_connection(SF)
fails = []
for name in names:
    t0 = time.time()
    try:
        d = qs[name](spark, SF)
        if name in oracles:
            res = compare(d, con, oracles[name])
            ok = res["hash"]
            detail = "" if ok else (
                f" rows={res['n_spark']}/{res['n_duck']} cols={res['cols']}")
        else:
            rows = [tuple(r) for r in d.collect()]
            driver_canon(d.columns, rows)
            ok, detail = True, f" rows-only n={len(rows)}"
    except Exception as ex:  # noqa: BLE001
        ok, detail = False, f" EXC {type(ex).__name__}: {ex}"
    print(f"{'OK ' if ok else 'FAIL'} {name:32s} "
          f"{time.time()-t0:5.1f}s{detail}", flush=True)
    if not ok:
        fails.append(name)

print(f"\n{len(names)-len(fails)}/{len(names)} pass")
sys.exit(1 if fails else 0)
