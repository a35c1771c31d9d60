"""Local twin of the driver's DuckDB-oracle compare: row count, column
names, and an order-insensitive value hash. Used by tests to catch
cross-engine mismatches before the driver does."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def driver_canon(cols: list[str], rows: list[tuple]) -> None:
    """Replicates the real driver's pandas canonicalization pass: build
    a DataFrame and `sort_values` by every column. The driver does this
    for EVERY queries() entry (even rows-only ones), and pandas raises
    `TypeError: unhashable type` on array/map/struct cells — which is
    exactly how two round-1 queries ERR'd while this harness said OK.
    We additionally reject non-scalar cells explicitly (stricter than
    pandas, which happens not to choke on single-row frames) so no
    complex-typed output can slip through again."""
    for r in rows:
        for v in r:
            if isinstance(v, (list, dict, set, tuple, bytearray)):
                raise TypeError(
                    f"non-scalar cell {type(v).__name__} — the driver's "
                    "pandas canonicalizer cannot hash this; serialize the "
                    "column to a string in the query and its oracle")
    df = pd.DataFrame(rows, columns=list(cols))
    if len(df.columns) and len(df):
        df.sort_values(by=sorted(df.columns), kind="mergesort")


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm_cell(v) -> str:
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(v)
    return str(v)


def value_hash(rows: list[tuple], col_order: list[int]) -> str:
    lines = sorted(
        "\x1f".join(_norm_cell(r[i]) for i in col_order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns {'rows': bool, 'cols': bool, 'hash': bool, ...detail}.

    Raises (like the real driver) if either side's result contains
    cells the driver's pandas canonicalizer cannot sort/hash."""
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()
    driver_canon(s_cols, s_rows)
    driver_canon(d_cols, d_rows)
    s_order = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
    d_order = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
    res = {
        "rows": len(s_rows) == len(d_rows),
        "cols": sorted(s_cols) == sorted(d_cols),
        "n_spark": len(s_rows), "n_duck": len(d_rows),
        "spark_cols": s_cols, "duck_cols": d_cols,
    }
    res["hash"] = (res["rows"] and res["cols"]
                   and value_hash(s_rows, s_order) == value_hash(d_rows, d_order))
    return res
