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
            if isinstance(v, (list, dict, set, tuple, bytearray)) or (
                    type(v).__module__ == "numpy" and hasattr(v, "ndim")
                    and v.ndim > 0):
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
    # NO integral-float -> int normalization here: the real driver hashes
    # "3.0" != "3" when one engine types a column float64 and the other
    # int64 (e.g. DuckDB HUGEINT -> pandas float64 — the r03
    # `sessionize_events` red). The harness must be exactly as strict.
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if hasattr(v, "item") and type(v).__module__ == "numpy":
        v = v.item()
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    try:
        if pd.isna(v):
            return "␀"
    except (TypeError, ValueError):
        pass
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
    # Fetch BOTH sides through pandas, like the real driver, so dtype
    # coercions surface in-repo: DuckDB HUGEINT and nullable ints become
    # float64, Decimals may widen, etc. Fetching via fetchall()/collect()
    # hid exactly this class of bug in r03 (sessionize_events).
    s_pdf = spark_df.toPandas()
    s_cols = list(s_pdf.columns)
    s_rows = [tuple(r) for r in s_pdf.itertuples(index=False, name=None)]
    d_pdf = con.execute(sql).df()
    d_cols = list(d_pdf.columns)
    d_rows = [tuple(r) for r in d_pdf.itertuples(index=False, name=None)]
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
