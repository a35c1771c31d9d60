"""Data-quality constraint audit (deequ / dbt-test style).

A pipeline that ingests 100 TB needs its invariants checked as QUERIES,
not as assumptions: null-rate on key columns, key uniqueness, and
referential integrity between fact and dimension tables. ``audit``
evaluates a set of declared constraints and returns one tall frame
``(chk, col_name, n_violations)`` — zero rows violated is itself a
hashable, regression-testable result.

Plan shape: all not-null and uniqueness checks for a table fold into a
SINGLE aggregate pass over it (one scan, partial aggs); each
referential check is one anti-join against the dimension (broadcast
when the dimension is small). Nothing is collected to the driver.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def audit(df: DataFrame,
          not_null: tuple[str, ...] = (),
          unique: tuple[str, ...] = (),
          refs: tuple[tuple[str, DataFrame, str], ...] = ()) -> DataFrame:
    """Evaluate constraints over ``df``.

    - ``not_null``: columns that must never be null.
    - ``unique``: columns whose non-null values must be distinct
      (violations = non-null count − distinct count).
    - ``refs``: (col, dim_df, dim_key) foreign-key checks; violations =
      rows whose col value has no match in the dimension (left anti).
      A null FK has no match and therefore counts as a violation here —
      pair with a ``not_null`` check on the same column to tell the two
      cases apart in the report.
    """
    parts: list[DataFrame] = []
    scalar_aggs, labels = [], []
    for c in not_null:
        scalar_aggs.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"nn_{c}"))
        labels.append(("not_null", c, f"nn_{c}"))
    for c in unique:
        scalar_aggs.append(
            (F.count(F.col(c)) - F.count_distinct(F.col(c)))
            .alias(f"uq_{c}"))
        labels.append(("unique", c, f"uq_{c}"))
    if scalar_aggs:
        one = df.agg(*scalar_aggs)
        stack_args = ", ".join(
            f"'{chk}', '{col}', {alias}" for chk, col, alias in labels)
        parts.append(one.select(F.expr(
            f"stack({len(labels)}, {stack_args}) "
            "AS (chk, col_name, n_violations)")))
    for col, dim, dim_key in refs:
        dangling = (df.join(dim, df[col] == dim[dim_key], "left_anti")
                      .agg(F.count("*").alias("n")))
        parts.append(dangling.select(
            F.lit("ref").alias("chk"), F.lit(col).alias("col_name"),
            F.col("n").cast("long").alias("n_violations")))
    if not parts:
        raise ValueError("no constraints declared")
    return reduce(lambda a, b: a.unionByName(b), parts)
