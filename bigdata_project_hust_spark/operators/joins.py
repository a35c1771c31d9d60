"""Join operators (SURVEY §2.3).

The reference's joins are driver-side dict probes
(consumer2.py:116-157) and a pandas merge (show.py:142). Here they are
declarative equi-joins: Catalyst picks broadcast-hash for the small
side automatically (verified in tests via the physical plan); at 100 TB
the dimension sides (nation/region/projects) stay broadcast while the
fact side never shuffles for the join at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def equi_join(left: DataFrame, right: DataFrame, on, how: str = "inner",
              broadcast_right: bool = False) -> DataFrame:
    """J1/J2: plain equi-join; optionally force-broadcast the right side.

    At fixture scale Catalyst broadcasts either way; the explicit hint
    is for dimension tables we *know* stay small at any SF (region,
    nation), where relying on size estimates is fragile after joins.
    """
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def keep_last(df: DataFrame, key_cols: list[str], order_col: str,
              tiebreak_col: str | None = None) -> DataFrame:
    """J3: deterministic last-write-wins dedup.

    The reference deduplicates by dict insertion (last record per URL
    wins, consumer2.py:131,141) — arrival-order-dependent. We make it
    deterministic: latest ``order_col`` wins, ties broken by
    ``tiebreak_col`` (SURVEY §4.3.2). One shuffle on the key; at scale
    this is the same shuffle the downstream join would need, so the
    window adds no extra exchange when keys align.
    """
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") == 1)
              .drop("__rn"))


def semi_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """EXISTS — left rows with a match (SURVEY §2.6 extension)."""
    return left.join(right, on, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, on) -> DataFrame:
    """NOT EXISTS — the reference's ``not in processed_files`` batch
    eligibility check (consumer2.py:322-323) expressed relationally."""
    return left.join(right, on, "left_anti")
