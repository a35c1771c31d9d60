"""Sort / limit / top-K operators (SURVEY §2.5).

``orderBy().limit(k)`` compiles to TakeOrderedAndProject — each
partition keeps a k-element heap, the driver merges P heaps: no global
sort, no shuffle of the full data. Per-group top-k uses a rank window,
which shuffles once on the group key — the right trade at 100 TB when
groups are many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def top_k(df: DataFrame, order_col: str, k: int,
          tiebreak_col: str | None = None, ascending: bool = False) -> DataFrame:
    """T1/T2: global top-k with a deterministic tiebreak (the reference's
    pandas sort+head, show.py:187,239 — made order-stable so results are
    reproducible and oracle-comparable)."""
    order = [F.col(order_col).asc() if ascending else F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    return df.orderBy(*order).limit(k)


def top_k_per_group(df: DataFrame, group_cols: list[str], order_col: str,
                    k: int, tiebreak_col: str | None = None,
                    rank_name: str = "rnk") -> DataFrame:
    """Per-group top-k via row_number — the one idiom Spark needs where
    the reference used pandas sort+head per selection (SURVEY §7.1)."""
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).asc())
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn(rank_name, F.row_number().over(w))
              .where(F.col(rank_name) <= k))


def diversified_topk(df: DataFrame, diversity_col: str, score_col: str,
                     tiebreak_col: str, per_group: int,
                     k: int) -> DataFrame:
    """Diversity-capped global top-k (the MMR-lite every retrieval
    serving layer runs): at most ``per_group`` rows per diversity
    bucket survive a PARTITIONED rank window (parallel across
    buckets), then the global k comes from orderBy+limit over the
    ≤ per_group·|buckets| survivors — TakeOrdered's per-partition
    heap, never a global rank window over all rows."""
    w = Window.partitionBy(diversity_col).orderBy(
        F.col(score_col).desc(), F.col(tiebreak_col).asc())
    capped = (df.withColumn("group_rank", F.row_number().over(w))
                .where(F.col("group_rank") <= per_group))
    return (capped.orderBy(F.col(score_col).desc(),
                           F.col(tiebreak_col).asc())
                  .limit(k))
