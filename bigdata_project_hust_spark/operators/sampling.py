"""Deterministic sampling, splitting, and per-group capping
(training-data-pipeline extensions).

Random sampling (``df.sample`` / ``sampleBy``) is seeded per-engine and
per-partitioning — rerun the pipeline after a repartition and the
sample changes, and no external system can reproduce it. A reproducible
pipeline samples by HASH: membership is a pure function of the row key,
so resharding, retries, engine swaps, and the DuckDB oracle all agree
bit-for-bit. This is the standard trick for train/val/test splits that
must stay stable across pipeline versions (a row never migrates between
splits when the corpus grows — membership depends only on its own key).

All three operators are one Catalyst expression away from the scan
(sample/split) or one key-partitioned window (cap) — nothing here
shuffles more than the rows it keeps, at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..functions.scalar import stable_hash64

BUCKETS = 10_000  # basis-point granularity


def hash_bucket(id_col: Column | str, seed: int = 7) -> Column:
    """Deterministic bucket in [0, 10000) from the row key — the
    shared primitive under sample/split (mirrored in oracle SQL via
    stable_hash64_sql % 10000)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(stable_hash64(c.cast("string"), seed), F.lit(BUCKETS))


def deterministic_sample(df: DataFrame, id_col: str, rate_bp: int,
                         seed: int = 7) -> DataFrame:
    """Keep ~rate_bp/10000 of rows, membership a pure function of the
    key: stable across reruns, repartitions, and engines."""
    return df.where(hash_bucket(id_col, seed) < rate_bp)


def split_assign(df: DataFrame, id_col: str,
                 splits: tuple[tuple[str, int], ...] = (
                     ("train", 8000), ("val", 1000), ("test", 1000)),
                 seed: int = 13) -> DataFrame:
    """Assign every row a split label by hash-bucket range (weights in
    basis points, summing to 10000). A row's split never changes when
    other rows are added or removed."""
    total = sum(bp for _, bp in splits)
    if total != BUCKETS:
        raise ValueError(f"split weights must sum to {BUCKETS}, got {total}")
    b = hash_bucket(id_col, seed)
    expr, lo = None, 0
    for name, bp in splits:
        cond = b < F.lit(lo + bp)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
        lo += bp
    return df.withColumn("split", expr)


def cap_per_group(df: DataFrame, group_col: str, id_col: str, n: int,
                  seed: int = 21) -> DataFrame:
    """Cap each group at ``n`` rows, chosen deterministically (ordered
    by key hash, key as tiebreak) — corpus balancing, e.g. "at most N
    documents per domain/language". One window over the group key; the
    hash ordering makes the kept subset a uniform-ish, reproducible
    choice rather than whatever sort order the scan produced."""
    w = Window.partitionBy(group_col).orderBy(
        hash_bucket(id_col, seed).asc(), F.col(id_col).asc())
    return (df.withColumn("__rn", F.row_number().over(w))
              .where(F.col("__rn") <= n)
              .drop("__rn"))
