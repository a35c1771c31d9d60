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


_POISSON1_CDF = (0.36787944117144233, 0.7357588823428847,
                 0.9196986029286058, 0.9810118431238462)
_H_RANGE = 1 << 60


def bootstrap_mean_ci(df: DataFrame, id_col: str, val_cents,
                      n_boot: int = 40) -> DataFrame:
    """Deterministic Poisson bootstrap of the mean (Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", 2012 — the
    standard distributed bootstrap: resample weights are per-row
    Poisson(1) draws, no global resample pass): ``n_boot`` replicate
    means, summarized as nearest-rank p05 / median / p95 — the
    confidence band a metrics pipeline attaches to every mean.

    Deterministic by construction: the Poisson draw for (row, b)
    inverts the CDF on the row's 60-bit ``stable_hash64(id:b)``
    against LITERAL integer thresholds (floor(cdf·2^60), shared with
    the oracle verbatim; weights capped at 4 — P ≈ 0.4%, absorbed
    into the cap bucket identically on both engines). Replicate sums
    are exact BIGINTs; each replicate mean is one pinned division on
    the c100 grid; the band is exact rank selection over ``n_boot``
    rows.

    Scale: the explode is a bounded ×n_boot fan-out of (id, cents,
    b) — the price of replicate independence; per-replicate partial
    sums combine map-side so the shuffle carries n_boot rows per
    partition."""
    from pyspark.sql import Window
    from ..functions.scalar import stable_hash64
    t = [int(p * _H_RANGE) for p in _POISSON1_CDF]
    d = df.select(F.col(id_col).cast("string").alias("__id"),
                  val_cents.cast("long").alias("__v"))
    b = df.sparkSession.range(n_boot).select(
        F.col("id").cast("long").alias("__b"))
    e = d.crossJoin(F.broadcast(b))
    u = stable_hash64(F.concat(F.col("__id"), F.lit(":"),
                               F.col("__b").cast("string")))
    w = (F.when(u < t[0], F.lit(0)).when(u < t[1], F.lit(1))
         .when(u < t[2], F.lit(2)).when(u < t[3], F.lit(3))
         .otherwise(F.lit(4))).cast("long")
    reps = (e.select("__b", w.alias("__w"), F.col("__v"))
            .groupBy("__b")
            .agg(F.sum("__w").cast("long").alias("n_w"),
                 F.sum(F.col("__w") * F.col("__v")).cast("long")
                  .alias("s_w")))
    mean_c = (F.when(F.col("n_w") > 0,
                     F.floor(F.col("s_w").cast("double")
                             / F.col("n_w").cast("double")))
              .otherwise(F.lit(0))).cast("long")
    ranked = reps.select(mean_c.alias("m")).select(
        "m",
        F.row_number().over(Window.orderBy("m")).alias("rn"))
    lo_r = max(1, -(-5 * n_boot // 100))      # ceil(0.05·B)
    med_r = (n_boot + 1) // 2
    hi_r = -(-95 * n_boot // 100)             # ceil(0.95·B)
    pick = ranked.groupBy().agg(
        F.max(F.when(F.col("rn") == lo_r, F.col("m"))).alias("p05_c"),
        F.max(F.when(F.col("rn") == med_r, F.col("m"))).alias("med_c"),
        F.max(F.when(F.col("rn") == hi_r, F.col("m"))).alias("p95_c"))
    base = d.groupBy().agg(
        F.count("*").cast("long").alias("n_rows"),
        F.floor(F.sum("__v").cast("double")
                / F.count("*").cast("double")).cast("long")
         .alias("mean_c"))
    return (base.crossJoin(F.broadcast(pick))
            .select("n_rows", "mean_c",
                    F.col("p05_c").cast("long").alias("p05_c"),
                    F.col("med_c").cast("long").alias("med_c"),
                    F.col("p95_c").cast("long").alias("p95_c"),
                    F.lit(n_boot).cast("long").alias("n_boot")))
