"""Round-22 extension queries: two closing warehouse views.

* ``nation_trade_balance`` — per nation, revenue earned by its
  suppliers vs revenue spent by its customers, and the net balance —
  the dual-role-dimension view (TPC-H Q7's nation plays both sides;
  here both aggregates land in ONE row per nation). Two independent
  fact rollups joined on the 25-row nation dimension — each rollup is
  a broadcast-dimension join + map-side-combined agg; the final join
  is dimension-sized.
* ``discount_band_lift`` — quantity and revenue per discount band
  (integer percent), with each band's mean quantity vs the zero-band
  baseline at e6 — the promo-effectiveness readout. One scan, one
  tiny-key groupBy, a broadcast of the baseline row.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .spec import QuerySpec, _t

QUERIES_ROUND22: dict[str, QuerySpec] = {}


def q_nation_trade_balance(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    cents = F.floor(F.col("l_extendedprice") * 100).cast("long")
    supply = (li.join(F.broadcast(s.select(
                  F.col("s_suppkey").alias("l_suppkey"), "s_nationkey")),
                  "l_suppkey")
              .groupBy(F.col("s_nationkey").alias("nk"))
              .agg(F.sum(cents).cast("long").alias("earned_cents")))
    spend = (li.join(o.select(F.col("o_orderkey").alias("l_orderkey"),
                              "o_custkey"), "l_orderkey")
             .join(F.broadcast(c.select(
                 F.col("c_custkey").alias("o_custkey"), "c_nationkey")),
                 "o_custkey")
             .groupBy(F.col("c_nationkey").alias("nk"))
             .agg(F.sum(cents).cast("long").alias("spent_cents")))
    return (n.select(F.col("n_nationkey").alias("nk"),
                     F.col("n_name").alias("nation"))
            .join(supply, "nk", "left")
            .join(spend, "nk", "left")
            .select("nation",
                    F.coalesce("earned_cents", F.lit(0)).cast("long")
                     .alias("earned_cents"),
                    F.coalesce("spent_cents", F.lit(0)).cast("long")
                     .alias("spent_cents"),
                    (F.coalesce("earned_cents", F.lit(0))
                     - F.coalesce("spent_cents", F.lit(0))).cast("long")
                    .alias("balance_cents"))
            .orderBy("nation"))


def _oracle_balance() -> str:
    return """
  WITH supply AS (
    SELECT s.s_nationkey AS nk,
           sum(floor(l.l_extendedprice * 100))::BIGINT AS earned_cents
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY 1
  ),
  spend AS (
    SELECT c.c_nationkey AS nk,
           sum(floor(l.l_extendedprice * 100))::BIGINT AS spent_cents
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY 1
  )
  SELECT n.n_name AS nation,
         coalesce(su.earned_cents, 0)::BIGINT AS earned_cents,
         coalesce(sp.spent_cents, 0)::BIGINT AS spent_cents,
         (coalesce(su.earned_cents, 0)
          - coalesce(sp.spent_cents, 0))::BIGINT AS balance_cents
  FROM nation n
  LEFT JOIN supply su ON su.nk = n.n_nationkey
  LEFT JOIN spend sp ON sp.nk = n.n_nationkey
  ORDER BY nation
"""


def q_discount_band_lift(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    band = F.floor(F.col("l_discount") * 100 + F.lit(0.5)).cast("long")
    per = (li.select(band.alias("discount_pct"),
                     F.floor("l_quantity").cast("long").alias("q"),
                     F.floor(F.col("l_extendedprice") * 100).cast("long")
                      .alias("rc"))
           .groupBy("discount_pct")
           .agg(F.count("*").cast("long").alias("n_lines"),
                F.sum("q").cast("long").alias("total_qty"),
                F.sum("rc").cast("long").alias("revenue_cents")))
    base = (per.where(F.col("discount_pct") == 0)
            .select(F.col("total_qty").alias("bq"),
                    F.col("n_lines").alias("bn")))
    lift = F.floor(F.col("total_qty").cast("double")
                   * F.col("bn").cast("double") * F.lit(1000000.0)
                   / (F.col("n_lines").cast("double")
                      * F.col("bq").cast("double"))).cast("long")
    return (per.crossJoin(F.broadcast(base))
            .select("discount_pct", "n_lines", "total_qty",
                    "revenue_cents", lift.alias("qty_lift_e6"))
            .orderBy("discount_pct"))


def _oracle_discount() -> str:
    return """
  WITH per AS (
    SELECT floor(l_discount * 100 + 0.5)::BIGINT AS discount_pct,
           count(*)::BIGINT AS n_lines,
           sum(floor(l_quantity))::BIGINT AS total_qty,
           sum(floor(l_extendedprice * 100))::BIGINT AS revenue_cents
    FROM lineitem GROUP BY 1
  ),
  base AS (
    SELECT total_qty AS bq, n_lines AS bn FROM per WHERE discount_pct = 0
  )
  SELECT p.discount_pct, p.n_lines, p.total_qty, p.revenue_cents,
         floor(p.total_qty::DOUBLE * b.bn::DOUBLE * 1e6
               / (p.n_lines::DOUBLE * b.bq::DOUBLE))::BIGINT
           AS qty_lift_e6
  FROM per p, base b
  ORDER BY p.discount_pct
"""


QUERIES_ROUND22.update({
    "nation_trade_balance": QuerySpec(
        q_nation_trade_balance, _oracle_balance(),
        doc="per-nation supplier earnings vs customer spend and net "
            "balance (dual-role dimension, one row per nation)"),
    "discount_band_lift": QuerySpec(
        q_discount_band_lift, _oracle_discount(),
        doc="per-discount-band volume/revenue with mean-quantity lift "
            "vs the zero-discount baseline (e6)"),
})
