"""Round-21 extension queries: fulfillment analytics and market
concentration.

* ``order_fulfillment_cycle`` — days from order date to the order's
  LAST shipment, exact nearest-rank quartiles per order priority on
  the day grid (same tiny-grid rank pattern as
  repeat_purchase_intervals — the cycle domain is calendar-bounded,
  so no global row sort exists).
* ``supplier_concentration_hhi`` — Herfindahl–Hirschman index of
  supplier revenue concentration per nation: each supplier's share
  quantizes to e6 FIRST (one pinned division), then HHI = Σ share²
  div 1e6 is an exact BIGINT sum — merge-order-proof where a naive
  Σ(double²) is not.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .spec import QuerySpec, _t

QUERIES_ROUND21: dict[str, QuerySpec] = {}


def q_order_fulfillment_cycle(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    day = lambda c: F.floor(F.floor(F.unix_timestamp(F.col(c)))  # noqa: E731
                            .cast("long") / F.lit(86400)).cast("long")
    last_ship = (li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
                 .agg(F.max(day("l_shipdate")).alias("ship_day")))
    cyc = (o.join(last_ship, "o_orderkey")
           .select(F.col("o_orderpriority").alias("priority"),
                   (F.col("ship_day") - day("o_orderdate"))
                   .cast("long").alias("cycle_d")))
    grid = (cyc.groupBy("priority", "cycle_d")
            .agg(F.count("*").cast("long").alias("c")))
    gw = (Window.partitionBy("priority").orderBy("cycle_d")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tots = grid.groupBy("priority").agg(
        F.sum("c").cast("long").alias("n"))
    ranked = (grid.withColumn("cum", F.sum("c").over(gw).cast("long"))
              .join(tots, "priority"))

    def q_at(num: int, den: int):
        rank = F.expr(f"(n * {num} + {den} - 1) div {den}")
        return F.min(F.when(F.col("cum") >= rank, F.col("cycle_d")))

    return (ranked.groupBy("priority", "n")
            .agg(q_at(1, 4).alias("p25_days"),
                 q_at(2, 4).alias("p50_days"),
                 q_at(3, 4).alias("p75_days"))
            .select("priority", F.col("n").alias("n_orders"),
                    "p25_days", "p50_days", "p75_days")
            .orderBy("priority"))


def _oracle_cycle() -> str:
    return """
  WITH last_ship AS (
    SELECT l_orderkey AS o_orderkey,
           max(floor(floor(epoch(l_shipdate))::BIGINT / 86400))::BIGINT
             AS ship_day
    FROM lineitem GROUP BY 1
  ),
  cyc AS (
    SELECT o.o_orderpriority AS priority,
           (s.ship_day
            - floor(floor(epoch(o.o_orderdate))::BIGINT / 86400))::BIGINT
             AS cycle_d
    FROM orders o JOIN last_ship s USING (o_orderkey)
  ),
  grid AS (
    SELECT priority, cycle_d, count(*)::BIGINT AS c
    FROM cyc GROUP BY 1, 2
  ),
  ranked AS (
    SELECT priority, cycle_d,
           sum(c) OVER (PARTITION BY priority ORDER BY cycle_d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum,
           sum(c) OVER (PARTITION BY priority)::BIGINT AS n
    FROM grid
  )
  SELECT priority, n AS n_orders,
         min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN cycle_d END)
           AS p25_days,
         min(CASE WHEN cum >= (n * 2 + 3) // 4 THEN cycle_d END)
           AS p50_days,
         min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN cycle_d END)
           AS p75_days
  FROM ranked GROUP BY priority, n
  ORDER BY priority
"""


def q_supplier_concentration_hhi(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    rev = (li.groupBy(F.col("l_suppkey").alias("s_suppkey"))
           .agg(F.sum(F.floor(F.col("l_extendedprice") * 100))
                .cast("long").alias("rev")))
    per = (rev.join(F.broadcast(
               s.select("s_suppkey", "s_nationkey")), "s_suppkey")
           .join(F.broadcast(
               n.select(F.col("n_nationkey").alias("s_nationkey"),
                        "n_name")), "s_nationkey"))
    tot = per.groupBy("n_name").agg(
        F.sum("rev").cast("long").alias("t"))
    share = (per.join(tot, "n_name")
             .select("n_name",
                     F.floor(F.col("rev").cast("double")
                             * F.lit(1000000.0)
                             / F.col("t").cast("double"))
                     .cast("long").alias("sh")))
    return (share.groupBy("n_name")
            .agg(F.count("*").cast("long").alias("n_suppliers"),
                 F.expr("CAST(sum(sh * sh) div 1000000 AS BIGINT)")
                 .alias("hhi_e6"))
            .select(F.col("n_name").alias("nation"), "n_suppliers",
                    "hhi_e6")
            .orderBy("nation"))


def _oracle_hhi() -> str:
    return """
  WITH rev AS (
    SELECT l_suppkey AS s_suppkey,
           sum(floor(l_extendedprice * 100))::BIGINT AS rev
    FROM lineitem GROUP BY 1
  ),
  per AS (
    SELECT n.n_name, r.rev
    FROM rev r
    JOIN supplier s USING (s_suppkey)
    JOIN nation n ON n.n_nationkey = s.s_nationkey
  ),
  tot AS (SELECT n_name, sum(rev)::BIGINT AS t FROM per GROUP BY 1),
  share AS (
    SELECT p.n_name,
           floor(p.rev::DOUBLE * 1e6 / t.t::DOUBLE)::BIGINT AS sh
    FROM per p JOIN tot t USING (n_name)
  )
  SELECT n_name AS nation, count(*)::BIGINT AS n_suppliers,
         (sum(sh * sh) // 1000000)::BIGINT AS hhi_e6
  FROM share GROUP BY n_name
  ORDER BY nation
"""


QUERIES_ROUND21.update({
    "order_fulfillment_cycle": QuerySpec(
        q_order_fulfillment_cycle, _oracle_cycle(),
        doc="order→last-shipment cycle quartiles per priority "
            "(day-grid nearest-rank, no global sort)"),
    "supplier_concentration_hhi": QuerySpec(
        q_supplier_concentration_hhi, _oracle_hhi(),
        doc="Herfindahl supplier-revenue concentration per nation "
            "(e6 shares first, integer Σ share²)"),
})
