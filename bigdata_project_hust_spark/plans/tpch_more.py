"""Extended TPC-H query shapes (adapted to the reduced fixture schema).

The fixtures carry a reduced TPC-H: no ``partsupp``, no
``l_receiptdate``/``l_commitdate``/``l_shipmode``, single-word
``p_type`` values, synthetic ``NATION_k`` names.  Each shape below keeps
the canonical query's JOIN/AGG/SUBQUERY structure — the part that
exercises the optimizer — with filter constants re-anchored to the
fixture domains (orderdate 1995-2001, p_size 1-50, quantity 1-50).

Reference parity: the reference engine's query surface is MongoDB
aggregations + Spark-consumer reports (reference consumer2.py:1-355);
these shapes extend it to the standard warehouse-benchmark classes a
user migrating from the reference would expect of a full engine.

Cross-engine exactness follows the rules at the top of ``queries.py``:
rounded 2-decimal revenue sums, ``::DOUBLE`` literals in DuckDB,
epoch-long dates, floor-scaled e6 ratios, deterministic tiebreaks under
every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .spec import QuerySpec, _t


# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations (dual-role dimension join)
# ---------------------------------------------------------------------------

def q_tpch_q7_shape(spark, sf_dir):
    """TPC-H Q7 shape: the same ``nation`` dimension joins TWICE under
    different roles (supplier nation, customer nation), restricted to a
    nation pair in both directions, revenue by (supp, cust, year).

    Scale design: both nation copies broadcast (25 rows at any SF); the
    pair predicate prunes 2/25² of the fact rows only AFTER the
    supplier/customer joins, so the supplier and customer joins
    broadcast too (100 / 1500-per-SF rows) — the only shuffle is the
    final 3-key aggregate, which is partial-aggregated map-side."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01")))
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"))
    j = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(s, li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n1), s.s_nationkey == F.col("sn_key"))
           .join(F.broadcast(n2), c.c_nationkey == F.col("cn_key"))
           .where(((F.col("supp_nation") == "NATION_3")
                   & (F.col("cust_nation") == "NATION_7"))
                  | ((F.col("supp_nation") == "NATION_7")
                     & (F.col("cust_nation") == "NATION_3"))))
    return (j.groupBy("supp_nation", "cust_nation",
                      F.year("l_shipdate").alias("l_year"))
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (F.lit(1) - F.col("l_discount"))), 2)
                   .alias("revenue"))
             .orderBy("supp_nation", "cust_nation", "l_year"))


ORACLE_TPCH_Q7 = """
  SELECT supp_nation, cust_nation, l_year,
         round(sum(volume), 2) AS revenue
  FROM (
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           year(l_shipdate) AS l_year,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n1 ON s_nationkey = n1.n_nationkey
    JOIN nation n2 ON c_nationkey = n2.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
        OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  ) shipping
  GROUP BY supp_nation, cust_nation, l_year
  ORDER BY supp_nation, cust_nation, l_year
"""


# ---------------------------------------------------------------------------
# Q8 — market share (conditional-sum ratio over a filtered star join)
# ---------------------------------------------------------------------------

def q_tpch_q8_shape(spark, sf_dir):
    """TPC-H Q8 shape (national market share): 7-way star join filtered
    by region + part type, then per-year ratio of one nation's volume
    to total volume.  The ratio is a conditional-sum over the SAME scan
    (sum(CASE)/sum — one pass, no self-join), floor-scaled to an e6
    long for cross-engine hashing.

    Scale design: region/nation/part-filtered dims all broadcast; the
    two fact-side shuffles (li⋈o, ⋈c) are key-partitioned joins AQE can
    also convert to broadcast at low SF; final agg groups on ~years
    rows — a near-scalar reduce."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01")))
    c = _t(spark, sf_dir, "customer")
    s = _t(spark, sf_dir, "supplier")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_region"))
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"))
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(F.broadcast(n1), c.c_nationkey == F.col("cn_key"))
           .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
           .join(s, li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n2), s.s_nationkey == F.col("sn_key")))
    return (j.groupBy(F.year("o_orderdate").alias("o_year"))
             .agg(F.floor(
                      F.sum(F.when(F.col("supp_nation") == "NATION_5",
                                   vol).otherwise(F.lit(0.0)))
                      / F.sum(vol) * 1e6).cast("long")
                   .alias("mkt_share_e6"))
             .orderBy("o_year"))


ORACLE_TPCH_Q8 = """
  SELECT year(o_orderdate) AS o_year,
         floor(sum(CASE WHEN supp_nation = 'NATION_5' THEN volume
                        ELSE 0.0::DOUBLE END)
               / sum(volume) * 1e6)::BIGINT AS mkt_share_e6
  FROM (
    SELECT o_orderdate, n2.n_name AS supp_nation,
           l_extendedprice * (1 - l_discount) AS volume
    FROM lineitem
    JOIN part     ON l_partkey = p_partkey
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  ) all_nations
  GROUP BY year(o_orderdate)
  ORDER BY o_year
"""


# ---------------------------------------------------------------------------
# Q10 — returned-item revenue per customer (top 20)
# ---------------------------------------------------------------------------

def q_tpch_q10_shape(spark, sf_dir):
    """TPC-H Q10 shape: revenue lost to returns per customer over a
    quarter, top 20.  Groups on the customer key ONLY and joins the
    customer attributes after the top-k cut — at 100 TB the aggregate
    and TakeOrdered run on (key, revenue) pairs, and the 20 survivors
    broadcast-join their attribute payload."""
    li = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1996-07-01")))
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_cust = (li.join(o, li.l_orderkey == o.o_orderkey)
                  .groupBy("o_custkey")
                  .agg(F.round(F.sum(
                          F.col("l_extendedprice")
                          * (F.lit(1) - F.col("l_discount"))), 2)
                        .alias("revenue"))
                  .orderBy(F.col("revenue").desc(),
                           F.col("o_custkey").asc())
                  .limit(20))
    return (per_cust
            .join(c, per_cust.o_custkey == c.c_custkey)
            .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
            .select(F.col("c_custkey"), F.col("c_name"),
                    F.col("revenue"), F.col("c_acctbal"),
                    F.col("n_name"), F.col("c_mktsegment"))
            .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc()))


ORACLE_TPCH_Q10 = """
  WITH per_cust AS (
    SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 2)
             AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY o_custkey
    ORDER BY revenue DESC, o_custkey ASC LIMIT 20
  )
  SELECT c_custkey, c_name, revenue, c_acctbal, n_name, c_mktsegment
  FROM per_cust
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  ORDER BY revenue DESC, c_custkey ASC
"""


# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (outer join → double agg)
# ---------------------------------------------------------------------------

def q_tpch_q13_shape(spark, sf_dir):
    """TPC-H Q13 shape: distribution of customers by order count,
    INCLUDING the zero bucket (left outer join, count of non-null keys,
    then a second aggregate over the counts).  Two shuffles total; the
    second groups on at most ~max-orders-per-customer distinct keys."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderpriority") != "1-URGENT")
    counts = (c.join(o, c.c_custkey == o.o_custkey, "left")
               .groupBy("c_custkey")
               .agg(F.count("o_orderkey").alias("c_count")))
    return (counts.groupBy("c_count")
                  .agg(F.count("*").alias("custdist"))
                  .orderBy(F.col("custdist").desc(),
                           F.col("c_count").desc()))


ORACLE_TPCH_Q13 = """
  SELECT c_count, count(*)::BIGINT AS custdist
  FROM (
    SELECT c_custkey, count(o_orderkey)::BIGINT AS c_count
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
                    AND o_orderpriority <> '1-URGENT'
    GROUP BY c_custkey
  ) c_orders
  GROUP BY c_count
  ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------------------
# Q14 — promo revenue share (conditional agg over one month)
# ---------------------------------------------------------------------------

def q_tpch_q14_shape(spark, sf_dir):
    """TPC-H Q14 shape: share of revenue from promotional parts in one
    month — sum(CASE)/sum over a single li⋈part pass, part side
    broadcast, date filter pushed to the parquet scan.  Output is one
    floor-scaled e6 long (a raw double ratio can't hash)."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-03-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01")))
    p = _t(spark, sf_dir, "part")
    vol = F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))
    return (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
              .agg(F.floor(
                       F.sum(F.when(F.col("p_type") == "PROMO", vol)
                              .otherwise(F.lit(0.0)))
                       / F.sum(vol) * F.lit(100.0) * 1e4).cast("long")
                    .alias("promo_share_e6")))


ORACLE_TPCH_Q14 = """
  SELECT floor(sum(CASE WHEN p_type = 'PROMO'
                        THEN l_extendedprice * (1 - l_discount)
                        ELSE 0.0::DOUBLE END)
               / sum(l_extendedprice * (1 - l_discount))
               * 100.0::DOUBLE * 1e4)::BIGINT AS promo_share_e6
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# ---------------------------------------------------------------------------
# Q15 — top supplier by revenue (aggregate → global-max filter)
# ---------------------------------------------------------------------------

def q_tpch_q15_shape(spark, sf_dir):
    """TPC-H Q15 shape: revenue per supplier over a quarter, keep the
    supplier(s) achieving the GLOBAL max.  The max-filter is a window
    over an unpartitioned frame on the ALREADY-AGGREGATED (one row per
    supplier) side — cheap at any scale — and comparison happens on the
    rounded value both engines agree on."""
    li = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1997-04-01")))
    s = _t(spark, sf_dir, "supplier")
    rev = (li.groupBy("l_suppkey")
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (F.lit(1) - F.col("l_discount"))), 2)
                   .alias("total_revenue")))
    w = Window.partitionBy()
    best = (rev.withColumn("__max", F.max("total_revenue").over(w))
               .where(F.col("total_revenue") == F.col("__max"))
               .drop("__max"))
    return (best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey)
                .select("s_suppkey", "s_name", "total_revenue")
                .orderBy("s_suppkey"))


ORACLE_TPCH_Q15 = """
  WITH revenue AS (
    SELECT l_suppkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2)
             AS total_revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    GROUP BY l_suppkey
  )
  SELECT s_suppkey, s_name, total_revenue
  FROM revenue JOIN supplier ON l_suppkey = s_suppkey
  WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
  ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg → window rewrite)
# ---------------------------------------------------------------------------

def q_tpch_q17_shape(spark, sf_dir):
    """TPC-H Q17 shape: revenue from lineitems whose quantity is below
    20% of the per-part average — the canonical correlated scalar
    subquery, decorrelated into a per-part window average so the fact
    scans ONCE (the naive plan re-aggregates lineitem per outer row).

    The per-part average is floor-quantized at 1e-6 before the 0.2×
    comparison so both engines threshold identical values (sum-order
    noise at the 1e-16 scale cannot flip the comparison)."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#13")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    w = Window.partitionBy("l_partkey")
    avg_q = (F.floor(F.avg("l_quantity").over(w) * 1e6) / 1e6)
    return (j.withColumn("__avg_q", avg_q)
             .where(F.col("l_quantity") < F.lit(0.2) * F.col("__avg_q"))
             .agg(F.round(F.sum("l_extendedprice") / F.lit(7.0), 2)
                   .alias("avg_yearly")))


ORACLE_TPCH_Q17 = """
  SELECT round(sum(l_extendedprice) / 7.0::DOUBLE, 2) AS avg_yearly
  FROM (
    SELECT l_extendedprice, l_quantity,
           floor(avg(l_quantity) OVER (PARTITION BY l_partkey) * 1e6)
             / 1e6 AS avg_q
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand = 'Brand#13'
  ) t
  WHERE l_quantity < 0.2::DOUBLE * avg_q
"""


# ---------------------------------------------------------------------------
# Q19 — disjunctive multi-predicate join (OR-of-ANDs pushdown)
# ---------------------------------------------------------------------------

def q_tpch_q19_shape(spark, sf_dir):
    """TPC-H Q19 shape: revenue over an OR of three (brand, size,
    quantity-range) predicate triples.  The join key predicate is
    shared across branches so Catalyst keeps ONE equi-join and pushes
    the disjunction as a post-join filter; the common
    ``l_quantity <= 36`` bound is CNF-extractable to the fact scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    b1 = ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5)
          & (F.col("l_quantity") >= 1) & (F.col("l_quantity") <= 11))
    b2 = ((F.col("p_brand") == "Brand#13") & (F.col("p_size") <= 10)
          & (F.col("l_quantity") >= 10) & (F.col("l_quantity") <= 20))
    b3 = ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 15)
          & (F.col("l_quantity") >= 20) & (F.col("l_quantity") <= 36))
    return (j.where(b1 | b2 | b3)
             .agg(F.round(F.sum(F.col("l_extendedprice")
                                * (F.lit(1) - F.col("l_discount"))), 2)
                   .alias("revenue")))


ORACLE_TPCH_Q19 = """
  SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#1' AND p_size <= 5
         AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#13' AND p_size <= 10
         AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#22' AND p_size <= 15
         AND l_quantity BETWEEN 20 AND 36)
"""


# ---------------------------------------------------------------------------
# Q22 — dormant high-balance customers (anti-join + global-avg subquery)
# ---------------------------------------------------------------------------

def q_tpch_q22_shape(spark, sf_dir):
    """TPC-H Q22 shape (adapted: nationkey stands in for the phone
    country code the fixtures lack): customers whose balance exceeds
    the average POSITIVE balance and who placed no order since
    2000-01-01 (the fixtures give every customer SOME order, so the
    canonical no-orders-ever predicate would be vacuous), counted and
    summed per nation.  Three pieces the optimizer must coordinate: a
    scalar aggregate broadcast into a filter, a left-anti join against
    the date-pruned fact keys, and a final small-key aggregate.

    The avg threshold is floor-quantized at 1e-6 (like Q17) so both
    engines compare against bit-identical thresholds; balances are
    2-decimal so quantization cannot clip a legitimate boundary."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= F.lit("2000-01-01"))
    pos = c.where(F.col("c_acctbal") > 0.0).agg(
        (F.floor(F.avg("c_acctbal") * 1e6) / 1e6).alias("__avg"))
    rich = (c.join(F.broadcast(pos))
             .where(F.col("c_acctbal") > F.col("__avg")))
    dormant = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return (dormant.groupBy("c_nationkey")
                   .agg(F.count("*").alias("numcust"),
                        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
                   .orderBy("c_nationkey"))


ORACLE_TPCH_Q22 = """
  SELECT c_nationkey, count(*)::BIGINT AS numcust,
         round(sum(c_acctbal), 2) AS totacctbal
  FROM customer
  WHERE c_acctbal > (SELECT floor(avg(c_acctbal) * 1e6) / 1e6
                     FROM customer WHERE c_acctbal > 0.0::DOUBLE)
    AND NOT EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
  GROUP BY c_nationkey
  ORDER BY c_nationkey
"""


QUERIES_TPCH_MORE: dict[str, QuerySpec] = {
    "tpch_q7_shape": QuerySpec(
        q_tpch_q7_shape, ORACLE_TPCH_Q7,
        doc="TPC-H Q7 shape (dual-role nation dimension)"),
    "tpch_q8_shape": QuerySpec(
        q_tpch_q8_shape, ORACLE_TPCH_Q8, headline=True,
        doc="TPC-H Q8 shape (market-share ratio over 7-way star)"),
    "tpch_q10_shape": QuerySpec(
        q_tpch_q10_shape, ORACLE_TPCH_Q10,
        doc="TPC-H Q10 shape (top-20 then attribute join)"),
    "tpch_q13_shape": QuerySpec(
        q_tpch_q13_shape, ORACLE_TPCH_Q13,
        doc="TPC-H Q13 shape (outer join → count distribution)"),
    "tpch_q14_shape": QuerySpec(
        q_tpch_q14_shape, ORACLE_TPCH_Q14,
        doc="TPC-H Q14 shape (promo revenue share)"),
    "tpch_q15_shape": QuerySpec(
        q_tpch_q15_shape, ORACLE_TPCH_Q15,
        doc="TPC-H Q15 shape (global-max revenue supplier)"),
    "tpch_q17_shape": QuerySpec(
        q_tpch_q17_shape, ORACLE_TPCH_Q17,
        doc="TPC-H Q17 shape (decorrelated per-part avg threshold)"),
    "tpch_q19_shape": QuerySpec(
        q_tpch_q19_shape, ORACLE_TPCH_Q19,
        doc="TPC-H Q19 shape (disjunctive predicate pushdown)"),
    "tpch_q22_shape": QuerySpec(
        q_tpch_q22_shape, ORACLE_TPCH_Q22,
        doc="TPC-H Q22 shape (scalar-subquery filter + anti-join)"),
}
