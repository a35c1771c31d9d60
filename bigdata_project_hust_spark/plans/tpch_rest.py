"""Final TPC-H query shapes (Q2/Q4/Q9/Q11/Q12/Q16/Q20/Q21) — with
``multi_agg_pricing`` (= Q1) and the shapes in ``queries.py`` /
``tpch_more.py`` this completes the 22-query warehouse sweep.

The fixtures carry no ``partsupp`` table, so the five shapes that need
one (Q2/Q9/Q11/Q16/Q20) derive it deterministically from ``lineitem``:

    ps(partkey, suppkey,
       ps_availqty          = sum(l_quantity)           -- integral
       ps_supplycost_cents  = min(floor(cents(price)/qty)))

All derived measures are exact BIGINT math (prices are 2-decimal, so
``round(price*100)`` is an exact integer; quantities are integral), so
sums/thresholds compare bit-identically across Spark and DuckDB — no
double-sum order sensitivity anywhere in this module.  Columns the
fixtures lack are substituted structurally: ``l_returnflag`` stands in
for ``l_shipmode`` (Q12), ``l_shipdate > o_orderdate`` for the
``commitdate < receiptdate`` late-delivery predicate (Q4/Q21), and the
supplier-id suffix for the Q16 complaints pattern.  Every substitution
keeps the canonical JOIN/EXISTS/HAVING structure — the part that
exercises the optimizer.

Reference parity: extends the reference's report surface (reference
consumer2.py:1-355) exactly like ``tpch_more.py``.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .spec import QuerySpec, _t


# ---------------------------------------------------------------------------
# Derived partsupp
# ---------------------------------------------------------------------------

def _partsupp(li):
    """Deterministic partsupp stand-in: one row per observed
    (l_partkey, l_suppkey) pair of the given lineitem slice.  Availqty
    is the summed integral quantity; supplycost is the minimum per-unit
    price in whole cents (exact: 2-decimal prices → ``round(price*100)``
    is an integer, and both engines floor the same IEEE double
    quotient).

    100 TB shape: one partial+final hash aggregate over the fact table
    keyed by the (part, supp) pair — |ps| « |lineitem|, and every
    consumer below joins it on the same key, so the aggregate's shuffle
    partitioning is reused by AQE where the join key matches.  Callers
    whose part/supplier predicate has pair granularity (a filter on
    partkey or suppkey keeps or drops WHOLE pairs) pass a pre-pruned
    ``li`` — the filter commutes with the pair-keyed aggregate, so the
    min/sum are unchanged and the aggregate shuffles only the surviving
    fraction of the fact table."""
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("long")
    unit = F.floor(cents / F.col("l_quantity")).cast("long")
    return (li.select(F.col("l_partkey").alias("ps_partkey"),
                      F.col("l_suppkey").alias("ps_suppkey"),
                      F.col("l_quantity").cast("long").alias("__qty"),
                      unit.alias("__unit"))
              .groupBy("ps_partkey", "ps_suppkey")
              .agg(F.sum("__qty").alias("ps_availqty"),
                   F.min("__unit").alias("ps_supplycost_cents")))


_PS = """
  ps AS (
    SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
           sum(l_quantity::BIGINT)::BIGINT AS ps_availqty,
           min(floor(round(l_extendedprice * 100) / l_quantity)::BIGINT)
             AS ps_supplycost_cents
    FROM lineitem GROUP BY 1, 2
  )
"""


# ---------------------------------------------------------------------------
# Q2 — min-cost supplier per part in a region
# ---------------------------------------------------------------------------

def q_tpch_q2_shape(spark, sf_dir):
    """TPC-H Q2 shape: for EUROPE suppliers of SMALL parts of size 15,
    keep the supplier(s) achieving the per-part MINIMUM supplycost —
    the correlated-min subquery decorrelated into a per-part window.

    Scale design: region→nation→supplier prunes to one region's
    suppliers (broadcast at any SF — suppliers are the small fact);
    the filtered part side broadcasts, and the SAME broadcast prunes
    the fact scan BELOW the ps aggregate (partkey granularity commutes
    with the pair-keyed agg); the correlated min is a window over
    ps_partkey on the already-joined slice, not a second scan +
    self-join.  Deterministic total order under the LIMIT."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"), "left_semi")
    ps = _partsupp(li)
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    j = (ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
           .join(s, ps.ps_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(F.broadcast(r), n.n_regionkey == r.r_regionkey))
    w = Window.partitionBy("ps_partkey")
    j = j.withColumn("__min_cost", F.min("ps_supplycost_cents").over(w))
    return (j.where(F.col("ps_supplycost_cents") == F.col("__min_cost"))
             .select("s_acctbal", "s_name", F.col("n_name"),
                     F.col("p_partkey"), "p_name", "ps_supplycost_cents")
             .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
             .limit(100))


ORACLE_TPCH_Q2 = f"""
  WITH {_PS},
  eu AS (
    SELECT ps_partkey, ps_suppkey, ps_supplycost_cents,
           s_acctbal, s_name, n_name
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'EUROPE'
  )
  SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
         ps_supplycost_cents
  FROM eu
  JOIN part ON ps_partkey = p_partkey
  WHERE p_size = 15 AND p_type = 'SMALL'
    AND ps_supplycost_cents = (
      SELECT min(e2.ps_supplycost_cents) FROM eu e2
      WHERE e2.ps_partkey = eu.ps_partkey)
  ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
  LIMIT 100
"""


# ---------------------------------------------------------------------------
# Q4 — order-priority checking (correlated EXISTS semi-join)
# ---------------------------------------------------------------------------

def q_tpch_q4_shape(spark, sf_dir):
    """TPC-H Q4 shape: orders placed in 1997-Q3 that had at least one
    line item shipped after the order date (the fixtures' stand-in for
    ``commitdate < receiptdate``), counted per priority.  The EXISTS
    is a LEFT SEMI join whose condition mixes the equi key with the
    correlated inequality.

    Scale design: the date filter prunes orders before the semi-join;
    the semi-join shuffles on orderkey only and emits each order at
    most once (no fanout); the final agg groups 5 priorities —
    map-side partials reduce it to near-nothing."""
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1997-07-01"))
        & (F.col("o_orderdate") < F.lit("1997-10-01")))
    li = _t(spark, sf_dir, "lineitem")
    j = o.join(li, (o.o_orderkey == li.l_orderkey)
               & (li.l_shipdate > o.o_orderdate), "left_semi")
    return (j.groupBy("o_orderpriority")
             .agg(F.count("*").alias("order_count"))
             .orderBy("o_orderpriority"))


ORACLE_TPCH_Q4 = """
  SELECT o_orderpriority, count(*)::BIGINT AS order_count
  FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
    AND EXISTS (SELECT 1 FROM lineitem
                WHERE l_orderkey = o_orderkey
                  AND l_shipdate > o_orderdate)
  GROUP BY o_orderpriority
  ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------------
# Q9 — product-type profit (fact ⋈ derived-ps ⋈ 4 dims)
# ---------------------------------------------------------------------------

def q_tpch_q9_shape(spark, sf_dir):
    """TPC-H Q9 shape: profit on red parts per (supplier nation, order
    year).  Profit is exact cents: ``round(disc_price·100) −
    supplycost_cents·qty`` — BIGINT end-to-end, so the big sum is
    order-insensitive on both engines.

    Scale design: the ps join is the one genuinely wide join (fact ⋈
    fact-derived, both shuffled on (partkey, suppkey)); the name-
    filtered part side broadcasts, pruning BOTH the fact scan and the
    ps-building scan below the aggregate (partkey granularity commutes
    with the pair-keyed agg); supplier/nation broadcast; orders joins
    on the orderkey the fact is already partitioned by after the first
    shuffle."""
    p = _t(spark, sf_dir, "part").where(F.col("p_name").like("red%"))
    li = _t(spark, sf_dir, "lineitem")
    ps = _partsupp(li.join(F.broadcast(p.select("p_partkey")),
                           F.col("l_partkey") == F.col("p_partkey"),
                           "left_semi"))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders")
    amount = (F.round(F.col("l_extendedprice")
                      * (F.lit(1) - F.col("l_discount")) * 100, 0)
               .cast("long")
              - F.col("ps_supplycost_cents")
              * F.col("l_quantity").cast("long"))
    j = (li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
           .join(ps, (li.l_partkey == ps.ps_partkey)
                 & (li.l_suppkey == ps.ps_suppkey))
           .join(s, li.l_suppkey == s.s_suppkey)
           .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
           .join(o, li.l_orderkey == o.o_orderkey))
    return (j.groupBy(F.col("n_name").alias("nation"),
                      F.year("o_orderdate").alias("o_year"))
             .agg(F.sum(amount).alias("sum_profit_cents"))
             .orderBy("nation", F.desc("o_year")))


ORACLE_TPCH_Q9 = f"""
  WITH {_PS}
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
         sum(round(l_extendedprice * (1 - l_discount) * 100)::BIGINT
             - ps_supplycost_cents * l_quantity::BIGINT)::BIGINT
           AS sum_profit_cents
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN ps       ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN orders   ON l_orderkey = o_orderkey
  WHERE p_name LIKE 'red%'
  GROUP BY 1, 2
  ORDER BY 1, 2 DESC
"""


# ---------------------------------------------------------------------------
# Q11 — important stock (HAVING vs a scalar-aggregate threshold)
# ---------------------------------------------------------------------------

def q_tpch_q11_shape(spark, sf_dir):
    """TPC-H Q11 shape: parts whose stock value at NATION_7 suppliers
    exceeds 1/10000 of the nation's total stock value.  The fraction
    compare is cross-multiplied into pure BIGINT
    (``part_value·10000 > total_value``) — no double threshold, no
    boundary flips between engines.

    Scale design: the nation's supplier keys (suppkey granularity —
    commutes with the pair-keyed agg) broadcast-semi-prune the fact
    scan BELOW the ps aggregate; the scalar total is a 1-row broadcast
    into the HAVING filter (Spark: crossJoin(broadcast(tot)));
    per-part agg shuffles on partkey only."""
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    nat_supp = (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
                 .select("s_suppkey"))
    li = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(nat_supp),
        F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
    ps = _partsupp(li)
    val = F.col("ps_supplycost_cents") * F.col("ps_availqty")
    nat = ps.select("ps_partkey", val.alias("__v"))
    per_part = nat.groupBy("ps_partkey").agg(
        F.sum("__v").alias("value_cents"))
    tot = nat.agg(F.sum("__v").alias("__tot"))
    return (per_part.crossJoin(F.broadcast(tot))
            .where(F.col("value_cents") * 10000 > F.col("__tot"))
            .select("ps_partkey", "value_cents")
            .orderBy(F.desc("value_cents"), "ps_partkey"))


ORACLE_TPCH_Q11 = f"""
  WITH {_PS},
  nat AS (
    SELECT ps_partkey,
           ps_supplycost_cents * ps_availqty AS v
    FROM ps
    JOIN supplier ON ps_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_7'
  )
  SELECT ps_partkey, sum(v)::BIGINT AS value_cents
  FROM nat
  GROUP BY ps_partkey
  HAVING sum(v)::BIGINT * 10000 > (SELECT sum(v)::BIGINT FROM nat)
  ORDER BY value_cents DESC, ps_partkey
"""


# ---------------------------------------------------------------------------
# Q12 — shipping-class priority counts (conditional aggregation)
# ---------------------------------------------------------------------------

def q_tpch_q12_shape(spark, sf_dir):
    """TPC-H Q12 shape with ``l_returnflag`` standing in for the
    ``l_shipmode`` column the fixtures lack: line items shipped in
    1998 for two flag classes, counting critical- vs non-critical-
    priority orders per class.

    Scale design: flag+date predicates push into the parquet scan; the
    single orderkey join shuffles only the pruned fact; conditional
    sums fold into one partial+final agg over 2 groups."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= F.lit("1998-01-01"))
        & (F.col("l_shipdate") < F.lit("1999-01-01")))
    o = _t(spark, sf_dir, "orders")
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(crit, 1).otherwise(0)).cast("long")
                  .alias("high_line_count"),
                 F.sum(F.when(crit, 0).otherwise(1)).cast("long")
                  .alias("low_line_count"))
            .orderBy("l_returnflag"))


ORACLE_TPCH_Q12 = """
  SELECT l_returnflag,
         sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
         sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                  THEN 0 ELSE 1 END)::BIGINT AS low_line_count
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag IN ('A', 'R')
    AND l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
  GROUP BY l_returnflag
  ORDER BY l_returnflag
"""


# ---------------------------------------------------------------------------
# Q16 — supplier count by part attributes (NOT IN anti-join)
# ---------------------------------------------------------------------------

def q_tpch_q16_shape(spark, sf_dir):
    """TPC-H Q16 shape: distinct suppliers per (brand, type, size) for
    parts outside Brand#5 in five sizes, excluding suppliers whose id
    ends in 7 (the fixtures' stand-in for the complaints pattern).
    The NOT IN becomes a LEFT ANTI join.

    Scale design: the excluded-supplier list is tiny and broadcast-
    anti-joined map-side; the part filter broadcasts and semi-prunes
    the fact scan BELOW the ps aggregate (partkey granularity); the
    only wide exchange is the count-distinct agg on the 3 part
    attributes (2-level partial agg: Spark expands distinct into a
    two-phase hash agg keyed by attrs+suppkey first)."""
    p = _t(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 15, 23, 36))
    ps = _partsupp(_t(spark, sf_dir, "lineitem").join(
        F.broadcast(p.select("p_partkey")),
        F.col("l_partkey") == F.col("p_partkey"), "left_semi"))
    bad = _t(spark, sf_dir, "supplier").where(
        F.col("s_name").like("%7")).select(
        F.col("s_suppkey").alias("bad_key"))
    j = (ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
           .join(F.broadcast(bad), ps.ps_suppkey == F.col("bad_key"),
                 "left_anti"))
    return (j.groupBy("p_brand", "p_type", "p_size")
             .agg(F.count_distinct("ps_suppkey").alias("supplier_cnt"))
             .orderBy(F.desc("supplier_cnt"),
                      "p_brand", "p_type", "p_size"))


ORACLE_TPCH_Q16 = f"""
  WITH {_PS}
  SELECT p_brand, p_type, p_size,
         count(DISTINCT ps_suppkey)::BIGINT AS supplier_cnt
  FROM ps JOIN part ON ps_partkey = p_partkey
  WHERE p_brand <> 'Brand#5' AND p_size IN (1, 9, 15, 23, 36)
    AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
                           WHERE s_name LIKE '%7')
  GROUP BY p_brand, p_type, p_size
  ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


# ---------------------------------------------------------------------------
# Q20 — excess-stock suppliers (nested semi-join chain)
# ---------------------------------------------------------------------------

def q_tpch_q20_shape(spark, sf_dir):
    """TPC-H Q20 shape: NATION_3 suppliers holding more than half of a
    small part's 1997 shipped quantity (``2·availqty > shipped`` —
    cross-multiplied BIGINT, no 0.5 double).  Two nested IN subqueries
    become broadcast semi-joins.

    Scale design: the part-name filter broadcast-semi-prunes BOTH
    fact scans below their (partkey, suppkey) aggregates (partkey
    granularity commutes with the pair key); the 1997 shipped-qty agg
    then shares ps's shuffle partitioning; the final supplier list
    anti-duplicates via the semi-join itself (no distinct needed)."""
    p = _t(spark, sf_dir, "part").where(
        F.col("p_name").like("small%")).select("p_partkey")
    li_small = _t(spark, sf_dir, "lineitem").join(
        F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"),
        "left_semi")
    ps = _partsupp(li_small)
    li97 = (li_small
            .where((F.col("l_shipdate") >= F.lit("1997-01-01"))
                   & (F.col("l_shipdate") < F.lit("1998-01-01")))
            .groupBy(F.col("l_partkey").alias("q_partkey"),
                     F.col("l_suppkey").alias("q_suppkey"))
            .agg(F.sum(F.col("l_quantity").cast("long"))
                  .alias("__shipped")))
    excess = (ps.join(li97, (ps.ps_partkey == li97.q_partkey)
                      & (ps.ps_suppkey == li97.q_suppkey))
                .where(F.col("ps_availqty") * 2 > F.col("__shipped"))
                .select(F.col("ps_suppkey").alias("x_suppkey")))
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    return (s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
             .join(excess, s.s_suppkey == excess.x_suppkey, "left_semi")
             .select("s_suppkey", "s_name", "s_acctbal")
             .orderBy("s_suppkey"))


ORACLE_TPCH_Q20 = f"""
  WITH {_PS}
  SELECT s_suppkey, s_name, s_acctbal
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
    AND s_suppkey IN (
      SELECT ps_suppkey FROM ps
      JOIN (SELECT l_partkey AS q_partkey, l_suppkey AS q_suppkey,
                   sum(l_quantity::BIGINT)::BIGINT AS shipped
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY 1, 2) q
        ON ps_partkey = q_partkey AND ps_suppkey = q_suppkey
      WHERE ps_availqty * 2 > shipped
        AND ps_partkey IN (SELECT p_partkey FROM part
                           WHERE p_name LIKE 'small%'))
  ORDER BY s_suppkey
"""


# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS)
# ---------------------------------------------------------------------------

def q_tpch_q21_shape(spark, sf_dir):
    """TPC-H Q21 shape: NATION_1 suppliers whose line item shipped
    after the order date (late — the fixtures' receipt/commit stand-
    in) on a finished ('F') multi-supplier order where NO other
    supplier was late.  The EXISTS keeps orders with another supplier;
    the NOT EXISTS (left anti) drops orders where another supplier was
    also late.

    Scale design: all three lineitem roles shuffle on orderkey — one
    partitioning, three co-partitioned joins AQE plans as a single
    exchange-reuse; supplier/nation broadcast; the count agg is ~100
    suppliers."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    l1 = (li.join(o, li.l_orderkey == o.o_orderkey)
            .where(F.col("l_shipdate") > F.col("o_orderdate"))
            .join(s, li.l_suppkey == s.s_suppkey)
            .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
            .select("l_orderkey", "l_suppkey", "s_name", "o_orderdate"))
    pairs = li.select(F.col("l_orderkey").alias("p_okey"),
                      F.col("l_suppkey").alias("p_skey")).distinct()
    late = (li.join(o.select("o_orderkey", "o_orderdate"),
                    li.l_orderkey == F.col("o_orderkey"))
              .where(F.col("l_shipdate") > F.col("o_orderdate"))
              .select(F.col("l_orderkey").alias("z_okey"),
                      F.col("l_suppkey").alias("z_skey")).distinct())
    j = (l1.join(pairs, (l1.l_orderkey == pairs.p_okey)
                 & (l1.l_suppkey != pairs.p_skey), "left_semi")
           .join(late, (l1.l_orderkey == late.z_okey)
                 & (l1.l_suppkey != late.z_skey), "left_anti"))
    return (j.groupBy("s_name")
             .agg(F.count("*").alias("numwait"))
             .orderBy(F.desc("numwait"), "s_name")
             .limit(100))


ORACLE_TPCH_Q21 = """
  SELECT s_name, count(*)::BIGINT AS numwait
  FROM lineitem l1
  JOIN orders   ON l1.l_orderkey = o_orderkey
  JOIN supplier ON l1.l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE o_orderstatus = 'F' AND n_name = 'NATION_1'
    AND l1.l_shipdate > o_orderdate
    AND EXISTS (SELECT 1 FROM lineitem l2
                WHERE l2.l_orderkey = l1.l_orderkey
                  AND l2.l_suppkey <> l1.l_suppkey)
    AND NOT EXISTS (SELECT 1 FROM lineitem l3
                    WHERE l3.l_orderkey = l1.l_orderkey
                      AND l3.l_suppkey <> l1.l_suppkey
                      AND l3.l_shipdate > o_orderdate)
  GROUP BY s_name
  ORDER BY numwait DESC, s_name
  LIMIT 100
"""


QUERIES_TPCH_REST: dict[str, QuerySpec] = {
    "tpch_q2_shape": QuerySpec(
        q_tpch_q2_shape, ORACLE_TPCH_Q2,
        doc="TPC-H Q2 shape (per-part min-cost supplier, windowed)"),
    "tpch_q4_shape": QuerySpec(
        q_tpch_q4_shape, ORACLE_TPCH_Q4,
        doc="TPC-H Q4 shape (correlated EXISTS semi-join)"),
    "tpch_q9_shape": QuerySpec(
        q_tpch_q9_shape, ORACLE_TPCH_Q9, headline=True,
        doc="TPC-H Q9 shape (profit over fact ⋈ derived-ps star)"),
    "tpch_q11_shape": QuerySpec(
        q_tpch_q11_shape, ORACLE_TPCH_Q11,
        doc="TPC-H Q11 shape (HAVING vs scalar-agg threshold)"),
    "tpch_q12_shape": QuerySpec(
        q_tpch_q12_shape, ORACLE_TPCH_Q12,
        doc="TPC-H Q12 shape (conditional priority counts)"),
    "tpch_q16_shape": QuerySpec(
        q_tpch_q16_shape, ORACLE_TPCH_Q16,
        doc="TPC-H Q16 shape (NOT IN anti-join, count-distinct)"),
    "tpch_q20_shape": QuerySpec(
        q_tpch_q20_shape, ORACLE_TPCH_Q20,
        doc="TPC-H Q20 shape (nested semi-join chain, exact BIGINT)"),
    "tpch_q21_shape": QuerySpec(
        q_tpch_q21_shape, ORACLE_TPCH_Q21,
        doc="TPC-H Q21 shape (EXISTS + NOT EXISTS waiting suppliers)"),
}
