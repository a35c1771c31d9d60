"""Round-20 extension queries: warehouse classics, scale-shaped.

* ``abc_classification`` — ABC (80/15/5) inventory classification of
  parts by revenue, with the cumulative-share cut computed through
  ``scale.dist_cumsum`` (two-phase bucketed running sum) instead of a
  single-task global window — the showcase query for the bucketed
  cumsum machinery on a DESC ordering (negated key).
* ``new_vs_returning_daily`` — daily active users split into new
  (first-ever day) vs returning; one user census + one user-keyed join
  back, no window at all.
* ``repeat_purchase_intervals`` — distribution of whole-day gaps
  between a user's consecutive purchases: per-user lag window, then
  exact nearest-rank quartiles computed on the DAY-GRID census (the
  gap domain is calendar-bounded, so the quartile lookup runs on a
  tiny frame — never a global row sort).
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators import scale
from .spec import QuerySpec, _t

QUERIES_ROUND20: dict[str, QuerySpec] = {}


def q_abc_classification(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    rev = (li.groupBy(F.col("l_partkey").alias("partkey"))
           .agg(F.sum(F.floor(F.col("l_extendedprice") * 100))
                .cast("long").alias("rev")))
    rev = rev.withColumn("negrev", (-F.col("rev")).cast("long"))
    cum = scale.dist_cumsum(rev, "negrev", {"cum": "rev"},
                            tie_cols=("partkey",))
    tot = rev.groupBy().agg(F.sum("rev").cast("long").alias("t"))
    cls = (F.when(F.col("cum") * 5 <= F.col("t") * 4, F.lit("A"))
            .when(F.col("cum") * 20 <= F.col("t") * 19, F.lit("B"))
            .otherwise(F.lit("C")))
    return (cum.crossJoin(F.broadcast(tot))
            .select(cls.alias("abc_class"), "rev", "t")
            .groupBy("abc_class")
            .agg(F.count("*").cast("long").alias("n_parts"),
                 F.sum("rev").cast("long").alias("revenue_cents"),
                 F.floor(F.sum("rev").cast("double") * F.lit(1000000.0)
                         / F.max("t").cast("double"))
                 .cast("long").alias("share_e6"))
            .orderBy("abc_class"))


def _oracle_abc() -> str:
    return """
  WITH rev AS (
    SELECT l_partkey AS partkey,
           sum(floor(l_extendedprice * 100))::BIGINT AS rev
    FROM lineitem GROUP BY 1
  ),
  cum AS (
    SELECT partkey, rev,
           sum(rev) OVER (ORDER BY rev DESC, partkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum
    FROM rev
  ),
  tot AS (SELECT sum(rev)::BIGINT AS t FROM rev)
  SELECT CASE WHEN cum * 5 <= t * 4 THEN 'A'
              WHEN cum * 20 <= t * 19 THEN 'B'
              ELSE 'C' END AS abc_class,
         count(*)::BIGINT AS n_parts,
         sum(rev)::BIGINT AS revenue_cents,
         floor(sum(rev)::DOUBLE * 1e6 / max(t)::DOUBLE)::BIGINT
           AS share_e6
  FROM cum, tot
  GROUP BY 1 ORDER BY abc_class
"""


def q_new_vs_returning(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    day = F.floor(F.floor(F.unix_timestamp(F.col("ts"))).cast("long")
                  / F.lit(86400)).cast("long")
    ud = e.select(F.col("user_id"), day.alias("day")).distinct()
    first = ud.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (ud.join(first, "user_id")
            .groupBy("day")
            .agg(F.count("*").cast("long").alias("n_active"),
                 F.sum((F.col("day") == F.col("first_day"))
                       .cast("long")).cast("long").alias("n_new"),
                 F.sum((F.col("day") != F.col("first_day"))
                       .cast("long")).cast("long").alias("n_returning"))
            .orderBy("day"))


def _oracle_new_vs_returning() -> str:
    return """
  WITH ud AS (
    SELECT DISTINCT user_id,
           floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day
    FROM events
  ),
  first AS (
    SELECT user_id, min(day) AS first_day FROM ud GROUP BY user_id
  )
  SELECT day, count(*)::BIGINT AS n_active,
         sum((day = first_day)::BIGINT)::BIGINT AS n_new,
         sum((day <> first_day)::BIGINT)::BIGINT AS n_returning
  FROM ud JOIN first USING (user_id)
  GROUP BY day ORDER BY day
"""


def q_repeat_purchase_intervals(spark, sf_dir):
    """Whole-day gap distribution between consecutive purchases per
    user: n_gaps + exact nearest-rank quartiles off the day-grid
    census (grid ≤ calendar span, so the rank lookup is tiny)."""
    e = _t(spark, sf_dir, "events").where(
        F.col("event_type") == "purchase")
    ts_s = F.floor(F.unix_timestamp(F.col("ts"))).cast("long")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    gaps = (e.select("user_id", "ts", "event_id", ts_s.alias("s"))
            .withColumn("prev", F.lag("s", 1).over(w))
            .where(F.col("prev").isNotNull())
            .select(F.floor((F.col("s") - F.col("prev"))
                            / F.lit(86400)).cast("long").alias("gap_d")))
    grid = gaps.groupBy("gap_d").agg(F.count("*").cast("long").alias("c"))
    gw = Window.orderBy("gap_d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow)
    ranked = (grid.withColumn("cum", F.sum("c").over(gw).cast("long"))
              .crossJoin(F.broadcast(
                  grid.groupBy().agg(F.sum("c").cast("long").alias("n")))))

    def q_at(num: int, den: int):
        # nearest-rank (ceil) percentile on the census grid
        rank = F.expr(f"(n * {num} + {den} - 1) div {den}")
        return F.min(F.when(F.col("cum") >= rank, F.col("gap_d")))

    return ranked.groupBy("n").agg(
        q_at(1, 4).alias("p25_days"),
        q_at(2, 4).alias("p50_days"),
        q_at(3, 4).alias("p75_days")) \
        .select(F.col("n").alias("n_gaps"),
                "p25_days", "p50_days", "p75_days")


def _oracle_repeat_intervals() -> str:
    return """
  WITH gaps AS (
    SELECT floor((s - prev) / 86400)::BIGINT AS gap_d FROM (
      SELECT floor(epoch(ts))::BIGINT AS s,
             lag(floor(epoch(ts))::BIGINT, 1) OVER (
               PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS prev
      FROM events WHERE event_type = 'purchase')
    WHERE prev IS NOT NULL
  ),
  grid AS (SELECT gap_d, count(*)::BIGINT AS c FROM gaps GROUP BY gap_d),
  ranked AS (
    SELECT gap_d,
           sum(c) OVER (ORDER BY gap_d
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS cum,
           (SELECT sum(c)::BIGINT FROM grid) AS n
    FROM grid
  )
  SELECT n AS n_gaps,
         min(CASE WHEN cum >= (n * 1 + 3) // 4 THEN gap_d END)
           AS p25_days,
         min(CASE WHEN cum >= (n * 2 + 3) // 4 THEN gap_d END)
           AS p50_days,
         min(CASE WHEN cum >= (n * 3 + 3) // 4 THEN gap_d END)
           AS p75_days
  FROM ranked GROUP BY n
"""


QUERIES_ROUND20.update({
    "abc_classification": QuerySpec(
        q_abc_classification, _oracle_abc(),
        doc="ABC (80/15/5) revenue classification via the two-phase "
            "bucketed cumsum (no single-task sort)"),
    "new_vs_returning_daily": QuerySpec(
        q_new_vs_returning, _oracle_new_vs_returning(),
        doc="daily active split into new vs returning (first-touch "
            "join, no windows)"),
    "repeat_purchase_intervals": QuerySpec(
        q_repeat_purchase_intervals, _oracle_repeat_intervals(),
        doc="whole-day purchase-gap distribution with exact "
            "nearest-rank quartiles on the day grid"),
})
