"""Round-7 extension queries: distribution-shape statistics
(Jarque-Bera), rank association on aggregated series (Kendall tau-b,
Friedman), a depth-1 decision tree (Gini stump), and the drawdown
window family.

Same cross-engine exactness rules as ``queries.py``: counts, sums and
rank grids stay integral (BIGINT / decimal(38)); where a division or
sqrt is unavoidable it runs ONCE per output row on an
identically-parenthesized double tree (shared literal strings between
the Spark plan and the DuckDB oracle) and floors at e6/e9; fully
integer statistics (Friedman) never touch a double at all.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import eventflow
from ..operators.eventflow import (
    JB_KURT, JB_M2, JB_SKEW, JB_STAT, KENDALL_TAU, STUMP_GINI)
from .spec import QuerySpec, _t

QUERIES_ROUND7: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# Jarque-Bera normality per event type
# ---------------------------------------------------------------------------


def q_jarque_bera_values(spark, sf_dir):
    """Skewness / excess kurtosis / JB statistic per event type from
    exact raw power sums, pinned shared-string double combines."""
    return eventflow.jarque_bera_by_type(_t(spark, sf_dir, "events"))


ORACLE_JARQUE_BERA = f"""
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS v,
           (floor(value * 100 + 0.5)::BIGINT
            * floor(value * 100 + 0.5)::BIGINT) AS v2
    FROM events
  ),
  agg AS (
    SELECT g, count(*)::HUGEINT AS n,
           sum(v)::HUGEINT AS s1,
           sum(v2)::HUGEINT AS q2,
           sum(v2::HUGEINT * v::HUGEINT) AS q3,
           sum(v2::HUGEINT * v2::HUGEINT) AS q4
    FROM d GROUP BY g
  ),
  dbl AS (
    SELECT g, n::BIGINT AS n_rows, n::DOUBLE AS n_,
           s1::DOUBLE AS s1, q2::DOUBLE AS q2,
           q3::DOUBLE AS q3, q4::DOUBLE AS q4
    FROM agg
  )
  SELECT g AS event_type, n_rows,
         (CASE WHEN n_rows > 3 AND ({JB_M2}) > 0.0
               THEN floor(({JB_SKEW}) * 1000000)
               ELSE 0 END)::BIGINT AS skew_e6,
         (CASE WHEN n_rows > 3 AND ({JB_M2}) > 0.0
               THEN floor(({JB_KURT}) * 1000000)
               ELSE 0 END)::BIGINT AS kurt_e6,
         (CASE WHEN n_rows > 3 AND ({JB_M2}) > 0.0
               THEN floor(({JB_STAT}) * 1000)
               ELSE 0 END)::BIGINT AS jb_e3
  FROM dbl ORDER BY event_type
"""


# ---------------------------------------------------------------------------
# Kendall tau-b between daily view and purchase counts
# ---------------------------------------------------------------------------


def q_kendall_view_purchase(spark, sf_dir):
    """Exact concordant/discordant census on the daily series,
    tau-b's sqrt combine pinned and shared."""
    return eventflow.kendall_tau_daily(_t(spark, sf_dir, "events"))


ORACLE_KENDALL = f"""
  WITH daily AS (
    SELECT floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           sum((event_type = 'view')::BIGINT)::BIGINT AS x,
           sum((event_type = 'purchase')::BIGINT)::BIGINT AS y
    FROM events GROUP BY 1
  ),
  pairs AS (
    SELECT sign(a.x - b.x)::BIGINT AS dx,
           sign(a.y - b.y)::BIGINT AS dy
    FROM daily a JOIN daily b ON a.day < b.day
  ),
  agg AS (
    SELECT count(*)::BIGINT AS p,
           sum((dx * dy = 1)::BIGINT)::BIGINT AS c,
           sum((dx * dy = -1)::BIGINT)::BIGINT AS d,
           sum((dx = 0)::BIGINT)::BIGINT AS tx,
           sum((dy = 0)::BIGINT)::BIGINT AS ty
    FROM pairs
  ),
  nd AS (SELECT count(*)::BIGINT AS n_days FROM daily),
  dbl AS (
    SELECT n_days, c AS n_conc, d AS n_disc,
           p::DOUBLE AS p_, c::DOUBLE AS c_, d::DOUBLE AS d_,
           tx::DOUBLE AS tx_, ty::DOUBLE AS ty_
    FROM agg, nd
  )
  SELECT n_days, n_conc, n_disc,
         (CASE WHEN p_ > tx_ AND p_ > ty_
               THEN floor(({KENDALL_TAU}) * 1000000)
               ELSE 0 END)::BIGINT AS tau_b_e6
  FROM dbl
"""


# ---------------------------------------------------------------------------
# Friedman test (blocks = days, treatments = event types) — all-integer
# ---------------------------------------------------------------------------


def q_friedman_daily_types(spark, sf_dir):
    """Conover tie-corrected Friedman chi-square on the complete
    day×type daily-count grid — exact integer ratio, e6-floored."""
    return eventflow.friedman_daily_types(_t(spark, sf_dir, "events"))


ORACLE_FRIEDMAN = """
  WITH d AS (
    SELECT floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           event_type AS t
    FROM events
  ),
  cnt AS (SELECT day, t, count(*)::BIGINT AS c FROM d GROUP BY day, t),
  grid AS (
    SELECT dd.day, tt.t, coalesce(cnt.c, 0)::BIGINT AS c
    FROM (SELECT DISTINCT day FROM d) dd
    CROSS JOIN (SELECT DISTINCT t FROM d) tt
    LEFT JOIN cnt ON cnt.day = dd.day AND cnt.t = tt.t
  ),
  per_c AS (SELECT day, c, count(*)::BIGINT AS m FROM grid
            GROUP BY day, c),
  r2tab AS (
    SELECT day, c,
           (2 * (sum(m) OVER (PARTITION BY day ORDER BY c
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - m) + m + 1) AS r2
    FROM per_c
  ),
  cells AS (
    SELECT g.day, g.t, r.r2
    FROM grid g JOIN r2tab r ON r.day = g.day AND r.c = g.c
  ),
  per_t AS (SELECT t, sum(r2)::HUGEINT AS r2_sum FROM cells GROUP BY t),
  gl AS (
    SELECT count(DISTINCT day)::HUGEINT AS b,
           count(DISTINCT t)::HUGEINT AS k,
           sum(r2::HUGEINT * r2::HUGEINT) AS sq
    FROM cells
  ),
  nd AS (
    SELECT b, k, sq,
           sum((r2_sum - b * (k + 1))
               * (r2_sum - b * (k + 1))) AS devsq
    FROM per_t, gl GROUP BY b, k, sq
  )
  SELECT b::BIGINT AS b_days, k::BIGINT AS k_types,
         (CASE WHEN (sq - b * k * (k + 1) * (k + 1)) > 0
               THEN ((k - 1) * devsq * 1000000)
                    // (sq - b * k * (k + 1) * (k + 1))
               ELSE 0 END)::BIGINT AS chi2_e6
  FROM nd
"""


# ---------------------------------------------------------------------------
# Decision stump: best Gini split of is-purchase on value
# ---------------------------------------------------------------------------


def q_decision_stump_purchase(spark, sf_dir):
    """Depth-1 tree: best value-cents threshold separating purchases
    from the rest by weighted Gini (pinned e9 score, TakeOrdered
    argmin with deterministic threshold tie-break)."""
    e = _t(spark, sf_dir, "events")
    return eventflow.decision_stump(
        e, F.col("event_type").eqNullSafe("purchase"))


ORACLE_STUMP = f"""
  WITH d AS (
    SELECT floor(value * 100 + 0.5)::BIGINT AS v,
           (event_type IS NOT DISTINCT FROM 'purchase')::BIGINT AS y
    FROM events
  ),
  per_v AS (SELECT v, count(*)::BIGINT AS c, sum(y)::BIGINT AS pos
            FROM d GROUP BY v),
  cum AS (
    SELECT v,
           sum(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                        AND CURRENT ROW)::BIGINT AS nl,
           sum(pos) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)::BIGINT AS pl
    FROM per_v
  ),
  tot AS (SELECT sum(c)::BIGINT AS n, sum(pos)::BIGINT AS p
          FROM per_v),
  cand AS (
    SELECT v, nl, pl, n AS n_rows, (nl - pl) AS ql,
           (n - nl) AS nr, (p - pl) AS pr
    FROM cum, tot WHERE nl < n
  ),
  dbl AS (
    SELECT v, nl, pl, n_rows,
           nl::DOUBLE AS nl_, pl::DOUBLE AS pl_, ql::DOUBLE AS ql_,
           nr::DOUBLE AS nr_, pr::DOUBLE AS pr_,
           (nr - pr)::DOUBLE AS qr_
    FROM cand
  ),
  scored AS (
    SELECT v AS thr_cents,
           floor(({STUMP_GINI}) * 1000000000)::BIGINT AS gini_e9,
           nl AS n_left, pl AS pos_left, n_rows
    FROM dbl
  )
  SELECT thr_cents, gini_e9, n_left, pos_left, n_rows
  FROM scored ORDER BY gini_e9, thr_cents LIMIT 1
"""


# ---------------------------------------------------------------------------
# Max drawdown of daily revenue per nation
# ---------------------------------------------------------------------------


def q_max_drawdown_nation(spark, sf_dir):
    """Running-peak minus current on each nation's daily revenue
    series — all-integer window family."""
    return eventflow.max_drawdown_daily(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "nation"))


ORACLE_DRAWDOWN = """
  WITH daily AS (
    SELECT n_name,
           date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT
             AS day,
           sum(floor(o_totalprice * 100 + 0.5)::BIGINT)::BIGINT AS rev
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    GROUP BY 1, 2
  ),
  dd AS (
    SELECT n_name,
           (max(rev) OVER (PARTITION BY n_name ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - rev) AS dd
    FROM daily
  )
  SELECT n_name, max(dd)::BIGINT AS max_drawdown_cents,
         count(*)::BIGINT AS n_days
  FROM dd GROUP BY n_name ORDER BY n_name
"""


QUERIES_ROUND7.update({
    "jarque_bera_values": QuerySpec(
        q_jarque_bera_values, ORACLE_JARQUE_BERA,
        doc="Jarque-Bera normality per type (exact power sums, "
            "shared-string moment combines)"),
    "kendall_view_purchase": QuerySpec(
        q_kendall_view_purchase, ORACLE_KENDALL,
        doc="Kendall tau-b between daily view/purchase counts "
            "(exact pair census)"),
    "friedman_daily_types": QuerySpec(
        q_friedman_daily_types, ORACLE_FRIEDMAN,
        doc="tie-corrected Friedman test on the day×type grid "
            "(all-integer)"),
    "decision_stump_purchase": QuerySpec(
        q_decision_stump_purchase, ORACLE_STUMP,
        doc="best Gini threshold split (depth-1 decision tree)"),
    "max_drawdown_nation": QuerySpec(
        q_max_drawdown_nation, ORACLE_DRAWDOWN,
        doc="max drawdown of daily revenue per nation "
            "(running-peak window)"),
})


# ===========================================================================
# Batch 2: KMV sketch, phrase search, shard planner, SQL surface, ACF
# ===========================================================================

from ..operators import scale, sketches, text  # noqa: E402


def q_kmv_distinct_custkeys(spark, sf_dir):
    """KMV(64) cardinality estimate of ordering customers next to the
    exact count — all-integer sketch, bit-for-bit cross-engine."""
    return sketches.kmv_distinct(_t(spark, sf_dir, "orders"),
                                 "o_custkey")


def q_kmv_jaccard_custkeys(spark, sf_dir):
    """KMV union-sample Jaccard between ordering custkeys and the
    full customer key set (basis points, exact integer division)."""
    return sketches.kmv_jaccard(
        _t(spark, sf_dir, "orders"), "o_custkey",
        _t(spark, sf_dir, "customer"), "c_custkey")


def q_phrase_search_the_part(spark, sf_dir):
    """Quoted-phrase search ("the part") via the positional inverted
    index — start-aligned n-way join on (doc, start)."""
    return text.phrase_hits(_t(spark, sf_dir, "documents"),
                            "the part")


def q_shard_plan_documents(spark, sf_dir):
    """Per-source output-shard manifest: running byte totals
    integer-divided by a 16 KiB target."""
    d = _t(spark, sf_dir, "documents")
    return scale.shard_plan(d, F.length("text"))


ORACLE_SHARD_PLAN = """
  WITH sized AS (
    SELECT source, doc_id, length(text)::BIGINT AS bytes
    FROM documents
  ),
  planned AS (
    SELECT source, bytes,
           ((sum(bytes) OVER (PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             - bytes) // 16384)::BIGINT AS shard_id
    FROM sized
  )
  SELECT source, shard_id, count(*)::BIGINT AS n_docs,
         sum(bytes)::BIGINT AS shard_bytes
  FROM planned GROUP BY source, shard_id
  ORDER BY source, shard_id
"""


def q_filter_clause_rollup(spark, sf_dir):
    """SQL-surface breadth: aggregate FILTER (WHERE …) clauses plus a
    named WINDOW clause ranking the grouped rows — one grouped scan,
    no CASE-expression contortions."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_r7")
    return spark.sql("""
      SELECT o_orderpriority,
             count(*) AS n_orders,
             count(*) FILTER (WHERE o_orderstatus = 'F')
               AS n_finished,
             count(*) FILTER (WHERE o_totalprice > 100000.0)
               AS n_large,
             rank() OVER w AS priority_rank
      FROM orders_r7
      GROUP BY o_orderpriority
      WINDOW w AS (ORDER BY count(*) DESC, o_orderpriority)
    """)


ORACLE_FILTER_CLAUSE = """
  SELECT o_orderpriority,
         count(*)::BIGINT AS n_orders,
         (count(*) FILTER (WHERE o_orderstatus = 'F'))::BIGINT
           AS n_finished,
         (count(*) FILTER (WHERE o_totalprice > 100000.0))::BIGINT
           AS n_large,
         rank() OVER w AS priority_rank
  FROM orders
  GROUP BY o_orderpriority
  WINDOW w AS (ORDER BY count(*) DESC, o_orderpriority)
"""


def q_acf_daily_values(spark, sf_dir):
    """Correlogram of the daily value-total series, lags 1..7 in one
    plan (broadcast lag fan-out, exact per-lag moments)."""
    return eventflow.acf_daily_totals(_t(spark, sf_dir, "events"))


ORACLE_ACF = f"""
  WITH daily AS (
    SELECT floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS t
    FROM events GROUP BY 1
  ),
  pairs AS (
    SELECT l.lag, a.t AS x, b.t AS y
    FROM (SELECT unnest(generate_series(1, 7))::BIGINT AS lag) l
    JOIN daily a ON true
    JOIN daily b ON a.day = b.day + l.lag
  ),
  agg AS (
    SELECT lag, count(*)::HUGEINT AS n,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(x::HUGEINT * x::HUGEINT) AS sxx,
           sum(y::HUGEINT * y::HUGEINT) AS syy,
           sum(x::HUGEINT * y::HUGEINT) AS sxy
    FROM pairs GROUP BY lag
  ),
  dbl AS (
    SELECT lag, n::BIGINT AS n_pairs, n::DOUBLE AS n_,
           sx::DOUBLE AS sx, sy::DOUBLE AS sy, sxx::DOUBLE AS sxx,
           syy::DOUBLE AS syy, sxy::DOUBLE AS sxy
    FROM agg
  )
  SELECT lag, n_pairs,
         (CASE WHEN n_pairs > 1
                    AND n_ * sxx > sx * sx
                    AND n_ * syy > sy * sy
               THEN floor(({eventflow.ACF_R}) * 1000000)
               ELSE 0 END)::BIGINT AS acf_e6
  FROM dbl ORDER BY lag
"""


QUERIES_ROUND7.update({
    "kmv_distinct_custkeys": QuerySpec(
        q_kmv_distinct_custkeys,
        sketches.kmv_distinct_oracle("orders", "o_custkey"),
        doc="KMV(64) distinct sketch vs exact (all-integer "
            "estimate)"),
    "kmv_jaccard_custkeys": QuerySpec(
        q_kmv_jaccard_custkeys,
        sketches.kmv_jaccard_oracle("orders", "o_custkey",
                                    "customer", "c_custkey"),
        doc="KMV union-sample Jaccard in basis points"),
    "phrase_search_the_part": QuerySpec(
        q_phrase_search_the_part,
        text.phrase_hits_oracle("the part"),
        doc="positional-index quoted-phrase search (start-aligned "
            "n-way join)"),
    "shard_plan_documents": QuerySpec(
        q_shard_plan_documents, ORACLE_SHARD_PLAN,
        doc="deterministic output-shard planner (running-byte "
            "integer div)"),
    "filter_clause_rollup": QuerySpec(
        q_filter_clause_rollup, ORACLE_FILTER_CLAUSE,
        doc="aggregate FILTER clauses + named WINDOW clause "
            "(SQL surface)"),
    "acf_daily_values": QuerySpec(
        q_acf_daily_values, ORACLE_ACF,
        doc="multi-lag correlogram of daily totals (one-plan lag "
            "fan-out)"),
})
