"""Round-6 extension queries: tie-correct Spearman correlation, PSI
value-drift audit, hour-of-day seasonality (profile + deviation
anomalies), sweep-line peak concurrency, smoothed target encoding,
and diversity-capped retrieval top-k.

Same cross-engine exactness rules as ``queries.py``: counts, sums and
rank grids stay integral (BIGINT / decimal(38)); where a division or
ln is unavoidable it runs ONCE per output row on an
identically-parenthesized double tree and floors at e6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import curation, eventflow, topk
from .spec import QuerySpec, _t

QUERIES_ROUND6: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-correct, exact moments)
# ---------------------------------------------------------------------------


def q_spearman_qty_price(spark, sf_dir):
    """Per-returnflag Spearman rho of quantity vs extended price:
    doubled-midrank grid (integer), exact decimal(38) Pearson moments
    on the ranks, one pinned double combine floored at e6."""
    li = _t(spark, sf_dir, "lineitem")
    return eventflow.spearman_by_group(
        li, "l_returnflag",
        F.floor("l_quantity"),
        F.floor(F.col("l_extendedprice") * 100))


ORACLE_SPEARMAN = """
  WITH d AS (
    SELECT l_returnflag AS g,
           floor(l_quantity)::BIGINT AS x,
           floor(l_extendedprice * 100)::BIGINT AS y
    FROM lineitem
  ),
  cx AS (SELECT g, x, count(*)::BIGINT AS c_v FROM d GROUP BY g, x),
  rx AS (
    SELECT g, x,
           (2 * (sum(c_v) OVER (PARTITION BY g ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - c_v) + c_v + 1) AS rx
    FROM cx
  ),
  cy AS (SELECT g, y, count(*)::BIGINT AS c_v FROM d GROUP BY g, y),
  ry AS (
    SELECT g, y,
           (2 * (sum(c_v) OVER (PARTITION BY g ORDER BY y
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - c_v) + c_v + 1) AS ry
    FROM cy
  ),
  j AS (
    SELECT d.g, rx.rx, ry.ry
    FROM d
    JOIN rx ON d.g = rx.g AND d.x = rx.x
    JOIN ry ON d.g = ry.g AND d.y = ry.y
  ),
  agg AS (
    SELECT g, count(*)::HUGEINT AS n,
           sum(rx)::HUGEINT AS sx, sum(ry)::HUGEINT AS sy,
           sum(rx::HUGEINT * rx::HUGEINT) AS sxx,
           sum(ry::HUGEINT * ry::HUGEINT) AS syy,
           sum(rx::HUGEINT * ry::HUGEINT) AS sxy
    FROM j GROUP BY g
  )
  SELECT g AS l_returnflag, n::BIGINT AS n_rows,
         (CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    > 0.0
               THEN floor((n::DOUBLE * sxy::DOUBLE
                           - sx::DOUBLE * sy::DOUBLE)
                          / sqrt((n::DOUBLE * sxx::DOUBLE
                                  - sx::DOUBLE * sx::DOUBLE)
                                 * (n::DOUBLE * syy::DOUBLE
                                    - sy::DOUBLE * sy::DOUBLE)) * 1e6)
               ELSE 0 END)::BIGINT AS spearman_e6
  FROM agg
"""


# ---------------------------------------------------------------------------
# PSI value drift across the mid-month split
# ---------------------------------------------------------------------------


def q_psi_value_drift(spark, sf_dir):
    """PSI of event values, first half-month (reference) vs second
    (actual): exact nearest-rank decile cuts from the reference,
    Laplace-smoothed bin proportions, pinned (pa-pb)·ln(pa/pb) terms
    floored at e6, headline = exact sum of floored terms."""
    return eventflow.psi_value_drift(_t(spark, sf_dir, "events"))


_PSI_CUTS_SQL = ",\n           ".join(
    f"min(CASE WHEN cum * 10 >= {k} * n_ref THEN v END) AS c{k}"
    for k in range(1, 10))
_PSI_BIN_SQL = " + ".join(f"(v > c{k})::BIGINT" for k in range(1, 10))

ORACLE_PSI = f"""
  WITH ev AS (
    SELECT floor(value * 100 + 0.5)::BIGINT AS v,
           (CASE WHEN ts < TIMESTAMP '{eventflow.PSI_SPLIT_TS}'
                 THEN 1 ELSE 0 END)::BIGINT AS is_ref
    FROM events
  ),
  per_v AS (SELECT v, count(*)::BIGINT AS c_v
            FROM ev WHERE is_ref = 1 GROUP BY v),
  cum AS (
    SELECT v,
           sum(c_v) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c_v) OVER () AS n_ref
    FROM per_v
  ),
  cuts AS (
    SELECT {_PSI_CUTS_SQL}
    FROM cum
  ),
  binned AS (
    SELECT is_ref, ({_PSI_BIN_SQL}) AS bin
    FROM ev CROSS JOIN cuts
  ),
  counts AS (
    SELECT bin, sum(is_ref)::BIGINT AS ca,
           sum(1 - is_ref)::BIGINT AS cb
    FROM binned GROUP BY bin
  ),
  filled AS (
    SELECT b.bin, coalesce(ca, 0)::BIGINT AS ca,
           coalesce(cb, 0)::BIGINT AS cb
    FROM (SELECT range::BIGINT AS bin FROM range(10)) b
    LEFT JOIN counts ON b.bin = counts.bin
  ),
  t AS (
    SELECT bin, ca, cb,
           sum(ca) OVER () AS na, sum(cb) OVER () AS nb
    FROM filled
  ),
  terms AS (
    SELECT bin, ca, cb,
           floor((((ca + 1)::DOUBLE / (na + 10)::DOUBLE)
                  - ((cb + 1)::DOUBLE / (nb + 10)::DOUBLE))
                 * ln(((ca + 1)::DOUBLE / (na + 10)::DOUBLE)
                      / ((cb + 1)::DOUBLE / (nb + 10)::DOUBLE))
                 * 1e6)::BIGINT AS psi_term_e6
    FROM t
  )
  SELECT bin, ca, cb, psi_term_e6,
         sum(psi_term_e6) OVER ()::BIGINT AS psi_total_e6
  FROM terms ORDER BY bin
"""


# ---------------------------------------------------------------------------
# Hour-of-day seasonality: profile + deviation anomalies
# ---------------------------------------------------------------------------


def q_hourly_seasonality(spark, sf_dir):
    """24-row hour-of-day profile: exact counts, exact cents sums,
    truncating integer-division mean."""
    return eventflow.hourly_profile(_t(spark, sf_dir, "events"))


ORACLE_HOURLY = """
  SELECT hour(ts)::BIGINT AS hour,
         count(*)::BIGINT AS n_events,
         sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS sum_cents,
         (sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT
          // count(*)::BIGINT)::BIGINT AS avg_cents
  FROM events GROUP BY hour(ts) ORDER BY hour
"""


def q_seasonal_deviation_topk(spark, sf_dir):
    """Top-20 events by |value − hour-of-day mean| — the
    seasonality-adjusted anomaly list (broadcast 24-row profile,
    TakeOrdered global top-k)."""
    return eventflow.seasonal_deviation_topk(_t(spark, sf_dir, "events"))


ORACLE_SEASONAL_DEV = """
  WITH prof AS (
    SELECT hour(ts)::BIGINT AS hour,
           (sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT
            // count(*)::BIGINT)::BIGINT AS avg_cents
    FROM events GROUP BY hour(ts)
  ),
  ev AS (
    SELECT event_id, event_type, hour(ts)::BIGINT AS hour,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  )
  SELECT event_id, event_type, ev.hour, v,
         abs(v - avg_cents)::BIGINT AS deviation_cents
  FROM ev JOIN prof ON ev.hour = prof.hour
  ORDER BY deviation_cents DESC, event_id
  LIMIT 20
"""


# ---------------------------------------------------------------------------
# Sweep-line peak concurrency
# ---------------------------------------------------------------------------


def q_max_concurrent_events(spark, sf_dir):
    """Peak concurrency per event type for 5-minute half-open event
    intervals — the sweep-line on per-distinct-instant net deltas
    (tie-proof; type-partitioned windows)."""
    return eventflow.max_concurrency_by_type(_t(spark, sf_dir, "events"))


ORACLE_CONCURRENCY = """
  WITH pts AS (
    SELECT event_type, floor(epoch(ts))::BIGINT AS t, 1::BIGINT AS d
    FROM events
    UNION ALL
    SELECT event_type, floor(epoch(ts))::BIGINT + 300, -1::BIGINT
    FROM events
  ),
  net AS (SELECT event_type, t, sum(d)::BIGINT AS net
          FROM pts GROUP BY event_type, t),
  run AS (
    SELECT event_type, t,
           sum(net) OVER (PARTITION BY event_type ORDER BY t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS running
    FROM net
  ),
  peak AS (SELECT event_type, max(running)::BIGINT AS max_concurrent
           FROM run GROUP BY event_type)
  SELECT run.event_type, max_concurrent,
         min(t)::BIGINT AS peak_epoch_s
  FROM run JOIN peak ON run.event_type = peak.event_type
                    AND run.running = peak.max_concurrent
  GROUP BY run.event_type, max_concurrent
  ORDER BY run.event_type
"""


# ---------------------------------------------------------------------------
# Smoothed target encoding
# ---------------------------------------------------------------------------


def q_target_encoding_mktsegment(spark, sf_dir):
    """Smoothed mean encoding of c_mktsegment by order total (m=10):
    exact BIGINT cents sums, one pinned smoothing division per
    segment, floored at e6."""
    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return curation.target_encode(
        orders.select(F.col("o_custkey").alias("c_custkey"),
                      F.floor(F.col("o_totalprice") * 100)
                       .cast("long").alias("cents")),
        cust, "c_custkey", "c_mktsegment", F.col("cents"))


ORACLE_TARGET_ENC = """
  WITH j AS (
    SELECT c.c_mktsegment AS cat,
           floor(o.o_totalprice * 100)::BIGINT AS y_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  ),
  per_cat AS (
    SELECT cat, count(*)::BIGINT AS n_cat,
           sum(y_cents)::BIGINT AS sum_cents
    FROM j GROUP BY cat
  ),
  t AS (
    SELECT cat, n_cat, sum_cents,
           sum(n_cat) OVER () AS n_all,
           sum(sum_cents) OVER () AS sum_all
    FROM per_cat
  )
  SELECT cat AS c_mktsegment, n_cat, sum_cents,
         floor((sum_cents::DOUBLE
                + 10.0 * (sum_all::DOUBLE / n_all::DOUBLE))
               / (n_cat::DOUBLE + 10.0) * 1e6)::BIGINT
           AS enc_cents_e6
  FROM t ORDER BY cat
"""


# ---------------------------------------------------------------------------
# Diversity-capped retrieval top-k
# ---------------------------------------------------------------------------


def q_diversified_topk_docs(spark, sf_dir):
    """Global top-20 documents by length with at most 3 per language —
    the serving-layer diversity cap (partitioned rank window, then
    TakeOrdered over the survivors)."""
    docs = _t(spark, sf_dir, "documents")
    return topk.diversified_topk(
        docs.select("doc_id", "lang", "n_chars"),
        "lang", "n_chars", "doc_id", per_group=3, k=20)


ORACLE_DIVERSIFIED = """
  WITH capped AS (
    SELECT doc_id, lang, n_chars,
           row_number() OVER (PARTITION BY lang
             ORDER BY n_chars DESC, doc_id ASC) AS group_rank
    FROM documents
  )
  SELECT doc_id, lang, n_chars, group_rank
  FROM capped WHERE group_rank <= 3
  ORDER BY n_chars DESC, doc_id ASC
  LIMIT 20
"""


QUERIES_ROUND6.update({
    "spearman_qty_price": QuerySpec(
        q_spearman_qty_price, ORACLE_SPEARMAN,
        doc="tie-correct Spearman rho from doubled midranks + exact "
            "decimal moments"),
    "psi_value_drift": QuerySpec(
        q_psi_value_drift, ORACLE_PSI,
        doc="PSI drift audit: exact nearest-rank decile bins, "
            "Laplace-smoothed, pinned ln terms"),
    "hourly_seasonality": QuerySpec(
        q_hourly_seasonality, ORACLE_HOURLY,
        doc="hour-of-day profile (exact counts/sums, integer-division "
            "mean)"),
    "seasonal_deviation_topk": QuerySpec(
        q_seasonal_deviation_topk, ORACLE_SEASONAL_DEV,
        doc="seasonality-adjusted anomaly top-k (broadcast profile, "
            "TakeOrdered)"),
    "max_concurrent_events": QuerySpec(
        q_max_concurrent_events, ORACLE_CONCURRENCY,
        doc="sweep-line peak concurrency per type (tie-proof net "
            "deltas, partitioned windows)"),
    "target_encoding_mktsegment": QuerySpec(
        q_target_encoding_mktsegment, ORACLE_TARGET_ENC,
        doc="smoothed target encoding (exact cents sums, one pinned "
            "division per category)"),
    "diversified_topk_docs": QuerySpec(
        q_diversified_topk_docs, ORACLE_DIVERSIFIED,
        doc="diversity-capped global top-k (per-bucket rank cap + "
            "TakeOrdered)"),
})
