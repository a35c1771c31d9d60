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


# ===========================================================================
# Batch 2: survival / forecast-backtest / graph-structure / text-signal
# ===========================================================================

from ..operators import graph, text  # noqa: E402
from ..operators.graph import PR_SCALE, _D_DEN, _D_NUM  # noqa: E402


def q_kaplan_meier_purchase(spark, sf_dir):
    """Kaplan-Meier survival of time-to-first-purchase per user
    (right-censored at last observed event): exact integer risk grid,
    pinned ln hazard terms floored at e9, exact integer log-survival
    cumsum, one pinned exp per event time floored at e6."""
    return eventflow.kaplan_meier(_t(spark, sf_dir, "events"))


ORACLE_KM = """
  WITH pu AS (
    SELECT user_id,
           min(floor(epoch(ts))::BIGINT) AS first_s,
           min(CASE WHEN event_type = 'purchase'
                    THEN floor(epoch(ts))::BIGINT END) AS ev_s,
           max(floor(epoch(ts))::BIGINT) AS last_s
    FROM events GROUP BY user_id
  ),
  dur AS (
    SELECT coalesce(ev_s - first_s, last_s - first_s) AS t,
           (ev_s IS NOT NULL)::BIGINT AS is_event
    FROM pu
  ),
  pts AS (SELECT t, sum(is_event)::BIGINT AS d,
                 sum(1 - is_event)::BIGINT AS c
          FROM dur GROUP BY t),
  risk AS (
    SELECT t, d, c,
           (sum(d + c) OVER ()
            - coalesce(sum(d + c) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0))::BIGINT AS n_risk
    FROM pts
  ),
  ev AS (SELECT * FROM risk WHERE d >= 1),
  lg AS (
    SELECT t, n_risk, d, c,
           sum(CASE WHEN d >= n_risk THEN -100000000000
               ELSE floor(ln((n_risk - d)::DOUBLE / n_risk::DOUBLE)
                          * 1e9) END)
             OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING
                   AND CURRENT ROW)::BIGINT AS log_surv_e9
    FROM ev
  )
  SELECT t, n_risk, d AS d_events, c AS c_censored, log_surv_e9,
         floor(exp(log_surv_e9::DOUBLE / 1e9) * 1e6)::BIGINT AS surv_e6
  FROM lg ORDER BY t
"""


def q_wmape_seasonal_naive(spark, sf_dir):
    """Seasonal-naive forecast backtest per event type: predict each
    (day, hour) cents total with the previous observed day's same
    hour; WMAPE = exact |err| sum over exact |actual| sum, one pinned
    division floored at e6."""
    return eventflow.wmape_seasonal_naive(_t(spark, sf_dir, "events"))


ORACLE_WMAPE = """
  WITH g AS (
    SELECT event_type, ts::DATE AS day, hour(ts)::BIGINT AS hour,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS actual
    FROM events GROUP BY 1, 2, 3
  ),
  s AS (
    SELECT event_type, actual,
           lag(actual) OVER (PARTITION BY event_type, hour
                             ORDER BY day) AS pred
    FROM g
  ),
  a AS (
    SELECT event_type, count(*)::BIGINT AS n_periods,
           sum(abs(actual - pred))::BIGINT AS sum_abs_err,
           sum(abs(actual))::BIGINT AS sum_abs_actual
    FROM s WHERE pred IS NOT NULL GROUP BY event_type
  )
  SELECT event_type, n_periods, sum_abs_err, sum_abs_actual,
         (CASE WHEN sum_abs_actual > 0
               THEN floor(sum_abs_err::DOUBLE
                          / sum_abs_actual::DOUBLE * 1e6)
               ELSE 0 END)::BIGINT AS wmape_e6
  FROM a ORDER BY event_type
"""


_KCORE_K, _KCORE_ROUNDS = 3, 6


def q_k_core_membership(spark, sf_dir):
    """3-core of the part co-purchase graph via 6 peeling rounds
    (fixpoint well inside the bound at fixture scale): surviving
    nodes + final in-core degree."""
    return graph.k_core(
        graph.copurchase_edges(_t(spark, sf_dir, "lineitem")),
        k=_KCORE_K, rounds=_KCORE_ROUNDS)


def _k_core_oracle() -> str:
    parts = ["""
  e0 AS MATERIALIZED (
    SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  )"""]
    for r in range(_KCORE_ROUNDS):
        parts.append(f"""
  d{r} AS MATERIALIZED (
    SELECT n, count(*)::BIGINT AS d FROM (
      SELECT x AS n FROM e{r} UNION ALL SELECT y FROM e{r})
    GROUP BY n
  ),
  k{r} AS MATERIALIZED (SELECT n FROM d{r} WHERE d >= {_KCORE_K}),
  e{r + 1} AS MATERIALIZED (
    SELECT e.x, e.y FROM e{r} e
    JOIN k{r} kx ON e.x = kx.n
    JOIN k{r} ky ON e.y = ky.n
  )""")
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT node, core_degree FROM (
    SELECT n AS node, count(*)::BIGINT AS core_degree FROM (
      SELECT x AS n FROM e{_KCORE_ROUNDS}
      UNION ALL SELECT y FROM e{_KCORE_ROUNDS})
    GROUP BY n
  ) WHERE core_degree >= {_KCORE_K}
  ORDER BY node
"""


def q_degree_assortativity(spark, sf_dir):
    """Degree assortativity of the co-purchase graph: Pearson over
    (deg(u), deg(v)) edge ends — exact decimal moments, one pinned
    division floored at e6."""
    return graph.degree_assortativity(
        graph.copurchase_edges(_t(spark, sf_dir, "lineitem")))


ORACLE_ASSORT = """
  WITH e0 AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  ),
  bth AS (SELECT pa AS u, pb AS v FROM e0
          UNION ALL SELECT pb, pa FROM e0),
  deg AS (SELECT u, count(*)::BIGINT AS d FROM bth GROUP BY u),
  j AS (
    SELECT du.d AS dx, dv.d AS dy
    FROM bth JOIN deg du ON bth.u = du.u JOIN deg dv ON bth.v = dv.u
  ),
  agg AS (
    SELECT count(*)::HUGEINT AS n,
           sum(dx)::HUGEINT AS sx, sum(dy)::HUGEINT AS sy,
           sum(dx::HUGEINT * dx::HUGEINT) AS sxx,
           sum(dy::HUGEINT * dy::HUGEINT) AS syy,
           sum(dx::HUGEINT * dy::HUGEINT) AS sxy
    FROM j
  )
  SELECT n::BIGINT AS n_edge_ends,
         (CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    > 0.0
               THEN floor((n::DOUBLE * sxy::DOUBLE
                           - sx::DOUBLE * sy::DOUBLE)
                          / sqrt((n::DOUBLE * sxx::DOUBLE
                                  - sx::DOUBLE * sx::DOUBLE)
                                 * (n::DOUBLE * syy::DOUBLE
                                    - sy::DOUBLE * sy::DOUBLE)) * 1e6)
               ELSE 0 END)::BIGINT AS assortativity_e6
  FROM agg
"""


def q_item_item_recs(spark, sf_dir):
    """Item-item CF top-5 per part: cosine over binary order-incidence
    (exact counts, one pinned sqrt division per pair, min_co=2 noise
    prune, item-partitioned rank window)."""
    return graph.item_item_cosine(_t(spark, sf_dir, "lineitem"))


ORACLE_ITEM_ITEM = """
  WITH op AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS p
              FROM lineitem),
  np AS (SELECT p, count(*)::BIGINT AS n_orders FROM op GROUP BY p),
  co AS (
    SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS co
    FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p
    GROUP BY a.p, b.p HAVING count(*) >= 2
  ),
  bth AS (SELECT pa, pb, co FROM co UNION ALL SELECT pb, pa, co FROM co),
  j AS (
    SELECT bth.pa AS item, bth.pb AS neighbor, co AS n_co,
           floor(co::DOUBLE / sqrt(na.n_orders::DOUBLE
                                   * nb.n_orders::DOUBLE)
                 * 1e6)::BIGINT AS cosine_e6
    FROM bth JOIN np na ON bth.pa = na.p JOIN np nb ON bth.pb = nb.p
  ),
  r AS (SELECT *, row_number() OVER (PARTITION BY item
          ORDER BY cosine_e6 DESC, neighbor ASC) AS rn FROM j)
  SELECT item, neighbor, n_co, cosine_e6, rn::BIGINT AS rn
  FROM r WHERE rn <= 5
"""


_TR_ITERS, _TR_MIN_PAIR, _TR_K = 2, 2, 30


def q_textrank_keywords(spark, sf_dir):
    """TextRank keywords: adjacent-token co-occurrence graph
    (pairs seen >= 2), 2 exact-integer PageRank iterations, global
    top-30 by rank (TakeOrdered, word tie-break)."""
    return text.textrank_keywords(
        _t(spark, sf_dir, "documents"),
        iters=_TR_ITERS, min_pair=_TR_MIN_PAIR, k=_TR_K)


def _textrank_oracle() -> str:
    base = (3 * PR_SCALE) // _D_DEN
    parts = [rf"""
  t AS (
    SELECT list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS w
    FROM documents
  ),
  pr AS (
    SELECT unnest(w[1:len(w) - 1]) AS w1, unnest(w[2:len(w)]) AS w2
    FROM t
  ),
  und AS (
    SELECT least(w1, w2) AS lo, greatest(w1, w2) AS hi,
           count(*)::BIGINT AS c
    FROM pr WHERE w1 <> w2 GROUP BY 1, 2
    HAVING count(*) >= {_TR_MIN_PAIR}
  ),
  e AS (SELECT lo AS src, hi AS dst FROM und
        UNION ALL SELECT hi, lo FROM und),
  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
  outdeg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
  r0 AS (SELECT node, {PR_SCALE}::BIGINT AS r FROM nodes)"""]
    for it in range(_TR_ITERS):
        parts.append(f"""
  c{it} AS (
    SELECT o.src AS u, (r.r // o.deg)::BIGINT AS c
    FROM r{it} r JOIN outdeg o ON r.node = o.src
  ),
  i{it} AS (
    SELECT e.dst AS dst, sum(c.c)::BIGINT AS s
    FROM e JOIN c{it} c ON e.src = c.u GROUP BY e.dst
  ),
  r{it + 1} AS (
    SELECT n.node,
           ({base} + (coalesce(i.s, 0) * {_D_NUM}) // {_D_DEN})::BIGINT
             AS r
    FROM nodes n LEFT JOIN i{it} i ON n.node = i.dst
  )""")
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT node AS word, r AS rank_e9 FROM r{_TR_ITERS}
  ORDER BY rank_e9 DESC, word ASC LIMIT {_TR_K}
"""


def q_readability_flesch(spark, sf_dir):
    """Flesch reading ease per document: integer word / sentence /
    syllable counts (vowel-group runs), one pinned double tree
    floored at e3."""
    return text.readability(_t(spark, sf_dir, "documents"))


ORACLE_FLESCH = rf"""
  WITH t AS (
    SELECT doc_id, text,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS w
    FROM documents
  ),
  f AS (
    SELECT doc_id,
      len(w)::BIGINT AS n_words,
      greatest(1, len(regexp_extract_all(text, '[.!?]+')))::BIGINT
        AS n_sentences,
      coalesce(list_sum(list_transform(w,
          x -> greatest(1, len(regexp_extract_all(x, '[aeiouy]+'))))),
        0)::BIGINT AS n_syllables
    FROM t
  )
  SELECT doc_id, n_words, n_sentences, n_syllables,
         (CASE WHEN n_words > 0 THEN
            floor((206.835::DOUBLE
                   - 1.015::DOUBLE * (n_words::DOUBLE
                                      / n_sentences::DOUBLE)
                   - 84.6::DOUBLE * (n_syllables::DOUBLE
                                     / n_words::DOUBLE)) * 1e3)
          ELSE 0 END)::BIGINT AS flesch_e3
  FROM f
"""


def q_js_divergence_sources(spark, sf_dir):
    """Jensen-Shannon divergence of src0 vs src1 unigram
    distributions: exact counts, pinned per-token terms floored at
    e9, exact integer total over the full vocabulary, top-20
    contributing tokens."""
    return text.js_divergence_sources(_t(spark, sf_dir, "documents"))


ORACLE_JS = rf"""
  WITH tk AS (
    SELECT source AS s,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS tok
    FROM documents WHERE source IN ('src0', 'src1')
  ),
  counts AS (
    SELECT tok, sum((s = 'src0')::BIGINT)::BIGINT AS ca,
           sum((s = 'src1')::BIGINT)::BIGINT AS cb
    FROM tk GROUP BY tok
  ),
  tot AS (SELECT sum(ca)::BIGINT AS na, sum(cb)::BIGINT AS nb
          FROM counts),
  t AS (
    SELECT tok, ca, cb,
      floor(((CASE WHEN ca > 0 THEN (ca::DOUBLE / na::DOUBLE)
                * ln((ca::DOUBLE / na::DOUBLE)
                     / (((ca::DOUBLE / na::DOUBLE)
                         + (cb::DOUBLE / nb::DOUBLE)) * 0.5))
              ELSE 0.0 END
            + CASE WHEN cb > 0 THEN (cb::DOUBLE / nb::DOUBLE)
                * ln((cb::DOUBLE / nb::DOUBLE)
                     / (((ca::DOUBLE / na::DOUBLE)
                         + (cb::DOUBLE / nb::DOUBLE)) * 0.5))
              ELSE 0.0 END)
            * 0.5) * 1e9)::BIGINT AS term_e9
    FROM counts, tot
  ),
  total AS (SELECT sum(term_e9)::BIGINT AS js_total_e9 FROM t)
  SELECT tok, ca, cb, term_e9, js_total_e9 FROM t, total
  ORDER BY term_e9 DESC, tok ASC LIMIT 20
"""


QUERIES_ROUND6.update({
    "kaplan_meier_purchase": QuerySpec(
        q_kaplan_meier_purchase, ORACLE_KM,
        doc="Kaplan-Meier time-to-first-purchase survival "
            "(integer risk grid, pinned hazard terms)"),
    "wmape_seasonal_naive": QuerySpec(
        q_wmape_seasonal_naive, ORACLE_WMAPE,
        doc="seasonal-naive forecast backtest, WMAPE per type"),
    "k_core_membership": QuerySpec(
        q_k_core_membership, _k_core_oracle(),
        doc="3-core peeling fixpoint on the co-purchase graph"),
    "degree_assortativity": QuerySpec(
        q_degree_assortativity, ORACLE_ASSORT,
        doc="degree assortativity (exact-moment Pearson over edge "
            "ends)"),
    "item_item_recs": QuerySpec(
        q_item_item_recs, ORACLE_ITEM_ITEM,
        doc="item-item CF cosine top-5 per part"),
    "textrank_keywords": QuerySpec(
        q_textrank_keywords, _textrank_oracle(),
        doc="TextRank keywords via exact-integer PageRank on the "
            "adjacency graph"),
    "readability_flesch": QuerySpec(
        q_readability_flesch, ORACLE_FLESCH,
        doc="Flesch reading ease (integer counts, pinned combine)"),
    "js_divergence_sources": QuerySpec(
        q_js_divergence_sources, ORACLE_JS,
        doc="Jensen-Shannon source divergence, top contributing "
            "tokens + exact total"),
})


# ===========================================================================
# Batch 3: privacy audit / inequality / forecasting / calibration /
#          tokenizer economics / dedup audit
# ===========================================================================

from ..operators import aggregations, dedup, quality  # noqa: E402


_KA_K = 5


def q_k_anonymity_customers(spark, sf_dir):
    """k-anonymity / l-diversity audit of customer quasi-identifiers
    (nation x mktsegment) with acctbal cents as the sensitive
    attribute: exact class sizes, exact distinct-sensitive counts,
    integer violation flags (k=5)."""
    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
         .cast("long").alias("acct_cents"))
    return quality.k_anonymity(
        cust, ("c_nationkey", "c_mktsegment"), "acct_cents", k=_KA_K)


ORACLE_KANON = f"""
  SELECT c_nationkey, c_mktsegment,
         count(*)::BIGINT AS n_rows,
         count(DISTINCT floor(c_acctbal * 100 + 0.5)::BIGINT)::BIGINT
           AS l_diversity,
         (count(*) < {_KA_K})::BIGINT AS k_violation,
         (count(DISTINCT floor(c_acctbal * 100 + 0.5)::BIGINT) <= 1
          )::BIGINT AS l_violation
  FROM customer GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_theil_event_values(spark, sf_dir):
    """Theil T inequality of event values per type: exact totals
    broadcast back, pinned per-row (x/mu)ln(x/mu) terms floored e9,
    exact integer sum, one final pinned floor(sum/n)."""
    return aggregations.theil_index(
        _t(spark, sf_dir, "events"), "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)))


ORACLE_THEIL = """
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS x
    FROM events
  ),
  tot AS (SELECT g, count(*)::BIGINT AS n, sum(x)::BIGINT AS s
          FROM d GROUP BY g),
  t AS (
    SELECT d.g, n, s,
           (CASE WHEN x > 0
                 THEN floor((x::DOUBLE / (s::DOUBLE / n::DOUBLE))
                            * ln(x::DOUBLE / (s::DOUBLE / n::DOUBLE))
                            * 1e9)
                 ELSE 0 END)::BIGINT AS trm
    FROM d JOIN tot USING (g)
  )
  SELECT g AS event_type, n AS n_events, s AS sum_cents,
         floor(sum(trm)::DOUBLE / n::DOUBLE)::BIGINT AS theil_e9
  FROM t GROUP BY g, n, s ORDER BY g
"""


def q_lorenz_user_spend(spark, sf_dir):
    """Lorenz curve of per-user spend in deciles: exact nearest-rank
    cuts on the distinct-total grid, exact per-bin sums, cumulative
    share floored at e6."""
    return eventflow.lorenz_deciles(_t(spark, sf_dir, "events"))


_LOR_CUTS = ",\n           ".join(
    f"min(CASE WHEN cum * 10 >= {kk} * n_users THEN tot END) AS c{kk}"
    for kk in range(1, 10))
_LOR_BIN = " + ".join(f"(tot > c{kk})::BIGINT" for kk in range(1, 10))

ORACLE_LORENZ = f"""
  WITH totals AS (
    SELECT user_id AS u,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS tot
    FROM events GROUP BY user_id
  ),
  per_v AS (SELECT tot, count(*)::BIGINT AS c_v
            FROM totals GROUP BY tot),
  cum AS (
    SELECT tot,
           sum(c_v) OVER (ORDER BY tot
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c_v) OVER () AS n_users
    FROM per_v
  ),
  cuts AS (SELECT {_LOR_CUTS} FROM cum),
  binned AS (
    SELECT tot, ({_LOR_BIN}) AS decile
    FROM totals CROSS JOIN cuts
  ),
  agg AS (
    SELECT decile, count(*)::BIGINT AS n_users,
           sum(tot)::BIGINT AS sum_cents
    FROM binned GROUP BY decile
  ),
  filled AS (
    SELECT b.decile, coalesce(n_users, 0)::BIGINT AS n_users,
           coalesce(sum_cents, 0)::BIGINT AS sum_cents
    FROM (SELECT range::BIGINT AS decile FROM range(10)) b
    LEFT JOIN agg USING (decile)
  ),
  t AS (
    SELECT decile, n_users, sum_cents,
           sum(sum_cents) OVER (ORDER BY decile
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_cents,
           sum(sum_cents) OVER () AS all_cents
    FROM filled
  )
  SELECT decile, n_users, sum_cents, cum_cents::BIGINT AS cum_cents,
         (CASE WHEN all_cents > 0
               THEN floor(cum_cents::DOUBLE / all_cents::DOUBLE * 1e6)
               ELSE 0 END)::BIGINT AS cum_share_e6
  FROM t ORDER BY decile
"""


def q_holt_trend_users(spark, sf_dir):
    """Per-user Holt level+trend (alpha=beta=1/2 integer halving) over
    the last-64 tail; oracle unrolls the coupled recursion as a
    recursive CTE (DuckDB 1.0's list_reduce miscomputes chained
    struct accumulators — measured, see tests)."""
    return eventflow.holt_trend(_t(spark, sf_dir, "events"))


_HOLT_T = 64

ORACLE_HOLT = f"""
  WITH RECURSIVE base AS (
    SELECT user_id AS u,
           struct_pack(ts := ts, eid := event_id,
                       v_c := floor(value * 100 + 0.5)::BIGINT) AS rec
    FROM events
  ),
  arr AS (SELECT u, list_sort(list(rec)) AS a FROM base GROUP BY u),
  tl AS (
    SELECT u, list_slice(a, greatest(1, len(a) - {_HOLT_T - 1}),
                         len(a)) AS tl
    FROM arr
  ),
  e AS (
    SELECT u, len(tl)::BIGINT AS n_tail,
           unnest(tl).v_c * 64 AS vl,
           unnest(range(1, len(tl) + 1))::BIGINT AS i
    FROM tl
  ),
  st AS (
    SELECT u, n_tail, 1::BIGINT AS i, vl::BIGINT AS l, 0::BIGINT AS b
    FROM e WHERE i = 1
    UNION ALL
    SELECT st.u, st.n_tail, st.i + 1,
           floor((e.vl + st.l + st.b)::DOUBLE / 2)::BIGINT,
           floor((st.b
                  + (floor((e.vl + st.l + st.b)::DOUBLE / 2)::BIGINT
                     - st.l))::DOUBLE / 2)::BIGINT
    FROM st JOIN e ON e.u = st.u AND e.i = st.i + 1
  )
  SELECT u AS user_id, n_tail, l AS level_c64, b AS trend_c64,
         (l + b)::BIGINT AS forecast_c64
  FROM st WHERE i = n_tail
"""


_CAL_CUTS = ",\n           ".join(
    f"min(CASE WHEN cum * 10 >= {kk} * n_all THEN margin END) AS c{kk}"
    for kk in range(1, 10))
_CAL_BIN = " + ".join(f"(margin > c{kk})::BIGINT" for kk in range(1, 10))


def q_calibration_bins_nb(spark, sf_dir):
    """NB language-classifier reliability diagram: confidence-margin
    deciles (nearest-rank cuts on the distinct-margin grid) vs
    agreement with the confident stopword labels."""
    return text.calibration_bins(_t(spark, sf_dir, "documents"))


def _calibration_oracle() -> str:
    from .queries import ORACLE_LANG
    from .round5 import _nb_oracle
    return f"""
  WITH nb AS ({_nb_oracle()}),
  lang AS ({ORACLE_LANG}),
  m AS (
    SELECT (greatest(score_en_e6, score_es_e6, score_fr_e6)
            - (score_en_e6 + score_es_e6 + score_fr_e6
               - greatest(score_en_e6, score_es_e6, score_fr_e6)
               - least(score_en_e6, score_es_e6, score_fr_e6))
            )::BIGINT AS margin,
           (l.lang_pred <> 'und')::BIGINT AS confident,
           (l.lang_pred <> 'und'
            AND nb.nb_pred = l.lang_pred)::BIGINT AS agree
    FROM nb JOIN lang l USING (doc_id)
  ),
  per_v AS (SELECT margin, count(*)::BIGINT AS c_v
            FROM m GROUP BY margin),
  cum AS (
    SELECT margin,
           sum(c_v) OVER (ORDER BY margin
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           sum(c_v) OVER () AS n_all
    FROM per_v
  ),
  cuts AS (SELECT {_CAL_CUTS} FROM cum),
  binned AS (
    SELECT confident, agree, ({_CAL_BIN}) AS bin
    FROM m CROSS JOIN cuts
  ),
  agg AS (
    SELECT bin, count(*)::BIGINT AS n_docs,
           sum(confident)::BIGINT AS n_confident,
           sum(agree)::BIGINT AS n_agree
    FROM binned GROUP BY bin
  ),
  filled AS (
    SELECT b.bin, coalesce(n_docs, 0)::BIGINT AS n_docs,
           coalesce(n_confident, 0)::BIGINT AS n_confident,
           coalesce(n_agree, 0)::BIGINT AS n_agree
    FROM (SELECT range::BIGINT AS bin FROM range(10)) b
    LEFT JOIN agg USING (bin)
  )
  SELECT bin, n_docs, n_confident, n_agree,
         (CASE WHEN n_confident > 0
               THEN floor(n_agree::DOUBLE / n_confident::DOUBLE * 1e6)
               ELSE 0 END)::BIGINT AS agree_rate_e6
  FROM filled ORDER BY bin
"""


def q_tokenizer_fertility(spark, sf_dir):
    """Subword fertility (pieces per word) per gold language under the
    fixed greedy vocabulary: exact per-language sums, one pinned
    division floored e6."""
    return text.tokenizer_fertility(_t(spark, sf_dir, "documents"))


def _fertility_oracle() -> str:
    from .round4 import _oracle_subword
    return f"""
  WITH sw AS ({_oracle_subword()})
  SELECT d.lang, count(*)::BIGINT AS n_docs,
         sum(sw.n_words)::BIGINT AS sum_words,
         sum(sw.n_pieces)::BIGINT AS sum_pieces,
         (CASE WHEN sum(sw.n_words) > 0
               THEN floor(sum(sw.n_pieces)::DOUBLE
                          / sum(sw.n_words)::DOUBLE * 1e6)
               ELSE 0 END)::BIGINT AS fertility_e6
  FROM sw JOIN documents d USING (doc_id)
  GROUP BY d.lang ORDER BY d.lang
"""


def q_dedup_cluster_sizes(spark, sf_dir):
    """Near-dup cluster-size histogram: component sizes from the
    MinHash pair graph, plus the singleton count (docs in no pair)
    as the size-1 row — the dedup-audit distribution."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(docs)
    comp = dedup.connected_components(pairs)
    sizes = comp.groupBy("component").agg(
        F.count("*").alias("cluster_size"))
    hist = sizes.groupBy("cluster_size").agg(
        F.count("*").cast("long").alias("n_clusters"))
    nd = docs.groupBy().agg(F.count("*").alias("n_docs"))
    nc = comp.groupBy().agg(F.count("*").alias("n_clustered"))
    singleton = nd.crossJoin(F.broadcast(nc)).select(
        F.lit(1).cast("long").alias("cluster_size"),
        (F.col("n_docs") - F.col("n_clustered")).cast("long")
        .alias("n_clusters"))
    return (hist.select(F.col("cluster_size").cast("long"),
                        "n_clusters")
            .unionAll(singleton).orderBy("cluster_size"))


def _cluster_sizes_oracle() -> str:
    from .queries import _oracle_components
    return f"""
  WITH comp AS ({_oracle_components()}),
  sizes AS (SELECT component, count(*)::BIGINT AS cluster_size
            FROM comp GROUP BY component),
  hist AS (SELECT cluster_size, count(*)::BIGINT AS n_clusters
           FROM sizes GROUP BY cluster_size),
  nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
  nc AS (SELECT count(*)::BIGINT AS n_clustered FROM comp)
  SELECT cluster_size, n_clusters FROM hist
  UNION ALL
  SELECT 1::BIGINT, (n_docs - n_clustered)::BIGINT FROM nd, nc
"""


QUERIES_ROUND6.update({
    "k_anonymity_customers": QuerySpec(
        q_k_anonymity_customers, ORACLE_KANON,
        doc="k-anonymity / l-diversity privacy audit over customer "
            "quasi-identifiers"),
    "theil_event_values": QuerySpec(
        q_theil_event_values, ORACLE_THEIL,
        doc="Theil T inequality per event type (pinned terms, exact "
            "integer sum)"),
    "lorenz_user_spend": QuerySpec(
        q_lorenz_user_spend, ORACLE_LORENZ,
        doc="Lorenz concentration deciles of per-user spend"),
    "holt_trend_users": QuerySpec(
        q_holt_trend_users, ORACLE_HOLT,
        doc="Holt level+trend forecast over bounded tails (integer "
            "halving)"),
    "calibration_bins_nb": QuerySpec(
        q_calibration_bins_nb, _calibration_oracle(),
        doc="NB classifier reliability diagram vs heuristic labels"),
    "tokenizer_fertility": QuerySpec(
        q_tokenizer_fertility, _fertility_oracle(),
        doc="subword fertility per language (greedy vocab)"),
    "dedup_cluster_sizes": QuerySpec(
        q_dedup_cluster_sizes, _cluster_sizes_oracle(),
        doc="near-dup cluster-size histogram incl. singletons"),
})


# ===========================================================================
# Batch 4: Arrow-native vector ops / burstiness / LTV / correlation
#          matrix / concordance
# ===========================================================================

from ..operators import arrowops  # noqa: E402


def q_arrow_embedding_norms(spark, sf_dir):
    """mapInArrow vector hygiene scan: per-vector L2 norm and max
    |component|, e6-floored; the squared-sum folds sequentially over
    dims to match the oracle's list_reduce order bit-for-bit."""
    return arrowops.embedding_norms(_t(spark, sf_dir, "embeddings"))


ORACLE_ARROW_NORMS = """
  SELECT vec_id,
         floor(sqrt(list_reduce(
             list_transform(embedding, x -> x::DOUBLE * x::DOUBLE),
             (a, b) -> a + b)) * 1e6)::BIGINT AS norm_e6,
         floor(list_max(list_transform(embedding,
                                       x -> abs(x::DOUBLE)))
               * 1e6)::BIGINT AS max_abs_e6
  FROM embeddings
"""


def q_arrow_label_centroids(spark, sf_dir):
    """applyInArrow per-label centroid accumulator: exact BIGINT sums
    of e6-quantized components per (label, dim) — quantize-then-sum
    makes the result batch-order-proof."""
    return arrowops.label_centroids(_t(spark, sf_dir, "embeddings"))


ORACLE_ARROW_CENTROIDS = """
  WITH t AS (
    SELECT label::BIGINT AS label,
           unnest(embedding) AS comp,
           unnest(range(1, len(embedding) + 1))::BIGINT AS dim
    FROM embeddings
  )
  SELECT label, dim,
         sum(floor(comp::DOUBLE * 1e6)::BIGINT)::BIGINT AS sum_q_e6,
         count(*)::BIGINT AS n_vecs
  FROM t GROUP BY label, dim ORDER BY label, dim
"""


def q_fano_factor_bursts(spark, sf_dir):
    """Fano factor (variance/mean of hourly counts) per event type —
    exact decimal moments, one pinned division floored e6."""
    return eventflow.fano_factor(_t(spark, sf_dir, "events"))


ORACLE_FANO = """
  WITH b AS (
    SELECT event_type,
           floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS bucket
    FROM events
  ),
  counts AS (SELECT event_type, bucket, count(*)::BIGINT AS c
             FROM b GROUP BY 1, 2),
  agg AS (
    SELECT event_type, count(*)::HUGEINT AS n,
           sum(c)::HUGEINT AS s,
           sum(c::HUGEINT * c::HUGEINT) AS q
    FROM counts GROUP BY event_type
  )
  SELECT event_type, n::BIGINT AS n_buckets, s::BIGINT AS n_events,
         (CASE WHEN s > 0
               THEN floor((n::DOUBLE * q::DOUBLE
                           - s::DOUBLE * s::DOUBLE)
                          / (n::DOUBLE * s::DOUBLE) * 1e6)
               ELSE 0 END)::BIGINT AS fano_e6
  FROM agg ORDER BY event_type
"""


def q_cohort_ltv(spark, sf_dir):
    """Cohort LTV triangle: cumulative purchase revenue per (first-day
    cohort, day offset) and all-integer average LTV per cohort user."""
    return eventflow.cohort_ltv(_t(spark, sf_dir, "events"))


ORACLE_LTV = """
  WITH e AS (
    SELECT user_id AS u,
           floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           event_type AS et,
           floor(value * 100 + 0.5)::BIGINT AS cents
    FROM events
  ),
  coh AS (SELECT u, min(day) AS cohort_day FROM e GROUP BY u),
  sizes AS (SELECT cohort_day, count(*)::BIGINT AS n_cohort_users
            FROM coh GROUP BY cohort_day),
  rev AS (
    SELECT c.cohort_day, (e.day - c.cohort_day)::BIGINT AS day_offset,
           sum(cents)::BIGINT AS rev_cents
    FROM e JOIN coh c ON e.u = c.u
    WHERE et = 'purchase' GROUP BY 1, 2
  ),
  cum AS (
    SELECT cohort_day, day_offset, rev_cents,
           sum(rev_cents) OVER (PARTITION BY cohort_day
             ORDER BY day_offset ROWS BETWEEN UNBOUNDED PRECEDING
             AND CURRENT ROW)::BIGINT AS cum_rev_cents
    FROM rev
  )
  SELECT cohort_day, day_offset, rev_cents, cum_rev_cents,
         n_cohort_users,
         ((cum_rev_cents * 100) // n_cohort_users)::BIGINT
           AS avg_ltv_c100
  FROM cum JOIN sizes USING (cohort_day)
  ORDER BY cohort_day, day_offset
"""


def q_correlation_matrix_lineitem(spark, sf_dir):
    """3x3 Pearson matrix (qty, price cents, discount points) in one
    scan: nine exact decimal moments, pinned combines, tall unpivoted
    upper triangle."""
    li = _t(spark, sf_dir, "lineitem")
    return aggregations.corr_matrix3(
        li, F.floor("l_quantity"),
        F.floor(F.col("l_extendedprice") * 100),
        F.floor(F.col("l_discount") * 100),
        ("qty", "price", "disc"))


def _corr_pair_sql(a, b, aa, bb, ab, name):
    num = f"(n::DOUBLE * {ab}::DOUBLE - {a}::DOUBLE * {b}::DOUBLE)"
    va = f"(n::DOUBLE * {aa}::DOUBLE - {a}::DOUBLE * {a}::DOUBLE)"
    vb = f"(n::DOUBLE * {bb}::DOUBLE - {b}::DOUBLE * {b}::DOUBLE)"
    return f"""
  SELECT '{name}' AS pair, n::BIGINT AS n_rows,
         (CASE WHEN {va} * {vb} > 0.0
               THEN floor({num} / sqrt({va} * {vb}) * 1e6)
               ELSE 0 END)::BIGINT AS corr_e6
  FROM agg"""


ORACLE_CORR_MATRIX = f"""
  WITH d AS (
    SELECT floor(l_quantity)::BIGINT AS x,
           floor(l_extendedprice * 100)::BIGINT AS y,
           floor(l_discount * 100)::BIGINT AS z
    FROM lineitem
  ),
  agg AS (
    SELECT count(*)::HUGEINT AS n,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(z)::HUGEINT AS sz,
           sum(x::HUGEINT * x::HUGEINT) AS sxx,
           sum(y::HUGEINT * y::HUGEINT) AS syy,
           sum(z::HUGEINT * z::HUGEINT) AS szz,
           sum(x::HUGEINT * y::HUGEINT) AS sxy,
           sum(x::HUGEINT * z::HUGEINT) AS sxz,
           sum(y::HUGEINT * z::HUGEINT) AS syz
    FROM d
  )
  {_corr_pair_sql('sx', 'sy', 'sxx', 'syy', 'sxy', 'qty_price')}
  UNION ALL
  {_corr_pair_sql('sx', 'sz', 'sxx', 'szz', 'sxz', 'qty_disc')}
  UNION ALL
  {_corr_pair_sql('sy', 'sz', 'syy', 'szz', 'syz', 'price_disc')}
  ORDER BY pair
"""


def q_kwic_the(spark, sf_dir):
    """Keyword-in-context for 'the': first-occurrence position and the
    ±2-token snippet — zero-shuffle codegen projection."""
    return text.kwic(_t(spark, sf_dir, "documents"))


ORACLE_KWIC = rf"""
  WITH t AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                               x -> x <> '') AS w
    FROM documents
  ),
  p AS (
    SELECT doc_id, coalesce(list_position(w, 'the'), 0)::BIGINT AS pos,
           len(w)::BIGINT AS n_tokens, w
    FROM t
  )
  SELECT doc_id, pos, n_tokens,
         array_to_string(w[greatest(1, pos - 2):least(n_tokens, pos + 2)],
                         ' ') AS snippet
  FROM p WHERE pos > 0
"""


QUERIES_ROUND6.update({
    "arrow_embedding_norms": QuerySpec(
        q_arrow_embedding_norms, ORACLE_ARROW_NORMS,
        doc="mapInArrow L2-norm / max-abs vector hygiene scan"),
    "arrow_label_centroids": QuerySpec(
        q_arrow_label_centroids, ORACLE_ARROW_CENTROIDS,
        doc="applyInArrow exact integer centroid accumulator"),
    "fano_factor_bursts": QuerySpec(
        q_fano_factor_bursts, ORACLE_FANO,
        doc="Fano-factor burstiness per event type"),
    "cohort_ltv": QuerySpec(
        q_cohort_ltv, ORACLE_LTV,
        doc="cohort LTV triangle, all-integer average per user"),
    "correlation_matrix_lineitem": QuerySpec(
        q_correlation_matrix_lineitem, ORACLE_CORR_MATRIX,
        doc="one-scan 3x3 Pearson matrix (exact moments)"),
    "kwic_the": QuerySpec(
        q_kwic_the, ORACLE_KWIC,
        doc="keyword-in-context concordance snippets"),
})


# ===========================================================================
# Batch 5: HITS / STL-lite / centroid separability / SQL-surface set
#          ops / vocab pruning
# ===========================================================================

_HITS_ITERS = 2


def q_hits_trade(spark, sf_dir):
    """HITS hubs & authorities on the directed supplier→customer trade
    graph, 2 un-normalized exact-integer iterations (suppliers are
    hubs, customers authorities)."""
    li = _t(spark, sf_dir, "lineitem")
    od = _t(spark, sf_dir, "orders")
    pairs = (li.select("l_orderkey", "l_suppkey")
             .join(od.select("o_orderkey", "o_custkey"),
                   li.l_orderkey == od.o_orderkey)
             .select((F.col("l_suppkey") * 2 + 1).alias("src"),
                     (F.col("o_custkey") * 2).alias("dst"))
             .distinct())
    return graph.hits(pairs, iters=_HITS_ITERS)


def _hits_oracle() -> str:
    from ..operators.graph import HITS_SCALE
    parts = [f"""
  e AS (
    SELECT DISTINCT l.l_suppkey * 2 + 1 AS src,
           o.o_custkey * 2 AS dst
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  ),
  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
  h0 AS (SELECT node, {HITS_SCALE}::BIGINT AS h FROM nodes)"""]
    for t in range(_HITS_ITERS):
        parts.append(f"""
  ai{t} AS (
    SELECT e.dst, sum(h.h)::BIGINT AS s_a
    FROM e JOIN h{t} h ON e.src = h.node GROUP BY e.dst
  ),
  a{t + 1} AS (
    SELECT n.node, coalesce(s_a, 0)::BIGINT AS a
    FROM nodes n LEFT JOIN ai{t} ON n.node = ai{t}.dst
  ),
  hi{t} AS (
    SELECT e.src, sum(a.a)::BIGINT AS s_h
    FROM e JOIN a{t + 1} a ON e.dst = a.node GROUP BY e.src
  ),
  h{t + 1} AS (
    SELECT n.node, coalesce(s_h, 0)::BIGINT AS h
    FROM nodes n LEFT JOIN hi{t} ON n.node = hi{t}.src
  )""")
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT h.node, h.h AS hub, a.a AS authority
  FROM h{_HITS_ITERS} h JOIN a{_HITS_ITERS} a ON h.node = a.node
"""


def q_stl_hourly_values(spark, sf_dir):
    """STL-lite additive decomposition of per-type hourly value
    series: centered ±12-bucket trend, hour-of-day seasonal on the
    detrended series, exact integer residual."""
    return eventflow.stl_lite(_t(spark, sf_dir, "events"))


ORACLE_STL = """
  WITH g AS (
    SELECT event_type,
           floor(floor(epoch(ts))::BIGINT / 3600)::BIGINT AS bucket,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS y
    FROM events GROUP BY 1, 2
  ),
  t AS (
    SELECT event_type, bucket, y,
           floor((sum(y) OVER w)::DOUBLE
                 / (count(y) OVER w)::DOUBLE)::BIGINT AS trend,
           (bucket % 24)::BIGINT AS hod
    FROM g
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
  ),
  d AS (SELECT *, (y - trend)::BIGINT AS detr FROM t),
  s AS (
    SELECT event_type, hod,
           floor(sum(detr)::DOUBLE / count(*)::DOUBLE)::BIGINT
             AS seasonal
    FROM d GROUP BY 1, 2
  )
  SELECT d.event_type, bucket, y, trend, seasonal,
         (y - trend - seasonal)::BIGINT AS residual
  FROM d JOIN s ON d.event_type = s.event_type AND d.hod = s.hod
  ORDER BY d.event_type, bucket
"""


def q_centroid_separability(spark, sf_dir):
    """Cosine between every pair of label centroids (composes the
    applyInArrow accumulator): pinned mean per cell, exact integer
    dots/norms over dims, one pinned division per pair."""
    return arrowops.centroid_cosine(_t(spark, sf_dir, "embeddings"))


ORACLE_CENTROID_COS = f"""
  WITH cent AS ({ORACLE_ARROW_CENTROIDS}),
  m AS (
    SELECT label, dim,
           floor(sum_q_e6::DOUBLE / n_vecs::DOUBLE)::BIGINT AS mq
    FROM cent
  ),
  dots AS (
    SELECT a.label AS label_a, b.label AS label_b,
           sum(a.mq * b.mq)::BIGINT AS dot
    FROM m a JOIN m b ON a.dim = b.dim AND a.label < b.label
    GROUP BY 1, 2
  ),
  norms AS (SELECT label, sum(mq * mq)::BIGINT AS n2
            FROM m GROUP BY label)
  SELECT label_a, label_b,
         (CASE WHEN na.n2 > 0 AND nb.n2 > 0
               THEN floor(dot::DOUBLE
                          / sqrt(na.n2::DOUBLE * nb.n2::DOUBLE) * 1e6)
               ELSE 0 END)::BIGINT AS cosine_e6
  FROM dots JOIN norms na ON label_a = na.label
            JOIN norms nb ON label_b = nb.label
  ORDER BY label_a, label_b
"""


def q_except_all_custkeys(spark, sf_dir):
    """EXCEPT ALL multiset semantics through the SQL text interface:
    order custkeys minus one occurrence per customer row — repeat
    buyers survive with multiplicity n_orders − 1."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("r6_orders_v")
    _t(spark, sf_dir, "customer").createOrReplaceTempView("r6_cust_v")
    return spark.sql("""
      SELECT o_custkey AS custkey FROM r6_orders_v
      EXCEPT ALL
      SELECT c_custkey FROM r6_cust_v
    """)


ORACLE_EXCEPT_ALL = """
  SELECT o_custkey AS custkey FROM orders
  EXCEPT ALL
  SELECT c_custkey FROM customer
"""


def q_group_by_all_revenue(spark, sf_dir):
    """GROUP BY ALL sugar through the SQL text interface — grouping
    keys inferred from the non-aggregate select list."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("r6_orders_v2")
    return spark.sql("""
      SELECT o_orderstatus, o_orderpriority,
             count(*) AS n_orders,
             sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS rev_cents
      FROM r6_orders_v2
      GROUP BY ALL
      ORDER BY o_orderstatus, o_orderpriority
    """)


ORACLE_GROUP_BY_ALL = """
  SELECT o_orderstatus, o_orderpriority,
         count(*)::BIGINT AS n_orders,
         sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS rev_cents
  FROM orders
  GROUP BY ALL
  ORDER BY o_orderstatus, o_orderpriority
"""


def q_vocab_prune_manifest(spark, sf_dir):
    """Vocabulary pruning manifest: document frequency per token and
    the all-integer [min_df=2, max_df=50%] survival flag."""
    return text.vocab_prune(_t(spark, sf_dir, "documents"))


ORACLE_VOCAB_PRUNE = rf"""
  WITH per_doc AS (
    SELECT DISTINCT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS tok
    FROM documents
  ),
  dfreq AS (SELECT tok, count(*)::BIGINT AS doc_freq
            FROM per_doc GROUP BY tok),
  nd AS (SELECT count(*)::BIGINT AS n_docs FROM documents)
  SELECT tok, doc_freq, n_docs,
         (doc_freq >= 2 AND doc_freq * 100 <= 50 * n_docs)::BIGINT
           AS kept
  FROM dfreq, nd ORDER BY tok
"""


QUERIES_ROUND6.update({
    "hits_trade": QuerySpec(
        q_hits_trade, _hits_oracle(),
        doc="HITS hubs/authorities, exact-integer un-normalized "
            "iterations"),
    "stl_hourly_values": QuerySpec(
        q_stl_hourly_values, ORACLE_STL,
        doc="STL-lite trend/seasonal/residual decomposition"),
    "centroid_separability": QuerySpec(
        q_centroid_separability, ORACLE_CENTROID_COS,
        doc="label-centroid cosine matrix (class separability)"),
    "except_all_custkeys": QuerySpec(
        q_except_all_custkeys, ORACLE_EXCEPT_ALL,
        doc="EXCEPT ALL multiset set-op via SQL text"),
    "group_by_all_revenue": QuerySpec(
        q_group_by_all_revenue, ORACLE_GROUP_BY_ALL,
        doc="GROUP BY ALL inferred grouping via SQL text"),
    "vocab_prune_manifest": QuerySpec(
        q_vocab_prune_manifest, ORACLE_VOCAB_PRUNE,
        doc="df-band vocabulary pruning manifest (all-integer)"),
})


# ===========================================================================
# Batch 6: clustering coefficient / STL anomalies / weighted paths /
#          funnel latencies
# ===========================================================================


def q_clustering_coefficient(spark, sf_dir):
    """Local clustering coefficient on the co-purchase graph —
    composes the degree-ordered triangle counter; cc_e6 is pure
    integer division."""
    return graph.clustering_coefficient(
        graph.copurchase_edges(_t(spark, sf_dir, "lineitem")))


def _clustering_oracle() -> str:
    from .analytics_more import ORACLE_TRIANGLES
    return f"""
  WITH tri AS ({ORACLE_TRIANGLES}),
  ce AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  ),
  deg AS (
    SELECT n AS node, count(*)::BIGINT AS d FROM (
      SELECT pa AS n FROM ce UNION ALL SELECT pb FROM ce)
    GROUP BY n
  )
  SELECT deg.node, d AS degree,
         coalesce(tri.n_triangles, 0)::BIGINT AS n_triangles,
         (CASE WHEN d >= 2
               THEN (2 * coalesce(tri.n_triangles, 0) * 1000000)
                    // (d * (d - 1))
               ELSE 0 END)::BIGINT AS cc_e6
  FROM deg LEFT JOIN tri ON deg.node = tri.node
  ORDER BY deg.node
"""


def q_stl_anomaly_buckets(spark, sf_dir):
    """Seasonality-adjusted anomalies: buckets whose |STL residual|
    exceeds 3x the per-type MAD of residuals (exact low-median rank
    arithmetic — no FP)."""
    from pyspark.sql import Window
    r = eventflow.stl_lite(_t(spark, sf_dir, "events"))
    ar = r.select("event_type", "bucket", "residual",
                  F.abs("residual").cast("long").alias("absr"))
    w = Window.partitionBy("event_type").orderBy("absr")
    ranked = ar.select(
        "event_type", "bucket", "residual", "absr",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("event_type")).alias("n"))
    mad = (ranked.where(F.col("rn") == F.expr("(n + 1) div 2"))
           .select("event_type", F.col("absr").alias("mad")))
    return (ar.join(mad, "event_type")
            .where(F.col("absr") > 3 * F.col("mad"))
            .select("event_type", "bucket", "residual", "mad")
            .orderBy("event_type", "bucket"))


ORACLE_STL_ANOM = f"""
  WITH stl AS ({ORACLE_STL}),
  ar AS (
    SELECT event_type, bucket, residual,
           abs(residual)::BIGINT AS absr
    FROM stl
  ),
  ranked AS (
    SELECT event_type, bucket, residual, absr,
           row_number() OVER (PARTITION BY event_type ORDER BY absr)
             AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM ar
  ),
  mad AS (
    SELECT event_type, absr AS mad FROM ranked
    WHERE rn = (n + 1) // 2
  )
  SELECT ar.event_type, bucket, residual, mad
  FROM ar JOIN mad ON ar.event_type = mad.event_type
  WHERE absr > 3 * mad
  ORDER BY ar.event_type, bucket
"""


_WSP_ROUNDS = 4


def q_weighted_paths_parts(spark, sf_dir):
    """Bounded Bellman-Ford from the lowest part id over the
    co-purchase graph with affinity costs (1e6 div co-count —
    stronger ties are cheaper): exact integer distances, unrolled
    oracle."""
    li = _t(spark, sf_dir, "lineitem")
    # pair counts carry MULTIPLICITY (a part listed twice in an order
    # pairs twice), so this is collect_list + a strict pa<pb filter —
    # NOT copurchase_edges' collect_set/distinct (measured equal to
    # the order-key self-join, 2.1 s → 1.4 s at sf0.1: one scan, one
    # partial-aggregated shuffle)
    parts = (li.groupBy("l_orderkey")
             .agg(F.array_sort(F.collect_list("l_partkey")).alias("ps")))
    pairs = parts.select(F.explode(F.flatten(F.transform(
        "ps", lambda x, i: F.transform(
            F.slice("ps", i + 2, F.size("ps")),
            lambda y: F.struct(x.alias("pa"), y.alias("pb")))))).alias("e"))
    co = (pairs.where(F.col("e.pa") < F.col("e.pb"))
          .groupBy(F.col("e.pa").alias("pa"), F.col("e.pb").alias("pb"))
          .agg(F.count("*").alias("co")))
    e = (co.select(F.col("pa").alias("src"), F.col("pb").alias("dst"),
                   F.expr("1000000 div co").alias("w"))
         .unionAll(co.select(F.col("pb").alias("src"),
                             F.col("pa").alias("dst"),
                             F.expr("1000000 div co").alias("w"))))
    return graph.weighted_relax(e, rounds=_WSP_ROUNDS)


def _weighted_paths_oracle() -> str:
    parts = [f"""
  ce AS (
    SELECT a.l_partkey AS pa, b.l_partkey AS pb,
           count(*)::BIGINT AS co
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    GROUP BY 1, 2
  ),
  e AS MATERIALIZED (
    SELECT pa AS src, pb AS dst, (1000000 // co)::BIGINT AS w FROM ce
    UNION ALL
    SELECT pb, pa, (1000000 // co)::BIGINT FROM ce
  ),
  root AS (
    SELECT min(node) AS node FROM (
      SELECT src AS node FROM e UNION SELECT dst FROM e)
  ),
  d0 AS (SELECT node, 0::BIGINT AS c FROM root)"""]
    for r in range(_WSP_ROUNDS):
        parts.append(f"""
  d{r + 1} AS MATERIALIZED (
    SELECT node, min(c)::BIGINT AS c FROM (
      SELECT node, c FROM d{r}
      UNION ALL
      SELECT e.dst AS node, d.c + e.w AS c
      FROM d{r} d JOIN e ON e.src = d.node)
    GROUP BY node
  )""")
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT node, c AS cost FROM d{_WSP_ROUNDS}
"""


def q_funnel_transition_medians(spark, sf_dir):
    """Exact low-median seconds between consecutive funnel stages over
    converting users (same single-exchange gather as event_funnel)."""
    return eventflow.stage_transition_medians(_t(spark, sf_dir, "events"))


ORACLE_TRANSITION_MEDIANS = """
  WITH e AS (
    SELECT user_id AS u, event_type AS et,
           floor(epoch(ts))::BIGINT AS ts_s
    FROM events
  ),
  s1 AS (SELECT u, min(CASE WHEN et = 'view' THEN ts_s END) AS t0
         FROM e GROUP BY u),
  s2 AS (SELECT e.u,
                min(CASE WHEN et = 'click' AND ts_s >= t0
                          AND ts_s <= t0 + 86400 THEN ts_s END) AS t1
         FROM e JOIN s1 USING (u) GROUP BY e.u),
  s3 AS (SELECT e.u,
                min(CASE WHEN et = 'purchase' AND ts_s >= t1
                          AND ts_s <= t1 + 86400 THEN ts_s END) AS t2
         FROM e JOIN s2 USING (u) GROUP BY e.u),
  d AS (
    SELECT 'view_to_click' AS transition, (t1 - t0)::BIGINT AS delta_s
    FROM s2 JOIN s1 USING (u) WHERE t1 IS NOT NULL
    UNION ALL
    SELECT 'click_to_purchase', (t2 - t1)::BIGINT
    FROM s3 JOIN s2 USING (u) WHERE t2 IS NOT NULL
  ),
  r AS (
    SELECT transition, delta_s,
           row_number() OVER (PARTITION BY transition
                              ORDER BY delta_s) AS rn,
           count(*) OVER (PARTITION BY transition) AS n
    FROM d
  )
  SELECT transition, n::BIGINT AS n_converted,
         delta_s AS median_delta_s
  FROM r WHERE rn = (n + 1) // 2 ORDER BY transition
"""


QUERIES_ROUND6.update({
    "clustering_coefficient": QuerySpec(
        q_clustering_coefficient, _clustering_oracle(), headline=True,
        doc="local clustering coefficient (integer cc from triangle "
            "counts)"),
    "stl_anomaly_buckets": QuerySpec(
        q_stl_anomaly_buckets, ORACLE_STL_ANOM,
        doc="seasonality-adjusted anomalies via STL residual MAD"),
    "weighted_paths_parts": QuerySpec(
        q_weighted_paths_parts, _weighted_paths_oracle(),
        doc="bounded Bellman-Ford with affinity costs"),
    "funnel_transition_medians": QuerySpec(
        q_funnel_transition_medians, ORACLE_TRANSITION_MEDIANS,
        doc="exact low-median stage transition latencies"),
})


# ===========================================================================
# Batch 7: curriculum order / packing audit / incremental dedup /
#          JL projection
# ===========================================================================

from ..functions.scalar import stable_hash64_sql  # noqa: E402


def q_curriculum_order(spark, sf_dir):
    """Quality-banded curriculum training order with deterministic
    within-band shuffle (two-phase global rank — never a single-task
    sort; oracle uses the naive global row_number)."""
    return curation.curriculum_order(_t(spark, sf_dir, "documents"))


def _curriculum_oracle() -> str:
    from .queries import ORACLE_QUALITY
    return f"""
  WITH q AS ({ORACLE_QUALITY}),
  h AS (
    SELECT doc_id, quality,
           {stable_hash64_sql('doc_id::VARCHAR', 11)} AS hh
    FROM q
  )
  SELECT doc_id, quality,
         (row_number() OVER (ORDER BY (100 - quality) // 10, hh,
                             doc_id) - 1)::BIGINT AS curriculum_pos
  FROM h
"""


def q_packing_fill_histogram(spark, sf_dir):
    """Histogram of per-sequence token fill after concat-and-split
    packing at seq_len=64 — the padding-waste audit (exact interval
    overlaps, bounded span explode)."""
    docs = _t(spark, sf_dir, "documents")
    from ..operators.text import tokens as _tokens
    nt = docs.select(F.col("doc_id"),
                     F.size(_tokens("text")).cast("long")
                      .alias("n_tokens"))
    return curation.packing_fill_histogram(nt, seq_len=64, bucket=256)


ORACLE_PACK_FILL = rf"""
  WITH t AS (
    SELECT doc_id,
           len(list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> ''))::BIGINT AS n_tokens
    FROM documents
  ),
  off AS (
    SELECT doc_id, n_tokens,
           coalesce(sum(n_tokens) OVER (
             ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0)::BIGINT AS o
    FROM t
  ),
  spans AS (
    SELECT o, n_tokens,
           unnest(range(o // 64, (o + n_tokens - 1) // 64 + 1))
             ::BIGINT AS pack
    FROM off WHERE n_tokens > 0
  ),
  per_pack AS (
    SELECT pack,
           sum(least(o + n_tokens, (pack + 1) * 64)
               - greatest(o, pack * 64))::BIGINT AS fill_tokens
    FROM spans GROUP BY pack
  )
  SELECT fill_tokens, count(*)::BIGINT AS n_packs
  FROM per_pack GROUP BY fill_tokens ORDER BY fill_tokens
"""


_INC_NEW_SOURCE = "src9"


def q_incremental_dedup(spark, sf_dir):
    """Incremental ingest dedup: MinHash near-dup pairs between the
    src9 batch and the rest of the corpus — cross-side-only bucket
    join (no corpus self-pairs), exact Jaccard verify."""
    docs = _t(spark, sf_dir, "documents")
    return dedup.incremental_near_duplicates(
        docs, F.col("source") == _INC_NEW_SOURCE)


def _incremental_dedup_oracle() -> str:
    from .queries import _oracle_minhash
    return f"""
  WITH mh AS ({_oracle_minhash()}),
  flags AS (SELECT doc_id,
                   (source = '{_INC_NEW_SOURCE}')::BIGINT AS is_new
            FROM documents)
  SELECT (CASE WHEN fa.is_new = 1 THEN doc_a ELSE doc_b END)::BIGINT
           AS new_doc,
         (CASE WHEN fa.is_new = 1 THEN doc_b ELSE doc_a END)::BIGINT
           AS dup_of,
         inter_size, union_size
  FROM mh JOIN flags fa ON fa.doc_id = mh.doc_a
          JOIN flags fb ON fb.doc_id = mh.doc_b
  WHERE fa.is_new + fb.is_new = 1
"""


def q_jl_projection(spark, sf_dir):
    """Deterministic ±1 Johnson-Lindenstrauss projection 64→16 dims
    on the e6 integer grid — exact BIGINT output components."""
    from ..operators.similarity import jl_project
    return jl_project(_t(spark, sf_dir, "embeddings"))


ORACLE_JL = """
  WITH t AS (
    SELECT vec_id, unnest(embedding) AS comp,
           unnest(range(0, len(embedding)))::BIGINT AS i
    FROM embeddings
  ),
  q AS (SELECT vec_id, i,
               floor(comp::DOUBLE * 1e6)::BIGINT AS qq
        FROM t),
  s AS (
    SELECT i.range::BIGINT AS i, j.range::BIGINT AS jdim,
           (1 - 2 * (((i.range * 73856093 + j.range * 19349663)
                      % 97) % 2))::BIGINT AS s
    FROM range(64) i, range(16) j
  )
  SELECT vec_id, jdim, sum(s * qq)::BIGINT AS proj_q_e6
  FROM q JOIN s USING (i) GROUP BY vec_id, jdim
  ORDER BY vec_id, jdim
"""


QUERIES_ROUND6.update({
    "curriculum_order": QuerySpec(
        q_curriculum_order, _curriculum_oracle(),
        doc="quality-banded curriculum order, two-phase global rank"),
    "packing_fill_histogram": QuerySpec(
        q_packing_fill_histogram, ORACLE_PACK_FILL,
        doc="per-sequence fill audit of concat-and-split packing"),
    "incremental_dedup": QuerySpec(
        q_incremental_dedup, _incremental_dedup_oracle(),
        doc="batch-vs-corpus MinHash dedup (cross-side bucket join "
            "only)"),
    "jl_projection": QuerySpec(
        q_jl_projection, ORACLE_JL,
        doc="deterministic Rademacher JL projection on the integer "
            "grid"),
})


# ===========================================================================
# Batch 8: log-rank survival test / script mix / gap histogram
# ===========================================================================


def q_logrank_ab_survival(spark, sf_dir):
    """Log-rank test of time-to-first-purchase between A/B arms:
    exact pooled risk grid, pinned O−E and variance terms floored
    e9, one final pinned z floored e6."""
    return eventflow.logrank_test(_t(spark, sf_dir, "events"))


ORACLE_LOGRANK = """
  WITH pu AS (
    SELECT user_id,
           min(floor(epoch(ts))::BIGINT) AS first_s,
           min(CASE WHEN event_type = 'purchase'
                    THEN floor(epoch(ts))::BIGINT END) AS ev_s,
           max(floor(epoch(ts))::BIGINT) AS last_s
    FROM events GROUP BY user_id
  ),
  dur AS (
    SELECT coalesce(ev_s - first_s, last_s - first_s) AS t,
           (ev_s IS NOT NULL)::BIGINT AS is_event,
           (user_id % 2)::BIGINT AS arm
    FROM pu
  ),
  pts AS (
    SELECT t,
           sum(CASE WHEN arm = 0 THEN is_event ELSE 0 END)::BIGINT AS d1,
           sum(CASE WHEN arm = 0 THEN 1 - is_event ELSE 0 END)::BIGINT
             AS c1,
           sum(CASE WHEN arm = 1 THEN is_event ELSE 0 END)::BIGINT AS d2,
           sum(CASE WHEN arm = 1 THEN 1 - is_event ELSE 0 END)::BIGINT
             AS c2
    FROM dur GROUP BY t
  ),
  risk AS (
    SELECT t, d1, d2,
           (sum(d1 + c1) OVER ()
            - coalesce(sum(d1 + c1) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0))::BIGINT AS n1,
           (sum(d2 + c2) OVER ()
            - coalesce(sum(d2 + c2) OVER (ORDER BY t
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0))::BIGINT AS n2
    FROM pts
  ),
  ev AS (SELECT * FROM risk WHERE d1 + d2 >= 1),
  terms AS (
    SELECT
      floor((d1::DOUBLE - (d1 + d2)::DOUBLE * n1::DOUBLE
             / (n1 + n2)::DOUBLE) * 1e9)::BIGINT AS oe_e9,
      (CASE WHEN (n1 + n2) > 1
            THEN floor((d1 + d2)::DOUBLE
                       * (n1::DOUBLE / (n1 + n2)::DOUBLE)
                       * (n2::DOUBLE / (n1 + n2)::DOUBLE)
                       * (((n1 + n2)::DOUBLE - (d1 + d2)::DOUBLE)
                          / ((n1 + n2)::DOUBLE - 1.0)) * 1e9)
            ELSE 0 END)::BIGINT AS v_e9
    FROM ev
  ),
  agg AS (
    SELECT count(*)::BIGINT AS n_times,
           sum(oe_e9)::BIGINT AS o_minus_e_e9,
           sum(v_e9)::BIGINT AS var_e9
    FROM terms
  )
  SELECT n_times, o_minus_e_e9, var_e9,
         (CASE WHEN var_e9 > 0
               THEN floor((o_minus_e_e9::DOUBLE / 1e9)
                          / sqrt(var_e9::DOUBLE / 1e9) * 1e6)
               ELSE 0 END)::BIGINT AS z_e6
  FROM agg
"""


def q_script_mix_report(spark, sf_dir):
    """Unicode script composition per document (literal character
    classes — identical in Java regex and RE2), deterministic
    dominance."""
    return text.script_mix(_t(spark, sf_dir, "documents"))


ORACLE_SCRIPT_MIX = """
  WITH d AS (
    SELECT doc_id,
           len(regexp_extract_all(text, '[一-鿿]'))::BIGINT AS n_cjk,
           len(regexp_extract_all(text, '[A-Za-z]'))::BIGINT AS n_latin,
           len(regexp_extract_all(text, '[0-9]'))::BIGINT AS n_digit
    FROM documents
  )
  SELECT doc_id, n_cjk, n_latin, n_digit,
         (CASE WHEN n_cjk >= n_latin AND n_cjk >= n_digit
                    AND n_cjk > 0 THEN 'cjk'
               WHEN n_latin >= n_digit AND n_latin > 0 THEN 'latin'
               WHEN n_digit > 0 THEN 'digit'
               ELSE 'none' END) AS dominant_script
  FROM d
"""


def q_interevent_gap_histogram(spark, sf_dir):
    """Log2-bucketed inter-event gap histogram (integer
    length(bin(gap))−1 — no FP log), the sessionization-gap tuning
    profile."""
    return eventflow.interevent_gap_histogram(_t(spark, sf_dir, "events"))


ORACLE_GAP_HIST = """
  WITH e AS (
    SELECT user_id AS u, floor(epoch(ts))::BIGINT AS s, event_id AS eid
    FROM events
  ),
  gaps AS (
    SELECT s - lag(s) OVER (PARTITION BY u ORDER BY s, eid) AS gap
    FROM e
  ),
  b AS (
    SELECT (CASE WHEN gap <= 0 THEN -1
                 ELSE length(bin(gap)) - 1 END)::BIGINT AS log2_bucket
    FROM gaps WHERE gap IS NOT NULL
  )
  SELECT log2_bucket, count(*)::BIGINT AS n_gaps
  FROM b GROUP BY log2_bucket ORDER BY log2_bucket
"""


QUERIES_ROUND6.update({
    "logrank_ab_survival": QuerySpec(
        q_logrank_ab_survival, ORACLE_LOGRANK,
        doc="log-rank survival test between A/B arms (pinned O-E and "
            "variance terms)"),
    "script_mix_report": QuerySpec(
        q_script_mix_report, ORACLE_SCRIPT_MIX,
        doc="unicode script composition per document"),
    "interevent_gap_histogram": QuerySpec(
        q_interevent_gap_histogram, ORACLE_GAP_HIST,
        doc="log2 inter-event gap histogram (integer bin-length "
            "log)"),
})


# ===========================================================================
# Batch 9: LATERAL subquery / RANGE frame / nightly ingest gate
# ===========================================================================


def q_lateral_top_order(spark, sf_dir):
    """Correlated LATERAL subquery (Spark 4 SQL surface): each
    customer's single highest-value order via a per-row dependent
    subquery — Catalyst decorrelates it to the same
    window/aggregate plan a hand-written top-1 would produce."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("r6_lat_c")
    _t(spark, sf_dir, "orders").createOrReplaceTempView("r6_lat_o")
    return spark.sql("""
      SELECT c.c_custkey, t.o_orderkey, t.cents
      FROM r6_lat_c c,
      LATERAL (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
        FROM r6_lat_o o WHERE o.o_custkey = c.c_custkey
        ORDER BY cents DESC, o_orderkey ASC LIMIT 1
      ) t
    """)


ORACLE_LATERAL = """
  SELECT c.c_custkey, t.o_orderkey, t.cents
  FROM customer c,
  LATERAL (
    SELECT o_orderkey, floor(o_totalprice * 100)::BIGINT AS cents
    FROM orders o WHERE o.o_custkey = c.c_custkey
    ORDER BY cents DESC, o_orderkey ASC LIMIT 1
  ) t
"""


def q_range_window_weekly_revenue(spark, sf_dir):
    """Value-based RANGE window frame: trailing 7-day revenue per
    order day (range -6..0 over the integer epoch-day key — the frame
    follows the VALUE axis across date gaps, unlike a rows frame).
    The single ordered window runs over |distinct days| rows —
    range-partition it at a wider date domain."""
    from pyspark.sql import Window
    od = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    daily = (od.select(day.cast("long").alias("day"),
                       F.floor(F.col("o_totalprice") * 100)
                        .cast("long").alias("cents"))
             .groupBy("day")
             .agg(F.sum("cents").cast("long").alias("day_cents")))
    w = Window.orderBy("day").rangeBetween(-6, 0)
    return (daily.select(
        "day", "day_cents",
        F.sum("day_cents").over(w).cast("long").alias("trailing_7d"))
        .orderBy("day"))


ORACLE_RANGE_WINDOW = """
  WITH daily AS (
    SELECT date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT
             AS day,
           sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS day_cents
    FROM orders GROUP BY 1
  )
  SELECT day, day_cents,
         sum(day_cents) OVER (ORDER BY day
           RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)::BIGINT
           AS trailing_7d
  FROM daily ORDER BY day
"""


_GATE_MIN_QUALITY = 60


def q_ingest_accept_list(spark, sf_dir):
    """The complete nightly ingest gate for the src9 batch: accept a
    new document iff its heuristic quality clears the bar AND it is
    not a near-dup of the corpus AND it is not a non-keeper near-dup
    within its own batch (greedy lowest-id keeper — the package-wide
    rule). Composes quality_score + incremental_near_duplicates +
    minhash_near_duplicates, all individually oracle-verified."""
    from ..operators.text import quality_score
    docs = _t(spark, sf_dir, "documents")
    is_new = F.col("source") == _INC_NEW_SOURCE
    q = quality_score(docs).select("doc_id", "quality")
    new_docs = docs.where(is_new).select("doc_id").join(q, "doc_id")
    cross = (dedup.incremental_near_duplicates(docs, is_new)
             .select(F.col("new_doc").alias("doc_id")).distinct())
    within = (dedup.minhash_near_duplicates(docs.where(is_new))
              .select(F.col("doc_b").alias("doc_id")).distinct())
    rejects = cross.unionAll(within).distinct()
    return (new_docs
            .join(rejects, "doc_id", "left_anti")
            .where(F.col("quality") >= _GATE_MIN_QUALITY)
            .select("doc_id", "quality")
            .orderBy("doc_id"))


def _ingest_gate_oracle() -> str:
    from .queries import ORACLE_QUALITY, _oracle_minhash
    return f"""
  WITH mh AS ({_oracle_minhash()}),
  flags AS (SELECT doc_id,
                   (source = '{_INC_NEW_SOURCE}')::BIGINT AS is_new
            FROM documents),
  tagged AS (
    SELECT doc_a, doc_b, fa.is_new AS na, fb.is_new AS nb
    FROM mh JOIN flags fa ON fa.doc_id = mh.doc_a
            JOIN flags fb ON fb.doc_id = mh.doc_b
  ),
  rejects AS (
    SELECT CASE WHEN na = 1 THEN doc_a ELSE doc_b END AS doc_id
    FROM tagged WHERE na + nb = 1
    UNION
    SELECT doc_b FROM tagged WHERE na = 1 AND nb = 1
  ),
  q AS ({ORACLE_QUALITY})
  SELECT d.doc_id, q.quality
  FROM documents d
  JOIN q ON q.doc_id = d.doc_id
  WHERE d.source = '{_INC_NEW_SOURCE}'
    AND q.quality >= {_GATE_MIN_QUALITY}
    AND d.doc_id NOT IN (SELECT doc_id FROM rejects)
  ORDER BY d.doc_id
"""


QUERIES_ROUND6.update({
    "lateral_top_order": QuerySpec(
        q_lateral_top_order, ORACLE_LATERAL,
        doc="correlated LATERAL subquery (decorrelated top-1 per "
            "customer)"),
    "range_window_weekly_revenue": QuerySpec(
        q_range_window_weekly_revenue, ORACLE_RANGE_WINDOW,
        doc="value-based RANGE frame trailing-7-day revenue"),
    "ingest_accept_list": QuerySpec(
        q_ingest_accept_list, _ingest_gate_oracle(),
        doc="nightly ingest gate: quality + cross-corpus dedup + "
            "within-batch keeper"),
})


# ===========================================================================
# Batch 10: parameterized SQL / sequence mining / embedding outliers
# ===========================================================================

_PARAM_CAP = 50000.0


def q_parameterized_sql(spark, sf_dir):
    """Named-parameter SQL (Spark 4 parameterized queries): the bind
    variable arrives via args=, never string interpolation — the
    injection-safe serving surface."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("r6_param_o")
    return spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM r6_param_o WHERE o_totalprice < :cap
        GROUP BY o_orderpriority ORDER BY o_orderpriority
        """,
        args={"cap": _PARAM_CAP})


ORACLE_PARAM_SQL = f"""
  SELECT o_orderpriority, count(*)::BIGINT AS n_orders
  FROM orders WHERE o_totalprice < {_PARAM_CAP}::DOUBLE
  GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_top_trigram_journeys(spark, sf_dir):
    """Top-20 three-step behavior sequences via one user-partitioned
    double-lead window (no journey strings, no self-joins)."""
    return eventflow.top_trigram_journeys(_t(spark, sf_dir, "events"))


ORACLE_TRIGRAMS = """
  WITH e AS (
    SELECT user_id AS u, floor(epoch(ts))::BIGINT AS s,
           event_id AS eid, substr(event_type, 1, 1) AS c
    FROM events
  ),
  tri AS (
    SELECT c || lead(c, 1) OVER w || lead(c, 2) OVER w AS trigram
    FROM e WINDOW w AS (PARTITION BY u ORDER BY s, eid)
  )
  SELECT trigram, count(*)::BIGINT AS n_journeys
  FROM tri WHERE trigram IS NOT NULL
  GROUP BY trigram
  ORDER BY n_journeys DESC, trigram ASC LIMIT 20
"""


def q_embedding_outliers(spark, sf_dir):
    """Within-class embedding outliers: exact integer distance to the
    own-label centroid, cross-multiplied decimal(38) z-test — no
    division or sqrt anywhere."""
    return arrowops.embedding_outliers(_t(spark, sf_dir, "embeddings"))


ORACLE_EMB_OUTLIERS = f"""
  WITH cent AS ({ORACLE_ARROW_CENTROIDS}),
  means AS (
    SELECT label, dim,
           floor(sum_q_e6::DOUBLE / n_vecs::DOUBLE)::BIGINT AS mq
    FROM cent
  ),
  t AS (
    SELECT vec_id, label::BIGINT AS label,
           unnest(embedding) AS comp,
           unnest(range(1, len(embedding) + 1))::BIGINT AS dim
    FROM embeddings
  ),
  q AS (SELECT vec_id, label, dim,
               floor(comp::DOUBLE * 1e6)::BIGINT AS qq
        FROM t),
  d2 AS (
    SELECT vec_id, label,
           sum((qq - mq) * (qq - mq))::BIGINT AS dist2
    FROM q JOIN means USING (label, dim)
    GROUP BY vec_id, label
  ),
  mom AS (
    SELECT label, count(*)::HUGEINT AS n,
           sum(dist2)::HUGEINT AS s,
           sum(dist2::HUGEINT * dist2::HUGEINT) AS s2
    FROM d2 GROUP BY label
  )
  SELECT vec_id, d2.label, dist2, n::BIGINT AS n_label,
         1::BIGINT AS is_outlier
  FROM d2 JOIN mom ON d2.label = mom.label
  WHERE (n * dist2 - s) > 0
    AND (n * dist2 - s) * (n * dist2 - s) > 9 * (n * s2 - s * s)
  ORDER BY vec_id
"""


QUERIES_ROUND6.update({
    "parameterized_sql": QuerySpec(
        q_parameterized_sql, ORACLE_PARAM_SQL,
        doc="named-parameter SQL binding (injection-safe serving)"),
    "top_trigram_journeys": QuerySpec(
        q_top_trigram_journeys, ORACLE_TRIGRAMS,
        doc="3-step sequence mining via double-lead window"),
    "embedding_outliers": QuerySpec(
        q_embedding_outliers, ORACLE_EMB_OUTLIERS,
        doc="within-class centroid-distance outliers (integer z²)"),
})


# ===========================================================================
# Batch 11: containment dedup / DAU-WAU stickiness / hapax audit
# ===========================================================================


def q_containment_dups(spark, sf_dir):
    """Asymmetric containment near-dups: candidate pairs whose smaller
    shingle set is ≥90% inside the other — sub-document duplication
    symmetric Jaccard misses."""
    return dedup.containment_duplicates(_t(spark, sf_dir, "documents"))


def _containment_oracle() -> str:
    from .queries import _minhash_graph_sql
    return f"""
  {_minhash_graph_sql()}
  SELECT i.doc_a, i.doc_b, i.inter_size::BIGINT AS inter_size,
         na.n_sh::BIGINT AS n_a, nb.n_sh::BIGINT AS n_b,
         ((i.inter_size * 1000000)
          // least(na.n_sh, nb.n_sh))::BIGINT AS cont_small_e6
  FROM inter i
  JOIN sizes na ON na.doc_id = i.doc_a
  JOIN sizes nb ON nb.doc_id = i.doc_b
  WHERE i.inter_size * 10 >= 9 * least(na.n_sh, nb.n_sh)
"""


def q_dau_wau_stickiness(spark, sf_dir):
    """DAU / trailing-7d WAU / integer stickiness per observed day —
    exact distincts via the bounded 7-day fan-out (no
    distinct-over-range-window)."""
    return eventflow.dau_wau_stickiness(_t(spark, sf_dir, "events"))


ORACLE_DAU_WAU = """
  WITH ud AS (
    SELECT DISTINCT user_id AS u,
           floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day
    FROM events
  ),
  dau AS (SELECT day, count(*)::BIGINT AS dau FROM ud GROUP BY day),
  fanned AS (
    SELECT DISTINCT u,
           unnest(range(day, day + 7))::BIGINT AS wday
    FROM ud
  ),
  wau AS (SELECT wday, count(*)::BIGINT AS wau
          FROM fanned GROUP BY wday)
  SELECT day, dau.dau, wau.wau,
         ((dau.dau * 1000000) // wau.wau)::BIGINT AS stickiness_e6
  FROM dau JOIN wau ON dau.day = wau.wday
  ORDER BY day
"""


def q_hapax_ratio_by_source(spark, sf_dir):
    """Hapax legomena share per source — the noisy-ingest detector
    (all-integer, per-source pre-aggregation before the vocab
    join)."""
    return text.hapax_ratio_by_source(_t(spark, sf_dir, "documents"))


ORACLE_HAPAX = rf"""
  WITH toks AS (
    SELECT source,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS tok
    FROM documents
  ),
  per_src AS (SELECT source, tok, count(*)::BIGINT AS c_src
              FROM toks GROUP BY 1, 2),
  gcnt AS (SELECT tok, sum(c_src)::BIGINT AS c_all
           FROM per_src GROUP BY tok),
  agg AS (
    SELECT source, sum(c_src)::BIGINT AS n_tokens,
           sum(CASE WHEN c_all = 1 THEN c_src ELSE 0 END)::BIGINT
             AS n_hapax
    FROM per_src JOIN gcnt USING (tok) GROUP BY source
  )
  SELECT source, n_tokens, n_hapax,
         ((n_hapax * 1000000) // n_tokens)::BIGINT AS hapax_ratio_e6
  FROM agg ORDER BY source
"""


QUERIES_ROUND6.update({
    "containment_dups": QuerySpec(
        q_containment_dups, _containment_oracle(),
        doc="asymmetric >=90% containment near-dups (sub-document "
            "duplication)"),
    "dau_wau_stickiness": QuerySpec(
        q_dau_wau_stickiness, ORACLE_DAU_WAU,
        doc="DAU / trailing WAU / integer stickiness per day"),
    "hapax_ratio_by_source": QuerySpec(
        q_hapax_ratio_by_source, ORACLE_HAPAX,
        doc="per-source hapax legomena ratio (noise detector)"),
})


# ===========================================================================
# Batch 12: deterministic bootstrap CI / retrieval eval
# ===========================================================================

from ..operators import sampling  # noqa: E402
from ..operators.sampling import _POISSON1_CDF, _H_RANGE  # noqa: E402


_BOOT_B = 40


def q_bootstrap_order_mean(spark, sf_dir):
    """Deterministic Poisson bootstrap of the mean order value:
    literal-threshold Poisson(1) weights per (row, replicate), exact
    replicate sums, nearest-rank p05/median/p95 band."""
    od = _t(spark, sf_dir, "orders")
    return sampling.bootstrap_mean_ci(
        od, "o_orderkey",
        F.floor(F.col("o_totalprice") * 100), n_boot=_BOOT_B)


def _bootstrap_oracle() -> str:
    t = [int(p * _H_RANGE) for p in _POISSON1_CDF]
    h = stable_hash64_sql("id || ':' || bb::VARCHAR")
    lo_r = max(1, -(-5 * _BOOT_B // 100))
    med_r = (_BOOT_B + 1) // 2
    hi_r = -(-95 * _BOOT_B // 100)
    return f"""
  WITH bs AS (SELECT range::BIGINT AS bb FROM range({_BOOT_B})),
  d AS (SELECT o_orderkey::VARCHAR AS id,
               floor(o_totalprice * 100)::BIGINT AS v
        FROM orders),
  e AS (SELECT id, v, bb FROM d, bs),
  wts AS (
    SELECT bb, v,
           (CASE WHEN {h} < {t[0]} THEN 0
                 WHEN {h} < {t[1]} THEN 1
                 WHEN {h} < {t[2]} THEN 2
                 WHEN {h} < {t[3]} THEN 3
                 ELSE 4 END)::BIGINT AS w
    FROM e
  ),
  reps AS (
    SELECT bb, sum(w)::BIGINT AS n_w, sum(w * v)::BIGINT AS s_w
    FROM wts GROUP BY bb
  ),
  means AS (
    SELECT (CASE WHEN n_w > 0
                 THEN floor(s_w::DOUBLE / n_w::DOUBLE)
                 ELSE 0 END)::BIGINT AS m
    FROM reps
  ),
  ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rn
             FROM means),
  pick AS (
    SELECT max(CASE WHEN rn = {lo_r} THEN m END)::BIGINT AS p05_c,
           max(CASE WHEN rn = {med_r} THEN m END)::BIGINT AS med_c,
           max(CASE WHEN rn = {hi_r} THEN m END)::BIGINT AS p95_c
    FROM ranked
  ),
  base AS (
    SELECT count(*)::BIGINT AS n_rows,
           floor(sum(v)::DOUBLE / count(*)::DOUBLE)::BIGINT AS mean_c
    FROM d
  )
  SELECT n_rows, mean_c, p05_c, med_c, p95_c,
         {_BOOT_B}::BIGINT AS n_boot
  FROM base, pick
"""


def q_retrieval_eval(spark, sf_dir):
    """MRR / nDCG@10 of the BM25 ranking against the conjunctive
    relevance set — all-integer from Python-literal rank discounts."""
    from .analytics_more import _BM25_TERMS
    return text.retrieval_eval(_t(spark, sf_dir, "documents"),
                               _BM25_TERMS, k=10)


def _retrieval_eval_oracle() -> str:
    from .analytics_more import _BM25_TERMS, _bm25_oracle
    from ..operators.text import _ndcg_discounts
    disc = _ndcg_discounts(10)
    disc_case = " ".join(f"WHEN rank = {r} THEN {dv}"
                         for r, dv in enumerate(disc, start=1))
    cum = [0]
    for dv in disc:
        cum.append(cum[-1] + dv)
    idcg_case = " ".join(f"WHEN m = {i} THEN {cum[i]}"
                         for i in range(1, 11))
    contains = " + ".join(f"list_contains(w, '{t}')::BIGINT"
                          for t in _BM25_TERMS)
    return rf"""
  WITH bm AS ({_bm25_oracle()}),
  ranked AS (
    SELECT doc_id, score_e6,
           row_number() OVER (ORDER BY score_e6 DESC, doc_id) AS rank
    FROM bm
  ),
  tw AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       x -> x <> '') AS w
    FROM documents
  ),
  rel AS (
    SELECT doc_id,
           (({contains}) = {len(_BM25_TERMS)})::BIGINT AS relevant
    FROM tw
  ),
  nr AS (SELECT sum(relevant)::BIGINT AS n_relevant FROM rel),
  hits AS (
    SELECT min(CASE WHEN relevant = 1 THEN rank END) AS first_rel,
           sum(CASE WHEN relevant = 1
                    THEN (CASE {disc_case} ELSE 0 END)
                    ELSE 0 END)::BIGINT AS dcg_e9
    FROM ranked JOIN rel USING (doc_id)
  )
  SELECT n_relevant,
         coalesce(first_rel, 0)::BIGINT AS first_rel_rank,
         (CASE WHEN first_rel IS NOT NULL
               THEN 1000000000 // first_rel ELSE 0 END)::BIGINT
           AS mrr_e9,
         dcg_e9,
         (CASE {idcg_case} ELSE 0 END)::BIGINT AS idcg_e9,
         (CASE WHEN (CASE {idcg_case} ELSE 0 END) > 0
               THEN (dcg_e9 * 1000000)
                    // (CASE {idcg_case} ELSE 0 END)
               ELSE 0 END)::BIGINT AS ndcg_e6
  FROM hits, nr, (SELECT least(n_relevant, 10)::BIGINT AS m FROM nr) mm
"""


QUERIES_ROUND6.update({
    "bootstrap_order_mean": QuerySpec(
        q_bootstrap_order_mean, _bootstrap_oracle(),
        doc="deterministic Poisson bootstrap CI of the mean order "
            "value"),
    "retrieval_eval": QuerySpec(
        q_retrieval_eval, _retrieval_eval_oracle(),
        doc="MRR / nDCG@10 of BM25 vs conjunctive relevance "
            "(literal discounts)"),
})


# ===========================================================================
# Batch 13: median-of-means / sketch-vs-exact Jaccard audit
# ===========================================================================

from ..operators import sketches  # noqa: E402


_MOM_K = 32


def q_median_of_means(spark, sf_dir):
    """Median-of-means robust mean of event value cents: 32
    hash-deterministic buckets, pinned bucket means, exact low-median
    — next to the plain mean for the outlier-gap diagnostic."""
    return aggregations.median_of_means(
        _t(spark, sf_dir, "events"), "event_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)), k_groups=_MOM_K)


def _mom_oracle() -> str:
    h = stable_hash64_sql("event_id::VARCHAR")
    med_r = (_MOM_K + 1) // 2
    return f"""
  WITH d AS (
    SELECT ({h} % {_MOM_K})::BIGINT AS g,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  groups AS (SELECT g, count(*)::BIGINT AS n, sum(v)::BIGINT AS s
             FROM d GROUP BY g),
  means AS (
    SELECT (CASE WHEN n > 0 THEN floor(s::DOUBLE / n::DOUBLE)
                 ELSE 0 END)::BIGINT AS m
    FROM groups
  ),
  ranked AS (SELECT m, row_number() OVER (ORDER BY m) AS rn
             FROM means),
  mom AS (SELECT m AS mom_c FROM ranked WHERE rn = {med_r}),
  base AS (
    SELECT count(*)::BIGINT AS n_rows,
           floor(sum(v)::DOUBLE / count(*)::DOUBLE)::BIGINT AS mean_c
    FROM d
  )
  SELECT n_rows, {_MOM_K}::BIGINT AS k_groups, mean_c, mom_c
  FROM base, mom
"""


_SVJ_K = 16


def q_source_vocab_jaccard(spark, sf_dir):
    """MinHash estimate vs exact Jaccard between every source pair's
    vocabulary — the estimator-quality audit on the dedup family's
    own xor-salt permutations."""
    return sketches.source_vocab_jaccard(
        _t(spark, sf_dir, "documents"), k=_SVJ_K)


def _svj_oracle() -> str:
    from ..operators.dedup import xor_salts
    salts = xor_salts(_SVJ_K)
    h = stable_hash64_sql("tok", 0)
    mins = ",\n           ".join(
        f"min(xor({h}, {salts[i]})) AS h{i}" for i in range(_SVJ_K))
    match = " + ".join(f"(a.h{i} = b.h{i})::BIGINT"
                       for i in range(_SVJ_K))
    return rf"""
  WITH st AS (
    SELECT DISTINCT source AS src,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS tok
    FROM documents
  ),
  sig AS (
    SELECT src,
           {mins}
    FROM st GROUP BY src
  ),
  est AS (
    SELECT a.src AS source_a, b.src AS source_b,
           ({match})::BIGINT AS n_match
    FROM sig a JOIN sig b ON a.src < b.src
  ),
  sizes AS (SELECT src, count(*)::BIGINT AS n_tok
            FROM st GROUP BY src),
  inter AS (
    SELECT ta.src AS source_a, tb.src AS source_b,
           count(*)::BIGINT AS inter
    FROM st ta JOIN st tb ON ta.tok = tb.tok AND ta.src < tb.src
    GROUP BY 1, 2
  )
  SELECT e.source_a, e.source_b,
         coalesce(i.inter, 0)::BIGINT AS inter,
         na.n_tok::BIGINT AS n_a, nb.n_tok::BIGINT AS n_b,
         e.n_match,
         ((coalesce(i.inter, 0) * 1000000)
          // (na.n_tok + nb.n_tok - coalesce(i.inter, 0)))::BIGINT
           AS exact_j_e6,
         ((e.n_match * 1000000) // {_SVJ_K})::BIGINT AS est_j_e6
  FROM est e
  LEFT JOIN inter i ON e.source_a = i.source_a
                   AND e.source_b = i.source_b
  JOIN sizes na ON na.src = e.source_a
  JOIN sizes nb ON nb.src = e.source_b
  ORDER BY e.source_a, e.source_b
"""


QUERIES_ROUND6.update({
    "median_of_means": QuerySpec(
        q_median_of_means, _mom_oracle(),
        doc="hash-bucketed median-of-means robust mean"),
    "source_vocab_jaccard": QuerySpec(
        q_source_vocab_jaccard, _svj_oracle(),
        doc="MinHash estimate vs exact Jaccard per source pair "
            "(estimator audit)"),
})


# ===========================================================================
# Batch 14: conformal intervals / churn labels / trimmed mean /
#           revenue feature table
# ===========================================================================


def q_conformal_intervals(spark, sf_dir):
    """Split-conformal 90% interval half-width per event type for the
    seasonal-naive forecaster — exact nearest-rank
    ceil(0.9(n+1))-th absolute residual."""
    return eventflow.conformal_forecast_intervals(
        _t(spark, sf_dir, "events"))


ORACLE_CONFORMAL = """
  WITH g AS (
    SELECT event_type, ts::DATE AS day, hour(ts)::BIGINT AS hour,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS actual
    FROM events GROUP BY 1, 2, 3
  ),
  s AS (
    SELECT event_type,
           abs(actual - lag(actual) OVER (PARTITION BY event_type,
             hour ORDER BY day))::BIGINT AS absr
    FROM g
  ),
  sc AS (SELECT event_type, absr FROM s WHERE absr IS NOT NULL),
  ranked AS (
    SELECT event_type, absr,
           row_number() OVER (PARTITION BY event_type ORDER BY absr)
             AS rn,
           count(*) OVER (PARTITION BY event_type) AS n
    FROM sc
  )
  SELECT event_type, n::BIGINT AS n_calibration,
         absr AS qhat_cents
  FROM ranked
  WHERE rn = least(n, (9 * (n + 1) + 9) // 10)
  ORDER BY event_type
"""


def q_churn_rates(spark, sf_dir):
    """Churn labels (7-day inactivity against the corpus horizon) and
    per-arm churn rates — all-integer, horizon via 1-row broadcast."""
    return eventflow.churn_labels(_t(spark, sf_dir, "events"))


ORACLE_CHURN = """
  WITH pu AS (
    SELECT user_id,
           max(floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT)
             AS last_day
    FROM events GROUP BY user_id
  ),
  h AS (SELECT max(last_day) AS max_day FROM pu),
  lab AS (
    SELECT (user_id % 2)::BIGINT AS arm,
           ((max_day - last_day) >= 7)::BIGINT AS churned
    FROM pu, h
  )
  SELECT arm, count(*)::BIGINT AS n_users,
         sum(churned)::BIGINT AS n_churned,
         ((sum(churned) * 1000000) // count(*))::BIGINT
           AS churn_rate_e6
  FROM lab GROUP BY arm ORDER BY arm
"""


def q_trimmed_mean_prices(spark, sf_dir):
    """10% two-sided trimmed mean of extended price per returnflag —
    exact rank trimming, one pinned division."""
    return aggregations.trimmed_mean(
        _t(spark, sf_dir, "lineitem"), "l_returnflag",
        F.floor(F.col("l_extendedprice") * 100))


ORACLE_TRIMMED = """
  WITH d AS (
    SELECT l_returnflag AS g,
           floor(l_extendedprice * 100)::BIGINT AS v
    FROM lineitem
  ),
  ranked AS (
    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM d
  ),
  kept AS (
    SELECT g, v, n FROM ranked
    WHERE rn > (n * 1) // 10 AND rn <= n - (n * 1) // 10
  )
  SELECT g AS l_returnflag, max(n)::BIGINT AS n_total,
         count(*)::BIGINT AS n_kept,
         floor(sum(v)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS trimmed_mean_c
  FROM kept GROUP BY g ORDER BY g
"""


def q_daily_revenue_features(spark, sf_dir):
    """ML feature table for revenue forecasting: per order day, the
    cents total plus lag-1 / lag-7 OBSERVED-day features and the
    day-of-week — one partitioned-less lag window over |days| rows
    (range-partition at a wider domain)."""
    from pyspark.sql import Window
    od = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"),
                     F.lit("1970-01-01").cast("date")).cast("long")
    daily = (od.select(day.alias("day"),
                       F.floor(F.col("o_totalprice") * 100)
                        .cast("long").alias("cents"))
             .groupBy("day")
             .agg(F.sum("cents").cast("long").alias("rev")))
    w = Window.orderBy("day")
    return (daily.select(
        "day", "rev",
        F.coalesce(F.lag("rev", 1).over(w), F.lit(0)).cast("long")
         .alias("rev_lag1"),
        F.coalesce(F.lag("rev", 7).over(w), F.lit(0)).cast("long")
         .alias("rev_lag7"),
        F.pmod(F.col("day") + 4, F.lit(7)).cast("long").alias("dow"))
        .orderBy("day"))


ORACLE_REV_FEATURES = """
  WITH daily AS (
    SELECT date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT
             AS day,
           sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS rev
    FROM orders GROUP BY 1
  )
  SELECT day, rev,
         coalesce(lag(rev, 1) OVER (ORDER BY day), 0)::BIGINT
           AS rev_lag1,
         coalesce(lag(rev, 7) OVER (ORDER BY day), 0)::BIGINT
           AS rev_lag7,
         ((day + 4) % 7)::BIGINT AS dow
  FROM daily ORDER BY day
"""


QUERIES_ROUND6.update({
    "conformal_intervals": QuerySpec(
        q_conformal_intervals, ORACLE_CONFORMAL,
        doc="split-conformal 90% interval per type (nearest-rank "
            "residual quantile)"),
    "churn_rates": QuerySpec(
        q_churn_rates, ORACLE_CHURN,
        doc="7-day-inactivity churn labels + per-arm rates"),
    "trimmed_mean_prices": QuerySpec(
        q_trimmed_mean_prices, ORACLE_TRIMMED,
        doc="exact 10% two-sided trimmed mean per group"),
    "daily_revenue_features": QuerySpec(
        q_daily_revenue_features, ORACLE_REV_FEATURES,
        doc="lag-feature table for revenue forecasting"),
})


# ===========================================================================
# Batch 15: first-touch attribution / session duration histogram
# ===========================================================================


def q_first_touch_attribution(spark, sf_dir):
    """First-touch purchase attribution (earliest prior view within
    the day window) — the acquisition twin of the green last-touch
    query, same single-window shape."""
    return eventflow.first_touch_attribution(_t(spark, sf_dir, "events"))


ORACLE_FIRST_TOUCH = """
  WITH base AS (
    SELECT user_id AS u, floor(epoch(ts))::BIGINT AS ts_s,
           event_id AS eid, event_type AS et
    FROM events
  ),
  scored AS (
    SELECT u, ts_s, eid,
           min(CASE WHEN et = 'view'
                    THEN struct_pack(vts := ts_s, vid := eid) END)
             OVER (PARTITION BY u ORDER BY ts_s, eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS fv,
           et
    FROM base
  )
  SELECT eid AS purchase_id, u AS user_id,
         (CASE WHEN fv IS NOT NULL AND ts_s - fv.vts <= 86400
               THEN fv.vid ELSE -1 END)::BIGINT
           AS attributed_view_id,
         (CASE WHEN fv IS NOT NULL AND ts_s - fv.vts <= 86400
               THEN ts_s - fv.vts ELSE -1 END)::BIGINT
           AS view_to_purchase_s
  FROM scored WHERE et = 'purchase'
"""


def q_session_duration_histogram(spark, sf_dir):
    """Log2 histogram of gap-session durations (single-event sessions
    in bucket −1) — integer bin-length log, sessionizer-composed."""
    return eventflow.session_duration_histogram(
        _t(spark, sf_dir, "events"))


ORACLE_SESSION_DUR = """
  WITH base AS (
    SELECT user_id AS u, floor(epoch(ts))::BIGINT AS ts_s,
           event_id AS eid
    FROM events
  ),
  flagged AS (
    SELECT u, ts_s, eid,
           (CASE WHEN lag(ts_s) OVER w IS NULL
                      OR ts_s - lag(ts_s) OVER w > 1800
                 THEN 1 ELSE 0 END) AS ns
    FROM base WINDOW w AS (PARTITION BY u ORDER BY ts_s, eid)
  ),
  sess AS (
    SELECT u, ts_s,
           sum(ns) OVER (PARTITION BY u ORDER BY ts_s, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
  ),
  per_sess AS (
    SELECT u, sid, (max(ts_s) - min(ts_s))::BIGINT AS dur
    FROM sess GROUP BY u, sid
  ),
  b AS (
    SELECT (CASE WHEN dur <= 0 THEN -1
                 ELSE length(bin(dur)) - 1 END)::BIGINT AS log2_bucket
    FROM per_sess
  )
  SELECT log2_bucket, count(*)::BIGINT AS n_sessions
  FROM b GROUP BY log2_bucket ORDER BY log2_bucket
"""


QUERIES_ROUND6.update({
    "first_touch_attribution": QuerySpec(
        q_first_touch_attribution, ORACLE_FIRST_TOUCH,
        doc="first-touch purchase attribution (single ordered "
            "window)"),
    "session_duration_histogram": QuerySpec(
        q_session_duration_histogram, ORACLE_SESSION_DUR,
        doc="log2 session-duration histogram (gap sessions)"),
})


# ===========================================================================
# Batch 16: rolling correlation / nearest-in-time join / readability
#           rollup
# ===========================================================================

from ..operators import joins  # noqa: E402


def q_rolling_corr_view_purchase(spark, sf_dir):
    """Trailing 14-day Pearson correlation between daily view and
    purchase cents totals — six exact RANGE-frame moment sums, one
    pinned combine per day."""
    return eventflow.rolling_corr_daily(_t(spark, sf_dir, "events"))


ORACLE_ROLLING_CORR = """
  WITH daily AS (
    SELECT floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           sum(CASE WHEN event_type = 'view'
                    THEN floor(value * 100 + 0.5)::BIGINT
                    ELSE 0 END)::BIGINT AS x,
           sum(CASE WHEN event_type = 'purchase'
                    THEN floor(value * 100 + 0.5)::BIGINT
                    ELSE 0 END)::BIGINT AS y
    FROM events WHERE event_type IN ('view', 'purchase')
    GROUP BY 1
  ),
  m AS (
    SELECT day, x, y,
           count(*) OVER w AS n,
           sum(x) OVER w AS sx, sum(y) OVER w AS sy,
           sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
           sum(x * y) OVER w AS sxy
    FROM daily
    WINDOW w AS (ORDER BY day
                 RANGE BETWEEN 13 PRECEDING AND CURRENT ROW)
  )
  SELECT day, x, y, n::BIGINT AS n_window,
         (CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    > 0.0
               THEN floor((n::DOUBLE * sxy::DOUBLE
                           - sx::DOUBLE * sy::DOUBLE)
                          / sqrt((n::DOUBLE * sxx::DOUBLE
                                  - sx::DOUBLE * sx::DOUBLE)
                                 * (n::DOUBLE * syy::DOUBLE
                                    - sy::DOUBLE * sy::DOUBLE))
                          * 1e6)
               ELSE 0 END)::BIGINT AS corr_e6
  FROM m ORDER BY day
"""


def q_nearest_order_per_event(spark, sf_dir):
    """Two-sided nearest-in-time join: each purchase event pairs with
    the order (same key modulo the customer universe) minimizing
    |Δt| — preceding + following window passes, closer side wins,
    tie → earlier."""
    ev = (_t(spark, sf_dir, "events")
          .where(F.col("event_type") == "purchase")
          .select(F.pmod(F.col("user_id"), F.lit(1500)).alias("ck"),
                  F.floor(F.unix_timestamp("ts")).cast("long")
                   .alias("ets"), F.col("event_id")))
    od = (_t(spark, sf_dir, "orders")
          .select(F.col("o_custkey").alias("ck"),
                  F.datediff(F.col("o_orderdate"),
                             F.lit("1970-01-01").cast("date"))
                   .cast("long").alias("ots"),
                  F.col("o_orderkey")))
    od = od.select("ck", (F.col("ots") * 86400).alias("ots"),
                   "o_orderkey")
    return joins.nearest_in_time(ev, od, "ck", "ets", "ots",
                                 "event_id", "o_orderkey")


ORACLE_NEAREST = """
  WITH l AS (
    SELECT (user_id % 1500)::BIGINT AS k,
           floor(epoch(ts))::BIGINT AS t, event_id AS lid,
           1 AS is_l, NULL::BIGINT AS rid
    FROM events WHERE event_type = 'purchase'
  ),
  r AS (
    SELECT o_custkey::BIGINT AS k,
           (date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT
            * 86400)::BIGINT AS t,
           NULL::BIGINT AS lid, 0 AS is_l, o_orderkey AS rid
    FROM orders
  ),
  uni AS (SELECT * FROM l UNION ALL SELECT * FROM r),
  marked AS (
    SELECT k, t, lid, is_l,
           last(CASE WHEN is_l = 0
                     THEN struct_pack(rt := t, rrid := rid) END
                IGNORE NULLS)
             OVER (PARTITION BY k ORDER BY t, is_l, rid NULLS FIRST
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS pv,
           first(CASE WHEN is_l = 0
                      THEN struct_pack(rt := t, rrid := rid) END
                 IGNORE NULLS)
             OVER (PARTITION BY k ORDER BY t, is_l, rid NULLS FIRST
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
             AS nx
    FROM uni
  ),
  cand AS (SELECT * FROM marked WHERE is_l = 1)
  SELECT lid AS event_id, k AS ck,
         coalesce(CASE WHEN pv IS NOT NULL
                            AND (nx IS NULL
                                 OR t - pv.rt <= nx.rt - t)
                       THEN pv.rrid
                       WHEN nx IS NOT NULL THEN nx.rrid END,
                  -1)::BIGINT AS nearest_o_orderkey,
         coalesce(CASE WHEN pv IS NOT NULL
                            AND (nx IS NULL
                                 OR t - pv.rt <= nx.rt - t)
                       THEN t - pv.rt
                       WHEN nx IS NOT NULL THEN nx.rt - t END,
                  -1)::BIGINT AS abs_delta_s
  FROM cand
"""


def q_readability_by_lang(spark, sf_dir):
    """Mean Flesch reading ease per gold language — composes the
    per-doc readability operator, one pinned division per lang."""
    from ..operators.text import readability
    r = readability(_t(spark, sf_dir, "documents"))
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return (r.join(docs, "doc_id")
            .groupBy("lang")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("flesch_e3").cast("long").alias("sum_flesch_e3"))
            .select("lang", "n_docs", "sum_flesch_e3",
                    F.floor(F.col("sum_flesch_e3").cast("double")
                            / F.col("n_docs").cast("double"))
                     .cast("long").alias("mean_flesch_e3"))
            .orderBy("lang"))


def _readability_by_lang_oracle() -> str:
    return f"""
  WITH r AS ({ORACLE_FLESCH})
  SELECT d.lang, count(*)::BIGINT AS n_docs,
         sum(r.flesch_e3)::BIGINT AS sum_flesch_e3,
         floor(sum(r.flesch_e3)::DOUBLE
               / count(*)::DOUBLE)::BIGINT AS mean_flesch_e3
  FROM r JOIN documents d USING (doc_id)
  GROUP BY d.lang ORDER BY d.lang
"""


QUERIES_ROUND6.update({
    "rolling_corr_view_purchase": QuerySpec(
        q_rolling_corr_view_purchase, ORACLE_ROLLING_CORR,
        doc="trailing 14-day Pearson via six RANGE-frame moment "
            "sums"),
    "nearest_order_per_event": QuerySpec(
        q_nearest_order_per_event, ORACLE_NEAREST,
        doc="two-sided nearest-in-time join (closer of as-of "
            "before/after)"),
    "readability_by_lang": QuerySpec(
        q_readability_by_lang, _readability_by_lang_oracle(),
        doc="mean Flesch per gold language (composed rollup)"),
})


# ===========================================================================
# Batch 17: sliding HLL maintenance / rank-with-ties top-k
# ===========================================================================


def q_sliding_hll_wau(spark, sf_dir):
    """Trailing-7-day WAU sketch maintenance: merged daily HLLs ==
    direct window HLL (checksum proof per day) next to the exact
    WAU."""
    return sketches.sliding_hll_wau(_t(spark, sf_dir, "events"))


def _sliding_hll_oracle() -> str:
    from ..operators.sketches import HLL_M, _rho_sql
    h = stable_hash64_sql("u::VARCHAR")
    rho = _rho_sql("(h >> 8)")
    return f"""
  WITH ud AS (
    SELECT DISTINCT user_id AS u,
           floor(epoch(ts) / 86400)::BIGINT AS day
    FROM events
  ),
  hashed AS (SELECT u, day, {h} AS h FROM ud),
  by_day AS (
    SELECT day, h % {HLL_M} AS idx, max({rho}) AS reg
    FROM hashed GROUP BY day, idx
  ),
  fan_reg AS (
    SELECT idx, reg, unnest(range(day, day + 7))::BIGINT AS wday
    FROM by_day
  ),
  merged AS (
    SELECT wday, idx, max(reg) AS reg
    FROM fan_reg GROUP BY wday, idx
  ),
  merged_chk AS (
    SELECT wday, sum(reg * (idx + 1))::BIGINT AS merged_chk
    FROM merged GROUP BY wday
  ),
  fan_u AS (
    SELECT DISTINCT u, unnest(range(day, day + 7))::BIGINT AS wday
    FROM ud
  ),
  fh AS (SELECT u, wday, {h} AS h FROM fan_u),
  direct AS (
    SELECT wday, h % {HLL_M} AS idx, max({rho}) AS reg
    FROM fh GROUP BY wday, idx
  ),
  direct_chk AS (
    SELECT wday, sum(reg * (idx + 1))::BIGINT AS direct_chk
    FROM direct GROUP BY wday
  ),
  wau AS (SELECT wday, count(*)::BIGINT AS exact_wau
          FROM fan_u GROUP BY wday),
  days AS (SELECT DISTINCT day FROM ud)
  SELECT day, exact_wau, merged_chk, direct_chk,
         (merged_chk = direct_chk)::BIGINT AS merge_matches_direct
  FROM days
  JOIN wau ON days.day = wau.wday
  JOIN merged_chk ON merged_chk.wday = days.day
  JOIN direct_chk ON direct_chk.wday = days.day
  ORDER BY day
"""


def q_top_orders_with_ties(spark, sf_dir):
    """rank()-based top-10 WITH TIES semantics through the SQL text
    interface — every order tying the 10th value survives (the
    row_number contrast every serving API must choose between)."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("r6_ties_o")
    return spark.sql("""
      SELECT o_orderkey, cents, rnk FROM (
        SELECT o_orderkey,
               CAST(floor(o_totalprice * 100) AS BIGINT) AS cents,
               rank() OVER (ORDER BY floor(o_totalprice * 100) DESC)
                 AS rnk
        FROM r6_ties_o
      ) WHERE rnk <= 10
    """)


ORACLE_TOP_TIES = """
  SELECT o_orderkey, cents, rnk FROM (
    SELECT o_orderkey,
           floor(o_totalprice * 100)::BIGINT AS cents,
           rank() OVER (ORDER BY floor(o_totalprice * 100) DESC)
             AS rnk
    FROM orders
  ) WHERE rnk <= 10
"""


QUERIES_ROUND6.update({
    "sliding_hll_wau": QuerySpec(
        q_sliding_hll_wau, _sliding_hll_oracle(),
        doc="sliding-window HLL merge==direct proof + exact WAU"),
    "top_orders_with_ties": QuerySpec(
        q_top_orders_with_ties, ORACLE_TOP_TIES,
        doc="rank()-with-ties top-k SQL semantics"),
})


# ===========================================================================
# Batch 18: session-level PMI / 2-D skyline
# ===========================================================================


def q_session_type_pmi(spark, sf_dir):
    """PMI between event types co-occurring within gap-sessions —
    exact counts, one pinned ln per surviving pair."""
    return eventflow.session_type_pmi(_t(spark, sf_dir, "events"))


ORACLE_SESSION_PMI = """
  WITH base AS (
    SELECT user_id AS u, floor(epoch(ts))::BIGINT AS ts_s,
           event_id AS eid, event_type AS et
    FROM events
  ),
  flagged AS (
    SELECT u, ts_s, eid, et,
           (CASE WHEN lag(ts_s) OVER w IS NULL
                      OR ts_s - lag(ts_s) OVER w > 1800
                 THEN 1 ELSE 0 END) AS ns
    FROM base WINDOW w AS (PARTITION BY u ORDER BY ts_s, eid)
  ),
  sess AS (
    SELECT u, et,
           sum(ns) OVER (PARTITION BY u ORDER BY ts_s, eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
    FROM flagged
  ),
  st AS (SELECT DISTINCT u, sid, et FROM sess),
  ns AS (SELECT count(*)::BIGINT AS n
         FROM (SELECT DISTINCT u, sid FROM st)),
  singles AS (SELECT et, count(*)::BIGINT AS c FROM st GROUP BY et),
  pairs AS (
    SELECT a.et AS ta, b.et AS tb, count(*)::BIGINT AS c_ab
    FROM st a JOIN st b ON a.u = b.u AND a.sid = b.sid
                       AND a.et < b.et
    GROUP BY 1, 2 HAVING count(*) >= 3
  )
  SELECT ta, tb, c_ab AS n_cooccur, sa.c AS n_a, sb.c AS n_b,
         floor(ln(n::DOUBLE * c_ab::DOUBLE
                  / (sa.c::DOUBLE * sb.c::DOUBLE)) * 1e6)::BIGINT
           AS pmi_e6
  FROM pairs
  JOIN singles sa ON sa.et = ta
  JOIN singles sb ON sb.et = tb, ns
  ORDER BY ta, tb
"""


def q_skyline_orders(spark, sf_dir):
    """2-D skyline (Pareto front): orders not dominated on
    (earlier-or-equal date, strictly higher value) — one prefix-max
    window over the day axis, the classic sort-based skyline.
    A row survives iff its cents strictly exceed every
    EARLIER-dated order's cents (ties on day share the frontier when
    both beat all earlier days)."""
    from pyspark.sql import Window
    od = _t(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"),
                     F.lit("1970-01-01").cast("date")).cast("long")
    d = od.select("o_orderkey", day.alias("day"),
                  F.floor(F.col("o_totalprice") * 100).cast("long")
                   .alias("cents"))
    w = (Window.orderBy("day")
         .rangeBetween(Window.unboundedPreceding, -1))
    m = d.select("o_orderkey", "day", "cents",
                 F.max("cents").over(w).alias("prev_max"))
    return (m.where(F.col("prev_max").isNull()
                    | (F.col("cents") > F.col("prev_max")))
            .select("o_orderkey", "day", "cents")
            .orderBy("day", "o_orderkey"))


ORACLE_SKYLINE = """
  WITH d AS (
    SELECT o_orderkey,
           date_diff('day', DATE '1970-01-01', o_orderdate)::BIGINT
             AS day,
           floor(o_totalprice * 100)::BIGINT AS cents
    FROM orders
  ),
  m AS (
    SELECT o_orderkey, day, cents,
           max(cents) OVER (ORDER BY day
             RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_max
    FROM d
  )
  SELECT o_orderkey, day, cents
  FROM m WHERE prev_max IS NULL OR cents > prev_max
  ORDER BY day, o_orderkey
"""


QUERIES_ROUND6.update({
    "session_type_pmi": QuerySpec(
        q_session_type_pmi, ORACLE_SESSION_PMI,
        doc="session-level event-type PMI (exact counts, pinned ln)"),
    "skyline_orders": QuerySpec(
        q_skyline_orders, ORACLE_SKYLINE,
        doc="2-D Pareto skyline via one prefix-max window"),
})


# ===========================================================================
# Batch 19: one-way ANOVA / ECDF fingerprint
# ===========================================================================


def q_anova_value_by_type(spark, sf_dir):
    """One-way ANOVA F of event value cents across event types —
    exact decimal moments, pinned per-group SS terms, one final
    pinned F floored e3."""
    return aggregations.anova_oneway(
        _t(spark, sf_dir, "events"), "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)))


ORACLE_ANOVA = """
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  per AS (
    SELECT g, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS sx,
           sum(v::HUGEINT * v::HUGEINT) AS sxx
    FROM d GROUP BY g
  ),
  terms AS (
    SELECT g, n, sx,
           floor(sxx::DOUBLE
                 - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)::BIGINT
             AS ssw_t
    FROM per
  ),
  tot AS (
    SELECT count(*)::BIGINT AS k, sum(n)::HUGEINT AS nn,
           sum(sx)::HUGEINT AS ssx, sum(ssw_t)::BIGINT AS ssw
    FROM terms
  ),
  agg AS (
    SELECT k, nn, ssw,
           sum(floor(n::DOUBLE
                     * (sx::DOUBLE / n::DOUBLE
                        - ssx::DOUBLE / nn::DOUBLE)
                     * (sx::DOUBLE / n::DOUBLE
                        - ssx::DOUBLE / nn::DOUBLE)))::BIGINT AS ssb
    FROM terms, tot GROUP BY k, nn, ssw
  )
  SELECT k AS k_groups, nn::BIGINT AS n_rows,
         ssb AS ssb_c2, ssw AS ssw_c2,
         (CASE WHEN k > 1 AND ssw > 0
               THEN floor((ssb::DOUBLE / (k::DOUBLE - 1.0))
                          / (ssw::DOUBLE / (nn::DOUBLE - k::DOUBLE))
                          * 1e3)
               ELSE 0 END)::BIGINT AS f_e3
  FROM agg
"""


def q_ecdf_value_by_type(spark, sf_dir):
    """ECDF of event value cents at the fixed 8-point grid per type —
    the exact distribution fingerprint, all-integer shares."""
    return aggregations.ecdf_at_points(
        _t(spark, sf_dir, "events"), "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)))


def _ecdf_oracle() -> str:
    from ..operators.aggregations import ECDF_POINTS_C
    selects = "\n  UNION ALL ".join(
        f"SELECT g, n, {p}::BIGINT AS point_c, le_{i} AS n_le,"
        f" ((le_{i} * 1000000) // n)::BIGINT AS share_e6 FROM agg"
        for i, p in enumerate(ECDF_POINTS_C))
    les = ",\n           ".join(
        f"sum((v <= {p})::BIGINT)::BIGINT AS le_{i}"
        for i, p in enumerate(ECDF_POINTS_C))
    return f"""
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  agg AS (
    SELECT g, count(*)::BIGINT AS n,
           {les}
    FROM d GROUP BY g
  )
  SELECT g AS event_type, n, point_c, n_le, share_e6 FROM (
  {selects}
  ) ORDER BY event_type, point_c
"""


QUERIES_ROUND6.update({
    "anova_value_by_type": QuerySpec(
        q_anova_value_by_type, ORACLE_ANOVA,
        doc="one-way ANOVA F across event types (pinned SS terms)"),
    "ecdf_value_by_type": QuerySpec(
        q_ecdf_value_by_type, _ecdf_oracle(),
        doc="exact ECDF fingerprint at a fixed cents grid"),
})


# ===========================================================================
# Batch 20: Welch's t / coefficient of variation
# ===========================================================================


def q_welch_t_values(spark, sf_dir):
    """Welch's unequal-variance t between A/B arms' event values +
    Welch-Satterthwaite dof — exact moments, two pinned combines."""
    return eventflow.welch_t_value(_t(spark, sf_dir, "events"))


ORACLE_WELCH = """
  WITH d AS (
    SELECT (user_id % 2)::BIGINT AS arm,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  per AS (
    SELECT arm, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s,
           sum(v::HUGEINT * v::HUGEINT) AS q
    FROM d GROUP BY arm
  ),
  j AS (
    SELECT a.n AS n1, a.s AS s1, a.q AS q1,
           b.n AS n2, b.s AS s2, b.q AS q2
    FROM (SELECT * FROM per WHERE arm = 0) a,
         (SELECT * FROM per WHERE arm = 1) b
  )
  SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
         (CASE WHEN n1 > 1 AND n2 > 1 THEN
            floor((s1::DOUBLE / n1::DOUBLE - s2::DOUBLE / n2::DOUBLE)
                  / sqrt(((n1::DOUBLE * q1::DOUBLE
                           - s1::DOUBLE * s1::DOUBLE)
                          / (n1::DOUBLE * (n1::DOUBLE - 1.0)))
                         / n1::DOUBLE
                         + ((n2::DOUBLE * q2::DOUBLE
                             - s2::DOUBLE * s2::DOUBLE)
                            / (n2::DOUBLE * (n2::DOUBLE - 1.0)))
                           / n2::DOUBLE) * 1e6)
          ELSE 0 END)::BIGINT AS t_e6,
         (CASE WHEN n1 > 1 AND n2 > 1 THEN
            floor(
              (((n1::DOUBLE * q1::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                / (n1::DOUBLE * (n1::DOUBLE - 1.0)) / n1::DOUBLE)
               + ((n2::DOUBLE * q2::DOUBLE - s2::DOUBLE * s2::DOUBLE)
                  / (n2::DOUBLE * (n2::DOUBLE - 1.0)) / n2::DOUBLE))
              * (((n1::DOUBLE * q1::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                  / (n1::DOUBLE * (n1::DOUBLE - 1.0)) / n1::DOUBLE)
                 + ((n2::DOUBLE * q2::DOUBLE
                     - s2::DOUBLE * s2::DOUBLE)
                    / (n2::DOUBLE * (n2::DOUBLE - 1.0)) / n2::DOUBLE))
              / (((n1::DOUBLE * q1::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                  / (n1::DOUBLE * (n1::DOUBLE - 1.0)) / n1::DOUBLE)
                 * ((n1::DOUBLE * q1::DOUBLE - s1::DOUBLE * s1::DOUBLE)
                    / (n1::DOUBLE * (n1::DOUBLE - 1.0)) / n1::DOUBLE)
                 / (n1::DOUBLE - 1.0)
                 + ((n2::DOUBLE * q2::DOUBLE - s2::DOUBLE * s2::DOUBLE)
                    / (n2::DOUBLE * (n2::DOUBLE - 1.0)) / n2::DOUBLE)
                   * ((n2::DOUBLE * q2::DOUBLE
                       - s2::DOUBLE * s2::DOUBLE)
                      / (n2::DOUBLE * (n2::DOUBLE - 1.0)) / n2::DOUBLE)
                   / (n2::DOUBLE - 1.0)) * 1e3)
          ELSE 0 END)::BIGINT AS dof_e3
  FROM j
"""


def q_cv_by_type(spark, sf_dir):
    """Coefficient of variation of event value cents per type —
    scale-free dispersion, exact moments, one pinned combine."""
    return aggregations.cv_by_group(
        _t(spark, sf_dir, "events"), "event_type",
        F.floor(F.col("value") * 100 + F.lit(0.5)))


ORACLE_CV = """
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  agg AS (
    SELECT g, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s,
           sum(v::HUGEINT * v::HUGEINT) AS q
    FROM d GROUP BY g
  )
  SELECT g AS event_type, n::BIGINT AS n_rows,
         (CASE WHEN n > 1 AND s > 0 THEN
            floor(sqrt((n::DOUBLE * q::DOUBLE - s::DOUBLE * s::DOUBLE)
                       / (n::DOUBLE * (n::DOUBLE - 1.0)))
                  / (s::DOUBLE / n::DOUBLE) * 1e6)
          ELSE 0 END)::BIGINT AS cv_e6
  FROM agg ORDER BY g
"""


QUERIES_ROUND6.update({
    "welch_t_values": QuerySpec(
        q_welch_t_values, ORACLE_WELCH,
        doc="Welch unequal-variance t + Satterthwaite dof between "
            "arms"),
    "cv_by_type": QuerySpec(
        q_cv_by_type, ORACLE_CV,
        doc="coefficient of variation per type (exact moments)"),
})


# ===========================================================================
# Batch 21: Cramér's V / k-means cluster label impurity
# ===========================================================================


def q_cramers_v_type_arm(spark, sf_dir):
    """Cramér's V between event type and A/B arm — normalized
    chi-square association on exact contingency counts, pinned cell
    terms."""
    ev = _t(spark, sf_dir, "events")
    return aggregations.cramers_v(
        ev, F.col("event_type"),
        F.pmod(F.col("user_id"), F.lit(2)))


ORACLE_CRAMERS = """
  WITH d AS (
    SELECT event_type::VARCHAR AS r,
           (user_id % 2)::VARCHAR AS c
    FROM events
  ),
  cells AS (SELECT r, c, count(*)::BIGINT AS o FROM d GROUP BY r, c),
  rm AS (SELECT r, sum(o)::BIGINT AS nr FROM cells GROUP BY r),
  cm AS (SELECT c, sum(o)::BIGINT AS nc FROM cells GROUP BY c),
  tot AS (SELECT sum(o)::BIGINT AS n,
                 count(DISTINCT r)::BIGINT AS k_r,
                 count(DISTINCT c)::BIGINT AS k_c
          FROM cells),
  grid AS (SELECT r, c, nr, nc FROM rm, cm),
  filled AS (
    SELECT grid.r, grid.c, nr, nc,
           coalesce(cells.o, 0)::BIGINT AS o
    FROM grid LEFT JOIN cells ON grid.r = cells.r
                             AND grid.c = cells.c
  ),
  terms AS (
    SELECT n, k_r, k_c,
           floor((o::DOUBLE - nr::DOUBLE * nc::DOUBLE / n::DOUBLE)
                 * (o::DOUBLE - nr::DOUBLE * nc::DOUBLE / n::DOUBLE)
                 / (nr::DOUBLE * nc::DOUBLE / n::DOUBLE)
                 * 1e6)::BIGINT AS t
    FROM filled, tot
  ),
  agg AS (
    SELECT n, k_r, k_c, sum(t)::BIGINT AS chi2_e6
    FROM terms GROUP BY n, k_r, k_c
  )
  SELECT n AS n_rows, k_r, k_c, chi2_e6,
         (CASE WHEN k_r > 1 AND k_c > 1 AND chi2_e6 >= 0
               THEN floor(sqrt(chi2_e6::DOUBLE / 1e6
                               / (n::DOUBLE
                                  * least(k_r - 1, k_c - 1)::DOUBLE))
                          * 1e6)
               ELSE 0 END)::BIGINT AS cramers_v_e6
  FROM agg
"""


def q_cluster_label_impurity(spark, sf_dir):
    """Gini label impurity per k-means cluster — the clustering-
    quality audit against the gold labels: imp = 1e6 − (Σ c_l²·1e6)
    div c², all-integer. Composes the verified exact-integer Lloyd
    assignment."""
    from ..operators.similarity import kmeans_assign
    emb = _t(spark, sf_dir, "embeddings")
    a = kmeans_assign(emb, k=8, iters=2).select("vec_id", "cluster_id")
    j = a.join(emb.select("vec_id", "label"), "vec_id")
    per = j.groupBy("cluster_id", "label").agg(
        F.count("*").cast("long").alias("c_l"))
    clus = per.groupBy("cluster_id").agg(
        F.sum("c_l").cast("long").alias("c"),
        F.sum(F.col("c_l") * F.col("c_l")).cast("long").alias("c2"))
    return (clus.select(
        "cluster_id", F.col("c").alias("n_vecs"),
        (F.lit(1_000_000)
         - F.expr("(c2 * 1000000) div (c * c)")).cast("long")
        .alias("gini_impurity_e6"))
        .orderBy("cluster_id"))


def _impurity_oracle() -> str:
    from .analytics_more import _kmeans_oracle
    return f"""
  WITH km AS ({_kmeans_oracle()}),
  j AS (
    SELECT km.cluster_id, e.label
    FROM km JOIN embeddings e ON km.vec_id = e.vec_id
  ),
  per AS (SELECT cluster_id, label, count(*)::BIGINT AS c_l
          FROM j GROUP BY 1, 2),
  clus AS (
    SELECT cluster_id, sum(c_l)::BIGINT AS c,
           sum(c_l * c_l)::BIGINT AS c2
    FROM per GROUP BY cluster_id
  )
  SELECT cluster_id, c AS n_vecs,
         (1000000 - (c2 * 1000000) // (c * c))::BIGINT
           AS gini_impurity_e6
  FROM clus ORDER BY cluster_id
"""


QUERIES_ROUND6.update({
    "cramers_v_type_arm": QuerySpec(
        q_cramers_v_type_arm, ORACLE_CRAMERS,
        doc="Cramér's V association (pinned chi-square cells)"),
    "cluster_label_impurity": QuerySpec(
        q_cluster_label_impurity, _impurity_oracle(),
        doc="Gini label impurity per k-means cluster (all-integer)"),
})


# ===========================================================================
# Batch 22: Brown-Forsythe / runs test
# ===========================================================================


def q_brown_forsythe_values(spark, sf_dir):
    """Brown-Forsythe variance-homogeneity F across event types —
    |x − group low-median| through the exact-moment ANOVA."""
    return eventflow.brown_forsythe(_t(spark, sf_dir, "events"))


ORACLE_BF = """
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  ranked AS (
    SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn,
           count(*) OVER (PARTITION BY g) AS nn
    FROM d
  ),
  med AS (SELECT g, v AS med FROM ranked WHERE rn = (nn + 1) // 2),
  z AS (
    SELECT d.g, abs(v - med)::BIGINT AS v
    FROM d JOIN med USING (g)
  ),
  per AS (
    SELECT g, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS sx,
           sum(v::HUGEINT * v::HUGEINT) AS sxx
    FROM z GROUP BY g
  ),
  terms AS (
    SELECT g, n, sx,
           floor(sxx::DOUBLE
                 - sx::DOUBLE * sx::DOUBLE / n::DOUBLE)::BIGINT
             AS ssw_t
    FROM per
  ),
  tot AS (
    SELECT count(*)::BIGINT AS k, sum(n)::HUGEINT AS nn,
           sum(sx)::HUGEINT AS ssx, sum(ssw_t)::BIGINT AS ssw
    FROM terms
  ),
  agg AS (
    SELECT k, nn, ssw,
           sum(floor(n::DOUBLE
                     * (sx::DOUBLE / n::DOUBLE
                        - ssx::DOUBLE / nn::DOUBLE)
                     * (sx::DOUBLE / n::DOUBLE
                        - ssx::DOUBLE / nn::DOUBLE)))::BIGINT AS ssb
    FROM terms, tot GROUP BY k, nn, ssw
  )
  SELECT k AS k_groups, nn::BIGINT AS n_rows,
         ssb AS ssb_c2, ssw AS ssw_c2,
         (CASE WHEN k > 1 AND ssw > 0
               THEN floor((ssb::DOUBLE / (k::DOUBLE - 1.0))
                          / (ssw::DOUBLE / (nn::DOUBLE - k::DOUBLE))
                          * 1e3)
               ELSE 0 END)::BIGINT AS bf_f_e3
  FROM agg
"""


def q_runs_test_daily(spark, sf_dir):
    """Wald-Wolfowitz runs test on daily totals per type — exact
    low-median signs, lag-counted runs, pinned z."""
    return eventflow.runs_test_daily(_t(spark, sf_dir, "events"))


ORACLE_RUNS = """
  WITH daily AS (
    SELECT event_type AS g,
           floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS t
    FROM events GROUP BY 1, 2
  ),
  ranked AS (
    SELECT g, t, row_number() OVER (PARTITION BY g ORDER BY t) AS rn,
           count(*) OVER (PARTITION BY g) AS nn
    FROM daily
  ),
  med AS (SELECT g, t AS med FROM ranked WHERE rn = (nn + 1) // 2),
  signed AS (
    SELECT daily.g, day, (t > med)::BIGINT AS s
    FROM daily JOIN med USING (g)
  ),
  runs AS (
    SELECT g, s,
           (CASE WHEN lag(s) OVER w IS NULL
                      OR lag(s) OVER w <> s THEN 1 ELSE 0 END) AS nr
    FROM signed WINDOW w AS (PARTITION BY g ORDER BY day)
  ),
  agg AS (
    SELECT g, count(*)::BIGINT AS n, sum(s)::BIGINT AS n1,
           sum(nr)::BIGINT AS r
    FROM runs GROUP BY g
  )
  SELECT g AS event_type, n AS n_days, n1 AS n_above, r AS n_runs,
         (CASE WHEN n1 > 0 AND n1 < n AND n > 1
                    AND (2.0 * n1::DOUBLE * (n::DOUBLE - n1::DOUBLE)
                         * (2.0 * n1::DOUBLE
                            * (n::DOUBLE - n1::DOUBLE) - n::DOUBLE)
                         / (n::DOUBLE * n::DOUBLE
                            * (n::DOUBLE - 1.0))) > 0.0
               THEN floor((r::DOUBLE
                           - (1.0 + 2.0 * n1::DOUBLE
                              * (n::DOUBLE - n1::DOUBLE) / n::DOUBLE))
                          / sqrt(2.0 * n1::DOUBLE
                                 * (n::DOUBLE - n1::DOUBLE)
                                 * (2.0 * n1::DOUBLE
                                    * (n::DOUBLE - n1::DOUBLE)
                                    - n::DOUBLE)
                                 / (n::DOUBLE * n::DOUBLE
                                    * (n::DOUBLE - 1.0))) * 1e6)
               ELSE 0 END)::BIGINT AS z_e6
  FROM agg ORDER BY g
"""


QUERIES_ROUND6.update({
    "brown_forsythe_values": QuerySpec(
        q_brown_forsythe_values, ORACLE_BF,
        doc="Brown-Forsythe variance-homogeneity F (median-centered "
            "Levene)"),
    "runs_test_daily": QuerySpec(
        q_runs_test_daily, ORACLE_RUNS,
        doc="Wald-Wolfowitz runs test on daily totals per type"),
})


# ===========================================================================
# Batch 23: Kruskal-Wallis / Cohen's d
# ===========================================================================


def q_kruskal_wallis_values(spark, sf_dir):
    """Tie-corrected Kruskal-Wallis H across event types on the
    doubled-midrank grid."""
    return eventflow.kruskal_wallis(_t(spark, sf_dir, "events"))


ORACLE_KW = """
  WITH d AS (
    SELECT event_type AS g,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  per_v AS (SELECT v, count(*)::BIGINT AS c_v FROM d GROUP BY v),
  ranks AS (
    SELECT v, c_v,
           (2 * (sum(c_v) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - c_v) + c_v + 1) AS r2
    FROM per_v
  ),
  j AS (SELECT d.g, ranks.r2 FROM d JOIN ranks USING (v)),
  per_g AS (
    SELECT g, count(*)::HUGEINT AS n_g, sum(r2)::HUGEINT AS s_r2
    FROM j GROUP BY g
  ),
  ties AS (
    SELECT sum(c_v::HUGEINT * c_v::HUGEINT * c_v::HUGEINT
               - c_v::HUGEINT) AS tie_sum
    FROM per_v
  ),
  tot AS (SELECT count(*)::BIGINT AS k, sum(n_g)::HUGEINT AS n
          FROM per_g),
  hsum AS (
    SELECT k, n,
           sum(floor(n_g::DOUBLE
                     * (s_r2::DOUBLE / (2.0 * n_g::DOUBLE)
                        - (n::DOUBLE + 1.0) / 2.0)
                     * (s_r2::DOUBLE / (2.0 * n_g::DOUBLE)
                        - (n::DOUBLE + 1.0) / 2.0)
                     * 1e6))::BIGINT AS hs
    FROM per_g, tot GROUP BY k, n
  )
  SELECT k AS k_groups, n::BIGINT AS n_rows,
         (CASE WHEN k > 1
                    AND (1.0 - tie_sum::DOUBLE
                         / (n::DOUBLE * n::DOUBLE * n::DOUBLE
                            - n::DOUBLE)) > 0.0
               THEN floor((12.0 * (hs::DOUBLE / 1e6)
                           / (n::DOUBLE * (n::DOUBLE + 1.0)))
                          / (1.0 - tie_sum::DOUBLE
                             / (n::DOUBLE * n::DOUBLE * n::DOUBLE
                                - n::DOUBLE)) * 1e3)
               ELSE 0 END)::BIGINT AS h_e3
  FROM hsum, ties
"""


def q_cohens_d_arms(spark, sf_dir):
    """Cohen's d effect size between A/B arms — exact moments, pinned
    pooled-sd combine."""
    return eventflow.cohens_d_arms(_t(spark, sf_dir, "events"))


ORACLE_COHENS_D = """
  WITH d AS (
    SELECT (user_id % 2)::BIGINT AS arm,
           floor(value * 100 + 0.5)::BIGINT AS v
    FROM events
  ),
  per AS (
    SELECT arm, count(*)::HUGEINT AS n, sum(v)::HUGEINT AS s,
           sum(v::HUGEINT * v::HUGEINT) AS q
    FROM d GROUP BY arm
  ),
  j AS (
    SELECT a.n AS n1, a.s AS s1, a.q AS q1,
           b.n AS n2, b.s AS s2, b.q AS q2
    FROM (SELECT * FROM per WHERE arm = 0) a,
         (SELECT * FROM per WHERE arm = 1) b
  )
  SELECT n1::BIGINT AS n_a, n2::BIGINT AS n_b,
         (CASE WHEN n1 > 1 AND n2 > 1 THEN
            floor((s1::DOUBLE / n1::DOUBLE - s2::DOUBLE / n2::DOUBLE)
                  / sqrt(((q1::DOUBLE
                           - s1::DOUBLE * s1::DOUBLE / n1::DOUBLE)
                          + (q2::DOUBLE
                             - s2::DOUBLE * s2::DOUBLE / n2::DOUBLE))
                         / (n1::DOUBLE + n2::DOUBLE - 2.0)) * 1e6)
          ELSE 0 END)::BIGINT AS cohens_d_e6
  FROM j
"""


QUERIES_ROUND6.update({
    "kruskal_wallis_values": QuerySpec(
        q_kruskal_wallis_values, ORACLE_KW,
        doc="tie-corrected Kruskal-Wallis H on the doubled-midrank "
            "grid"),
    "cohens_d_arms": QuerySpec(
        q_cohens_d_arms, ORACLE_COHENS_D,
        doc="Cohen's d effect size between arms (pooled sd)"),
})
