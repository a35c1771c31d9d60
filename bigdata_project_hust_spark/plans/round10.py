"""Round-10 extension queries: recommender primitives, per-source
boilerplate curation, SAX time-series symbolization, and iterative BPE
merge learning.

* ``als_rank1_item_factors`` — rank-1 alternating least squares on the
  customer×part quantity matrix (2 sweeps, e6 factor grid), top-20
  item factors.
* ``bias_baseline_card`` — damped-mean bias baseline (μ + b_item +
  b_user) with the one-row MAE model card vs the constant-μ predictor.
* ``boilerplate_strip_report`` — per-source frequency-based
  boilerplate segment census (the RefinedWeb-style strip report).
* ``sax_daily_symbols`` — SAX 4-letter symbolization of each event
  type's daily series (z at e6, quartile breakpoints).
* ``bpe_merge_rounds`` — BPE merges rounds 1–3 with each winner
  APPLIED before the next count (vocabulary-factored).

Cross-engine exactness rules as ``queries.py``: BIGINT sums, one
pinned double tree per division, floor() casts everywhere a double
meets a grid.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import curation, eventflow, recsys, text
from .spec import QuerySpec, _t

QUERIES_ROUND10: dict[str, QuerySpec] = {}

_ALS_LAM, _ALS_SWEEPS, _ALS_TOPN = 10, 2, 20
_BIAS_DAMP = 25
_BOILER_MIN_DOCS = 2
_BPE_ROUNDS = 3

_RATINGS_SQL = """
  ratings AS (
    SELECT o.o_custkey AS user_id, l.l_partkey AS item_id,
           sum(floor(l.l_quantity))::BIGINT AS r
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2
  )"""


def q_als_rank1(spark, sf_dir):
    """Top-20 part factors of a 2-sweep rank-1 ALS over the implicit
    customer×part quantity matrix. See recsys.als_rank1 for the plan
    shape (edge list shuffles by the side being solved; no broadcast
    of factor frames)."""
    r = recsys.ratings_from_orders(_t(spark, sf_dir, "orders"),
                                   _t(spark, sf_dir, "lineitem"))
    f = recsys.als_rank1(r, lam=_ALS_LAM, sweeps=_ALS_SWEEPS)
    return (f.orderBy(F.col("v_e6").desc(), F.col("item_id").asc())
             .limit(_ALS_TOPN)
             .select(F.col("item_id").cast("long").alias("item_id"),
                     "n_raters", "v_e6"))


def _als_solve_sql(src: str, key: str, fac: str, out: str) -> str:
    return f"""
    SELECT {key} AS {out},
           floor(sum(r * {fac})::DOUBLE * 1e12
                 / (sum({fac} * {fac}) + {_ALS_LAM} * 1000000000000)::DOUBLE
                 )::BIGINT AS f,
           count(*)::BIGINT AS n
    FROM {src} GROUP BY {key}"""


def _oracle_als() -> str:
    return f"""
  WITH {_RATINGS_SQL},
  v0 AS (SELECT DISTINCT item_id, 1000000::BIGINT AS v FROM ratings),
  e1 AS (SELECT r.user_id, r.r, v0.v AS fac
         FROM ratings r JOIN v0 USING (item_id)),
  u1 AS ({_als_solve_sql('e1', 'user_id', 'fac', 'user_id')}),
  f1 AS (SELECT r.item_id, r.r, u1.f AS fac
         FROM ratings r JOIN u1 USING (user_id)),
  v1 AS ({_als_solve_sql('f1', 'item_id', 'fac', 'item_id')}),
  e2 AS (SELECT r.user_id, r.r, v1.f AS fac
         FROM ratings r JOIN v1 USING (item_id)),
  u2 AS ({_als_solve_sql('e2', 'user_id', 'fac', 'user_id')}),
  f2 AS (SELECT r.item_id, r.r, u2.f AS fac
         FROM ratings r JOIN u2 USING (user_id)),
  v2 AS ({_als_solve_sql('f2', 'item_id', 'fac', 'item_id')})
  SELECT item_id::BIGINT AS item_id, n AS n_raters, f AS v_e6
  FROM v2
  ORDER BY v_e6 DESC, item_id ASC LIMIT {_ALS_TOPN}
"""


def q_bias_baseline(spark, sf_dir):
    """One-row model card of the damped bias baseline vs the global
    mean (recsys.bias_baseline; all sums BIGINT, μ/b/MAE on e6)."""
    r = recsys.ratings_from_orders(_t(spark, sf_dir, "orders"),
                                   _t(spark, sf_dir, "lineitem"))
    return recsys.bias_baseline(r, damp=_BIAS_DAMP)


def _oracle_bias() -> str:
    return f"""
  WITH {_RATINGS_SQL},
  tot AS (SELECT sum(r)::BIGINT AS sr, count(*)::BIGINT AS n FROM ratings),
  mu AS (SELECT floor(sr::DOUBLE * 1e6 / n::DOUBLE)::BIGINT AS mu_e6, n
         FROM tot),
  rws AS (SELECT r.user_id, r.item_id, mu.mu_e6, mu.n,
                 (r.r * 1000000)::BIGINT AS r_e6
          FROM ratings r, mu),
  bi AS (SELECT item_id,
                floor(sum(r_e6 - mu_e6)::DOUBLE
                      / ({_BIAS_DAMP} + count(*))::DOUBLE)::BIGINT AS bi_e6
         FROM rws GROUP BY item_id),
  wbi AS (SELECT rws.*, bi.bi_e6 FROM rws JOIN bi USING (item_id)),
  bu AS (SELECT user_id,
                floor(sum(r_e6 - mu_e6 - bi_e6)::DOUBLE
                      / ({_BIAS_DAMP} + count(*))::DOUBLE)::BIGINT AS bu_e6
         FROM wbi GROUP BY user_id),
  sc AS (SELECT w.n, w.mu_e6,
                abs(w.r_e6 - w.mu_e6)::BIGINT AS ae_mu,
                abs(w.r_e6 - w.mu_e6 - w.bi_e6 - bu.bu_e6)::BIGINT AS ae_bias
         FROM wbi w JOIN bu USING (user_id))
  SELECT n AS n_ratings, mu_e6,
         floor(sum(ae_mu)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS mae_global_e6,
         floor(sum(ae_bias)::DOUBLE / count(*)::DOUBLE)::BIGINT
           AS mae_bias_e6
  FROM sc GROUP BY n, mu_e6
"""


def q_boilerplate_strip(spark, sf_dir):
    """Per-source boilerplate strip report (curation.boilerplate_strip:
    8-token segments, boilerplate = present in ≥2 distinct docs of the
    same source, remove ALL instances)."""
    return (curation.boilerplate_strip(
        _t(spark, sf_dir, "documents"), min_docs=_BOILER_MIN_DOCS)
        .orderBy("source"))


def _oracle_boilerplate() -> str:
    return rf"""
  WITH words AS (
    SELECT doc_id, source,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  lines AS (
    SELECT doc_id, source,
           array_to_string(list_slice(w, s, least(s + 7, len(w))), ' ')
             AS line_text
    FROM (SELECT doc_id, source, w,
                 unnest(generate_series(1, len(w), 8)) AS s
          FROM words WHERE len(w) > 0)
  ),
  per_seg AS (
    SELECT source, line_text,
           count(DISTINCT doc_id)::BIGINT AS df_docs,
           count(*)::BIGINT AS inst,
           sum(length(line_text))::BIGINT AS chars
    FROM lines GROUP BY source, line_text
  ),
  totals AS (
    SELECT source, sum(inst)::BIGINT AS n_segments,
           sum(chars)::BIGINT AS n_chars
    FROM per_seg GROUP BY source
  ),
  boiler AS (
    SELECT source, count(*)::BIGINT AS boiler_segments,
           sum(inst)::BIGINT AS removed_instances,
           sum(chars)::BIGINT AS removed_chars
    FROM per_seg WHERE df_docs >= {_BOILER_MIN_DOCS} GROUP BY source
  )
  SELECT t.source, t.n_segments, t.n_chars,
         coalesce(b.boiler_segments, 0)::BIGINT AS boiler_segments,
         coalesce(b.removed_instances, 0)::BIGINT AS removed_instances,
         coalesce(b.removed_chars, 0)::BIGINT AS removed_chars,
         floor(coalesce(b.removed_instances, 0)::DOUBLE * 1e6
               / t.n_segments::DOUBLE)::BIGINT AS removed_frac_e6
  FROM totals t LEFT JOIN boiler b USING (source)
  ORDER BY t.source
"""


def q_sax_daily(spark, sf_dir):
    """SAX 4-letter daily-series fingerprints per event type
    (eventflow.sax_daily_symbols)."""
    return (eventflow.sax_daily_symbols(_t(spark, sf_dir, "events"))
            .orderBy("event_type"))


def _oracle_sax() -> str:
    return """
  WITH daily AS (
    SELECT event_type AS g,
           floor(floor(epoch(ts))::BIGINT / 86400)::BIGINT AS day,
           sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS t
    FROM events GROUP BY 1, 2
  ),
  mom AS (
    SELECT g, count(*)::BIGINT AS n, sum(t)::BIGINT AS s1,
           sum(t * t)::BIGINT AS s2
    FROM daily GROUP BY g
  ),
  z AS (
    SELECT d.g, d.day,
           CASE WHEN (m.n::DOUBLE * m.s2::DOUBLE
                      - m.s1::DOUBLE * m.s1::DOUBLE) > 0
                THEN floor((m.n * d.t - m.s1)::DOUBLE * 1e6
                           / sqrt(m.n::DOUBLE * m.s2::DOUBLE
                                  - m.s1::DOUBLE * m.s1::DOUBLE))::BIGINT
                ELSE 0 END AS z_e6
    FROM daily d JOIN mom m USING (g)
  ),
  sym AS (
    SELECT g, day,
           CASE WHEN z_e6 < -674500 THEN 'a'
                WHEN z_e6 < 0 THEN 'b'
                WHEN z_e6 < 674500 THEN 'c'
                ELSE 'd' END AS sym
    FROM z
  )
  SELECT g AS event_type, count(*)::BIGINT AS n_days,
         string_agg(sym, '' ORDER BY day) AS sax,
         sum((sym = 'a')::BIGINT)::BIGINT AS n_a,
         sum((sym = 'b')::BIGINT)::BIGINT AS n_b,
         sum((sym = 'c')::BIGINT)::BIGINT AS n_c,
         sum((sym = 'd')::BIGINT)::BIGINT AS n_d
  FROM sym GROUP BY g ORDER BY g
"""


def q_bpe_merge_rounds(spark, sf_dir):
    """First 3 learned BPE merges with each winner applied before the
    next count (text.bpe_merge_rounds)."""
    return text.bpe_merge_rounds(_t(spark, sf_dir, "documents"),
                                 rounds=_BPE_ROUNDS)


def _oracle_bpe_rounds() -> str:
    pieces = [r"""
  WITH wrd AS (
    SELECT w, count(*)::BIGINT AS c FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS w
      FROM documents) GROUP BY w
  ),
  s0 AS (
    SELECT c, ' ' || regexp_replace(w, '(.)', '\1 ', 'g') AS seq FROM wrd
  )"""]
    sels = []
    for r in range(1, _BPE_ROUNDS + 1):
        prev = f"s{r - 1}"
        pieces.append(f"""
  p{r} AS MATERIALIZED (
    SELECT pair, sum(c)::BIGINT AS cnt FROM (
      SELECT c, t[i] || ' ' || t[i + 1] AS pair FROM (
        SELECT c, t, unnest(generate_series(1, len(t) - 1)) AS i
        FROM (SELECT c, string_split(trim(seq), ' ') AS t FROM {prev})
      )
    ) GROUP BY pair ORDER BY cnt DESC, pair ASC LIMIT 1
  ),
  s{r} AS (
    SELECT c,
           replace(replace(seq,
                           ' ' || p{r}.pair || ' ',
                           ' ' || replace(p{r}.pair, ' ', '') || ' '),
                   ' ' || p{r}.pair || ' ',
                   ' ' || replace(p{r}.pair, ' ', '') || ' ') AS seq
    FROM {prev}, p{r}
  )""")
        sels.append(f"""
  SELECT {r}::BIGINT AS round, pair, replace(pair, ' ', '') AS merged,
         cnt AS pair_count
  FROM p{r}""")
    return (",".join(pieces) + "\n" + "\n  UNION ALL".join(sels)
            + "\n  ORDER BY round")


QUERIES_ROUND10.update({
    "als_rank1_item_factors": QuerySpec(
        q_als_rank1, _oracle_als(), headline=True,
        doc="rank-1 ALS (2 sweeps, e6 grid) over customer x part "
            "quantities: top-20 item factors"),
    "bias_baseline_card": QuerySpec(
        q_bias_baseline, _oracle_bias(),
        doc="damped bias-baseline recommender card: MAE of mu + b_i + "
            "b_u vs constant-mu"),
    "boilerplate_strip_report": QuerySpec(
        q_boilerplate_strip, _oracle_boilerplate(), headline=True,
        doc="per-source frequency-based boilerplate segment census "
            "(>=2 distinct docs in source)"),
    "sax_daily_symbols": QuerySpec(
        q_sax_daily, _oracle_sax(),
        doc="SAX 4-letter symbolization of per-type daily series "
            "(z e6, quartile breakpoints)"),
    "bpe_merge_rounds": QuerySpec(
        q_bpe_merge_rounds, _oracle_bpe_rounds(),
        doc="BPE merge rounds 1-3, winner applied before next count "
            "(vocabulary-factored)"),
})
