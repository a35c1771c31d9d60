"""Round-5 extension queries: common-neighbor link prediction, the
self-trained Naive Bayes language classifier, PMI collocations,
CUSUM drift monitoring (prefix-sum identity), bounded-tail EWMA,
lag-1 autocorrelation, and reciprocal-rank-fusion hybrid retrieval.

Same cross-engine exactness rules as ``queries.py``: counts and
folds stay in BIGINT; where an ln/sqrt is unavoidable it runs ONCE
per output (or once per MODEL entry, quantized at build time) on an
identically-parenthesized double tree and floors at e6.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import eventflow, graph, text
from .spec import QuerySpec, _t

QUERIES_ROUND5: dict[str, QuerySpec] = {}

# ---------------------------------------------------------------------------
# Link prediction on the co-purchase graph
# ---------------------------------------------------------------------------

_LP_CAP = 200   # wedge-center degree cap (mirrored in the oracle)
_LP_K = 20


_LP_MIN_QTY = 40  # "significant" co-purchase: both lines qty >= 40


def q_link_prediction_copurchase(spark, sf_dir):
    """Top-20 predicted co-purchase links (non-adjacent part pairs by
    common-neighbor count): exact cn / Jaccard-e6 / Resource-Allocation
    with pre-floored integer 1/deg terms — merge-order-proof scoring,
    degree-capped wedge centers.

    The graph keeps only significant co-purchases (both lines
    qty ≥ 40): the UNFILTERED bipartite projection of uniform-random
    orders is near-complete (sf0.1: median part degree 119 → 3·10⁸
    wedges — every part "related" to every other carries no signal);
    the thresholded projection has dmax 23 and ~9·10⁵ wedges, the
    shape a real product graph (or a tf-thresholded co-occurrence
    graph) actually has. The operator itself stays general — the cap
    bound Σ min(d, cap)² governs whatever graph is passed in."""
    li = _t(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= _LP_MIN_QTY)
    scored = graph.link_prediction(graph.copurchase_edges(li),
                                   max_degree=_LP_CAP)
    return scored.orderBy(F.col("cn").desc(), F.col("ra_e6").desc(),
                          "u", "v").limit(_LP_K)


ORACLE_LINK_PREDICTION = f"""
  WITH e0 AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    WHERE a.l_quantity >= {_LP_MIN_QTY}
      AND b.l_quantity >= {_LP_MIN_QTY}
  ),
  adj AS (
    SELECT pa AS x, pb AS y FROM e0
    UNION ALL SELECT pb, pa FROM e0
  ),
  deg AS (SELECT x AS n, count(*)::BIGINT AS d FROM adj GROUP BY x),
  centers AS (SELECT n AS w, d AS dw FROM deg WHERE d <= {_LP_CAP}),
  wedges AS (
    SELECT n1.y AS u, n2.y AS v, c.dw
    FROM adj n1 JOIN centers c ON n1.x = c.w
                JOIN adj n2 ON n2.x = c.w
    WHERE n1.y < n2.y
  ),
  pairs AS (
    SELECT u, v, count(*)::BIGINT AS cn,
           sum(floor(1000000 / dw)::BIGINT)::BIGINT AS ra_e6
    FROM wedges GROUP BY u, v
  ),
  cand AS (
    SELECT p.* FROM pairs p
    ANTI JOIN e0 ON e0.pa = p.u AND e0.pb = p.v
  ),
  scored AS (
    SELECT c.u, c.v, c.cn,
           (du.d + dv.d - c.cn)::BIGINT AS union_sz,
           floor((c.cn * 1000000) / (du.d + dv.d - c.cn))::BIGINT
             AS jaccard_e6,
           c.ra_e6
    FROM cand c JOIN deg du ON du.n = c.u JOIN deg dv ON dv.n = c.v
  )
  SELECT * FROM scored
  ORDER BY cn DESC, ra_e6 DESC, u, v LIMIT {_LP_K}
"""

# ---------------------------------------------------------------------------
# Naive Bayes language classifier (self-trained on the stopword rule)
# ---------------------------------------------------------------------------


def q_nb_lang_classifier(spark, sf_dir):
    """Train multinomial NB on heuristically-labeled docs, score every
    doc with quantized-integer log-likelihoods (e6 grid), argmax with
    the en>es>fr tie order."""
    return text.nb_lang_classifier(_t(spark, sf_dir, "documents"))


def _nb_oracle() -> str:
    from .queries import ORACLE_LANG
    langs = ("en", "es", "fr")
    cnt = ", ".join(
        f"sum(CASE WHEN lang_pred = '{c}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS cnt_{c}" for c in langs)
    tot = ", ".join(f"sum(cnt_{c})::BIGINT AS tot_{c}" for c in langs)
    ndoc = ", ".join(
        f"sum(CASE WHEN lang_pred = '{c}' THEN 1 ELSE 0 END)::BIGINT"
        f" AS n_{c}" for c in langs)
    mdl = ", ".join(
        f"floor(ln((cnt_{c} + 1)::DOUBLE / (tot_{c} + vocab)) * 1000000)"
        f"::BIGINT AS ll_{c}" for c in langs)
    oov = {c: (f"floor(ln((0 + 1)::DOUBLE / (tot_{c} + vocab)) * 1000000)"
               f"::BIGINT") for c in langs}
    ssum = ", ".join(
        f"sum(coalesce(m.ll_{c}, {oov[c]}))::BIGINT AS s_{c}"
        for c in langs)
    pri = ", ".join(
        f"floor(ln((n_{c} + 1)::DOUBLE / (n_train + 3)) * 1000000)"
        f"::BIGINT AS p_{c}" for c in langs)
    sc = ", ".join(
        f"(coalesce(s.s_{c}, 0) + p.p_{c})::BIGINT AS score_{c}_e6"
        for c in langs)
    return rf"""
  WITH lang AS ({ORACLE_LANG}),
  t AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '') AS w
    FROM documents
  ),
  tok AS (SELECT doc_id, unnest(w) AS term FROM t),
  train AS (SELECT doc_id, lang_pred FROM lang
            WHERE lang_pred <> 'und'),
  tt AS (SELECT term, lang_pred FROM tok JOIN train USING (doc_id)),
  counts AS (SELECT term, {cnt} FROM tt GROUP BY term),
  stats AS (SELECT count(*)::BIGINT AS vocab, {tot} FROM counts),
  priors AS (SELECT count(*)::BIGINT AS n_train, {ndoc} FROM train),
  model AS (SELECT term, {mdl} FROM counts, stats),
  scored AS (
    SELECT tok.doc_id, {ssum}
    FROM tok LEFT JOIN model m USING (term), stats
    GROUP BY tok.doc_id
  ),
  p AS (SELECT {pri} FROM priors),
  final AS (
    SELECT d.doc_id, {sc}
    FROM (SELECT doc_id FROM documents) d
    LEFT JOIN scored s USING (doc_id), p
  )
  SELECT doc_id, score_en_e6, score_es_e6, score_fr_e6,
         CASE WHEN score_en_e6 >= score_es_e6
                   AND score_en_e6 >= score_fr_e6 THEN 'en'
              WHEN score_es_e6 >= score_fr_e6 THEN 'es'
              ELSE 'fr' END AS nb_pred
  FROM final
"""

# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

_PMI_MIN, _PMI_K = 3, 30


def q_pmi_collocations(spark, sf_dir):
    """Top-30 adjacent-token bigrams by e6-floored PMI (exact counts
    alongside) — the phrase-detection statistic."""
    return text.pmi_bigrams(_t(spark, sf_dir, "documents"),
                            min_count=_PMI_MIN, k=_PMI_K)


ORACLE_PMI = rf"""
  WITH t AS (
    SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                               t -> t <> '') AS w
    FROM documents
  ),
  big AS (
    SELECT unnest(CASE WHEN len(w) >= 2 THEN
             list_transform(generate_series(1, len(w) - 1), i -> w[i])
             ELSE [] END) AS w1,
           unnest(CASE WHEN len(w) >= 2 THEN
             list_transform(generate_series(1, len(w) - 1), i -> w[i+1])
             ELSE [] END) AS w2
    FROM t
  ),
  uni AS (
    SELECT unnest(w) AS tk FROM t
  ),
  c1 AS (SELECT tk, count(*)::BIGINT AS c1 FROM uni GROUP BY tk),
  c2 AS (
    SELECT w1, w2, count(*)::BIGINT AS c2 FROM big GROUP BY w1, w2
    HAVING count(*) >= {_PMI_MIN}
  ),
  totals AS (
    SELECT (SELECT sum(c1)::BIGINT FROM c1) AS n1,
           (SELECT count(*)::BIGINT FROM big) AS n2
  )
  SELECT c2.w1, c2.w2, c2.c2, ua.c1 AS c1a, ub.c1 AS c1b,
         floor(ln(((c2.c2::DOUBLE * n1) * n1)
                  / ((n2::DOUBLE * ua.c1) * ub.c1)) * 1000000)::BIGINT
           AS pmi_e6
  FROM c2 JOIN c1 ua ON ua.tk = c2.w1
          JOIN c1 ub ON ub.tk = c2.w2, totals
  ORDER BY pmi_e6 DESC, w1, w2 LIMIT {_PMI_K}
"""

# ---------------------------------------------------------------------------
# CUSUM drift alerts / EWMA / lag-1 autocorrelation over the event stream
# ---------------------------------------------------------------------------


def q_cusum_drift_alerts(spark, sf_dir):
    """Per-user CUSUM drift detection via the prefix-sum identity
    (c_t = S_t − min(0, min S_j)) — pure window aggregates, no
    per-user collect; alarm = first event crossing h."""
    return eventflow.cusum_drift_alerts(_t(spark, sf_dir, "events"))


ORACLE_CUSUM = f"""
  WITH base AS (
    SELECT user_id AS u, ts, event_id AS eid,
           floor(value * 100 + 0.5)::BIGINT AS v_c
    FROM events
  ),
  tgt AS (
    SELECT u, floor(sum(v_c)::DOUBLE / count(*))::BIGINT AS target_c
    FROM base GROUP BY u
  ),
  s AS (
    SELECT b.u, b.eid, t.target_c,
           sum(b.v_c - t.target_c) OVER (
             PARTITION BY b.u ORDER BY b.ts, b.eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
    FROM base b JOIN tgt t ON t.u = b.u
  ),
  m AS (
    SELECT u, eid, target_c, s,
           min(s) OVER (PARTITION BY u ORDER BY eid
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s_min
    FROM s
  ),
  c AS (SELECT u, eid, target_c,
               (s - least(0, s_min))::BIGINT AS c FROM m)
  SELECT u AS user_id, count(*)::BIGINT AS n_events,
         max(target_c)::BIGINT AS target_c,
         max(c)::BIGINT AS cusum_max_c,
         coalesce(min(CASE WHEN c > {eventflow.CUSUM_H_C}
                           THEN eid END), -1)::BIGINT AS alarm_event_id
  FROM c GROUP BY u
"""


def q_ewma_recent_value(spark, sf_dir):
    """Per-user integer EWMA (α = ½, 6 fractional bits) of the last 64
    event values — bounded-tail fold, bit-exact."""
    return eventflow.ewma_recent(_t(spark, sf_dir, "events"))


_EW_T = eventflow.EWMA_TAIL

ORACLE_EWMA = f"""
  WITH base AS (
    SELECT user_id AS u,
           struct_pack(ts := ts, eid := event_id,
                       v_c := floor(value * 100 + 0.5)::BIGINT) AS rec
    FROM events
  ),
  arr AS (SELECT u, list_sort(list(rec)) AS a FROM base GROUP BY u),
  tl AS (
    SELECT u, list_slice(a, greatest(1, len(a) - {_EW_T - 1}),
                         len(a)) AS tl
    FROM arr
  )
  SELECT u AS user_id, len(tl)::BIGINT AS n_tail,
         list_reduce(
           list_prepend(0::BIGINT, list_transform(tl, r -> r.v_c)),
           (acc, x) -> floor((acc + x * 64)::DOUBLE / 2)::BIGINT
         )::BIGINT AS ewma_c64
  FROM tl
"""


def q_autocorr_lag1_user(spark, sf_dir):
    """Per-user lag-1 value autocorrelation: one lag window, exact
    decimal moments, e6-floored closed form."""
    return eventflow.autocorr_lag1(_t(spark, sf_dir, "events"))


ORACLE_AUTOCORR = """
  WITH base AS (
    SELECT user_id AS u, ts, event_id AS eid,
           floor(value * 100 + 0.5)::BIGINT AS y
    FROM events
  ),
  pairs AS (
    SELECT u, y,
           lag(y) OVER (PARTITION BY u ORDER BY ts, eid) AS x
    FROM base
  ),
  agg AS (
    SELECT u, count(*)::HUGEINT AS n,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(x::HUGEINT * x::HUGEINT) AS sxx,
           sum(y::HUGEINT * y::HUGEINT) AS syy,
           sum(x::HUGEINT * y::HUGEINT) AS sxy
    FROM pairs WHERE x IS NOT NULL GROUP BY u
  )
  SELECT u AS user_id, n::BIGINT AS n_pairs,
         (CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    > 0.0
               THEN floor((n::DOUBLE * sxy::DOUBLE
                           - sx::DOUBLE * sy::DOUBLE)
                          / sqrt((n::DOUBLE * sxx::DOUBLE
                                  - sx::DOUBLE * sx::DOUBLE)
                                 * (n::DOUBLE * syy::DOUBLE
                                    - sy::DOUBLE * sy::DOUBLE)) * 1e6)
               ELSE 0 END)::BIGINT AS autocorr_e6
  FROM agg
"""

# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and vector ranks
# ---------------------------------------------------------------------------

_RRF_K = 60   # the standard RRF constant (Cormack et al. 2009)


def q_retrieval_rrf_fusion(spark, sf_dir):
    """Hybrid search: fuse the BM25 top-10 and the hash-embedding
    cosine top-10 by reciprocal-rank fusion — score(d) =
    Σ floor(1e9 / (60 + rank_i(d))) over the lists containing d.
    Integer fusion over two independently-verified rankers; ranks come
    from row_number over each 10-row list (driver-side windows over
    k rows, not the corpus)."""
    from pyspark.sql import Window
    from ..operators import similarity
    from .analytics_more import _BM25_B, _BM25_K1, _BM25_TERMS

    docs = _t(spark, sf_dir, "documents")
    lex = text.bm25_topk(docs, _BM25_TERMS, k=10,
                         k1=_BM25_K1, b=_BM25_B)
    wl = Window.orderBy(F.col("score_e6").desc(), F.col("doc_id"))
    lex_r = lex.select("doc_id",
                       F.row_number().over(wl).alias("bm25_rank"))
    emb = text.hash_embedding(docs)
    vec = similarity.cosine_topk(emb, query_id=0, k=10,
                                 id_col="doc_id", vec_col="emb")
    wv = Window.orderBy(F.col("sim_e6").desc(), F.col("doc_id"))
    vec_r = vec.select("doc_id",
                       F.row_number().over(wv).alias("vec_rank"))
    fused = lex_r.join(vec_r, "doc_id", "full_outer")

    def _rr(rank):
        return F.coalesce(
            F.floor(F.lit(1_000_000_000) / (F.lit(_RRF_K) + rank))
             .cast("long"), F.lit(0))

    return (fused.select(
                "doc_id",
                F.coalesce("bm25_rank", F.lit(-1)).cast("long")
                 .alias("bm25_rank"),
                F.coalesce("vec_rank", F.lit(-1)).cast("long")
                 .alias("vec_rank"),
                (_rr(F.col("bm25_rank")) + _rr(F.col("vec_rank")))
                 .alias("rrf_e9"))
            .orderBy(F.col("rrf_e9").desc(), "doc_id").limit(10))


def _rrf_oracle() -> str:
    from .analytics_more import _bm25_oracle
    from .round4 import _oracle_retrieval_hash_topk
    rr = (f"coalesce(floor(1000000000 / ({_RRF_K} + {{r}}))::BIGINT, 0)")
    return f"""
  WITH lex AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY score_e6 DESC, doc_id)::BIGINT
             AS bm25_rank
    FROM ({_bm25_oracle()})
  ),
  vec AS (
    SELECT doc_id,
           row_number() OVER (ORDER BY sim_e6 DESC, doc_id)::BIGINT
             AS vec_rank
    FROM ({_oracle_retrieval_hash_topk()})
  )
  SELECT coalesce(lex.doc_id, vec.doc_id) AS doc_id,
         coalesce(bm25_rank, -1)::BIGINT AS bm25_rank,
         coalesce(vec_rank, -1)::BIGINT AS vec_rank,
         ({rr.format(r='bm25_rank')} + {rr.format(r='vec_rank')})::BIGINT
           AS rrf_e9
  FROM lex FULL OUTER JOIN vec ON lex.doc_id = vec.doc_id
  ORDER BY rrf_e9 DESC, doc_id LIMIT 10
"""


QUERIES_ROUND5.update({
    "link_prediction_copurchase": QuerySpec(
        q_link_prediction_copurchase, ORACLE_LINK_PREDICTION,
        doc="common-neighbor / Jaccard / Resource-Allocation link "
            "prediction, degree-capped wedge centers, integer scores"),
    "nb_lang_classifier": QuerySpec(
        q_nb_lang_classifier, _nb_oracle(), headline=True,
        doc="self-trained multinomial Naive Bayes language classifier "
            "(quantized-integer model, broadcast inference)"),
    "pmi_collocations": QuerySpec(
        q_pmi_collocations, ORACLE_PMI,
        doc="top-k adjacent-bigram collocations by e6-floored PMI"),
    "cusum_drift_alerts": QuerySpec(
        q_cusum_drift_alerts, ORACLE_CUSUM, headline=True,
        doc="per-user CUSUM drift detection via the prefix-sum window "
            "identity (no per-key collect)"),
    "ewma_recent_value": QuerySpec(
        q_ewma_recent_value, ORACLE_EWMA,
        doc="bounded-tail integer EWMA (α=1/2) of recent event values"),
    "autocorr_lag1_user": QuerySpec(
        q_autocorr_lag1_user, ORACLE_AUTOCORR,
        doc="per-user lag-1 autocorrelation, exact moments + e6 floor"),
    "retrieval_rrf_fusion": QuerySpec(
        q_retrieval_rrf_fusion, _rrf_oracle(),
        doc="reciprocal-rank fusion of BM25 and hash-embedding cosine "
            "top-k lists (hybrid search)"),
})

# ---------------------------------------------------------------------------
# Robust stats: winsorization + median/MAD outliers over event values
# ---------------------------------------------------------------------------


def q_winsorize_event_values(spark, sf_dir):
    """Per-event-type winsorization audit: exact nearest-rank p10/p90
    cut points, clipped sum, clip counts — rank arithmetic only."""
    from ..operators.quality import winsorize_groups
    ev = _t(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return winsorize_groups(ev, "event_type", v, "event_id")


ORACLE_WINSORIZE = """
  WITH base AS (
    SELECT event_type AS g, floor(value * 100 + 0.5)::BIGINT AS v,
           event_id AS i
    FROM events
  ),
  r AS (
    SELECT g, v,
           row_number() OVER (PARTITION BY g ORDER BY v, i) AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM base
  ),
  cuts AS (
    SELECT g,
           min(CASE WHEN rn = ceil(n * 10 / 100) THEN v END) AS lo_c,
           min(CASE WHEN rn = ceil(n * 90 / 100) THEN v END) AS hi_c
    FROM r GROUP BY g
  )
  SELECT b.g AS event_type, count(*)::BIGINT AS n_rows,
         max(lo_c)::BIGINT AS lo_c, max(hi_c)::BIGINT AS hi_c,
         sum(greatest(lo_c, least(hi_c, v)))::BIGINT AS sum_clipped,
         sum(CASE WHEN v < lo_c THEN 1 ELSE 0 END)::BIGINT AS n_clip_lo,
         sum(CASE WHEN v > hi_c THEN 1 ELSE 0 END)::BIGINT AS n_clip_hi
  FROM base b JOIN cuts USING (g) GROUP BY b.g
"""


def q_mad_outlier_values(spark, sf_dir):
    """Per-event-type robust outlier census: |v − median| > 3·MAD on
    exact low-median ranks."""
    from ..operators.quality import mad_outliers
    ev = _t(spark, sf_dir, "events")
    v = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return mad_outliers(ev, "event_type", v, "event_id")


ORACLE_MAD = """
  WITH base AS (
    SELECT event_type AS g, floor(value * 100 + 0.5)::BIGINT AS v,
           event_id AS i
    FROM events
  ),
  r1 AS (
    SELECT g, v,
           row_number() OVER (PARTITION BY g ORDER BY v, i) AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM base
  ),
  med AS (
    SELECT g, min(CASE WHEN rn = floor((n + 1) / 2) THEN v END)
             AS med_v
    FROM r1 GROUP BY g
  ),
  dev AS (
    SELECT b.g, abs(b.v - m.med_v) AS d, b.i
    FROM base b JOIN med m USING (g)
  ),
  r2 AS (
    SELECT g, d,
           row_number() OVER (PARTITION BY g ORDER BY d, i) AS rn,
           count(*) OVER (PARTITION BY g) AS n
    FROM dev
  ),
  mad AS (
    SELECT g, min(CASE WHEN rn = floor((n + 1) / 2) THEN d END)
             AS med_d
    FROM r2 GROUP BY g
  )
  SELECT b.g AS event_type, count(*)::BIGINT AS n_rows,
         max(m.med_v)::BIGINT AS median_c,
         max(a.med_d)::BIGINT AS mad_c,
         sum(CASE WHEN abs(b.v - m.med_v) > 3 * a.med_d
                  THEN 1 ELSE 0 END)::BIGINT AS n_outliers
  FROM base b JOIN med m USING (g) JOIN mad a USING (g)
  GROUP BY b.g
"""

# ---------------------------------------------------------------------------
# Source temperature mixing + vocabulary coverage curve
# ---------------------------------------------------------------------------


def q_source_temperature_mix(spark, sf_dir):
    """Per-source α=0.7 temperature sampling weights (quantized n^α,
    integer normalization) — the multilingual mixing rule."""
    from ..operators.curation import temperature_mix
    return temperature_mix(_t(spark, sf_dir, "documents"))


ORACLE_TEMPERATURE = """
  WITH counts AS (
    SELECT source, count(*)::BIGINT AS n_docs
    FROM documents GROUP BY source
  ),
  w AS (
    SELECT source, n_docs,
           floor(exp((7::DOUBLE / 10) * ln(n_docs::DOUBLE)) * 1000000)
             ::BIGINT AS w_e6
    FROM counts
  ),
  t AS (
    SELECT *, sum(w_e6) OVER () AS total,
           sum(n_docs) OVER () AS n_total
    FROM w
  )
  SELECT source, n_docs, w_e6,
         floor(w_e6 * 1000000 / total)::BIGINT AS share_e6,
         floor((w_e6 * 1000000 / total) * n_total / n_docs)::BIGINT
           AS boost_e6
  FROM t
"""


def q_vocab_coverage_curve(spark, sf_dir):
    """Smallest frequency-ranked vocab covering 50/90/99% of token
    occurrences — exact integer rank/coverage arithmetic."""
    return text.vocab_coverage(_t(spark, sf_dir, "documents"))


ORACLE_VOCAB_COVERAGE = r"""
  WITH terms AS (
    SELECT t, count(*)::BIGINT AS c FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents)
    GROUP BY t
  ),
  ranked AS (
    SELECT row_number() OVER (ORDER BY c DESC, t) AS rank,
           sum(c) OVER (ORDER BY c DESC, t
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
    FROM terms
  ),
  tot AS (SELECT max(cum) AS total, max(rank) AS n_terms FROM ranked),
  thr AS (SELECT unnest([50, 90, 99]) AS thr),
  agg AS (
    SELECT thr::BIGINT AS threshold_pct,
           min(rank)::BIGINT AS vocab_size,
           max(n_terms)::BIGINT AS n_terms_total,
           max(total)::BIGINT AS total_tokens
    FROM ranked, tot, thr
    WHERE cum * 100 >= total * thr
    GROUP BY thr
  )
  SELECT a.threshold_pct, a.vocab_size,
         r2.cum::BIGINT AS covered_tokens,
         a.n_terms_total, a.total_tokens
  FROM agg a JOIN ranked r2 ON r2.rank = a.vocab_size
"""


QUERIES_ROUND5.update({
    "winsorize_event_values": QuerySpec(
        q_winsorize_event_values, ORACLE_WINSORIZE,
        doc="per-group exact nearest-rank winsorization audit"),
    "mad_outlier_values": QuerySpec(
        q_mad_outlier_values, ORACLE_MAD,
        doc="median/MAD robust outlier census (exact low-median "
            "ranks)"),
    "source_temperature_mix": QuerySpec(
        q_source_temperature_mix, ORACLE_TEMPERATURE,
        doc="α=0.7 temperature source-mixing weights, integer-"
            "normalized"),
    "vocab_coverage_curve": QuerySpec(
        q_vocab_coverage_curve, ORACLE_VOCAB_COVERAGE,
        doc="vocab size covering 50/90/99% of token mass (tokenizer "
            "sizing)"),
})

# ---------------------------------------------------------------------------
# Snapshot diff (CDC derivation) / last-touch attribution / term drift
# ---------------------------------------------------------------------------


def q_snapshot_diff_orders(spark, sf_dir):
    """Change feed between two deterministic snapshots of orders
    (keys %97 inserted, %89 deleted, %101 price-bumped): one row per
    changed key with I/U/D — fingerprint-compare full-outer join."""
    from ..operators.joins import snapshot_diff
    orders = _t(spark, sf_dir, "orders")
    price_c = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)) \
               .cast("long")
    base = orders.select("o_orderkey", price_c.alias("price_c"))
    old = base.where(F.col("o_orderkey") % 97 != 0)
    new = (base.where(F.col("o_orderkey") % 89 != 0)
           .select("o_orderkey",
                   (F.col("price_c")
                    + F.when(F.col("o_orderkey") % 101 == 0, 1)
                       .otherwise(0)).alias("price_c")))
    return snapshot_diff(old, new, "o_orderkey", ["price_c"])


ORACLE_SNAPSHOT_DIFF = """
  WITH base AS (
    SELECT o_orderkey AS k,
           floor(o_totalprice * 100 + 0.5)::BIGINT AS p
    FROM orders
  ),
  o AS (SELECT k, p FROM base WHERE k % 97 <> 0),
  n AS (SELECT k, p + (CASE WHEN k % 101 = 0 THEN 1 ELSE 0 END) AS p
        FROM base WHERE k % 89 <> 0)
  SELECT coalesce(o.k, n.k) AS o_orderkey,
         CASE WHEN o.k IS NULL THEN 'I'
              WHEN n.k IS NULL THEN 'D'
              WHEN o.p <> n.p THEN 'U' END AS change_type
  FROM o FULL OUTER JOIN n ON o.k = n.k
  WHERE (o.k IS NULL OR n.k IS NULL OR o.p <> n.p)
"""


def q_purchase_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase credited to the user's
    latest preceding view within a day — one ordered window."""
    return eventflow.purchase_attribution(_t(spark, sf_dir, "events"))


ORACLE_ATTRIBUTION = f"""
  WITH base AS (
    SELECT user_id AS u, floor(epoch(ts))::BIGINT AS ts_s,
           event_id AS eid, event_type AS et
    FROM events
  ),
  w AS (
    SELECT u, ts_s, eid, et,
           last_value(CASE WHEN et = 'view'
                           THEN struct_pack(vts := ts_s, vid := eid)
                      END IGNORE NULLS)
             OVER (PARTITION BY u ORDER BY ts_s, eid
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS lv
    FROM base
  )
  SELECT eid AS purchase_id, u AS user_id,
         (CASE WHEN lv IS NOT NULL
                    AND (ts_s - lv.vts) <= {eventflow.ATTRIBUTION_WINDOW_S}
               THEN lv.vid ELSE -1 END)::BIGINT AS attributed_view_id,
         (CASE WHEN lv IS NOT NULL
                    AND (ts_s - lv.vts) <= {eventflow.ATTRIBUTION_WINDOW_S}
               THEN ts_s - lv.vts ELSE -1 END)::BIGINT AS gap_s
  FROM w WHERE et = 'purchase'
"""


def q_term_drift_sources(spark, sf_dir):
    """Top-30 terms by 2×2 chi-square drift between source groups
    src0-9 (partition A) and src10-19 (partition B)."""
    docs = _t(spark, sf_dir, "documents")
    cond = F.substring("source", 4, 8).cast("long") < 10
    return text.term_drift_chi2(docs, cond)


ORACLE_TERM_DRIFT = r"""
  WITH toks AS (
    SELECT (CASE WHEN substr(source, 4)::BIGINT < 10
                 THEN 1 ELSE 0 END) AS in_a,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS t
    FROM documents
  ),
  per_term AS (
    SELECT t, sum(in_a)::BIGINT AS a,
           sum(1 - in_a)::BIGINT AS b
    FROM toks GROUP BY t
  ),
  tot AS (SELECT sum(a)::BIGINT AS na, sum(b)::BIGINT AS nb
          FROM per_term)
  SELECT t, a, b,
         floor(((na::DOUBLE + nb::DOUBLE)
                * (((a::DOUBLE * (nb::DOUBLE - b::DOUBLE))
                    - (b::DOUBLE * (na::DOUBLE - a::DOUBLE)))
                   * ((a::DOUBLE * (nb::DOUBLE - b::DOUBLE))
                      - (b::DOUBLE * (na::DOUBLE - a::DOUBLE)))))
               / (((a::DOUBLE + b::DOUBLE)
                   * ((na::DOUBLE - a::DOUBLE)
                      + (nb::DOUBLE - b::DOUBLE)))
                  * (na::DOUBLE * nb::DOUBLE))
               * 1000000)::BIGINT AS chi2_e6,
         (CASE WHEN a::DOUBLE * nb::DOUBLE >= b::DOUBLE * na::DOUBLE
               THEN 1 ELSE -1 END)::BIGINT AS sign
  FROM per_term, tot
  WHERE a + b >= 5
  ORDER BY chi2_e6 DESC, t LIMIT 30
"""


QUERIES_ROUND5.update({
    "snapshot_diff_orders": QuerySpec(
        q_snapshot_diff_orders, ORACLE_SNAPSHOT_DIFF,
        doc="keyed I/U/D change feed between table snapshots "
            "(fingerprint full-outer join)"),
    "purchase_attribution": QuerySpec(
        q_purchase_attribution, ORACLE_ATTRIBUTION,
        doc="last-touch view→purchase attribution in one ordered "
            "window"),
    "term_drift_sources": QuerySpec(
        q_term_drift_sources, ORACLE_TERM_DRIFT,
        doc="per-term 2×2 chi-square drift between corpus "
            "partitions"),
})

# ---------------------------------------------------------------------------
# Two-feature OLS by normal equations (distributed closed-form fit)
# ---------------------------------------------------------------------------
#
# price_cents ~ b0 + b1·quantity + b2·discount_bp per returnflag: the
# nine moments accumulate EXACTLY (decimal(38,0) / HUGEINT — partial-agg
# order cannot change them); the 3×3 Cramer solve then runs on doubles
# converted from identical exact integers with an IDENTICAL expression
# string on both engines (the formulas below are embedded verbatim in
# the Spark plan via F.expr and in the DuckDB oracle), floored at e6.
# The pearson_qty_price exactness pattern, generalized from 5 moments
# to a full normal-equations solve.

_OLS_DET = ("((n_ * ((s11 * s22) - (s12 * s12))) "
            "- (s1 * ((s1 * s22) - (s12 * s2)))) "
            "+ (s2 * ((s1 * s12) - (s11 * s2)))")
# Cramer numerators: replace column j of A with b = (sy, s1y, s2y)
_OLS_D0 = ("((sy * ((s11 * s22) - (s12 * s12))) "
           "- (s1 * ((s1y * s22) - (s12 * s2y)))) "
           "+ (s2 * ((s1y * s12) - (s11 * s2y)))")
_OLS_D1 = ("((n_ * ((s1y * s22) - (s12 * s2y))) "
           "- (sy * ((s1 * s22) - (s12 * s2)))) "
           "+ (s2 * ((s1 * s2y) - (s1y * s2)))")
_OLS_D2 = ("((n_ * ((s11 * s2y) - (s1y * s12))) "
           "- (s1 * ((s1 * s2y) - (s1y * s2)))) "
           "+ (sy * ((s1 * s12) - (s11 * s2)))")


def q_ols_price_model(spark, sf_dir):
    """Per-returnflag least-squares fit of price on (quantity,
    discount_bp): exact integer moments, Cramer's-rule double solve,
    e6-floored coefficients."""
    li = _t(spark, sf_dir, "lineitem")
    dec, dec19 = "decimal(38,0)", "decimal(19,0)"
    d = li.select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("x1"),
        F.floor(F.col("l_discount") * 10000 + F.lit(0.5)).cast("long")
         .alias("x2"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"))
    x1, x2, y = [F.col(c).cast(dec19) for c in ("x1", "x2", "y")]
    agg = d.groupBy("l_returnflag").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x1").cast(dec)).alias("s1"),
        F.sum(F.col("x2").cast(dec)).alias("s2"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(x1 * x1).alias("s11"),
        F.sum(x1 * x2).alias("s12"),
        F.sum(x2 * x2).alias("s22"),
        F.sum(x1 * y).alias("s1y"),
        F.sum(x2 * y).alias("s2y"))
    dbl = agg.select(
        "l_returnflag", F.col("n").cast("long").alias("n_rows"),
        *[F.col(c).cast("double").alias(c if c != "n" else "n_")
          for c in ("n", "s1", "s2", "sy", "s11", "s12", "s22",
                    "s1y", "s2y")])
    det = F.expr(_OLS_DET)
    return dbl.select(
        "l_returnflag", "n_rows",
        *[F.when(det != 0.0,
                 F.floor(F.expr(dn) / det * F.lit(1_000_000)))
           .otherwise(F.lit(0)).cast("long").alias(f"b{i}_e6")
          for i, dn in enumerate((_OLS_D0, _OLS_D1, _OLS_D2))])


def _ols_oracle() -> str:
    return f"""
  WITH d AS (
    SELECT l_returnflag,
           floor(l_quantity)::BIGINT AS x1,
           floor(l_discount * 10000 + 0.5)::BIGINT AS x2,
           floor(l_extendedprice * 100)::BIGINT AS y
    FROM lineitem
  ),
  agg AS (
    SELECT l_returnflag,
           count(*)::HUGEINT AS n,
           sum(x1)::HUGEINT AS s1, sum(x2)::HUGEINT AS s2,
           sum(y)::HUGEINT AS sy,
           sum(x1::HUGEINT * x1::HUGEINT) AS s11,
           sum(x1::HUGEINT * x2::HUGEINT) AS s12,
           sum(x2::HUGEINT * x2::HUGEINT) AS s22,
           sum(x1::HUGEINT * y::HUGEINT) AS s1y,
           sum(x2::HUGEINT * y::HUGEINT) AS s2y
    FROM d GROUP BY l_returnflag
  ),
  dbl AS (
    SELECT l_returnflag, n::BIGINT AS n_rows,
           n::DOUBLE AS n_, s1::DOUBLE AS s1, s2::DOUBLE AS s2,
           sy::DOUBLE AS sy, s11::DOUBLE AS s11, s12::DOUBLE AS s12,
           s22::DOUBLE AS s22, s1y::DOUBLE AS s1y, s2y::DOUBLE AS s2y
    FROM agg
  )
  SELECT l_returnflag, n_rows,
         (CASE WHEN ({_OLS_DET}) <> 0.0
               THEN floor(({_OLS_D0}) / ({_OLS_DET}) * 1000000)
               ELSE 0 END)::BIGINT AS b0_e6,
         (CASE WHEN ({_OLS_DET}) <> 0.0
               THEN floor(({_OLS_D1}) / ({_OLS_DET}) * 1000000)
               ELSE 0 END)::BIGINT AS b1_e6,
         (CASE WHEN ({_OLS_DET}) <> 0.0
               THEN floor(({_OLS_D2}) / ({_OLS_DET}) * 1000000)
               ELSE 0 END)::BIGINT AS b2_e6
  FROM dbl
"""


QUERIES_ROUND5.update({
    "ols_price_model": QuerySpec(
        q_ols_price_model, _ols_oracle(),
        doc="two-feature OLS by exact-moment normal equations "
            "(Cramer solve, shared expression strings)"),
})

# ---------------------------------------------------------------------------
# Spark 4 SQL surface: recursive CTE + pipe syntax
# ---------------------------------------------------------------------------


def q_recursive_cte_depths(spark, sf_dir):
    """Depth histogram of the region→nation→customer→order hierarchy
    via a NATIVE ``WITH RECURSIVE`` (Spark 4) — the declarative twin
    of the iterative-DataFrame recursion family (bfs_hops /
    recursive_nation_tree): Catalyst runs the fixpoint loop, the SQL
    text is engine-portable (the oracle is the same statement modulo
    the count cast). The hierarchy is a TREE (each node one parent),
    so UNION ALL recursion enumerates each node exactly once — no
    path explosion, depth bounded at 3 by the data."""
    for t in ("region", "nation", "customer", "orders"):
        _t(spark, sf_dir, t).createOrReplaceTempView(f"{t}_rc")
    return spark.sql("""
      WITH RECURSIVE edges AS (
        SELECT 1000000 + n_nationkey AS node,
               n_regionkey AS parent FROM nation_rc
        UNION ALL
        SELECT 2000000 + c_custkey, 1000000 + c_nationkey
        FROM customer_rc
        UNION ALL
        SELECT 3000000 + o_orderkey, 2000000 + o_custkey FROM orders_rc
      ),
      tree AS (
        SELECT CAST(r_regionkey AS BIGINT) AS node, 0 AS depth
        FROM region_rc
        UNION ALL
        SELECT e.node, t.depth + 1
        FROM edges e JOIN tree t ON e.parent = t.node
      )
      SELECT CAST(depth AS BIGINT) AS depth,
             count(*) AS n_nodes
      FROM tree GROUP BY depth
    """)


ORACLE_RECURSIVE_CTE = """
  WITH RECURSIVE edges AS (
    SELECT 1000000 + n_nationkey AS node, n_regionkey AS parent
    FROM nation
    UNION ALL
    SELECT 2000000 + c_custkey, 1000000 + c_nationkey FROM customer
    UNION ALL
    SELECT 3000000 + o_orderkey, 2000000 + o_custkey FROM orders
  ),
  tree AS (
    SELECT r_regionkey::BIGINT AS node, 0 AS depth FROM region
    UNION ALL
    SELECT e.node, t.depth + 1
    FROM edges e JOIN tree t ON e.parent = t.node
  )
  SELECT depth::BIGINT AS depth, count(*)::BIGINT AS n_nodes
  FROM tree GROUP BY depth
"""


def q_pipe_syntax_orders(spark, sf_dir):
    """Open-order revenue rollup written in Spark 4 PIPE syntax
    (``|> WHERE … |> EXTEND … |> AGGREGATE … GROUP BY``) — the linear
    query dialect; parses to the identical Catalyst plan as the
    equivalent SELECT, which is what the plain-SQL oracle runs."""
    _t(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe")
    return spark.sql("""
      FROM orders_pipe
      |> WHERE o_orderstatus = 'O'
      |> EXTEND CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c
      |> AGGREGATE count(*) AS n_orders, sum(price_c) AS sum_price_c
         GROUP BY o_orderpriority
    """)


ORACLE_PIPE = """
  SELECT o_orderpriority, count(*)::BIGINT AS n_orders,
         sum(floor(o_totalprice * 100)::BIGINT)::BIGINT AS sum_price_c
  FROM orders WHERE o_orderstatus = 'O'
  GROUP BY o_orderpriority
"""


QUERIES_ROUND5.update({
    "recursive_cte_depths": QuerySpec(
        q_recursive_cte_depths, ORACLE_RECURSIVE_CTE,
        doc="native WITH RECURSIVE hierarchy walk (Spark 4 fixpoint "
            "loop, engine-portable SQL)"),
    "pipe_syntax_orders": QuerySpec(
        q_pipe_syntax_orders, ORACLE_PIPE,
        doc="Spark 4 pipe-syntax rollup (|> WHERE/EXTEND/AGGREGATE)"),
})

# ---------------------------------------------------------------------------
# Market basket / key-skew profiler / Zipf fit
# ---------------------------------------------------------------------------


def q_basket_lift_pairs(spark, sf_dir):
    """Top-20 part pairs by basket support with confidence and lift
    (A-priori pair pass, exact counts, e6 ratios)."""
    from ..operators.graph import basket_lift_pairs
    return basket_lift_pairs(_t(spark, sf_dir, "lineitem"))


ORACLE_BASKET = """
  WITH op AS (
    SELECT DISTINCT l_orderkey AS ok, l_partkey AS p FROM lineitem
  ),
  no AS (SELECT count(DISTINCT ok)::BIGINT AS n_orders FROM op),
  s1 AS (SELECT p, count(*)::BIGINT AS s FROM op GROUP BY p),
  s12 AS (
    SELECT a.p AS pa, b.p AS pb, count(*)::BIGINT AS support
    FROM op a JOIN op b ON a.ok = b.ok AND a.p < b.p
    GROUP BY a.p, b.p HAVING count(*) >= 3
  )
  SELECT pa, pb, support, sa.s AS s1a, sb.s AS s1b,
         floor(support * 1000000 / sa.s)::BIGINT AS confidence_e6,
         floor((support * n_orders) * 1000000
               / (sa.s * sb.s))::BIGINT AS lift_e6
  FROM s12 JOIN s1 sa ON sa.p = s12.pa
           JOIN s1 sb ON sb.p = s12.pb, no
  ORDER BY support DESC, lift_e6 DESC, pa, pb LIMIT 20
"""


def q_key_skew_custkey(spark, sf_dir):
    """One-row skew profile of orders.o_custkey: counts, heaviest
    key, p99 count, exact integer Gini."""
    from ..operators.scale import key_skew_report
    return key_skew_report(_t(spark, sf_dir, "orders"), "o_custkey")


ORACLE_KEY_SKEW = """
  WITH counts AS (
    SELECT o_custkey AS k, count(*)::BIGINT AS c
    FROM orders GROUP BY o_custkey
  ),
  ranked AS (
    SELECT k, c, row_number() OVER (ORDER BY c, k)::BIGINT AS rn,
           count(*) OVER ()::BIGINT AS n_k
    FROM counts
  ),
  agg AS (
    SELECT sum(c)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
           sum(rn * c)::BIGINT AS s_rank,
           min(CASE WHEN rn * 100 >= n_k * 99 THEN c END)::BIGINT
             AS p99_cnt
    FROM ranked
  ),
  top AS (SELECT k AS max_key, c AS max_cnt FROM counts
          ORDER BY c DESC, k DESC LIMIT 1)
  SELECT n_rows, n_keys, max_key, max_cnt, p99_cnt,
         floor((2 * s_rank - (n_keys + 1) * n_rows) * 1000000
               / (n_keys * n_rows))::BIGINT AS gini_e6
  FROM agg, top
"""


def q_zipf_fit_tokens(spark, sf_dir):
    """Zipf exponent of the document token distribution (quantized
    log-log OLS, exact moments)."""
    return text.zipf_fit(_t(spark, sf_dir, "documents"))


ORACLE_ZIPF = r"""
  WITH terms AS (
    SELECT t, count(*)::BIGINT AS c FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents)
    GROUP BY t
  ),
  ranked AS (
    SELECT c, row_number() OVER (ORDER BY c DESC, t)::BIGINT AS rank
    FROM terms
  ),
  q AS (
    SELECT c,
           floor(ln(rank::DOUBLE) * 1000000)::BIGINT AS x,
           floor(ln(c::DOUBLE) * 1000000)::BIGINT AS y
    FROM ranked
  ),
  m AS (
    SELECT count(*)::HUGEINT AS n, sum(c)::BIGINT AS total_tokens,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(x::HUGEINT * x::HUGEINT) AS sxx,
           sum(x::HUGEINT * y::HUGEINT) AS sxy
    FROM q
  )
  SELECT n::BIGINT AS n_terms, total_tokens,
         (CASE WHEN ((n::DOUBLE * sxx::DOUBLE)
                     - (sx::DOUBLE * sx::DOUBLE)) <> 0.0
               THEN floor((-(((n::DOUBLE * sxy::DOUBLE)
                              - (sx::DOUBLE * sy::DOUBLE))
                             / ((n::DOUBLE * sxx::DOUBLE)
                                - (sx::DOUBLE * sx::DOUBLE))))
                          * 1000000)
               ELSE 0 END)::BIGINT AS alpha_e6,
         (CASE WHEN ((n::DOUBLE * sxx::DOUBLE)
                     - (sx::DOUBLE * sx::DOUBLE)) <> 0.0
               THEN floor((sy::DOUBLE
                           - ((((n::DOUBLE * sxy::DOUBLE)
                                - (sx::DOUBLE * sy::DOUBLE))
                               / ((n::DOUBLE * sxx::DOUBLE)
                                  - (sx::DOUBLE * sx::DOUBLE)))
                              * sx::DOUBLE)) / n::DOUBLE)
               ELSE 0 END)::BIGINT AS intercept_e6
  FROM m
"""


QUERIES_ROUND5.update({
    "basket_lift_pairs": QuerySpec(
        q_basket_lift_pairs, ORACLE_BASKET,
        doc="market-basket pair support/confidence/lift (A-priori "
            "pair pass)"),
    "key_skew_custkey": QuerySpec(
        q_key_skew_custkey, ORACLE_KEY_SKEW,
        doc="join-key skew profiler: top key, p99 count, exact Gini"),
    "zipf_fit_tokens": QuerySpec(
        q_zipf_fit_tokens, ORACLE_ZIPF,
        doc="Zipf exponent via quantized log-log OLS"),
})

# ---------------------------------------------------------------------------
# Personalized PageRank (random walk with restart)
# ---------------------------------------------------------------------------

_PPR_ITERS = 3


def q_ppr_trade_graph(spark, sf_dir):
    """Personalized PageRank from the lowest trade-graph node,
    3 exact-integer iterations — restart mass concentrated at one
    entity (recommendation ranking), bit-identical across engines."""
    from ..operators.graph import (personalized_pagerank,
                                   supplier_customer_edges)
    edges = supplier_customer_edges(_t(spark, sf_dir, "lineitem"),
                                    _t(spark, sf_dir, "orders"))
    return personalized_pagerank(edges, iters=_PPR_ITERS)


def _ppr_oracle() -> str:
    from ..operators.graph import PR_SCALE, _D_DEN, _D_NUM
    parts = [f"""
  pairs AS (
    SELECT DISTINCT o.o_custkey * 2 AS cust_node,
           l.l_suppkey * 2 + 1 AS supp_node
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  ),
  e AS (
    SELECT supp_node AS src, cust_node AS dst FROM pairs
    UNION ALL
    SELECT cust_node AS src, supp_node AS dst FROM pairs
  ),
  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
  outdeg AS (SELECT src, count(*)::BIGINT AS deg FROM e GROUP BY src),
  st AS (SELECT count(*)::BIGINT AS nv, min(node)::BIGINT AS s
         FROM nodes),
  r0 AS (
    SELECT node,
           (CASE WHEN node = s THEN {PR_SCALE} * nv
                 ELSE 0 END)::BIGINT AS r
    FROM nodes, st)"""]
    base = (f"(CASE WHEN n.node = st.s "
            f"THEN ({3 * PR_SCALE} * st.nv) // {_D_DEN} "
            f"ELSE 0 END)")  # pre-multiplied: 3·1e9 overflows INT32
    for t in range(_PPR_ITERS):
        parts.append(f"""
  c{t} AS (
    SELECT o.src AS u, (r.r // o.deg)::BIGINT AS c
    FROM r{t} r JOIN outdeg o ON r.node = o.src
  ),
  i{t} AS (
    SELECT e.dst AS dst, sum(c.c)::BIGINT AS s_in
    FROM e JOIN c{t} c ON e.src = c.u GROUP BY e.dst
  ),
  r{t + 1} AS (
    SELECT n.node,
           ({base} + (coalesce(i.s_in, 0) * {_D_NUM}) // {_D_DEN})
             ::BIGINT AS r
    FROM nodes n LEFT JOIN i{t} i ON n.node = i.dst, st
  )""")
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT node, r AS ppr_e9 FROM r{_PPR_ITERS}
"""


QUERIES_ROUND5.update({
    "ppr_trade_graph": QuerySpec(
        q_ppr_trade_graph, _ppr_oracle(),
        doc="personalized PageRank (restart at one node, exact "
            "integer grid)"),
})

# ---------------------------------------------------------------------------
# AMS join-size estimation
# ---------------------------------------------------------------------------


def q_ams_join_size(spark, sf_dir):
    """Estimate |orders ⋈ lineitem| on the orderkey by AMS sketch
    inner product, next to the exact size — the optimizer's
    cardinality trick as a query."""
    from ..operators.sketches import ams_join_size
    return ams_join_size(_t(spark, sf_dir, "orders"), "o_orderkey",
                         _t(spark, sf_dir, "lineitem"), "l_orderkey")


def _ams_oracle() -> str:
    from ..operators.sketches import AMS_BUCKETS
    from ..functions.scalar import stable_hash64_sql
    shift = AMS_BUCKETS.bit_length() - 1

    def sk(table: str, key: str) -> str:
        h = stable_hash64_sql(f"{key}::VARCHAR")
        return f"""
    SELECT ({h} & {AMS_BUCKETS - 1}) AS b,
           sum(1 - 2 * (({h} >> {shift}) & 1))::BIGINT AS s
    FROM {table} GROUP BY 1"""

    return f"""
  WITH sa AS ({sk('orders', 'o_orderkey')}),
  sb AS ({sk('lineitem', 'l_orderkey')}),
  est AS (
    SELECT sum(sa.s * sb.s)::BIGINT AS est_join_size
    FROM sa JOIN sb ON sa.b = sb.b
  ),
  ca AS (SELECT o_orderkey AS k, count(*)::BIGINT AS c
         FROM orders GROUP BY o_orderkey),
  cb AS (SELECT l_orderkey AS k, count(*)::BIGINT AS c
         FROM lineitem GROUP BY l_orderkey),
  exact AS (
    SELECT sum(ca.c * cb.c)::BIGINT AS exact_join_size
    FROM ca JOIN cb ON ca.k = cb.k
  )
  SELECT coalesce(est_join_size, 0)::BIGINT AS est_join_size,
         coalesce(exact_join_size, 0)::BIGINT AS exact_join_size,
         {AMS_BUCKETS}::BIGINT AS n_buckets
  FROM est, exact
"""


QUERIES_ROUND5.update({
    "ams_join_size": QuerySpec(
        q_ams_join_size, _ams_oracle(),
        doc="AMS sketch join-cardinality estimate next to the exact "
            "size"),
})

# ---------------------------------------------------------------------------
# Contrastive triplet mining
# ---------------------------------------------------------------------------


def q_contrastive_triplets(spark, sf_dir):
    """(anchor, positive, negative) training triplets: positives from
    the verified MinHash near-dup pairs, negatives from the
    deterministic bucket-chain rule (broadcast-sized, no RNG)."""
    from ..operators import dedup
    from ..operators.curation import contrastive_triplets
    docs = _t(spark, sf_dir, "documents")
    return contrastive_triplets(docs,
                                dedup.minhash_near_duplicates(docs))


def _triplets_oracle() -> str:
    from ..functions.scalar import stable_hash64_sql
    from ..operators.curation import TRIPLET_BUCKETS
    from .queries import _oracle_minhash
    B = TRIPLET_BUCKETS
    hdoc = stable_hash64_sql("doc_id::VARCHAR")
    ha = stable_hash64_sql("doc_a::VARCHAR")
    joins = "".join(
        f"\n  LEFT JOIN bmin b{i} ON ((t.ah + {i}) & {B - 1}) = b{i}.b"
        for i in (1, 2, 3))
    ok = {i: (f"(b{i}.cand IS NOT NULL AND b{i}.cand <> t.anchor "
              f"AND b{i}.cand <> t.positive)") for i in (1, 2, 3)}
    return f"""
  WITH mh AS (SELECT doc_a, doc_b FROM ({_oracle_minhash()}) x),
  bmin AS (
    SELECT ({hdoc} & {B - 1}) AS b, min(doc_id) AS cand
    FROM documents GROUP BY 1
  ),
  t AS (
    SELECT doc_a AS anchor, doc_b AS positive, {ha} AS ah FROM mh
  )
  SELECT t.anchor, t.positive,
         (CASE WHEN {ok[1]} THEN b1.cand
               WHEN {ok[2]} THEN b2.cand
               WHEN {ok[3]} THEN b3.cand
               ELSE -1 END)::BIGINT AS negative
  FROM t{joins}
"""


QUERIES_ROUND5.update({
    "contrastive_triplets": QuerySpec(
        q_contrastive_triplets, _triplets_oracle(),
        doc="anchor/positive/negative triplet mining (near-dup "
            "positives, deterministic bucket-chain negatives)"),
})

# ---------------------------------------------------------------------------
# KS two-sample test + Benford first-digit audit
# ---------------------------------------------------------------------------


def q_ks_purchase_vs_view(spark, sf_dir):
    """Integer-exact two-sample KS distance between purchase and view
    value distributions (D on the cents grid, no float CDFs)."""
    ev = _t(spark, sf_dir, "events")
    return eventflow.ks_two_sample(
        ev, F.col("event_type") == "purchase",
        F.col("event_type") == "view")


ORACLE_KS = """
  WITH tagged AS (
    SELECT floor(value * 100 + 0.5)::BIGINT AS v,
           (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             ::BIGINT AS ia,
           (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             ::BIGINT AS ib
    FROM events
  ),
  f AS (SELECT * FROM tagged WHERE ia + ib > 0),
  per_v AS (SELECT v, sum(ia)::BIGINT AS ca, sum(ib)::BIGINT AS cb
            FROM f GROUP BY v),
  cum AS (
    SELECT v,
           sum(ca) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_a,
           sum(cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS cum_b,
           sum(ca) OVER () AS n_a, sum(cb) OVER () AS n_b
    FROM per_v
  ),
  gap AS (SELECT v, n_a, n_b,
                 abs(cum_a * n_b - cum_b * n_a) AS d FROM cum),
  g2 AS (SELECT *, max(d) OVER () AS d_max FROM gap)
  SELECT max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
         floor(max(d) * 1000000 / (max(n_a) * max(n_b)))::BIGINT
           AS ks_e6,
         min(CASE WHEN d = d_max THEN v END)::BIGINT AS ks_value_c
  FROM g2
"""


def q_benford_order_totals(spark, sf_dir):
    """Benford first-digit audit of order totals — observed digit
    shares vs the literal Benford table, signed e6 deltas."""
    from ..operators.aggregations import benford_digits
    return benford_digits(_t(spark, sf_dir, "orders"), "o_totalprice")


def _benford_oracle() -> str:
    from ..operators.aggregations import BENFORD_E6
    vals = ", ".join(f"({d}, {p})" for d, p in BENFORD_E6.items())
    return f"""
  WITH base AS (
    SELECT substr(floor(o_totalprice)::BIGINT::VARCHAR, 1, 1)::BIGINT
             AS digit
    FROM orders WHERE o_totalprice >= 1
  ),
  counts AS (SELECT digit, count(*)::BIGINT AS n_obs
             FROM base GROUP BY digit),
  total AS (SELECT sum(n_obs)::BIGINT AS n FROM counts),
  b(digit, p) AS (SELECT * FROM (VALUES {vals}) t(digit, p))
  SELECT c.digit, c.n_obs,
         floor(c.n_obs * 1000000 / t.n)::BIGINT AS p_obs_e6,
         b.p::BIGINT AS p_benford_e6,
         (floor(c.n_obs * 1000000 / t.n) - b.p)::BIGINT AS diff_e6
  FROM counts c JOIN b ON b.digit = c.digit, total t
"""


QUERIES_ROUND5.update({
    "ks_purchase_vs_view": QuerySpec(
        q_ks_purchase_vs_view, ORACLE_KS,
        doc="integer-exact two-sample Kolmogorov-Smirnov distance"),
    "benford_order_totals": QuerySpec(
        q_benford_order_totals, _benford_oracle(),
        doc="Benford first-digit audit (string digit extraction, "
            "literal expectation table)"),
})

# ---------------------------------------------------------------------------
# Mann-Whitney U + A/B conversion z-test
# ---------------------------------------------------------------------------


def q_mwu_purchase_vs_view(spark, sf_dir):
    """Exact Mann-Whitney U (doubled-midrank grid) between purchase
    and view values, with the AUC effect size."""
    ev = _t(spark, sf_dir, "events")
    return eventflow.mann_whitney_u(
        ev, F.col("event_type") == "purchase",
        F.col("event_type") == "view")


ORACLE_MWU = """
  WITH tagged AS (
    SELECT floor(value * 100 + 0.5)::BIGINT AS v,
           (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             ::BIGINT AS ia,
           (CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             ::BIGINT AS ib
    FROM events
  ),
  f AS (SELECT * FROM tagged WHERE ia + ib > 0),
  per_v AS (SELECT v, sum(ia)::BIGINT AS ca, sum(ib)::BIGINT AS cb
            FROM f GROUP BY v),
  cum AS (
    SELECT ca, cb,
           (sum(ca + cb) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            - (ca + cb)) AS c_before,
           (ca + cb) AS c_v,
           sum(ca) OVER () AS n_a, sum(cb) OVER () AS n_b
    FROM per_v
  ),
  agg AS (
    SELECT max(n_a)::BIGINT AS n_a, max(n_b)::BIGINT AS n_b,
           sum(ca * (2 * c_before + c_v + 1))::BIGINT AS r2_a
    FROM cum
  )
  SELECT n_a, n_b,
         (r2_a - n_a * (n_a + 1))::BIGINT AS u2_a,
         (2 * n_a * n_b - (r2_a - n_a * (n_a + 1)))::BIGINT AS u2_b,
         floor((r2_a - n_a * (n_a + 1)) * 1000000
               / (2 * n_a * n_b))::BIGINT AS auc_e6
  FROM agg
"""


def q_ab_conversion_ztest(spark, sf_dir):
    """Two-proportion conversion z-test between user-parity arms."""
    return eventflow.ab_conversion_ztest(_t(spark, sf_dir, "events"))


ORACLE_AB = """
  WITH per_user AS (
    SELECT user_id AS u,
           max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             ::BIGINT AS converted
    FROM events GROUP BY user_id
  ),
  arms AS (
    SELECT sum(CASE WHEN u % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_a,
           sum(CASE WHEN u % 2 = 0 THEN converted ELSE 0 END)
             ::BIGINT AS x_a,
           sum(CASE WHEN u % 2 = 0 THEN 0 ELSE 1 END)::BIGINT AS n_b,
           sum(CASE WHEN u % 2 = 0 THEN 0 ELSE converted END)
             ::BIGINT AS x_b
    FROM per_user
  )
  SELECT n_a, x_a, n_b, x_b,
         (CASE WHEN n_a > 0 AND n_b > 0
                    AND ((((x_a::DOUBLE + x_b::DOUBLE)
                           / (n_a::DOUBLE + n_b::DOUBLE))
                          * (1.0 - ((x_a::DOUBLE + x_b::DOUBLE)
                                    / (n_a::DOUBLE + n_b::DOUBLE))))
                         * ((1.0 / n_a::DOUBLE)
                            + (1.0 / n_b::DOUBLE))) > 0.0
               THEN floor((((x_a::DOUBLE / n_a::DOUBLE)
                            - (x_b::DOUBLE / n_b::DOUBLE))
                           / sqrt(((((x_a::DOUBLE + x_b::DOUBLE)
                                     / (n_a::DOUBLE + n_b::DOUBLE))
                                    * (1.0 - ((x_a::DOUBLE
                                               + x_b::DOUBLE)
                                              / (n_a::DOUBLE
                                                 + n_b::DOUBLE))))
                                   * ((1.0 / n_a::DOUBLE)
                                      + (1.0 / n_b::DOUBLE)))))
                          * 1000000)
               ELSE 0 END)::BIGINT AS z_e6
  FROM arms
"""


QUERIES_ROUND5.update({
    "mwu_purchase_vs_view": QuerySpec(
        q_mwu_purchase_vs_view, ORACLE_MWU,
        doc="exact Mann-Whitney U on the doubled-midrank grid + AUC "
            "effect size"),
    "ab_conversion_ztest": QuerySpec(
        q_ab_conversion_ztest, ORACLE_AB,
        doc="two-proportion conversion z-test between deterministic "
            "A/B arms"),
})
