"""Round-3b analytics/curation extension queries: substring-level
exact dedup (Lee et al. 2021), BM25 retrieval, k-means clustering,
SCD2 dimension history, and an equi-width value histogram.

Same cross-engine exactness rules as ``queries.py``: floor-scaled e6
fixed-point for anything that touches a double, fixed-order double
addition chains (never FP sums across an aggregate's merge order),
BIGINT integer math wherever possible, and deterministic tiebreaks on
ids.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalar import stable_hash64_sql
from ..operators.aggregations import value_histogram
from ..operators.dedup import span_duplicates
from ..operators.similarity import KMEANS_SCALE, kmeans_assign
from ..operators.text import bm25_topk
from ..operators.windows import scd2_history
from .spec import QuerySpec, _t

# ---------------------------------------------------------------------------
# Substring-level exact dedup (duplicated n-token spans)
# ---------------------------------------------------------------------------

_SPAN_N = 3  # fixture docs are ~40-170 tokens of a small vocabulary;
             # 3-token spans give real cross-doc duplication signal


def q_span_dedup_stats(spark, sf_dir):
    """Per-doc duplicated-span stats (EXACTSUBSTR-style substring
    dedup): spans whose n-token hash occurs ≥2 times corpus-wide,
    with exact covered-token interval union via a lag sweep."""
    return span_duplicates(_t(spark, sf_dir, "documents"), n=_SPAN_N)


def _gram_sql(n: int) -> str:
    return " || ' ' || ".join(f"w[i + {j}]" for j in range(n))


ORACLE_SPAN_DEDUP = rf"""
  WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  sp AS (
    SELECT doc_id, len(w) AS k,
           CASE WHEN len(w) >= {_SPAN_N} THEN {_SPAN_N}
                ELSE len(w) END AS span_len,
           CASE WHEN len(w) >= {_SPAN_N} THEN
             list_transform(generate_series(1, len(w) - {_SPAN_N - 1}),
                            i -> {_gram_sql(_SPAN_N)})
           ELSE [array_to_string(w, ' ')] END AS spans
    FROM words
  ),
  pos0 AS (  -- zipped unnests: (ordinal, span) pairs, length-bounded
    SELECT doc_id, k, span_len,
           unnest(generate_series(1, len(spans))) AS pos,
           unnest(spans) AS span
    FROM sp
  ),
  pos AS (
    SELECT doc_id, k, span_len, pos,
           {stable_hash64_sql('span', seed=7)} AS span_h
    FROM pos0
  ),
  freq AS (SELECT span_h, count(*) AS f FROM pos GROUP BY span_h),
  dupd AS (
    SELECT p.doc_id, p.k, p.span_len, p.pos, f.f, (f.f >= 2) AS dup,
           lag(p.pos) OVER (PARTITION BY p.doc_id, (f.f >= 2)
                            ORDER BY p.pos) AS pp
    FROM pos p JOIN freq f USING (span_h)
  ),
  inc AS (
    SELECT doc_id, k, f, dup,
           CASE WHEN NOT dup THEN 0
                WHEN pp IS NULL THEN span_len
                ELSE least(span_len, pos - pp) END AS cov
    FROM dupd
  ),
  agg AS (
    SELECT doc_id, max(k) AS n_tokens, count(*) AS n_spans,
           sum(CASE WHEN dup THEN 1 ELSE 0 END) AS n_dup_spans,
           max(f) AS max_span_freq, sum(cov) AS dup_tokens
    FROM inc GROUP BY doc_id
  )
  SELECT doc_id, n_tokens::BIGINT AS n_tokens, n_spans::BIGINT AS n_spans,
         n_dup_spans::BIGINT AS n_dup_spans,
         max_span_freq::BIGINT AS max_span_freq,
         dup_tokens::BIGINT AS dup_tokens,
         (CASE WHEN n_tokens > 0
               THEN floor(dup_tokens * 1000000 / n_tokens)
               ELSE 0 END)::BIGINT AS dup_frac_e6
  FROM agg
"""

# ---------------------------------------------------------------------------
# BM25 retrieval
# ---------------------------------------------------------------------------

_BM25_TERMS = ["spark", "vector", "merge"]
_BM25_K1, _BM25_B = 1.2, 0.75


def q_bm25_search_topk(spark, sf_dir):
    """BM25 top-10 for a fixed query bag — zero-explode map-side tf,
    one 1-row broadcast stats agg, fixed-order score chain."""
    return bm25_topk(_t(spark, sf_dir, "documents"), _BM25_TERMS, k=10,
                     k1=_BM25_K1, b=_BM25_B)


def _bm25_oracle() -> str:
    tfs = ",\n           ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}"
        for i, t in enumerate(_BM25_TERMS))
    dfs = ",\n           ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END)::BIGINT AS df_{i}"
        for i in range(len(_BM25_TERMS)))
    # mirror the Spark expression tree exactly: parenthesization and
    # literal values match text.bm25_topk's column chain
    avgdl = "(total_dl::DOUBLE / n_docs)"
    norm = f"({_BM25_K1!r} * ({1 - _BM25_B!r} + (({_BM25_B!r} * dl) / {avgdl})))"
    score = "0.0"
    for i in range(len(_BM25_TERMS)):
        idf = (f"ln(1.0 + ((((n_docs - df_{i}) + 0.5)) / (df_{i} + 0.5)))")
        score = (f"({score} + (((({idf} * tf_{i}::DOUBLE)) * "
                 f"{_BM25_K1 + 1.0!r}) / (tf_{i}::DOUBLE + {norm})))")
    return rf"""
  WITH d AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  t AS (
    SELECT doc_id, len(w) AS dl,
           {tfs}
    FROM d
  ),
  s AS (
    SELECT count(*)::BIGINT AS n_docs, sum(dl)::BIGINT AS total_dl,
           {dfs}
    FROM t
  ),
  scored AS (
    SELECT doc_id, dl::BIGINT AS dl,
           floor({score} * 1000000)::BIGINT AS score_e6
    FROM t, s
  )
  SELECT doc_id, dl, score_e6 FROM scored
  WHERE score_e6 > 0
  ORDER BY score_e6 DESC, doc_id ASC LIMIT 10
"""

# ---------------------------------------------------------------------------
# K-means (Lloyd's), exact integer grid
# ---------------------------------------------------------------------------

_KM_K, _KM_ITERS, _KM_DIM = 8, 2, 64


def q_kmeans_clusters(spark, sf_dir):
    """Lloyd's k-means (k=8, 2 update rounds, deterministic lowest-id
    seeds) on the 2^20 quantized grid — assignments and distances are
    exact BIGINTs, bit-identical across engines and partitionings."""
    return kmeans_assign(_t(spark, sf_dir, "embeddings"),
                         k=_KM_K, iters=_KM_ITERS)


def _kmeans_oracle() -> str:
    dist = ("list_sum(list_transform(generate_series(1, {dim}), i -> "
            "(v.vq[i] - c.cq[i]) * (v.vq[i] - c.cq[i])))"
            .format(dim=_KM_DIM))

    def assign(name: str, cent: str) -> str:
        return f"""
  {name} AS (
    SELECT vec_id, cluster_id, dist FROM (
      SELECT v.vec_id, c.cluster_id, {dist} AS dist,
             row_number() OVER (PARTITION BY v.vec_id
                                ORDER BY {dist} ASC, c.cluster_id ASC)
               AS rn
      FROM vq v, {cent} c) WHERE rn = 1
  )"""

    def update(name: str, prev_assign: str) -> str:
        return f"""
  {name}_u AS (
    SELECT cluster_id, pos,
           floor(sum(v)::DOUBLE / count(*))::BIGINT AS c
    FROM (
      SELECT a.cluster_id, p.pos, vv.vq[p.pos] AS v
      FROM {prev_assign} a JOIN vq vv USING (vec_id),
           (SELECT unnest(generate_series(1, {_KM_DIM})) AS pos) p)
    GROUP BY cluster_id, pos
  ),
  {name} AS (
    SELECT cluster_id, list(c ORDER BY pos) AS cq
    FROM {name}_u GROUP BY cluster_id
  )"""

    parts = [f"""
  vq AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> floor(x::DOUBLE * {float(KMEANS_SCALE)!r})
                               ::BIGINT) AS vq
    FROM embeddings
  ),
  c0 AS (
    SELECT vec_id::BIGINT AS cluster_id, vq AS cq
    FROM vq ORDER BY vec_id LIMIT {_KM_K}
  )""", assign("a0", "c0")]
    for t in range(1, _KM_ITERS + 1):
        parts.append(update(f"c{t}", f"a{t - 1}"))
        parts.append(assign(f"a{t}", f"c{t}"))
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT vec_id, cluster_id::BIGINT AS cluster_id, dist::BIGINT AS dist_q
  FROM a{_KM_ITERS}
"""

# ---------------------------------------------------------------------------
# kNN label vote (embedding-quality eval) + k-means inertia
# ---------------------------------------------------------------------------

_KNN_VOTE_K = 5


def q_knn_label_vote(spark, sf_dir):
    """kNN majority-vote classification over the LSH kNN self-join —
    the neighbor-label-purity eval for embedding quality."""
    from ..operators.similarity import knn_label_vote
    return knn_label_vote(_t(spark, sf_dir, "embeddings"), k=_KNN_VOTE_K)


def _oracle_knn_vote() -> str:
    from ..operators.similarity import hyperplanes
    from .queries import _DOT_SQL
    planes = hyperplanes(8, 64)
    bits = " || ".join(
        "(CASE WHEN " + _DOT_SQL.format(
            a="embedding",
            b=f"[{', '.join(repr(c) for c in plane)}]::DOUBLE[]")
        + " >= 0 THEN '1' ELSE '0' END)"
        for plane in planes)
    return f"""
  WITH b AS (SELECT vec_id, label, embedding, ({bits}) AS bucket
             FROM embeddings),
  pairs AS (
    SELECT a.vec_id AS vec_id_a, c.vec_id AS vec_id_b, c.label AS nbr_label,
           floor({_DOT_SQL.format(a='a.embedding', b='c.embedding')}
             / (sqrt({_DOT_SQL.format(a='a.embedding', b='a.embedding')})
                * sqrt({_DOT_SQL.format(a='c.embedding', b='c.embedding')}))
             * 1000000)::BIGINT AS sim_e6
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id <> c.vec_id
  ),
  nn AS (
    SELECT vec_id_a, nbr_label FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id_a
                                   ORDER BY sim_e6 DESC, vec_id_b ASC)
                 AS rnk
      FROM pairs) WHERE rnk <= {_KNN_VOTE_K}
  ),
  votes AS (
    SELECT vec_id_a, nbr_label, count(*)::BIGINT AS n_votes
    FROM nn GROUP BY vec_id_a, nbr_label
  ),
  best AS (
    SELECT vec_id_a, nbr_label AS pred_label, n_votes FROM (
      SELECT *, row_number() OVER (PARTITION BY vec_id_a
                                   ORDER BY n_votes DESC, nbr_label ASC)
                 AS rn
      FROM votes) WHERE rn = 1
  )
  SELECT b.vec_id, best.pred_label::BIGINT AS pred_label,
         best.n_votes, b.label::BIGINT AS true_label,
         (CASE WHEN best.pred_label = b.label THEN 1 ELSE 0 END)::BIGINT
           AS correct
  FROM best JOIN b ON b.vec_id = best.vec_id_a
"""


def q_kmeans_inertia(spark, sf_dir):
    """Per-cluster quality rollup of the k-means assignment: member
    count and total squared distance (inertia) — exact BIGINTs, a pure
    reuse of the kmeans_clusters plan plus one tiny agg."""
    a = q_kmeans_clusters(spark, sf_dir)
    return (a.groupBy("cluster_id")
            .agg(F.count("*").cast("long").alias("n_members"),
                 F.sum("dist_q").cast("long").alias("inertia_q")))


def _oracle_kmeans_inertia() -> str:
    inner = _kmeans_oracle()
    return f"""
  SELECT cluster_id, count(*)::BIGINT AS n_members,
         sum(dist_q)::BIGINT AS inertia_q
  FROM ({inner}) GROUP BY cluster_id
"""


# ---------------------------------------------------------------------------
# SCD2 dimension history
# ---------------------------------------------------------------------------


def q_scd2_event_type_history(spark, sf_dir):
    """Type-2 SCD build over the event stream: one validity interval
    per run of consecutive equal event_type values per user — the
    queryable-history counterpart of the reference's destructive
    keep-last upsert (consumer2.py)."""
    return scd2_history(_t(spark, sf_dir, "events"),
                        key_col="user_id", attr_col="event_type",
                        ts_col="ts", tiebreak_col="event_id")


ORACLE_SCD2 = """
  WITH ch AS (
    SELECT user_id, event_type, ts, event_id,
           CASE WHEN lag(event_type) OVER w IS NULL
                  OR event_type <> lag(event_type) OVER w
                THEN 1 ELSE 0 END AS chg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  ),
  runs AS (
    SELECT *, sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS version
    FROM ch
  ),
  spans AS (
    SELECT user_id, version, min(event_type) AS event_type,
           min(ts) AS valid_from, count(*) AS n_events
    FROM runs GROUP BY user_id, version
  )
  SELECT user_id, version::BIGINT AS version, event_type, valid_from,
         lead(valid_from) OVER w2 AS valid_to,
         n_events::BIGINT AS n_events,
         (CASE WHEN lead(valid_from) OVER w2 IS NULL
               THEN 1 ELSE 0 END)::BIGINT AS is_current
  FROM spans
  WINDOW w2 AS (PARTITION BY user_id ORDER BY version)
"""

# ---------------------------------------------------------------------------
# Exact-integer anomaly detection
# ---------------------------------------------------------------------------


def q_value_outliers_per_user(spark, sf_dir):
    """3σ outliers of events.value per user — the cross-multiplied
    integer z-score test (no division/sqrt/FP mean anywhere)."""
    from ..operators.aggregations import value_outliers
    return value_outliers(_t(spark, sf_dir, "events"),
                          key_col="user_id", val_col="value",
                          id_col="event_id")


ORACLE_VALUE_OUTLIERS = """
  WITH rows AS (
    SELECT event_id, user_id, floor(value * 100)::BIGINT AS q
    FROM events
  ),
  mom AS (
    SELECT user_id, count(*)::BIGINT AS n, sum(q)::BIGINT AS s,
           sum(q * q)::BIGINT AS s2
    FROM rows GROUP BY user_id
  )
  SELECT r.event_id, r.user_id, r.q AS val_q, m.n AS n_group,
         1::BIGINT AS is_outlier
  FROM rows r JOIN mom m USING (user_id)
  WHERE (m.n * r.q - m.s) * (m.n * r.q - m.s)
        > 9 * (m.n * m.s2 - m.s * m.s)
"""


# ---------------------------------------------------------------------------
# Equi-width value histogram
# ---------------------------------------------------------------------------

_H_LO, _H_HI, _H_BINS = 0.0, 500.0, 10


def q_events_value_histogram(spark, sf_dir):
    """Equi-width histogram of events.value with explicit
    under/overflow bins; min/max pass through untouched (no FP sums)."""
    return value_histogram(_t(spark, sf_dir, "events"), "value",
                           _H_LO, _H_HI, _H_BINS)


ORACLE_VALUE_HISTOGRAM = f"""
  WITH b AS (
    SELECT CASE WHEN value < {_H_LO!r} THEN -1
                WHEN value >= {_H_HI!r} THEN {_H_BINS}
                ELSE least(floor((value - {_H_LO!r})
                                 / {(_H_HI - _H_LO) / _H_BINS!r}),
                           {_H_BINS - 1})
           END::BIGINT AS bin,
           value
    FROM events
  )
  SELECT bin, count(*)::BIGINT AS n,
         min(value) AS bin_min, max(value) AS bin_max
  FROM b GROUP BY bin
"""


# ---------------------------------------------------------------------------
# Token entropy (information-density quality signal)
# ---------------------------------------------------------------------------


def q_text_token_entropy(spark, sf_dir):
    """Shannon entropy of each doc's token distribution — zero-shuffle
    array math; the Σ p·log2 p folds over sorted distinct terms
    SEQUENTIALLY, so the double accumulation order is fixed and the
    oracle (list_reduce over the same sorted order) matches bit-exact."""
    from ..operators.text import token_entropy
    return token_entropy(_t(spark, sf_dir, "documents"))


ORACLE_TOKEN_ENTROPY = r"""
  WITH words AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  tc AS (
    SELECT doc_id, term, count(*)::BIGINT AS c
    FROM (SELECT doc_id, unnest(w) AS term FROM words)
    GROUP BY doc_id, term
  ),
  lists AS (
    SELECT doc_id, list(c ORDER BY term) AS cs FROM tc GROUP BY doc_id
  )
  SELECT w.doc_id,
         len(w.w)::BIGINT AS n_tokens,
         coalesce(len(l.cs), 0)::BIGINT AS n_distinct,
         (CASE WHEN len(w.w) > 0 THEN
            floor(list_reduce(
              list_transform(l.cs, c ->
                -((c::DOUBLE / len(w.w)) * log2(c::DOUBLE / len(w.w)))),
              (a, b) -> a + b) * 1000000)
          ELSE 0 END)::BIGINT AS entropy_e6
  FROM words w LEFT JOIN lists l ON w.doc_id = l.doc_id
"""


# ---------------------------------------------------------------------------
# Sparse TF-IDF cosine pairs
# ---------------------------------------------------------------------------

_SPARSE_MIN_SIM = 850_000
# stop-term df cap: terms in > 10% of the corpus are pruned from the
# inverted index (norms recomputed post-cap on both engines). Without
# this the index self-join is O(Sigma df^2) ~ n^2 on ubiquitous terms —
# measured 123 s at sf0.1 vs ~2 s capped (the r5 heavy-tail sweep).
_SPARSE_MAX_DF_PCT = 10


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Sparse TF-IDF cosine all-pairs ≥ 0.85 via the inverted index —
    BIGINT dots/norms, one sqrt+division per surviving pair; corpus-
    proportional stop-term cap (df ≤ 10% of docs) bounds the
    inverted-index self-join."""
    from ..operators.text import tfidf_sparse_pairs
    return tfidf_sparse_pairs(_t(spark, sf_dir, "documents"),
                              min_sim_e6=_SPARSE_MIN_SIM,
                              max_df_pct=_SPARSE_MAX_DF_PCT)


ORACLE_TFIDF_COSINE = rf"""
  WITH toks AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(lower(text), '\s+'),
                              t -> t <> '')) AS term
    FROM documents
  ),
  tf AS (SELECT doc_id, term, count(*) AS tf
         FROM toks GROUP BY doc_id, term),
  dfq AS (SELECT term, count(*) AS df FROM tf GROUP BY term
          HAVING count(*) * 100
                 <= {_SPARSE_MAX_DF_PCT} * (SELECT count(*) FROM documents)),
  n AS (SELECT count(*)::BIGINT AS n_docs FROM documents),
  w AS (
    SELECT doc_id, term,
           (tf * floor(ln(n_docs::DOUBLE / df) * 1000)::BIGINT) AS w
    FROM tf JOIN dfq USING (term), n
  ),
  norms AS (SELECT doc_id, sum(w * w)::BIGINT AS sq FROM w GROUP BY doc_id),
  dots AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           sum(a.w * b.w)::BIGINT AS dot
    FROM w a JOIN w b USING (term)
    WHERE a.doc_id < b.doc_id GROUP BY 1, 2
  )
  SELECT doc_a, doc_b,
         floor(dot::DOUBLE
               / (sqrt(na.sq::DOUBLE) * sqrt(nb.sq::DOUBLE))
               * 1000000)::BIGINT AS sim_e6
  FROM dots JOIN norms na ON na.doc_id = doc_a
            JOIN norms nb ON nb.doc_id = doc_b
  WHERE floor(dot::DOUBLE
              / (sqrt(na.sq::DOUBLE) * sqrt(nb.sq::DOUBLE))
              * 1000000) >= {_SPARSE_MIN_SIM}
"""


# ---------------------------------------------------------------------------
# PageRank (exact-integer damping), supplier↔customer trade graph
# ---------------------------------------------------------------------------

_PR_ITERS = 3


def q_pagerank_trade_graph(spark, sf_dir):
    """PageRank over the bipartite supplier↔customer trade graph,
    3 exact-integer iterations (damping 17/20 on a 1e9 BIGINT grid) —
    deterministic across engines and partial-agg merge orders."""
    from ..operators.graph import pagerank, supplier_customer_edges
    edges = supplier_customer_edges(_t(spark, sf_dir, "lineitem"),
                                    _t(spark, sf_dir, "orders"))
    return pagerank(edges, iters=_PR_ITERS)


def _pagerank_oracle() -> str:
    from ..operators.graph import PR_SCALE, _D_DEN, _D_NUM
    base = (3 * PR_SCALE) // _D_DEN
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
  r0 AS (SELECT node, {PR_SCALE}::BIGINT AS r FROM nodes)"""]
    for t in range(_PR_ITERS):
        parts.append(f"""
  c{t} AS (
    SELECT o.src AS u, (r.r // o.deg)::BIGINT AS c
    FROM r{t} r JOIN outdeg o ON r.node = o.src
  ),
  i{t} AS (
    SELECT e.dst AS dst, sum(c.c)::BIGINT AS s
    FROM e JOIN c{t} c ON e.src = c.u GROUP BY e.dst
  ),
  r{t + 1} AS (
    SELECT n.node,
           ({base} + (coalesce(i.s, 0) * {_D_NUM}) // {_D_DEN})::BIGINT
             AS r
    FROM nodes n LEFT JOIN i{t} i ON n.node = i.dst
  )""")
    ctes = ",".join(parts)
    return f"""
  WITH {ctes}
  SELECT node, r AS rank_e9 FROM r{_PR_ITERS}
"""


# ---------------------------------------------------------------------------
# Triangle counting (degree-ordered node-iterator)
# ---------------------------------------------------------------------------


def q_triangle_count_copurchase(spark, sf_dir):
    """Per-node exact triangle counts on the part co-purchase graph
    (parts sharing an order) — degree-ordered orientation bounds the
    wedge fan-out at O(√|E|) per vertex."""
    from ..operators.graph import copurchase_edges, triangle_count
    return triangle_count(copurchase_edges(_t(spark, sf_dir, "lineitem")))


ORACLE_TRIANGLES = """
  WITH e0 AS (
    SELECT DISTINCT a.l_partkey AS pa, b.l_partkey AS pb
    FROM lineitem a JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  ),
  deg AS (
    SELECT n, count(*)::BIGINT AS d FROM (
      SELECT pa AS n FROM e0 UNION ALL SELECT pb FROM e0)
    GROUP BY n
  ),
  o AS (
    SELECT CASE WHEN (dx.d < dy.d) OR (dx.d = dy.d AND pa < pb)
                THEN pa ELSE pb END AS lo,
           CASE WHEN (dx.d < dy.d) OR (dx.d = dy.d AND pa < pb)
                THEN pb ELSE pa END AS hi
    FROM e0 JOIN deg dx ON dx.n = pa JOIN deg dy ON dy.n = pb
  ),
  w AS (
    SELECT w1.lo AS c, w1.hi AS u, w2.hi AS v
    FROM o w1 JOIN o w2 ON w1.lo = w2.lo AND w1.hi < w2.hi
  ),
  t AS (SELECT c, u, v FROM w JOIN e0 ON e0.pa = u AND e0.pb = v)
  SELECT node, count(*)::BIGINT AS n_triangles FROM (
    SELECT c AS node FROM t
    UNION ALL SELECT u FROM t
    UNION ALL SELECT v FROM t)
  GROUP BY node
"""


# ---------------------------------------------------------------------------
# Custom Python Data Source scan (Spark 4 connector API)
# ---------------------------------------------------------------------------


def q_pyds_customer_scan(spark, sf_dir):
    """Read customer through the custom ``fixture_replay`` Python data
    source (one task per parquet row group, Arrow batches) and roll up
    per market segment — value parity with the plain parquet view
    proves the connector round-trips the table exactly. Account
    balances are summed as exact cents (BIGINT), not FP doubles."""
    from ..sources import register_fixture_replay
    register_fixture_replay(spark)
    df = (spark.read.format("fixture_replay")
          .option("path", f"{sf_dir}/customer.parquet").load())
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (df.select("c_mktsegment", cents.alias("__c"))
              .groupBy("c_mktsegment")
              .agg(F.count("*").alias("n_customers"),
                   F.sum("__c").alias("acctbal_cents"))
              .select("c_mktsegment",
                      F.col("n_customers").cast("long"),
                      F.col("acctbal_cents").cast("long")))


ORACLE_PYDS_SCAN = """
  SELECT c_mktsegment,
         count(*)::BIGINT AS n_customers,
         sum(round(c_acctbal * 100)::BIGINT)::BIGINT AS acctbal_cents
  FROM customer GROUP BY c_mktsegment
"""


QUERIES_ANALYTICS_MORE: dict[str, QuerySpec] = {
    "text_token_entropy": QuerySpec(
        q_text_token_entropy, ORACLE_TOKEN_ENTROPY,
        doc="token-distribution Shannon entropy (zero-shuffle, "
            "sequential sorted fold — deterministic doubles)"),
    "tfidf_cosine_pairs": QuerySpec(
        q_tfidf_cosine_pairs, ORACLE_TFIDF_COSINE, headline=True,
        doc="sparse TF-IDF cosine all-pairs via inverted index "
            "(BIGINT dots/norms, df-cap scale guard)"),
    "triangle_count_copurchase": QuerySpec(
        q_triangle_count_copurchase, ORACLE_TRIANGLES, headline=True,
        doc="per-node triangle counts, degree-ordered orientation "
            "(bounded wedge fan-out)"),
    "pagerank_trade_graph": QuerySpec(
        q_pagerank_trade_graph, _pagerank_oracle(), headline=True,
        doc="PageRank on the supplier↔customer trade graph "
            "(exact 17/20 damping on a 1e9 BIGINT grid)"),
    "pyds_customer_scan": QuerySpec(
        q_pyds_customer_scan, ORACLE_PYDS_SCAN,
        doc="custom Python Data Source connector scan (Spark 4 API, "
            "row-group partitions, Arrow batches)"),
    "span_dedup_stats": QuerySpec(
        q_span_dedup_stats, ORACLE_SPAN_DEDUP, headline=True,
        doc="substring-level exact dedup: duplicated n-token spans + "
            "covered-token interval union (Lee et al. 2021)"),
    "bm25_search_topk": QuerySpec(
        q_bm25_search_topk, _bm25_oracle(), headline=True,
        doc="BM25 top-k retrieval (zero-explode tf, broadcast stats, "
            "fixed-order score chain)"),
    "kmeans_clusters": QuerySpec(
        q_kmeans_clusters, _kmeans_oracle(), headline=True,
        doc="Lloyd's k-means on the exact 2^20 integer grid "
            "(broadcast centroids, deterministic seeds)"),
    "knn_label_vote": QuerySpec(
        q_knn_label_vote, _oracle_knn_vote(),
        doc="kNN majority-vote label eval over the LSH kNN join "
            "(neighbor label purity)"),
    "kmeans_inertia": QuerySpec(
        q_kmeans_inertia, _oracle_kmeans_inertia(),
        doc="per-cluster k-means inertia rollup (exact BIGINT)"),
    "scd2_event_type_history": QuerySpec(
        q_scd2_event_type_history, ORACLE_SCD2,
        doc="SCD2 dimension history build (single key shuffle, "
            "run-collapse windows)"),
    "value_outliers_per_user": QuerySpec(
        q_value_outliers_per_user, ORACLE_VALUE_OUTLIERS,
        doc="per-group 3-sigma outliers via cross-multiplied integer "
            "z-score (no FP moments)"),
    "events_value_histogram": QuerySpec(
        q_events_value_histogram, ORACLE_VALUE_HISTOGRAM,
        doc="equi-width histogram with under/overflow bins "
            "(map-side combine, tiny shuffle)"),
}
