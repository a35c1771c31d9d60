"""Round-3c curation extension queries: Gopher rule filter, SemDeDup
semantic deduplication, and CCNet-style perplexity bucketing.

Same cross-engine exactness rules as ``queries.py``: integer
cross-multiplied ratio comparisons, floor-scaled e6 fixed-point for
anything that touches a double, and deterministic lowest-id keeper /
tie-break rules shared with the other dedup families.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalar import stable_hash64, stable_hash64_sql
from ..operators import text
from ..operators.similarity import semantic_dedup
from ..operators.text import (
    GOPHER_MAX_MWL_X10, GOPHER_MAX_WORDS, GOPHER_MIN_ALPHA_PCT,
    GOPHER_MIN_MWL_X10, GOPHER_MIN_STOP_HITS, GOPHER_MIN_WORDS,
    LANG_STOPWORDS, gopher_rules)
from .spec import QuerySpec, _t

# ---------------------------------------------------------------------------
# Gopher document-quality rules (Rae et al. 2021)
# ---------------------------------------------------------------------------


def q_gopher_quality_filter(spark, sf_dir):
    """Composite Gopher rule filter over the documents table — raw
    counters, one 0/1 flag per rule, and the overall conjunction."""
    return gopher_rules(_t(spark, sf_dir, "documents"))


def _oracle_gopher() -> str:
    stop = ", ".join(f"'{w}'" for w in LANG_STOPWORDS["en"])
    return rf"""
  WITH w AS (
    SELECT doc_id,
           list_filter(string_split_regex(lower(text), '\s+'),
                       t -> t <> '') AS w
    FROM documents
  ),
  c AS (
    SELECT doc_id, len(w)::BIGINT AS n_words,
           coalesce(list_sum(list_transform(w, t -> length(t))), 0)::BIGINT
             AS tot_chars,
           len(list_filter(w, t -> regexp_matches(t, '[a-z]')))::BIGINT
             AS n_alpha,
           len(list_filter(w, t -> t IN ({stop})))::BIGINT AS stop_hits
    FROM w
  )
  SELECT doc_id, n_words, tot_chars, n_alpha, stop_hits,
         (CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                AND n_words <= {GOPHER_MAX_WORDS}
               THEN 1 ELSE 0 END)::BIGINT AS r_word_count,
         (CASE WHEN tot_chars * 10 >= {GOPHER_MIN_MWL_X10} * n_words
                AND tot_chars * 10 <= {GOPHER_MAX_MWL_X10} * n_words
                AND n_words > 0
               THEN 1 ELSE 0 END)::BIGINT AS r_mean_word_len,
         (CASE WHEN n_alpha * 100 >= {GOPHER_MIN_ALPHA_PCT} * n_words
                AND n_words > 0
               THEN 1 ELSE 0 END)::BIGINT AS r_alpha_frac,
         (CASE WHEN stop_hits >= {GOPHER_MIN_STOP_HITS}
               THEN 1 ELSE 0 END)::BIGINT AS r_stopwords,
         (CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                AND n_words <= {GOPHER_MAX_WORDS}
                AND tot_chars * 10 >= {GOPHER_MIN_MWL_X10} * n_words
                AND tot_chars * 10 <= {GOPHER_MAX_MWL_X10} * n_words
                AND n_alpha * 100 >= {GOPHER_MIN_ALPHA_PCT} * n_words
                AND n_words > 0
                AND stop_hits >= {GOPHER_MIN_STOP_HITS}
               THEN 1 ELSE 0 END)::BIGINT AS passes
  FROM c
"""


# ---------------------------------------------------------------------------
# SemDeDup: k-means clusters + within-cluster cosine pruning
# ---------------------------------------------------------------------------

# Fixture embeddings are synthetic (max pairwise cosine ~0.51), so the
# fixture threshold sits where it actually prunes; production SemDeDup
# runs 0.95+ on web-corpus embeddings — the operator parameter.
_SEMDEDUP_SIM_E6 = 300_000


def q_semantic_dedup(spark, sf_dir):
    """SemDeDup over the embeddings table: k-means (2 rounds, exact
    integer grid) then greedy lowest-id keeper within each cluster at
    cosine >= 0.30 (fixture-tuned threshold). k is the production
    auto-scaling default (max(8, ceil(n/target)) — VERDICT r3 #5);
    at every fixture SF (<= 2000 vectors) it resolves to 8, matching
    the oracle's k=8 k-means exactly while exercising the
    corpus-proportional path the 100 TB run needs."""
    return semantic_dedup(_t(spark, sf_dir, "embeddings"),
                          k=None, iters=2, min_sim_e6=_SEMDEDUP_SIM_E6)


def _oracle_semdedup() -> str:
    from .analytics_more import _kmeans_oracle
    from .queries import _DOT_SQL
    dot_ab = _DOT_SQL.format(a="a.embedding", b="b.embedding")
    dot_aa = _DOT_SQL.format(a="a.embedding", b="a.embedding")
    dot_bb = _DOT_SQL.format(a="b.embedding", b="b.embedding")
    return f"""
  WITH m AS (
    SELECT km.vec_id, km.cluster_id, e.embedding
    FROM ({_kmeans_oracle()}) km JOIN embeddings e USING (vec_id)
  ),
  losers AS (
    SELECT DISTINCT b.vec_id
    FROM m a JOIN m b
      ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
    WHERE sqrt({dot_aa}) * sqrt({dot_bb}) > 0
      AND floor({dot_ab} / (sqrt({dot_aa}) * sqrt({dot_bb}))
                * 1000000)::BIGINT >= {_SEMDEDUP_SIM_E6}
  )
  SELECT m.vec_id, m.cluster_id,
         (CASE WHEN l.vec_id IS NULL THEN 1 ELSE 0 END)::BIGINT AS is_kept
  FROM m LEFT JOIN losers l ON m.vec_id = l.vec_id
"""


# ---------------------------------------------------------------------------
# CCNet perplexity buckets (head / middle / tail)
# ---------------------------------------------------------------------------


def q_ccnet_perplexity_buckets(spark, sf_dir):
    """CCNet-style corpus partition by LM quality (Wenzek et al. 2019):
    bucket each document into head/middle/tail by its unigram
    log-probability quartiles (head = top quarter = most fluent).

    Exactness: the cutoffs are ``floor(percentile(logprob_e6, p))``
    with p in {0.25, 0.75} — exact binary fractions over BIGINT
    inputs, so the (n-1)*p index and the a + g*(b-a) interpolation are
    both exact in IEEE double on every engine; the floor lands on the
    same BIGINT everywhere.

    Scale shape: NO global sort — the cutoffs are one 1-row aggregate
    broadcast back over the corpus (at 100 TB swap the exact
    percentile for approx_percentile; the bucket join is unchanged).
    Token-less documents get their own 'empty' bucket rather than
    polluting 'tail'.
    """
    lp = text.unigram_logprob(_t(spark, sf_dir, "documents"))
    cut = (lp.where(F.col("n_tokens") > 0)
             .agg(F.floor(F.percentile("logprob_e6", F.lit(0.25)))
                   .cast("long").alias("c25"),
                  F.floor(F.percentile("logprob_e6", F.lit(0.75)))
                   .cast("long").alias("c75")))
    bucket = (F.when(F.col("n_tokens") == 0, F.lit("empty"))
               .when(F.col("logprob_e6") >= F.col("c75"), F.lit("head"))
               .when(F.col("logprob_e6") < F.col("c25"), F.lit("tail"))
               .otherwise(F.lit("middle")))
    return (lp.crossJoin(F.broadcast(cut))
              .select("doc_id", "n_tokens", "logprob_e6",
                      bucket.alias("ppl_bucket")))


def _oracle_ccnet() -> str:
    from .queries import ORACLE_UNIGRAM_LOGPROB
    return f"""
  WITH lp AS ({ORACLE_UNIGRAM_LOGPROB}),
  cut AS (
    SELECT floor(quantile_cont(logprob_e6, 0.25))::BIGINT AS c25,
           floor(quantile_cont(logprob_e6, 0.75))::BIGINT AS c75
    FROM lp WHERE n_tokens > 0
  )
  SELECT doc_id, n_tokens, logprob_e6,
         (CASE WHEN n_tokens = 0 THEN 'empty'
               WHEN logprob_e6 >= c75 THEN 'head'
               WHEN logprob_e6 < c25 THEN 'tail'
               ELSE 'middle' END) AS ppl_bucket
  FROM lp, cut
"""


QUERIES_CURATION3: dict[str, QuerySpec] = {
    "gopher_quality_filter": QuerySpec(
        q_gopher_quality_filter, _oracle_gopher(),
        doc="Gopher composite quality rules (integer cross-multiplied "
            "ratios, zero shuffles)"),
    "semantic_dedup": QuerySpec(
        q_semantic_dedup, _oracle_semdedup(), headline=True,
        doc="SemDeDup: k-means clusters + within-cluster cosine "
            "lowest-id keeper (arXiv:2303.09540)"),
    "ccnet_perplexity_buckets": QuerySpec(
        q_ccnet_perplexity_buckets, _oracle_ccnet(),
        doc="CCNet head/middle/tail corpus partition by unigram "
            "log-prob quartiles (broadcast cutoffs, no global sort)"),
}


# ---------------------------------------------------------------------------
# BPE merge round 1: most frequent adjacent character pairs
# ---------------------------------------------------------------------------

_BPE_TOPK = 20


def q_bpe_top_merges(spark, sf_dir):
    """The first merge round of BPE tokenizer training (Sennrich et
    al. 2016): count adjacent character pairs across the corpus,
    weighted by word frequency, and return the top-20 merge
    candidates.

    Scale shape: the wide token explode collapses into the VOCABULARY
    first (one hash agg — vocab is tiny next to the corpus), so the
    per-word pair explode runs over |vocab| rows, not |corpus| rows;
    the final top-k is TakeOrderedAndProject, never a global sort.
    This per-word-frequency factoring is exactly how production BPE
    trainers make merge counting tractable.
    """
    docs = _t(spark, sf_dir, "documents")
    vocab = (docs.select(F.explode(text.tokens("text")).alias("term"))
                 .groupBy("term").agg(F.count("*").alias("tf")))
    # substring with a dynamic start position needs the expr form
    # (F.substring takes a literal pos only)
    pairs = (vocab.where(F.length("term") >= 2)
                  .select("tf", F.explode(F.expr(
                      "transform(sequence(1, length(term) - 1), "
                      "i -> substring(term, i, 2))")).alias("pair")))
    return (pairs.groupBy("pair")
                 .agg(F.sum("tf").cast("long").alias("n_merges"))
                 .orderBy(F.desc("n_merges"), F.asc("pair"))
                 .limit(_BPE_TOPK))


ORACLE_BPE = rf"""
  WITH vocab AS (
    SELECT term, count(*)::BIGINT AS tf FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                t -> t <> '')) AS term
      FROM documents)
    GROUP BY term
  ),
  pairs AS (
    SELECT tf, unnest(list_transform(generate_series(1, length(term) - 1),
                                     i -> substring(term, i, 2))) AS pair
    FROM vocab WHERE length(term) >= 2
  )
  SELECT pair, sum(tf)::BIGINT AS n_merges
  FROM pairs GROUP BY pair
  ORDER BY n_merges DESC, pair ASC LIMIT {_BPE_TOPK}
"""


# ---------------------------------------------------------------------------
# Tukey-fence price outliers (exact quartile arithmetic)
# ---------------------------------------------------------------------------


def q_tukey_outlier_events(spark, sf_dir):
    """Classical Tukey-fence outlier detection over event values:
    flag events outside [Q1 - 1.5·IQR, Q3 + 1.5·IQR] (the events
    stream carries a heavy tail; order totals are near-uniform and
    produce none — verified against the fixtures).

    Exactness: prices quantize to integer cents first, then the
    quartiles interpolate with g in {0, .25, .5, .75} over BIGINTs —
    exact IEEE doubles on every engine (same argument as the CCNet
    cutoffs); the 1.5·IQR fence multiplies an exact double by 1.5
    (exact) so the comparison is deterministic. Returns only the
    outlier rows plus their distance above/below the fence, ordered
    output not required (the driver hash is order-insensitive).

    Scale shape: one 1-row quartile aggregate broadcast back over the
    scan — no global sort, no window.
    """
    events = _t(spark, sf_dir, "events")
    cents = (events.where(F.col("value").isNotNull())
                   .select("event_id",
                           F.floor(F.col("value") * 100).cast("long")
                            .alias("price_c")))
    cut = cents.agg(
        F.percentile("price_c", F.lit(0.25)).alias("q1"),
        F.percentile("price_c", F.lit(0.75)).alias("q3"))
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    return (cents.crossJoin(F.broadcast(cut))
                 .where((F.col("price_c") < lo) | (F.col("price_c") > hi))
                 .select("event_id", "price_c",
                         F.floor(lo).cast("long").alias("lo_fence_c"),
                         F.floor(hi).cast("long").alias("hi_fence_c")))


ORACLE_TUKEY = """
  WITH cents AS (
    SELECT event_id, floor(value * 100)::BIGINT AS price_c
    FROM events WHERE value IS NOT NULL
  ),
  cut AS (
    SELECT quantile_cont(price_c, 0.25) AS q1,
           quantile_cont(price_c, 0.75) AS q3
    FROM cents
  )
  SELECT event_id, price_c,
         floor(q1 - 1.5 * (q3 - q1))::BIGINT AS lo_fence_c,
         floor(q3 + 1.5 * (q3 - q1))::BIGINT AS hi_fence_c
  FROM cents, cut
  WHERE price_c < q1 - 1.5 * (q3 - q1)
     OR price_c > q3 + 1.5 * (q3 - q1)
"""


QUERIES_CURATION3.update({
    "bpe_top_merges": QuerySpec(
        q_bpe_top_merges, ORACLE_BPE,
        doc="BPE merge round 1: top adjacent char pairs, "
            "vocabulary-factored counting (Sennrich et al. 2016)"),
    "tukey_outlier_events": QuerySpec(
        q_tukey_outlier_events, ORACLE_TUKEY,
        doc="Tukey-fence event-value outliers (exact quartile cents, "
            "broadcast cutoffs)"),
})


# ---------------------------------------------------------------------------
# Event-flow analytics: funnel + retention (operators/eventflow.py)
# ---------------------------------------------------------------------------


def q_event_funnel(spark, sf_dir):
    """Time-boxed view→click→purchase conversion funnel (1-day
    windows) — one user_id exchange serves the whole stage chain."""
    from ..operators.eventflow import event_funnel
    return event_funnel(_t(spark, sf_dir, "events"))


ORACLE_FUNNEL = """
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
  staged AS (
    SELECT (CASE WHEN t2 IS NOT NULL THEN 3
                 WHEN t1 IS NOT NULL THEN 2
                 WHEN t0 IS NOT NULL THEN 1
                 ELSE 0 END)::BIGINT AS funnel_stage
    FROM s1 JOIN s2 USING (u) JOIN s3 USING (u)
  ),
  counts AS (
    SELECT funnel_stage, count(*)::BIGINT AS n_users
    FROM staged GROUP BY funnel_stage
  )
  SELECT funnel_stage, n_users,
         floor(n_users * 1000000
               / (SELECT sum(n_users) FROM counts))::BIGINT AS share_e6
  FROM counts
"""


def q_retention_cohorts(spark, sf_dir):
    """Daily retention triangle: (first-event-day cohort, day offset,
    distinct active users) — pure BIGINT day arithmetic."""
    from ..operators.eventflow import retention_cohorts
    return retention_cohorts(_t(spark, sf_dir, "events"))


ORACLE_RETENTION = """
  WITH e AS (
    SELECT user_id AS u, floor(epoch(ts) / 86400)::BIGINT AS day
    FROM events
  ),
  cohorts AS (
    SELECT u, day, min(day) OVER (PARTITION BY u) AS cohort_day FROM e
  )
  SELECT cohort_day, day - cohort_day AS day_offset,
         count(*)::BIGINT AS n_active_users
  FROM (SELECT DISTINCT u, cohort_day, day FROM cohorts)
  GROUP BY cohort_day, day_offset
"""


QUERIES_CURATION3.update({
    "event_funnel": QuerySpec(
        q_event_funnel, ORACLE_FUNNEL,
        doc="time-boxed ordered conversion funnel (single user "
            "exchange, windowed stage chain)"),
    "retention_cohorts": QuerySpec(
        q_retention_cohorts, ORACLE_RETENTION,
        doc="daily retention cohort triangle (BIGINT day arithmetic, "
            "map-side user-day dedup)"),
})


# ---------------------------------------------------------------------------
# Deterministic HLL sketch (operators/sketches.py)
# ---------------------------------------------------------------------------


def q_hll_orderkeys(spark, sf_dir):
    """Deterministic HyperLogLog over lineitem.l_orderkey: unlike the
    engine-native approx_count_distinct (rows-only check), every
    register of this sketch is value-hash verified cross-engine."""
    from ..operators.sketches import hll_sketch
    return hll_sketch(_t(spark, sf_dir, "lineitem"), "l_orderkey")


def _oracle_hll() -> str:
    from ..operators.sketches import hll_sketch_oracle
    return hll_sketch_oracle("lineitem", "l_orderkey")


QUERIES_CURATION3.update({
    "hll_distinct_orderkeys": QuerySpec(
        q_hll_orderkeys, _oracle_hll(),
        doc="deterministic HLL (m=256, shared stable_hash64): "
            "register-exact cross-engine, estimate asserted vs exact"),
})


# ---------------------------------------------------------------------------
# Pearson correlation via exact integer moments
# ---------------------------------------------------------------------------


def q_pearson_qty_price(spark, sf_dir):
    """Per-returnflag Pearson correlation of quantity vs extended
    price, the moment way: the five sums accumulate EXACTLY (integer
    inputs summed as decimal(38,0) / HUGEINT — no FP merge-order
    nondeterminism in any aggregate), and only the final closed-form
    combination runs in double — identical IEEE ops on identical
    exact inputs on every engine, floored at e6.

    Built-in ``corr()`` is the anti-pattern here: its streaming
    co-moment updates are FP all the way down, so partial-merge order
    changes the low bits run to run. One scan, one tiny exchange
    (|groups| rows after map-side partial sums).

    Headroom: quantity <= 50 (6 bits), price cents < 2^34; at 10^12
    rows the largest moment (n·Σy²) needs ~10^38 — the decimal(38)
    cap. Beyond that, pre-center on a broadcast first-pass mean.
    """
    li = _t(spark, sf_dir, "lineitem")
    d = li.select(
        "l_returnflag",
        F.floor("l_quantity").cast("long").alias("x"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("y"))
    dec = "decimal(38,0)"
    agg = d.groupBy("l_returnflag").agg(
        F.count("*").cast(dec).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        # cast operands BEFORE the multiply: y*y in LONG overflows at
        # cents >= 2^31.5, far below the documented 2^34 headroom
        F.sum(F.col("x").cast("decimal(19,0)")
              * F.col("x").cast("decimal(19,0)")).alias("sxx"),
        F.sum(F.col("y").cast("decimal(19,0)")
              * F.col("y").cast("decimal(19,0)")).alias("syy"),
        F.sum(F.col("x").cast("decimal(19,0)")
              * F.col("y").cast("decimal(19,0)")).alias("sxy"))
    n, sx, sy = [F.col(c).cast("double") for c in ("n", "sx", "sy")]
    sxx, syy, sxy = [F.col(c).cast("double") for c in ("sxx", "syy", "sxy")]
    num = n * sxy - sx * sy
    den = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return agg.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_rows"),
        F.when(den > 0.0, F.floor(num / den * 1e6))
         .otherwise(F.lit(0)).cast("long").alias("corr_e6"))


ORACLE_PEARSON = """
  WITH d AS (
    SELECT l_returnflag,
           floor(l_quantity)::BIGINT AS x,
           floor(l_extendedprice * 100)::BIGINT AS y
    FROM lineitem
  ),
  agg AS (
    SELECT l_returnflag,
           count(*)::HUGEINT AS n,
           sum(x)::HUGEINT AS sx, sum(y)::HUGEINT AS sy,
           sum(x::HUGEINT * x::HUGEINT) AS sxx,
           sum(y::HUGEINT * y::HUGEINT) AS syy,
           sum(x::HUGEINT * y::HUGEINT) AS sxy
    FROM d GROUP BY l_returnflag
  )
  SELECT l_returnflag, n::BIGINT AS n_rows,
         (CASE WHEN (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)
                    * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE)
                    > 0.0
               THEN floor((n::DOUBLE * sxy::DOUBLE
                           - sx::DOUBLE * sy::DOUBLE)
                          / sqrt((n::DOUBLE * sxx::DOUBLE
                                  - sx::DOUBLE * sx::DOUBLE)
                                 * (n::DOUBLE * syy::DOUBLE
                                    - sy::DOUBLE * sy::DOUBLE)) * 1e6)
               ELSE 0 END)::BIGINT AS corr_e6
  FROM agg
"""


QUERIES_CURATION3.update({
    "pearson_qty_price": QuerySpec(
        q_pearson_qty_price, ORACLE_PEARSON,
        doc="Pearson correlation from exact integer moments (no FP "
            "aggregate merge-order nondeterminism)"),
})


# ---------------------------------------------------------------------------
# Deterministic count-min + Bloom (operators/sketches.py)
# ---------------------------------------------------------------------------


def q_cms_event_types(spark, sf_dir):
    """Count-min estimates vs exact counts for every event type —
    the d*w=1024-cell grid aggregates map-side; estimate >= exact is
    asserted per value in-query."""
    from ..operators.sketches import cms_counts
    return cms_counts(
        _t(spark, sf_dir, "events").where(F.col("event_type").isNotNull()),
        "event_type")


def _oracle_cms() -> str:
    from ..operators.sketches import cms_counts_oracle
    return cms_counts_oracle(
        "(SELECT * FROM events WHERE event_type IS NOT NULL)",
        "event_type")


def q_bloom_customer_orders(spark, sf_dir):
    """Deterministic Bloom filter built over orders.o_custkey, probed
    with every customer key: buyers are guaranteed maybe_present=1
    (no false negatives); non-buyers read 0 or a reproducible false
    positive. Build = one bit_or word aggregate; probe = broadcast of
    the 2048-word filter — the 100 TB serving shape."""
    from ..operators.sketches import bloom_build, bloom_probe
    words = bloom_build(_t(spark, sf_dir, "orders"), "o_custkey")
    return bloom_probe(words, _t(spark, sf_dir, "customer"), "c_custkey")


def _oracle_bloom() -> str:
    from ..operators.sketches import (BLOOM_K, BLOOM_WORD_BITS,
                                      bloom_bits_sql)
    build_bits = f"unnest({bloom_bits_sql('o_custkey::VARCHAR')})"
    probe_bits = ", ".join(
        f"({bloom_bits_sql('c_custkey::VARCHAR')})[{i + 1}] AS b{i}"
        for i in range(BLOOM_K))
    wb = BLOOM_WORD_BITS
    joins = " ".join(
        f"LEFT JOIN words w{i} ON floor(p.b{i} / {wb}) = w{i}.word_idx"
        for i in range(BLOOM_K))
    hit = " AND ".join(
        f"(coalesce(w{i}.word, 0) & (1::BIGINT << (p.b{i} % {wb})::INT))"
        " <> 0"
        for i in range(BLOOM_K))
    return f"""
  WITH bits AS (
    SELECT {build_bits} AS bit FROM orders
  ),
  words AS (
    SELECT floor(bit / {wb})::BIGINT AS word_idx,
           bit_or(1::BIGINT << (bit % {wb})::INT)::BIGINT AS word
    FROM bits GROUP BY 1
  ),
  p AS (SELECT c_custkey AS key, {probe_bits} FROM customer)
  SELECT p.key, (CASE WHEN {hit} THEN 1 ELSE 0 END)::BIGINT
           AS maybe_present
  FROM p {joins}
"""


QUERIES_CURATION3.update({
    "cms_event_type_counts": QuerySpec(
        q_cms_event_types, _oracle_cms(),
        doc="deterministic count-min sketch: per-value estimate vs "
            "exact, overestimate contract asserted in-query"),
    "bloom_customer_orders": QuerySpec(
        q_bloom_customer_orders, _oracle_bloom(),
        doc="deterministic Bloom filter build (bit_or words) + "
            "broadcast membership probe, no false negatives"),
})


def q_hll_union(spark, sf_dir):
    """Register-wise HLL merge: buyers (orders.o_custkey) union all
    customers (customer.c_custkey) — the O(m) sketch-combine path a
    1000-executor job uses, value-hash verified against the exact
    union count."""
    from ..operators.sketches import hll_union_estimate
    return hll_union_estimate(
        _t(spark, sf_dir, "orders"), "o_custkey",
        _t(spark, sf_dir, "customer"), "c_custkey")


def _oracle_hll_union() -> str:
    from ..operators.sketches import hll_union_oracle
    return hll_union_oracle("orders", "o_custkey",
                            "customer", "c_custkey")


QUERIES_CURATION3.update({
    "hll_union_custkeys": QuerySpec(
        q_hll_union, _oracle_hll_union(),
        doc="HLL register-wise merge (sketch union in O(m), not "
            "O(data)) with exact-union error contract"),
})


# ---------------------------------------------------------------------------
# Equi-depth histogram (CBO statistics shape) + table fingerprint
# ---------------------------------------------------------------------------


def q_equidepth_octiles(spark, sf_dir):
    """Equi-depth 8-bucket histogram of order totals — the statistic a
    cost-based optimizer keeps per column. Cutoffs are exact octile
    percentiles over integer cents: p = k/8 are exact binary
    fractions, so (n-1)*p and the a + g*(b-a) interpolation are exact
    IEEE doubles on every engine (g has 3 fractional bits; the
    products stay under 2^53). One 1-row aggregate broadcasts the 7
    cutoffs back over the scan; per-bucket counts confirm the depths.
    No global sort anywhere.
    """
    orders = _t(spark, sf_dir, "orders")
    cents = orders.select(
        F.floor(F.col("o_totalprice") * 100).cast("long").alias("c"))
    cut = cents.agg(*[
        F.floor(F.percentile("c", F.lit(k / 8.0))).cast("long")
         .alias(f"p{k}") for k in range(1, 8)])
    bucket = F.lit(0)
    for k in range(1, 8):
        bucket = F.when(F.col("c") >= F.col(f"p{k}"), F.lit(k)) \
                  .otherwise(bucket)
    return (cents.crossJoin(F.broadcast(cut))
                 .groupBy(bucket.alias("bucket"))
                 .agg(F.count("*").cast("long").alias("n_rows"),
                      F.min("c").alias("lo_c"), F.max("c").alias("hi_c")))


ORACLE_EQUIDEPTH = """
  WITH cents AS (
    SELECT floor(o_totalprice * 100)::BIGINT AS c FROM orders
  ),
  cut AS (
    SELECT """ + ", ".join(
    f"floor(quantile_cont(c, {k}/8.0))::BIGINT AS p{k}"
    for k in range(1, 8)) + """
    FROM cents
  )
  SELECT (CASE """ + " ".join(
    f"WHEN c >= p{k} THEN {k}" for k in range(7, 0, -1)) + """
          ELSE 0 END)::BIGINT AS bucket,
         count(*)::BIGINT AS n_rows,
         min(c)::BIGINT AS lo_c, max(c)::BIGINT AS hi_c
  FROM cents, cut
  GROUP BY 1
"""


def q_table_fingerprint(spark, sf_dir):
    """Order-independent whole-table fingerprint of orders: each row
    canonicalizes to one string, hashes through stable_hash64, and the
    fingerprint is the SUM of row hashes (mod-2^64 by natural long
    overflow is avoided by summing into decimal) plus the row count —
    the cheap cross-cluster equality check you run after replicating
    100 TB: any changed/missing/duplicated row moves the sum.

    Commutative-monoid aggregation = partial sums map-side, one tiny
    exchange; no sort, no collect.
    """
    o = _t(spark, sf_dir, "orders")
    # concat_ws SKIPS nulls (two rows differing only in which column
    # is null would collide); coalesce every column to a sentinel so
    # the canonical string is injective over null patterns
    def _c(c):
        return F.coalesce(c.cast("string"), F.lit("<null>"))
    canon = F.concat_ws(
        "|", _c(F.col("o_orderkey")), _c(F.col("o_custkey")),
        _c(F.col("o_orderstatus")),
        _c(F.floor(F.col("o_totalprice") * 100).cast("long")),
        _c(F.col("o_orderpriority")))
    return o.select(stable_hash64(canon).alias("h")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.sum(F.col("h").cast("decimal(38,0)")).cast("decimal(38,0)")
         .cast("string").alias("hash_sum"),
        F.max("h").alias("hash_max"))


ORACLE_FINGERPRINT_ORDERS = f"""
  WITH h AS (
    SELECT {stable_hash64_sql(
        "(coalesce(o_orderkey::VARCHAR, '<null>') || '|' || "
        "coalesce(o_custkey::VARCHAR, '<null>') || '|' || "
        "coalesce(o_orderstatus, '<null>') || '|' || "
        "coalesce(floor(o_totalprice * 100)::BIGINT::VARCHAR, '<null>')"
        " || '|' || coalesce(o_orderpriority, '<null>'))")} AS h
    FROM orders
  )
  SELECT count(*)::BIGINT AS n_rows,
         sum(h)::HUGEINT::VARCHAR AS hash_sum,
         max(h)::BIGINT AS hash_max
  FROM h
"""


QUERIES_CURATION3.update({
    "equidepth_octiles": QuerySpec(
        q_equidepth_octiles, ORACLE_EQUIDEPTH,
        doc="equi-depth 8-bucket histogram (CBO column statistic): "
            "exact octile cutoffs, broadcast, no global sort"),
    "table_fingerprint_orders": QuerySpec(
        q_table_fingerprint, ORACLE_FINGERPRINT_ORDERS,
        doc="order-independent table fingerprint (commutative hash "
            "sum) — the cross-cluster replication equality check"),
})
