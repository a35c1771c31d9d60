"""Round-13 extension queries: keyphrase extraction and a stratified
causal-effect estimate.

* ``rake_keyphrases`` — RAKE-lite (Rose et al. 2010): candidate
  phrases are maximal stopword-free token runs; word score =
  degree/frequency on the e6 grid; phrase score = Σ member word
  scores; top-20 multiword phrases corpus-wide.
* ``stratified_ate`` — activity-stratified treatment-effect estimate:
  purchase vs view event values compared WITHIN log2 user-activity
  bands (the confounder-adjustment pattern of propensity
  stratification, with an integer-exact stratum so no global ntile
  sort exists anywhere).

Exactness rules as ``queries.py``; the log2 band is computed via the
binary-string length trick (length(bin(n)) − 1), exact on both engines
— IEEE log2() is NOT used.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators.text import LANG_STOPWORDS, tokens
from .spec import QuerySpec, _t

QUERIES_ROUND13: dict[str, QuerySpec] = {}

_RAKE_TOPN = 20
_RAKE_STOPS = LANG_STOPWORDS["en"]
_ATE_CAP = 7


def q_rake_keyphrases(spark, sf_dir):
    """Corpus-wide RAKE-lite top-20 multiword keyphrases.

    Scale shape: tokens explode once; the phrase-id window and the
    phrase-length window are both keyed by doc (never global); word
    stats are a vocab-sized groupBy; the phrase score re-join is
    keyed by word then by (doc, phrase) — every exchange carries an
    8-byte-ish key. Top-20 is TakeOrdered."""
    d = _t(spark, sf_dir, "documents")
    tk = (d.select("doc_id", F.posexplode(tokens("text")).alias("pos", "w"))
          .withColumn("stop", F.col("w").isin(*_RAKE_STOPS)))
    wg = (Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tk = tk.withColumn("grp", F.sum(F.col("stop").cast("long")).over(wg))
    nw = tk.where(~F.col("stop")).select("doc_id", "grp", "pos", "w")
    wl = Window.partitionBy("doc_id", "grp")
    member = nw.withColumn("plen", F.count("*").over(wl).cast("long"))
    wstats = (member.groupBy("w")
              .agg(F.count("*").cast("long").alias("freq"),
                   F.sum("plen").cast("long").alias("deg"))
              .select("w", F.floor(F.col("deg").cast("double")
                                   * F.lit(1000000.0)
                                   / F.col("freq").cast("double"))
                      .cast("long").alias("wscore_e6")))
    phr = (member.join(wstats, "w")
           .groupBy("doc_id", "grp")
           .agg(F.concat_ws(" ", F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "w"))),
                    lambda s: s.w)).alias("phrase"),
                F.sum("wscore_e6").cast("long").alias("score_e6"),
                F.count("*").cast("long").alias("n_words")))
    return (phr.where(F.col("n_words") >= 2)
            .groupBy("phrase")
            .agg(F.count("*").cast("long").alias("support"),
                 F.max("score_e6").alias("score_e6"),
                 F.max("n_words").alias("n_words"))
            .orderBy(F.col("score_e6").desc(), F.col("phrase").asc())
            .limit(_RAKE_TOPN))


def _oracle_rake() -> str:
    stops = ", ".join(f"'{s}'" for s in _RAKE_STOPS)
    return rf"""
  WITH tk AS (
    SELECT doc_id, i AS pos, t[i] AS w,
           (t[i] IN ({stops})) AS stop
    FROM (SELECT doc_id, t,
                 unnest(generate_series(1, len(t))) AS i
          FROM (SELECT doc_id,
                       list_filter(string_split_regex(lower(text), '\s+'),
                                   x -> x <> '') AS t
                FROM documents))
  ),
  grps AS (
    SELECT doc_id, pos, w, stop,
           sum(stop::BIGINT) OVER (
             PARTITION BY doc_id ORDER BY pos
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
             AS grp
    FROM tk
  ),
  member AS (
    SELECT doc_id, grp, pos, w,
           count(*) OVER (PARTITION BY doc_id, grp)::BIGINT AS plen
    FROM grps WHERE NOT stop
  ),
  wstats AS (
    SELECT w,
           floor(sum(plen)::DOUBLE * 1e6
                 / count(*)::DOUBLE)::BIGINT AS wscore_e6
    FROM member GROUP BY w
  ),
  phr AS (
    SELECT m.doc_id, m.grp,
           string_agg(m.w, ' ' ORDER BY m.pos) AS phrase,
           sum(s.wscore_e6)::BIGINT AS score_e6,
           count(*)::BIGINT AS n_words
    FROM member m JOIN wstats s USING (w)
    GROUP BY m.doc_id, m.grp
  )
  SELECT phrase, count(*)::BIGINT AS support,
         max(score_e6)::BIGINT AS score_e6,
         max(n_words)::BIGINT AS n_words
  FROM phr WHERE n_words >= 2
  GROUP BY phrase
  ORDER BY score_e6 DESC, phrase ASC LIMIT {_RAKE_TOPN}
"""


def q_stratified_ate(spark, sf_dir):
    """Per-activity-band treatment effect: mean purchase value vs mean
    view value (cents, e6 means) within log2(user event count) bands
    capped at _ATE_CAP. Output per band: user count, n/mean for both
    arms, ate_c_e6 = mean_t − mean_c (exact subtraction of floored
    means).

    Scale shape: one groupBy(user) census, one user-keyed join back
    (the same co-partitioned exchange), one groupBy(band) rollup —
    no global sort, no ntile."""
    e = _t(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.count("*").cast("long").alias("cnt"))
    band = F.least(
        (F.length(F.conv(F.col("cnt").cast("string"), 10, 2)) - 1)
        .cast("long"), F.lit(_ATE_CAP).cast("long")).alias("band")
    strata = per_user.select("user_id", band)
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    rows = (e.where(F.col("event_type").isin("purchase", "view"))
            .select("user_id",
                    (F.col("event_type") == "purchase").alias("treat"),
                    cents.alias("y"))
            .join(strata, "user_id"))
    agg = rows.groupBy("band").agg(
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.col("treat").cast("long")).cast("long").alias("n_t"),
        F.sum(F.when(F.col("treat"), F.col("y"))).cast("long").alias("s_t"),
        F.sum((~F.col("treat")).cast("long")).cast("long").alias("n_c"),
        F.sum(F.when(~F.col("treat"), F.col("y"))).cast("long")
         .alias("s_c"))
    mt = F.floor(F.col("s_t").cast("double") * F.lit(1000000.0)
                 / F.col("n_t").cast("double")).cast("long")
    mc = F.floor(F.col("s_c").cast("double") * F.lit(1000000.0)
                 / F.col("n_c").cast("double")).cast("long")
    return (agg.where((F.col("n_t") > 0) & (F.col("n_c") > 0))
            .select("band", "n_users", "n_t", "n_c",
                    mt.alias("mean_t_c_e6"), mc.alias("mean_c_c_e6"),
                    (mt - mc).alias("ate_c_e6"))
            .orderBy("band"))


def _oracle_ate() -> str:
    return f"""
  WITH per_user AS (
    SELECT user_id, count(*)::BIGINT AS cnt FROM events GROUP BY user_id
  ),
  strata AS (
    SELECT user_id,
           least((length(bin(cnt)) - 1)::BIGINT, {_ATE_CAP}) AS band
    FROM per_user
  ),
  rws AS (
    SELECT e.user_id, (e.event_type = 'purchase') AS treat,
           floor(e.value * 100 + 0.5)::BIGINT AS y, s.band
    FROM events e JOIN strata s USING (user_id)
    WHERE e.event_type IN ('purchase', 'view')
  ),
  agg AS (
    SELECT band, count(DISTINCT user_id)::BIGINT AS n_users,
           sum(treat::BIGINT)::BIGINT AS n_t,
           sum(CASE WHEN treat THEN y END)::BIGINT AS s_t,
           sum((NOT treat)::BIGINT)::BIGINT AS n_c,
           sum(CASE WHEN NOT treat THEN y END)::BIGINT AS s_c
    FROM rws GROUP BY band
  )
  SELECT band, n_users, n_t, n_c,
         floor(s_t::DOUBLE * 1e6 / n_t::DOUBLE)::BIGINT AS mean_t_c_e6,
         floor(s_c::DOUBLE * 1e6 / n_c::DOUBLE)::BIGINT AS mean_c_c_e6,
         (floor(s_t::DOUBLE * 1e6 / n_t::DOUBLE)
          - floor(s_c::DOUBLE * 1e6 / n_c::DOUBLE))::BIGINT AS ate_c_e6
  FROM agg WHERE n_t > 0 AND n_c > 0
  ORDER BY band
"""


QUERIES_ROUND13.update({
    "rake_keyphrases": QuerySpec(
        q_rake_keyphrases, _oracle_rake(),
        doc="RAKE-lite keyphrases: stopword-run phrases, deg/freq "
            "word scores, top-20 multiword"),
    "stratified_ate": QuerySpec(
        q_stratified_ate, _oracle_ate(),
        doc="activity-band-stratified purchase-vs-view value effect "
            "(log2 bands, no global sort)"),
})
