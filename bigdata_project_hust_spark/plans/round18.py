"""Round-18 extension query: the per-source corpus scorecard.

``source_scorecard`` — one row per source with everything a corpus
owner reviews before a training run: document and character volume,
mean quality score, near-duplicate exposure (docs appearing in any
MinHash near-dup pair), and the dominant predicted language with its
share. This is the ``show.py`` dashboard analogue for the LLM-pipeline
surface — a COMPOSITION of four verified operator families (quality,
lang-id fused via doc_features' single tokenize pass, the LSH pair
set, per-source census) into one plan.

Scale shape: doc_features is a zero-shuffle projection; the dup flag
set derives from the already-bucketed LSH pipeline and semi-joins back
on the 8-byte doc key; everything then rolls up in ONE
groupBy(source) plus a #sources-row top-language window.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from ..operators import dedup, text
from .queries import ORACLE_LANG, ORACLE_QUALITY, _minhash_graph_sql
from .spec import QuerySpec, _t

QUERIES_ROUND18: dict[str, QuerySpec] = {}


def q_source_scorecard(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    feats = text.doc_features(d).select("doc_id", "quality", "lang_pred")
    pairs = dedup.minhash_near_duplicates(d)
    flagged = (pairs.select(F.col("doc_a").alias("doc_id"))
               .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
               .distinct().withColumn("is_dup", F.lit(1).cast("long")))
    per_doc = (d.select("doc_id", "source", "n_chars")
               .join(feats, "doc_id")
               .join(flagged, "doc_id", "left")
               .na.fill({"is_dup": 0}))
    base = per_doc.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
        F.floor(F.sum("quality").cast("double") * F.lit(100.0)
                / F.count("*").cast("double"))
        .cast("long").alias("mean_quality_e2"),
        F.sum("is_dup").cast("long").alias("n_dup_docs"),
        F.floor(F.sum("is_dup").cast("double") * F.lit(1000000.0)
                / F.count("*").cast("double"))
        .cast("long").alias("dup_frac_e6"))
    lc = (per_doc.groupBy("source", "lang_pred")
          .agg(F.count("*").cast("long").alias("c")))
    w = Window.partitionBy("source").orderBy(
        F.col("c").desc(), F.col("lang_pred").asc())
    top = (lc.withColumn("rn", F.row_number().over(w))
           .where(F.col("rn") == 1)
           .select("source", F.col("lang_pred").alias("top_lang"),
                   F.col("c").alias("top_lang_docs")))
    return (base.join(top, "source")
            .select("source", "n_docs", "total_chars", "mean_quality_e2",
                    "n_dup_docs", "dup_frac_e6", "top_lang",
                    F.floor(F.col("top_lang_docs").cast("double")
                            * F.lit(1000000.0)
                            / F.col("n_docs").cast("double"))
                    .cast("long").alias("top_lang_share_e6"))
            .orderBy("source"))


def _oracle_scorecard() -> str:
    return f"""
  {_minhash_graph_sql()},
  dpairs AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.inter_size * 2 >= (na.n_sh + nb.n_sh - i.inter_size)
  ),
  flagged AS (
    SELECT DISTINCT doc_id FROM (
      SELECT doc_a AS doc_id FROM dpairs
      UNION ALL SELECT doc_b FROM dpairs)
  ),
  qual AS ({ORACLE_QUALITY}),
  lang AS ({ORACLE_LANG}),
  per_doc AS (
    SELECT d.doc_id, d.source, d.n_chars, q.quality, l.lang_pred,
           (f.doc_id IS NOT NULL)::BIGINT AS is_dup
    FROM documents d
    JOIN qual q USING (doc_id)
    JOIN lang l USING (doc_id)
    LEFT JOIN flagged f USING (doc_id)
  ),
  base AS (
    SELECT source, count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           floor(sum(quality)::DOUBLE * 100
                 / count(*)::DOUBLE)::BIGINT AS mean_quality_e2,
           sum(is_dup)::BIGINT AS n_dup_docs,
           floor(sum(is_dup)::DOUBLE * 1e6
                 / count(*)::DOUBLE)::BIGINT AS dup_frac_e6
    FROM per_doc GROUP BY source
  ),
  lc AS (
    SELECT source, lang_pred, count(*)::BIGINT AS c
    FROM per_doc GROUP BY source, lang_pred
  ),
  top AS (
    SELECT source, lang_pred AS top_lang, c AS top_lang_docs
    FROM (SELECT *, row_number() OVER (
            PARTITION BY source ORDER BY c DESC, lang_pred ASC) AS rn
          FROM lc)
    WHERE rn = 1
  )
  SELECT b.source, b.n_docs, b.total_chars, b.mean_quality_e2,
         b.n_dup_docs, b.dup_frac_e6, t.top_lang,
         floor(t.top_lang_docs::DOUBLE * 1e6
               / b.n_docs::DOUBLE)::BIGINT AS top_lang_share_e6
  FROM base b JOIN top t USING (source)
  ORDER BY b.source
"""


QUERIES_ROUND18.update({
    "source_scorecard": QuerySpec(
        q_source_scorecard, _oracle_scorecard(),
        doc="per-source corpus scorecard: volume, mean quality, "
            "near-dup exposure, dominant language (4-family "
            "composition)"),
})
