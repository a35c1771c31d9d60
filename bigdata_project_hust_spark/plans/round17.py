"""Round-17 extension query: cross-source duplication matrix.

``cross_source_dup_matrix`` — roll the MinHash near-dup pair set up by
the (source, source) pair it straddles, canonicalized so (a,b)≡(b,a).
This is the provenance view of contamination: which feeds copy which
(mirror sites, syndication, scraped re-posts) — the input to per-source
dedup priorities and licensing review. Same zero-new-work shape as
``split_leakage_audit``: the pair set is the already-bucketed LSH
pipeline; the source map is a projection joined twice on the 8-byte
doc key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators import dedup
from .queries import _minhash_graph_sql
from .spec import QuerySpec, _t

QUERIES_ROUND17: dict[str, QuerySpec] = {}


def q_cross_source_dup_matrix(spark, sf_dir):
    """Near-dup pair counts per unordered source pair, with the
    cross-source flag and each cell's share of all pairs at e6."""
    d = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_near_duplicates(d)
    sp = d.select("doc_id", "source")
    sa = sp.select(F.col("doc_id").alias("doc_a"),
                   F.col("source").alias("src_a"))
    sb = sp.select(F.col("doc_id").alias("doc_b"),
                   F.col("source").alias("src_b"))
    tagged = (pairs.join(sa, "doc_a").join(sb, "doc_b")
              .select(F.least("src_a", "src_b").alias("source_lo"),
                      F.greatest("src_a", "src_b").alias("source_hi")))
    tot = tagged.groupBy().agg(F.count("*").cast("long").alias("t"))
    return (tagged.groupBy("source_lo", "source_hi")
            .agg(F.count("*").cast("long").alias("n_pairs"))
            .crossJoin(F.broadcast(tot))
            .select("source_lo", "source_hi", "n_pairs",
                    (F.col("source_lo") != F.col("source_hi"))
                    .cast("long").alias("cross_source"),
                    F.floor(F.col("n_pairs").cast("double")
                            * F.lit(1000000.0)
                            / F.col("t").cast("double"))
                    .cast("long").alias("share_e6"))
            .orderBy("source_lo", "source_hi"))


def _oracle_cross_source() -> str:
    return f"""
  {_minhash_graph_sql()},
  pairs AS (
    SELECT i.doc_a, i.doc_b
    FROM inter i
    JOIN sizes na ON na.doc_id = i.doc_a
    JOIN sizes nb ON nb.doc_id = i.doc_b
    WHERE i.inter_size * 2 >= (na.n_sh + nb.n_sh - i.inter_size)
  ),
  tagged AS (
    SELECT least(sa.source, sb.source) AS source_lo,
           greatest(sa.source, sb.source) AS source_hi
    FROM pairs p
    JOIN documents sa ON sa.doc_id = p.doc_a
    JOIN documents sb ON sb.doc_id = p.doc_b
  ),
  tot AS (SELECT count(*)::BIGINT AS t FROM tagged)
  SELECT source_lo, source_hi, count(*)::BIGINT AS n_pairs,
         (source_lo <> source_hi)::BIGINT AS cross_source,
         floor(count(*)::DOUBLE * 1e6 / max(tot.t)::DOUBLE)::BIGINT
           AS share_e6
  FROM tagged, tot
  GROUP BY source_lo, source_hi
  ORDER BY source_lo, source_hi
"""


QUERIES_ROUND17.update({
    "cross_source_dup_matrix": QuerySpec(
        q_cross_source_dup_matrix, _oracle_cross_source(),
        doc="near-dup pair counts per unordered source pair "
            "(provenance contamination matrix over the LSH pair set)"),
})
