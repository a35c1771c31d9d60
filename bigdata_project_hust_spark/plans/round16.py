"""Round-16 extension query: right-to-be-forgotten (GDPR erasure)
cascade audit.

``rtbf_deletion_manifest`` — given a deterministic deletion-request
sample of customers (stable hash ≡ 0 mod 97), size the cascade across
every table that embeds the subject: customer rows, their orders, and
those orders' lineitems. This is the manifest a compliance erasure job
executes and the number the DPO signs off on — produced WITHOUT
touching data files (counts only).

Plan shape at scale: the tombstone list is hash-derived (never
materialized driver-side); each fact counts via a semi-join against
it — customer/orders join directly on the subject key, lineitem joins
through orders on the order key (the same co-partitioned exchange the
orders count already created). No broadcast assumption on the subject
list (a real request queue is small, but erasure backfills can carry
millions of subjects — AQE picks broadcast when it fits).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions.scalar import stable_hash64, stable_hash64_sql
from .spec import QuerySpec, _t

QUERIES_ROUND16: dict[str, QuerySpec] = {}

_RTBF_MOD, _RTBF_SEED = 97, 41


def q_rtbf_deletion_manifest(spark, sf_dir):
    """Per-table erasure cascade: (table_name, n_subjects, n_rows)."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    subj = (cust.where(F.pmod(stable_hash64(
                F.col("c_custkey").cast("string"), seed=_RTBF_SEED),
                F.lit(_RTBF_MOD)) == 0)
            .select(F.col("c_custkey").alias("k")))
    c_cnt = (cust.join(subj, cust.c_custkey == subj.k, "left_semi")
             .groupBy().agg(F.countDistinct("c_custkey").cast("long")
                            .alias("n_subjects"),
                            F.count("*").cast("long").alias("n_rows"))
             .select(F.lit("customer").alias("table_name"),
                     "n_subjects", "n_rows"))
    o_hit = orders.join(subj, orders.o_custkey == subj.k, "left_semi")
    o_cnt = (o_hit.groupBy()
             .agg(F.countDistinct("o_custkey").cast("long")
                  .alias("n_subjects"),
                  F.count("*").cast("long").alias("n_rows"))
             .select(F.lit("orders").alias("table_name"),
                     "n_subjects", "n_rows"))
    l_cnt = (li.join(o_hit.select("o_orderkey", "o_custkey"),
                     li.l_orderkey == F.col("o_orderkey"), "inner")
             .groupBy()
             .agg(F.countDistinct("o_custkey").cast("long")
                  .alias("n_subjects"),
                  F.count("*").cast("long").alias("n_rows"))
             .select(F.lit("lineitem").alias("table_name"),
                     "n_subjects", "n_rows"))
    return (c_cnt.unionByName(o_cnt).unionByName(l_cnt)
            .orderBy("table_name"))


def _oracle_rtbf() -> str:
    h = stable_hash64_sql("c_custkey::VARCHAR", seed=_RTBF_SEED)
    return f"""
  WITH subj AS (
    SELECT c_custkey AS k FROM customer WHERE ({h} % {_RTBF_MOD}) = 0
  ),
  o_hit AS (
    SELECT o.* FROM orders o WHERE o.o_custkey IN (SELECT k FROM subj)
  ),
  c_cnt AS (
    SELECT 'customer' AS table_name,
           count(DISTINCT c_custkey)::BIGINT AS n_subjects,
           count(*)::BIGINT AS n_rows
    FROM customer WHERE c_custkey IN (SELECT k FROM subj)
  ),
  o_cnt AS (
    SELECT 'orders', count(DISTINCT o_custkey)::BIGINT,
           count(*)::BIGINT
    FROM o_hit
  ),
  l_cnt AS (
    SELECT 'lineitem', count(DISTINCT o.o_custkey)::BIGINT,
           count(*)::BIGINT
    FROM lineitem l JOIN o_hit o ON l.l_orderkey = o.o_orderkey
  )
  SELECT * FROM c_cnt UNION ALL SELECT * FROM o_cnt
  UNION ALL SELECT * FROM l_cnt
  ORDER BY table_name
"""


QUERIES_ROUND16.update({
    "rtbf_deletion_manifest": QuerySpec(
        q_rtbf_deletion_manifest, _oracle_rtbf(),
        doc="GDPR erasure cascade audit: per-table subject and row "
            "counts for a hash-derived deletion-request list"),
})
