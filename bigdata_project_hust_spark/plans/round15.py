"""Round-15 extension query: Spark 4 collation surface.

``collated_distinct_names`` — case-insensitive distinct counting via
``COLLATE UTF8_LCASE`` (Spark 4 collations), demonstrated against a
derived mixed-case column so the collated and binary counts actually
diverge. The DuckDB oracle expresses the same semantics with lower()
(a collation-free engine's equivalent), pinning that the collated
path means exactly case-fold-then-compare.

(The sibling surface added this round, checkpoint state-store
inspection via ``format("statestore")``, lives in
``streaming/statetools.py`` + ``tests/test_round14.py`` — a local-
checkpoint ops tool with no DuckDB analogue, so no registry entry.)
"""

from __future__ import annotations

from .spec import QuerySpec, _t

QUERIES_ROUND15: dict[str, QuerySpec] = {}


def q_collated_distinct_names(spark, sf_dir):
    """Per-nation distinct segment-label counts, binary vs
    UTF8_LCASE-collated, over a derived case-variant label (even keys
    see the upper-case spelling, odd keys the lower-case one — the
    mixed-case mess a real multi-writer feed produces). Folding halves
    the distinct count wherever both spellings occur. Runs through the
    SQL text interface — collation is a type-level property, exercised
    end-to-end through parsing, distinct aggregation, and codegen."""
    _t(spark, sf_dir, "customer").createOrReplaceTempView("__cust_r15")
    return spark.sql("""
      WITH mixed AS (
        SELECT c_nationkey,
               CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                    ELSE lower(c_mktsegment) END AS seg
        FROM __cust_r15
      )
      SELECT c_nationkey AS nationkey,
             count(DISTINCT seg) AS n_binary,
             count(DISTINCT seg COLLATE UTF8_LCASE) AS n_folded
      FROM mixed
      GROUP BY c_nationkey
      ORDER BY nationkey
    """)


ORACLE_COLLATED = """
  WITH mixed AS (
    SELECT c_nationkey,
           CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
                ELSE lower(c_mktsegment) END AS seg
    FROM customer
  )
  SELECT c_nationkey AS nationkey,
         count(DISTINCT seg)::BIGINT AS n_binary,
         count(DISTINCT lower(seg))::BIGINT AS n_folded
  FROM mixed
  GROUP BY c_nationkey
  ORDER BY nationkey
"""


QUERIES_ROUND15.update({
    "collated_distinct_names": QuerySpec(
        q_collated_distinct_names, ORACLE_COLLATED,
        doc="COLLATE UTF8_LCASE distinct counting vs binary "
            "(Spark 4 collations; oracle = lower() fold)"),
})
