"""Round-19 extension query: sequential pattern mining (lite).

``top_event_trigrams`` — the top-10 most common 3-step event-type
journeys across users, counted over each user's time-ordered event
sequence (ties on (ts, event_id) broken deterministically). The
classic clickstream "what do users do in threes" — transition
matrices (already shipped) see only pairs; trigrams expose the
composite flows funnels are designed from.

Scale shape: ONE user-keyed exchange feeds a per-user window; the two
lead() steps ride the same window spec (one sort); trigram counting is
a map-side-combined groupBy on a short string key; top-10 is
TakeOrdered. No per-user collect, no global sort.
"""

from __future__ import annotations

from pyspark.sql import Window, functions as F

from .spec import QuerySpec, _t

QUERIES_ROUND19: dict[str, QuerySpec] = {}

_TRI_TOPN = 10


def q_top_event_trigrams(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc())
    tri = (e.select("user_id", "ts", "event_id",
                    F.col("event_type").alias("s1"))
           .withColumn("s2", F.lead("s1", 1).over(w))
           .withColumn("s3", F.lead("s1", 2).over(w))
           .where(F.col("s3").isNotNull())
           .select(F.concat_ws(">", "s1", "s2", "s3").alias("trigram")))
    return (tri.groupBy("trigram")
            .agg(F.count("*").cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("trigram").asc())
            .limit(_TRI_TOPN))


def _oracle_trigrams() -> str:
    return f"""
  WITH seq AS (
    SELECT user_id, event_type AS s1,
           lead(event_type, 1) OVER w AS s2,
           lead(event_type, 2) OVER w AS s3
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
  )
  SELECT s1 || '>' || s2 || '>' || s3 AS trigram,
         count(*)::BIGINT AS n
  FROM seq WHERE s3 IS NOT NULL
  GROUP BY 1
  ORDER BY n DESC, trigram ASC LIMIT {_TRI_TOPN}
"""


QUERIES_ROUND19.update({
    "top_event_trigrams": QuerySpec(
        q_top_event_trigrams, _oracle_trigrams(),
        doc="top-10 3-step event-type journeys (per-user ordered "
            "window, two leads, TakeOrdered)"),
})
