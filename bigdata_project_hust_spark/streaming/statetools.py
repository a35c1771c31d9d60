"""Checkpoint state-store inspection via Spark 4's state data source.

The reference's only visibility into consumer state is Mongo queries
against the sink (`show.py` reads collections; the consumers' dedup
"state" IS the sink). Structured Streaming moves that state into the
checkpoint's state store — opaque binary files unless read back
through ``format("statestore")`` / ``format("state-metadata")``. These
wrappers are the ops surface: audit what a running pipeline remembers
(dedup keys held, per-group running aggregates, watermark-pending
windows) WITHOUT stopping it or instrumenting the query.

At scale this is the debugging tool for the classic streaming
incidents: state blow-up (read the store, group by key prefix, find
the hot tenant), watermark stalls (state rows older than expected),
and exactly-once audits (state vs sink reconciliation) — all as plain
DataFrame queries over the checkpoint, batch-joinable against the
sink's tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

__all__ = ["state_metadata", "state_rows", "state_key_census"]


def state_metadata(spark: SparkSession, checkpoint: str) -> DataFrame:
    """Operator-level census of a checkpoint: one row per stateful
    operator/partition group with operator name, ids, and the batch id
    range the store covers (``format("state-metadata")``)."""
    return spark.read.format("state-metadata").load(checkpoint)


def state_rows(spark: SparkSession, checkpoint: str,
               batch_id: int | None = None,
               operator_id: int = 0,
               store_name: str | None = None) -> DataFrame:
    """The state rows themselves (``format("statestore")``): columns
    ``key`` / ``value`` (structs mirroring the query's grouping key and
    state schema) + ``partition_id``. ``batch_id`` pins time travel to
    a specific micro-batch (default: latest committed)."""
    r = spark.read.format("statestore") \
        .option("operatorId", operator_id)
    if batch_id is not None:
        r = r.option("batchId", batch_id)
    if store_name is not None:
        r = r.option("storeName", store_name)
    return r.load(checkpoint)


def state_key_census(spark: SparkSession, checkpoint: str,
                     operator_id: int = 0) -> DataFrame:
    """Hot-key triage over a state store: rows per state-store
    partition — the skew view that tells you whether one grouping key
    family owns the store. Pure DataFrame agg over the state source
    (runs while the stream is live; the source reads a committed
    snapshot)."""
    from pyspark.sql import functions as F
    return (state_rows(spark, checkpoint, operator_id=operator_id)
            .groupBy("partition_id")
            .agg(F.count("*").cast("long").alias("n_keys"))
            .orderBy(F.col("n_keys").desc(), F.col("partition_id").asc()))
