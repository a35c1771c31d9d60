"""Upsert sinks via foreachBatch (S6/S7/S10, A2's $inc/$max merge).

Spark has no built-in key-value upsert sink; the reference used Mongo
``UpdateOne(upsert=True)`` bulk writes (consumer2.py:143-157,193-241).
Here the same semantics are a ``foreachBatch`` handler around an
idempotent merge into a keyed parquet store — the merge itself is the
relational ``merge_aggregate`` operator, so incremental state ==
recompute (property-tested).

On a cluster the store would be Delta/Iceberg ``MERGE INTO`` or a real
Mongo bulk write; the handler shape (epoch_id for exactly-once, merge
on key) is identical.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from ..operators.aggregations import merge_aggregate
from ..operators.joins import anti_join


class KeyedParquetStore:
    """Minimal keyed upsert store over parquet, for foreachBatch sinks.

    Writes are last-write-wins per key (replace semantics, S7) or
    merge-aggregate ($inc/$max semantics, A2). Reads return the current
    table. Epoch ids already applied are skipped → exactly-once effect
    under micro-batch retries.
    """

    def __init__(self, spark, path: str, key: str):
        self.spark = spark
        self.path = path
        self.key = key
        # applied epochs persist NEXT TO the data: foreachBatch is
        # at-least-once, and the retry that matters is a query restart
        # with a FRESH store object — a driver-memory set would forget
        # everything exactly when the redelivery happens
        self._epoch_file = path + ".applied_epochs"
        self._applied_epochs: set[int] = self._load_epochs()

    def _load_epochs(self) -> set[int]:
        if os.path.exists(self._epoch_file):
            with open(self._epoch_file) as f:
                return {int(line) for line in f if line.strip()}
        return set()

    def _record_epoch(self, epoch_id: int) -> None:
        self._applied_epochs.add(epoch_id)
        with open(self._epoch_file, "a") as f:
            f.write(f"{epoch_id}\n")

    def _exists(self) -> bool:
        return os.path.exists(self.path)

    def read(self) -> DataFrame | None:
        return self.spark.read.parquet(self.path) if self._exists() else None

    def _write(self, df: DataFrame) -> None:
        tmp = self.path + ".tmp"
        df.write.mode("overwrite").parquet(tmp)
        final = self.spark.read.parquet(tmp)
        final.write.mode("overwrite").parquet(self.path)

    def upsert_replace(self, batch: DataFrame,
                       epoch_id: int | None = None) -> None:
        """S6/S7: replace rows by key (new batch wins). ``epoch_id``
        None = no exactly-once tracking (plain batch callers) — a
        sentinel default would silently drop every second call."""
        if epoch_id is not None and epoch_id in self._applied_epochs:
            return
        prev = self.read()
        out = batch if prev is None else anti_join(
            prev, batch, self.key).unionByName(batch)
        self._write(out)
        if epoch_id is not None:
            self._record_epoch(epoch_id)

    def upsert_merge(self, batch: DataFrame, sum_cols: list[str],
                     max_cols: list[str], count_col: str,
                     epoch_id: int | None = None) -> None:
        """A2/ST6: $inc sums & counts, $max maxes, insert new keys."""
        if epoch_id is not None and epoch_id in self._applied_epochs:
            return
        prev = self.read()
        out = batch if prev is None else merge_aggregate(
            prev, batch, self.key, sum_cols, max_cols, count_col)
        self._write(out)
        if epoch_id is not None:
            self._record_epoch(epoch_id)
