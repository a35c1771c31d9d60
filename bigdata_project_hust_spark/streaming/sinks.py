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

import json
import os
import shutil

from pyspark.sql import DataFrame

from ..operators.aggregations import merge_aggregate
from ..operators.joins import anti_join


class KeyedParquetStore:
    """Minimal keyed upsert store over parquet, for foreachBatch sinks.

    Writes are last-write-wins per key (replace semantics, S7) or
    merge-aggregate ($inc/$max semantics, A2). Reads return the current
    table. Epoch ids already applied are skipped → exactly-once effect
    under micro-batch retries.

    Commit protocol (crash-safe): each upsert writes a NEW versioned
    parquet directory ``{path}.v{n}``, then promotes data and the
    applied-epoch set TOGETHER by renaming a json manifest into place
    (``os.replace`` — atomic on POSIX). A crash before the rename
    leaves the previous version live and the epoch unrecorded, so the
    retry re-applies cleanly; a crash after the rename finds the epoch
    recorded and skips. There is no window where the merge is applied
    but the epoch not yet recorded (double-$inc), and never a moment
    with no readable store — the failure modes of overwrite-in-place.
    This is the same snapshot-pointer commit Delta/Iceberg use; on a
    cluster the manifest rename becomes the table format's log commit.
    Versioning also removes the old write-twice dance: the new version
    is computed while reading the previous one.
    """

    def __init__(self, spark, path: str, key: str):
        self.spark = spark
        self.path = path
        self.key = key
        # manifest persists NEXT TO the data: foreachBatch is
        # at-least-once, and the retry that matters is a query restart
        # with a FRESH store object — a driver-memory set would forget
        # everything exactly when the redelivery happens
        self._manifest = path + ".manifest.json"

    def _state(self) -> dict:
        if os.path.exists(self._manifest):
            with open(self._manifest) as f:
                return json.load(f)
        return {"version": 0, "epochs": []}

    def read(self) -> DataFrame | None:
        st = self._state()
        if st["version"] == 0:
            return None
        return self.spark.read.parquet(f"{self.path}.v{st['version']}")

    def _commit(self, df: DataFrame, epoch_id: int | None) -> None:
        st = self._state()
        new_v = st["version"] + 1
        df.write.mode("overwrite").parquet(f"{self.path}.v{new_v}")
        epochs = st["epochs"] + ([epoch_id] if epoch_id is not None else [])
        tmp = self._manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"version": new_v, "epochs": epochs}, f)
        os.replace(tmp, self._manifest)  # the atomic commit point
        if st["version"]:  # GC the superseded snapshot (best-effort)
            shutil.rmtree(f"{self.path}.v{st['version']}",
                          ignore_errors=True)

    def upsert_replace(self, batch: DataFrame,
                       epoch_id: int | None = None) -> None:
        """S6/S7: replace rows by key (new batch wins). ``epoch_id``
        None = no exactly-once tracking (plain batch callers) — a
        sentinel default would silently drop every second call."""
        if epoch_id is not None and epoch_id in self._state()["epochs"]:
            return
        prev = self.read()
        out = batch if prev is None else anti_join(
            prev, batch, self.key).unionByName(batch)
        self._commit(out, epoch_id)

    def upsert_merge(self, batch: DataFrame, sum_cols: list[str],
                     max_cols: list[str], count_col: str,
                     epoch_id: int | None = None) -> None:
        """A2/ST6: $inc sums & counts, $max maxes, insert new keys."""
        if epoch_id is not None and epoch_id in self._state()["epochs"]:
            return
        prev = self.read()
        out = batch if prev is None else merge_aggregate(
            prev, batch, self.key, sum_cols, max_cols, count_col)
        self._commit(out, epoch_id)
