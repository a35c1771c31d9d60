"""Custom connector via the Spark 4 Python Data Source API.

The reference ingests by replaying stored fixture collections into the
pipeline: ``producer.py:84-99`` loops over per-topic JSON fixtures and
re-emits records on a fixed cadence (S3 "round-robin replay source"),
and ``consumer1.py:41-48`` consumes them as an unbounded stream. Rounds
1-2 re-expressed that with Spark's built-in file-stream source; this
module closes the remaining gap — the reference's *custom connector*
role itself — with a first-class Spark data source implemented against
``pyspark.sql.datasource``:

* **Batch** (``FixtureReplayReader``): a partition-parallel scan of one
  parquet fixture, one ``InputPartition`` per parquet ROW GROUP. Each
  task reads only its row group through pyarrow and yields Arrow
  record batches — the same shard-by-storage-chunk layout a real
  connector (e.g. Mongo's chunk ranges) exposes, and zero
  driver-side row materialization.
* **Streaming** (``FixtureReplayStreamReader``): replays the fixture in
  ``batch_rows``-sized micro-batches with real offset bookkeeping —
  ``initialOffset`` / ``latestOffset`` / ``partitions(start, end)`` /
  ``commit`` — i.e. the producer's paced replay as a Structured
  Streaming source with exactly-once row ranges instead of a sleep
  loop. A single pass by default (the stream catches up and idles,
  so ``processAllAvailable`` terminates in tests); ``loop=true``
  re-arms the replay like the reference's endless producer.

Scale note: offsets are plain row ranges over an immutable file, so
recovery after restart is pure arithmetic (no scan); each micro-batch
plans ≤ ceil(batch_rows / rows-per-split) tasks, and the batch reader's
row-group partitioning inherits parquet's own sizing (one task per
~128 MB row group at warehouse-standard layout).
"""

from __future__ import annotations

import json
from collections.abc import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader,
                                    DataSourceStreamWriter,
                                    DataSourceWriter, InputPartition,
                                    WriterCommitMessage)
from pyspark.sql.types import StructType

_DEFAULT_BATCH_ROWS = 1000


class _RowGroupPartition(InputPartition):
    def __init__(self, path: str, index: int):
        self.path = path
        self.index = index


class _RangePartition(InputPartition):
    def __init__(self, path: str, start: int, end: int):
        self.path = path
        self.start = start
        self.end = end


def _arrow_schema_of(path: str):
    import pyarrow.parquet as pq
    return pq.read_schema(path)


class FixtureReplayReader(DataSourceReader):
    def __init__(self, path: str):
        self.path = path

    def partitions(self) -> list[InputPartition]:
        import pyarrow.parquet as pq
        n = pq.read_metadata(self.path).num_row_groups
        return [_RowGroupPartition(self.path, i) for i in range(max(n, 1))]

    def read(self, partition: _RowGroupPartition) -> Iterator:
        import pyarrow.parquet as pq
        f = pq.ParquetFile(partition.path)
        if f.metadata.num_row_groups == 0:
            return
        # Arrow record batches pass to the JVM without per-row Python
        for batch in f.iter_batches(row_groups=[partition.index]):
            yield batch


class FixtureReplayStreamReader(DataSourceStreamReader):
    def __init__(self, path: str, batch_rows: int, loop: bool):
        import pyarrow.parquet as pq
        self.path = path
        self.batch_rows = batch_rows
        self.loop = loop
        self.total = pq.read_metadata(path).num_rows
        self._hwm = 0  # rows released to the stream so far

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def latestOffset(self) -> dict:
        # release one paced micro-batch per trigger; cap at one full
        # pass unless loop — then the high-water mark keeps climbing
        # and read() wraps modulo the fixture (round-robin replay)
        if self.loop or self._hwm < self.total:
            self._hwm += self.batch_rows
            if not self.loop:
                self._hwm = min(self._hwm, self.total)
        return {"pos": self._hwm}

    def _observe(self, pos: int) -> None:
        # Restart safety: a fresh reader instance starts at _hwm=0,
        # but the checkpoint may already be far ahead. Every offset
        # Spark hands back (WAL replay via partitions(), resume-time
        # commit()) ratchets the high-water mark so latestOffset can
        # never go backwards — an offset below the committed one
        # would make the engine plan empty batches and then re-emit
        # old rows (duplicates) as the mark re-climbed.
        if pos > self._hwm:
            self._hwm = pos

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        lo, hi = start["pos"], end["pos"]
        self._observe(hi)
        if hi <= lo:
            return []
        step = max(1, self.batch_rows)
        return [_RangePartition(self.path, p, min(p + step, hi))
                for p in range(lo, hi, step)]

    def read(self, partition: _RangePartition) -> Iterator:
        # Row-group-targeted range read: only the groups overlapping
        # [base, base+take) are decoded — a whole-file read here would
        # cost O(N²/B) over a full pass (every micro-batch re-reading
        # all N rows to emit B).
        import pyarrow.parquet as pq
        f = pq.ParquetFile(partition.path)
        n = f.metadata.num_rows
        if n == 0:
            return  # empty fixture: nothing to replay, even looped
        lo, hi = partition.start, partition.end
        while lo < hi:
            base = lo % n
            take = min(hi - lo, n - base)
            cum = 0
            for g in range(f.metadata.num_row_groups):
                nr = f.metadata.row_group(g).num_rows
                g_lo = max(base, cum)
                g_hi = min(base + take, cum + nr)
                if g_lo < g_hi:
                    tbl = f.read_row_group(g)
                    for batch in tbl.slice(g_lo - cum,
                                           g_hi - g_lo).to_batches():
                        yield batch
                cum += nr
                if cum >= base + take:
                    break
            lo += take

    def commit(self, end: dict) -> None:
        self._observe(end["pos"])  # see _observe: restart ratchet


class FixtureReplaySource(DataSource):
    """``spark.read.format("fixture_replay").option("path", p)`` and the
    ``readStream`` twin. Options: ``path`` (parquet file, required),
    ``batch_rows`` (stream pacing), ``loop`` (endless round-robin)."""

    @classmethod
    def name(cls) -> str:
        return "fixture_replay"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema
        return from_arrow_schema(_arrow_schema_of(self.options["path"]))

    def reader(self, schema: StructType) -> FixtureReplayReader:
        return FixtureReplayReader(self.options["path"])

    def streamReader(self, schema: StructType) -> FixtureReplayStreamReader:
        return FixtureReplayStreamReader(
            self.options["path"],
            int(self.options.get("batch_rows", _DEFAULT_BATCH_ROWS)),
            json.loads(self.options.get("loop", "false")))


def register_fixture_replay(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(FixtureReplaySource)


# ---------------------------------------------------------------------------
# Custom SINK via the Python Data Source API (writer side)
# ---------------------------------------------------------------------------

class _FileCommit(WriterCommitMessage):
    def __init__(self, filename: str, rows: int):
        self.filename = filename
        self.rows = rows


class KeyedJsonWriter(DataSourceWriter):
    """Batch writer: each task streams its rows to ONE staging
    JSON-lines file (never materializing the partition in memory);
    the driver-side commit() publishes the manifest atomically —
    readers only trust manifested files, so a failed/zombie task's
    staging file is invisible garbage, exactly the manifest contract
    ``streaming/sinks.KeyedParquetStore`` uses (reference semantics:
    consumer2.py's replace-upserts land atomically or not at all)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _FileCommit:
        import json as _json
        import os
        import uuid
        os.makedirs(f"{self.path}/_staging", exist_ok=True)
        fn = f"_staging/task-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(f"{self.path}/{fn}", "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _FileCommit(fn, n)

    def commit(self, messages) -> None:
        import json as _json
        import os
        files = [{"file": m.filename, "rows": m.rows}
                 for m in messages if m is not None]
        tmp = f"{self.path}/_manifest.tmp"
        with open(tmp, "w") as f:
            _json.dump({"files": files}, f)
        os.replace(tmp, f"{self.path}/manifest-batch.json")

    def abort(self, messages) -> None:
        pass  # staging files are unreferenced — vacuum later


class KeyedJsonStreamWriter(DataSourceStreamWriter):
    """Streaming twin: one manifest per micro-batch, named by
    ``batchId`` — a retried batch OVERWRITES its own manifest with an
    equivalent file list instead of appending a second one, which is
    what makes the sink exactly-once under task retry (same contract
    the parquet store proves in test_streaming.py)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, iterator) -> _FileCommit:
        return KeyedJsonWriter(self.path).write(iterator)

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os
        files = [{"file": m.filename, "rows": m.rows}
                 for m in messages if m is not None]
        tmp = f"{self.path}/_manifest-{batchId}.tmp"
        with open(tmp, "w") as f:
            _json.dump({"batch": batchId, "files": files}, f)
        os.replace(tmp, f"{self.path}/manifest-{batchId}.json")

    def abort(self, messages, batchId: int) -> None:
        pass


def read_manifested_json(spark, path: str, schema: StructType):
    """Read back ONLY manifest-listed files (the sink's read contract)."""
    import glob as _glob
    import json as _json
    files = []
    for m in sorted(_glob.glob(f"{path}/manifest-*.json")):
        with open(m) as f:
            files += [f"{path}/{e['file']}"
                      for e in _json.load(f)["files"]]
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)


class KeyedJsonSink(DataSource):
    """``df.write.format("keyed_json_sink").option("path", p)`` and the
    ``writeStream`` twin — the reference's sink role (consumer→Mongo
    document writes) as a first-class custom Python data source with
    manifest-atomic visibility."""

    @classmethod
    def name(cls) -> str:
        return "keyed_json_sink"

    def writer(self, schema: StructType, overwrite: bool):
        return KeyedJsonWriter(self.options["path"])

    def streamWriter(self, schema: StructType, overwrite: bool):
        return KeyedJsonStreamWriter(self.options["path"])


def register_keyed_json_sink(spark) -> None:
    spark.dataSource.register(KeyedJsonSink)
