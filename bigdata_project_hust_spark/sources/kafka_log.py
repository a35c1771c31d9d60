"""Kafka-shaped streaming source on the Python Data Source API.

Closes the S4/ST1 gap (reference ``consumer1.py:41-48``: multi-topic
subscribe, ``auto_offset_reset='earliest'``, committed-offset resume)
without a broker: the source speaks the Kafka *contract* — the same
7-column output frame, the same subscription options, per-(topic,
partition) offsets, ``startingOffsets`` earliest/latest/JSON-map,
``failOnDataLoss`` semantics, ``maxRecordsPerTrigger`` admission — over
a directory of append-only partition logs instead of a broker socket.
No spark-sql-kafka jar ships in this runtime (pinned environmental,
STATUS r9); everything above the wire protocol is exercised for real
here: offset bookkeeping, checkpointed exactly-once resume, multi-topic
fan-in, retention-expiry behavior.

Log layout (one file per topic-partition, line index = offset):

    {root}/{topic}/p00000.jsonl     record = {"key","value","ts"} JSON
    {root}/{topic}/_earliest.json   optional retention floor per
                                    partition — lines below it count as
                                    expired (Kafka's log truncation)

Scale notes: offsets are line indices over append-only files, so
``latestOffset`` is a per-partition line count (newline scan of the
tail in a real implementation; full scan here is fine at fixture
size) and recovery after restart is pure arithmetic from the
checkpoint — no data scan. Each micro-batch plans one task per
(topic, partition) with records > 0, exactly Kafka's parallelism
model; rows cross to the JVM as Arrow record batches, never per-row
Python objects.
"""

from __future__ import annotations

import json
import os
import re
import zlib
from collections.abc import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    DataSourceStreamReader, InputPartition)
from pyspark.sql.types import (BinaryType, IntegerType, LongType, StringType,
                               StructField, StructType, TimestampType)

#: the Kafka source's exact output shape (spark-sql-kafka's fixed schema)
KAFKA_FRAME_SCHEMA = StructType([
    StructField("key", BinaryType()),
    StructField("value", BinaryType()),
    StructField("topic", StringType()),
    StructField("partition", IntegerType()),
    StructField("offset", LongType()),
    StructField("timestamp", TimestampType()),
    StructField("timestampType", IntegerType()),
])


# ---------------------------------------------------------------------------
# producer side (test/fixture helper — the reference's producer.py role)
# ---------------------------------------------------------------------------

def _partition_for(key: str | None, n: int, fallback: int) -> int:
    """Kafka's default partitioner shape: hash(key) % n for keyed
    records, round-robin (caller-supplied counter) for null keys.
    crc32 rather than murmur2 — any deterministic hash preserves the
    property under test (same key → same partition → per-key order)."""
    if key is None:
        return fallback % n
    return zlib.crc32(key.encode()) % n


def create_topic(root: str, topic: str, partitions: int = 1) -> None:
    d = os.path.join(root, topic)
    os.makedirs(d, exist_ok=True)
    for p in range(partitions):
        open(os.path.join(d, f"p{p:05d}.jsonl"), "a").close()


def append_records(root: str, topic: str,
                   records: list[tuple[str | None, str]],
                   ts_ms: int = 1_700_000_000_000) -> None:
    """Append (key, value) records to a topic — the producer twin
    (producer.py:60-66 sends key=str(id), value=json payload). Keyed
    records land on hash(key) % n like Kafka's default partitioner."""
    d = os.path.join(root, topic)
    parts = sorted(f for f in os.listdir(d) if f.endswith(".jsonl"))
    if not parts:
        raise ValueError(f"topic {topic!r} has no partitions")
    handles = [open(os.path.join(d, f), "a") for f in parts]
    try:
        for i, (key, value) in enumerate(records):
            p = _partition_for(key, len(handles), i)
            handles[p].write(json.dumps(
                {"key": key, "value": value, "ts": ts_ms + i}) + "\n")
    finally:
        for h in handles:
            h.close()


def produce_topic_from_df(df, root: str, topic: str, key_col: str,
                          partitions: int = 1,
                          ts_ms: int = 1_700_000_000_000) -> None:
    """Distributed producer: land a DataFrame as a topic log with NO
    driver-side row materialization — records are placed on
    crc32(key) % n exactly like :func:`append_records` (Spark's
    ``crc32`` and ``zlib.crc32`` are the same CRC-32), each partition
    file written by one Spark text job; the driver only renames the
    staged part file. The record value is the JSON of the whole row,
    the producer's shape (producer.py:60-66)."""
    import glob as _glob
    import shutil

    from pyspark.sql import functions as F

    create_topic(root, topic, partitions)
    key = F.col(key_col).cast("string")
    line = F.to_json(F.struct(
        key.alias("key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns]))
         .alias("value"),
        F.lit(ts_ms).alias("ts")))
    tagged = df.select(
        F.pmod(F.crc32(F.encode(key, "UTF-8")), F.lit(partitions))
         .alias("__p"),
        line.alias("line"))
    for p in range(partitions):
        stage = os.path.join(root, topic, f"_stage_{p}")
        (tagged.where(F.col("__p") == p).select("line")
               .coalesce(1).write.mode("overwrite").text(stage))
        parts = _glob.glob(os.path.join(stage, "part-*"))
        dest = os.path.join(root, topic, f"p{p:05d}.jsonl")
        if parts:
            os.replace(parts[0], dest)
        shutil.rmtree(stage, ignore_errors=True)


def expire_before(root: str, topic: str, floors: dict[int, int]) -> None:
    """Simulate Kafka retention expiry: mark offsets below ``floors[p]``
    as no longer readable (the broker would have deleted the segment)."""
    path = os.path.join(root, topic, "_earliest.json")
    cur: dict[str, int] = {}
    if os.path.exists(path):
        cur = json.load(open(path))
    for p, off in floors.items():
        cur[str(p)] = max(cur.get(str(p), 0), off)
    tmp = path + ".tmp"
    json.dump(cur, open(tmp, "w"))
    os.replace(tmp, path)


# ---------------------------------------------------------------------------
# shared log introspection (driver-side planning)
# ---------------------------------------------------------------------------

def _norm_options(options: dict) -> dict:
    """Spark hands Python data sources a case-insensitive option map;
    normalize to lowercase keys once so ``startingOffsets`` and
    ``startingoffsets`` behave identically (as the real source does)."""
    return {k.lower(): v for k, v in options.items()}


def _topic_dirs(root: str, options: dict) -> dict[str, list[int]]:
    """Resolve the subscription to {topic: [partition ids]} — exactly
    one of Kafka's three subscription modes must be set."""
    modes = [m for m in ("subscribe", "subscribepattern", "assign")
             if options.get(m)]
    if len(modes) != 1:
        raise ValueError(
            "exactly one of subscribe / subscribePattern / assign "
            f"must be set, got {modes or 'none'}")
    mode = modes[0]
    if mode == "assign":
        want = json.loads(options["assign"])  # {"topic": [0, 1]}
        out = {}
        for t, ps in want.items():
            have = set(_list_partitions(root, t))
            missing = sorted(set(ps) - have)
            if missing:
                raise ValueError(
                    f"assigned partitions {missing} do not exist in "
                    f"topic {t!r}")
            out[t] = sorted(ps)
        return out
    if mode == "subscribe":
        topics = [t.strip() for t in options["subscribe"].split(",")
                  if t.strip()]
    else:
        pat = re.compile(options["subscribepattern"])
        topics = sorted(t for t in os.listdir(root)
                        if os.path.isdir(os.path.join(root, t))
                        and pat.fullmatch(t))
        if not topics:
            raise ValueError(
                f"subscribePattern {options['subscribepattern']!r} "
                f"matched no topics under {root}")
    out = {}
    for t in topics:
        if not os.path.isdir(os.path.join(root, t)):
            raise ValueError(f"topic {t!r} does not exist under {root}")
        out[t] = _list_partitions(root, t)
    return out


def _list_partitions(root: str, topic: str) -> list[int]:
    d = os.path.join(root, topic)
    if not os.path.isdir(d):
        return []
    return sorted(int(f[1:-6]) for f in os.listdir(d)
                  if f.startswith("p") and f.endswith(".jsonl"))


def _log_path(root: str, topic: str, part: int) -> str:
    return os.path.join(root, topic, f"p{part:05d}.jsonl")


def _end_offset(root: str, topic: str, part: int) -> int:
    """Current end (= line count). Append-only file: counting newlines
    is the fixture-scale stand-in for the broker's end-offset RPC."""
    n = 0
    with open(_log_path(root, topic, part), "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            n += chunk.count(b"\n")
    return n


def _earliest_offsets(root: str, topic: str) -> dict[int, int]:
    path = os.path.join(root, topic, "_earliest.json")
    if not os.path.exists(path):
        return {}
    return {int(k): v for k, v in json.load(open(path)).items()}


def _tp_key(topic: str, part: int) -> str:
    return f"{topic}\x00{part}"


class _TopicRangePartition(InputPartition):
    def __init__(self, path: str, topic: str, part: int,
                 start: int, end: int):
        self.path = path
        self.topic = topic
        self.part = part
        self.start = start
        self.end = end


_ARROW_CHUNK_ROWS = 8192


def _read_log_range(partition: _TopicRangePartition) -> Iterator:
    """Executor-side range read → Arrow record batches in the exact
    KAFKA_FRAME_SCHEMA shape, chunked at ``_ARROW_CHUNK_ROWS`` so a
    large batch-mode partition streams instead of materializing the
    whole range in one buffer. Lines [start, end) of an append-only
    JSONL log; a real connector would seek a byte index, the line scan
    is equivalent at fixture scale and still O(partition), not O(log)."""
    import itertools

    import pyarrow as pa

    def flush(keys, values, offs, tss):
        n = len(offs)
        return pa.RecordBatch.from_arrays(
            [pa.array(keys, pa.binary()),
             pa.array(values, pa.binary()),
             pa.array([partition.topic] * n, pa.string()),
             pa.array([partition.part] * n, pa.int32()),
             pa.array(offs, pa.int64()),
             pa.array(tss, pa.timestamp("us", tz="UTC")),
             pa.array([0] * n, pa.int32())],  # 0 = CreateTime enum
            names=[f.name for f in KAFKA_FRAME_SCHEMA.fields])

    lo, hi = partition.start, partition.end
    if hi <= lo:
        return
    keys, values, offs, tss = [], [], [], []
    with open(partition.path, encoding="utf-8") as f:
        for off, line in enumerate(itertools.islice(f, lo, hi), start=lo):
            rec = json.loads(line)
            k = rec.get("key")
            keys.append(None if k is None else k.encode())
            values.append(rec["value"].encode())
            offs.append(off)
            tss.append(rec.get("ts", 0) * 1000)  # ms → µs
            if len(offs) >= _ARROW_CHUNK_ROWS:
                yield flush(keys, values, offs, tss)
                keys, values, offs, tss = [], [], [], []
    if offs:
        yield flush(keys, values, offs, tss)


# ---------------------------------------------------------------------------
# streaming reader
# ---------------------------------------------------------------------------

class KafkaShapedStreamReader(DataSourceStreamReader):
    """Offsets are ``{topic: {str(partition): next_offset}}`` — JSON-able
    and directly comparable to Kafka's own checkpoint offset format."""

    def __init__(self, options: dict):
        options = _norm_options(options)
        self.root = options["path"]
        self.topics = _topic_dirs(self.root, options)
        self.fail_on_data_loss = json.loads(
            options.get("failondataloss", "true"))
        self.starting = options.get("startingoffsets", "earliest")
        cap = options.get("maxrecordspertrigger")
        self.max_per_trigger = int(cap) if cap is not None else None
        # planned high-water mark per (topic, partition) — ratcheted by
        # every offset Spark hands back (partitions() during WAL replay,
        # commit() at resume), same restart-safety pattern as
        # FixtureReplayStreamReader._observe: latestOffset must never
        # regress below checkpointed progress or old rows re-emit.
        self._planned: dict[str, int] = {}

    # -- offset bookkeeping -------------------------------------------------

    def _floor(self, topic: str, part: int) -> int:
        return _earliest_offsets(self.root, topic).get(part, 0)

    def initialOffset(self) -> dict:
        out: dict[str, dict[str, int]] = {}
        if self.starting.startswith("{"):
            want = json.loads(self.starting)
            for t, parts in self.topics.items():
                per = want.get(t, {})
                out[t] = {str(p): int(per.get(str(p), self._floor(t, p)))
                          for p in parts}
        else:
            latest = self.starting == "latest"
            for t, parts in self.topics.items():
                out[t] = {str(p): (_end_offset(self.root, t, p) if latest
                                   else self._floor(t, p))
                          for p in parts}
        for t, per in out.items():
            for p, off in per.items():
                self._observe(t, int(p), off)
        return out

    def _observe(self, topic: str, part: int, off: int) -> None:
        k = _tp_key(topic, part)
        if off > self._planned.get(k, -1):
            self._planned[k] = off

    def latestOffset(self) -> dict:
        ends = {(t, p): _end_offset(self.root, t, p)
                for t, parts in self.topics.items() for p in parts}
        bases = {tp: self._planned.get(_tp_key(*tp), self._floor(*tp))
                 for tp in ends}
        if self.max_per_trigger is not None:
            # Kafka's admission control: split the per-trigger record
            # budget across partitions proportional to backlog, so one
            # hot partition cannot starve the rest of the batch.
            backlog = {tp: max(0, ends[tp] - bases[tp]) for tp in ends}
            total = sum(backlog.values())
            if total > self.max_per_trigger:
                scale = self.max_per_trigger / total
                ends = {tp: bases[tp]
                        + max(1 if backlog[tp] else 0,
                              int(backlog[tp] * scale))
                        for tp in ends}
        out: dict[str, dict[str, int]] = {}
        for (t, p), end in ends.items():
            end = max(end, bases[(t, p)])  # never regress
            out.setdefault(t, {})[str(p)] = end
            self._observe(t, p, end)
        return out

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        parts: list[InputPartition] = []
        for t, per in end.items():
            for p_str, hi in per.items():
                p = int(p_str)
                lo = start.get(t, {}).get(p_str, self._floor(t, p))
                self._observe(t, p, hi)
                earliest = self._floor(t, p)
                if lo < earliest:
                    if self.fail_on_data_loss:
                        raise RuntimeError(
                            f"Offsets out of range for {t}-{p}: requested "
                            f"{lo}, earliest retained {earliest} (data "
                            f"loss). Set failOnDataLoss=false to skip "
                            f"expired ranges.")
                    lo = earliest  # Kafka's skip-and-continue behavior
                if hi > lo:
                    parts.append(_TopicRangePartition(
                        _log_path(self.root, t, p), t, p, lo, hi))
        return parts

    def read(self, partition: _TopicRangePartition) -> Iterator:
        return _read_log_range(partition)

    def commit(self, end: dict) -> None:
        for t, per in end.items():
            for p_str, off in per.items():
                self._observe(t, int(p_str), off)


# ---------------------------------------------------------------------------
# batch reader (spark.read over the same log — Kafka's batch mode)
# ---------------------------------------------------------------------------

class KafkaShapedBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        options = _norm_options(options)
        self.root = options["path"]
        self.topics = _topic_dirs(self.root, options)

    def partitions(self) -> list[InputPartition]:
        out = []
        for t, parts in self.topics.items():
            floors = _earliest_offsets(self.root, t)
            for p in parts:
                out.append(_TopicRangePartition(
                    _log_path(self.root, t, p), t, p,
                    floors.get(p, 0), _end_offset(self.root, t, p)))
        return out

    def read(self, partition: _TopicRangePartition) -> Iterator:
        return _read_log_range(partition)


class KafkaShapedSource(DataSource):
    """``spark.readStream.format("kafka_shaped")`` — Kafka's contract
    (7-col frame, subscribe/subscribePattern/assign, startingOffsets,
    failOnDataLoss, maxRecordsPerTrigger) over partitioned append-only
    logs. Options are case-insensitive like the real source's."""

    @classmethod
    def name(cls) -> str:
        return "kafka_shaped"

    def schema(self) -> StructType:
        # validate the subscription at .load() time (driver-side), the
        # way the real source fails fast on a bad option matrix —
        # deferring to streamReader() would surface the error
        # asynchronously after writeStream.start()
        opts = _norm_options(dict(self.options))
        _topic_dirs(opts["path"], opts)
        return KAFKA_FRAME_SCHEMA

    def reader(self, schema: StructType) -> KafkaShapedBatchReader:
        return KafkaShapedBatchReader(dict(self.options))

    def streamReader(self, schema: StructType) -> KafkaShapedStreamReader:
        return KafkaShapedStreamReader(dict(self.options))


def register_kafka_shaped(spark) -> None:
    """Idempotent registration (latest registration wins in Spark)."""
    spark.dataSource.register(KafkaShapedSource)
