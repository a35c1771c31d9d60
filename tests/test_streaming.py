"""Structured Streaming tests (SURVEY §5.2): file-source micro-batches,
watermarked dedup, update-mode incremental aggregates, batch/stream
window parity, checkpoint resume, foreachBatch upsert sinks."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F, types as T

from bigdata_project_hust_spark.operators.windows import tumbling_window_agg
from bigdata_project_hust_spark.streaming.pipeline import (
    dedup_stream, incremental_author_totals, json_file_stream,
    windowed_engagement)
from bigdata_project_hust_spark.streaming.sinks import KeyedParquetStore

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("value", T.DoubleType()),
])


def _write_events(path: str, name: str, rows: list[tuple]) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        for (eid, ts, uid, v) in rows:
            f.write(json.dumps({"event_id": eid, "ts": ts,
                                "user_id": uid, "value": v}) + "\n")


def _run_to_memory(df, name: str, mode: str, checkpoint: str):
    q = (df.writeStream.outputMode(mode).format("memory")
         .queryName(name).option("checkpointLocation", checkpoint).start())
    q.processAllAvailable()
    return q


def test_stream_dedup_drops_in_watermark_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    _write_events(src, "a.json", [
        (1, "2024-01-01 00:00:01", 7, 1.0),
        (1, "2024-01-01 00:00:01", 7, 1.0),   # exact duplicate
        (2, "2024-01-01 00:00:05", 7, 2.0),
    ])
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    dd = dedup_stream(stream, ["event_id"], "ts")
    q = _run_to_memory(dd, "dedup_out", "append", str(tmp_path / "ck"))
    try:
        got = spark.sql("SELECT event_id FROM dedup_out").collect()
        assert sorted(r.event_id for r in got) == [1, 2]
    finally:
        q.stop()


def test_incremental_totals_update_mode_matches_batch(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, f"2024-01-01 00:00:{i:02d}", i % 3, float(i)) for i in range(12)]
    _write_events(src, "a.json", rows[:6])
    _write_events(src, "b.json", rows[6:])
    stream = json_file_stream(spark, src, EVENT_SCHEMA,
                              max_files_per_trigger=1)  # force 2 micro-batches
    agg = incremental_author_totals(stream, "user_id", ["value"])
    q = _run_to_memory(agg, "totals_out", "update", str(tmp_path / "ck"))
    try:
        # memory sink in update mode appends updated rows per batch →
        # latest row per key is the current state
        got = spark.sql("""
          SELECT author, total_tweets, total_value, max_value FROM (
            SELECT *, row_number() OVER (
              PARTITION BY author ORDER BY total_tweets DESC) AS rn
            FROM totals_out) WHERE rn = 1
        """).collect()
        batch = spark.createDataFrame(
            [(r[0], r[1], r[2], r[3]) for r in rows],
            "event_id long, ts string, user_id long, value double")
        want = {r.author: r for r in incremental_author_totals(
            batch, "user_id", ["value"]).collect()}
        assert len(got) == 3
        for r in got:
            w = want[r.author]
            assert (r.total_tweets, r.total_value, r.max_value) == \
                   (w.total_tweets, w.total_value, w.max_value)
    finally:
        q.stop()


def test_windowed_engagement_stream_matches_batch_buckets(spark, tmp_path):
    src = str(tmp_path / "src")
    rows = [(i, f"2024-01-01 00:{i:02d}:30", 1, 1.0) for i in range(0, 30, 7)]
    _write_events(src, "a.json", rows)
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    win = windowed_engagement(stream, "ts", "user_id", 600, ["value"])
    q = _run_to_memory(win, "win_out", "update", str(tmp_path / "ck"))
    try:
        got = {(r.user_id, r.window_start): r.sum_value
               for r in spark.sql("SELECT * FROM win_out").collect()}
        batch = spark.createDataFrame(rows, "event_id long, ts string, "
                                            "user_id long, value double")
        batch = batch.withColumn("ts", F.to_timestamp("ts"))
        want = {(r.user_id, r.window_start): r.sum_value
                for r in tumbling_window_agg(
                    batch, "ts", "user_id", 600,
                    [F.sum("value").alias("sum_value")]).collect()}
        assert got == want  # F.window and epoch-bucket produce same buckets
    finally:
        q.stop()


def test_checkpoint_resume_no_dupes_no_drops(spark, tmp_path):
    """ST5: kill the query, add data, restart from the same checkpoint —
    counts must cover every file exactly once."""
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_events(src, "a.json", [(1, "2024-01-01 00:00:01", 1, 1.0)])
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    counts = stream.groupBy("user_id").agg(F.count("*").alias("n"))
    q = _run_to_memory(counts, "resume_out", "complete", ck)
    q.stop()
    _write_events(src, "b.json", [(2, "2024-01-01 00:00:02", 1, 1.0),
                                  (3, "2024-01-01 00:00:03", 2, 1.0)])
    stream2 = json_file_stream(spark, src, EVENT_SCHEMA)
    counts2 = stream2.groupBy("user_id").agg(F.count("*").alias("n"))
    q2 = _run_to_memory(counts2, "resume_out2", "complete", ck)
    try:
        got = {r.user_id: r.n
               for r in spark.sql("SELECT * FROM resume_out2").collect()}
        assert got == {1: 2, 2: 1}
    finally:
        q2.stop()


def test_keyed_store_replace_and_merge(spark, tmp_path):
    store = KeyedParquetStore(spark, str(tmp_path / "store"), "k")
    b1 = spark.createDataFrame([("a", 1), ("b", 2)], "k string, n int")
    store.upsert_replace(b1, epoch_id=0)
    b2 = spark.createDataFrame([("b", 9), ("c", 3)], "k string, n int")
    store.upsert_replace(b2, epoch_id=1)
    got = {r.k: r.n for r in store.read().collect()}
    assert got == {"a": 1, "b": 9, "c": 3}
    # retried epoch is a no-op (exactly-once effect)
    store.upsert_replace(b2, epoch_id=1)
    assert {r.k: r.n for r in store.read().collect()} == got

    mstore = KeyedParquetStore(spark, str(tmp_path / "mstore"), "k")
    a1 = spark.createDataFrame([("a", 2, 5.0, 5.0)],
                               "k string, cnt long, sv double, mv double")
    a2 = spark.createDataFrame([("a", 1, 3.0, 3.0), ("b", 1, 1.0, 1.0)],
                               "k string, cnt long, sv double, mv double")
    mstore.upsert_merge(a1, ["sv"], ["mv"], "cnt", epoch_id=0)
    mstore.upsert_merge(a2, ["sv"], ["mv"], "cnt", epoch_id=1)
    got = {r.k: (r.cnt, r.sv, r.mv) for r in mstore.read().collect()}
    assert got == {"a": (3, 8.0, 5.0), "b": (1, 1.0, 1.0)}


def test_streaming_observed_metrics_in_progress(spark, tmp_path):
    """The observe node surfaces per-micro-batch metrics in streaming
    progress — the drop-accounting path for continuous curation."""
    from bigdata_project_hust_spark.observability import observed
    src = str(tmp_path / "src")
    _write_events(src, "a.json", [(1, "2024-01-01 00:00:01", 1, 10.0),
                                  (2, "2024-01-01 00:00:02", 2, 20.0),
                                  (3, "2024-01-01 00:00:03", 1, 30.0)])
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    instrumented, _ = observed(stream, "ingest",
                               {"n": F.count(F.lit(1)),
                                "sum_value": F.sum("value")})
    q = _run_to_memory(instrumented, "obs_out", "append",
                       str(tmp_path / "ck"))
    try:
        got = q.lastProgress["observedMetrics"]["ingest"]
        assert got["n"] == 3 and got["sum_value"] == 60.0
    finally:
        q.stop()


def test_round_robin_replay_semantics(spark):
    """S3 (producer.py:84-99): each tick emits exactly one record per
    collection; cursors wrap independently on exhaustion (the
    reference's reset loop). Verified on a batch ticks frame — the
    streaming variant shares this exact code path."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        replay_from_ticks)
    projects = spark.createDataFrame(
        [(10, "p-a"), (11, "p-b")], "pid long, pname string")
    users = spark.createDataFrame(
        [(1, "u-a"), (2, "u-b"), (3, "u-c")], "uid long, uname string")
    ticks = spark.createDataFrame(
        [(i, "2024-01-01 00:00:%02d" % i) for i in range(6)],
        "value long, timestamp string").select(
        "value", F.col("timestamp").cast("timestamp").alias("timestamp"))
    out = replay_from_ticks(
        ticks, {"projects_topic": (projects, "pid"),
                "users_topic": (users, "uid")})
    got = {(r.tick, r.topic): json.loads(r.payload)
           for r in out.collect()}
    assert len(got) == 12  # 6 ticks × 2 topics — one record per coll/tick
    # 2-row projects table wraps with period 2; 3-row users with 3
    assert [got[(t, "projects_topic")]["pid"] for t in range(6)] == [
        10, 11, 10, 11, 10, 11]
    assert [got[(t, "users_topic")]["uid"] for t in range(6)] == [
        1, 2, 3, 1, 2, 3]


def test_rate_replay_stream_live(spark, tmp_path):
    """The streaming S3 source end-to-end: rate-micro-batch ticks →
    stream-static round-robin joins → memory sink."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        rate_replay_stream)
    users = spark.createDataFrame(
        [(1, "u-a"), (2, "u-b")], "uid long, uname string")
    stream = rate_replay_stream(
        spark, {"users_topic": (users, "uid")},
        rate_format="rate-micro-batch",
        rate_options={"rowsPerBatch": "4", "startTimestamp": "0",
                      "advanceMillisPerBatch": "1000"})
    q = (stream.writeStream.format("memory").queryName("replay_out")
               .option("checkpointLocation", str(tmp_path / "ck"))
               .outputMode("append").start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("SELECT * FROM replay_out").count() >= 4:
                break
            time.sleep(0.5)
        rows = {r.tick: json.loads(r.payload)["uid"]
                for r in spark.sql("SELECT * FROM replay_out").collect()}
        assert [rows[t] for t in range(4)] == [1, 2, 1, 2]
    finally:
        q.stop()


def test_keyed_store_crash_before_commit_is_replay_safe(spark, tmp_path):
    """Data and epoch promote atomically: a crash AFTER the new parquet
    version is written but BEFORE the manifest rename must leave the
    store on the previous snapshot with the epoch unrecorded, so the
    foreachBatch retry re-applies the merge exactly once (no double-
    $inc — the round-1 advisor's non-atomic-commit hazard)."""
    import os as _os

    store = KeyedParquetStore(spark, str(tmp_path / "cstore"), "k")
    a1 = spark.createDataFrame([("a", 2, 5.0, 5.0)],
                               "k string, cnt long, sv double, mv double")
    a2 = spark.createDataFrame([("a", 1, 3.0, 3.0)],
                               "k string, cnt long, sv double, mv double")
    store.upsert_merge(a1, ["sv"], ["mv"], "cnt", epoch_id=0)

    real_replace = _os.replace

    def crash_replace(src, dst):  # dies at the commit point
        raise OSError("simulated crash before manifest rename")

    _os.replace = crash_replace
    try:
        with pytest.raises(OSError, match="simulated crash"):
            store.upsert_merge(a2, ["sv"], ["mv"], "cnt", epoch_id=1)
    finally:
        _os.replace = real_replace

    # pre-crash snapshot still live and readable; epoch 1 unrecorded
    assert {r.k: (r.cnt, r.sv) for r in store.read().collect()} == {
        "a": (2, 5.0)}
    # retry (fresh store object = query restart) applies exactly once
    store2 = KeyedParquetStore(spark, str(tmp_path / "cstore"), "k")
    store2.upsert_merge(a2, ["sv"], ["mv"], "cnt", epoch_id=1)
    store2.upsert_merge(a2, ["sv"], ["mv"], "cnt", epoch_id=1)  # redelivery
    assert {r.k: (r.cnt, r.sv, r.mv) for r in store2.read().collect()} == {
        "a": (3, 8.0, 5.0)}


def test_stateful_threshold_alerts_emit_once(spark, tmp_path):
    """ST3 (applyInPandasWithState): alert exactly once per key, the
    first micro-batch in which its running total crosses the threshold;
    later batches never re-alert."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        stateful_threshold_alerts)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    # batch 1: user 1 total 30 (below), user 2 total 60 (crosses)
    _write_events(src, "a.json", [(1, "2024-01-01 00:00:01", 1, 30.0),
                                  (2, "2024-01-01 00:00:02", 2, 60.0)])
    # batch 2: user 1 crosses (30+25=55); user 2 adds more (no re-alert)
    _write_events(src, "b.json", [(3, "2024-01-01 00:00:03", 1, 25.0),
                                  (4, "2024-01-01 00:00:04", 2, 10.0)])
    stream = json_file_stream(spark, src, EVENT_SCHEMA,
                              max_files_per_trigger=1)
    alerts = stateful_threshold_alerts(stream, "user_id", "value", 50.0)
    q = _run_to_memory(alerts, "alerts_out", "append", ck)
    try:
        got = {r.user_id: r.total
               for r in spark.sql("SELECT * FROM alerts_out").collect()}
        n = spark.sql("SELECT count(*) AS n FROM alerts_out").collect()[0].n
        assert n == 2                       # one alert per key, ever
        assert got[2] == 60.0               # crossed in its first batch
        assert got[1] == 55.0               # crossed on the second batch
    finally:
        q.stop()


def test_stream_stream_interval_join(spark, tmp_path):
    """Two file streams joined on key within a 60-second interval:
    only right events in [left_ts - 60s, left_ts] match."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        stream_stream_interval_join)
    clicks_dir, views_dir = str(tmp_path / "clicks"), str(tmp_path / "views")
    _write_events(clicks_dir, "a.json", [
        (100, "2024-01-01 00:01:00", 1, 1.0),   # matches view at 00:00:30
        (101, "2024-01-01 00:05:00", 1, 1.0),   # no view within 60s
        (102, "2024-01-01 00:01:00", 2, 1.0),   # wrong-user view only
    ])
    _write_events(views_dir, "b.json", [
        (200, "2024-01-01 00:00:30", 1, 9.0),
        (201, "2024-01-01 00:03:00", 1, 9.0),
        (202, "2024-01-01 00:00:45", 3, 9.0),
    ])
    clicks = json_file_stream(spark, clicks_dir, EVENT_SCHEMA) \
        .withColumnRenamed("event_id", "click_id") \
        .withColumnRenamed("ts", "click_ts").drop("value")
    views = json_file_stream(spark, views_dir, EVENT_SCHEMA) \
        .withColumnRenamed("event_id", "view_id") \
        .withColumnRenamed("ts", "view_ts") \
        .withColumnRenamed("user_id", "v_user_id").drop("value")
    j = stream_stream_interval_join(
        clicks, views.withColumnRenamed("v_user_id", "user_id"),
        "user_id", "click_ts", "view_ts", 60)
    out = j.select("click_id", "view_id")
    q = _run_to_memory(out, "ssj_out", "append", str(tmp_path / "ck"))
    try:
        got = {(r.click_id, r.view_id)
               for r in spark.sql("SELECT * FROM ssj_out").collect()}
        assert got == {(100, 200)}
    finally:
        q.stop()


def test_rate_source_replay_shape(spark, tmp_path):
    """S3: the reference's round-robin replay producer (one record per
    collection per tick, producer.py:84-99) maps onto the rate source —
    each tick joined against a broadcast fixture by row index."""
    fixture = spark.createDataFrame(
        [(0, "projects"), (1, "tweets"), (2, "users")],
        "idx long, collection string")
    rate = (spark.readStream.format("rate")
            .option("rowsPerSecond", "50").load()
            .withColumn("idx", F.col("value") % 3))
    replay = rate.join(F.broadcast(fixture), "idx") \
                 .select("value", "collection")
    q = (replay.writeStream.outputMode("append").format("memory")
         .queryName("replay_out")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        import time as _t
        deadline = _t.time() + 30
        n = 0
        while _t.time() < deadline:
            n = spark.sql("SELECT count(*) AS n FROM replay_out") \
                     .collect()[0].n
            if n >= 6:
                break
            _t.sleep(1)
        assert n >= 6
        got = spark.sql(
            "SELECT DISTINCT collection FROM replay_out").collect()
        assert {r.collection for r in got} == {"projects", "tweets", "users"}
    finally:
        q.stop()


def test_speed_layer_end_to_end(spark, tmp_path):
    """§3.1 lifecycle: streamed twitter_users JSON → preprocess chain
    (F2 rewrite + P1 projection + F1 score) → P2 KOL filter →
    foreachBatch upsert store. The same preprocess_users function runs
    in batch queries — parity by construction."""
    import json as _json
    from bigdata_project_hust_spark.operators.projections import (
        kol_filter, preprocess_users)
    from bigdata_project_hust_spark.schemas import TWITTER_USERS
    from bigdata_project_hust_spark.streaming.sinks import KeyedParquetStore

    src = tmp_path / "users"
    src.mkdir()
    users = [
        # score = 200*0.5 + 10*0.3 - 5*0.2 = 102 → KOL; name rewritten
        {"_id": "u1", "userName": "twitter_fan", "url": "http://x/u1",
         "followersCount": 200, "statusesCount": 10, "friendsCount": 5,
         "blue": True, "location": "VN"},
        # score = 20*0.5 = 10 → not a KOL
        {"_id": "u2", "userName": "small", "url": "http://x/u2",
         "followersCount": 20, "statusesCount": None, "friendsCount": None,
         "blue": None, "location": None},
        # boundary: exactly 50 → KOL (>= threshold)
        {"_id": "u3", "userName": "edge", "url": "http://x/u3",
         "followersCount": 100, "statusesCount": 0, "friendsCount": 0,
         "blue": False, "location": "US"},
    ]
    with open(src / "batch0.json", "w") as f:
        for u in users:
            f.write(_json.dumps(u) + "\n")

    store = KeyedParquetStore(spark, str(tmp_path / "kols"), "_id")
    stream = json_file_stream(spark, str(src), TWITTER_USERS)
    kols = kol_filter(preprocess_users(stream))
    q = (kols.writeStream.outputMode("append")
         .foreachBatch(lambda df, eid: store.upsert_replace(df, eid))
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    q.processAllAvailable()
    q.stop()
    got = {r["_id"]: r for r in store.read().collect()}
    assert set(got) == {"u1", "u3"}
    assert got["u1"]["userName"] == "x_fan"          # F2 value rewrite
    assert got["u1"]["influence_score"] == 102.0
    assert got["u3"]["influence_score"] == 50.0      # inclusive boundary


def test_stateful_alerts_state_survives_restart(spark, tmp_path):
    """applyInPandasWithState state lives in the checkpoint: restart
    the query, feed more data, and a key that already alerted must NOT
    re-alert; a key that accumulated below threshold pre-restart must
    alert once its post-restart total crosses."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        stateful_threshold_alerts)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    _write_events(src, "a.json", [(1, "2024-01-01 00:00:01", 1, 60.0),
                                  (2, "2024-01-01 00:00:02", 2, 30.0)])
    out = str(tmp_path / "alerts_out")

    def run_once():
        stream = json_file_stream(spark, src, EVENT_SCHEMA)
        alerts = stateful_threshold_alerts(stream, "user_id", "value", 50.0)
        q = (alerts.writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ck).start())
        q.processAllAvailable()
        q.stop()

    run_once()                                   # user 1 alerts (60)
    _write_events(src, "b.json", [(3, "2024-01-01 00:00:03", 1, 5.0),
                                  (4, "2024-01-01 00:00:04", 2, 25.0)])
    run_once()                                   # restart from checkpoint
    got = {}
    for r in spark.read.parquet(out).collect():
        got.setdefault(r.user_id, []).append(r.total)
    # one alert per key across BOTH runs: user 1 only pre-restart (60),
    # user 2 only post-restart (30+25=55) — no re-alert after resume
    assert got == {1: [60.0], 2: [55.0]}


def test_streaming_session_window_matches_batch(spark, tmp_path):
    """ST9 streaming: F.session_window with a watermark in append mode
    emits finalized sessions identical to the batch session_window
    aggregation over the same events (a far-future sentinel event
    advances the watermark so all real sessions close)."""
    src = str(tmp_path / "src")
    rows = [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (2, "2024-01-01 00:00:10", 1, 1.0),   # same session (gap 10s < 30s)
        (3, "2024-01-01 00:01:00", 1, 1.0),   # new session (gap 50s)
        (4, "2024-01-01 00:00:05", 2, 1.0),
    ]
    sentinel = [(99, "2024-01-02 00:00:00", 99, 0.0)]
    _write_events(src, "a.json", rows)
    _write_events(src, "b.json", sentinel)
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    agg = (stream.withWatermark("ts", "1 minute")
           .groupBy("user_id", F.session_window("ts", "30 seconds"))
           .agg(F.count("*").alias("n_events"))
           .select("user_id",
                   F.unix_timestamp("session_window.start")
                    .alias("start_s"), "n_events"))
    q = _run_to_memory(agg, "sess_out", "append", str(tmp_path / "ck"))
    try:
        got = {(r.user_id, r.start_s): r.n_events
               for r in spark.sql(
                   "SELECT * FROM sess_out WHERE user_id != 99").collect()}
        base = 1704067200  # 2024-01-01 UTC
        assert got == {(1, base): 2, (1, base + 60): 1, (2, base + 5): 1}
    finally:
        q.stop()


def test_windowed_agg_drops_late_data(spark, tmp_path):
    """ST8: an event arriving after the watermark has passed its
    window is DROPPED from the append-mode windowed aggregate (the
    reference has no late-data concept — this is the documented
    semantic delta)."""
    src = str(tmp_path / "src")
    _write_events(src, "a.json", [
        (1, "2024-01-01 00:00:05", 1, 1.0),     # window [0, 600)
        (2, "2024-01-01 01:00:00", 1, 1.0),     # advances watermark far
    ])
    stream = json_file_stream(spark, src, EVENT_SCHEMA,
                              max_files_per_trigger=1)
    agg = windowed_engagement(stream, "ts", "user_id", 600, ["value"],
                              watermark="10 minutes")
    q = _run_to_memory(agg, "late_out", "append", str(tmp_path / "ck"))
    # batch 2: a LATE event for the long-closed [0, 600) window
    _write_events(src, "b.json", [(3, "2024-01-01 00:00:10", 1, 99.0)])
    q.processAllAvailable()
    # flush: advance watermark again so closed windows emit
    _write_events(src, "c.json", [(4, "2024-01-01 02:00:00", 1, 1.0)])
    q.processAllAvailable()
    try:
        rows = {(r.user_id, r.window_start): r.sum_value
                for r in spark.sql("SELECT * FROM late_out").collect()}
        base = 1704067200
        # the late 99.0 never lands: window [base, base+600) sums 1.0
        assert rows.get((1, base)) == 1.0
    finally:
        q.stop()


def test_stream_stream_outer_join_emits_unmatched_after_watermark(
        spark, tmp_path):
    """LEFT OUTER interval join: matched pairs emit immediately;
    unmatched left events emit with NULL right columns only after the
    watermark (advanced by a later second batch) passes their join
    window — never before, never twice."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        stream_stream_interval_join_outer)
    clicks_dir, views_dir = str(tmp_path / "c"), str(tmp_path / "v")
    _write_events(clicks_dir, "a.json", [
        (100, "2024-01-01 00:01:00", 1, 1.0),   # matches view 200
        (101, "2024-01-01 00:05:00", 1, 1.0),   # no view in window
    ])
    _write_events(views_dir, "a.json", [
        (200, "2024-01-01 00:00:30", 1, 9.0),
    ])
    clicks = json_file_stream(spark, clicks_dir, EVENT_SCHEMA) \
        .withColumnRenamed("event_id", "click_id") \
        .withColumnRenamed("ts", "click_ts").drop("value")
    views = json_file_stream(spark, views_dir, EVENT_SCHEMA) \
        .withColumnRenamed("event_id", "view_id") \
        .withColumnRenamed("ts", "view_ts") \
        .withColumnRenamed("user_id", "vu").drop("value")
    j = stream_stream_interval_join_outer(
        clicks, views.withColumnRenamed("vu", "user_id"),
        "user_id", "click_ts", "view_ts", 60, watermark="1 minutes")
    out = j.select("click_id", "view_id")
    q = _run_to_memory(out, "ssj_outer", "append", str(tmp_path / "ck"))
    try:
        first = {(r.click_id, r.view_id)
                 for r in spark.sql("SELECT * FROM ssj_outer").collect()}
        assert (100, 200) in first
        assert (101, None) not in first      # watermark hasn't passed yet
        # batch 2: far-future events on BOTH sides push both watermarks
        # past click 101's window → its outer row must flush
        _write_events(clicks_dir, "b.json",
                      [(110, "2024-01-01 01:00:00", 9, 1.0)])
        _write_events(views_dir, "b.json",
                      [(210, "2024-01-01 01:00:00", 9, 9.0)])
        q.processAllAvailable()
        # one more micro-batch so the eviction output itself commits
        _write_events(clicks_dir, "c.json",
                      [(111, "2024-01-01 02:00:00", 9, 1.0)])
        _write_events(views_dir, "c.json",
                      [(211, "2024-01-01 02:00:00", 9, 9.0)])
        q.processAllAvailable()
        got = [ (r.click_id, r.view_id)
                for r in spark.sql("SELECT * FROM ssj_outer").collect()]
        assert got.count((101, None)) == 1
        assert got.count((100, 200)) == 1
    finally:
        q.stop()


def test_transform_with_state_matches_legacy_alerter(spark, tmp_path):
    """The transformWithStateInPandas alerter (Spark 4 API) and the
    applyInPandasWithState one must emit IDENTICAL alerts on the same
    two-micro-batch input: one alert per key on first crossing, keys
    that never cross stay silent, crossings spanning batches fire in
    the later batch.

    transformWithState talks to its state server over protobuf, which
    this container does not ship — the test runs wherever
    ``google.protobuf`` exists (same gate class as Kafka/PIL: the code
    is complete, the infrastructure is absent)."""
    pytest.importorskip("google.protobuf")
    from bigdata_project_hust_spark.streaming.pipeline import (
        stateful_threshold_alerts, stateful_threshold_alerts_tws)
    old_provider = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")   # TWS requires RocksDB
    outs = {}
    try:
        _run_both_alerters(spark, tmp_path, outs,
                           stateful_threshold_alerts,
                           stateful_threshold_alerts_tws)
    finally:
        # restore on ANY failure — this fixture session is shared by
        # every later streaming test
        if old_provider:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass",
                old_provider)
        else:
            spark.conf.unset(
                "spark.sql.streaming.stateStore.providerClass")
    assert outs["legacy"] == outs["tws"] == {(1, 55.0), (2, 60.0)}


def _run_both_alerters(spark, tmp_path, outs, legacy_op, tws_op):
    for label, op in [("legacy", legacy_op), ("tws", tws_op)]:
        d = str(tmp_path / label)
        _write_events(d, "a.json", [
            (1, "2024-01-01 00:00:00", 1, 30.0),   # u1: 30 — below
            (2, "2024-01-01 00:00:01", 2, 60.0),   # u2: 60 — crosses now
            (3, "2024-01-01 00:00:02", 3, 10.0),   # u3: never crosses
        ])
        stream = json_file_stream(spark, d, EVENT_SCHEMA)
        q = _run_to_memory(op(stream, "user_id", "value", 50.0),
                           f"alerts_{label}", "append",
                           str(tmp_path / f"ck_{label}"))
        try:
            _write_events(d, "b.json", [
                (4, "2024-01-01 00:01:00", 1, 25.0),  # u1: 55 — crosses
                (5, "2024-01-01 00:01:01", 2, 10.0),  # u2: already alerted
            ])
            q.processAllAvailable()
            outs[label] = {(r.user_id, round(r.total, 6)) for r in
                           spark.sql(f"SELECT * FROM alerts_{label}")
                           .collect()}
        finally:
            q.stop()


def test_available_now_incremental_batch_runs(spark, tmp_path):
    """Trigger.AvailableNow — the production incremental-batch pattern:
    each invocation drains everything new since the checkpoint and
    TERMINATES. Run 1 processes the initial files and stops; run 2
    with the same checkpoint processes ONLY the files added in
    between; a no-new-data run appends nothing."""
    src, ck, out = (str(tmp_path / d) for d in ("src", "ck", "out"))
    _write_events(src, "a.json", [
        (1, "2024-01-01 00:00:00", 1, 1.0),
        (2, "2024-01-01 00:00:01", 2, 2.0)])

    def run_once():
        stream = json_file_stream(spark, src, EVENT_SCHEMA)
        q = (stream.select("event_id", "user_id", "value")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ck)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        assert not q.isActive          # run-and-terminate, not continuous
        return {r.event_id for r in spark.read.parquet(out).collect()}

    assert run_once() == {1, 2}
    _write_events(src, "b.json", [(3, "2024-01-01 00:01:00", 3, 3.0)])
    assert run_once() == {1, 2, 3}     # only the delta was reprocessed
    assert run_once() == {1, 2, 3}     # idempotent on no new data


def test_rocksdb_state_store_incremental_totals(spark, tmp_path):
    """The production state backend: the same update-mode incremental
    aggregation runs on the RocksDB state store provider (bounded
    executor heap, changelog-checkpointed at scale) and produces the
    same totals the default provider does across two micro-batches."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        incremental_author_totals)
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(provider_key, None)
    spark.conf.set(provider_key,
                   "org.apache.spark.sql.execution.streaming.state."
                   "RocksDBStateStoreProvider")
    try:
        d = str(tmp_path / "in")
        _write_events(d, "a.json", [
            (1, "2024-01-01 00:00:00", 1, 10.0),
            (2, "2024-01-01 00:00:01", 1, 5.0),
            (3, "2024-01-01 00:00:02", 2, 7.0)])
        stream = json_file_stream(spark, d, EVENT_SCHEMA) \
            .withColumnRenamed("user_id", "author")
        q = _run_to_memory(
            incremental_author_totals(stream, "author", ["value"]),
            "rocks_totals", "update", str(tmp_path / "ck"))
        try:
            _write_events(d, "b.json",
                          [(4, "2024-01-01 00:01:00", 1, 2.0)])
            q.processAllAvailable()
            # update mode re-emits a key per batch; keep the latest row
            rows = spark.sql("SELECT * FROM rocks_totals").collect()
            latest = {}
            for r in rows:
                latest[r.author] = r
            assert latest[1].total_value == 17.0
            assert latest[1].total_tweets == 3
            assert latest[2].total_value == 7.0
        finally:
            q.stop()
    finally:
        if old:
            spark.conf.set(provider_key, old)
        else:
            spark.conf.unset(provider_key)


def test_full_reference_pipeline_with_custom_source(spark, tmp_path):
    """The reference's whole pipeline — replay producer (producer.py
    round-robin) → projection with ingest timestamp (consumer1.py) →
    insert-if-absent dedup (consumer1.py find_one-then-skip) → keyed
    upsert store (consumer2.py) → serving read — end to end on the
    custom Python Data Source stream instead of Kafka."""
    from pyspark.sql import functions as F
    from bigdata_project_hust_spark.sources import register_fixture_replay
    from bigdata_project_hust_spark.streaming.pipeline import dedup_stream
    from bigdata_project_hust_spark.streaming.sinks import KeyedParquetStore

    register_fixture_replay(spark)
    path = "/root/testdata/sf0.001/lineitem.parquet"
    raw = (spark.readStream.format("fixture_replay")
           .option("path", path).option("batch_rows", 2500).load())
    projected = (raw.select("l_orderkey", "l_extendedprice")
                 .withColumn("ingest_ts", F.current_timestamp()))
    deduped = dedup_stream(projected, ["l_orderkey"], "ingest_ts")
    store = KeyedParquetStore(spark, str(tmp_path / "store"), "l_orderkey")
    q = (deduped.writeStream
         .foreachBatch(lambda b, e: store.upsert_replace(b, e))
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    served = store.read()
    n_keys = (spark.read.parquet(path)
              .select("l_orderkey").distinct().count())
    assert served.count() == n_keys
    assert served.select("l_orderkey").distinct().count() == n_keys
    assert set(served.columns) >= {"l_orderkey", "l_extendedprice",
                                   "ingest_ts"}


def test_cms_grid_builds_incrementally_over_stream(spark, tmp_path):
    """The count-min grid is a plain groupBy-count, so the SAME
    operator runs over a file stream with outputMode=complete and
    converges to the batch grid bit-for-bit once both micro-batches
    are absorbed — sketch state bounded at d*w cells forever."""
    from pyspark.sql import functions as F

    from bigdata_project_hust_spark.operators.sketches import cms_grid

    rows1 = [(f"k{i % 5}",) for i in range(200)]
    rows2 = [(f"k{i % 3}",) for i in range(100)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows1, "v string").coalesce(1) \
        .write.mode("append").parquet(str(src))
    spark.createDataFrame(rows2, "v string").coalesce(1) \
        .write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema("v string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (cms_grid(stream, "v").writeStream
         .format("memory").queryName("cms_stream")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM cms_stream").collect())
    want_df = spark.createDataFrame(rows1 + rows2, "v string")
    want = sorted(tuple(r) for r in cms_grid(want_df, "v").collect())
    assert got == want and len(got) > 0


def test_hll_registers_build_incrementally_over_stream(spark, tmp_path):
    """HLL registers are a groupBy-max — the same operator runs over a
    stream (outputMode complete) and converges to the batch register
    table exactly, so the distinct sketch can be maintained
    incrementally with state bounded at m rows."""
    from pyspark.sql import functions as F

    from bigdata_project_hust_spark.operators.sketches import (
        hll_registers)

    src = tmp_path / "src"
    src.mkdir()
    spark.range(0, 500).select(F.col("id").cast("string").alias("v")) \
        .coalesce(1).write.mode("append").parquet(str(src))
    spark.range(400, 800).select(F.col("id").cast("string").alias("v")) \
        .coalesce(1).write.mode("append").parquet(str(src))

    stream = (spark.readStream.schema("v string")
              .option("maxFilesPerTrigger", 1).parquet(str(src)))
    q = (hll_registers(stream, "v").writeStream
         .format("memory").queryName("hll_stream")
         .outputMode("complete").start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(tuple(r) for r in
                 spark.sql("SELECT * FROM hll_stream").collect())
    want_df = spark.range(0, 800).select(
        F.col("id").cast("string").alias("v"))
    want = sorted(tuple(r) for r in hll_registers(want_df, "v").collect())
    assert got == want and len(got) > 0


def test_streaming_ohlc_matches_batch(spark, tmp_path):
    """OHLC bars computed over a file stream (update mode) equal the
    batch ohlc_resample on the same rows — min_by/max_by are plain
    mergeable aggregates, so the streaming twin is the SAME operator
    applied to readStream."""
    from bigdata_project_hust_spark.operators.windows import ohlc_resample
    src = str(tmp_path / "src")
    rows = [(i, f"2024-01-01 00:{i:02d}:00", 1 + i % 2, float(10 - i))
            for i in range(8)]
    _write_events(src, "a.json", rows)
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    s_ohlc = ohlc_resample(
        stream.withColumn("value_c",
                          F.floor(F.col("value") * 100 + 0.5).cast("long")),
        "ts", "user_id", "value_c", 300, "event_id")
    q = _run_to_memory(s_ohlc, "ohlc_out", "update", str(tmp_path / "ck"))
    try:
        got = {(r.user_id, r.bucket_start):
               (r.open, r.high, r.low, r.close, r.n_events)
               for r in spark.sql("SELECT * FROM ohlc_out").collect()}
        batch = spark.createDataFrame(
            rows, "event_id long, ts string, user_id long, value double")
        batch = (batch.withColumn("ts", F.to_timestamp("ts"))
                      .withColumn("value_c",
                                  F.floor(F.col("value") * 100 + 0.5)
                                  .cast("long")))
        want = {(r.user_id, r.bucket_start):
                (r.open, r.high, r.low, r.close, r.n_events)
                for r in ohlc_resample(batch, "ts", "user_id",
                                       "value_c", 300,
                                       "event_id").collect()}
        assert got == want and len(want) >= 2
    finally:
        q.stop()


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static broadcast enrichment: a streaming event frame
    joins a static dimension without watermarks (static side never
    changes mid-query) — the standard speed-layer enrich shape."""
    src = str(tmp_path / "src")
    _write_events(src, "a.json", [(1, "2024-01-01 00:00:01", 1, 5.0),
                                  (2, "2024-01-01 00:00:02", 2, 7.0),
                                  (3, "2024-01-01 00:00:03", 9, 1.0)])
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")],
                                "user_id long, tier string")
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    enriched = (stream.join(F.broadcast(dim), "user_id")
                      .select("event_id", "tier"))
    q = _run_to_memory(enriched, "enrich_out", "append",
                       str(tmp_path / "ck"))
    try:
        got = {(r.event_id, r.tier)
               for r in spark.sql("SELECT * FROM enrich_out").collect()}
        assert got == {(1, "gold"), (2, "silver")}  # user 9 dropped
    finally:
        q.stop()


def test_streaming_topk_complete_mode(spark, tmp_path):
    """Global top-k over a stream in complete output mode: per-user
    totals ordered with a deterministic tie-break, limit 2 — matches
    the batch top-k on the same rows."""
    src = str(tmp_path / "src")
    rows = [(i, f"2024-01-01 00:00:{i:02d}", i % 3, float(i))
            for i in range(9)]
    _write_events(src, "a.json", rows)
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    top = (stream.groupBy("user_id")
                 .agg(F.sum("value").alias("total"))
                 .orderBy(F.col("total").desc(), F.col("user_id").asc())
                 .limit(2))
    q = _run_to_memory(top, "topk_out", "complete", str(tmp_path / "ck"))
    try:
        got = [(r.user_id, r.total)
               for r in spark.sql(
                   "SELECT * FROM topk_out ORDER BY total DESC").collect()]
        # totals: u0=0+3+6=9, u1=1+4+7=12, u2=2+5+8=15
        assert got == [(2, 15.0), (1, 12.0)]
    finally:
        q.stop()


def test_cusum_stream_alerts_across_batches(spark, tmp_path):
    """Streaming CUSUM (recursive form, fixed target 10.00): user 1's
    drift accumulates ACROSS micro-batches (state carries) and alarms
    exactly once at the crossing event; user 2 stays below h and
    never alarms."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        cusum_stream, json_file_stream)
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    # target 1000c, h 2000c. user 1: +1500c drift in batch 1 (c=1500,
    # below), +1500c again in batch 2 → c=3000 crosses at event 3.
    # user 2: −500c then +500c → c stays ≤ 0+500.
    _write_events(src, "a.json", [(1, "2024-01-01 00:00:01", 1, 25.0),
                                  (2, "2024-01-01 00:00:02", 2, 5.0)])
    _write_events(src, "b.json", [(3, "2024-01-01 00:00:03", 1, 25.0),
                                  (4, "2024-01-01 00:00:04", 2, 15.0)])
    stream = json_file_stream(spark, src, EVENT_SCHEMA,
                              max_files_per_trigger=1)
    alerts = cusum_stream(stream, target_c=1000, h_c=2000)
    q = _run_to_memory(alerts, "cusum_out", "append", ck)
    try:
        rows = spark.sql("SELECT * FROM cusum_out").collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.user_id, r.alarm_event_id, r.cusum_c) == (1, 3, 3000)
    finally:
        q.stop()


def test_kafka_source_option_contract():
    """S4/ST1 contract pin (no broker in this container): the exact
    option matrix the Kafka source receives — failOnDataLoss defaults
    to Spark's safe ``true`` with loss-tolerance an explicit per-job
    opt-out (ADVICE r5) — plus startingOffsets validation."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        kafka_source_options)
    assert kafka_source_options("b1:9092,b2:9092", "topicA,topicB") == {
        "kafka.bootstrap.servers": "b1:9092,b2:9092",
        "subscribe": "topicA,topicB",
        "startingOffsets": "earliest",
        "failOnDataLoss": "true",
    }
    assert kafka_source_options(
        "b:9092", "t", starting_offsets="latest",
        fail_on_data_loss=False)["startingOffsets"] == "latest"
    assert kafka_source_options(
        "b:9092", "t", fail_on_data_loss=False)["failOnDataLoss"] == "false"
    offs = '{"t":{"0":42}}'
    assert kafka_source_options(
        "b:9092", "t", starting_offsets=offs)["startingOffsets"] == offs
    with pytest.raises(ValueError, match="startingOffsets"):
        kafka_source_options("b:9092", "t", starting_offsets="bogus")


def test_parse_kafka_frame_handles_full_source_schema(spark):
    """parse_kafka_frame must accept the REAL Kafka source shape — all
    seven columns (key/value binary, topic, partition, offset,
    timestamp, timestampType), not just the two it reads — and parse
    multi-topic values losslessly (round trip through
    kafka_sink_frame's JSON encoding)."""
    from bigdata_project_hust_spark.io import kafka_sink_frame
    from bigdata_project_hust_spark.streaming.pipeline import (
        parse_kafka_frame)
    schema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
    ])
    rows = spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, -3.25), (3, None, None)],
        "event_id long, user_id long, value double")
    sink = kafka_sink_frame(rows, "event_id")
    # decorate with the full source schema a live broker would deliver
    recorded = sink.select(
        "key", "value",
        F.when(F.col("key").cast("string") == "1", "topicA")
         .otherwise("topicB").alias("topic"),
        F.lit(0).alias("partition"),
        F.monotonically_increasing_id().alias("offset"),
        F.current_timestamp().alias("timestamp"),
        F.lit(0).alias("timestampType"))
    out = parse_kafka_frame(recorded, schema)
    assert out.columns == ["topic", "event_id", "user_id", "value"]
    got = {r.event_id: (r.topic, r.user_id, r.value)
           for r in out.collect()}
    assert got == {1: ("topicA", 10, 1.5), 2: ("topicB", 20, -3.25),
                   3: ("topicB", None, None)}
