"""Source/sink format tests: CSV + ORC round-trips with explicit
schemas, and the broker-independent Kafka sink frame (S2)."""

from __future__ import annotations

from pyspark.sql import functions as F, types as T

from bigdata_project_hust_spark.io import (
    kafka_sink_frame, read_csv, read_orc, write_orc)

SCHEMA = T.StructType([
    T.StructField("id", T.LongType()),
    T.StructField("name", T.StringType()),
    T.StructField("score", T.DoubleType()),
])


def _frame(spark):
    return spark.createDataFrame(
        [(1, "alpha", 1.5), (2, "beta, with comma", -2.0), (3, None, 0.0)],
        SCHEMA)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    path = str(tmp_path / "csv")
    _frame(spark).write.option("header", "true").csv(path)
    got = read_csv(spark, path, SCHEMA)
    assert got.schema == SCHEMA
    rows = sorted(map(tuple, got.collect()))
    assert rows == sorted(map(tuple, _frame(spark).collect()))


def test_orc_roundtrip(spark, tmp_path):
    path = str(tmp_path / "orc")
    write_orc(_frame(spark), path)
    got = read_orc(spark, path)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, _frame(spark).collect()))
    # pushdown works on ORC scans too
    plan = got.where(F.col("id") == 2)._jdf.queryExecution() \
              .executedPlan().toString()
    assert "PushedFilters: [IsNotNull(id), EqualTo(id,2)]" in plan


def test_kafka_sink_frame_shape_and_losslessness(spark):
    df = _frame(spark)
    out = kafka_sink_frame(df, "id")
    assert [f.name for f in out.schema.fields] == ["key", "value"]
    assert all(isinstance(f.dataType, T.BinaryType)
               for f in out.schema.fields)
    back = out.select(
        F.from_json(F.col("value").cast("string"), SCHEMA).alias("r")
    ).select("r.*")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect()))


def test_kafka_parse_chain_roundtrip_no_broker(spark):
    """ST1/S4 closure (round-1 verdict item 4): run kafka_stream's
    EXACT value-parse chain (parse_kafka_frame) over kafka_sink_frame's
    binary output — producer serialize → consumer parse, end to end,
    with no broker. Covers multi-topic frames, null fields, unicode,
    and JSON-special characters in values (consumer1.py:41-48 +
    producer.py:43-46)."""
    from bigdata_project_hust_spark.streaming.pipeline import (
        parse_kafka_frame)

    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
        T.StructField("blue", T.BooleanType()),
    ])
    rows = [(1, 'quote " and \\ backslash', 1.5, True),
            (2, None, None, False),
            (3, "unicode ✓ ütf", -0.25, None)]
    df = spark.createDataFrame(rows, schema)
    framed = (kafka_sink_frame(df, "id")
              # kafka source exposes the record's topic — simulate the
              # multi-topic subscribe by tagging frames per topic
              .withColumn("topic",
                          F.when(F.col("key").cast("string") == "1",
                                 F.lit("tweets_topic"))
                           .otherwise(F.lit("twitter_users_topic"))))
    parsed = parse_kafka_frame(framed, schema)
    assert set(parsed.columns) == {"topic", "id", "name", "score", "blue"}
    got = {r.id: (r.topic, r.name, r.score, r.blue)
           for r in parsed.collect()}
    assert got == {
        1: ("tweets_topic", 'quote " and \\ backslash', 1.5, True),
        2: ("twitter_users_topic", None, None, False),
        3: ("twitter_users_topic", "unicode ✓ ütf", -0.25, None)}


def test_xml_roundtrip_with_schema(spark, tmp_path):
    """Spark-4 built-in XML source: schema'd write → read roundtrip
    preserves values and types (nulls included)."""
    from pyspark.sql import types as T
    from bigdata_project_hust_spark.io import read_xml, write_xml
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType())])
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "<b&c>", None), (3, None, -0.25)], schema)
    p = str(tmp_path / "xmlout")
    write_xml(df, p)
    back = read_xml(spark, p, schema=schema)
    got = sorted(((r.id, r.name, r.score) for r in back.collect()))
    assert got == [(1, "a", 1.5), (2, "<b&c>", None), (3, None, -0.25)]


# ---------------------------------------------------------------------------
# Python Data Source API connector (sources/pyds.py)
# ---------------------------------------------------------------------------

def test_pyds_batch_scan_matches_parquet(spark):
    from bigdata_project_hust_spark.sources import register_fixture_replay
    register_fixture_replay(spark)
    path = "/root/testdata/sf0.001/customer.parquet"
    via_pyds = (spark.read.format("fixture_replay").option("path", path)
                .load())
    plain = spark.read.parquet(path)
    assert via_pyds.schema == plain.schema
    a = sorted(tuple(r) for r in via_pyds.collect())
    b = sorted(tuple(r) for r in plain.collect())
    assert a == b


def test_pyds_stream_replays_fixture_once(spark, tmp_path):
    from bigdata_project_hust_spark.sources import register_fixture_replay
    register_fixture_replay(spark)
    path = "/root/testdata/sf0.001/customer.parquet"
    st = (spark.readStream.format("fixture_replay")
          .option("path", path).option("batch_rows", 40).load())
    q = (st.writeStream.format("memory").queryName("pyds_once")
         .option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        q.processAllAvailable()
        got = spark.sql(
            "select count(*) c, count(distinct c_custkey) d "
            "from pyds_once").first()
        # single pass: every row exactly once, then the source idles
        assert (got.c, got.d) == (150, 150)
        n_batches = len(q.recentProgress)
        assert n_batches >= 4  # 150 rows / 40-row pacing
    finally:
        q.stop()


def test_pyds_stream_loop_wraps_round_robin(spark, tmp_path):
    from bigdata_project_hust_spark.sources import register_fixture_replay
    register_fixture_replay(spark)
    path = "/root/testdata/sf0.001/region.parquet"  # 5 rows
    st = (spark.readStream.format("fixture_replay")
          .option("path", path).option("batch_rows", 7)
          .option("loop", "true").load())
    q = (st.writeStream.format("memory").queryName("pyds_loop")
         .option("checkpointLocation", str(tmp_path / "ckpt2")).start())
    try:
        import time
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("select count(*) c from pyds_loop").first().c
            if n >= 12:  # > 2 full passes of the 5-row fixture
                break
            time.sleep(0.5)
        rows = spark.sql(
            "select r_regionkey, count(*) c from pyds_loop "
            "group by r_regionkey").collect()
        assert len(rows) == 5 and all(r.c >= 2 for r in rows)
    finally:
        q.stop()


def test_pyds_stream_restart_exactly_once(spark, tmp_path):
    """Kill the replay stream mid-pass, restart from the same
    checkpoint: every row must arrive exactly once (the reader's
    high-water mark must ratchet forward from checkpointed offsets,
    never backwards — a regressing latestOffset re-emits old rows)."""
    from bigdata_project_hust_spark.sources import register_fixture_replay
    register_fixture_replay(spark)
    path = "/root/testdata/sf0.001/customer.parquet"
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def start():
        st = (spark.readStream.format("fixture_replay")
              .option("path", path).option("batch_rows", 30).load())
        return (st.writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt).start())

    import time
    q = start()
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if spark.read.parquet(out_dir).count() >= 30:
                    break
            except Exception:
                pass
            time.sleep(0.3)
    finally:
        q.stop()  # mid-pass kill
    n_partial = spark.read.parquet(out_dir).count()
    assert 30 <= n_partial < 150
    q2 = start()
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = spark.read.parquet(out_dir)
    assert got.count() == 150, "rows lost or duplicated across restart"
    assert got.select("c_custkey").distinct().count() == 150


def test_binary_file_ingest_to_image_features(spark, tmp_path):
    """End-to-end multimodal ingest over the built-in binaryFile
    source: PPM assets on disk → binary_assets_with_ids →
    extract_image_features (mapInPandas + real codec). Features must
    match decoding the same bytes directly, the glob must prune
    non-image files at listing time, and asset_ids must be stable
    across re-reads."""
    import numpy as np

    from bigdata_project_hust_spark.io import binary_assets_with_ids
    from bigdata_project_hust_spark.operators.multimodal import (
        decode_image_raster, extract_image_features)

    rng = np.random.default_rng(7)
    payloads = {}
    for i in range(4):
        px = rng.integers(0, 256, size=(6 + i, 5, 3), dtype=np.uint8)
        payloads[f"img_{i}.ppm"] = (
            b"P6\n5 %d\n255\n" % (6 + i) + px.tobytes())
    d = tmp_path / "assets"
    d.mkdir()
    for name, b in payloads.items():
        (d / name).write_bytes(b)
    (d / "notes.txt").write_text("not an image")

    assets = binary_assets_with_ids(spark, str(d), glob="*.ppm")
    rows = assets.collect()
    assert len(rows) == 4  # glob pruned notes.txt at listing time
    assert len({r["asset_id"] for r in rows}) == 4
    # ids are a pure function of the path: stable across re-reads
    again = {r["path"]: r["asset_id"]
             for r in binary_assets_with_ids(spark, str(d),
                                             glob="*.ppm").collect()}
    assert {r["path"]: r["asset_id"] for r in rows} == again

    feats = extract_image_features(
        assets.select("asset_id", "payload")).collect()
    by_id = {r["asset_id"]: r for r in feats}
    for r in rows:
        name = r["path"].rsplit("/", 1)[-1]
        expect = decode_image_raster(payloads[name])
        got = by_id[r["asset_id"]]
        assert got["ok"] and got["width"] == 5
        assert got["height"] == expect["height"]
        assert got["feature"] == expect["feature"]


def test_avro_gated_absent(spark, tmp_path):
    """The avro datasource is an external jar not shipped in this
    container; assert the failure is the clean AnalysisException (so a
    future environment with the jar flips this test, reminding us to
    add the avro read/write surface)."""
    import pytest
    from pyspark.errors import AnalysisException

    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(AnalysisException, match="[Aa]vro"):
        df.write.format("avro").save(str(tmp_path / "av"))
