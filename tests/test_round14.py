"""Round-14/15: checkpoint state-store inspection (Spark 4 state data
source) — audit what a streaming query remembers, from the outside."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F, types as T

from bigdata_project_hust_spark.streaming.pipeline import (
    incremental_author_totals, json_file_stream)
from bigdata_project_hust_spark.streaming.statetools import (
    state_key_census, state_metadata, state_rows)

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


def test_state_store_reader_reflects_aggregate_state(spark, tmp_path):
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    rows = [(i, f"2024-01-01 00:00:{i:02d}", i % 3, float(i))
            for i in range(12)]
    _write_events(src, "a.json", rows)
    stream = json_file_stream(spark, src, EVENT_SCHEMA)
    agg = incremental_author_totals(stream, "user_id", ["value"])
    q = (agg.writeStream.outputMode("update").format("memory")
         .queryName("st_out").option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # metadata names the stateful operator and its partition layout
    meta = state_metadata(spark, ck).collect()
    assert len(meta) >= 1
    assert any(m["operatorName"] == "stateStoreSave" for m in meta)
    assert all(m["maxBatchId"] >= m["minBatchId"] >= 0 for m in meta)

    # the store holds one key per author with the PHYSICAL agg buffer
    # (count/sum/max): reconcile against a batch recomputation
    st = state_rows(spark, ck)
    got = {r["key"]["user_id"]: r["value"] for r in st.collect()}
    batch = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double")
    want = {r["author"]: r for r in
            incremental_author_totals(batch, "user_id",
                                      ["value"]).collect()}
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k]["count"] == v["total_tweets"]
        assert got[k]["sum"] == v["total_value"]
        assert got[k]["max"] == v["max_value"]

    # the census sums to the number of state keys
    census = state_key_census(spark, ck)
    assert census.agg(F.sum("n_keys")).collect()[0][0] == len(want)


def test_collated_distinct_counts_fold_case(spark):
    from bigdata_project_hust_spark.plans.round15 import (
        q_collated_distinct_names)
    out = q_collated_distinct_names(spark, "/root/testdata/sf0.001") \
        .collect()
    assert len(out) >= 2
    for r in out:
        # folding can only merge values
        assert 0 < r["n_folded"] <= r["n_binary"]
        assert r["n_folded"] <= 5  # 5 segment labels case-folded
    # both spellings of some label coexist in some nation
    assert any(r["n_folded"] < r["n_binary"] for r in out)
