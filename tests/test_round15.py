"""Round-15: custom Python data source SINK (batch + streaming) with
manifest-atomic visibility."""

from __future__ import annotations

import glob
import json
import os

from pyspark.sql import functions as F, types as T

from bigdata_project_hust_spark.sources.pyds import (
    read_manifested_json, register_keyed_json_sink)

SCHEMA = T.StructType([
    T.StructField("k", T.LongType()),
    T.StructField("v", T.StringType()),
])


def test_batch_write_publishes_only_manifested_files(spark, tmp_path):
    register_keyed_json_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(20)],
                               "k long, v string").repartition(4)
    df.write.format("keyed_json_sink").option("path", out) \
        .mode("append").save()
    assert os.path.exists(f"{out}/manifest-batch.json")
    man = json.load(open(f"{out}/manifest-batch.json"))
    assert sum(e["rows"] for e in man["files"]) == 20

    # an orphaned staging file (failed attempt) must stay invisible
    with open(f"{out}/_staging/task-zombie.jsonl", "w") as f:
        f.write(json.dumps({"k": 999, "v": "zombie"}) + "\n")
    back = read_manifested_json(spark, out, SCHEMA)
    got = sorted((r.k, r.v) for r in back.collect())
    assert got == [(i, f"v{i}") for i in range(20)]


def test_stream_write_one_manifest_per_batch(spark, tmp_path):
    register_keyed_json_sink(spark)
    src, out, ck = (str(tmp_path / d) for d in ("src", "sink", "ck"))
    os.makedirs(src)
    for b in range(2):
        with open(f"{src}/b{b}.json", "w") as f:
            for i in range(5):
                f.write(json.dumps({"k": b * 5 + i, "v": f"s{b}"}) + "\n")
    stream = (spark.readStream.schema(SCHEMA).format("json")
              .option("maxFilesPerTrigger", 1).load(src))
    q = (stream.writeStream.format("keyed_json_sink")
         .option("path", out)
         .option("checkpointLocation", ck).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    manifests = sorted(glob.glob(f"{out}/manifest-*.json"))
    assert len(manifests) == 2  # one per micro-batch, named by batchId
    back = read_manifested_json(spark, out, SCHEMA)
    assert sorted(r.k for r in back.collect()) == list(range(10))
    assert back.where(F.col("v").startswith("s")).count() == 10


def test_schema_evolution_merge_read(spark, tmp_path):
    """Schema evolution contract: a landing zone accumulates files
    written under successive schema versions; mergeSchema reconciles
    them into the superset schema with nulls where a version lacked
    the column — the read path a long-lived 100 TB table needs."""
    base = str(tmp_path / "zone")
    v1 = spark.createDataFrame([(1, "a")], "k long, v string")
    v1.write.parquet(f"{base}/d=1")
    v2 = spark.createDataFrame([(2, "b", 9.5)],
                               "k long, v string, score double")
    v2.write.parquet(f"{base}/d=2")
    merged = (spark.read.option("mergeSchema", "true")
              .option("basePath", base).parquet(base))
    assert set(merged.columns) == {"k", "v", "score", "d"}
    rows = {r.k: r for r in merged.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
    # and WITHOUT mergeSchema the first-listed footer wins silently —
    # the reason merge is the landing-zone default in io docs
    plain = spark.read.option("basePath", base).parquet(base)
    assert set(plain.columns) <= {"k", "v", "score", "d"}


def test_rtbf_manifest_cascade_consistency(spark):
    from bigdata_project_hust_spark.plans.round16 import (
        q_rtbf_deletion_manifest)
    out = {r["table_name"]: r for r in q_rtbf_deletion_manifest(
        spark, "/root/testdata/sf0.001").collect()}
    assert set(out) == {"customer", "orders", "lineitem"}
    c, o, li = out["customer"], out["orders"], out["lineitem"]
    # customer: one row per subject
    assert c["n_rows"] == c["n_subjects"]
    # cascades can only narrow the subject set, never widen it
    assert o["n_subjects"] <= c["n_subjects"]
    assert li["n_subjects"] <= o["n_subjects"]
    # row counts grow down the cascade when rows exist at all
    if o["n_subjects"] > 0:
        assert o["n_rows"] >= o["n_subjects"]
    if li["n_subjects"] > 0:
        assert li["n_rows"] >= li["n_subjects"]


def test_cross_source_dup_matrix_shares(spark):
    from bigdata_project_hust_spark.plans.round17 import (
        q_cross_source_dup_matrix)
    out = q_cross_source_dup_matrix(
        spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 1
    total = sum(r["n_pairs"] for r in out)
    for r in out:
        assert r["source_lo"] <= r["source_hi"]
        assert r["cross_source"] == int(r["source_lo"] != r["source_hi"])
        assert r["share_e6"] == r["n_pairs"] * 1_000_000 // total


def test_source_scorecard_composition_consistency(spark):
    from bigdata_project_hust_spark.plans.round18 import q_source_scorecard
    sfd = "/root/testdata/sf0.001"
    out = q_source_scorecard(spark, sfd).collect()
    d = spark.read.parquet(f"{sfd}/documents.parquet")
    assert sum(r["n_docs"] for r in out) == d.count()
    assert sum(r["total_chars"] for r in out) == \
        d.agg(F.sum("n_chars")).collect()[0][0]
    for r in out:
        assert 0 <= r["mean_quality_e2"] <= 100 * 100
        assert 0 <= r["n_dup_docs"] <= r["n_docs"]
        assert r["dup_frac_e6"] == r["n_dup_docs"] * 1_000_000 // r["n_docs"]
        assert r["top_lang"] in ("en", "es", "fr", "und")
        assert 0 < r["top_lang_share_e6"] <= 1_000_000


def test_top_event_trigrams_counts(spark):
    from bigdata_project_hust_spark.plans.round19 import (
        q_top_event_trigrams)
    sfd = "/root/testdata/sf0.001"
    out = q_top_event_trigrams(spark, sfd).collect()
    assert 1 <= len(out) <= 10
    ns = [r["n"] for r in out]
    assert ns == sorted(ns, reverse=True)
    # total trigram instances = sum over users of max(0, n_events - 2)
    e = spark.read.parquet(f"{sfd}/events.parquet")
    per = e.groupBy("user_id").count().collect()
    total = sum(max(0, r["count"] - 2) for r in per)
    assert sum(ns) <= total
    for r in out:
        assert r["trigram"].count(">") == 2


def test_abc_classification_partition(spark):
    from bigdata_project_hust_spark.plans.round20 import (
        q_abc_classification)
    sfd = "/root/testdata/sf0.001"
    out = {r["abc_class"]: r for r in
           q_abc_classification(spark, sfd).collect()}
    assert set(out) <= {"A", "B", "C"} and "A" in out
    total = sum(r["revenue_cents"] for r in out.values())
    li = spark.read.parquet(f"{sfd}/lineitem.parquet")
    want = li.agg(F.sum(F.floor(F.col("l_extendedprice") * 100))) \
        .collect()[0][0]
    assert total == want
    # the A class carries at most 80% of revenue by construction
    assert out["A"]["share_e6"] <= 800_000
    shares = sum(r["share_e6"] for r in out.values())
    assert 999_997 <= shares <= 1_000_000  # floors can drop <=3 units


def test_new_vs_returning_adds_up(spark):
    from bigdata_project_hust_spark.plans.round20 import (
        q_new_vs_returning)
    out = q_new_vs_returning(spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 2
    assert all(r["n_new"] + r["n_returning"] == r["n_active"]
               for r in out)
    # every user is new exactly once
    users = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet") \
        .select("user_id").distinct().count()
    assert sum(r["n_new"] for r in out) == users
    # day one is all-new
    assert out[0]["n_returning"] == 0


def test_repeat_purchase_quartiles_ordered(spark):
    from bigdata_project_hust_spark.plans.round20 import (
        q_repeat_purchase_intervals)
    r = q_repeat_purchase_intervals(
        spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n_gaps"] > 0
    assert 0 <= r["p25_days"] <= r["p50_days"] <= r["p75_days"]


def test_fulfillment_cycle_quartiles(spark):
    from bigdata_project_hust_spark.plans.round21 import (
        q_order_fulfillment_cycle)
    sfd = "/root/testdata/sf0.001"
    out = q_order_fulfillment_cycle(spark, sfd).collect()
    assert len(out) == 5  # one row per priority
    # only orders that shipped at least one line have a cycle
    o = spark.read.parquet(f"{sfd}/orders.parquet")
    li = spark.read.parquet(f"{sfd}/lineitem.parquet")
    shipped = o.join(li.select(F.col("l_orderkey").alias("o_orderkey"))
                     .distinct(), "o_orderkey").count()
    assert sum(r["n_orders"] for r in out) == shipped
    for r in out:
        assert r["p25_days"] <= r["p50_days"] <= r["p75_days"]


def test_supplier_hhi_bounds(spark):
    from bigdata_project_hust_spark.plans.round21 import (
        q_supplier_concentration_hhi)
    out = q_supplier_concentration_hhi(
        spark, "/root/testdata/sf0.001").collect()
    assert len(out) >= 2
    for r in out:
        assert r["n_suppliers"] >= 1
        # HHI in (1e6/n, 1e6]: monopoly = 1e6, uniform = 1e6/n
        assert 0 < r["hhi_e6"] <= 1_000_000
        assert r["hhi_e6"] * r["n_suppliers"] >= 900_000  # >= ~uniform


def test_nation_trade_balance_sums(spark):
    from bigdata_project_hust_spark.plans.round22 import (
        q_nation_trade_balance)
    sfd = "/root/testdata/sf0.001"
    out = q_nation_trade_balance(spark, sfd).collect()
    li = spark.read.parquet(f"{sfd}/lineitem.parquet")
    total = li.agg(F.sum(F.floor(F.col("l_extendedprice") * 100))) \
        .collect()[0][0]
    # every cent earned by some supplier nation
    assert sum(r["earned_cents"] for r in out) == total
    # balances cancel when spend covers the same lines (some orders
    # may lack lineitems, not vice versa): earned total >= spent total
    assert sum(r["spent_cents"] for r in out) <= total
    for r in out:
        assert r["balance_cents"] == r["earned_cents"] - r["spent_cents"]


def test_discount_band_lift_baseline_is_unity(spark):
    from bigdata_project_hust_spark.plans.round22 import (
        q_discount_band_lift)
    out = q_discount_band_lift(spark, "/root/testdata/sf0.001").collect()
    bands = [r["discount_pct"] for r in out]
    assert bands == sorted(bands) and 0 in bands
    base = next(r for r in out if r["discount_pct"] == 0)
    assert base["qty_lift_e6"] == 1_000_000
    for r in out:
        assert r["n_lines"] > 0 and r["total_qty"] > 0
