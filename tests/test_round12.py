"""Round-12: DQ constraint suite, OOF target encoding, DOW harmonics."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_hust_spark.operators.dq import constraint_report
from bigdata_project_hust_spark.plans.round12 import (
    _OOF_FOLDS, q_dow_harmonics, q_dq_constraint_report,
    q_oof_target_encoding)

SF = "/root/testdata/sf0.001"


def test_dq_counts_injected_violations(spark):
    orders = spark.createDataFrame(
        [(1, 10, "O", 5.0),     # clean
         (1, 11, "F", 6.0),     # duplicate orderkey
         (2, None, "P", 7.0),   # null custkey (also fails FK)
         (3, 12, "X", 8.0),     # bad status
         (4, 13, "O", -1.0),    # bad price
         (5, 99, "O", 9.0)],    # custkey not in dim
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double")
    customer = spark.createDataFrame(
        [(10,), (11,), (12,), (13,)], "c_custkey long")
    out = {r["check_name"]: r
           for r in constraint_report(orders, customer).collect()}
    assert out["complete_custkey"]["n_violations"] == 1
    assert out["unique_orderkey"]["n_violations"] == 1
    assert out["range_totalprice"]["n_violations"] == 1
    assert out["domain_status"]["n_violations"] == 1
    assert out["fk_custkey"]["n_violations"] == 2
    for r in out.values():
        assert r["n_rows"] == 6
        assert r["passed"] == 0
        assert r["pass_frac_e6"] == \
            (6 - r["n_violations"]) * 1_000_000 // 6


def test_dq_fixture_clean(spark):
    out = q_dq_constraint_report(spark, SF).collect()
    assert len(out) == 5
    for r in out:
        assert r["passed"] == 1 and r["n_violations"] == 0
        assert r["pass_frac_e6"] == 1_000_000


def test_oof_encoding_covers_and_varies(spark):
    out = q_oof_target_encoding(spark, SF).collect()
    segs = {r["mktsegment"] for r in out}
    assert len(out) == len(segs) * _OOF_FOLDS
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert sum(r["n_test"] for r in out) == n_orders
    # out-of-fold means must differ across folds (they exclude
    # different slices) — equal-everywhere would mean leakage of the
    # full-data mean
    by_seg = {}
    for r in out:
        by_seg.setdefault(r["mktsegment"], set()).add(r["enc_cents_e6"])
    assert any(len(v) > 1 for v in by_seg.values())


def test_dow_harmonics_bounds(spark):
    out = q_dow_harmonics(spark, SF).collect()
    assert len(out) >= 2
    daily_max = (spark.read.parquet(f"{SF}/events.parquet")
                 .groupBy("event_type",
                          F.floor(F.unix_timestamp("ts") / 86400))
                 .agg(F.sum(F.floor(F.col("value") * 100 + 0.5))
                      .alias("t"))
                 .agg(F.max(F.abs("t"))).collect()[0][0])
    for r in out:
        assert r["n_days"] >= 1
        # |2/n · Σ t·w| ≤ 2·max|t| when |w| ≤ 1
        for c in ("cos1_cents", "sin1_cents", "cos2_cents", "sin2_cents"):
            assert abs(r[c]) <= 2 * daily_max + 1
