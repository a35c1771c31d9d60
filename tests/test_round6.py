"""Round-6 operators: hand-value unit tests + 100 TB plan gates for
Spearman, PSI drift, seasonality, sweep-line concurrency, target
encoding, and diversified top-k."""

from __future__ import annotations

import math
import os
from datetime import datetime

from pyspark.sql import functions as F

from bigdata_project_hust_spark.operators.curation import target_encode
from bigdata_project_hust_spark.operators.eventflow import (
    hourly_profile, max_concurrency_by_type, psi_value_drift,
    seasonal_deviation_topk, spearman_by_group)
from bigdata_project_hust_spark.operators.topk import diversified_topk
from bigdata_project_hust_spark.plans.queries import QUERIES
from bigdata_project_hust_spark.plans.round6 import QUERIES_ROUND6

from .conftest import SF_SMOKE
from .test_plans import plan_of


def _events(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string") \
        .write.mode("overwrite") \
        .parquet(os.path.join(d, "events.parquet"))
    return d


def _xy(spark, rows):
    return spark.createDataFrame(rows, "g string, x long, y long")


# ---------------------------------------------------------------------------
# Spearman
# ---------------------------------------------------------------------------

def test_spearman_perfect_monotone(spark):
    """y strictly increasing in x (nonlinearly) → rho exactly 1."""
    d = _xy(spark, [("a", 1, 10), ("a", 2, 100), ("a", 3, 101),
                    ("a", 4, 5000)])
    r = spearman_by_group(d, "g", F.col("x"), F.col("y")).collect()[0]
    assert r["n_rows"] == 4 and r["spearman_e6"] == 1_000_000


def test_spearman_perfect_inverse(spark):
    d = _xy(spark, [("a", 1, 9), ("a", 2, 7), ("a", 3, 1)])
    r = spearman_by_group(d, "g", F.col("x"), F.col("y")).collect()[0]
    assert r["spearman_e6"] == -1_000_000


def test_spearman_ties_hand_value(spark):
    """x = (1,2,2,3), y = (1,2,3,4): x midranks (1, 2.5, 2.5, 4),
    y ranks (1,2,3,4); Σcov = 4.5, var_x = 4.5, var_y = 5 →
    rho = 4.5/sqrt(4.5·5) ≈ 0.948683 → e6 floor 948683."""
    d = _xy(spark, [("a", 1, 1), ("a", 2, 2), ("a", 2, 3), ("a", 3, 4)])
    r = spearman_by_group(d, "g", F.col("x"), F.col("y")).collect()[0]
    exp = math.floor(4.5 / math.sqrt(4.5 * 5.0) * 1e6)
    assert r["spearman_e6"] == exp == 948_683


def test_spearman_constant_column_zero(spark):
    """All-equal x → zero rank variance → rho pinned to 0."""
    d = _xy(spark, [("a", 5, 1), ("a", 5, 2), ("a", 5, 3)])
    r = spearman_by_group(d, "g", F.col("x"), F.col("y")).collect()[0]
    assert r["spearman_e6"] == 0


def test_spearman_groups_independent(spark):
    """Two groups rank independently: one perfect, one inverse."""
    d = _xy(spark, [("a", 1, 1), ("a", 2, 2),
                    ("b", 1, 2), ("b", 2, 1)])
    rows = {r["g"]: r["spearman_e6"]
            for r in spearman_by_group(
                d, "g", F.col("x"), F.col("y")).collect()}
    assert rows == {"a": 1_000_000, "b": -1_000_000}


# ---------------------------------------------------------------------------
# PSI drift
# ---------------------------------------------------------------------------

def test_psi_identical_halves_near_zero(spark, tmp_path):
    """Same value multiset in both halves → every (pa−pb) = 0 →
    every floored term 0 and total 0."""
    rows = []
    for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 5.0] * 4):
        rows.append((i, datetime(2024, 1, 10), 1, "view", v, "{}"))
        rows.append((1000 + i, datetime(2024, 1, 20), 1, "view", v,
                     "{}"))
    d = _events(spark, tmp_path, rows)
    out = psi_value_drift(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert len(out) == 10
    assert all(r["psi_term_e6"] == 0 for r in out)
    assert out[0]["psi_total_e6"] == 0


def test_psi_counts_and_split(spark, tmp_path):
    """Rows before the Jan-16 boundary land in ca, after in cb; totals
    conserve the row counts."""
    rows = [(1, datetime(2024, 1, 2), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 3), 1, "view", 2.0, "{}"),
            (3, datetime(2024, 1, 25), 1, "view", 9.0, "{}")]
    d = _events(spark, tmp_path, rows)
    out = psi_value_drift(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert sum(r["ca"] for r in out) == 2
    assert sum(r["cb"] for r in out) == 1


def test_psi_total_is_sum_of_terms(spark):
    out = QUERIES["psi_value_drift"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 10
    assert out[0]["psi_total_e6"] == sum(r["psi_term_e6"] for r in out)
    assert [r["bin"] for r in out] == list(range(10))


# ---------------------------------------------------------------------------
# Seasonality
# ---------------------------------------------------------------------------

def test_hourly_profile_hand_values(spark, tmp_path):
    """Hour 3: values 1.00 and 2.01 → n=2, sum=301, avg=150 (trunc)."""
    rows = [(1, datetime(2024, 1, 1, 3, 0), 1, "view", 1.00, "{}"),
            (2, datetime(2024, 1, 2, 3, 30), 1, "view", 2.01, "{}"),
            (3, datetime(2024, 1, 1, 7, 0), 1, "view", 5.00, "{}")]
    d = _events(spark, tmp_path, rows)
    out = {r["hour"]: r for r in hourly_profile(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()}
    assert out[3]["n_events"] == 2
    assert out[3]["sum_cents"] == 301
    assert out[3]["avg_cents"] == 150
    assert out[7]["avg_cents"] == 500


def test_seasonal_deviation_ranking(spark, tmp_path):
    """Hour mean 200 (100 & 300): deviations 100 each; the lone hour-5
    event deviates 0 — top-1 is the lower event_id of the tied pair."""
    rows = [(10, datetime(2024, 1, 1, 4, 0), 1, "view", 1.00, "{}"),
            (11, datetime(2024, 1, 1, 4, 5), 1, "view", 3.00, "{}"),
            (12, datetime(2024, 1, 1, 5, 0), 1, "view", 7.00, "{}")]
    d = _events(spark, tmp_path, rows)
    out = seasonal_deviation_topk(
        spark.read.parquet(os.path.join(d, "events.parquet")),
        k=2).collect()
    assert [r["event_id"] for r in out] == [10, 11]
    assert out[0]["deviation_cents"] == 100


# ---------------------------------------------------------------------------
# Sweep-line concurrency
# ---------------------------------------------------------------------------

def test_concurrency_overlap_and_release(spark, tmp_path):
    """Three 5-min views at 0s, 60s, 400s: the first two overlap
    (peak 2 at t=60); the third starts after both ended."""
    base = datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, base, 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 1, 0), 1, "view", 1.0, "{}"),
            (3, datetime(2024, 1, 1, 0, 6, 40), 1, "view", 1.0, "{}")]
    d = _events(spark, tmp_path, rows)
    out = max_concurrency_by_type(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    r = out[0]
    assert r["max_concurrent"] == 2
    assert r["peak_epoch_s"] == int(
        datetime(2024, 1, 1, 0, 1, 0,
                 tzinfo=__import__("datetime").timezone.utc).timestamp())


def test_concurrency_halfopen_boundary(spark, tmp_path):
    """An event starting exactly when another's 300s interval ends
    does NOT overlap it (half-open): peak stays 1."""
    rows = [(1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 5, 0), 1, "view", 1.0, "{}")]
    d = _events(spark, tmp_path, rows)
    out = max_concurrency_by_type(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert out[0]["max_concurrent"] == 1


def test_concurrency_types_partition(spark, tmp_path):
    """Concurrency counts per type: simultaneous view+click do not
    stack."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)
    rows = [(1, t0, 1, "view", 1.0, "{}"),
            (2, t0, 1, "click", 1.0, "{}"),
            (3, t0, 1, "view", 1.0, "{}")]
    d = _events(spark, tmp_path, rows)
    out = {r["event_type"]: r["max_concurrent"]
           for r in max_concurrency_by_type(
               spark.read.parquet(
                   os.path.join(d, "events.parquet"))).collect()}
    assert out == {"view": 2, "click": 1}


# ---------------------------------------------------------------------------
# Target encoding
# ---------------------------------------------------------------------------

def test_target_encode_hand_value(spark):
    """cat A: n=2 sum=400; cat B: n=1 sum=100. Global mean 500/3.
    enc(A) = (400 + 10·(500/3)) / 12, enc(B) = (100 + 10·(500/3)) / 11
    — both shrink toward 166.67."""
    fact = spark.createDataFrame(
        [(1, 100), (1, 300), (2, 100)], "k long, cents long")
    dim = spark.createDataFrame([(1, "A"), (2, "B")], "k long, c string")
    out = {r["c"]: r for r in target_encode(
        fact, dim, "k", "c", F.col("cents")).collect()}
    g = 500.0 / 3.0
    assert out["A"]["n_cat"] == 2 and out["A"]["sum_cents"] == 400
    assert out["A"]["enc_cents_e6"] == math.floor(
        (400.0 + 10.0 * g) / 12.0 * 1e6)
    assert out["B"]["enc_cents_e6"] == math.floor(
        (100.0 + 10.0 * g) / 11.0 * 1e6)


def test_target_encode_rare_category_shrinks_more(spark):
    """A rare category's encoding sits closer to the global mean than
    a frequent category with the same per-row value."""
    fact = spark.createDataFrame(
        [(1, 1000)] * 20 + [(2, 1000)] + [(3, 0)] * 20,
        "k long, cents long")
    dim = spark.createDataFrame(
        [(1, "freq"), (2, "rare"), (3, "zero")], "k long, c string")
    out = {r["c"]: r["enc_cents_e6"] for r in target_encode(
        fact, dim, "k", "c", F.col("cents")).collect()}
    gmean_e6 = (21000.0 / 41.0) * 1e6
    assert abs(out["rare"] - gmean_e6) < abs(out["freq"] - gmean_e6)


# ---------------------------------------------------------------------------
# Diversified top-k
# ---------------------------------------------------------------------------

def test_diversified_topk_caps_dominant_group(spark):
    """Language A holds the 5 best scores but only 3 survive; the
    remaining 2 slots go to B's best."""
    rows = [(i, "A", 100 - i) for i in range(5)] + \
           [(10 + i, "B", 50 - i) for i in range(3)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, "
                                     "n_chars long")
    out = diversified_topk(df, "lang", "n_chars", "doc_id", 3, 5).collect()
    assert [r["doc_id"] for r in out] == [0, 1, 2, 10, 11]
    assert max(sum(1 for r in out if r["lang"] == g)
               for g in ("A", "B")) == 3


# ---------------------------------------------------------------------------
# Plan gates (100 TB shape)
# ---------------------------------------------------------------------------

def test_seasonal_deviation_plan_broadcasts_profile(spark):
    plan = plan_of(QUERIES["seasonal_deviation_topk"].fn(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


def test_diversified_topk_plan_no_global_rank(spark):
    """The global k must be TakeOrdered, and the only window is the
    lang-partitioned rank."""
    plan = plan_of(QUERIES["diversified_topk_docs"].fn(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan


def test_concurrency_plan_windows_partitioned(spark):
    """No unpartitioned window: every Window sort key set includes
    event_type."""
    df = QUERIES["max_concurrent_events"].fn(spark, SF_SMOKE)
    plan = plan_of(df)
    import re
    for m in re.finditer(r"Window \[[^\]]*\], \[([^\]]*)\]", plan):
        assert "event_type" in m.group(0) or "event_type" in m.group(1)


def test_round6_queries_no_cartesian(spark):
    for name, spec in QUERIES_ROUND6.items():
        plan = plan_of(spec.fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name


def test_round6_no_complex_output_columns(spark):
    """Driver-canonicalizer guard: no array/map/struct output column
    in any round-6 query."""
    for name, spec in QUERIES_ROUND6.items():
        df = spec.fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            assert f.dataType.typeName() not in (
                "array", "map", "struct"), (name, f.name)
