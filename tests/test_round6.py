"""Round-6 operators: hand-value unit tests + 100 TB plan gates for
Spearman, PSI drift, seasonality, sweep-line concurrency, target
encoding, and diversified top-k."""

from __future__ import annotations

import pytest

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


@pytest.mark.slow_tier
def test_round6_queries_no_cartesian(spark):
    for name, spec in QUERIES_ROUND6.items():
        plan = plan_of(spec.fn(spark, SF_SMOKE))
        assert "CartesianProduct" not in plan, name


@pytest.mark.slow_tier
def test_round6_no_complex_output_columns(spark):
    """Driver-canonicalizer guard: no array/map/struct output column
    in any round-6 query."""
    for name, spec in QUERIES_ROUND6.items():
        df = spec.fn(spark, SF_SMOKE)
        for f in df.schema.fields:
            assert f.dataType.typeName() not in (
                "array", "map", "struct"), (name, f.name)


# ===========================================================================
# Batch 2: survival / backtest / graph structure / text signals
# ===========================================================================

def test_kaplan_meier_hand_values(spark, tmp_path):
    """u1 purchase@+10s, u3 purchase@+20s, u2 censored@+30s:
    S(10)=2/3, S(20)=1/3 (u2 still at risk at both event times)."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t0, 1, "view", 1.0, "{}"),
            (2, at(10), 1, "purchase", 1.0, "{}"),
            (3, t0, 2, "view", 1.0, "{}"),
            (4, at(30), 2, "view", 1.0, "{}"),
            (5, t0, 3, "view", 1.0, "{}"),
            (6, at(20), 3, "purchase", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import kaplan_meier
    d = _events(spark, tmp_path, rows)
    out = kaplan_meier(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert [(r["t"], r["n_risk"], r["d_events"]) for r in out] == \
        [(10, 3, 1), (20, 2, 1)]
    l1 = math.floor(math.log(2.0 / 3.0) * 1e9)
    l2 = l1 + math.floor(math.log(1.0 / 2.0) * 1e9)
    assert out[0]["surv_e6"] == math.floor(math.exp(l1 / 1e9) * 1e6)
    assert out[1]["surv_e6"] == math.floor(math.exp(l2 / 1e9) * 1e6)
    assert abs(out[1]["surv_e6"] - 333_333) <= 1


def test_kaplan_meier_all_events_tail_zero(spark, tmp_path):
    """Single user purchasing: last risk set is all events → S=0."""
    rows = [(1, datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 0, 1), 1, "purchase", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import kaplan_meier
    d = _events(spark, tmp_path, rows)
    out = kaplan_meier(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert len(out) == 1 and out[0]["surv_e6"] == 0


def test_wmape_hand_value(spark, tmp_path):
    """Day totals 100, 150, 100 at the same hour → errors 50+50 over
    actuals 150+100 → WMAPE = 400000e-6."""
    rows = [(1, datetime(2024, 1, 1, 5), 1, "view", 1.00, "{}"),
            (2, datetime(2024, 1, 2, 5), 1, "view", 1.50, "{}"),
            (3, datetime(2024, 1, 3, 5), 1, "view", 1.00, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        wmape_seasonal_naive)
    d = _events(spark, tmp_path, rows)
    out = wmape_seasonal_naive(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    r = out[0]
    assert r["n_periods"] == 2 and r["sum_abs_err"] == 100
    assert r["sum_abs_actual"] == 250 and r["wmape_e6"] == 400_000


def test_wmape_lag_skips_missing_days(spark, tmp_path):
    """A gap day: the lag pairs day3 with day1 (previous OBSERVED)."""
    rows = [(1, datetime(2024, 1, 1, 5), 1, "view", 2.00, "{}"),
            (2, datetime(2024, 1, 3, 5), 1, "view", 3.00, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        wmape_seasonal_naive)
    d = _events(spark, tmp_path, rows)
    out = wmape_seasonal_naive(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert out[0]["n_periods"] == 1 and out[0]["sum_abs_err"] == 100


def test_k_core_peels_pendant(spark):
    """Triangle + pendant, k=2: the pendant (and its edge) peels off;
    the triangle survives with degree 2 each."""
    from bigdata_project_hust_spark.operators.graph import k_core
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (1, 4)], "pa long, pb long")
    out = {r["node"]: r["core_degree"]
           for r in k_core(e, k=2, rounds=3).collect()}
    assert out == {1: 2, 2: 2, 3: 2}


def test_k_core_cascading_peel(spark):
    """A chain hanging off a triangle peels layer by layer — needs
    more than one round to empty."""
    from bigdata_project_hust_spark.operators.graph import k_core
    e = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)],
        "pa long, pb long")
    out = sorted(r["node"] for r in k_core(e, k=2, rounds=4).collect())
    assert out == [1, 2, 3]


def test_k_core_converged_at_fixture_scale(spark):
    """rounds and rounds+1 agree on the sf0.001 co-purchase graph —
    the fixpoint sits inside the registered bound."""
    from bigdata_project_hust_spark.operators.graph import (
        copurchase_edges, k_core)
    from bigdata_project_hust_spark.io import load_table
    e = copurchase_edges(load_table(spark, SF_SMOKE, "lineitem"))
    a = sorted((r["node"], r["core_degree"])
               for r in k_core(e, k=3, rounds=6).collect())
    b = sorted((r["node"], r["core_degree"])
               for r in k_core(e, k=3, rounds=7).collect())
    assert a == b and len(a) > 0


def test_assortativity_path_graph(spark):
    """Path a-b-c: degree pairs (1,2),(2,1),(2,1),(1,2) → rho = −1."""
    from bigdata_project_hust_spark.operators.graph import (
        degree_assortativity)
    e = spark.createDataFrame([(1, 2), (2, 3)], "pa long, pb long")
    r = degree_assortativity(e).collect()[0]
    assert r["n_edge_ends"] == 4
    assert r["assortativity_e6"] == -1_000_000


def test_assortativity_regular_graph_zero_variance(spark):
    """A cycle is degree-regular → zero variance → pinned 0."""
    from bigdata_project_hust_spark.operators.graph import (
        degree_assortativity)
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "pa long, pb long")
    assert degree_assortativity(e).collect()[0]["assortativity_e6"] == 0


def test_item_item_hand_value(spark):
    """Orders {p1,p2}×2 and {p1,p3}: only (p1,p2) survives min_co=2;
    cosine = 2/√(3·2)."""
    from bigdata_project_hust_spark.operators.graph import item_item_cosine
    li = spark.createDataFrame(
        [(1, 101), (1, 102), (2, 101), (2, 102), (3, 101), (3, 103)],
        "l_orderkey long, l_partkey long")
    out = {(r["item"], r["neighbor"]): r
           for r in item_item_cosine(li).collect()}
    assert set(out) == {(101, 102), (102, 101)}
    exp = math.floor(2.0 / math.sqrt(3.0 * 2.0) * 1e6)
    assert out[(101, 102)]["cosine_e6"] == exp == 816_496
    assert out[(101, 102)]["n_co"] == 2


def test_textrank_symmetric_pair(spark):
    """'a b a b a' yields one symmetric edge — equal ranks, word-order
    tie-break."""
    from bigdata_project_hust_spark.operators.text import textrank_keywords
    df = spark.createDataFrame([("a b a b a",)], "text string")
    out = textrank_keywords(df, iters=2, min_pair=2, k=10).collect()
    assert [r["word"] for r in out] == ["a", "b"]
    assert out[0]["rank_e9"] == out[1]["rank_e9"] > 0


def test_readability_hand_value(spark):
    """'The cat sat.' → 3 words, 1 sentence, 3 syllables."""
    from bigdata_project_hust_spark.operators.text import readability
    df = spark.createDataFrame([(7, "The cat sat.")],
                               "doc_id long, text string")
    r = readability(df).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    exp = math.floor(
        (206.835 - 1.015 * (3.0 / 1.0) - 84.6 * (3.0 / 3.0)) * 1e3)
    assert r["flesch_e3"] == exp == 119_190


def test_readability_empty_text_pins_zero(spark):
    from bigdata_project_hust_spark.operators.text import readability
    df = spark.createDataFrame([(1, ""), (2, "   ")],
                               "doc_id long, text string")
    for r in readability(df).collect():
        assert r["n_words"] == 0 and r["flesch_e3"] == 0


def test_js_divergence_identical_sources_zero(spark, tmp_path):
    """Identical token multisets in both sources → every term 0."""
    from bigdata_project_hust_spark.operators.text import (
        js_divergence_sources)
    rows = [(1, "alpha beta gamma", "en", "src0", 16),
            (2, "alpha beta gamma", "en", "src1", 16)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    out = js_divergence_sources(df).collect()
    assert len(out) == 3
    assert all(r["term_e9"] == 0 for r in out)
    assert out[0]["js_total_e9"] == 0


def test_js_divergence_disjoint_vocab_ln2(spark):
    """Fully disjoint vocabularies → JS = ln 2 (up to per-term floor
    loss)."""
    from bigdata_project_hust_spark.operators.text import (
        js_divergence_sources)
    rows = [(1, "aa bb cc", "en", "src0", 8),
            (2, "xx yy zz", "en", "src1", 8)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long")
    total = js_divergence_sources(df).collect()[0]["js_total_e9"]
    ln2_e9 = math.log(2.0) * 1e9
    assert ln2_e9 - 10 <= total <= ln2_e9


def test_kaplan_meier_plan_single_user_shuffle(spark):
    """The only |rows|-scale aggregation keys on user_id; downstream
    windows run on the distinct-duration grid."""
    plan = plan_of(QUERIES["kaplan_meier_purchase"].fn(spark, SF_SMOKE))
    assert "user_id" in plan and "Window" in plan


def test_item_item_plan_partitioned_rank(spark):
    plan = plan_of(QUERIES["item_item_recs"].fn(spark, SF_SMOKE))
    assert "row_number" in plan and "CartesianProduct" not in plan


# ===========================================================================
# Batch 3: privacy / inequality / forecasting / calibration / dedup audit
# ===========================================================================

def test_k_anonymity_flags(spark):
    """Class (1,'A') has 1 row -> k-violation; class (2,'B') has 5 rows
    of one sensitive value -> l-violation only."""
    from bigdata_project_hust_spark.operators.quality import k_anonymity
    rows = [(1, "A", 10)] + [(2, "B", 7)] * 5
    df = spark.createDataFrame(rows, "nat long, seg string, sens long")
    out = {(r["nat"], r["seg"]): r
           for r in k_anonymity(df, ("nat", "seg"), "sens", k=5)
           .collect()}
    a, b = out[(1, "A")], out[(2, "B")]
    assert a["k_violation"] == 1 and a["l_violation"] == 1
    assert b["k_violation"] == 0 and b["l_violation"] == 1
    assert b["n_rows"] == 5 and b["l_diversity"] == 1


def test_theil_equal_values_zero(spark):
    from bigdata_project_hust_spark.operators.aggregations import (
        theil_index)
    df = spark.createDataFrame([("a", 5), ("a", 5), ("a", 5)],
                               "g string, x long")
    r = theil_index(df, "g", F.col("x")).collect()[0]
    assert r["theil_e9"] == 0 and r["sum_cents"] == 15


def test_theil_hand_value(spark):
    """Values (1, 3): mu=2, T = (0.5·ln0.5 + 1.5·ln1.5)/2 with
    per-term e9 floors then a final floor(sum/2)."""
    from bigdata_project_hust_spark.operators.aggregations import (
        theil_index)
    df = spark.createDataFrame([("a", 1), ("a", 3)], "g string, x long")
    r = theil_index(df, "g", F.col("x")).collect()[0]
    t1 = math.floor(0.5 * math.log(0.5) * 1e9)
    t2 = math.floor(1.5 * math.log(1.5) * 1e9)
    assert r["theil_e9"] == math.floor((t1 + t2) / 2.0)
    assert r["theil_e9"] > 0


def test_lorenz_distinct_totals(spark, tmp_path):
    """Users with totals 1..10 cents land one per decile; cumulative
    share is the exact partial-sum ratio."""
    rows = [(i, datetime(2024, 1, 1), i, "view", i / 100.0, "{}")
            for i in range(1, 11)]
    from bigdata_project_hust_spark.operators.eventflow import (
        lorenz_deciles)
    d = _events(spark, tmp_path, rows)
    out = lorenz_deciles(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert [r["n_users"] for r in out] == [1] * 10
    assert [r["sum_cents"] for r in out] == list(range(1, 11))
    assert out[-1]["cum_share_e6"] == 1_000_000
    assert out[0]["cum_share_e6"] == math.floor(1.0 / 55.0 * 1e6)


def test_holt_hand_fold(spark, tmp_path):
    """Values 0.05, 0.09, 0.03 -> fold (320,0) -> (448,64) ->
    (352,-16); forecast 336."""
    rows = [(1, datetime(2024, 1, 1, 0, 0, 0), 1, "view", 0.05, "{}"),
            (2, datetime(2024, 1, 1, 0, 0, 1), 1, "view", 0.09, "{}"),
            (3, datetime(2024, 1, 1, 0, 0, 2), 1, "view", 0.03, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import holt_trend
    d = _events(spark, tmp_path, rows)
    r = holt_trend(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert (r["n_tail"], r["level_c64"], r["trend_c64"],
            r["forecast_c64"]) == (3, 352, -16, 336)


def test_holt_single_event_is_level_only(spark, tmp_path):
    rows = [(1, datetime(2024, 1, 1), 1, "view", 1.00, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import holt_trend
    d = _events(spark, tmp_path, rows)
    r = holt_trend(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert (r["level_c64"], r["trend_c64"]) == (100 * 64, 0)


def test_calibration_bins_shape(spark):
    out = QUERIES["calibration_bins_nb"].fn(spark, SF_SMOKE).collect()
    assert [r["bin"] for r in out] == list(range(10))
    total = sum(r["n_docs"] for r in out)
    assert total > 0
    for r in out:
        assert r["n_agree"] <= r["n_confident"] <= r["n_docs"]
        assert 0 <= r["agree_rate_e6"] <= 1_000_000


def test_tokenizer_fertility_single_char_words(spark):
    """1-char words are always exactly one piece -> fertility 1e6."""
    from bigdata_project_hust_spark.operators.text import (
        tokenizer_fertility)
    df = spark.createDataFrame(
        [(1, "a b c", "xx"), (2, "d e", "xx")],
        "doc_id long, text string, lang string")
    r = tokenizer_fertility(df).collect()[0]
    assert r["lang"] == "xx" and r["sum_words"] == 5
    assert r["sum_pieces"] == 5 and r["fertility_e6"] == 1_000_000


def test_dedup_cluster_sizes_conserve_docs(spark):
    """sum(cluster_size x n_clusters) over the histogram (incl. the
    singleton row) equals the total document count."""
    from bigdata_project_hust_spark.io import load_table
    out = QUERIES["dedup_cluster_sizes"].fn(spark, SF_SMOKE).collect()
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["cluster_size"] * r["n_clusters"] for r in out) == n_docs
    assert out[0]["cluster_size"] == 1


# ===========================================================================
# Batch 4: Arrow-native ops / burstiness / LTV / corr matrix / KWIC
# ===========================================================================

def test_arrow_norms_hand_value(spark):
    from bigdata_project_hust_spark.operators.arrowops import (
        embedding_norms)
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r for r in embedding_norms(df, dim=2).collect()}
    assert out[1]["norm_e6"] == 5_000_000
    assert out[1]["max_abs_e6"] == 4_000_000
    assert out[2]["norm_e6"] == 0


def test_arrow_centroids_exact_sums(spark):
    from bigdata_project_hust_spark.operators.arrowops import (
        label_centroids)
    df = spark.createDataFrame(
        [(0, [1.5, -0.25]), (0, [0.5, 0.25]), (1, [2.0, 0.0])],
        "label int, embedding array<float>")
    out = {(r["label"], r["dim"]): r
           for r in label_centroids(df, dim=2).collect()}
    assert out[(0, 1)]["sum_q_e6"] == 2_000_000  # 1.5e6 + 0.5e6
    # floor(-0.25e6) + floor(0.25e6) = -250000 + 250000
    assert out[(0, 2)]["sum_q_e6"] == 0
    assert out[(0, 1)]["n_vecs"] == 2 and out[(1, 1)]["n_vecs"] == 1


def test_fano_poisson_like_vs_burst(spark, tmp_path):
    """Constant 1-per-bucket traffic -> variance 0 -> fano 0; all
    events in one bucket out of... single bucket also var 0. Bursty
    2-bucket (4,0-style impossible; use observed buckets (1,3)):
    mean 2, var 1 -> F=0.5."""
    rows = [(1, datetime(2024, 1, 1, 0), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1, 1), 1, "view", 1.0, "{}"),
            (3, datetime(2024, 1, 1, 1, 10), 1, "view", 1.0, "{}"),
            (4, datetime(2024, 1, 1, 1, 20), 1, "view", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import fano_factor
    d = _events(spark, tmp_path, rows)
    r = fano_factor(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    # counts (1, 3): n=2, S=4, Q=10 -> (2*10-16)/(2*4) = 0.5
    assert r["n_buckets"] == 2 and r["n_events"] == 4
    assert r["fano_e6"] == 500_000


def test_cohort_ltv_hand_values(spark, tmp_path):
    """Two users cohort on day 0; purchases of 1.00 (day 0) and 3.00
    (day 1) accumulate; avg is cents*100 div 2 users."""
    d0, d1 = datetime(2024, 1, 1), datetime(2024, 1, 2)
    rows = [(1, d0, 1, "view", 0.0, "{}"),
            (2, d0, 2, "purchase", 1.00, "{}"),
            (3, d1, 2, "purchase", 3.00, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import cohort_ltv
    d = _events(spark, tmp_path, rows)
    out = cohort_ltv(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert [(r["day_offset"], r["rev_cents"], r["cum_rev_cents"],
             r["avg_ltv_c100"]) for r in out] == \
        [(0, 100, 100, 5000), (1, 300, 400, 20000)]


def test_corr_matrix_perfect_and_inverse(spark):
    from bigdata_project_hust_spark.operators.aggregations import (
        corr_matrix3)
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 20, 4), (3, 30, 3)], "a long, b long, c long")
    out = {r["pair"]: r["corr_e6"] for r in corr_matrix3(
        df, F.col("a"), F.col("b"), F.col("c"),
        ("a", "b", "c")).collect()}
    assert out["a_b"] == 1_000_000
    assert out["a_c"] == -1_000_000
    assert out["b_c"] == -1_000_000


def test_kwic_window_and_boundaries(spark):
    from bigdata_project_hust_spark.operators.text import kwic
    df = spark.createDataFrame(
        [(1, "over the lazy dog today"),   # pos 2, window clipped left
         (2, "the quick fox"),             # pos 1, clipped hard left
         (3, "no match here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in kwic(df).collect()}
    assert set(out) == {1, 2}
    assert out[1]["pos"] == 2
    assert out[1]["snippet"] == "over the lazy dog"
    assert out[2]["snippet"] == "the quick fox"


# ===========================================================================
# Batch 5: HITS / STL-lite / centroid cosine / set ops / vocab pruning
# ===========================================================================

def test_hits_star_graph(spark):
    """Star u->{v1,v2,v3}: the center is the only hub; leaves are the
    only authorities, all equal."""
    from bigdata_project_hust_spark.operators.graph import (
        HITS_SCALE, hits)
    e = spark.createDataFrame([(0, 1), (0, 2), (0, 3)],
                              "src long, dst long")
    out = {r["node"]: r for r in hits(e, iters=2).collect()}
    assert out[0]["authority"] == 0
    assert out[1]["hub"] == 0
    assert out[1]["authority"] == out[2]["authority"] == \
        out[3]["authority"] > 0
    # iter1: a(leaf)=S, h(0)=3S; iter2: a(leaf)=3S, h(0)=9S
    assert out[0]["hub"] == 9 * HITS_SCALE
    assert out[1]["authority"] == 3 * HITS_SCALE


def test_stl_reconstruction_identity(spark):
    """y == trend + seasonal + residual for every output row."""
    out = QUERIES["stl_hourly_values"].fn(spark, SF_SMOKE).collect()
    assert len(out) > 0
    for r in out:
        assert r["y"] == r["trend"] + r["seasonal"] + r["residual"]


def test_stl_constant_series_zero_residual(spark, tmp_path):
    """A constant hourly series: trend == y, seasonal == 0,
    residual == 0."""
    rows = [(i, datetime(2024, 1, 1, i % 24), 1, "view", 2.00, "{}")
            for i in range(24)]
    from bigdata_project_hust_spark.operators.eventflow import stl_lite
    d = _events(spark, tmp_path, rows)
    for r in stl_lite(
            spark.read.parquet(os.path.join(d, "events.parquet"))
    ).collect():
        assert r["trend"] == r["y"] == 200
        assert r["seasonal"] == 0 and r["residual"] == 0


def test_centroid_cosine_identical_vs_orthogonal(spark):
    from bigdata_project_hust_spark.operators.arrowops import (
        centroid_cosine)
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [1.0, 0.0]),
         (1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "label int, embedding array<float>")
    out = {(r["label_a"], r["label_b"]): r["cosine_e6"]
           for r in centroid_cosine(df, dim=2).collect()}
    assert out[(0, 1)] == 1_000_000   # identical centroids
    assert out[(0, 2)] == 0           # orthogonal
    assert out[(1, 2)] == 0


def test_except_all_multiplicity(spark):
    """Repeat buyers survive with multiplicity n_orders - 1."""
    from bigdata_project_hust_spark.io import load_table
    out = QUERIES["except_all_custkeys"].fn(spark, SF_SMOKE)
    counts = {r["custkey"]: r["n"] for r in
              out.groupBy("custkey").count()
              .withColumnRenamed("count", "n").collect()}
    orders = load_table(spark, SF_SMOKE, "orders")
    ocounts = {r["o_custkey"]: r["n"] for r in
               orders.groupBy("o_custkey").count()
               .withColumnRenamed("count", "n").collect()}
    for k, n in list(counts.items())[:20]:
        assert n == ocounts[k] - 1


def test_vocab_prune_band(spark):
    from bigdata_project_hust_spark.operators.text import vocab_prune
    docs = [(i, "common filler", "en") for i in range(10)]
    docs += [(100, "common rare", "en")]
    df = spark.createDataFrame(
        docs, "doc_id long, text string, lang string")
    out = {r["tok"]: r for r in vocab_prune(df).collect()}
    # 'common' in 11/11 docs -> above 50% cap -> dropped
    assert out["common"]["kept"] == 0
    # 'rare' in 1 doc -> below min_df=2 -> dropped
    assert out["rare"]["kept"] == 0
    # 'filler' in 10/11 docs -> still above 50% -> dropped; make a kept one
    df2 = spark.createDataFrame(
        [(1, "a b", "en"), (2, "a c", "en"), (3, "d e", "en"),
         (4, "f g", "en"), (5, "h i", "en")],
        "doc_id long, text string, lang string")
    out2 = {r["tok"]: r["kept"] for r in vocab_prune(df2).collect()}
    assert out2["a"] == 1  # df=2, 2*100 <= 50*5 -> 200 <= 250


# ===========================================================================
# Batch 6: clustering coefficient / STL anomalies / weighted paths /
#          funnel latencies
# ===========================================================================

def test_clustering_coefficient_triangle_plus_pendant(spark):
    """Triangle nodes have cc=1; the junction with the pendant has
    d=3 and one triangle: cc = 2/(3*2) = 1/3."""
    from bigdata_project_hust_spark.operators.graph import (
        clustering_coefficient)
    e = spark.createDataFrame([(1, 2), (1, 3), (2, 3), (1, 4)],
                              "pa long, pb long")
    out = {r["node"]: r for r in clustering_coefficient(e).collect()}
    assert out[2]["cc_e6"] == out[3]["cc_e6"] == 1_000_000
    assert out[1]["cc_e6"] == 333_333
    assert out[4]["cc_e6"] == 0 and out[4]["degree"] == 1


def test_weighted_relax_prefers_cheap_two_hop(spark):
    """Direct edge costs 10; the two-hop detour costs 2+3=5 — the
    relaxation must take the detour."""
    from bigdata_project_hust_spark.operators.graph import weighted_relax
    e = spark.createDataFrame(
        [(1, 4, 10), (1, 2, 2), (2, 4, 3)], "src long, dst long, w long")
    out = {r["node"]: r["cost"]
           for r in weighted_relax(e, rounds=3).collect()}
    assert out[1] == 0 and out[2] == 2 and out[4] == 5


def test_weighted_relax_bounded_rounds(spark):
    """A node 3 hops out is unreached with rounds=2."""
    from bigdata_project_hust_spark.operators.graph import weighted_relax
    e = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w long")
    out = {r["node"] for r in weighted_relax(e, rounds=2).collect()}
    assert 4 not in out and 3 in out


def test_stl_anomaly_rows_exceed_mad(spark):
    """Every flagged row satisfies |residual| > 3*mad against its own
    type's MAD."""
    out = QUERIES["stl_anomaly_buckets"].fn(spark, SF_SMOKE).collect()
    for r in out:
        assert abs(r["residual"]) > 3 * r["mad"]


def test_transition_medians_hand_values(spark, tmp_path):
    """Three users convert view->click in 10, 20, 30 s: low median
    20. One converts click->purchase in 5 s."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, t0, 1, "view", 1.0, "{}"),
            (2, at(10), 1, "click", 1.0, "{}"),
            (3, at(15), 1, "purchase", 1.0, "{}"),
            (4, t0, 2, "view", 1.0, "{}"),
            (5, at(20), 2, "click", 1.0, "{}"),
            (6, t0, 3, "view", 1.0, "{}"),
            (7, at(30), 3, "click", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        stage_transition_medians)
    d = _events(spark, tmp_path, rows)
    out = {r["transition"]: r for r in stage_transition_medians(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()}
    assert out["view_to_click"]["n_converted"] == 3
    assert out["view_to_click"]["median_delta_s"] == 20
    assert out["click_to_purchase"]["n_converted"] == 1
    assert out["click_to_purchase"]["median_delta_s"] == 5


# ===========================================================================
# Batch 7: curriculum / packing audit / incremental dedup / JL
# ===========================================================================

def test_curriculum_bands_ordered(spark):
    """Every doc in a better quality band precedes every doc in a
    worse one; positions are a dense 0..n-1 permutation."""
    out = QUERIES["curriculum_order"].fn(spark, SF_SMOKE).collect()
    n = len(out)
    assert sorted(r["curriculum_pos"] for r in out) == list(range(n))
    by_pos = sorted(out, key=lambda r: r["curriculum_pos"])
    bands = [(100 - r["quality"]) // 10 for r in by_pos]
    assert bands == sorted(bands)


def test_packing_fill_conserves_tokens(spark):
    """Sum of fill_tokens x n_packs equals the corpus token count, and
    no pack exceeds seq_len=64."""
    from bigdata_project_hust_spark.io import load_table
    from bigdata_project_hust_spark.operators.text import tokens
    out = QUERIES["packing_fill_histogram"].fn(spark, SF_SMOKE).collect()
    docs = load_table(spark, SF_SMOKE, "documents")
    total = docs.select(
        F.sum(F.size(tokens("text"))).alias("t")).collect()[0]["t"]
    assert sum(r["fill_tokens"] * r["n_packs"] for r in out) == total
    assert max(r["fill_tokens"] for r in out) <= 64
    full = [r for r in out if r["fill_tokens"] == 64]
    assert full and full[0]["n_packs"] >= total // 64 - 1


def test_incremental_dedup_cross_side_only(spark):
    """Every returned pair has the new side in src9 and the dup_of
    side outside it."""
    from bigdata_project_hust_spark.io import load_table
    out = QUERIES["incremental_dedup"].fn(spark, SF_SMOKE).collect()
    docs = {r["doc_id"]: r["source"] for r in
            load_table(spark, SF_SMOKE, "documents")
            .select("doc_id", "source").collect()}
    for r in out:
        assert docs[r["new_doc"]] == "src9"
        assert docs[r["dup_of"]] != "src9"
        assert r["inter_size"] * 2 >= r["union_size"]


def test_incremental_dedup_subset_of_full(spark):
    """Incremental pairs are exactly the cross-side restriction of the
    full MinHash pair graph."""
    from bigdata_project_hust_spark.io import load_table
    from bigdata_project_hust_spark.operators.dedup import (
        minhash_near_duplicates)
    docs = load_table(spark, SF_SMOKE, "documents")
    full = {(min(r["doc_a"], r["doc_b"]), max(r["doc_a"], r["doc_b"]))
            for r in minhash_near_duplicates(docs).collect()}
    src = {r["doc_id"]: r["source"]
           for r in docs.select("doc_id", "source").collect()}
    expected = {p for p in full
                if (src[p[0]] == "src9") != (src[p[1]] == "src9")}
    got = {(min(r["new_doc"], r["dup_of"]), max(r["new_doc"], r["dup_of"]))
           for r in QUERIES["incremental_dedup"].fn(spark, SF_SMOKE)
           .collect()}
    assert got == expected


def test_jl_projection_hand_value(spark):
    """2-dim vector, 2 output dims: proj_j = s(0,j)*q0 + s(1,j)*q1
    with the literal sign formula."""
    from bigdata_project_hust_spark.operators.similarity import jl_project
    df = spark.createDataFrame([(1, [0.5, -0.25])],
                               "vec_id long, embedding array<float>")
    out = {r["jdim"]: r["proj_q_e6"]
           for r in jl_project(df, out_dim=2, in_dim=2).collect()}

    def s(i, j):
        return 1 - 2 * (((i * 73856093 + j * 19349663) % 97) % 2)
    q = [500000, -250000]
    for j in (0, 1):
        assert out[j] == s(0, j) * q[0] + s(1, j) * q[1]


def test_jl_projection_preserves_relative_distance(spark):
    """Identical vectors project identically; a far vector stays
    far after projection (JL sanity, not a tolerance test)."""
    from bigdata_project_hust_spark.operators.similarity import jl_project
    rows = [(1, [1.0] * 8), (2, [1.0] * 8), (3, [-1.0] * 8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {}
    for r in jl_project(df, out_dim=4, in_dim=8).collect():
        out.setdefault(r["vec_id"], []).append(r["proj_q_e6"])
    assert out[1] == out[2]
    assert out[1] != out[3]


# ===========================================================================
# Batch 8: log-rank / script mix / gap histogram
# ===========================================================================

def test_logrank_identical_arms_zero(spark, tmp_path):
    """Mirror-image arms (same durations, same censoring) -> O-E sums
    to ~0 and z pins near 0."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)
    rows = []
    eid = 0
    for u in (2, 4, 3, 5):   # arms 0,0,1,1 — identical per arm
        eid += 1
        rows.append((eid, t0, u, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, at(10 if u in (2, 3) else 20), u,
                     "purchase", 1.0, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import logrank_test
    d = _events(spark, tmp_path, rows)
    r = logrank_test(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert abs(r["o_minus_e_e9"]) <= 2     # floor loss only
    assert abs(r["z_e6"]) <= 10


def test_logrank_separated_arms_large_z(spark, tmp_path):
    """Arm 0 converts instantly, arm 1 never (censored): |z| is
    large."""
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return datetime(2024, 1, 1, 0, s // 60, s % 60)
    rows, eid = [], 0
    for u in (2, 4, 6, 8):   # arm 0: instant purchase
        eid += 1
        rows.append((eid, t0, u, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, at(5), u, "purchase", 1.0, "{}"))
    for u in (3, 5, 7, 9):   # arm 1: censored at 100 s
        eid += 1
        rows.append((eid, t0, u, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, at(100), u, "view", 1.0, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import logrank_test
    d = _events(spark, tmp_path, rows)
    r = logrank_test(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["z_e6"] > 1_000_000


def test_script_mix_dominance(spark):
    from bigdata_project_hust_spark.operators.text import script_mix
    df = spark.createDataFrame(
        [(1, "hello world 123"), (2, "数据 处理 系统 ok"), (3, "12345"),
         (4, "")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in script_mix(df).collect()}
    assert out[1]["dominant_script"] == "latin"
    assert out[2]["dominant_script"] == "cjk" and out[2]["n_cjk"] == 6
    assert out[3]["dominant_script"] == "digit"
    assert out[4]["dominant_script"] == "none"


def test_gap_histogram_log2_buckets(spark, tmp_path):
    """Gaps 1, 3, 8, 0 land in buckets 0, 1, 3, -1."""
    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, at(0), 1, "view", 1.0, "{}"),
            (2, at(1), 1, "view", 1.0, "{}"),    # gap 1 -> b0
            (3, at(4), 1, "view", 1.0, "{}"),    # gap 3 -> b1
            (4, at(12), 1, "view", 1.0, "{}"),   # gap 8 -> b3
            (5, at(12), 1, "view", 1.0, "{}")]   # gap 0 -> b-1
    from bigdata_project_hust_spark.operators.eventflow import (
        interevent_gap_histogram)
    d = _events(spark, tmp_path, rows)
    out = {r["log2_bucket"]: r["n_gaps"] for r in interevent_gap_histogram(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()}
    assert out == {-1: 1, 0: 1, 1: 1, 3: 1}


# ===========================================================================
# Batch 9: LATERAL / RANGE frame / ingest gate
# ===========================================================================

def test_lateral_decorrelates_no_cartesian(spark):
    plan = plan_of(QUERIES["lateral_top_order"].fn(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan


def test_range_frame_spans_date_gaps(spark):
    """With a gap between order days, the RANGE frame still only sums
    days within 6 of the current VALUE (a rows frame would reach
    across the gap)."""
    df = spark.createDataFrame(
        [(0, 10), (1, 20), (10, 40)], "day long, day_cents long")
    from pyspark.sql import Window
    w = Window.orderBy("day").rangeBetween(-6, 0)
    out = {r["day"]: r["t"] for r in df.select(
        "day", F.sum("day_cents").over(w).alias("t")).collect()}
    assert out == {0: 10, 1: 30, 10: 40}


def test_ingest_gate_consistency(spark):
    """Every accepted doc is src9, clears quality, and appears in
    neither reject set."""
    from bigdata_project_hust_spark.io import load_table
    from bigdata_project_hust_spark.operators.dedup import (
        incremental_near_duplicates, minhash_near_duplicates)
    accepted = {r["doc_id"]: r["quality"] for r in
                QUERIES["ingest_accept_list"].fn(spark, SF_SMOKE)
                .collect()}
    docs = load_table(spark, SF_SMOKE, "documents")
    new = {r["doc_id"] for r in
           docs.where(F.col("source") == "src9").collect()}
    cross = {r["new_doc"] for r in incremental_near_duplicates(
        docs, F.col("source") == "src9").collect()}
    within = {r["doc_b"] for r in minhash_near_duplicates(
        docs.where(F.col("source") == "src9")).collect()}
    for d, q in accepted.items():
        assert d in new and q >= 60
        assert d not in cross and d not in within


# ===========================================================================
# Batch 10: parameterized SQL / trigram journeys / embedding outliers
# ===========================================================================

def test_trigram_hand_sequence(spark, tmp_path):
    """User journey v,c,p,v yields trigrams vcp, cpv."""
    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, at(0), 1, "view", 1.0, "{}"),
            (2, at(1), 1, "click", 1.0, "{}"),
            (3, at(2), 1, "purchase", 1.0, "{}"),
            (4, at(3), 1, "view", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        top_trigram_journeys)
    d = _events(spark, tmp_path, rows)
    out = {r["trigram"]: r["n_journeys"] for r in top_trigram_journeys(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()}
    assert out == {"vcp": 1, "cpv": 1}


def test_embedding_outlier_detects_planted(spark):
    """19 near-identical vectors + one far vector in the same label:
    the far one is flagged, the rest are not."""
    from bigdata_project_hust_spark.operators.arrowops import (
        embedding_outliers)
    rows = [(i, 0, [1.0 + (i % 3) * 1e-4, 0.0]) for i in range(19)]
    rows.append((99, 0, [100.0, 50.0]))
    df = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>")
    out = [r["vec_id"] for r in embedding_outliers(df, dim=2).collect()]
    assert out == [99]


def test_parameterized_sql_binds(spark):
    out = QUERIES["parameterized_sql"].fn(spark, SF_SMOKE).collect()
    assert len(out) == 5
    assert all(r["n_orders"] > 0 for r in out)


# ===========================================================================
# Batch 11: containment dedup / DAU-WAU / hapax
# ===========================================================================

def test_containment_catches_subdocument(spark):
    """A short doc fully embedded in a long doc: Jaccard is low (below
    the 1/2 near-dup bar) but containment flags it."""
    from bigdata_project_hust_spark.operators.dedup import (
        containment_duplicates, minhash_near_duplicates)
    small = " ".join(f"s{i}" for i in range(30))
    big = small + " " + " ".join(f"e{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, small, "en", "s", 1), (2, big, "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    cont = containment_duplicates(df).collect()
    assert len(cont) == 1
    r = cont[0]
    assert r["cont_small_e6"] == 1_000_000
    assert r["inter_size"] * 2 < r["n_a"] + r["n_b"] - r["inter_size"]
    jacc = minhash_near_duplicates(df).collect()
    assert jacc == []   # symmetric threshold misses it


def test_dau_wau_hand_values(spark, tmp_path):
    """User A active day 0, user B days 0 and 3: WAU(day3) = 2,
    DAU(day3) = 1 -> stickiness 500000."""
    rows = [(1, datetime(2024, 1, 1), 100, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 1), 200, "view", 1.0, "{}"),
            (3, datetime(2024, 1, 4), 200, "view", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        dau_wau_stickiness)
    d = _events(spark, tmp_path, rows)
    out = {r["day"]: r for r in dau_wau_stickiness(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()}
    d0 = min(out)
    assert out[d0]["dau"] == 2 and out[d0]["wau"] == 2
    assert out[d0 + 3]["dau"] == 1 and out[d0 + 3]["wau"] == 2
    assert out[d0 + 3]["stickiness_e6"] == 500_000


def test_hapax_ratio_hand_values(spark):
    from bigdata_project_hust_spark.operators.text import (
        hapax_ratio_by_source)
    df = spark.createDataFrame(
        [(1, "common unique1", "en", "a", 1),
         (2, "common unique2 unique3", "en", "b", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    out = {r["source"]: r for r in hapax_ratio_by_source(df).collect()}
    assert out["a"]["n_tokens"] == 2 and out["a"]["n_hapax"] == 1
    assert out["b"]["n_hapax"] == 2
    assert out["a"]["hapax_ratio_e6"] == 500_000


# ===========================================================================
# Batch 12: bootstrap CI / retrieval eval
# ===========================================================================

def test_bootstrap_band_brackets_mean(spark):
    """The p05..p95 replicate band brackets the exact mean, and the
    replicate medians are ordered."""
    r = QUERIES["bootstrap_order_mean"].fn(spark, SF_SMOKE).collect()[0]
    assert r["n_boot"] == 40
    assert r["p05_c"] <= r["med_c"] <= r["p95_c"]
    assert r["p05_c"] <= r["mean_c"] <= r["p95_c"]
    # Poisson-bootstrap band of the mean should be tight-ish: within
    # 25% of the mean at smoke scale
    assert (r["p95_c"] - r["p05_c"]) < r["mean_c"] // 2


def test_bootstrap_constant_data_degenerate_band(spark):
    from pyspark.sql import functions as F
    from bigdata_project_hust_spark.operators.sampling import (
        bootstrap_mean_ci)
    df = spark.createDataFrame([(i,) for i in range(50)], "k long")
    r = bootstrap_mean_ci(df, "k", F.lit(700), n_boot=16).collect()[0]
    assert r["p05_c"] == r["med_c"] == r["p95_c"] == 700
    assert r["mean_c"] == 700


def test_retrieval_eval_bounds(spark):
    r = QUERIES["retrieval_eval"].fn(spark, SF_SMOKE).collect()[0]
    assert 0 <= r["ndcg_e6"] <= 1_000_000
    assert r["dcg_e9"] <= r["idcg_e9"]
    if r["first_rel_rank"] > 0:
        assert r["mrr_e9"] == 1_000_000_000 // r["first_rel_rank"]


def test_retrieval_eval_perfect_ranking(spark):
    """A corpus where every ranked doc is relevant -> nDCG exactly
    1e6 and MRR 1e9."""
    from bigdata_project_hust_spark.operators.text import retrieval_eval
    rows = [(i, "spark vector merge filler%d" % i) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    r = retrieval_eval(df, ["spark", "vector", "merge"], k=10) \
        .collect()[0]
    assert r["ndcg_e6"] == 1_000_000
    assert r["mrr_e9"] == 1_000_000_000
    assert r["n_relevant"] == 12


# ===========================================================================
# Batch 13: median-of-means / sketch Jaccard audit
# ===========================================================================

def test_median_of_means_robust_to_planted_outlier(spark):
    """A single enormous outlier drags the plain mean but not the
    median of bucket means."""
    from pyspark.sql import functions as F
    from bigdata_project_hust_spark.operators.aggregations import (
        median_of_means)
    rows = [(i, 100) for i in range(640)] + [(9999, 10_000_000)]
    df = spark.createDataFrame(rows, "k long, v long")
    r = median_of_means(df, "k", F.col("v"), k_groups=32).collect()[0]
    assert r["mean_c"] > 15_000      # mean dragged
    assert r["mom_c"] == 100         # mom untouched


def test_source_vocab_jaccard_bounds(spark):
    """Estimates stay in [0,1e6]; exact values match set identities;
    45 pairs for 10 sources."""
    from bigdata_project_hust_spark.io import load_table
    out = QUERIES["source_vocab_jaccard"].fn(spark, SF_SMOKE).collect()
    n_src = load_table(spark, SF_SMOKE, "documents") \
        .select("source").distinct().count()
    assert len(out) == n_src * (n_src - 1) // 2
    for r in out:
        assert 0 <= r["est_j_e6"] <= 1_000_000
        assert 0 <= r["exact_j_e6"] <= 1_000_000
        assert r["inter"] <= min(r["n_a"], r["n_b"])


def test_source_vocab_jaccard_identical_sets(spark):
    from bigdata_project_hust_spark.operators.sketches import (
        source_vocab_jaccard)
    df = spark.createDataFrame(
        [(1, "a b c", "en", "s1", 1), (2, "a b c", "en", "s2", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    r = source_vocab_jaccard(df).collect()[0]
    assert r["exact_j_e6"] == 1_000_000
    assert r["est_j_e6"] == 1_000_000 and r["n_match"] == 16


# ===========================================================================
# Batch 14: conformal / churn / trimmed mean / feature table
# ===========================================================================

def test_conformal_quantile_rank(spark, tmp_path):
    """10 residuals 1..10 (one per day-pair at a fixed hour):
    ceil(0.9*11) = 10 -> qhat is the 10th smallest = 10... clamped to
    n. Build 11 days with alternating totals so |resid| ramps."""
    rows = []
    eid = 0
    vals = [0, 1, 3, 6, 10, 15, 21, 28, 36, 45, 55]  # diffs 1..10
    for d, v in enumerate(vals):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + d, 5), 1, "view",
                     float(v), "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        conformal_forecast_intervals)
    d = _events(spark, tmp_path, rows)
    r = conformal_forecast_intervals(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["n_calibration"] == 10
    # residuals are 100,200,...,1000 cents; ceil(0.9*11)=10 -> 1000
    assert r["qhat_cents"] == 1000


def test_churn_rate_hand_values(spark, tmp_path):
    """Horizon day D: a user last seen D-7 churns, one seen D does
    not."""
    rows = [(1, datetime(2024, 1, 1), 2, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 8), 4, "view", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import churn_labels
    d = _events(spark, tmp_path, rows)
    out = {r["arm"]: r for r in churn_labels(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()}
    assert out[0]["n_users"] == 2 and out[0]["n_churned"] == 1
    assert out[0]["churn_rate_e6"] == 500_000


def test_trimmed_mean_drops_tails(spark):
    """Values 1..10 with trim 10%: drop rank 1 and rank 10 -> mean of
    2..9 = 5.5 -> floor 5."""
    from bigdata_project_hust_spark.operators.aggregations import (
        trimmed_mean)
    df = spark.createDataFrame([("a", i) for i in range(1, 11)],
                               "g string, v long")
    r = trimmed_mean(df, "g", F.col("v")).collect()[0]
    assert r["n_kept"] == 8 and r["trimmed_mean_c"] == 5


def test_revenue_features_lags(spark):
    out = QUERIES["daily_revenue_features"].fn(spark, SF_SMOKE).collect()
    by_day = {r["day"]: r for r in out}
    days = sorted(by_day)
    for i, d in enumerate(days[1:], start=1):
        if days[i - 1] == d - 0:   # adjacency not guaranteed; check lag1
            pass
    # lag1 references the PREVIOUS OBSERVED day row
    for i in range(1, len(days)):
        assert by_day[days[i]]["rev_lag1"] == by_day[days[i - 1]]["rev"]
    assert all(0 <= r["dow"] <= 6 for r in out)


# ===========================================================================
# Batch 15: first-touch attribution / session durations
# ===========================================================================

def test_first_touch_earliest_view_wins(spark, tmp_path):
    """Two views precede the purchase: first-touch credits the
    EARLIER one (last-touch would credit the later)."""
    def at(s):
        return datetime(2024, 1, 1, 0, 0, s)
    rows = [(1, at(0), 1, "view", 1.0, "{}"),
            (2, at(10), 1, "view", 1.0, "{}"),
            (3, at(20), 1, "purchase", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        first_touch_attribution, purchase_attribution)
    d = _events(spark, tmp_path, rows)
    ev = spark.read.parquet(os.path.join(d, "events.parquet"))
    ft = first_touch_attribution(ev).collect()[0]
    lt = purchase_attribution(ev).collect()[0]
    assert ft["attributed_view_id"] == 1
    assert lt["attributed_view_id"] == 2
    assert ft["view_to_purchase_s"] == 20


def test_first_touch_window_rejects_stale_view(spark, tmp_path):
    rows = [(1, datetime(2024, 1, 1), 1, "view", 1.0, "{}"),
            (2, datetime(2024, 1, 3), 1, "purchase", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        first_touch_attribution)
    d = _events(spark, tmp_path, rows)
    r = first_touch_attribution(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["attributed_view_id"] == -1


def test_session_duration_buckets(spark, tmp_path):
    """One 2-event session 90s long (bucket 6) and one single-event
    session (bucket -1, separated by > gap)."""
    def at(m, s=0):
        return datetime(2024, 1, 1, 0, m, s)
    rows = [(1, at(0), 1, "view", 1.0, "{}"),
            (2, at(1, 30), 1, "view", 1.0, "{}"),
            (3, at(59), 1, "view", 1.0, "{}")]
    from bigdata_project_hust_spark.operators.eventflow import (
        session_duration_histogram)
    d = _events(spark, tmp_path, rows)
    out = {r["log2_bucket"]: r["n_sessions"]
           for r in session_duration_histogram(
               spark.read.parquet(
                   os.path.join(d, "events.parquet"))).collect()}
    assert out == {-1: 1, 6: 1}


# ===========================================================================
# Batch 16: rolling correlation / nearest-in-time / readability rollup
# ===========================================================================

def test_rolling_corr_perfect_comovement(spark, tmp_path):
    """x and y proportional on every day -> corr pins to 1e6 once the
    window holds >= 2 days."""
    rows = []
    eid = 0
    for d in range(5):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + d), 1, "view",
                     1.0 * (d + 1), "{}"))
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + d), 1, "purchase",
                     2.0 * (d + 1), "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        rolling_corr_daily)
    d = _events(spark, tmp_path, rows)
    out = rolling_corr_daily(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert out[0]["corr_e6"] == 0          # single-day window
    for r in out[1:]:
        assert r["corr_e6"] == 1_000_000


def test_nearest_in_time_picks_closer_side(spark):
    """Left at t=100: right rows at 40 and 130 -> 130 wins (|30|<|60|);
    left at t=35 -> 40 wins; tie prefers the earlier right row."""
    from bigdata_project_hust_spark.operators.joins import nearest_in_time
    left = spark.createDataFrame(
        [(1, 100, 10), (1, 35, 11), (1, 85, 12)],
        "k long, t long, lid long")
    right = spark.createDataFrame(
        [(1, 40, 7), (1, 130, 8)], "k long, t long, rid long")
    out = {r["lid"]: r for r in nearest_in_time(
        left, right, "k", "t", "t", "lid", "rid").collect()}
    assert out[10]["nearest_rid"] == 8 and out[10]["abs_delta_s"] == 30
    assert out[11]["nearest_rid"] == 7 and out[11]["abs_delta_s"] == 5
    # t=85: deltas 45 both sides -> earlier (40, rid 7) wins
    assert out[12]["nearest_rid"] == 7 and out[12]["abs_delta_s"] == 45


def test_nearest_in_time_no_right_rows(spark):
    from bigdata_project_hust_spark.operators.joins import nearest_in_time
    left = spark.createDataFrame([(1, 5, 10)], "k long, t long, lid long")
    right = spark.createDataFrame([(2, 5, 7)], "k long, t long, rid long")
    r = nearest_in_time(left, right, "k", "t", "t",
                        "lid", "rid").collect()[0]
    assert r["nearest_rid"] == -1 and r["abs_delta_s"] == -1


def test_readability_by_lang_shape(spark):
    out = QUERIES["readability_by_lang"].fn(spark, SF_SMOKE).collect()
    assert len(out) >= 3
    for r in out:
        assert r["mean_flesch_e3"] == (
            r["sum_flesch_e3"] // r["n_docs"]
            if r["sum_flesch_e3"] >= 0
            else r["mean_flesch_e3"])  # floor semantics checked by oracle


# ===========================================================================
# Batch 17: sliding HLL maintenance / rank with ties
# ===========================================================================

def test_sliding_hll_merge_always_matches_direct(spark):
    out = QUERIES["sliding_hll_wau"].fn(spark, SF_SMOKE).collect()
    assert len(out) > 0
    assert all(r["merge_matches_direct"] == 1 for r in out)
    assert all(r["exact_wau"] > 0 for r in out)


def test_top_with_ties_includes_boundary_ties(spark):
    """rank() keeps every row tying the k-th value — n_rows >= 10 and
    every rnk <= 10."""
    out = QUERIES["top_orders_with_ties"].fn(spark, SF_SMOKE).collect()
    assert len(out) >= 10
    assert all(r["rnk"] <= 10 for r in out)
    vals = sorted((r["cents"] for r in out), reverse=True)
    assert vals == [r["cents"] for r in
                    sorted(out, key=lambda x: (-x["cents"]))]


# ===========================================================================
# Batch 18: session PMI / skyline
# ===========================================================================

def test_session_pmi_cooccurrence(spark, tmp_path):
    """view+click together in 3 sessions, purchase alone in 3 others:
    (click,view) survives min_pair; PMI = ln(n*c_ab/(c_a*c_b))."""
    rows = []
    eid = 0
    for s in range(3):
        base = datetime(2024, 1, 1 + s)
        eid += 1
        rows.append((eid, base, 1, "view", 1.0, "{}"))
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + s, 0, 1), 1, "click",
                     1.0, "{}"))
    for s in range(3):
        eid += 1
        rows.append((eid, datetime(2024, 2, 1 + s), 1, "purchase",
                     1.0, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        session_type_pmi)
    d = _events(spark, tmp_path, rows)
    out = session_type_pmi(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["ta"], r["tb"]) == ("click", "view")
    assert r["n_cooccur"] == 3 and r["n_a"] == 3 and r["n_b"] == 3
    assert r["pmi_e6"] == math.floor(math.log(6 * 3 / 9.0) * 1e6)


def test_skyline_orders_pareto_property(spark):
    """No skyline row is dominated: every earlier-day row has
    strictly smaller cents."""
    out = QUERIES["skyline_orders"].fn(spark, SF_SMOKE).collect()
    assert len(out) >= 1
    by_day = {}
    for r in out:
        by_day.setdefault(r["day"], []).append(r["cents"])
    run = None
    for d in sorted(by_day):
        if run is not None:
            assert min(by_day[d]) > run   # beats every earlier day
        run = max(run or 0, max(by_day[d]))


# ===========================================================================
# Batch 19: ANOVA / ECDF
# ===========================================================================

def test_anova_identical_groups_zero_f(spark):
    """Groups with the same values -> SSB floors to ~0 -> F ~ 0."""
    from bigdata_project_hust_spark.operators.aggregations import (
        anova_oneway)
    rows = [("a", v) for v in (1, 2, 3)] + [("b", v) for v in (1, 2, 3)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_oneway(df, "g", F.col("v")).collect()[0]
    assert r["k_groups"] == 2 and r["n_rows"] == 6
    assert abs(r["f_e3"]) <= 1


def test_anova_separated_groups_large_f(spark):
    from bigdata_project_hust_spark.operators.aggregations import (
        anova_oneway)
    rows = [("a", v) for v in (10, 11, 12)] + \
           [("b", v) for v in (100, 101, 102)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_oneway(df, "g", F.col("v")).collect()[0]
    assert r["f_e3"] > 1_000_000   # F >> 1000


def test_ecdf_monotone_and_bounded(spark):
    out = QUERIES["ecdf_value_by_type"].fn(spark, SF_SMOKE).collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["event_type"], []).append(
            (r["point_c"], r["share_e6"], r["n_le"], r["n"]))
    for g, rows in by_g.items():
        rows.sort()
        shares = [s for _, s, _, _ in rows]
        assert shares == sorted(shares)          # monotone
        assert all(0 <= s <= 1_000_000 for s in shares)
        for _, s, n_le, n in rows:
            assert s == (n_le * 1_000_000) // n


# ===========================================================================
# Batch 20: Welch t / coefficient of variation
# ===========================================================================

def test_welch_identical_arms_zero_t(spark, tmp_path):
    """Mirror-image arms -> t pins near 0."""
    rows = []
    eid = 0
    for u in (2, 4, 3, 5):
        for v in (1.0, 2.0, 3.0):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), u, "view", v, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        welch_t_value)
    d = _events(spark, tmp_path, rows)
    r = welch_t_value(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["n_a"] == 6 and r["n_b"] == 6
    assert abs(r["t_e6"]) <= 1
    assert r["dof_e3"] == 10_000    # equal variances -> dof = n1+n2-2


def test_welch_separated_means_large_t(spark, tmp_path):
    rows = []
    eid = 0
    for u in (2, 4):
        for v in (1.0, 1.1, 0.9):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), u, "view", v, "{}"))
    for u in (3, 5):
        for v in (10.0, 10.1, 9.9):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), u, "view", v, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        welch_t_value)
    d = _events(spark, tmp_path, rows)
    r = welch_t_value(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["t_e6"] < -10_000_000   # arm0 mean far below arm1


def test_cv_hand_value(spark):
    """Values (1,2,3): mean 2, sample stdev 1 -> cv = 0.5."""
    from bigdata_project_hust_spark.operators.aggregations import (
        cv_by_group)
    df = spark.createDataFrame([("a", 1), ("a", 2), ("a", 3)],
                               "g string, v long")
    r = cv_by_group(df, "g", F.col("v")).collect()[0]
    assert r["cv_e6"] == 500_000


# ===========================================================================
# Batch 21: Cramér's V / cluster impurity
# ===========================================================================

def test_cramers_v_independent_near_zero(spark):
    from bigdata_project_hust_spark.operators.aggregations import cramers_v
    rows = [(r, c) for r in ("a", "b") for c in ("x", "y")
            for _ in range(25)]
    df = spark.createDataFrame(rows, "r string, c string")
    res = cramers_v(df, F.col("r"), F.col("c")).collect()[0]
    assert res["cramers_v_e6"] <= 1000   # exactly independent


def test_cramers_v_perfect_association(spark):
    from bigdata_project_hust_spark.operators.aggregations import cramers_v
    rows = [("a", "x")] * 30 + [("b", "y")] * 30
    df = spark.createDataFrame(rows, "r string, c string")
    res = cramers_v(df, F.col("r"), F.col("c")).collect()[0]
    assert res["cramers_v_e6"] >= 999_000


def test_cluster_impurity_bounds_and_conservation(spark):
    from bigdata_project_hust_spark.io import load_table
    out = QUERIES["cluster_label_impurity"].fn(spark, SF_SMOKE).collect()
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert sum(r["n_vecs"] for r in out) == n
    for r in out:
        assert 0 <= r["gini_impurity_e6"] < 1_000_000


# ===========================================================================
# Batch 22: Brown-Forsythe / runs test
# ===========================================================================

def test_brown_forsythe_equal_spread_small_f(spark, tmp_path):
    """Same dispersion in both groups -> F near 0; blown-up spread in
    one group -> F large."""
    rows = []
    eid = 0
    for g, scale in (("view", 1.0), ("click", 1.0)):
        for v in (1.0, 2.0, 3.0, 4.0, 5.0):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), 1, g,
                         v * scale, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        brown_forsythe)
    d = _events(spark, tmp_path, rows)
    r = brown_forsythe(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["bf_f_e3"] <= 10

    rows2 = []
    eid = 0
    for v in (1.0, 2.0, 3.0, 4.0, 5.0):
        eid += 1
        rows2.append((eid, datetime(2024, 1, 1), 1, "view", v, "{}"))
    for v in (1.0, 20.0, 40.0, 60.0, 80.0):
        eid += 1
        rows2.append((eid, datetime(2024, 1, 1), 1, "click", v, "{}"))
    d2 = _events(spark, tmp_path.joinpath("b"), rows2)
    r2 = brown_forsythe(
        spark.read.parquet(os.path.join(d2, "events.parquet"))).collect()[0]
    assert r2["bf_f_e3"] > 3_000


def test_runs_test_alternating_vs_streaky(spark, tmp_path):
    """Perfectly alternating above/below days -> many runs -> z > 0;
    two long streaks -> few runs -> z < 0."""
    from bigdata_project_hust_spark.operators.eventflow import (
        runs_test_daily)
    rows = []
    eid = 0
    for dday in range(10):
        v = 10.0 if dday % 2 == 0 else 1.0
        eid += 1
        rows.append((eid, datetime(2024, 1, 1 + dday), 1, "view",
                     v, "{}"))
    d = _events(spark, tmp_path, rows)
    r = runs_test_daily(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["n_runs"] == 10 and r["z_e6"] > 2_000_000

    rows2 = []
    eid = 0
    for dday in range(10):
        v = 10.0 if dday < 5 else 1.0
        eid += 1
        rows2.append((eid, datetime(2024, 1, 1 + dday), 1, "view",
                      v, "{}"))
    d2 = _events(spark, tmp_path.joinpath("b"), rows2)
    r2 = runs_test_daily(
        spark.read.parquet(os.path.join(d2, "events.parquet"))).collect()[0]
    assert r2["n_runs"] == 2 and r2["z_e6"] < -2_000_000


# ===========================================================================
# Batch 23: Kruskal-Wallis / Cohen's d
# ===========================================================================

def test_kruskal_identical_groups_small_h(spark, tmp_path):
    rows = []
    eid = 0
    for g in ("view", "click"):
        for v in (1.0, 2.0, 3.0, 4.0):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), 1, g, v, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        kruskal_wallis)
    d = _events(spark, tmp_path, rows)
    r = kruskal_wallis(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["k_groups"] == 2 and r["h_e3"] <= 10


def test_kruskal_separated_groups_large_h(spark, tmp_path):
    rows = []
    eid = 0
    for v in (1.0, 2.0, 3.0, 4.0):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1), 1, "view", v, "{}"))
    for v in (100.0, 101.0, 102.0, 103.0):
        eid += 1
        rows.append((eid, datetime(2024, 1, 1), 1, "click", v, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        kruskal_wallis)
    d = _events(spark, tmp_path, rows)
    r = kruskal_wallis(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    # fully separated 2x4: H = 12/(8*9) * (4*(2.5-4.5)^2 + 4*(6.5-4.5)^2)
    import math as m
    exp = 12.0 / 72.0 * (4 * 4.0 + 4 * 4.0)
    assert abs(r["h_e3"] / 1e3 - exp) < 0.01


def test_cohens_d_sign_and_magnitude(spark, tmp_path):
    """Arm means 1.00 vs 10.00 with unit-ish spread -> large negative
    d (arm0 - arm1)."""
    rows = []
    eid = 0
    for u in (2, 4):
        for v in (0.9, 1.0, 1.1):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), u, "view", v, "{}"))
    for u in (3, 5):
        for v in (9.9, 10.0, 10.1):
            eid += 1
            rows.append((eid, datetime(2024, 1, 1), u, "view", v, "{}"))
    from bigdata_project_hust_spark.operators.eventflow import (
        cohens_d_arms)
    d = _events(spark, tmp_path, rows)
    r = cohens_d_arms(
        spark.read.parquet(os.path.join(d, "events.parquet"))).collect()[0]
    assert r["cohens_d_e6"] < -50_000_000   # |d| >> 50
