"""Round-9: compaction planner, skew advisor, Matryoshka recall,
power-iteration PCA, k-fold ridge CV."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from bigdata_project_hust_spark.plans.round9 import (
    _COMPACT_BINS, _CV_FOLDS, q_ann_recall_matryoshka,
    q_compaction_bin_packing, q_embedding_top_component, q_kfold_cv_ridge,
    q_partition_skew_advisor)

SF = "/root/testdata/sf0.001"


def test_compaction_bins_cover_all_files_within_range(spark):
    out = q_compaction_bin_packing(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    n_files = d.select("source", "lang").distinct().count()
    total = d.agg(F.sum("n_chars")).collect()[0][0]
    assert sum(r["n_files"] for r in out) == n_files
    assert sum(r["total_bytes"] for r in out) == total
    # exclusive cumsum => bin ids live in [0, bins)
    assert all(0 <= r["bin"] < _COMPACT_BINS for r in out)
    # fill is relative to target = ceil(total/bins)
    target = -(-total // _COMPACT_BINS)
    for r in out:
        assert r["fill_e6"] == int(r["total_bytes"] * 1_000_000 // target)


def test_skew_advisor_orders_and_salts(spark):
    out = q_partition_skew_advisor(spark, SF).collect()
    assert 1 <= len(out) <= 10
    cnts = [r["cnt"] for r in out]
    assert cnts == sorted(cnts, reverse=True)
    for r in out:
        assert r["n_salts"] >= 1
        # hot keys (above the ceil-mean) need more than one salt
        if r["skew_e6"] > 1_000_000:
            assert r["n_salts"] >= 2


def test_matryoshka_recall_bounds(spark):
    r = q_ann_recall_matryoshka(spark, SF).collect()[0]
    assert r["k"] == 10
    assert 0 <= r["n_hits"] <= 10
    assert r["recall_e6"] == r["n_hits"] * 100_000
    # the fixture cloud is near-isotropic noise, so prefix-truncation
    # recall is legitimately LOW — the audit's whole point is to
    # measure it, not assume it; bounds + oracle parity are the check


def test_top_component_normalized_and_near_top_eigenvalue(spark):
    out = q_embedding_top_component(spark, SF).collect()
    assert len(out) == 64
    assert sorted(r["dim"] for r in out) == list(range(1, 65))
    w = np.array([r["weight_e6"] for r in
                  sorted(out, key=lambda r: r["dim"])], dtype=float)
    # renormalization pins the max-|.| coordinate to exactly +-1e6
    assert np.abs(w).max() == 1_000_000
    # the fixture cloud is near-isotropic, so the top eigenVECTOR is
    # ill-conditioned (λ2/λ1 ≈ 0.93) — the convergence check that IS
    # stable is the Rayleigh quotient against the float Gramian
    rows = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .select("embedding").collect()
    x = np.array([r["embedding"] for r in rows], dtype=float)
    g = x.T @ x
    lmax = np.linalg.eigvalsh(g)[-1]
    rayleigh = w @ (g @ w) / (w @ w)
    assert rayleigh >= 0.95 * lmax


def test_kfold_ridge_partitions_rows_and_fits(spark):
    out = q_kfold_cv_ridge(spark, SF).collect()
    assert len(out) == _CV_FOLDS
    n = spark.read.parquet(f"{SF}/lineitem.parquet").count()
    # the fixture's price~quantity slope is noise-scale (the synthetic
    # lineitem does not enforce extendedprice = qty·unitprice), so no
    # sign assertion — the oracle-parity sweep pins the exact values
    for r in out:
        assert r["n_train"] + r["n_test"] == n
        assert r["mae_cents"] > 0
        # ridge shrinks: |β| bounded by the unridged OLS magnitude
        assert abs(r["beta_e6"]) < 10_000 * 1_000_000
    # folds are disjoint and cover the table
    assert sum(r["n_test"] for r in out) == n
