"""Round-8: split-leakage audit, dedup-method kappa, IVF-PQ recall."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_project_hust_spark.plans.round8 import (
    q_ann_recall_ivfpq, q_dedup_method_kappa, q_split_leakage_audit)

SF = "/root/testdata/sf0.001"


def test_split_leakage_rows_partition_pairs(spark):
    out = q_split_leakage_audit(spark, SF).collect()
    assert out, "fixture corpus has near-dup pairs"
    for r in out:
        assert r["leaked"] == int(r["split_a"] != r["split_b"])
        assert r["n_pairs"] >= 1
    # the (split_a, split_b) cells are disjoint groups of the pair set
    cells = [(r["split_a"], r["split_b"]) for r in out]
    assert len(cells) == len(set(cells))


def test_split_assignment_is_80_10_10ish(spark):
    from bigdata_project_hust_spark.plans.round8 import _split_expr
    d = spark.read.parquet(f"{SF}/documents.parquet")
    counts = {r["s"]: r["c"] for r in
              d.select(_split_expr().alias("s"))
               .groupBy("s").agg(F.count("*").alias("c")).collect()}
    n = sum(counts.values())
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] + counts["test"]
    assert abs(counts["train"] / n - 0.8) < 0.1


def test_kappa_census_sums_to_corpus(spark):
    r = q_dedup_method_kappa(spark, SF).collect()[0]
    assert r["n"] == r["n11"] + r["n10"] + r["n01"] + r["n00"]
    assert -1_000_000 <= r["kappa_e6"] <= 1_000_000
    # exact dups are a subset of near-dups at Jaccard >= 1/2 only if
    # texts are identical => their shingle sets are equal; md5-equal
    # docs must be near-dup flagged too, so n10 (exact-only) == 0
    assert r["n10"] == 0


def test_kappa_formula_hand_computed(spark):
    # census (n11,n10,n01,n00) = (2,1,1,6): po=0.8, pe=(3*3+7*7)/100
    # kappa = (0.8-0.58)/(1-0.58) = 0.523809...
    n11, n10, n01, n00 = 2, 1, 1, 6
    n = n11 + n10 + n01 + n00
    num = (n11 + n00) * n - ((n11 + n10) * (n11 + n01)
                             + (n01 + n00) * (n10 + n00))
    den = n * n - ((n11 + n10) * (n11 + n01)
                   + (n01 + n00) * (n10 + n00))
    import math
    assert math.floor(num * 1_000_000 / den) == 523_809


def test_ivfpq_recall_bounds(spark):
    r = q_ann_recall_ivfpq(spark, SF).collect()[0]
    assert r["k"] == 10
    assert 0 <= r["n_hits"] <= 10
    assert r["recall_e6"] == r["n_hits"] * 100_000
    # the probed lists cover the query's own neighborhood, so the
    # index should find at least one true neighbor on the fixture
    assert r["n_hits"] >= 1
