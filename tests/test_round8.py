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


def test_leakage_safe_split_has_zero_cross_split_pairs(spark):
    """The construction guarantee: hash-splitting by component means
    no near-dup pair straddles splits."""
    from bigdata_project_hust_spark.operators import dedup
    from bigdata_project_hust_spark.functions.scalar import stable_hash64
    from bigdata_project_hust_spark.plans.round8 import _SPLIT_SEED
    d = spark.read.parquet(f"{SF}/documents.parquet")
    pairs = dedup.minhash_near_duplicates(d)
    comp = dedup.connected_components(pairs).withColumnRenamed(
        "node", "doc_id")
    full = (d.select("doc_id").join(comp, "doc_id", "left")
            .select("doc_id", F.coalesce("component", F.col("doc_id"))
                    .alias("component")))
    s = F.pmod(stable_hash64(F.col("component").cast("string"),
                             seed=_SPLIT_SEED), F.lit(10))
    sp = full.select("doc_id", s.alias("b"))
    a = sp.select(F.col("doc_id").alias("doc_a"), F.col("b").alias("ba"))
    b = sp.select(F.col("doc_id").alias("doc_b"), F.col("b").alias("bb"))
    straddle = (pairs.join(a, "doc_a").join(b, "doc_b")
                .where(F.col("ba") != F.col("bb")).count())
    assert straddle == 0
    # while the doc-level split DOES leak on this corpus (the audit
    # query exists because it catches something)
    from bigdata_project_hust_spark.plans.round8 import (
        q_split_leakage_audit)
    leaked = sum(r["n_pairs"] for r in
                 q_split_leakage_audit(spark, SF).collect()
                 if r["leaked"] == 1)
    assert leaked > 0


def test_leakage_safe_split_census_covers_corpus(spark):
    from bigdata_project_hust_spark.plans.round8 import (
        q_leakage_safe_split)
    rows = q_leakage_safe_split(spark, SF).collect()
    d = spark.read.parquet(f"{SF}/documents.parquet")
    assert sum(r["n_docs"] for r in rows) == d.count()
    for r in rows:
        assert r["n_components"] <= r["n_docs"]
