"""The composite multimodal curation pipeline (VERDICT r8 #5):
decode both modalities through the REAL codecs → per-modality quality
gates → perceptual-fingerprint dedup → keeper election, registered as
a bench headliner with a closed-form DuckDB oracle."""

from __future__ import annotations

from bigdata_project_hust_spark.plans.queries import (
    ORACLE_MM_CURATION, QUERIES, q_multimodal_curation)
from tests.oracle_harness import compare, duck_connection

SF = "/root/testdata/sf0.001"


def test_curation_vs_duckdb_oracle(spark):
    """Driver-identical compare: the whole decode→gate→dedup chain
    reproduces the oracle's closed-form integers bit-for-bit."""
    res = compare(q_multimodal_curation(spark, SF),
                  duck_connection(SF), ORACLE_MM_CURATION)
    assert res["n_spark"] == res["n_duck"] > 0
    assert res["hash"], res


def test_curation_gates_actually_drop_rows(spark):
    """The quality gates must be live (not vacuous): fewer fingerprint
    groups members than documents, and every group keeper is a member
    with the minimum id (keeper election is deterministic)."""
    import pyspark.sql.functions as F

    out = q_multimodal_curation(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    agg = out.agg(F.sum("n_assets").alias("kept"),
                  F.count("*").alias("groups")).collect()[0]
    n_docs = docs.count()
    assert 0 < agg.kept < n_docs          # gates dropped someone
    # strictly fewer groups than members: at least one fingerprint
    # actually collides (groups == kept would mean the perceptual
    # hash degenerated to per-asset uniqueness — 363 groups / 494
    # kept measured at this SF)
    assert agg.groups < agg.kept
    assert QUERIES["multimodal_curation"].headline
