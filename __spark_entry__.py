"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (SURVEY §7.1) on sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY §2 plus the training-data-pipeline extensions, each paired with
a DuckDB oracle where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bigdata_project_hust_spark.plans.queries import QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-5 KOLs (influence score ≥ 50) per region: F1 score expression →
    P2 threshold → broadcast dimension joins → per-group top-k window.
    """
    return QUERIES["flagship_top_kols_per_region"].fn(
        spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY §2 (+ extensions)."""
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin per query; omitted entries (map-
    typed or LSH-self-join outputs) get the driver's rows-only check."""
    return {name: spec.oracle for name, spec in QUERIES.items()
            if spec.oracle is not None}
