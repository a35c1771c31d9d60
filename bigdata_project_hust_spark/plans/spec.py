"""Shared query-registry plumbing.

``QuerySpec`` pairs a Spark implementation with its DuckDB oracle (the
driver's correctness contract); ``_t`` is the fixture-table loader every
query module uses.  Split out of ``queries.py`` so additional query
modules (``tpch_more``, ``pipeline_more``) can extend the registry
without circular imports.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from ..io import load_table


@dataclass(frozen=True)
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    headline: bool = False
    doc: str = ""


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
