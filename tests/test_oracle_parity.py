"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast) — the local twin of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest
from pyspark.sql.types import ArrayType, MapType, StructType

from bigdata_project_hust_spark.plans.queries import QUERIES

from .conftest import SF_SMOKE
from .oracle_harness import compare, driver_canon, duck_connection

ORACLED = [n for n, s in QUERIES.items() if s.oracle is not None]


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_SMOKE)
    res = compare(df, duck, spec.oracle)
    assert res["cols"], f"{name}: columns {res['spark_cols']} vs {res['duck_cols']}"
    assert res["rows"], f"{name}: rows {res['n_spark']} vs {res['n_duck']}"
    assert res["hash"], f"{name}: value hash mismatch"


@pytest.mark.parametrize("name", [n for n, s in QUERIES.items()
                                  if s.oracle is None])
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name].fn(spark, SF_SMOKE)
    rows = [tuple(r) for r in df.collect()]
    # the real driver canonicalizes rows-only results too
    driver_canon(df.columns, rows)
    assert len(df.columns) > 0


@pytest.mark.parametrize("name", list(QUERIES))
def test_registry_outputs_are_driver_hashable(spark, name):
    """Registry guard (round-1 verdict item 3): the driver canonicalizes
    EVERY queries() output with pandas sort_values, which raises on
    array/map/struct cells — so no registered query may emit complex
    output types. Schema-level check; plan-only, no execution."""
    df = QUERIES[name].fn(spark, SF_SMOKE)
    bad = [f.name for f in df.schema.fields
           if isinstance(f.dataType, (ArrayType, MapType, StructType))]
    assert not bad, (
        f"{name}: columns {bad} are array/map/struct-typed — the driver's "
        "pandas canonicalizer will ERR; serialize them to strings "
        "(concat_ws / to_json) in both the query and its oracle")
