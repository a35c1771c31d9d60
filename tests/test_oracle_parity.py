"""Differential tests: every registered query vs its DuckDB oracle at
sf0.001 (fast) — the local twin of the driver's sf0.01 gate."""

from __future__ import annotations

import pytest

from bigdata_project_hust_spark.plans.queries import QUERIES

from .conftest import SF_SMOKE
from .oracle_harness import compare, duck_connection

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
    assert df.count() >= 0
    assert len(df.columns) > 0
