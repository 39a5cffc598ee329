"""Oracle-diff correctness gate (SURVEY §5.2): every declared query vs
DuckDB on the same parquet, at the fast dev SF. The driver repeats this
at sf0.01; scripts/driver_sim.py is the full-size local replica."""

from __future__ import annotations

import pytest

from yamon_spark.oracle import compare_query, duckdb_conn
from yamon_spark.queries import all_queries

QUERY_NAMES = sorted(all_queries())


@pytest.fixture(scope="module")
def oracle(sf_dir):
    con = duckdb_conn(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, oracle, sf_dir, name):
    r = compare_query(spark, oracle, name, sf_dir)
    assert r.ok, f"{name}: {r.detail}"
