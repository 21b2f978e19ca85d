"""Run every registered declared query against the DuckDB oracle at
sf0.001 — the local mirror of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from s2_spark.registry import all_queries
from tests.oracle import compare, duck_connect

QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connect(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only smoke for non-SQL-expressible ops
    else:
        compare(df, duck, q.oracle)
