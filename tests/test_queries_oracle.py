"""Every oracle-declared query must hash-match DuckDB (the driver's t2
gate, run locally at sf0.001 for speed); rows-only queries must at least
run and return a stable schema."""

from __future__ import annotations

import pytest

from hielo_spark.queries import ORACLE, QUERIES

from .oracle_harness import compare, duck_connection


@pytest.fixture(scope="module")
def duck(sf_dir):
    conn = duck_connection(sf_dir)
    yield conn
    conn.close()


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(spark, sf_dir, duck, name):
    sdf = QUERIES[name](spark, sf_dir)
    odf = duck.execute(ORACLE[name]).df()
    problems = compare(sdf, odf, name)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.columns  # stable schema
    assert df.count() >= 0
