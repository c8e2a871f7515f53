"""The main correctness gate, locally: every oracle-backed query must match
DuckDB exactly; oracle-less queries must at least run and return a stable
schema."""

from __future__ import annotations

import pytest

from npm_mirror_spark.queries import ORACLES, QUERIES
from tests.oracle_harness import compare, duckdb_con

ORACLE_BACKED = sorted(ORACLES)
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("qname", ORACLE_BACKED)
def test_oracle_parity(spark, sf_dir, con, qname):
    df = QUERIES[qname](spark, sf_dir)
    problems = compare(df, con, ORACLES[qname])
    assert not problems, f"{qname}: " + "; ".join(problems)


@pytest.mark.parametrize("qname", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_dir, qname):
    df = QUERIES[qname](spark, sf_dir)
    # stable schema + non-negative row count (the driver's weaker check)
    assert df.columns
    assert df.count() >= 0


def test_every_oracle_has_a_query():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert "package_name" in df.columns
