"""Run every declared query against its DuckDB oracle at sf0.001 — a local
rehearsal of the driver's CORRECTNESS gate (it runs the same comparison at
sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_utils import compare, duckdb_conn

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_conn(sf_dir)
    yield c
    c.close()


def test_every_query_has_callable():
    assert QUERIES, "no queries declared"
    for name, fn in QUERIES.items():
        assert callable(fn), name


def test_oracle_coverage():
    """Every oracle key must have a query; queries without oracles are the
    known rows-only set."""
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, sf_dir, con, name):
    df = QUERIES[name](spark, sf_dir)
    ok, msg = compare(df, con, ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
