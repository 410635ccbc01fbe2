"""Smoke tests for the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    assert df.count() >= 0
    assert set(df.columns) == {"cluster_id", "cluster_size"}


def test_queries_and_oracles_consistent():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert len(qs) >= 20
    assert set(oracles) <= set(qs), "oracle for unregistered query"
    # since round 3 EVERY registered query carries a DuckDB oracle (the
    # approximate families as within-bounds contracts)
    assert set(oracles) == set(qs)


def test_each_query_runs_at_sf0001(spark, sf_dir):
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(3).collect()
