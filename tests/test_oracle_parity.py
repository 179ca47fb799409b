"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the same gate the driver applies (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from rearc_data_engineer_takehome_spark.queries import REGISTRY

from .oracle import compare, duckdb_conn


@pytest.fixture(scope="module")
def con(sf_correctness):
    c = duckdb_conn(sf_correctness)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(name, spark, con, sf_correctness):
    q = REGISTRY[name]
    df = q.spark(spark, sf_correctness)
    if q.oracle is None:
        assert df.count() >= 0  # rows-only check, mirrors the driver
        return
    result = compare(df, con, q.oracle)
    assert result["schema_match"], f"{name}: schema mismatch {result}"
    assert result["rowcount_match"], f"{name}: rowcount mismatch {result}"
    assert result["values_match"], f"{name}: value mismatch {result}"
