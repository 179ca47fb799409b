"""Data-quality operator tests (reference V1-V10) over the driver fixtures
and synthetic edge cases."""

from __future__ import annotations

import pytest

from rearc_data_engineer_takehome_spark.operators import quality


@pytest.fixture(scope="module")
def orders(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem(spark, sf_smoke):
    return spark.read.parquet(f"{sf_smoke}/lineitem.parquet")


def test_null_profile_shape(spark, orders):
    prof = quality.null_profile(orders)
    rows = {r.column: (r.n_nulls, r.pct_nulls) for r in prof.collect()}
    assert set(rows) == set(orders.columns)
    assert all(n == 0 for n, _ in rows.values())  # fixture has no nulls


def test_null_profile_counts_nulls(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "x"), (None, None)], ["a", "b"]
    )
    rows = {r.column: r.n_nulls for r in quality.null_profile(df).collect()}
    assert rows == {"a": 1, "b": 2}


def test_duplicate_rows_and_keys(spark):
    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "c")], ["k", "v"]
    )
    full = quality.duplicate_rows(df).collect()
    assert [(r.k, r.v, r.n_copies) for r in full] == [(1, "a", 2)]
    keys = quality.duplicate_keys(df, ["k"]).collect()
    assert sorted((r.k, r.n) for r in keys) == [(1, 2), (2, 2)]


def test_domain_check(spark, lineitem):
    dom = quality.domain_check(lineitem, "l_returnflag", allowed=["A", "N", "R"])
    rows = dom.collect()
    assert all(r.in_domain for r in rows)
    assert {r.l_returnflag for r in rows} <= {"A", "N", "R"}


def test_completeness(spark):
    df = spark.createDataFrame(
        [("s1", 2000, "Q1"), ("s1", 2000, "Q2"), ("s1", 2000, "Q3"),
         ("s1", 2000, "Q4"), ("s2", 2000, "Q1")],
        ["sid", "yr", "q"],
    )
    rows = {(r.sid, r.yr): (r.n_present, r.is_complete)
            for r in quality.completeness(df, ["sid", "yr"], "q", 4).collect()}
    assert rows == {("s1", 2000): (4, True), ("s2", 2000): (1, False)}


def test_iqr_outliers_in_plan(spark):
    data = [(float(i),) for i in range(1, 101)] + [(1000.0,), (-1000.0,)]
    df = spark.createDataFrame(data, ["v"])
    out = quality.iqr_outliers(df, "v")
    vals = sorted(r.v for r in out.collect())
    assert vals == [-1000.0, 1000.0]


def test_assertions(spark):
    df = spark.createDataFrame([(1, "a"), (None, "b")], ["k", "v"])
    with pytest.raises(quality.ValidationError, match="NULL critical"):
        quality.assert_no_nulls(df, ["k"], "test")
    quality.assert_no_nulls(df, ["v"], "test")  # no nulls in v → passes
    assert quality.assert_non_empty(df, "test") == 2
    with pytest.raises(quality.ValidationError, match="duplicate key"):
        quality.assert_unique_keys(
            spark.createDataFrame([(1,), (1,)], ["k"]), ["k"], "test"
        )


def test_dq_summary(spark):
    df = spark.createDataFrame([(1, "a"), (1, "a"), (2, None)], ["k", "v"])
    row = quality.dq_summary(df, ["k"], "2026-01-01T00:00:00Z").collect()[0]
    assert row.n_rows == 3
    assert row.n_full_row_dups == 1
    assert row.n_key_dups == 1
    assert row.n_null_cells == 1
