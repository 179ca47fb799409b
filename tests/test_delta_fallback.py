"""VERDICT.md round 1 item 7: Delta Lake is what the reference writes
(`notebooks/20_analytics.ipynb:653, 2200, 2561`), but `delta-spark` is
not installed in this container and the sandbox forbids installing it.
These tests make the fallback contract EXPLICIT: the format switch
detects the runtime honestly, and the parquet path preserves every
overwrite/append semantic the reference's pipelines rely on
(`21_EDA.ipynb:33360-33367` run-log append; idempotent re-publish).
test_writers_catalog.py covers idempotency/content-replacement/dynamic
partition overwrite; this file pins the remaining Delta-adjacent edges:
snapshot schema replacement on overwrite and append schema enforcement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from rearc_data_engineer_takehome_spark.sources import writers


@pytest.fixture()
def db(spark):
    name = "fallback_db"
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")
    yield name
    spark.sql(f"DROP DATABASE IF EXISTS {name} CASCADE")


def test_format_switch_detects_runtime(spark):
    fmt = writers._table_format(spark)
    assert fmt in ("delta", "parquet")
    try:
        import delta  # noqa: F401

        has_delta = True
    except ImportError:
        has_delta = False
    # honest detection: delta iff the runtime actually has it wired
    # into the JVM (pip package alone is not enough, but absence of
    # the package guarantees absence of the JVM class)
    if not has_delta:
        assert fmt == "parquet"


def test_overwrite_replaces_schema_snapshot(spark, db):
    """Delta needs overwriteSchema=true for this; the parquet fallback
    replaces the full snapshot including schema — re-publishing a
    curated table with an evolved schema must converge to the NEW
    schema with no stale columns or stale rows surviving."""
    t = f"{db}.curated"
    writers.publish_overwrite(
        spark.createDataFrame([Row(k=1, old_col="a")]), t
    )
    writers.publish_overwrite(
        spark.createDataFrame([Row(k=2, new_col=7.5)]), t
    )
    got = spark.table(t)
    assert sorted(got.columns) == ["k", "new_col"]
    rows = got.collect()
    assert len(rows) == 1 and rows[0].k == 2 and rows[0].new_col == 7.5


def test_append_enforces_schema(spark, db):
    """The run-log contract (S14): appends accumulate, and a frame with
    a DIFFERENT schema must fail loudly instead of silently widening or
    nulling — Delta enforces this transactionally; the parquet fallback
    must surface the same protection via Spark's table-insert analysis."""
    t = f"{db}.runlog"
    writers.publish_append(
        spark.createDataFrame([Row(run_id=1, status="ok")]), t
    )
    writers.publish_append(
        spark.createDataFrame([Row(run_id=2, status="fail")]), t
    )
    assert spark.table(t).count() == 2
    with pytest.raises(Exception, match="(?i)column|schema|resolve"):
        writers.publish_append(
            spark.createDataFrame([Row(run_id=3, extra=True)]), t
        )
    # failed append must not have committed partial rows
    assert spark.table(t).count() == 2
