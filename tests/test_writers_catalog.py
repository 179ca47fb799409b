"""Table publishing semantics (S13/S14) + catalog DDL surface (D1/D4/D5):
overwrite idempotency, append accumulation, partitioned sinks, database
namespace round-trip."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.sources import writers


@pytest.fixture()
def db(spark):
    writers.ensure_database(spark, "curated_test")
    spark.sql("USE curated_test")
    yield "curated_test"
    spark.sql("USE default")
    spark.sql("DROP DATABASE IF EXISTS curated_test CASCADE")


def test_publish_overwrite_is_idempotent(spark, db):
    df = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    writers.publish_overwrite(df, "t_over")
    writers.publish_overwrite(df, "t_over")  # re-run converges, no dup rows
    got = spark.table("t_over")
    assert got.count() == 2
    assert sorted((r.k, r.v) for r in got.collect()) == [(1, "a"), (2, "b")]


def test_publish_overwrite_replaces_content(spark, db):
    writers.publish_overwrite(
        spark.createDataFrame([(1, "old")], ["k", "v"]), "t_repl"
    )
    writers.publish_overwrite(
        spark.createDataFrame([(9, "new")], ["k", "v"]), "t_repl"
    )
    assert [(r.k, r.v) for r in spark.table("t_repl").collect()] == [(9, "new")]


def test_publish_append_accumulates_runlog(spark, db):
    run1 = spark.createDataFrame([("r1", 10)], ["run_id", "n_rows"])
    run2 = spark.createDataFrame([("r2", 12)], ["run_id", "n_rows"])
    writers.publish_append(run1, "dq_runlog")
    writers.publish_append(run2, "dq_runlog")
    got = spark.table("dq_runlog")
    assert got.count() == 2
    assert {r.run_id for r in got.collect()} == {"r1", "r2"}


def test_partitioned_parquet_sink_prunes(spark, db, tmp_path):
    df = spark.createDataFrame(
        [(i, "even" if i % 2 == 0 else "odd") for i in range(100)], ["k", "par"]
    )
    path = str(tmp_path / "part_sink")
    writers.write_parquet_dir(df, path, partition_by=["par"])
    back = spark.read.parquet(path).where(F.col("par") == "even")
    from rearc_data_engineer_takehome_spark.plans.explain import formatted_plan

    plan = formatted_plan(back)
    assert back.count() == 50
    # partition filter must prune at planning time, not scan both dirs
    assert "PartitionFilters" in plan and "par" in plan.split("PartitionFilters", 1)[1][:120]


def test_catalog_introspection(spark, db):
    writers.publish_overwrite(
        spark.createDataFrame([(1,)], ["x"]), "t_meta"
    )
    tables = {r.tableName for r in spark.sql("SHOW TABLES").collect()}
    assert "t_meta" in tables
    cols = {r.col_name for r in spark.sql("DESCRIBE TABLE t_meta").collect()}
    assert "x" in cols
    dbs = {r.namespace for r in spark.sql("SHOW DATABASES").collect()}
    assert "curated_test" in dbs


def test_dynamic_partition_overwrite_touches_only_new_partitions(spark, db):
    base = spark.createDataFrame(
        [("2024-01-01", 1, 10.0), ("2024-01-01", 2, 20.0), ("2024-01-02", 3, 30.0)],
        ["day", "k", "v"],
    )
    writers.publish_overwrite(base, "t_dyn", partition_by=["day"])
    # re-publish ONLY day 2 with corrected data (column order must match
    # table schema for insertInto: data cols first, partition col last)
    # deliberately NOT in the stored-table column order (partition col
    # moves last in the table schema) — the writer must realign by name
    fixed = spark.createDataFrame([("2024-01-02", 99, 99.0)], ["day", "k", "v"])
    writers.publish_partition_overwrite(fixed, "t_dyn")
    got = sorted((r.day, r.k, r.v) for r in spark.table("t_dyn").collect())
    assert got == [
        ("2024-01-01", 1, 10.0),   # untouched partition survives
        ("2024-01-01", 2, 20.0),
        ("2024-01-02", 99, 99.0),  # only day-2 replaced
    ]


def test_skewed_grouped_agg_equals_plain(spark, sf_smoke):
    from rearc_data_engineer_takehome_spark.operators.relational import (
        skewed_grouped_agg,
    )
    import pyspark.sql.functions as FF

    li = spark.read.parquet(f"{sf_smoke}/lineitem.parquet")
    plain = li.groupBy("l_returnflag").agg(
        FF.count(FF.lit(1)).alias("n_rows"),
        FF.round(FF.sum("l_quantity"), 2).alias("sum_l_quantity"),
    )
    salted = skewed_grouped_agg(li, ["l_returnflag"], ["l_quantity"], n_salts=8)
    salted = salted.select(
        "l_returnflag", "n_rows", FF.round("sum_l_quantity", 2).alias("sum_l_quantity")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))
