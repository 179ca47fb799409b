"""Change data feed reconstructed from the native Delta log +
deletion vectors (delta_log.read_delta_changes): the native
``table_changes`` shape — _change_type/_commit_version/
_commit_timestamp per row — derived without CDC files. DELETE gives
deletes, UPDATE gives its pre-image/post-image pair, appends give
inserts, overwrites give full delete+insert, OPTIMIZE/DV-purge
rewrites are excluded (dataChange=false, rows unchanged)."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.sources import delta_log as dl


def _mk(spark, t, n=1000, parts=4):
    df = spark.range(0, n).select(
        F.col("id"), (F.col("id") % 10).alias("k")
    )
    return dl.write_delta(
        df.repartition(parts), t, stats_cols=["id"]
    )


def _counts(ch):
    return {
        (r["_change_type"], r["_commit_version"]): r["n"]
        for r in ch.groupBy("_change_type", "_commit_version")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_cdf_delete_update_append(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)                                          # v0
    dl.delta_delete(spark, t, "k = 3")                     # v1
    dl.delta_update(spark, t, "k = 4", {"k": "k + 100"})   # v2
    app = spark.range(0, 5).select(
        F.col("id"), F.lit(1).cast("long").alias("k")
    )
    dl.write_delta(app, t, "append")                       # v3
    ch = dl.read_delta_changes(spark, t, 0)
    agg = _counts(ch)
    assert agg == {
        ("delete", 1): 100,
        ("delete", 2): 100,
        ("insert", 2): 100,
        ("insert", 3): 5,
    }
    # pre-image carries the OLD values, post-image the new
    assert ch.where(
        "_commit_version = 1 and k != 3"
    ).count() == 0
    assert ch.where(
        "_commit_version = 2 and _change_type = 'delete' "
        "and k != 4"
    ).count() == 0
    assert ch.where(
        "_commit_version = 2 and _change_type = 'insert' "
        "and k != 104"
    ).count() == 0
    # timestamps ride from commitInfo
    assert ch.where("_commit_timestamp is null").count() == 0


def test_cdf_excludes_optimize_and_tracks_through_it(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    _mk(spark, t)
    dl.delta_delete(spark, t, "k = 3")
    v = dl.delta_compact(spark, t, 1).version  # DV purge rewrite
    assert dl.read_delta_changes(spark, t, v - 1, v).count() == 0
    # the tracked state must roll THROUGH the rewrite: a subsequent
    # overwrite's deletes are the compacted file's live rows
    dl.write_delta(
        spark.createDataFrame([(1, 1)], "id long, k long"), t
    )
    ch = dl.read_delta_changes(spark, t, v)
    agg = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert agg == {"delete": 900, "insert": 1}


def test_cdf_partitioned_restores_partition_columns(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    df = spark.range(0, 100).select(
        F.col("id"), (F.col("id") % 2).cast("string").alias("p")
    )
    dl.write_delta(df, t, partition_by=["p"])
    dl.delta_delete(spark, t, "id < 10 and p = '0'")
    ch = dl.read_delta_changes(spark, t, 0)
    got = sorted(
        (r.id, r.p) for r in ch.where(
            "_change_type = 'delete'"
        ).collect()
    )
    assert got == [(i, "0") for i in range(0, 10, 2)]


def test_cdf_empty_range_and_gc_refusal(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t)
    dl.delta_delete(spark, t, "k = 1")
    assert dl.read_delta_changes(spark, t, 1, 1).count() == 0
    dl.write_checkpoint(t)
    os.remove(dl._commit_path(t, 1))
    with pytest.raises(ValueError, match="garbage-collected"):
        dl.read_delta_changes(spark, t, 0).count()


def test_cdf_pins_end_schema_after_evolution(spark, tmp_path):
    t = str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame([(1,)], "id long"), t
    )  # v0 (outside the feed: since is exclusive, like increments)
    dl.write_delta(
        spark.createDataFrame([(2,)], "id long"), t, "append"
    )  # v1: pre-evolution insert
    dl.write_delta(
        spark.createDataFrame([(3, "x")], "id long, tag string"),
        t, "append", merge_schema=True,
    )  # v2: evolving append
    ch = dl.read_delta_changes(spark, t, 0)
    rows = {r.id: (r.tag, r._change_type) for r in ch.collect()}
    # the whole feed reads under the END schema: the pre-evolution
    # insert null-fills the evolved column
    assert rows == {2: (None, "insert"), 3: ("x", "insert")}


def test_cdf_over_dv_merge_commit(spark, tmp_path):
    """A DV-enabled MERGE commit (removes+DV re-adds for matched
    files, plain adds for the payload) must reconstruct as: delete
    rows for the matched PRE-images, insert rows for every source
    row."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "t")
    dl.write_delta(
        spark.range(0, 100).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ).repartition(4),
        t,
    )
    ups = spark.createDataFrame(
        [(3, 99), (7, 99), (1000, 99)], "id long, k long"
    )
    s1 = dl.delta_merge_upsert(spark, t, ups, ["id"], via_dv=True)
    ch = dl.read_delta_changes(spark, t, 0, s1.version)
    rows = {
        (r._change_type, r.id, r.k) for r in ch.collect()
    }
    assert rows == {
        ("delete", 3, 3), ("delete", 7, 7),
        ("insert", 3, 99), ("insert", 7, 99), ("insert", 1000, 99),
    }
    # and the post-merge head balances with v0 + the feed
    head_ids = {
        r.id for r in dl.read_delta(spark, t).collect()
    }
    assert len(head_ids) == 101
    assert {3, 7, 1000} <= head_ids
