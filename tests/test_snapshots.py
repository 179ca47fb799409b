"""Transaction-log semantics for the snapshot table layer
(sources/snapshots.py): commit lineage, time travel, rollback, vacuum,
optimistic-concurrency retry, and versioned MERGE — the Delta-shaped
contract the env-blocked delta-spark would otherwise provide."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.sources import snapshots as sn


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_overwrite_append_time_travel_and_rollback(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = sn.snapshot_write(
        spark.createDataFrame([(1, "a"), (2, "b")], "k long, s string"), t
    )
    assert (v0.version, v0.mode) == (0, "overwrite")

    v1 = sn.snapshot_write(
        spark.createDataFrame([(3, "c")], "k long, s string"), t, "append"
    )
    assert v1.version == 1
    # append REFERENCES the previous files — no copies
    assert set(v0.files) < set(v1.files)
    assert v1.n_files_added == len(v1.files) - len(v0.files)

    v2 = sn.snapshot_write(
        spark.createDataFrame([(9, "z")], "k long, s string"), t
    )
    assert v2.version == 2 and set(v2.files).isdisjoint(v0.files)

    # latest = the overwrite; time travel reads every prior state
    assert _rows(sn.read_snapshot(spark, t)) == [(9, "z")]
    assert _rows(sn.read_snapshot(spark, t, 0)) == [(1, "a"), (2, "b")]
    assert _rows(sn.read_snapshot(spark, t, 1)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]

    # rollback commits a NEW version with the old content — the bad
    # version stays in history
    v3 = sn.rollback(t, 1)
    assert (v3.version, v3.mode) == (3, "rollback")
    assert _rows(sn.read_snapshot(spark, t)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    assert _rows(sn.read_snapshot(spark, t, 2)) == [(9, "z")]
    assert sn.list_versions(t) == [0, 1, 2, 3]


def test_append_schema_mismatch_rejected(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.createDataFrame([(1,)], "k long"), t)
    with pytest.raises(ValueError, match="schema"):
        sn.snapshot_write(
            spark.createDataFrame([(1, 2)], "k long, extra long"),
            t,
            "append",
        )


def test_commit_race_loser_retries_to_next_version(spark, tmp_path):
    """Optimistic concurrency: a competing writer taking our version
    number must not clobber anything — the loser lands at N+1 and both
    manifests survive intact."""
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.createDataFrame([(1,)], "k long"), t)
    # simulate a concurrent winner grabbing version 1
    competing = sn._manifest_path(t, 1)
    with open(competing, "x") as f:
        f.write(
            '{"mode": "overwrite", "files": [], "schema": '
            '"struct<k:bigint>", "n_files_added": 0}'
        )
    snap = sn.snapshot_write(spark.createDataFrame([(2,)], "k long"), t)
    assert snap.version == 2  # retried past the occupied slot
    assert sn.read_manifest(t, 1).files == ()  # winner untouched
    assert _rows(sn.read_snapshot(spark, t)) == [(2,)]


def test_vacuum_reclaims_unreferenced_files_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    sn.snapshot_write(spark.createDataFrame([(1,)], "k long"), t)  # v0
    sn.snapshot_write(
        spark.createDataFrame([(2,)], "k long"), t, "append"
    )  # v1 references v0's files
    sn.snapshot_write(spark.createDataFrame([(3,)], "k long"), t)  # v2
    sn.snapshot_write(spark.createDataFrame([(4,)], "k long"), t)  # v3

    removed = sn.vacuum(t, keep_last=2)  # keep v2, v3
    assert sn.list_versions(t) == [2, 3]
    # v0's file was shared with v1 but neither survives: reclaimed
    assert removed
    for f in removed:
        assert not os.path.exists(os.path.join(t, f))
    # retained versions still read
    assert _rows(sn.read_snapshot(spark, t, 2)) == [(3,)]
    assert _rows(sn.read_snapshot(spark, t)) == [(4,)]
    with pytest.raises(ValueError, match="not in"):
        sn.read_snapshot(spark, t, 0)


def test_snapshot_merge_upsert_versioned_and_idempotent(spark, tmp_path):
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], "k long, s string, v long"
    )
    sn.snapshot_write(base, t)
    updates = spark.createDataFrame(
        [(2, "B", 200), (4, "d", 40)], "k long, s string, v long"
    )
    m1 = sn.snapshot_merge_upsert(spark, t, updates, ["k"])
    want = [(1, "a", 10), (2, "B", 200), (3, "c", 30), (4, "d", 40)]
    assert _rows(sn.read_snapshot(spark, t)) == want
    # the pre-merge table is one version back — a bad merge is
    # recoverable by rollback
    assert _rows(sn.read_snapshot(spark, t, m1.version - 1)) == _rows(base)
    # idempotent: same updates converge to the same content
    sn.snapshot_merge_upsert(spark, t, updates, ["k"])
    assert _rows(sn.read_snapshot(spark, t)) == want


def test_readers_prune_columns_through_manifest_scan(spark, tmp_path):
    """The manifest hands Spark an explicit parquet file list, so
    column pruning still reaches the scan (ReadSchema)."""
    from rearc_data_engineer_takehome_spark.plans import explain

    t = str(tmp_path / "tbl")
    sn.snapshot_write(
        spark.range(100).select(
            "id", (F.col("id") * 2).alias("a"), (F.col("id") * 3).alias("b")
        ),
        t,
    )
    df = sn.read_snapshot(spark, t).select("id", "a")
    rs = explain.read_schema(df)
    assert "id:bigint" in rs and "a:bigint" in rs
    assert "b:bigint" not in rs, f"scan reads pruned column: {rs!r}"


def test_read_increment_feeds_incremental_aggregation(spark, tmp_path):
    """The manifest diff IS the change feed: maintaining an aggregate
    from increments alone must equal a full recompute — and a
    non-append commit in the range must refuse rather than let the
    consumer double-count."""
    t = str(tmp_path / "tbl")
    v0 = sn.snapshot_write(
        spark.createDataFrame([("a", 1), ("b", 2)], "g string, v long"), t
    )
    sn.snapshot_write(
        spark.createDataFrame([("a", 10)], "g string, v long"), t, "append"
    )
    sn.snapshot_write(
        spark.createDataFrame([("c", 5), ("b", 3)], "g string, v long"),
        t,
        "append",
    )

    # state from the base version, then fold in ONE increment read
    state = {
        r["g"]: r["s"]
        for r in sn.read_snapshot(spark, t, v0.version)
        .groupBy("g")
        .agg(F.sum("v").alias("s"))
        .collect()
    }
    inc = sn.read_increment(spark, t, since_version=v0.version)
    for r in inc.groupBy("g").agg(F.sum("v").alias("s")).collect():
        state[r["g"]] = state.get(r["g"], 0) + r["s"]
    full = {
        r["g"]: r["s"]
        for r in sn.read_snapshot(spark, t)
        .groupBy("g")
        .agg(F.sum("v").alias("s"))
        .collect()
    }
    assert state == full == {"a": 11, "b": 5, "c": 5}

    # an empty increment is a typed empty frame, not an error
    head = sn.read_manifest(t).version
    assert sn.read_increment(spark, t, since_version=head).count() == 0

    # overwrite invalidates incremental state: loud refusal
    sn.snapshot_write(
        spark.createDataFrame([("z", 0)], "g string, v long"), t
    )
    with pytest.raises(ValueError, match="not append"):
        sn.read_increment(spark, t, since_version=v0.version)
