"""Shallow clone (``delta_clone``) — zero-copy table forks via the
spec's absolute-path ``add`` entries (PROTOCOL.md "Add File and Remove
File": ``path`` is "a relative path ... or an absolute path").

Reference anchor: the Delta publishing surface of the reference's
notebooks (`/root/reference/notebooks/20_analytics.ipynb`) as extended
by the public delta-io PROTOCOL.md; a clone is the standard zero-copy
dev/staging fork of a production table.
"""

from __future__ import annotations

import glob
import json
import os

import pyspark.sql.functions as F
import pytest
from pyspark.sql import types as T

from rearc_data_engineer_takehome_spark.sources import delta_log as dl


def _df(spark, n=40, mod=4):
    return spark.createDataFrame(
        [(i, i % mod) for i in range(n)], "k int, g int"
    )


def test_clone_is_zero_copy_and_diverges(spark, tmp_path):
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(_df(spark, 100, 5), s)
    st = dl.delta_clone(s, t)
    assert st.version == 0
    # zero bytes of data under the clone root
    assert not os.path.isdir(os.path.join(t, "data"))
    # every add is absolute, anchored at the source
    assert all(os.path.isabs(p) for p in st.files)
    assert dl.read_delta(spark, t).count() == 100
    # fresh table identity, copied schema/config
    assert st.metadata_id != dl.replay(s).metadata_id
    # divergence is free both ways
    dl.write_delta(
        spark.createDataFrame([(1000, 9)], "k int, g int"),
        t, mode="append",
    )
    dl.delta_delete(spark, s, "g = 0")
    assert dl.read_delta(spark, t).count() == 101
    assert dl.read_delta(spark, s).count() == 80


def test_clone_version_as_of(spark, tmp_path):
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(spark.range(10).selectExpr("id as k"), s)
    dl.write_delta(
        spark.range(10, 20).selectExpr("id as k"), s, mode="append"
    )
    dl.delta_clone(s, t, version=0)
    assert dl.read_delta(spark, t).count() == 10
    # the clone's own history starts at 0 (source history is not
    # importable — its commits reference a different table id)
    assert dl.read_delta(spark, t, version=0).count() == 10


def test_clone_converts_dv_descriptors_to_absolute(spark, tmp_path):
    """A relative (storageType ``u``) DV resolves against the TABLE
    root and would dangle under the clone; the clone must re-address
    it as an absolute ``p`` descriptor, and a DV delete ON the clone
    must write clone-local bins without touching the source."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(_df(spark, 50, 5), s)
    dl.delta_delete(spark, s, "g = 2")
    st = dl.delta_clone(s, t)
    descs = [
        a["deletionVector"]
        for a in st.adds.values()
        if a.get("deletionVector")
    ]
    assert descs
    assert all(d["storageType"] == "p" for d in descs)
    assert all(
        os.path.isabs(d["pathOrInlineDv"]) for d in descs
    )
    got = sorted(r.k for r in dl.read_delta(spark, t).collect())
    assert got == [i for i in range(50) if i % 5 != 2]
    dl.delta_delete(spark, t, "g = 3")
    assert dl.read_delta(spark, t).count() == 30
    assert dl.read_delta(spark, s).count() == 40


def test_clone_partitioned_column_mapped_source(spark, tmp_path):
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame(
            [(i, str(i % 3)) for i in range(30)], "k int, p string"
        ),
        s, partition_by=["p"], column_mapping="name",
    )
    dl.delta_rename_column(s, "k", "key")
    dl.delta_clone(s, t)
    out = dl.read_delta(spark, t)
    assert out.columns == ["key", "p"]
    assert out.where("p = '1'").count() == 10
    # appends to the mapped clone keep stamping physical names
    dl.write_delta(
        spark.createDataFrame([(99, "1")], "key int, p string"),
        t, mode="append", partition_by=["p"],
    )
    assert dl.read_delta(spark, t).where("p = '1'").count() == 11


def test_clone_copies_row_tracking_domain(spark, tmp_path):
    """Dropping the ``delta.rowTracking`` high-water mark at the
    clone would hand out duplicate row ids on the first append."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame([(i,) for i in range(20)], "k int"),
        s, row_tracking=True,
    )
    st = dl.delta_clone(s, t)
    assert "delta.rowTracking" in (st.domain_metadata or {})
    dl.write_delta(
        spark.createDataFrame([(100,), (101,)], "k int"),
        t, mode="append",
    )
    rows = dl.read_delta(spark, t, row_ids=True).collect()
    assert len(rows) == 22
    assert len({r._row_id for r in rows}) == 22


def test_clone_identity_sequence_continues(spark, tmp_path):
    """The identity high-water mark rides field metadata inside
    metaData — the clone copies it, so generated values on the clone
    never collide with the source's."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    sch = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("v", T.StringType()),
    ])
    dl.delta_create_identity_table(
        sch, s,
        {"id": {"start": 1, "step": 1, "allow_explicit": False}},
    )
    dl.write_delta(
        spark.createDataFrame([("a",), ("b",)], "v string"),
        s, mode="append",
    )
    dl.delta_clone(s, t)
    dl.write_delta(
        spark.createDataFrame([("c",)], "v string"), t, mode="append"
    )
    assert sorted(
        r.id for r in dl.read_delta(spark, t).collect()
    ) == [1, 2, 3]


def test_clone_refuses_existing_table(spark, tmp_path):
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(spark.range(3), s)
    dl.write_delta(spark.range(3), t)
    with pytest.raises(ValueError, match="already a Delta table"):
        dl.delta_clone(s, t)


def test_vacuum_on_clone_never_touches_source(spark, tmp_path):
    """The safety property that makes shallow clones operable: even
    after the clone tombstones every cloned add (overwrite), VACUUM
    on the clone walks only the clone root — source bytes are
    physically untouchable from the clone side."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(_df(spark), s)
    dl.delta_clone(s, t)
    dl.write_delta(
        spark.createDataFrame([(1, 1)], "k int, g int"),
        t, mode="overwrite",
    )
    src_files = sorted(
        glob.glob(os.path.join(s, "data", "**", "*.parquet"),
                  recursive=True)
    )
    dl.vacuum_delta(t, retention_ms=0)
    assert sorted(
        glob.glob(os.path.join(s, "data", "**", "*.parquet"),
                  recursive=True)
    ) == src_files
    assert dl.read_delta(spark, s).count() == 40
    assert dl.read_delta(spark, t).count() == 1


def test_vacuum_on_source_breaks_clone_loudly(spark, tmp_path):
    """The documented shallow-clone hazard, asserted: vacuuming the
    SOURCE past files the clone references makes the clone's read
    FAIL (missing files), never silently return partial data."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(_df(spark), s)
    dl.delta_clone(s, t)
    dl.write_delta(
        spark.createDataFrame([(1, 1)], "k int, g int"),
        s, mode="overwrite",
    )
    dl.vacuum_delta(s, retention_ms=0)
    with pytest.raises(Exception):
        dl.read_delta(spark, t).count()


def test_optimize_localizes_clone(spark, tmp_path):
    """Compaction on the clone is the escape hatch from the source
    dependency: it reads the cloned (absolute) files and writes
    clone-LOCAL files, after which the source can be vacuumed
    freely."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame(
            [(i,) for i in range(64)], "k int"
        ).repartition(8),
        s,
    )
    dl.delta_clone(s, t)
    dl.delta_compact(spark, t, 2)
    head = dl.replay(t)
    assert all(not os.path.isabs(p) for p in head.files)
    assert dl.read_delta(spark, t).count() == 64
    # now the source's files are no longer referenced by the head
    dl.write_delta(
        spark.createDataFrame([(1,)], "k int"), s, mode="overwrite"
    )
    dl.vacuum_delta(s, retention_ms=0)
    assert dl.read_delta(spark, t).count() == 64


def test_clone_checkpoint_gc_replay(spark, tmp_path):
    """Absolute adds must survive the checkpoint round-trip: write a
    checkpoint on the clone, GC every JSON commit, replay from the
    checkpoint alone."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame([(i,) for i in range(25)], "k int"), s
    )
    dl.delta_clone(s, t)
    dl.write_delta(
        spark.createDataFrame([(100,)], "k int"), t, mode="append"
    )
    dl.write_checkpoint(t)
    for j in glob.glob(os.path.join(t, "_delta_log", "0*.json")):
        os.remove(j)
    assert dl.read_delta(spark, t).count() == 26


def test_clone_of_clone(spark, tmp_path):
    s = str(tmp_path / "s")
    t = str(tmp_path / "t")
    u = str(tmp_path / "u")
    dl.write_delta(
        spark.createDataFrame([(i,) for i in range(10)], "k int"), s
    )
    dl.delta_clone(s, t)
    dl.write_delta(
        spark.createDataFrame([(99,)], "k int"), t, mode="append"
    )
    dl.delta_clone(t, u)
    assert dl.read_delta(spark, u).count() == 11
    dl.delta_delete(spark, u, "k = 0")
    assert dl.read_delta(spark, u).count() == 10
    assert dl.read_delta(spark, t).count() == 11
    assert dl.read_delta(spark, s).count() == 10


def test_cdc_reconstruction_over_cloned_files(spark, tmp_path):
    """The change feed's DV-swap reconstruction must resolve
    absolute add paths (the round-11 key_by_abs fix) — a DV delete
    on cloned files reads back as row-level deletes."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(_df(spark), s)
    dl.delta_clone(s, t)
    dl.delta_delete(spark, t, "g = 1")
    feed = dl.read_delta_changes(spark, t, 0, 1)
    rows = feed.collect()
    assert rows
    assert all(r._change_type == "delete" for r in rows)
    assert sorted(r.k for r in rows) == [
        i for i in range(40) if i % 4 == 1
    ]


def test_clone_preserves_stats_for_pruning(spark, tmp_path):
    """Cloned adds keep the source's per-file stats verbatim, so
    min/max pruning on the clone skips the same files the source
    scan would."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    df = (
        spark.range(1000)
        .selectExpr("cast(id as int) as k")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
    )
    dl.write_delta(df, s, stats_cols=["k"])
    st = dl.delta_clone(s, t)
    stats = [
        json.loads(a["stats"])
        for a in st.adds.values()
        if a.get("stats")
    ]
    assert stats and all("minValues" in x for x in stats)
    out = dl.delta_scan(spark, t, prune={"k": (0, 9)})
    assert out.count() == 10


def test_clone_reanchors_ict_enablement(spark, tmp_path):
    """An ICT source's enablement properties describe the SOURCE's
    history; the clone must re-anchor them to ITS OWN version 0
    (whose commit carries an ICT equal to the recorded enablement
    timestamp), so TIMESTAMP AS OF over the clone never falls back
    to mtimes for ICT-covered versions."""
    import json as _json

    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(spark.range(5).selectExpr("id as k"), s)
    dl.delta_alter_properties(
        spark, s, {"delta.enableInCommitTimestamps": "true"}
    )
    dl.write_delta(
        spark.range(5, 10).selectExpr("id as k"), s, mode="append"
    )
    st = dl.delta_clone(s, t)
    cfg = st.configuration or {}
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "0"
    et = int(cfg["delta.inCommitTimestampEnablementTimestamp"])
    # the clone commit's own ICT equals the recorded enablement
    # timestamp (the alter path's invariant)
    line0 = open(
        os.path.join(t, "_delta_log", f"{0:020d}.json")
    ).readline()
    ci = _json.loads(line0)["commitInfo"]
    assert ci["inCommitTimestamp"] == et
    # TIMESTAMP AS OF the enablement instant resolves version 0
    assert dl.resolve_version_at(t, et) == 0
    # and later commits stay strictly monotonic over it
    dl.write_delta(
        spark.range(10, 12).selectExpr("id as k"), t, mode="append"
    )
    line1 = open(
        os.path.join(t, "_delta_log", f"{1:020d}.json")
    ).readline()
    assert _json.loads(line1)["commitInfo"][
        "inCommitTimestamp"
    ] > et


def test_clone_commit_reads_as_inserts_in_change_feed(
    spark, tmp_path
):
    """The clone commit is the table's creation — its change feed
    leg must read every cloned (absolute-path) file's live rows as
    inserts, DVs applied (a source-side deleted row must not be
    'inserted' into the clone's history)."""
    s, t = str(tmp_path / "s"), str(tmp_path / "t")
    dl.write_delta(_df(spark), s)
    dl.delta_delete(spark, s, "g = 2")  # DV'd source
    dl.delta_clone(s, t)
    feed = dl.read_delta_changes(spark, t, -1, 0)
    rows = feed.collect()
    assert rows
    assert all(r._change_type == "insert" for r in rows)
    assert sorted(r.k for r in rows) == [
        i for i in range(40) if i % 4 != 2
    ]
