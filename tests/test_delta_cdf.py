"""Change data feed reconstructed from the native Delta log +
deletion vectors (delta_log.read_delta_changes): the native
``table_changes`` shape — _change_type/_commit_version/
_commit_timestamp per row — derived without CDC files. DELETE gives
deletes, UPDATE gives its pre-image/post-image pair, appends give
inserts, overwrites give full delete+insert, OPTIMIZE/DV-purge
rewrites are excluded (dataChange=false, rows unchanged)."""

from __future__ import annotations

import json
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


# --- CDC WRITE support (round 9): cdc actions + _change_data files --


def _cdf_table(spark, tmp_path, n=100, name="t"):
    import pyspark.sql.functions as F

    t = str(tmp_path / name)
    dl.write_delta(
        spark.range(0, n).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ).repartition(4),
        t,
    )
    st = dl.delta_alter_properties(
        spark, t, {"delta.enableChangeDataFeed": "true"}
    )
    return t, st


def test_enabling_cdf_upgrades_protocol(spark, tmp_path):
    t, st = _cdf_table(spark, tmp_path)
    assert st.protocol["minWriterVersion"] == 7
    assert "changeDataFeed" in st.protocol["writerFeatures"]


def test_cdc_delete_writes_change_files_and_feed_uses_them(
    spark, tmp_path
):
    import os

    t, st0 = _cdf_table(spark, tmp_path)
    s1 = dl.delta_delete(spark, t, "k = 3")
    with open(os.path.join(
        t, "_delta_log", f"{s1.version:020d}.json"
    )) as f:
        acts = [json.loads(x) for x in f if x.strip()]
    cdc = [a["cdc"] for a in acts if "cdc" in a]
    assert cdc
    for c in cdc:
        full = os.path.join(t, c["path"])
        assert os.path.exists(full)
        assert c["size"] == os.path.getsize(full)
    ch = dl.read_delta_changes(spark, t, st0.version)
    rows = {(r._change_type, r.id) for r in ch.collect()}
    assert rows == {("delete", i) for i in range(3, 100, 10)}
    assert ch.where("_commit_version = %d" % s1.version).count() == 10


def test_cdc_update_emits_pre_and_post_images(spark, tmp_path):
    t, st0 = _cdf_table(spark, tmp_path, n=50)
    dl.delta_update(spark, t, "k = 2", {"k": "777"})
    ch = dl.read_delta_changes(spark, t, st0.version)
    rows = {(r._change_type, r.id, r.k) for r in ch.collect()}
    expect = set()
    for i in range(2, 50, 10):
        expect.add(("update_preimage", i, 2))
        expect.add(("update_postimage", i, 777))
    assert rows == expect


def test_cdc_merge_both_strategies(spark, tmp_path):
    import pyspark.sql.functions as F

    for via_dv in (True, False):
        t, st0 = _cdf_table(
            spark, tmp_path, n=30, name=f"m{via_dv}"
        )
        ups = spark.createDataFrame(
            [(5, 99), (1000, 99)], "id long, k long"
        )
        dl.delta_merge_upsert(spark, t, ups, ["id"], via_dv=via_dv)
        ch = dl.read_delta_changes(spark, t, st0.version)
        rows = {(r._change_type, r.id, r.k) for r in ch.collect()}
        assert rows == {
            ("update_preimage", 5, 5),
            ("update_postimage", 5, 99),
            ("insert", 1000, 99),
        }, (via_dv, rows)
        # the head is identical either way
        out = dl.read_delta(spark, t)
        assert out.count() == 31
        assert out.where(F.col("k") == 99).count() == 2


def test_cdc_append_needs_no_change_files(spark, tmp_path):
    t, st0 = _cdf_table(spark, tmp_path, n=10)
    dl.write_delta(
        spark.createDataFrame([(100, 1)], "id long, k long"),
        t, "append",
    )
    ch = dl.read_delta_changes(spark, t, st0.version)
    rows = {(r._change_type, r.id) for r in ch.collect()}
    assert rows == {("insert", 100)}


def test_foreign_cdc_only_commit_read_exclusively(spark, tmp_path):
    """A hand-crafted native-shaped commit whose cdc says
    update_preimage/postimage while its add/remove pair would derive
    delete+insert: the feed must surface the cdc rows verbatim."""
    import os

    import pyspark.sql.functions as F

    t = str(tmp_path / "t")
    dl.write_delta(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "id long, k long"
        ).coalesce(1),
        t,
    )
    head = dl.replay(t)
    assert len(head.files) == 1
    # write a change file the way a native writer would
    cdir = os.path.join(t, "_change_data", "x0")
    spark.createDataFrame(
        [(2, 20, "update_preimage"), (2, 21, "update_postimage")],
        "id long, k long, _change_type string",
    ).coalesce(1).write.parquet(cdir)
    (fname,) = [
        f for f in os.listdir(cdir) if f.endswith(".parquet")
    ]
    rel = f"_change_data/x0/{fname}"
    # new data file replacing the old (rewrite-style update)
    ndir = os.path.join(t, "data", "x1")
    spark.createDataFrame(
        [(1, 10), (2, 21)], "id long, k long"
    ).coalesce(1).write.parquet(ndir)
    (nname,) = [
        f for f in os.listdir(ndir) if f.endswith(".parquet")
    ]
    nrel = f"data/x1/{nname}"
    actions = [
        {"cdc": {"path": rel, "partitionValues": {},
                 "size": os.path.getsize(os.path.join(t, rel)),
                 "dataChange": False}},
        {"remove": {"path": head.files[0], "deletionTimestamp": 1,
                    "dataChange": True}},
        {"add": {"path": nrel, "partitionValues": {},
                 "size": os.path.getsize(os.path.join(t, nrel)),
                 "modificationTime": 1, "dataChange": True}},
        {"commitInfo": {"timestamp": 123, "operation": "UPDATE"}},
    ]
    dl._atomic_commit(t, 1, actions)
    ch = dl.read_delta_changes(spark, t, 0)
    rows = {(r._change_type, r.id, r.k) for r in ch.collect()}
    assert rows == {
        ("update_preimage", 2, 20), ("update_postimage", 2, 21),
    }
    assert ch.select("_commit_timestamp").distinct().collect()[0][
        0
    ] == 123
    # the head itself reads the rewritten file
    assert sorted(
        (r.id, r.k) for r in dl.read_delta(spark, t).collect()
    ) == [(1, 10), (2, 21)]


def test_cdc_partitioned_and_column_mapped_compose(
    spark, tmp_path
):
    import pyspark.sql.functions as F

    t = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("p")
    )
    dl.write_delta(
        df, t, partition_by=["p"], column_mapping="name"
    )
    st0 = dl.delta_alter_properties(
        spark, t, {"delta.enableChangeDataFeed": "true"}
    )
    dl.delta_delete(spark, t, "p = '2' and id < 20")
    ch = dl.read_delta_changes(spark, t, st0.version)
    rows = {(r._change_type, r.id, r.p) for r in ch.collect()}
    assert rows == {
        ("delete", i, "2") for i in (2, 6, 10, 14, 18)
    }
    # the change files store PHYSICAL column names
    import os

    import pyarrow.parquet as pq

    croot = os.path.join(t, "_change_data")
    files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(croot)
        for f in fs if f.endswith(".parquet")
    ]
    assert files
    for f in files:
        names = pq.ParquetFile(f).schema_arrow.names
        assert "_change_type" in names
        assert all(
            n.startswith("col-") or n.startswith("_change")
            for n in names
        ), names


def test_vacuum_gc_drops_cdc_of_collected_commits(spark, tmp_path):
    import os

    t, st0 = _cdf_table(spark, tmp_path, n=20)
    dl.delta_delete(spark, t, "k = 1")  # commit with cdc
    dl.delta_delete(spark, t, "k = 2")  # head commit with cdc
    croot = os.path.join(t, "_change_data")
    n_before = sum(
        1 for _r, _d, fs in os.walk(croot) for f in fs
        if f.endswith(".parquet")
    )
    assert n_before >= 2
    dl.vacuum_delta(t, retention_ms=0)
    # retention 0: only the head commit's JSON survives, so only its
    # cdc files remain readable-and-needed
    remaining = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(croot)
        for f in fs if f.endswith(".parquet")
    ]
    head_v = dl.replay(t).version
    with open(os.path.join(
        t, "_delta_log", f"{head_v:020d}.json"
    )) as f:
        acts = [json.loads(x) for x in f if x.strip()]
    head_cdc = {
        a["cdc"]["path"] for a in acts if "cdc" in a
    }
    assert {
        os.path.relpath(p, t) for p in remaining
    } == head_cdc


def test_cdf_timestamps_use_ict_when_enabled(spark, tmp_path):
    """ADVICE r09: once ICT is enabled, inCommitTimestamp REPLACES
    commit-timestamp reporting — the CDF's _commit_timestamp must
    agree with resolve_version_at / TIMESTAMP AS OF for the same
    commit, not the wall-clock commitInfo.timestamp."""
    t = str(tmp_path / "t")
    _mk(spark, t, n=50)                                   # v0
    dl.delta_alter_properties(
        spark, t, {"delta.enableInCommitTimestamps": "true"}
    )                                                     # v1
    dl.delta_delete(spark, t, "k = 3")                    # v2
    ict2 = dl._commit_ict(t, 2, ict_only=True)
    assert ict2 is not None
    # wall timestamp and ICT can coincide to the millisecond; force
    # them apart to prove the ICT is PREFERRED, not coincidental
    cp = dl._commit_path(t, 2)
    lines = [json.loads(x) for x in open(cp) if x.strip()]
    for a in lines:
        if "commitInfo" in a:
            a["commitInfo"]["timestamp"] = 1
    with open(cp, "w") as f:
        for a in lines:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")
    ch = dl.read_delta_changes(spark, t, 1, 2)
    stamps = {
        r["_commit_timestamp"]
        for r in ch.select("_commit_timestamp").distinct().collect()
    }
    assert stamps == {ict2}


def test_cdc_partitioned_id_mode_compose(spark, tmp_path):
    """Round 11: cdc change files of an id-mode PARTITIONED table —
    data columns resolved by field id, partition columns restored
    from physical-keyed partitionValues."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "t")
    df = spark.range(0, 40).select(
        F.col("id"), (F.col("id") % 4).cast("string").alias("p")
    )
    dl.write_delta(
        df, t, partition_by=["p"], column_mapping="id"
    )
    st0 = dl.delta_alter_properties(
        spark, t, {"delta.enableChangeDataFeed": "true"}
    )
    dl.delta_delete(spark, t, "p = '2' and id < 20")
    ch = dl.read_delta_changes(spark, t, st0.version)
    rows = {(r._change_type, r.id, r.p) for r in ch.collect()}
    assert rows == {
        ("delete", i, "2") for i in (2, 6, 10, 14, 18)
    }
