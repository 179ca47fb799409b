"""V2 ("uuid-named") checkpoints — clean-room read+write of the
public delta-io PROTOCOL.md "V2 Spec": a manifest
``<v>.checkpoint.<uniqueStr>.{parquet,json}`` carrying
checkpointMetadata/protocol/metaData/txn plus ``sidecar`` actions
whose ``_delta_log/_sidecars/*.parquet`` files hold the add actions.
Reference anchor: the reference persists curated tables in Delta
(notebooks/20_analytics.ipynb:653); current runtimes checkpoint those
tables in this format, so a reader without it cannot replay them
after JSON GC."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.sources import delta_log as dl


def _mk(spark, t, n=100):
    return dl.write_delta(
        spark.range(0, n).select(
            F.col("id"), (F.col("id") % 10).alias("k")
        ).repartition(4),
        t,
    )


_ADD_SCHEMA = None


def _add_schema():
    import pyarrow as pa

    global _ADD_SCHEMA
    if _ADD_SCHEMA is None:
        _ADD_SCHEMA = pa.schema([("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
        ]))])
    return _ADD_SCHEMA


def _bare_add(a):
    return {"add": {
        "path": a["path"],
        "partitionValues": dict(a.get("partitionValues") or {}),
        "size": a.get("size", 0),
        "modificationTime": a.get("modificationTime", 0),
        "dataChange": False,
        "stats": a.get("stats"),
    }}


def _log_files(t):
    return sorted(os.listdir(os.path.join(t, "_delta_log")))


def test_v2_checkpoint_write_upgrade_and_replay_after_gc(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    _mk(spark, t)
    dl.write_delta(
        spark.createDataFrame([(1000, 1)], "id long, k long"),
        t, "append",
    )
    v = dl.write_checkpoint(t, v2=True)
    st = dl.replay(t)
    # the upgrade commit landed first, then the checkpoint covers it
    assert "v2Checkpoint" in st.protocol["readerFeatures"]
    assert "v2Checkpoint" in st.protocol["writerFeatures"]
    assert v == st.version
    names = _log_files(t)
    manifests = [n for n in names if dl._CP_V2.match(n)]
    assert len(manifests) == 1
    assert not any(dl._CP_NAME.match(n) for n in names)
    sidecars = os.listdir(
        os.path.join(t, "_delta_log", dl._SIDECAR_DIR)
    )
    assert sidecars
    # GC every JSON commit: replay must base on the v2 checkpoint
    for n in names:
        if n.endswith(".json") and n[:-5].isdigit():
            os.remove(os.path.join(t, "_delta_log", n))
    out = dl.read_delta(spark, t)
    assert out.count() == 101
    assert out.where("id = 1000").count() == 1


def test_v2_feature_forces_v2_for_subsequent_checkpoints(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    _mk(spark, t, n=20)
    dl.write_checkpoint(t, v2=True)
    dl.write_delta(
        spark.createDataFrame([(999, 9)], "id long, k long"),
        t, "append",
    )
    v = dl.write_checkpoint(t)  # v2=None: auto from the feature
    names = [
        n for n in _log_files(t)
        if dl._CP_V2.match(n)
        and int(dl._CP_V2.match(n).group(1)) == v
    ]
    assert names, "feature table must checkpoint in v2 form"


def test_v2_sidecar_split_and_dv_descriptors_survive(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    _mk(spark, t)
    dl.delta_delete(spark, t, "k = 3")
    v = dl.write_checkpoint(t, v2=True, sidecar_files=3)
    sc_dir = os.path.join(t, "_delta_log", dl._SIDECAR_DIR)
    assert len(os.listdir(sc_dir)) == 3
    st = dl._read_checkpoint_state(t, v)
    assert len(st.files) == 4
    assert any(
        a.get("deletionVector") for a in st.adds.values()
    ), "DV descriptors must survive the sidecar roundtrip"
    for n in _log_files(t):
        if n.endswith(".json") and n[:-5].isdigit():
            os.remove(os.path.join(t, "_delta_log", n))
    out = dl.read_delta(spark, t)
    assert out.count() == 90
    assert out.where("k = 3").count() == 0


def test_v2_missing_sidecar_is_not_a_silent_base(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=50)
    v = dl.write_checkpoint(t, v2=True, sidecar_files=2)
    sc_dir = os.path.join(t, "_delta_log", dl._SIDECAR_DIR)
    victim = sorted(os.listdir(sc_dir))[0]
    os.remove(os.path.join(sc_dir, victim))
    # the torn checkpoint is INVISIBLE, replay falls back to JSON
    assert v not in dl._checkpoint_versions(t)
    assert dl.read_delta(spark, t).count() == 50


def test_v2_manifest_guards(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=10)
    head = dl.replay(t)
    log = os.path.join(t, "_delta_log")
    # hand-craft a JSON-format v2 manifest (native writers may emit
    # json manifests) with a wrong checkpointMetadata version
    bad = os.path.join(
        log, f"{head.version:020d}.checkpoint.aaaa-bbbb.json"
    )
    with open(bad, "w") as f:
        for a in (
            {"checkpointMetadata": {"version": head.version + 7}},
            {"protocol": head.protocol
             or {"minReaderVersion": 1, "minWriterVersion": 2}},
        ):
            f.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="checkpointMetadata"):
        dl._read_checkpoint_state(t, head.version)
    os.remove(bad)
    # mixing sidecar actions with inline adds refuses
    sc_dir = os.path.join(log, dl._SIDECAR_DIR)
    os.makedirs(sc_dir, exist_ok=True)
    import pyarrow as pa
    import pyarrow.parquet as pq

    sc = os.path.join(sc_dir, "mix.parquet")
    pq.write_table(
        pa.Table.from_pylist(
            [_bare_add(head.adds[head.files[0]])],
            schema=_add_schema(),
        ),
        sc,
    )
    mixed = os.path.join(
        log, f"{head.version:020d}.checkpoint.cccc-dddd.json"
    )
    with open(mixed, "w") as f:
        for a in (
            {"checkpointMetadata": {"version": head.version}},
            {"protocol": head.protocol
             or {"minReaderVersion": 1, "minWriterVersion": 2}},
            {"metaData": {
                "id": head.metadata_id,
                "schemaString": head.schema,
                "partitionColumns": [],
                "configuration": {},
            }},
            {"sidecar": {"path": "mix.parquet", "sizeInBytes": 1}},
            {"add": {
                k: v
                for k, v in head.adds[head.files[0]].items()
                if k in ("path", "size", "modificationTime",
                         "dataChange", "partitionValues")
            }},
        ):
            f.write(json.dumps(a) + "\n")
    with pytest.raises(ValueError, match="inline"):
        dl._read_checkpoint_state(t, head.version)


def test_foreign_json_v2_manifest_with_sidecar_reads(
    spark, tmp_path
):
    """A native-shaped v2 checkpoint authored by hand: json manifest
    + parquet sidecar; our replay must base on it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    _mk(spark, t, n=30)
    head = dl.replay(t)
    log = os.path.join(t, "_delta_log")
    sc_dir = os.path.join(log, dl._SIDECAR_DIR)
    os.makedirs(sc_dir, exist_ok=True)
    sc_name = "f0r31gn.parquet"
    pq.write_table(
        pa.Table.from_pylist(
            [_bare_add(head.adds[p]) for p in head.files],
            schema=_add_schema(),
        ),
        os.path.join(sc_dir, sc_name),
    )
    mf = os.path.join(
        log, f"{head.version:020d}.checkpoint.native-1111.json"
    )
    with open(mf, "w") as f:
        for a in (
            {"checkpointMetadata": {"version": head.version}},
            {"protocol": {
                "minReaderVersion": 3, "minWriterVersion": 7,
                "readerFeatures": ["v2Checkpoint"],
                "writerFeatures": ["v2Checkpoint"],
            }},
            {"metaData": {
                "id": head.metadata_id,
                "format": {"provider": "parquet", "options": {}},
                "schemaString": head.schema,
                "partitionColumns": [],
                "configuration": {},
            }},
            {"sidecar": {
                "path": sc_name,
                "sizeInBytes": os.path.getsize(
                    os.path.join(sc_dir, sc_name)
                ),
            }},
        ):
            f.write(json.dumps(a) + "\n")
    for n in _log_files(t):
        if n.endswith(".json") and n[:-5].isdigit():
            os.remove(os.path.join(log, n))
    st = dl.replay(t)
    assert set(st.files) == set(head.files)
    assert dl.read_delta(spark, t).count() == 30


def test_vacuum_gc_v2_checkpoints_and_sidecars(spark, tmp_path):
    t = str(tmp_path / "t")
    _mk(spark, t, n=40)
    dl.write_checkpoint(t, v2=True)
    sc_dir = os.path.join(t, "_delta_log", dl._SIDECAR_DIR)
    first_sidecars = set(os.listdir(sc_dir))
    dl.write_delta(
        spark.createDataFrame([(5000, 5)], "id long, k long"),
        t, "append",
    )
    dl.vacuum_delta(t, retention_ms=0)
    # the old v2 checkpoint and its sidecars are gone; the head
    # checkpoint (auto-v2 from the feature) and its sidecars remain
    names = _log_files(t)
    manifests = [n for n in names if dl._CP_V2.match(n)]
    head_v = dl.replay(t).version
    assert manifests
    assert all(
        int(dl._CP_V2.match(n).group(1)) == head_v
        for n in manifests
    )
    remaining = set(os.listdir(sc_dir))
    assert not (remaining & first_sidecars)
    assert remaining  # the head's sidecars survive
    assert dl.read_delta(spark, t).count() == 41


def test_v2_historical_version_without_feature_refuses(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    _mk(spark, t, n=10)
    dl.write_delta(
        spark.createDataFrame([(99, 9)], "id long, k long"),
        t, "append",
    )
    with pytest.raises(ValueError, match="historical"):
        dl.write_checkpoint(t, version=0, v2=True)


def test_v2_json_manifest_write_roundtrip(spark, tmp_path):
    """Round 10: WRITE the v2 spec's json manifest variant (ndjson of
    the same actions, sidecars staying parquet) — replay after full
    JSON-commit GC must base on it exactly like a parquet manifest,
    domain metadata included."""
    import pyspark.sql.functions as F

    t = str(tmp_path / "t")
    dl.write_delta(
        spark.range(0, 40).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        ).repartition(3),
        t, row_tracking=True, stats_cols=["k"],
    )
    dl.delta_delete(spark, t, "k = 5")
    before = {
        r.k: r._row_id
        for r in dl.read_delta(spark, t, row_ids=True).collect()
    }
    v = dl.write_checkpoint(
        t, v2=True, sidecar_files=2, manifest_format="json"
    )
    manifests = [
        n for n in os.listdir(os.path.join(t, "_delta_log"))
        if n.endswith(".json") and ".checkpoint." in n
    ]
    assert len(manifests) == 1
    for i in range(v + 1):
        p = dl._commit_path(t, i)
        if os.path.exists(p):
            os.remove(p)
    after = {
        r.k: r._row_id
        for r in dl.read_delta(spark, t, row_ids=True).collect()
    }
    assert after == before
    st = dl.replay(t)
    assert dl._rt_hwm(st.domain_metadata) == 39
    # still writable on top of the json-manifest base
    dl.write_delta(
        spark.createDataFrame([(99, 0)], "k long, v long"),
        t, "append",
    )
    assert dl.read_delta(spark, t).count() == 40
    with pytest.raises(ValueError, match="manifest_format"):
        dl.write_checkpoint(t, v2=True, manifest_format="orc")
