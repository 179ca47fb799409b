"""Column mapping, name mode (sources/delta_log.py): clean-room READ
support for the public PROTOCOL.md "Column Mapping" feature — tables
whose data files carry physical column names (``col-<uuid>``) in
parquet while the log's schemaString maps them to logical names via
field metadata. Native runtimes enable this on any column rename/
drop, so a reader without it refuses a large class of real tables
(our gate used to); writes to mapped tables stay refused (physical
bookkeeping we don't do). Tables here are hand-authored in the exact
on-disk shape a native writer produces, since delta-spark is absent
in this container (COVERAGE.md env notes)."""

from __future__ import annotations

import json
import os
import uuid

import pyspark.sql.functions as F
import pytest

from rearc_data_engineer_takehome_spark.sources import delta_log as dl
from rearc_data_engineer_takehome_spark.sources import dv


def _commit(t, version, actions):
    os.makedirs(os.path.join(t, "_delta_log"), exist_ok=True)
    with open(dl._commit_path(t, version), "w") as f:
        for a in actions:
            f.write(json.dumps(a, separators=(",", ":")) + "\n")


def _field(name, typ, cid, phys):
    return {
        "name": name,
        "type": typ,
        "nullable": True,
        "metadata": {
            "delta.columnMapping.id": cid,
            "delta.columnMapping.physicalName": phys,
        },
    }


def _meta(schema, pcols=(), mode="name"):
    return {
        "metaData": {
            "id": str(uuid.uuid4()),
            "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": list(pcols),
            "configuration": {
                "delta.columnMapping.mode": mode,
                "delta.columnMapping.maxColumnId": "9",
            },
            "createdTime": 0,
        }
    }


_PROTO_CM = {"protocol": {
    "minReaderVersion": 2, "minWriterVersion": 5,
}}


def _write_phys_file(spark, t, subdir, df):
    fdir = os.path.join(t, "data", subdir)
    df.coalesce(1).write.parquet(fdir)
    (name,) = [
        f for f in os.listdir(fdir) if f.endswith(".parquet")
    ]
    return f"data/{subdir}/{name}"


def _add(rel, pv=None):
    return {"add": {
        "path": rel,
        "partitionValues": pv or {},
        "size": 1,
        "modificationTime": 0,
        "dataChange": True,
    }}


def test_name_mode_flat_read(spark, tmp_path):
    t = str(tmp_path / "t")
    rel = _write_phys_file(
        spark, t, "f0",
        spark.createDataFrame(
            [(1, "a"), (2, "b")], "`col-x1` long, `col-x2` string"
        ),
    )
    schema = {"type": "struct", "fields": [
        _field("id", "long", 1, "col-x1"),
        _field("s", "string", 2, "col-x2"),
    ]}
    _commit(t, 0, [_PROTO_CM, _meta(schema), _add(rel)])
    out = dl.read_delta(spark, t)
    assert out.columns == ["id", "s"]
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "a"), (2, "b"),
    ]


def test_name_mode_nested_struct_renames(spark, tmp_path):
    t = str(tmp_path / "t")
    rel = _write_phys_file(
        spark, t, "f0",
        spark.createDataFrame(
            [(1, (10, "x"))],
            "`col-a` long, `col-b` struct<`col-c`: long, "
            "`col-d`: string>",
        ),
    )
    schema = {"type": "struct", "fields": [
        _field("id", "long", 1, "col-a"),
        _field(
            "payload",
            {"type": "struct", "fields": [
                _field("num", "long", 3, "col-c"),
                _field("tag", "string", 4, "col-d"),
            ]},
            2,
            "col-b",
        ),
    ]}
    _commit(t, 0, [_PROTO_CM, _meta(schema), _add(rel)])
    out = dl.read_delta(spark, t)
    assert out.schema.simpleString() == (
        "struct<id:bigint,payload:struct<num:bigint,tag:string>>"
    )
    row = out.collect()[0]
    assert (row.id, row.payload.num, row.payload.tag) == (1, 10, "x")


def test_name_mode_partitioned_physical_keys(spark, tmp_path):
    """partitionValues keys are PHYSICAL names per the spec; the
    logical partition column must come back as a typed literal."""
    t = str(tmp_path / "t")
    rels = {}
    for part, vals in (("0", [(1,)]), ("1", [(2,), (3,)])):
        rels[part] = _write_phys_file(
            spark, t, f"p{part}",
            spark.createDataFrame(vals, "`col-v` long"),
        )
    schema = {"type": "struct", "fields": [
        _field("v", "long", 1, "col-v"),
        _field("p", "string", 2, "col-p"),
    ]}
    _commit(t, 0, [
        _PROTO_CM,
        _meta(schema, pcols=["p"]),
        _add(rels["0"], pv={"col-p": "0"}),
        _add(rels["1"], pv={"col-p": "1"}),
    ])
    out = dl.read_delta(spark, t)
    assert set(out.columns) == {"v", "p"}
    got = sorted((r.v, r.p) for r in out.collect())
    assert got == [(1, "0"), (2, "1"), (3, "1")]


def test_name_mode_delta_scan_prunes_on_physical_stats(
    spark, tmp_path
):
    t = str(tmp_path / "t")
    lo = _write_phys_file(
        spark, t, "lo",
        spark.createDataFrame([(1,), (5,)], "`col-v` long"),
    )
    hi = _write_phys_file(
        spark, t, "hi",
        spark.createDataFrame([(100,), (200,)], "`col-v` long"),
    )
    schema = {"type": "struct", "fields": [
        _field("v", "long", 1, "col-v"),
    ]}
    add_lo = _add(lo)
    add_lo["add"]["stats"] = json.dumps({
        "numRecords": 2,
        "minValues": {"col-v": 1}, "maxValues": {"col-v": 5},
        "nullCount": {"col-v": 0},
    })
    add_hi = _add(hi)
    add_hi["add"]["stats"] = json.dumps({
        "numRecords": 2,
        "minValues": {"col-v": 100}, "maxValues": {"col-v": 200},
        "nullCount": {"col-v": 0},
    })
    _commit(t, 0, [_PROTO_CM, _meta(schema), add_lo, add_hi])
    got = dl.delta_scan(spark, t, prune={"v": (90, None)})
    # the low file is provably out of range: skipped at file level
    assert [os.path.basename(f) for f in got.inputFiles()] == [
        os.path.basename(hi)
    ]
    assert sorted(r.v for r in got.collect()) == [100, 200]


def test_name_mode_composes_with_deletion_vectors(spark, tmp_path):
    """A mapped table whose file also carries a DV: the read must
    rename AND drop deleted positions."""
    import numpy as np

    t = str(tmp_path / "t")
    rel = _write_phys_file(
        spark, t, "f0",
        spark.createDataFrame(
            [(i, f"r{i}") for i in range(6)],
            "`col-x1` long, `col-x2` string",
        ),
    )
    blob = dv.serialize_positions(np.array([0, 3], dtype=np.int64))
    enc, offs = dv.write_dv_file(t, [blob])
    schema = {"type": "struct", "fields": [
        _field("id", "long", 1, "col-x1"),
        _field("s", "string", 2, "col-x2"),
    ]}
    a = _add(rel)
    a["add"]["deletionVector"] = dv.make_descriptor(
        enc, offs[0], len(blob), 2
    )
    _commit(t, 0, [
        {"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"],
            "writerFeatures": ["deletionVectors", "columnMapping"],
        }},
        _meta(schema),
        a,
    ])
    # file was written with rows in insertion order by one task, so
    # row indexes 0 and 3 are ids 0 and 3
    out = dl.read_delta(spark, t)
    assert sorted(r.id for r in out.collect()) == [1, 2, 4, 5]
    assert out.columns == ["id", "s"]


def test_id_mode_refuses_loudly(spark, tmp_path):
    t = str(tmp_path / "t")
    rel = _write_phys_file(
        spark, t, "f0",
        spark.createDataFrame([(1,)], "`col-v` long"),
    )
    schema = {"type": "struct", "fields": [
        _field("v", "long", 1, "col-v"),
    ]}
    _commit(t, 0, [_PROTO_CM, _meta(schema, mode="id"), _add(rel)])
    with pytest.raises(NotImplementedError, match="'id'"):
        dl.read_delta(spark, t)


def test_writes_to_mapped_tables_refuse(spark, tmp_path):
    t = str(tmp_path / "t")
    rel = _write_phys_file(
        spark, t, "f0",
        spark.createDataFrame([(1,)], "`col-v` long"),
    )
    schema = {"type": "struct", "fields": [
        _field("v", "long", 1, "col-v"),
    ]}
    _commit(t, 0, [_PROTO_CM, _meta(schema), _add(rel)])
    df = spark.createDataFrame([(2,)], "v long")
    with pytest.raises(NotImplementedError):
        dl.write_delta(df, t, "append")
    with pytest.raises(NotImplementedError):
        dl.delta_compact(spark, t, 1)
    # checkpointing is NOT a mutating write (ADVICE r8): it copies
    # schemaString/configuration verbatim, so mapped tables stay
    # checkpointable — and the checkpointed table still reads back
    # through the name-mode reader
    v = dl.write_checkpoint(t)
    assert os.path.exists(os.path.join(
        t, "_delta_log", f"{v:020d}.checkpoint.parquet"
    ))
    assert [r.v for r in dl.read_delta(spark, t).collect()] == [1]


def test_reader_gate_accepts_cm_feature_combinations():
    dl._check_protocol("t", [{"minReaderVersion": 2}])
    dl._check_protocol("t", [{
        "minReaderVersion": 3,
        "readerFeatures": ["columnMapping"],
    }])
    dl._check_protocol("t", [{
        "minReaderVersion": 3,
        "readerFeatures": ["columnMapping", "deletionVectors"],
    }])
    with pytest.raises(NotImplementedError):
        dl._check_protocol("t", [{
            "minReaderVersion": 3,
            "readerFeatures": ["columnMapping", "v2Checkpoint"],
        }])


def test_configuration_survives_native_checkpoint(spark, tmp_path):
    """A checkpoint written over a mapped table (as a native writer
    would) must hand replay the configuration — otherwise every
    checkpoint-based read would misaddress the physical columns."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    rel = _write_phys_file(
        spark, t, "f0",
        spark.createDataFrame([(7, "z")],
                              "`col-x1` long, `col-x2` string"),
    )
    schema = {"type": "struct", "fields": [
        _field("id", "long", 1, "col-x1"),
        _field("s", "string", 2, "col-x2"),
    ]}
    meta = _meta(schema)["metaData"]
    _commit(t, 0, [_PROTO_CM, {"metaData": meta}, _add(rel)])
    # hand-author the checkpoint the way a native writer lays it out
    rows = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5,
                      "readerFeatures": None,
                      "writerFeatures": None},
         "metaData": None, "add": None, "txn": None},
        {"protocol": None, "txn": None,
         "metaData": {
             "id": meta["id"],
             "format": {"provider": "parquet", "options": {}},
             "schemaString": meta["schemaString"],
             "partitionColumns": [],
             "configuration": meta["configuration"],
             "createdTime": 0,
         },
         "add": None},
        {"protocol": None, "metaData": None, "txn": None,
         "add": {"path": rel, "partitionValues": {}, "size": 1,
                 "modificationTime": 0, "dataChange": False,
                 "stats": None, "deletionVector": None}},
    ]
    pa_schema = pa.schema([
        ("txn", pa.struct([("appId", pa.string()),
                           ("version", pa.int64()),
                           ("lastUpdated", pa.int64())])),
        ("protocol", pa.struct([
            ("minReaderVersion", pa.int32()),
            ("minWriterVersion", pa.int32()),
            ("readerFeatures", pa.list_(pa.string())),
            ("writerFeatures", pa.list_(pa.string())),
        ])),
        ("metaData", pa.struct([
            ("id", pa.string()),
            ("format", pa.struct([
                ("provider", pa.string()),
                ("options", pa.map_(pa.string(), pa.string())),
            ])),
            ("schemaString", pa.string()),
            ("partitionColumns", pa.list_(pa.string())),
            ("configuration", pa.map_(pa.string(), pa.string())),
            ("createdTime", pa.int64()),
        ])),
        ("add", pa.struct([
            ("path", pa.string()),
            ("partitionValues", pa.map_(pa.string(), pa.string())),
            ("size", pa.int64()),
            ("modificationTime", pa.int64()),
            ("dataChange", pa.bool_()),
            ("stats", pa.string()),
            ("deletionVector", pa.struct([
                ("storageType", pa.string()),
                ("pathOrInlineDv", pa.string()),
                ("offset", pa.int32()),
                ("sizeInBytes", pa.int32()),
                ("cardinality", pa.int64()),
            ])),
        ])),
    ])
    pq.write_table(
        pa.Table.from_pylist(rows, schema=pa_schema),
        dl._checkpoint_path(t, 0),
    )
    with open(os.path.join(t, "_delta_log", "_last_checkpoint"),
              "w") as f:
        json.dump({"version": 0, "size": len(rows)}, f)
    # GC the JSON commit: replay must come entirely from the
    # checkpoint, configuration included
    os.remove(dl._commit_path(t, 0))
    st = dl.replay(t)
    assert (st.configuration or {}).get(
        "delta.columnMapping.mode"
    ) == "name"
    out = dl.read_delta(spark, t)
    assert sorted(tuple(r) for r in out.collect()) == [(7, "z")]
