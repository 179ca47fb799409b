"""Round 11 (VERDICT r10 item 6): remaining public-protocol feature
surfaces — checkpointProtection honored by vacuum's metadata cleanup,
and collated-string schema metadata tolerated on READ while unknown
writer features keep refusing writes loudly-but-precisely.

Reference anchor: the reference persists curated tables in Delta
(notebooks/20_analytics.ipynb:653); these are the protocol gates a
foreign table with a newer feature set hits first.
"""

from __future__ import annotations

import json
import os

import pytest

from rearc_data_engineer_takehome_spark.sources import delta_log as dl


def _versions(t):
    log = os.path.join(t, "_delta_log")
    return sorted(
        int(n[:-5]) for n in os.listdir(log)
        if n.endswith(".json") and n[:-5].isdigit()
    )


def _protect(t, before_version):
    """Foreign-style enablement: protocol upgrade + config pin in one
    commit (what a native writer's ALTER emits)."""
    head = dl.replay(t)
    cfg = {
        **(head.configuration or {}),
        "delta.requireCheckpointProtectionBeforeVersion": str(
            before_version
        ),
    }
    dl._atomic_commit(t, head.version + 1, [
        {"protocol": {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["checkpointProtection"],
        }},
        dl._meta_action(
            head.schema, head.metadata_id,
            list(head.partition_cols), cfg,
        ),
    ])


def test_checkpoint_protection_suppresses_log_truncation(
    spark, tmp_path
):
    """A protected version ABOVE the vacuum floor forbids truncating
    the log into (0, V): the whole JSON log survives, data-file
    vacuum still runs, and every version stays replayable."""
    t = str(tmp_path / "t")
    dl.write_delta(spark.range(0, 10), t)                    # v0
    dl.write_delta(spark.range(10, 20), t, "append")         # v1
    dl.write_delta(spark.range(0, 5), t, "overwrite")        # v2
    _protect(t, before_version=99)                           # v3
    n = dl.vacuum_delta(t, retention_ms=0)
    assert n > 0  # the overwritten data files still die
    # log metadata untouched: every commit remains, full history
    # replayable
    assert _versions(t) == [0, 1, 2, 3]
    assert dl.replay(t, 0).version == 0
    assert dl.read_delta(spark, t).count() == 5


def test_checkpoint_protection_allows_truncation_at_or_past_v(
    spark, tmp_path
):
    """Cleanup through >= V in one run is allowed: with the floor at
    the head (retention 0) and V <= floor, old commits die as they
    would without the feature."""
    t = str(tmp_path / "t")
    dl.write_delta(spark.range(0, 10), t)                    # v0
    dl.write_delta(spark.range(10, 20), t, "append")         # v1
    _protect(t, before_version=1)                            # v2
    dl.write_delta(spark.range(0, 5), t, "overwrite")        # v3
    dl.vacuum_delta(t, retention_ms=0)
    vs = _versions(t)
    # floor = head (3) >= V (1): commits below the floor are gone
    assert vs == [3]
    assert dl.read_delta(spark, t).count() == 5


def test_checkpoint_protection_via_alter_properties(spark, tmp_path):
    """Setting the property through this engine's ALTER adds the
    writer feature in the same commit (protection-unaware writers
    must refuse, per the feature's contract)."""
    t = str(tmp_path / "t")
    dl.write_delta(spark.range(0, 3), t)
    st = dl.delta_alter_properties(
        spark, t,
        {"delta.requireCheckpointProtectionBeforeVersion": "10"},
    )
    assert "checkpointProtection" in (
        st.protocol.get("writerFeatures") or []
    )
    # this writer still writes (it honors the restriction)
    dl.write_delta(spark.range(3, 6), t, "append")
    assert dl.read_delta(spark, t).count() == 6


def test_collated_string_metadata_reads_and_write_gates(
    spark, tmp_path
):
    """Collations are WRITER-side semantics (the physical type stays
    string): a foreign table whose schema carries __COLLATIONS field
    metadata and whose protocol lists the (unimplemented) collations
    writer feature READS fine — the metadata is ignored, values
    intact — while a write refuses loudly, naming the feature."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "data", "f0"))
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int64()),
                  "s": pa.array(["b", "a"])}),
        os.path.join(t, "data", "f0", "part-0.parquet"),
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {}},
        {"name": "s", "type": "string", "nullable": True,
         "metadata": {
             # Spark 4 parses __COLLATIONS natively and validates
             # the name — use a name it accepts
             "__COLLATIONS": {"s": "ICU.de"},
         }},
    ]}
    dl._atomic_commit(t, 0, [
        {"protocol": {
            "minReaderVersion": 1,
            "minWriterVersion": 7,
            "writerFeatures": ["collations-preview"],
        }},
        {"metaData": {
            "id": "cols-1", "format": {"provider": "parquet",
                                       "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0,
        }},
        {"add": {"path": "data/f0/part-0.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "partitionValues": {}}},
    ])
    out = dl.read_delta(spark, t)
    assert sorted(tuple(r) for r in out.collect()) == [
        (1, "b"), (2, "a"),
    ]
    with pytest.raises(NotImplementedError, match="collations"):
        dl.write_delta(
            spark.createDataFrame([(3, "c")], "k long, s string"),
            t, "append",
        )


def test_unknown_reader_feature_refuses_read(spark, tmp_path):
    """The precise degradation matrix: unknown READER features stop
    reads; unknown WRITER features stop only writes."""
    t = str(tmp_path / "t")
    os.makedirs(os.path.join(t, "data", "f0"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64())}),
        os.path.join(t, "data", "f0", "part-0.parquet"),
    )
    schema = {"type": "struct", "fields": [
        {"name": "k", "type": "long", "nullable": True,
         "metadata": {}},
    ]}
    dl._atomic_commit(t, 0, [
        {"protocol": {
            "minReaderVersion": 3,
            "minWriterVersion": 7,
            "readerFeatures": ["futureColumnEncryption"],
            "writerFeatures": ["futureColumnEncryption"],
        }},
        {"metaData": {
            "id": "fx-1", "format": {"provider": "parquet",
                                     "options": {}},
            "schemaString": json.dumps(schema),
            "partitionColumns": [], "configuration": {},
            "createdTime": 0,
        }},
        {"add": {"path": "data/f0/part-0.parquet", "size": 1,
                 "modificationTime": 0, "dataChange": True,
                 "partitionValues": {}}},
    ])
    with pytest.raises(
        NotImplementedError, match="futureColumnEncryption"
    ):
        dl.read_delta(spark, t).collect()
