"""CONVERT TO DELTA (``convert_to_delta``) — in-place zero-rewrite
upgrade of a plain parquet directory to a native-log Delta table.

Reference anchor: the Delta publishing surface of the reference's
notebooks (`/root/reference/notebooks/20_analytics.ipynb`) — CONVERT
is the standard onboarding path for pre-existing parquet data into
that surface, per the public delta-io PROTOCOL.md action model.
"""

from __future__ import annotations

import glob
import os

import pytest

from rearc_data_engineer_takehome_spark.sources import delta_log as dl


def test_convert_flat_then_full_lifecycle(spark, tmp_path):
    t = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i % 4) for i in range(40)], "k int, g int"
    ).repartition(4).write.parquet(t)
    before = sorted(
        glob.glob(os.path.join(t, "**", "*.parquet"), recursive=True)
    )
    st = dl.convert_to_delta(spark, t)
    assert st.version == 0
    # zero rewrite: the exact same files, now referenced by the log
    assert sorted(
        os.path.join(t, p) for p in st.files
    ) == before
    assert dl.read_delta(spark, t).count() == 40
    # the converted table is a first-class Delta table
    dl.delta_delete(spark, t, "g = 1")
    assert dl.read_delta(spark, t).count() == 30
    dl.write_delta(
        spark.createDataFrame([(99, 9)], "k int, g int"),
        t, mode="append",
    )
    assert dl.read_delta(spark, t).count() == 31
    # history starts at the conversion
    assert dl.read_delta(spark, t, version=0).count() == 40


def test_convert_partitioned_null_and_encoded_values(
    spark, tmp_path
):
    """Hive segments parse URL-decoded; ``__HIVE_DEFAULT_PARTITION__``
    maps to null; partitionValues drive file pruning."""
    t = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, None), (4, "x")],
        "k int, p string",
    ).write.partitionBy("p").parquet(t)
    st = dl.convert_to_delta(spark, t, partition_by=["p"])
    assert tuple(st.partition_cols) == ("p",)
    rows = sorted(
        (r.k, r.p) for r in dl.read_delta(spark, t).collect()
    )
    assert rows == [(1, "a b"), (2, "a b"), (3, None), (4, "x")]
    assert dl.delta_scan(
        spark, t, prune={"p": ("a b", "a b")}
    ).count() == 2
    # appends must keep the partitioning
    dl.write_delta(
        spark.createDataFrame([(9, "x")], "k int, p string"),
        t, mode="append", partition_by=["p"],
    )
    assert dl.read_delta(spark, t).where("p = 'x'").count() == 2


def test_convert_refusals(spark, tmp_path):
    # already a Delta table
    t = str(tmp_path / "t")
    dl.write_delta(spark.range(3), t)
    with pytest.raises(ValueError, match="already a Delta table"):
        dl.convert_to_delta(spark, t)
    # nothing to convert
    empty = str(tmp_path / "empty")
    os.makedirs(empty)
    with pytest.raises(ValueError, match="no parquet files"):
        dl.convert_to_delta(spark, empty)
    # declared partitioning not present in the layout
    flat = str(tmp_path / "flat")
    spark.range(3).write.parquet(flat)
    with pytest.raises(ValueError, match="hive segments"):
        dl.convert_to_delta(spark, flat, partition_by=["p"])


def test_convert_collects_stats_for_pruning(spark, tmp_path):
    t = str(tmp_path / "t")
    (
        spark.range(1000)
        .selectExpr("cast(id as int) as k")
        .repartitionByRange(4, "k")
        .sortWithinPartitions("k")
        .write.parquet(t)
    )
    st = dl.convert_to_delta(spark, t, stats_cols=["k"])
    import json as _json

    stats = [
        _json.loads(a["stats"]) for a in st.adds.values()
    ]
    assert all("minValues" in s for s in stats)
    assert dl.delta_scan(spark, t, prune={"k": (0, 9)}).count() == 10


def test_convert_then_clone_and_checkpoint(spark, tmp_path):
    """A converted table composes with the other metadata-only
    machinery: shallow clone and checkpoint-GC replay."""
    t, u = str(tmp_path / "t"), str(tmp_path / "u")
    spark.createDataFrame(
        [(i,) for i in range(20)], "k int"
    ).write.parquet(t)
    dl.convert_to_delta(spark, t)
    dl.delta_clone(t, u)
    assert dl.read_delta(spark, u).count() == 20
    dl.write_checkpoint(t)
    for j in glob.glob(os.path.join(t, "_delta_log", "0*.json")):
        os.remove(j)
    assert dl.read_delta(spark, t).count() == 20


def test_convert_then_upgrade_column_mapping(spark, tmp_path):
    """The full onboarding chain a real migration runs: plain
    parquet -> CONVERT (zero rewrite) -> column-mapping upgrade
    (metadata-only) -> metaData-only RENAME -> append with field
    ids. Three metadata commits, zero data rewritten, and the
    pre-existing files keep resolving through physical names equal
    to their original logical names."""
    import glob as _glob

    t = str(tmp_path / "t")
    spark.createDataFrame(
        [(i, i * 10) for i in range(30)], "k int, v int"
    ).repartition(3).write.parquet(t)
    before = sorted(
        _glob.glob(os.path.join(t, "**", "*.parquet"),
                   recursive=True)
    )
    dl.convert_to_delta(spark, t)
    dl.delta_upgrade_column_mapping(t)
    dl.delta_rename_column(t, "v", "val")
    # still zero rewrites across all three steps
    assert sorted(
        _glob.glob(os.path.join(t, "**", "*.parquet"),
                   recursive=True)
    ) == before
    out = dl.read_delta(spark, t)
    assert out.columns == ["k", "val"]
    assert out.agg({"val": "sum"}).first()[0] == sum(
        i * 10 for i in range(30)
    )
    dl.write_delta(
        spark.createDataFrame([(99, 990)], "k int, val int"),
        t, mode="append",
    )
    assert dl.read_delta(spark, t).count() == 31
