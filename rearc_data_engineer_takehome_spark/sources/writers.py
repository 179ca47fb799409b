"""Table sinks (reference operators S13-S15, D1/D4).

The reference publishes three overwrite-mode curated tables and one
append-mode run log via ``saveAsTable`` on Delta
(notebooks/20_analytics.ipynb:653, 2200, 2561; 21_EDA.ipynb:33360-33367).
Here Delta is optional: ``format`` degrades to parquet behind one switch
so the engine runs anywhere (SURVEY.md §7.4 risk #6).

Scale notes: curated outputs accept ``partition_by`` — at 100 TB an
unpartitioned overwrite table is a full rewrite and an unprunable scan;
callers partition on the dominant filter key (e.g. date).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _table_format(spark: SparkSession) -> str:
    """delta if the runtime has it, else parquet."""
    try:
        spark._jvm.Class.forName("org.apache.spark.sql.delta.DeltaLog")  # type: ignore[union-attr]
        return "delta"
    except Exception:  # noqa: BLE001
        return "parquet"


def ensure_database(spark: SparkSession, name: str) -> None:
    """D1/D4: namespace setup — the OSS stand-in for the reference's
    Unity Catalog catalog/schema DDL (Unity Catalog Setup.ipynb cell-11)."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {name}")


def publish_overwrite(
    df: DataFrame,
    table: str,
    partition_by: Sequence[str] = (),
    fmt: str | None = None,
) -> None:
    """S13: idempotent overwrite-mode publish (re-runs converge to the
    same state — the reference's core idempotency contract)."""
    writer = df.write.mode("overwrite").format(fmt or _table_format(df.sparkSession))
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.saveAsTable(table)


def publish_append(df: DataFrame, table: str, fmt: str | None = None) -> None:
    """S14: append-mode accumulation (run logs / audit trails)."""
    df.write.mode("append").format(fmt or _table_format(df.sparkSession)).saveAsTable(
        table
    )


def publish_partition_overwrite(
    df: DataFrame,
    table: str,
    fmt: str | None = None,
) -> None:
    """Dynamic partition overwrite: replace ONLY the partitions present
    in ``df``, leaving all others untouched — the idempotent-rerun story
    at 100 TB, where a full-table overwrite (S13) would rewrite
    petabytes to refresh one day. Requires the table to already exist
    partitioned (create with publish_overwrite + partition_by).

    ``insertInto`` matches columns BY POSITION against the stored table
    schema (which moves partition columns last), so the frame is
    explicitly reordered to that schema first — otherwise a caller's
    natural column order would silently write values into the wrong
    columns.
    """
    spark = df.sparkSession
    table_cols = spark.table(table).columns
    missing = set(table_cols) - set(df.columns)
    if missing:
        raise ValueError(f"frame lacks table columns {sorted(missing)}")
    aligned = df.select(*table_cols)
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        aligned.write.mode("overwrite").format(
            fmt or _table_format(spark)
        ).insertInto(table)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def write_parquet_dir(
    df: DataFrame, path: str, partition_by: Sequence[str] = (), mode: str = "overwrite"
) -> None:
    """Plain-directory sink for pipelines without a metastore."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def _swap_rewrite(path: str, write_tmp) -> None:
    """Safe rewrite protocol: materialize the replacement in a sibling
    temp dir, then swap directories — the original data is never
    destroyed before the replacement is fully committed. ``write_tmp``
    is called with the temp path and must produce the new contents.
    """
    import shutil
    from pathlib import Path

    src = Path(path)
    tmp = src.with_name(src.name + "._rewriting")
    backup = src.with_name(src.name + "._old")
    if tmp.exists():
        shutil.rmtree(tmp)

    write_tmp(str(tmp))

    src.rename(backup)
    try:
        tmp.rename(src)
    except OSError:
        backup.rename(src)  # roll back: original data restored
        raise
    shutil.rmtree(backup)


def compact_parquet_dir(
    spark: SparkSession, path: str, target_files: int
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files. Streaming/append sinks accrete tiny files
    whose per-file open/footer overhead dominates scans at scale;
    periodic compaction restores healthy file sizes. Returns the new
    file count.

    This is the low-level fixed-count primitive (``coalesce``: no
    shuffle, sizes inherit input skew). For the audit-driven form —
    recommended file count from footer stats, evenly-sized output,
    row-count verification, crash recovery — use
    ``operators/layout.compact_table``.
    """
    from pathlib import Path

    df = spark.read.parquet(path)
    _swap_rewrite(
        path,
        lambda tmp: df.coalesce(target_files).write.mode("overwrite").parquet(tmp),
    )
    return len(list(Path(path).glob("*.parquet")))


def merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, keys: Sequence[str]
) -> None:
    """Keyed MERGE (upsert) into a parquet directory: rows whose key
    matches an update are replaced, unmatched updates are inserted,
    everything else is untouched. Re-running the same updates converges
    (idempotent), extending the reference's whole-table overwrite
    idempotency contract (notebooks/10_ingest_bls.ipynb:203) to
    row-level changes.

    Plan shape: current LEFT ANTI updates on the keys (drops superseded
    versions) ∪ updates, rewritten via the safe-swap protocol. On plain
    parquet an upsert is necessarily a rewrite of the affected data; at
    100 TB the affected data must be bounded — partition the table on a
    key prefix and route each update batch through
    ``publish_partition_overwrite`` so only touched partitions rewrite,
    or use a metadata-native MERGE (Delta/Iceberg) when the runtime has
    it (see _table_format). The anti-join itself broadcasts when the
    update batch is small — the common CDC case.
    """
    from pathlib import Path

    if not Path(path).exists():
        updates.write.parquet(path)
        return
    current = spark.read.parquet(path)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"update schema {sorted(updates.columns)} != table schema "
            f"{sorted(current.columns)}"
        )
    merged = current.join(updates, on=list(keys), how="left_anti").unionByName(
        updates
    )
    _swap_rewrite(path, lambda tmp: merged.write.parquet(tmp))


def write_sorted(
    df: DataFrame, path: str, sort_cols: Sequence[str], n_files: int
) -> None:
    """Layout-optimized write: range-partition on ``sort_cols`` into
    ``n_files`` globally disjoint key ranges, sorted within each file.
    Parquet footers then carry tight, non-overlapping min/max stats per
    file and row group, so a point or range predicate on the sort key
    skips every non-matching file without reading it — the single
    biggest scan win at 100 TB (only ~1/n_files of data touched).
    """
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
