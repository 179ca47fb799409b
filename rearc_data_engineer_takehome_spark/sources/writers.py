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


def compact_parquet_dir(
    spark: SparkSession, path: str, target_files: int
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files. Streaming/append sinks accrete tiny files
    whose per-file open/footer overhead dominates scans at scale;
    periodic compaction restores healthy file sizes.

    Safe rewrite protocol: write to a sibling temp dir first, then swap
    directories — the original data is never destroyed before the
    replacement is fully committed. Returns the new file count.
    """
    import shutil
    from pathlib import Path

    src = Path(path)
    tmp = src.with_name(src.name + "._compacting")
    backup = src.with_name(src.name + "._old")
    if tmp.exists():
        shutil.rmtree(tmp)

    spark.read.parquet(str(src)).coalesce(target_files).write.mode(
        "overwrite"
    ).parquet(str(tmp))

    src.rename(backup)
    try:
        tmp.rename(src)
    except OSError:
        backup.rename(src)  # roll back: original data restored
        raise
    shutil.rmtree(backup)
    return len(list(src.glob("*.parquet")))
