"""Versioned snapshot tables over plain parquet — transaction-log
semantics (commit / time travel / rollback / vacuum / optimistic
concurrency) without a table-format dependency.

The reference publishes Delta tables (notebooks/20_analytics.ipynb:653,
2200, 2561; 21_EDA.ipynb:33360); delta-spark is not installable in this
environment (COVERAGE.md §2.9 note), so ``sources/writers.py`` falls
back to parquet ``saveAsTable``. That fallback loses Delta's OTHER
contract — the transaction log. This module supplies exactly that
contract, clean-room, with the same mechanics every log-structured
table format uses (Delta/Iceberg-shaped, minus compaction of the log
itself):

* **Data files are immutable.** Every commit writes its files under a
  fresh ``data/<uuid>/`` prefix; nothing ever rewrites a live file.
* **A version IS a manifest.** ``_snapshots/v<N>.json`` lists the
  relative data files (plus schema and provenance) that make up
  version N. Readers resolve a manifest, then scan exactly those
  files — an append commit REFERENCES the previous files instead of
  copying them.
* **Commit = exclusive create of the next manifest** (``open(..., 'x')``
  — atomic on POSIX). Two writers racing to commit version N collide
  on the create. What the loser does depends on whether its content
  depends on the head it read: an OVERWRITE or ROLLBACK (content
  head-independent) simply retries at N+1; an APPEND re-reads the new
  head and REBASES its files onto it (so a concurrent writer's rows
  are never lost); a MERGE raises ``ConcurrentCommitError`` — its
  output was computed FROM the stale head, so only the caller can
  redo it (Delta's "concurrent modification" rule).
* **Time travel** = read an old manifest. **Rollback** = a NEW commit
  whose file list equals an old version's (history is append-only;
  nothing is erased by going back). **Vacuum** = delete data files no
  retained manifest references.

Scale posture: manifests hold file paths, not data — KBs per commit at
any table size. Readers hand Spark an explicit file list, so partition
pruning/pushdown work unchanged; at 100 TB the file list itself is the
scaling limit (millions of entries), which real formats solve with
manifest trees / log checkpoints — out of scope here and documented as
such.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

_SNAPDIR = "_snapshots"
_DATADIR = "data"


@dataclass(frozen=True)
class Snapshot:
    version: int
    mode: str  # overwrite | append | rollback
    files: tuple[str, ...]  # relative to the table dir
    schema: str  # DDL string
    n_files_added: int


def _snap_dir(table_dir: str) -> str:
    return os.path.join(table_dir, _SNAPDIR)


def _manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(_snap_dir(table_dir), f"v{version:09d}.json")


def list_versions(table_dir: str) -> list[int]:
    d = _snap_dir(table_dir)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def read_manifest(table_dir: str, version: int | None = None) -> Snapshot:
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not in {table_dir} (have {versions[0]}..."
            f"{versions[-1]})"
        )
    with open(_manifest_path(table_dir, v)) as f:
        m = json.load(f)
    return Snapshot(
        version=v,
        mode=m["mode"],
        files=tuple(m["files"]),
        schema=m["schema"],
        n_files_added=m["n_files_added"],
    )


def _write_data_files(df: DataFrame, table_dir: str) -> list[str]:
    """Materialize df as immutable files under a fresh data/<uuid>/
    prefix; returns their table-relative paths."""
    commit_id = uuid.uuid4().hex[:12]
    rel = os.path.join(_DATADIR, commit_id)
    out = os.path.join(table_dir, rel)
    df.write.mode("errorifexists").parquet(out)
    return sorted(
        os.path.join(rel, f)
        for f in os.listdir(out)
        if f.endswith(".parquet") and not f.startswith("_")
    )


class ConcurrentCommitError(RuntimeError):
    """A competing commit landed on the version this writer's content
    was computed against; the content must be rebuilt from the new
    head before retrying."""


def _try_commit(
    table_dir: str,
    version: int,
    mode: str,
    files: list[str],
    schema: str,
    n_added: int,
) -> Snapshot:
    """Attempt to commit exactly ``version``. Raises
    ConcurrentCommitError if another writer took it — the CALLER
    decides whether its content is still valid against the new head
    (retry verbatim, rebase, or give up). A blind internal retry here
    would silently publish a stale file list: the lost-update bug."""
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    path = _manifest_path(table_dir, version)
    try:
        with open(path, "x") as f:  # atomic exclusive create
            json.dump(
                {
                    "mode": mode,
                    "files": files,
                    "schema": schema,
                    "n_files_added": n_added,
                },
                f,
            )
    except FileExistsError as e:
        raise ConcurrentCommitError(
            f"version {version} of {table_dir} was committed by a "
            "concurrent writer"
        ) from e
    return Snapshot(
        version=version,
        mode=mode,
        files=tuple(files),
        schema=schema,
        n_files_added=n_added,
    )


def _next_version(table_dir: str) -> int:
    return (list_versions(table_dir) or [-1])[-1] + 1


def _commit_head_independent(
    table_dir: str,
    mode: str,
    files: list[str],
    schema: str,
    n_added: int,
    max_retries: int = 20,
) -> Snapshot:
    """Commit content that does NOT depend on the current head
    (overwrite: fresh files; rollback: an old version's files) — losing
    a race just means taking the next number, verbatim."""
    for _ in range(max_retries):
        try:
            return _try_commit(
                table_dir, _next_version(table_dir), mode, files,
                schema, n_added,
            )
        except ConcurrentCommitError:
            continue
    raise RuntimeError(
        f"snapshot commit to {table_dir} lost {max_retries} races"
    )


def snapshot_write(
    df: DataFrame, table_dir: str, mode: str = "overwrite"
) -> Snapshot:
    """Commit ``df`` as the next table version. ``overwrite`` replaces
    the logical content (old files stay on disk for time travel until
    vacuumed); ``append`` commits the head's file list PLUS the new
    files — no data is copied, and on losing a commit race the append
    REBASES onto the winner's head (re-reads it and re-derives the
    file list), so a concurrent writer's rows are never dropped."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    schema = json.dumps(df.schema.jsonValue())
    new_files = _write_data_files(df, table_dir)
    if mode == "overwrite":
        return _commit_head_independent(
            table_dir, mode, new_files, schema, len(new_files)
        )
    for _ in range(20):
        versions = list_versions(table_dir)
        if versions:
            prev = read_manifest(table_dir)
            if prev.schema != schema:
                raise ValueError(
                    f"append schema {schema} != table schema "
                    f"{prev.schema}"
                )
            base, nxt = list(prev.files), prev.version + 1
        else:
            base, nxt = [], 0
        try:
            return _try_commit(
                table_dir, nxt, mode, base + new_files, schema,
                len(new_files),
            )
        except ConcurrentCommitError:
            continue  # rebase: re-read the new head and re-derive
    raise RuntimeError(f"snapshot append to {table_dir} lost 20 races")


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest) — time
    travel is just resolving an older manifest. An empty file list
    yields an empty frame with the manifest's schema."""
    snap = read_manifest(table_dir, version)
    if not snap.files:
        return spark.createDataFrame([], _schema_of(snap))
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in snap.files]
    )


def _schema_of(snap: Snapshot):
    """Manifest schema back to a StructType. Stored as StructType JSON,
    which round-trips exactly (simpleString does NOT: unquoted
    special-char field names fail to re-parse and nullability is
    lost)."""
    from pyspark.sql.types import StructType

    return StructType.fromJson(json.loads(snap.schema))


def rollback(table_dir: str, version: int) -> Snapshot:
    """Restore the table to an old version's content by committing a
    NEW version with that file list — the audit trail keeps both the
    bad versions and the act of rolling them back. The file list comes
    from the (immutable) old manifest, so losing a commit race just
    means retrying at the next number."""
    old = read_manifest(table_dir, version)
    return _commit_head_independent(
        table_dir, "rollback", list(old.files), old.schema, 0
    )


def vacuum(
    table_dir: str,
    keep_last: int = 2,
    orphan_age_seconds: float = 6 * 3600,
) -> list[str]:
    """Delete data files referenced by NO retained manifest (the last
    ``keep_last`` versions keep both their manifests and their files;
    older manifests are dropped with their unshared files). Bounds
    time-travel history, reclaims overwritten data.

    A second pass sweeps ORPHANED commit dirs — ``data/<uuid>/``
    prefixes none of the surviving manifests reference, left by a
    writer that crashed (or lost every commit race) between
    materializing its files and creating its manifest, plus dirs
    holding only ``_SUCCESS``/crc markers after their parquet files
    were individually reclaimed. Only dirs older than
    ``orphan_age_seconds`` are swept: a younger unreferenced dir may
    belong to a commit IN FLIGHT right now."""
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(table_dir)
    kept, dropped = versions[-keep_last:], versions[:-keep_last]
    live: set[str] = set()
    for v in kept:
        live |= set(read_manifest(table_dir, v).files)
    removed: list[str] = []
    for v in dropped:
        for f in read_manifest(table_dir, v).files:
            if f not in live:
                p = os.path.join(table_dir, f)
                if os.path.exists(p):
                    os.remove(p)
                removed.append(f)
        os.remove(_manifest_path(table_dir, v))
    # orphan sweep: aged commit dirs with no surviving reference
    data_root = os.path.join(table_dir, _DATADIR)
    now = time.time()
    if os.path.isdir(data_root):
        live_dirs = {f.split(os.sep)[1] for f in live}
        for d in os.listdir(data_root):
            full = os.path.join(data_root, d)
            try:
                if (
                    not os.path.isdir(full)
                    or d in live_dirs
                    or now - os.stat(full).st_mtime <= orphan_age_seconds
                ):
                    continue
            except OSError:
                continue  # vanished mid-scan
            removed.extend(
                os.path.join(_DATADIR, d, f)
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
            shutil.rmtree(full, ignore_errors=True)
    return sorted(set(removed))


def snapshot_merge_upsert(
    spark: SparkSession,
    table_dir: str,
    updates: DataFrame,
    keys: list[str],
) -> Snapshot:
    """MERGE as a snapshot commit: rows whose key matches an update are
    replaced, unmatched updates inserted — the full result committed as
    a new version, so the pre-merge table remains time-travelable and a
    bad merge is one :func:`rollback` away. Re-running the same updates
    converges (idempotent).

    Concurrency: the merged content is computed FROM the head read at
    the start, so this commit targets exactly head+1 and raises
    :class:`ConcurrentCommitError` if anything landed in between —
    silently winning would erase the concurrent commit's rows (the
    read-merge-write TOCTOU). The caller re-runs the merge against the
    new head; the updates are idempotent, so a re-run is always safe.

    Plan shape: current LEFT ANTI updates (broadcast when the update
    batch is small — the CDC case) ∪ updates. On plain parquet a merge
    rewrites the affected data; at 100 TB bound the affected data by
    partitioning on a key prefix (see writers.merge_upsert's note) —
    the snapshot layer adds versioning, not a different rewrite cost.
    """
    basis = read_manifest(table_dir)
    current = read_snapshot(spark, table_dir, basis.version)
    if set(current.columns) != set(updates.columns):
        raise ValueError(
            f"update schema {sorted(updates.columns)} != table schema "
            f"{sorted(current.columns)}"
        )
    merged = current.join(updates, on=keys, how="left_anti").unionByName(
        updates
    )
    new_files = _write_data_files(merged, table_dir)
    return _try_commit(
        table_dir,
        basis.version + 1,
        "overwrite",
        new_files,
        basis.schema,
        len(new_files),
    )


def read_increment(
    spark: SparkSession,
    table_dir: str,
    since_version: int,
    version: int | None = None,
) -> DataFrame:
    """Read ONLY the data files added after ``since_version`` (up to
    ``version``, default latest) — the manifest diff that makes
    incremental view maintenance a file-list subtraction instead of a
    change-data-capture system: an append-only consumer aggregates the
    increment and merges it into its state (the foreachBatch HLL/IVM
    pattern in tests/test_streaming_semantics.py), never rescanning
    history.

    Raises if any version in the range was not an append: an overwrite
    or rollback invalidates incremental state, and a consumer MUST
    rebuild rather than silently double-count — the same contract as
    Delta's change-feed 'table was overwritten' error.
    """
    head = read_manifest(table_dir, version)
    base = read_manifest(table_dir, since_version)
    for v in list_versions(table_dir):
        if since_version < v <= head.version:
            m = head if v == head.version else read_manifest(table_dir, v)
            if m.mode != "append":
                raise ValueError(
                    f"version {v} is {m.mode!r}, not append: the "
                    f"increment since v{since_version} is not "
                    "well-defined — rebuild the downstream state from "
                    "a full read instead"
                )
    base_set = set(base.files)
    new = [f for f in head.files if f not in base_set]
    if not new:
        return spark.createDataFrame([], _schema_of(head))
    return spark.read.parquet(
        *[os.path.join(table_dir, f) for f in new]
    )
