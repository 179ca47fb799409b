"""Versioned snapshot tables over plain parquet — transaction-log
semantics (commit / time travel / rollback / vacuum / optimistic
concurrency) without a table-format dependency.

The reference publishes Delta tables (notebooks/20_analytics.ipynb:653,
2200, 2561; 21_EDA.ipynb:33360); delta-spark is not installable in this
environment (COVERAGE.md §2.9 note), so ``sources/writers.py`` falls
back to parquet ``saveAsTable``. That fallback loses Delta's OTHER
contract — the transaction log. This module supplies exactly that
contract, clean-room, with the same mechanics every log-structured
table format uses (Delta/Iceberg-shaped, including log checkpoints):

* **Data files are immutable.** Every commit writes its files under a
  fresh ``data/<uuid>/`` prefix; nothing ever rewrites a live file.
* **A version IS a manifest.** ``_snapshots/v<N>.json`` describes the
  table at version N. Readers resolve a manifest, then scan exactly
  its files — an append commit REFERENCES the previous files instead
  of copying them.
* **Append manifests are DELTAS; every Nth commit is a CHECKPOINT.**
  A plain append records only ``adds`` + its base version, so commit
  cost is O(files added), not O(table files). Every
  ``checkpoint_interval``-th version (and every overwrite/rollback,
  which resets the chain anyway) writes the consolidated full file
  list, so resolving any version walks at most ``checkpoint_interval``
  manifests — the same amortization as Delta's ``_last_checkpoint`` /
  Iceberg's manifest lists. At 100 TB an append therefore writes KBs
  regardless of table size; the O(table-files) consolidation cost is
  paid once per interval and is itself just a JSON dump of paths.
* **Commit = exclusive create of the next manifest** (``open(..., 'x')``
  — atomic on POSIX). Two writers racing to commit version N collide
  on the create. What the loser does depends on whether its content
  depends on the head it read: an OVERWRITE or ROLLBACK (content
  head-independent) simply retries at N+1; an APPEND re-reads the new
  head and REBASES its adds onto it (so a concurrent writer's rows
  are never lost); a MERGE raises ``ConcurrentCommitError`` — its
  output was computed FROM the stale head, so only the caller can
  redo it (Delta's "concurrent modification" rule).
* **Time travel** = read an old manifest. **Rollback** = a NEW commit
  whose file list equals an old version's (history is append-only;
  nothing is erased by going back). **Vacuum** = delete data files no
  retained manifest references, consolidating the oldest retained
  manifest first so retained delta chains never dangle.

Concurrency contract for the administrative ops (enforced + tested in
tests/test_snapshots.py):

* **vacuum vs writers**: safe. Writers materialize under fresh
  ``data/<uuid>/`` dirs; vacuum never touches a dir younger than
  ``orphan_age_seconds``, so an in-flight commit's files survive and
  its manifest lands normally.
* **vacuum vs rollback(v_old)**: rollback targets exactly the versions
  vacuum deletes, so the race is inherent. The contract: rollback
  FAILS LOUDLY and never leaves the table unreadable — it re-verifies
  the restored files right before committing
  (:class:`SnapshotVacuumedError` instead of a poisoned commit), and
  if vacuum deletes the files inside the remaining commit window, the
  post-commit validation heals the log by re-committing the previous
  head's content before raising. Run vacuum and rollback from one
  administrative actor if the error is unacceptable.
* **vacuum vs vacuum**: not supported concurrently (each assumes it is
  the only deleter); serialize administrative actions.
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

# Every Nth version stores the consolidated file list (a log
# checkpoint); versions in between store only their delta. 10 bounds
# manifest-chain walks to 10 reads while keeping the O(table-files)
# consolidation rare — the Delta default is identical in spirit.
CHECKPOINT_INTERVAL = 10


@dataclass(frozen=True)
class Snapshot:
    version: int
    mode: str  # overwrite | append | rollback | compact
    files: tuple[str, ...]  # FULL resolved list, relative to table dir
    schema: str  # StructType JSON string
    n_files_added: int
    # merged per-file column statistics ({rel_file: {col: {min, max,
    # nulls}}}) for files whose commit collected them (stats_cols=...);
    # files without stats are always scanned — pruning is conservative
    stats: dict | None = None


class ConcurrentCommitError(RuntimeError):
    """A competing commit landed on the version this writer's content
    was computed against; the content must be rebuilt from the new
    head before retrying."""


class SnapshotVacuumedError(RuntimeError):
    """A rollback raced a vacuum that reclaimed the restored version's
    data files. The log was left consistent (no commit, or a healed
    re-commit of the pre-rollback head); the caller must pick a
    still-retained version to restore."""


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


def _raw_manifest(table_dir: str, version: int) -> dict:
    """Load one manifest WITHOUT resolving delta chains. A manifest
    that vanishes between listing and open was vacuumed concurrently —
    surfaced as ValueError so callers see one error shape for 'version
    gone' however the race interleaved."""
    try:
        with open(_manifest_path(table_dir, version)) as f:
            return json.load(f)
    except FileNotFoundError:
        raise ValueError(
            f"version {version} of {table_dir} does not exist (never "
            "committed, or vacuumed — possibly concurrently)"
        ) from None


def _resolve_files(
    table_dir: str, version: int
) -> tuple[list[str], dict, dict]:
    """Full file list + merged per-file stats of ``version`` by walking
    its delta chain back to the nearest full manifest (any overwrite/
    rollback/checkpoint). Returns (files, stats, raw manifest of
    ``version``). Chain length is bounded by CHECKPOINT_INTERVAL.
    Each manifest carries stats only for the files it introduced, so
    the merge is a disjoint dict union.

    Concurrent-vacuum robustness (round 7): vacuum consolidates the
    oldest RETAINED manifest to a full file list BEFORE deleting any
    dropped manifest, so every retained chain is walkable at every
    instant — but a walker that read the oldest-retained manifest's
    pre-consolidation DELTA form can still follow ``base_version``
    into a just-deleted parent. That race is transient by
    construction: a fresh walk reads the consolidated full form and
    terminates there. Retry the whole walk (parents are re-read, never
    reused from the failed attempt) while the REQUESTED version's
    manifest still exists; if the requested version itself was
    vacuumed, the ValueError is real and propagates immediately."""
    for _ in range(3):
        try:
            return _resolve_files_once(table_dir, version)
        except ValueError:
            if not os.path.exists(_manifest_path(table_dir, version)):
                raise
    return _resolve_files_once(table_dir, version)


def _resolve_files_once(
    table_dir: str, version: int
) -> tuple[list[str], dict, dict]:
    raw = _raw_manifest(table_dir, version)
    if "files" in raw:
        return list(raw["files"]), dict(raw.get("stats", {})), raw
    adds_stack = [list(raw["adds"])]
    stats: dict = dict(raw.get("stats", {}))
    v = raw["base_version"]
    while True:
        m = _raw_manifest(table_dir, v)
        stats.update(m.get("stats", {}))
        if "files" in m:
            files = list(m["files"])
            break
        adds_stack.append(list(m["adds"]))
        v = m["base_version"]
    for adds in reversed(adds_stack):
        files.extend(adds)
    # stats may name files dropped from the list by an overwrite deeper
    # in history only via full manifests, which carry their own stats —
    # restrict to live files for a clean contract
    live = set(files)
    return files, {f: s for f, s in stats.items() if f in live}, raw


def read_manifest(table_dir: str, version: int | None = None) -> Snapshot:
    versions = list_versions(table_dir)
    if not versions:
        raise FileNotFoundError(f"no snapshots at {table_dir}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not in {table_dir} (have {versions[0]}..."
            f"{versions[-1]} — older versions may have been vacuumed)"
        )
    files, stats, raw = _resolve_files(table_dir, v)
    return Snapshot(
        version=v,
        mode=raw["mode"],
        files=tuple(files),
        schema=raw["schema"],
        n_files_added=raw["n_files_added"],
        stats=stats or None,
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


def _try_commit(
    table_dir: str,
    version: int,
    mode: str,
    schema: str,
    n_added: int,
    *,
    files: list[str] | None = None,
    adds: list[str] | None = None,
    base_version: int | None = None,
    stats: dict | None = None,
) -> Snapshot:
    """Attempt to commit exactly ``version`` — either a FULL manifest
    (``files``) or a DELTA manifest (``adds`` + ``base_version``).
    Raises ConcurrentCommitError if another writer took the number —
    the CALLER decides whether its content is still valid against the
    new head (retry verbatim, rebase, or give up). A blind internal
    retry here would silently publish a stale file list: the
    lost-update bug."""
    if (files is None) == (adds is None):
        raise ValueError("exactly one of files/adds must be given")
    os.makedirs(_snap_dir(table_dir), exist_ok=True)
    payload: dict = {"mode": mode, "schema": schema, "n_files_added": n_added}
    if files is not None:
        payload["files"] = files
    else:
        payload["adds"] = adds
        payload["base_version"] = base_version
    if stats:
        payload["stats"] = stats
    path = _manifest_path(table_dir, version)
    # exclusive-create-then-write is NOT atomic for readers: between
    # create and write-complete a concurrent manifest read sees an
    # empty/truncated file (the round-7 stress test caught exactly
    # that as a JSONDecodeError inside vacuum). Write the full payload
    # to a tmp name first, then os.link it in — link is atomic AND
    # fails-if-exists, so commit-race semantics are unchanged while
    # the manifest is never observable half-written.
    tmp = f"{path}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        json.dump(payload, f)
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        raise ConcurrentCommitError(
            f"version {version} of {table_dir} was committed by a "
            "concurrent writer"
        ) from e
    finally:
        os.unlink(tmp)
    if files is not None:
        resolved, merged_stats = files, (stats or {})
    else:
        resolved, merged_stats, _ = _resolve_files(table_dir, version)
    return Snapshot(
        version=version,
        mode=mode,
        files=tuple(resolved),
        schema=schema,
        n_files_added=n_added,
        stats=merged_stats or None,
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
    stats: dict | None = None,
) -> Snapshot:
    """Commit content that does NOT depend on the current head
    (overwrite: fresh files; rollback: an old version's files) — losing
    a race just means taking the next number, verbatim. Always a FULL
    manifest: these modes reset the delta chain."""
    for _ in range(max_retries):
        try:
            return _try_commit(
                table_dir, _next_version(table_dir), mode, schema,
                n_added, files=files, stats=stats,
            )
        except ConcurrentCommitError:
            continue
    raise RuntimeError(
        f"snapshot commit to {table_dir} lost {max_retries} races"
    )


def _footer_stats(
    table_dir: str, rel_files: list[str], cols: list[str]
) -> dict:
    """Per-file column statistics ({rel: {col: {min, max, nulls}}})
    read from the parquet FOOTERS of just-written files — O(footer
    reads) over the files ADDED by one commit, never the whole table;
    the same source every lakehouse format mines for its data-skipping
    index. Only JSON-stable scalar types are recorded (int/float/str/
    bool); a column whose footer lacks min/max (or holds another type)
    is simply absent, and absent stats always mean "scan the file" —
    pruning is conservative by construction."""
    import pyarrow.parquet as pq

    out: dict = {}
    for rel in rel_files:
        md = pq.ParquetFile(os.path.join(table_dir, rel)).metadata
        stats = _stats_from_metadata(md, cols)
        if stats:
            out[rel] = stats
    return out


def _stats_from_metadata(md, cols: list[str]) -> dict:
    """Column statistics ({col: {min, max, nulls}}) from ONE parquet
    footer's metadata object — split out so callers that already hold
    the footer (delta_log's writer) don't re-open the file."""
    per_col: dict = {}
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for c_i in range(rg.num_columns):
            col = rg.column(c_i)
            name = col.path_in_schema
            if name not in cols:
                continue
            st = col.statistics
            if st is None or not st.has_min_max:
                per_col[name] = None  # unknown somewhere: drop col
                continue
            mn, mx = st.min, st.max
            if isinstance(mn, bytes):
                try:
                    mn, mx = mn.decode(), mx.decode()
                except UnicodeDecodeError:
                    per_col[name] = None
                    continue
            if not isinstance(mn, (int, float, str, bool)):
                per_col[name] = None
                continue
            prev = per_col.get(name)
            if prev is None and name in per_col:
                continue  # already poisoned by an unknown row group
            nulls = st.null_count if st.null_count is not None else 0
            if prev is None:
                per_col[name] = {"min": mn, "max": mx, "nulls": nulls}
            else:
                per_col[name] = {
                    "min": min(prev["min"], mn),
                    "max": max(prev["max"], mx),
                    "nulls": prev["nulls"] + nulls,
                }
    return {k: v for k, v in per_col.items() if v is not None}


def _norm_type(t):
    """Structural normal form of a StructType-JSON type: nullability
    and field metadata stripped, struct fields sorted by name — the
    parquet-union compatibility relation (parquet resolves columns by
    NAME; nullability is advisory on read; metadata is not data)."""
    if isinstance(t, dict):
        kind = t.get("type")
        if kind == "struct":
            return (
                "struct",
                tuple(sorted(
                    (f["name"], _norm_type(f["type"]))
                    for f in t["fields"]
                )),
            )
        if kind == "array":
            return ("array", _norm_type(t["elementType"]))
        if kind == "map":
            return ("map", _norm_type(t["keyType"]), _norm_type(t["valueType"]))
    return t


def _schema_compatible(a_json: str, b_json: str) -> bool:
    return _norm_type(json.loads(a_json)) == _norm_type(json.loads(b_json))


def _merge_schemas(table_json: str, append_json: str) -> str:
    """Additive schema evolution (Delta's mergeSchema contract): the
    merged schema keeps every table field's original definition, then
    appends fields only the incoming batch has — forced nullable,
    because every pre-evolution file lacks them and reads null-fill.
    A field present in BOTH must be structurally identical (same
    normal-form type), and the batch must CARRY every existing table
    column: a missing column is a loud error, because it is
    indistinguishable from half of a rename — accepting it would turn
    `s -> s2` into a silent (k, s, s2) table with complementary null
    halves, exactly the read corruption this contract exists to
    prevent."""
    table = json.loads(table_json)
    append = json.loads(append_json)
    by_name = {f["name"]: f for f in append["fields"]}
    merged = []
    for f in table["fields"]:
        inc = by_name.pop(f["name"], None)
        if inc is None:
            raise ValueError(
                f"merge_schema batch is missing table column "
                f"{f['name']!r}: only ADDING columns is supported — a "
                "missing column reads as half of a rename, which would "
                "silently null-fill both halves"
            )
        if _norm_type(inc["type"]) != _norm_type(f["type"]):
            raise ValueError(
                f"merge_schema cannot change column {f['name']!r}'s "
                f"type ({f['type']} -> {inc['type']}); only ADDING "
                "columns is supported"
            )
        merged.append(f)
    for f in append["fields"]:  # preserve the batch's order for adds
        if f["name"] in by_name:
            merged.append({**f, "nullable": True})
    return json.dumps({**table, "fields": merged})


def snapshot_write(
    df: DataFrame,
    table_dir: str,
    mode: str = "overwrite",
    checkpoint_interval: int = CHECKPOINT_INTERVAL,
    stats_cols: list[str] | None = None,
    merge_schema: bool = False,
) -> Snapshot:
    """Commit ``df`` as the next table version. ``overwrite`` replaces
    the logical content (old files stay on disk for time travel until
    vacuumed); ``append`` commits a DELTA manifest (just the new files
    + the base version) — or the consolidated full list when the
    version number is a ``checkpoint_interval`` multiple — so append
    cost is O(files added) regardless of table size. No data is
    copied, and on losing a commit race the append REBASES onto the
    winner's head (re-reads it and re-derives the manifest), so a
    concurrent writer's rows are never dropped.

    Append schema check is STRUCTURAL (same column names and types,
    ignoring nullability, field metadata, and field order — parquet
    resolves columns by name, so such unions read fine); the table
    keeps its original schema string. A name or type change still
    rejects loudly: that union would silently null-fill or fail at
    read time.

    ``stats_cols`` names columns whose per-file min/max/null-count are
    mined from the just-written parquet footers and stored in the
    manifest — the data-skipping index :func:`snapshot_scan` prunes
    with. Cost is O(files ADDED) footer reads per commit; files
    committed without stats are simply never pruned.

    ``merge_schema=True`` enables ADDITIVE schema evolution on append
    (Delta's mergeSchema contract): a batch that only adds new columns
    widens the table schema, and reads of every version resolve
    against their manifest's schema explicitly, so pre-evolution files
    null-fill the new columns. Renames and type changes stay loud
    errors in both modes."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")
    if checkpoint_interval < 1:
        raise ValueError("checkpoint_interval must be >= 1")
    schema = json.dumps(df.schema.jsonValue())
    new_files = _write_data_files(df, table_dir)
    new_stats = (
        _footer_stats(table_dir, new_files, stats_cols)
        if stats_cols
        else {}
    )
    if mode == "overwrite":
        return _commit_head_independent(
            table_dir, mode, new_files, schema, len(new_files),
            stats=new_stats,
        )
    for _ in range(20):
        versions = list_versions(table_dir)
        if versions:
            prev_v = versions[-1]
            prev_raw = _raw_manifest(table_dir, prev_v)
            if _schema_compatible(prev_raw["schema"], schema):
                table_schema = prev_raw["schema"]  # sticky table schema
            elif merge_schema:
                # additive evolution: widen the table schema; raises
                # if the batch renames or retypes an existing column
                table_schema = _merge_schemas(prev_raw["schema"], schema)
            else:
                raise ValueError(
                    f"append schema is structurally incompatible with "
                    f"the table schema (column name or type mismatch): "
                    f"append={schema} table={prev_raw['schema']} — "
                    "pass merge_schema=True if the batch only ADDS "
                    "columns"
                )
            nxt = prev_v + 1
        else:
            nxt, prev_v, table_schema = 0, None, schema
        try:
            if prev_v is None or nxt % checkpoint_interval == 0:
                # checkpoint (or first) version: consolidated full
                # list, carrying the chain's merged stats forward
                if prev_v is not None:
                    base, base_stats, _ = _resolve_files(table_dir, prev_v)
                else:
                    base, base_stats = [], {}
                return _try_commit(
                    table_dir, nxt, mode, table_schema, len(new_files),
                    files=base + new_files,
                    stats={**base_stats, **new_stats},
                )
            return _try_commit(
                table_dir, nxt, mode, table_schema, len(new_files),
                adds=new_files, base_version=prev_v, stats=new_stats,
            )
        except ConcurrentCommitError:
            continue  # rebase: re-read the new head and re-derive
    raise RuntimeError(f"snapshot append to {table_dir} lost 20 races")


def read_snapshot(
    spark: SparkSession, table_dir: str, version: int | None = None
) -> DataFrame:
    """Read the table as of ``version`` (default: latest) — time
    travel is just resolving an older manifest. An empty file list
    yields an empty frame with the manifest's schema. The read pins
    the manifest's schema explicitly (never samples a data file's
    footer), so after additive evolution pre-evolution files
    null-fill the added columns — and each time-travel version reads
    with exactly the schema it was committed under."""
    snap = read_manifest(table_dir, version)
    if not snap.files:
        return spark.createDataFrame([], _schema_of(snap))
    return spark.read.schema(_schema_of(snap)).parquet(
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
    bad versions and the act of rolling them back.

    Vacuum-race contract (see module docstring): the restored files
    are re-verified immediately before committing, so a vacuum that
    already reclaimed them raises :class:`SnapshotVacuumedError`
    without committing anything; a vacuum that deletes them INSIDE the
    remaining commit window is caught by post-commit validation, which
    heals the log (re-commits the pre-rollback head's content over the
    poisoned version) and then raises. Either way the head stays
    readable."""
    old = read_manifest(table_dir, version)  # ValueError if vacuumed
    missing = [
        f for f in old.files
        if not os.path.exists(os.path.join(table_dir, f))
    ]
    if missing:
        raise SnapshotVacuumedError(
            f"cannot roll back {table_dir} to v{version}: {len(missing)} "
            f"of its data files were vacuumed (first: {missing[0]}); "
            "pick a retained version"
        )
    snap = _commit_head_independent(
        table_dir, "rollback", list(old.files), old.schema, 0,
        stats=old.stats,
    )
    return _validate_or_heal(table_dir, snap)


def _validate_or_heal(table_dir: str, snap: Snapshot) -> Snapshot:
    """Post-commit half of the rollback/vacuum race contract: if the
    files ``snap`` references were deleted between rollback's pre-check
    and its commit, the just-committed manifest is poisoned (the head
    would be unreadable). Heal by re-committing the previous head's
    content — still vacuum-retained, because vacuum keeps the newest
    ``keep_last >= 1`` versions — then raise SnapshotVacuumedError.

    The heal targets EXACTLY ``snap.version + 1``: if any concurrent
    commit landed there first, healing is REFUSED rather than retried
    at a later number, because retrying would bury that commit's
    content under the restored old head — a lost update the module
    contract forbids. In that case the error reports the last version
    known good so the operator (or the concurrent writer's own
    validation) can roll back explicitly."""
    missing = [
        f for f in snap.files
        if not os.path.exists(os.path.join(table_dir, f))
    ]
    if not missing:
        return snap
    try:
        prev = read_manifest(table_dir, snap.version - 1)
        _try_commit(
            table_dir, snap.version + 1, "rollback", prev.schema, 0,
            files=list(prev.files), stats=prev.stats,
        )
        healed = f"healed: v{snap.version - 1} content re-committed as head"
    except ConcurrentCommitError:
        healed = (
            f"HEAL SKIPPED: a concurrent commit landed at "
            f"v{snap.version + 1} and healing over it would discard "
            f"its rows; head may still reference vacuumed files — "
            f"roll back to v{snap.version - 1} manually"
        )
    except (ValueError, FileNotFoundError) as e:
        healed = f"HEAL FAILED ({e}); repair the head manually"
    raise SnapshotVacuumedError(
        f"rollback of {table_dir} committed v{snap.version} but a "
        f"concurrent vacuum deleted {len(missing)} of its files "
        f"(first: {missing[0]}); {healed}"
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

    Delta-chain safety: the oldest RETAINED manifest is consolidated to
    a full file list first (atomic in-place replace of logically
    identical content), because retained delta manifests may resolve
    through manifests about to be dropped — retained versions stay
    readable at every instant of the vacuum.

    A second pass sweeps ORPHANED commit dirs — ``data/<uuid>/``
    prefixes none of the surviving manifests reference, left by a
    writer that crashed (or lost every commit race) between
    materializing its files and creating its manifest, plus dirs
    holding only ``_SUCCESS``/crc markers after their parquet files
    were individually reclaimed. Only dirs older than
    ``orphan_age_seconds`` are swept: a younger unreferenced dir
    belongs to a commit that may be IN FLIGHT right now — this is what
    makes vacuum-vs-writer safe (module docstring)."""
    import time

    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = list_versions(table_dir)
    kept, dropped = versions[-keep_last:], versions[:-keep_last]
    # resolve everything BEFORE deleting any manifest: dropped versions'
    # lists are needed to find their unshared files, and kept delta
    # versions may resolve through dropped manifests
    resolved, res_stats = {}, {}
    for v in versions:
        resolved[v], res_stats[v], _ = _resolve_files(table_dir, v)
    live: set[str] = set()
    for v in kept:
        live |= set(resolved[v])
    if kept and dropped:
        oldest = kept[0]
        raw = _raw_manifest(table_dir, oldest)
        if "files" not in raw:
            # consolidate: same logical content, now chain-independent.
            # tmp + os.replace is atomic — a concurrent reader sees
            # either the delta (parents still present) or the full form
            consolidated = {
                "mode": raw["mode"],
                "schema": raw["schema"],
                "n_files_added": raw["n_files_added"],
                "files": resolved[oldest],
            }
            if res_stats[oldest]:
                consolidated["stats"] = res_stats[oldest]
            tmp = _manifest_path(table_dir, oldest) + f".tmp.{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(consolidated, f)
            os.replace(tmp, _manifest_path(table_dir, oldest))
    removed: list[str] = []
    for v in dropped:
        for f in resolved[v]:
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
        basis.schema,
        len(new_files),
        files=new_files,
    )


def table_history(spark: SparkSession, table_dir: str) -> DataFrame:
    """DESCRIBE HISTORY for the snapshot log: one row per retained
    version — mode, files added this commit, total live files, and
    whether the manifest is full (checkpoint/overwrite/rollback/
    compact) or a delta. Reads only manifests (KBs of JSON at any
    table size — never the storage listing), and the row count is the
    retention window, so collecting it driver-side is bounded by
    ``vacuum``'s keep_last, not by data volume."""
    from pyspark.sql.types import (
        BooleanType,
        IntegerType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    rows = []
    for v in list_versions(table_dir):
        raw = _raw_manifest(table_dir, v)
        files, stats, _ = _resolve_files(table_dir, v)
        rows.append(
            (
                v,
                raw["mode"],
                int(raw["n_files_added"]),
                len(files),
                "files" in raw,
                len(stats),
            )
        )
    schema = StructType(
        [
            StructField("version", IntegerType(), False),
            StructField("mode", StringType(), False),
            StructField("n_files_added", IntegerType(), False),
            StructField("n_files_live", LongType(), False),
            StructField("is_full_manifest", BooleanType(), False),
            StructField("n_files_with_stats", LongType(), False),
        ]
    )
    return spark.createDataFrame(rows, schema)


def scratch_table_dir(suffix: str) -> str:
    """Per-process scratch table path under a per-uid /tmp root, with
    hygiene: every call sweeps sibling lineages older than a day
    (dead processes' tables) so growth stays bounded no matter which
    snapshot-backed query runs. pid-scoping exists because two
    concurrent PROCESSES must not interleave overwrite/append commits
    on one log (the increment would be ill-defined by design); within
    one process, calls are sequential and versions just accumulate."""
    import shutil
    import tempfile
    import time

    root = os.path.join(
        tempfile.gettempdir(), f"spark_graft_snaptbl_{os.getuid()}"
    )
    tbl = os.path.join(root, f"{os.getpid()}_{suffix}")
    if os.path.isdir(root):
        now = time.time()
        for d in os.listdir(root):
            full = os.path.join(root, d)
            if full == tbl:
                continue
            # a dead owner's tables are garbage NOW, not in a day —
            # a driver/bench session spawning many processes was
            # observed to strand 1000+ dirs (2.3 GB) in hours
            pid_s = d.split("_", 1)[0]
            dead = False
            if pid_s.isdigit() and int(pid_s) != os.getpid():
                try:
                    os.kill(int(pid_s), 0)
                except ProcessLookupError:
                    dead = True
                except OSError:
                    pass
            try:
                if dead or now - os.stat(full).st_mtime > 86_400:
                    shutil.rmtree(full, ignore_errors=True)
            except OSError:
                pass
    return tbl


def _file_may_match(file_stats: dict | None, prune: dict) -> bool:
    """Interval test against a file's manifest stats: drop the file
    only when some pruned column's [min, max] range PROVABLY misses
    [lo, hi]. Missing stats (file committed without stats_cols, column
    unknown, or all-null footer) keep the file — row-level filtering
    downstream guarantees correctness either way; stats only save IO."""
    if not prune:
        return True
    for col, (lo, hi) in prune.items():
        cs = (file_stats or {}).get(col)
        if cs is None:
            continue  # unknown: cannot prove a miss
        try:
            if lo is not None and cs["max"] < lo:
                return False
            if hi is not None and cs["min"] > hi:
                return False
        except TypeError:
            # bound/stat type mismatch (e.g. int bound on a str
            # column): cannot prove a miss — keep the file and let the
            # row-level predicate decide (which will raise its own
            # typed analysis error if the comparison is truly illegal)
            continue
    return True


def snapshot_scan(
    spark: SparkSession,
    table_dir: str,
    version: int | None = None,
    prune: dict | None = None,
) -> DataFrame:
    """Data-skipping read: resolve the manifest, drop every file whose
    stored column stats prove it cannot contain a row in ``prune`` =
    ``{col: (lo, hi)}`` (closed intervals; None = unbounded), scan
    only the survivors, and re-apply the same predicates row-level so
    the result is exact even for kept files that straddle a bound.

    This is the manifest-stats half of lakehouse data skipping: at
    100 TB the decision runs over the manifest (KBs of JSON), not the
    storage listing, and a range query on a range-partitioned commit
    (repartitionByRange before :func:`snapshot_write`) touches only
    the files that can match — the same IO win as partition pruning,
    without a directory layout. SQL NULL semantics note: a row-level
    predicate ``col BETWEEN lo AND hi`` never keeps NULLs, and pruning
    never drops a file for its nulls (null_count is stored but only
    min/max decide), so pruned and unpruned reads agree exactly."""
    snap = read_manifest(table_dir, version)
    stats = snap.stats or {}
    keep = [f for f in snap.files if _file_may_match(stats.get(f), prune)]
    if not keep:
        df = spark.createDataFrame([], _schema_of(snap))
    else:
        df = spark.read.schema(_schema_of(snap)).parquet(
            *[os.path.join(table_dir, f) for f in keep]
        )
    from pyspark.sql import functions as F

    for col, (lo, hi) in (prune or {}).items():
        if lo is not None:
            df = df.where(F.col(col) >= lo)
        if hi is not None:
            df = df.where(F.col(col) <= hi)
    return df


def snapshot_compact(
    spark: SparkSession,
    table_dir: str,
    target_files: int,
    stats_cols: list[str] | None = None,
) -> Snapshot:
    """OPTIMIZE-style bin packing: rewrite the head's content into
    ``target_files`` files and commit it as a new version (mode
    ``compact``) — the small-files answer after many appends. History
    is preserved (the pre-compact version stays time-travelable until
    vacuumed); ``stats_cols`` re-mines the skipping index for the new
    files.

    Concurrency follows the merge rule, not the append rule: the
    compacted content was computed FROM the head read at the start, so
    the commit targets exactly head+1 and raises
    :class:`ConcurrentCommitError` if anything landed in between —
    re-run against the new head (idempotent).

    Change-feed contract: :func:`read_increment` REFUSES across a
    compaction (mode != append), because the file-list diff would
    present every rewritten byte as new data. Delta avoids this with
    dataChange=false commits its readers understand; this log keeps
    the simpler loud-refusal contract — incremental consumers resync
    from a full read after a compaction, and never double-count
    silently."""
    basis = read_manifest(table_dir)
    current = read_snapshot(spark, table_dir, basis.version)
    new_files = _write_data_files(
        current.coalesce(max(1, target_files)), table_dir
    )
    new_stats = (
        _footer_stats(table_dir, new_files, stats_cols)
        if stats_cols
        else {}
    )
    return _try_commit(
        table_dir,
        basis.version + 1,
        "compact",
        basis.schema,
        len(new_files),
        files=new_files,
        stats=new_stats,
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
    history. Checkpoint manifests are transparent here: the diff is
    computed on RESOLVED file lists, so a checkpoint (same logical
    content, consolidated form) adds nothing to the increment.

    Raises if any version in the range was not an append: an overwrite
    or rollback invalidates incremental state, and a consumer MUST
    rebuild rather than silently double-count — the same contract as
    Delta's change-feed 'table was overwritten' error.
    """
    head = read_manifest(table_dir, version)
    base = read_manifest(table_dir, since_version)
    for v in list_versions(table_dir):
        if since_version < v <= head.version:
            mode = (
                head.mode if v == head.version
                else _raw_manifest(table_dir, v)["mode"]
            )
            if mode != "append":
                raise ValueError(
                    f"version {v} is {mode!r}, not append: the "
                    f"increment since v{since_version} is not "
                    "well-defined — rebuild the downstream state from "
                    "a full read instead"
                )
    base_set = set(base.files)
    new = [f for f in head.files if f not in base_set]
    if not new:
        return spark.createDataFrame([], _schema_of(head))
    return spark.read.schema(_schema_of(head)).parquet(
        *[os.path.join(table_dir, f) for f in new]
    )
