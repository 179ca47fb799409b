"""Resilient HTTP ingestion: mirror-sync + snapshot-with-fallback
(reference operators S7-S12, S15, C3).

This is deliberately driver-side Python — ingestion of a dozen upstream
files is control-plane work, not a distributed job (the reference does
the same: notebooks/10_ingest_bls.ipynb has no Spark at all). The
semantics preserved exactly (they are the pipeline's idempotency
contract, reference README.md:64-90):

  * discover upstream files from an HTML directory listing via href
    regexes (10_ingest_bls.ipynb:149-170);
  * per file: new → write; content changed (SHA-256 mismatch) →
    overwrite; same → skip; gone upstream → delete unless protected or
    deletion disabled (10_ingest_bls.ipynb:271-321);
  * run status taxonomy success / partial_success / failed — per-file
    errors are collected and the run continues (:296-306, :325-330);
  * run metadata written in ``finally`` so it fires on failure too:
    append-only ``_meta/runs/<run_id>.json`` + overwritten
    ``_meta/latest.json`` pointer (:334-341);
  * snapshot API ingestion with cached fallback: on request failure,
    proceed with the previous snapshot if one exists (mode
    ``fallback_cached``), hard-fail on first run with no cache
    (11_ingest_population.ipynb:192-221).

Transport is injected (a callable ``fetch(url) -> bytes``) so tests run
with a stub and production uses ``requests`` + urllib3 Retry.
"""

from __future__ import annotations

import hashlib
import json
import re
from collections.abc import Callable, Iterable
from dataclasses import dataclass, field
from datetime import datetime, timezone
from pathlib import Path

Fetch = Callable[[str], bytes]

#: href patterns for HTML directory listings (reference
#: 10_ingest_bls.ipynb:158-163 uses four quoting variants).
HREF_PATTERNS = (
    r'href="([^"]+)"',
    r"href='([^']+)'",
    r"href=([^\s>]+)",
    r'HREF="([^"]+)"',
)


def utc_now_iso() -> str:
    return datetime.now(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")


def mint_run_id(seed: str = "") -> str:
    """UTC stamp + short content hash (10_ingest_bls.ipynb:227-232)."""
    stamp = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    digest = hashlib.sha256(f"{stamp}{seed}".encode()).hexdigest()[:8]
    return f"{stamp}_{digest}"


def sha256_bytes(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()


def list_remote_files(
    listing_html: str, prefix: str = "", patterns: Iterable[str] = HREF_PATTERNS
) -> list[str]:
    """S7: parse file names out of an HTML directory listing. Keeps the
    basename of every href, filtered by ``prefix``, sorted, de-duplicated."""
    names: set[str] = set()
    for pat in patterns:
        for href in re.findall(pat, listing_html):
            base = href.rstrip("/").rsplit("/", 1)[-1]
            if base and not base.startswith(("?", "#")) and "." in base:
                names.add(base)
    return sorted(n for n in names if n.startswith(prefix))


def default_http_fetch(timeout: tuple[int, int] = (30, 60), retries: int = 5) -> Fetch:
    """Production transport: requests.Session with urllib3 Retry
    (total=5, backoff 1.5, on 429/5xx — 10_ingest_bls.ipynb:104-117)."""
    import requests
    from requests.adapters import HTTPAdapter
    from urllib3.util.retry import Retry

    session = requests.Session()
    retry = Retry(
        total=retries,
        backoff_factor=1.5,
        status_forcelist=[429, 500, 502, 503, 504],
        allowed_methods=["GET"],
    )
    adapter = HTTPAdapter(max_retries=retry)
    session.mount("http://", adapter)
    session.mount("https://", adapter)

    def fetch(url: str) -> bytes:
        resp = session.get(url, timeout=timeout)
        resp.raise_for_status()
        return resp.content

    return fetch


@dataclass
class SyncReport:
    run_id: str
    status: str = "success"  # success | partial_success | failed
    uploaded: list[str] = field(default_factory=list)
    updated: list[str] = field(default_factory=list)
    skipped: list[str] = field(default_factory=list)
    deleted: list[str] = field(default_factory=list)
    errors: dict[str, str] = field(default_factory=dict)

    def to_dict(self) -> dict:
        return {
            "run_id": self.run_id,
            "run_utc": utc_now_iso(),
            "status": self.status,
            "uploaded": self.uploaded,
            "updated": self.updated,
            "skipped": self.skipped,
            "deleted": self.deleted,
            "errors": self.errors,
        }


def mirror_sync(
    base_url: str,
    target_dir: str | Path,
    fetch: Fetch,
    file_prefix: str = "",
    protected_files: frozenset[str] = frozenset(),
    enable_delete: bool = True,
    listing_url: str | None = None,
) -> SyncReport:
    """S10: idempotent content-hash mirror of an HTTP directory.

    Re-running against an unchanged upstream is a no-op
    (Uploaded=0 Updated=0 Skipped=N Deleted=0 — the reference's observed
    idempotency proof, 10_ingest_bls.ipynb:203).
    """
    target = Path(target_dir)
    target.mkdir(parents=True, exist_ok=True)
    report = SyncReport(run_id=mint_run_id(base_url))

    try:
        listing = fetch(listing_url or base_url).decode("utf-8", errors="replace")
        remote_files = list_remote_files(listing, prefix=file_prefix)
    except Exception as exc:  # noqa: BLE001 — run must record failure
        report.status = "failed"
        report.errors["<listing>"] = repr(exc)
        _write_run_meta(target, report)
        return report

    # try/finally so the run record is written even if the sync body
    # fails unexpectedly — the append-only audit trail (S15) must record
    # failed runs too (the reference writes metadata in `finally`,
    # 10_ingest_bls.ipynb:334-341).
    try:
        local_files = {
            p.name
            for p in target.iterdir()
            if p.is_file() and not p.name.startswith("_")
        }

        for name in remote_files:
            try:
                data = fetch(f"{base_url.rstrip('/')}/{name}")
                dest = target / name
                if not dest.exists():
                    dest.write_bytes(data)
                    report.uploaded.append(name)
                elif sha256_bytes(dest.read_bytes()) != sha256_bytes(data):
                    dest.write_bytes(data)
                    report.updated.append(name)
                else:
                    report.skipped.append(name)
            except Exception as exc:  # noqa: BLE001 — collect, continue (C3)
                report.errors[name] = repr(exc)

        # gone-upstream deletion, guarded by toggle + protected set
        if enable_delete:
            for name in sorted(
                local_files - set(remote_files) - set(protected_files)
            ):
                try:
                    (target / name).unlink()
                    report.deleted.append(name)
                except OSError as exc:
                    report.errors[name] = repr(exc)

        if report.errors:
            report.status = "partial_success" if (
                report.uploaded or report.updated or report.skipped
            ) else "failed"
    except Exception as exc:  # noqa: BLE001 — unexpected: record + re-raise
        report.status = "failed"
        report.errors["<sync>"] = repr(exc)
        raise
    finally:
        _write_run_meta(target, report)
    return report


def _write_run_meta(target: Path, report: SyncReport) -> None:
    """S15: append-only per-run file + overwritten latest pointer."""
    meta_dir = target / "_meta" / "runs"
    meta_dir.mkdir(parents=True, exist_ok=True)
    payload = json.dumps(report.to_dict(), indent=2)
    run_path = meta_dir / f"{report.run_id}.json"
    if not run_path.exists():  # append-only: never overwrite a run record
        run_path.write_text(payload)
    (target / "_meta" / "latest.json").write_text(payload)


@dataclass
class SnapshotResult:
    mode: str  # api_success | fallback_cached
    path: Path
    n_bytes: int


def snapshot_with_fallback(
    url: str,
    target_path: str | Path,
    fetch: Fetch,
) -> SnapshotResult:
    """S11+S12: fixed-path latest-snapshot ingestion with cached fallback.

    API success → overwrite the snapshot (mode=api_success). API failure
    with an existing cache → keep serving the cache (mode=fallback_cached).
    API failure with NO cache → raise (first-run correctness, reference
    11_ingest_population.ipynb:216-219).
    """
    target = Path(target_path)
    target.parent.mkdir(parents=True, exist_ok=True)
    try:
        data = fetch(url)
    except Exception as exc:  # noqa: BLE001
        if target.exists():
            return SnapshotResult(
                mode="fallback_cached", path=target, n_bytes=target.stat().st_size
            )
        raise RuntimeError(
            f"snapshot fetch failed and no cached copy exists at {target}: {exc!r}"
        ) from exc
    target.write_bytes(data)
    return SnapshotResult(mode="api_success", path=target, n_bytes=len(data))
