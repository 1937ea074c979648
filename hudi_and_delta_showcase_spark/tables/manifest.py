"""Commit-log manifests: the engine's MVCC substrate (SURVEY.md C7).

Plays the role of Hudi's ``.hoodie`` timeline / Delta's ``_delta_log``
(/root/reference/README.md:334,1235): every commit is a JSON file listing
the table's live base files and log files after that commit, giving
snapshot isolation + time travel ("the delta log has information regarding
the schema and the latest files after each commit", README.md:1235).

Design: each commit stores the FULL live-file list (simplest correct
snapshot resolution — newest manifest wins; no log replay). Scale note:
at 100 TB / millions of files you'd switch to Delta-style incremental
actions + periodic checkpoints so a commit is O(delta) not O(files);
the API here (``latest``/``read``/``append``) is unchanged by that swap.

Atomicity: manifests are written to a temp name then ``os.replace``d —
atomic on POSIX — so readers never see a torn commit. Single-writer is
assumed (the reference's ingest loop is single-writer too); optimistic
concurrency would add a version-exists check on rename.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import asdict, dataclass, field


@dataclass
class Commit:
    version: int
    action: str  # insert|upsert|delete|compact|optimize|overwrite|restore
    commit_time: str  # Hudi-style yyyyMMddHHmmssSSS (README.md:470)
    files: list[str] = field(default_factory=list)  # live base files (relative)
    log_files: list[str] = field(default_factory=list)  # MoR log files (relative)
    stats: dict = field(default_factory=dict)
    #: per-file [min, max] of ``_hoodie_record_key`` (parquet footer
    #: stats) — the key-level file-skipping index (Hudi BLOOM/SIMPLE
    #: index's range pruning tier). Absent entries mean "unknown range"
    #: and are treated as always-matching (conservative rewrite).
    key_ranges: dict = field(default_factory=dict)
    #: per-file {column: [min, max]} for scalar data columns — the
    #: column-stats index behind ``read_where`` data skipping (Delta
    #: stats / Hudi col-stats-index role). Same conservative contract.
    col_stats: dict = field(default_factory=dict)
    #: per-file key bloom bitmaps (base64) — the third skipping tier
    #: (Hudi BLOOM index), built only for tables created with
    #: ``bloom_index=True``. Prunes candidate files even when key
    #: ranges fully overlap (unclustered tables). Absent entries are
    #: conservatively treated as hits.
    key_blooms: dict = field(default_factory=dict)
    #: change-data-feed sidecar files for THIS commit (Delta CDF change
    #: files / Hudi CDC supplemental log) — post-images + change types,
    #: O(changes) extra write IO, written only when the table has
    #: ``cdc_enabled``. Empty for file re-org commits.
    cdc_files: list[str] = field(default_factory=list)
    #: deletion-vector sidecar files (Delta deletion vectors / Iceberg
    #: position deletes): parquet rows ``(file_name, pos)`` — table-
    #: relative file path + row position — marking rows of live base
    #: files as deleted WITHOUT rewriting them. Cumulative — the full DV
    #: set as of this commit; readers anti-join it against the scan's
    #: native (relative ``_metadata.file_path``, ``row_index``). Reset
    #: to empty by file-rewriting commits (compact/optimize), which
    #: materialize the deletes.
    dv_files: list[str] = field(default_factory=list)
    #: idempotent-writer watermarks (Delta SetTransaction /
    #: ``txnAppId``+``txnVersion``): app id -> highest transaction
    #: version already applied. Carried cumulatively on every commit so
    #: a streaming writer replaying a micro-batch after a crash (commit
    #: landed, checkpoint didn't) sees its own watermark IN the same
    #: atomic record and skips — exactly-once at the commit level.
    txn: dict = field(default_factory=dict)
    #: column mapping (Delta ``delta.columnMapping.mode=name``):
    #: physical (on-disk) column name -> current logical name, only
    #: where they differ. RENAME COLUMN is a metadata-only commit that
    #: updates this map — zero files rewritten — and because the map
    #: lives in the commit record, time travel to a pre-rename version
    #: sees the old name. Reads rename physical->logical at the public
    #: boundary; writes rename logical->physical on entry.
    column_mapping: dict = field(default_factory=dict)


def commits_dir(table_path: str) -> str:
    return os.path.join(table_path, "_commits")


_last_instant_ms = [0]


def make_commit_time() -> str:
    """Wall-clock ms formatted like a Hudi instant time — STRICTLY
    monotonic within this writer process: rapid successive commits may
    land in the same millisecond, and commit-order resolution (MoR `_rt`
    merge) must never depend on a clock tie."""
    t_ms = int(time.time() * 1000)
    if t_ms <= _last_instant_ms[0]:
        t_ms = _last_instant_ms[0] + 1
    _last_instant_ms[0] = t_ms
    return (
        time.strftime("%Y%m%d%H%M%S", time.gmtime(t_ms / 1000))
        + f"{t_ms % 1000:03d}"
    )


def list_versions(table_path: str) -> list[int]:
    d = commits_dir(table_path)
    if not os.path.isdir(d):
        return []
    return sorted(
        int(f.split(".")[0]) for f in os.listdir(d) if f.endswith(".json")
    )


def read_commit(table_path: str, version: int) -> Commit:
    with open(os.path.join(commits_dir(table_path), f"{version:08d}.json")) as fh:
        return Commit(**json.load(fh))


def latest_commit(table_path: str) -> Commit | None:
    versions = list_versions(table_path)
    return read_commit(table_path, versions[-1]) if versions else None


def append_commit(table_path: str, commit: Commit) -> None:
    d = commits_dir(table_path)
    os.makedirs(d, exist_ok=True)
    final = os.path.join(d, f"{commit.version:08d}.json")
    if os.path.exists(final):
        raise RuntimeError(
            f"concurrent write detected: commit {commit.version} already exists"
        )
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(asdict(commit), fh, indent=1)
    os.replace(tmp, final)
