"""Foreign Hudi METADATA TABLE — the ``files`` partition (r10).

Hudi 0.14+ tables ship an internal MoR table at ``.hoodie/metadata``
whose ``files`` partition replaces directory listings: one
``HoodieMetadataRecord`` per data partition (record key = the partition
path, ``.`` for unpartitioned) maps file name -> ``{size, isDeleted}``,
plus a ``__all_partitions__`` record enumerating partitions. Hudi
writers fold every commit's adds/removes into it through deltacommit
log blocks, so reading it is O(partitions + live files) metadata IO —
the point at 100 TB, where a recursive directory walk over millions of
files is the slow path this partition exists to delete.

This reader decodes the LOG-file slices of the ``files`` partition
(plain HoodieLogFormat Avro data blocks — ``hoodie_log.parse_log_blob``
decodes them generically off the SCHEMA header) and merges records with
Hudi's payload rule (later block wins per file; ``isDeleted`` removes).
Block validity filters on the metadata table's OWN timeline, exactly
like any MoR read. HFile-COMPACTED base files (the metadata table's
default compaction format — an HBase codec this engine does not speak)
return ``None`` so callers FALL BACK to timeline replay / listing;
young-to-moderately-aged metadata tables are log-only and serve fully.

Used by ``hoodie_timeline.latest_file_slices_rt``: when the active
timeline is ARCHIVED (write stats gone), the below-horizon slice
discovery prefers this listing over the recursive directory walk —
pinned in ``tests/test_hoodie_metadata.py``.

Reference anchor: the ``.hoodie`` internals the showcase's MoR
demonstration relies on (reference README.md:556-1154); layout per the
public Hudi metadata table spec (RFC-15, hudi-common
HoodieTableMetadata / HoodieMetadataPayload).
"""

from __future__ import annotations

from hudi_and_delta_showcase_spark.tables import fsio

#: record key of the partition-list record in the files partition
ALL_PARTITIONS_KEY = "__all_partitions__"
#: Hudi's placeholder partition path for unpartitioned tables
NON_PARTITIONED = "."


def _metadata_root(table_path: str) -> str:
    return fsio.join(table_path, ".hoodie", "metadata")


def _completed_metadata_instants(md_root: str) -> frozenset[str] | None:
    """Completed instants of the metadata table's own timeline (its
    ``.hoodie``); None when the timeline directory is missing (not a
    metadata table)."""
    md_hoodie = fsio.join(md_root, ".hoodie")
    if not fsio.isdir(md_hoodie):
        return None
    out = set()
    for d in (md_hoodie, fsio.join(md_hoodie, "timeline")):
        if not fsio.isdir(d):
            continue
        for fn in fsio.listdir(d):
            parts = fn.split(".")
            # completed instants only: <instant>.deltacommit / .commit
            # (requested/inflight have a third suffix)
            if len(parts) == 2 and parts[1] in ("deltacommit", "commit"):
                out.add(parts[0].split("_")[0])
    return frozenset(out)


def read_hoodie_metadata_files(
    table_path: str,
) -> dict[str, dict[str, int]] | None:
    """``.hoodie/metadata/files`` -> ``{partition: {file name: size}}``
    ('' keys unpartitioned), or None when the caller must fall back to
    timeline replay / listing: no metadata table, an HFile-compacted
    files partition, or anything else this reader cannot prove it
    decoded correctly. Never guesses."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    files_dir = fsio.join(_metadata_root(table_path), "files")
    if not fsio.isdir(files_dir):
        return None
    valid = _completed_metadata_instants(_metadata_root(table_path))
    if not valid:
        return None
    logs: list[tuple[str, int, str]] = []  # (base_instant, version, path)
    for fn in sorted(fsio.listdir(files_dir)):
        info = hl.parse_log_file_name(fn)
        if info is not None:
            logs.append(
                (info["base_instant"], info["version"],
                 fsio.join(files_dir, fn))
            )
            continue
        if fn.endswith((".hfile", ".parquet", ".orc")):
            # the files partition COMPACTED to a base file — HFile is
            # its default compaction format, an HBase codec beyond
            # this reader — fall back to replay/listing, never guess
            return None
        # .hoodie_partition_metadata and other markers are inert
    if not logs:
        return None
    state: dict[str, dict[str, int]] = {}
    for _bi, _v, full in sorted(logs):
        blob = fsio.read_bytes(full)
        for instant, records, dels in hl.resolve_log_blocks(
            [blob], valid_instants=valid
        ):
            del instant
            for d in dels:
                # a tombstoned metadata record drops its whole
                # partition entry (cleaner semantics)
                key = d.get("recordKey")
                state.pop("" if key == NON_PARTITIONED else key, None)
            for rec in records:
                key = rec.get("key")
                fsmeta = rec.get("filesystemMetadata")
                if key is None or key == ALL_PARTITIONS_KEY or not fsmeta:
                    continue
                part = "" if key == NON_PARTITIONED else key
                bucket = state.setdefault(part, {})
                # HoodieMetadataPayload merge: later wins per file,
                # isDeleted removes
                for name, inf in fsmeta.items():
                    if inf.get("isDeleted"):
                        bucket.pop(name, None)
                    else:
                        bucket[name] = int(inf.get("size") or 0)
    return state


def list_data_files(table_path: str) -> list[str] | None:
    """Flatten the files-partition state to table-relative data file
    paths (the listing ``_archived_file_slices`` would otherwise walk
    for); None -> fall back."""
    state = read_hoodie_metadata_files(table_path)
    if state is None:
        return None
    out: list[str] = []
    for part, files in state.items():
        for name in files:
            out.append(f"{part}/{name}" if part else name)
    return sorted(out)
