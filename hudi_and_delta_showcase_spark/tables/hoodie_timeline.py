"""Hudi ``.hoodie`` timeline on-disk compatibility (SURVEY.md §2.1 S2,
§2.9 C7).

The reference's Hudi tables live as parquet base files + a ``.hoodie/``
timeline directory (/root/reference/README.md:334 shows the layout;
format documented in the public Apache Hudi spec/docs). The
hudi-spark-bundle jar is absent from this environment, so this module
speaks the PUBLIC on-disk layout directly:

* ``write_hoodie_table`` — parquet base files named with Hudi's
  file-group convention ``<fileId>_<writeToken>_<instantTime>.parquet``,
  per-partition ``.hoodie_partition_metadata``, ``hoodie.properties``,
  and the three-phase instant state machine on the timeline:
  ``<instant>.commit.requested`` → ``<instant>.inflight`` →
  ``<instant>.commit`` (completed, holding HoodieCommitMetadata JSON
  with ``partitionToWriteStats``).
* ``read_hoodie_table`` — timeline replay: list COMPLETED commit
  instants up to the requested one, resolve the latest file slice per
  file group (max instantTime per fileId), then issue a plain
  declarative parquet scan — an in-flight or failed write is invisible
  to readers, which is exactly Hudi's snapshot-isolation contract.

Scope: Copy-on-Write semantics (insert / append / overwrite). MoR log
files are a separate binary block format (HoodieLogFile); this engine's
MoR implementation uses parquet log files through ``LakehouseTable``
instead, which the reference's semantics tests cover.

Scale notes: timeline replay is O(instants) tiny files on the driver
(real Hudi archives old instants past ``hoodie.keep.max.commits``);
data stays executor-side — the snapshot is a file list handed to the
parquet source, so predicate pushdown / pruning work as on any parquet
scan.
"""

from __future__ import annotations

import json
import posixpath
import re
import uuid

from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables import manifest as mf

#: Hudi's default partition path for unpartitioned tables.
NON_PARTITIONED = ""


def _hoodie_dir(path: str) -> str:
    return fsio.join(path, ".hoodie")


def _write_properties(path: str, name: str, table_version: int = 6) -> None:
    props = {
        "hoodie.table.name": name,
        "hoodie.table.type": "COPY_ON_WRITE",
        "hoodie.table.version": str(table_version),
        # layout 1 = pre-1.0 flat .hoodie/; layout 2 = 1.x's
        # .hoodie/timeline/ with requested_completion instant names
        "hoodie.timeline.layout.version": (
            "2" if table_version >= 8 else "1"
        ),
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.populate.meta.fields": "false",
    }
    fsio.write_atomic(
        fsio.join(_hoodie_dir(path), "hoodie.properties"),
        "#Updated at instant creation\n"
        + "".join(f"{k}={v}\n" for k, v in props.items()),
    )


#: Hudi 1.x completed-instant stem: requestedTime_completionTime
_V8_STEM_RE = re.compile(r"^(\d{14,17})_(\d{14,17})$")


def _timeline_dir(path: str) -> str:
    """Where the instant files live: ``.hoodie/`` for table versions
    <= 6, ``.hoodie/timeline/`` for Hudi 1.x (table version 8) — the
    layout change every 1.x-written table carries (r8)."""
    td = fsio.join(_hoodie_dir(path), "timeline")
    return td if fsio.isdir(td) else _hoodie_dir(path)


def _completed_instant_files(path: str) -> dict[tuple[str, str], str]:
    """(instant, kind) -> instant file NAME, across BOTH timeline
    layouts: pre-1.0 ``<instant>.<action>`` and 1.x
    ``<requested>_<completion>.<action>`` (the instant is the
    requested time, Hudi's 1.x convention)."""
    d = _timeline_dir(path)
    out: dict[tuple[str, str], str] = {}
    if not fsio.isdir(d):
        return out
    for f in fsio.listdir(d):
        for kind in ("commit", "deltacommit", "replacecommit"):
            suf = "." + kind
            if not f.endswith(suf):
                continue
            stem = f[: -len(suf)]
            if stem.isdigit():
                out[(stem, kind)] = f
            else:
                m = _V8_STEM_RE.match(stem)
                if m:
                    out[(m.group(1), kind)] = f
    return out


def _read_instant_meta(path: str, instant: str, kind: str) -> dict:
    name = _completed_instant_files(path)[(instant, kind)]
    return json.loads(fsio.read_text(fsio.join(_timeline_dir(path), name)))


def list_instants(path: str, state: str = "commit") -> list[str]:
    """Completed (or requested/inflight) instant times, sorted."""
    if state in ("commit", "deltacommit", "replacecommit"):
        return sorted(
            i for (i, k) in _completed_instant_files(path) if k == state
        )
    d = _timeline_dir(path)
    if not fsio.isdir(d):
        return []
    suffix = {
        "inflight": ".inflight",
        "requested": ".commit.requested",
    }[state]
    out = []
    for f in fsio.listdir(d):
        if f.endswith(suffix):
            stem = f[: -len(suffix)]
            if stem.isdigit():
                out.append(stem)
    return sorted(out)


def _completed_instants(path: str) -> list[tuple[str, str]]:
    """All COMPLETED instants (commit + deltacommit + replacecommit —
    clustering/insert-overwrite land as the third kind on foreign
    timelines, r8), time-sorted, as ``(instant, kind)``."""
    return sorted(
        [(i, "commit") for i in list_instants(path, "commit")]
        + [(i, "deltacommit") for i in list_instants(path, "deltacommit")]
        + [
            (i, "replacecommit")
            for i in list_instants(path, "replacecommit")
        ]
    )


def write_hoodie_table(
    df: DataFrame,
    path: str,
    mode: str = "append",
    table_name: str | None = None,
) -> str:
    """Commit ``df`` to a Hudi-layout CoW table at ``path``; returns the
    instant time. ``mode``: 'append' adds new file groups; 'overwrite'
    replaces the whole snapshot (previous file groups simply stop being
    the latest — real Hudi records this as a replacecommit; readers here
    resolve it identically because overwrite rewrites every file group).

    The instant transitions requested → inflight → completed on the
    timeline, so a crash mid-write leaves only non-completed instant
    files and staged data that no reader will ever include."""
    fsio.makedirs(_hoodie_dir(path))
    if not fsio.exists(fsio.join(_hoodie_dir(path), "hoodie.properties")):
        _write_properties(path, table_name or posixpath.basename(path.rstrip("/")))
    instant = mf.make_commit_time()

    # instant state machine: requested -> inflight -> completed
    req = fsio.join(_hoodie_dir(path), f"{instant}.commit.requested")
    fsio.write_atomic(req, "")
    inflight = fsio.join(_hoodie_dir(path), f"{instant}.inflight")
    fsio.write_atomic(inflight, "")

    if mode == "overwrite":
        prev = list_instants(path)
        replaced = _latest_file_slices(path, prev[-1]) if prev else {}
    elif mode != "append":
        raise ValueError(f"unsupported mode: {mode}")

    # stage parquet, rename into Hudi's file-group naming convention
    staging = fsio.join(path, f".staging-{uuid.uuid4().hex[:8]}")
    df.write.parquet(staging)
    write_stats = []
    for fn in sorted(fsio.listdir(staging)):
        if not fn.endswith(".parquet"):
            continue
        file_id = str(uuid.uuid4())
        new_name = f"{file_id}_0-1-0_{instant}.parquet"
        dst = fsio.join(path, new_name)
        fsio.move(fsio.join(staging, fn), dst)
        write_stats.append(
            {
                "fileId": file_id,
                "path": new_name,
                "prevCommit": "null",
                "numWrites": -1,
                "numInserts": -1,
                "fileSizeInBytes": fsio.file_size(dst),
            }
        )
    fsio.rmtree(staging)

    pmeta = fsio.join(path, ".hoodie_partition_metadata")
    if not fsio.exists(pmeta):
        fsio.write_atomic(
            pmeta,
            "#partition metadata\n"
            f"commitTime={instant}\npartitionDepth=0\n",
        )

    commit_meta = {
        "partitionToWriteStats": {NON_PARTITIONED: write_stats},
        "compacted": False,
        "extraMetadata": {},
        "operationType": "INSERT" if mode == "append" else "INSERT_OVERWRITE",
    }
    if mode == "overwrite":
        commit_meta["extraMetadata"]["replacedFileIds"] = sorted(replaced)
    # completed-instant write is atomic: tmp + rename, like the manifest
    final = fsio.join(_hoodie_dir(path), f"{instant}.commit")
    fsio.write_atomic(final, json.dumps(commit_meta, indent=2))
    fsio.remove(inflight)
    fsio.remove(req)
    return instant


def _latest_file_slices(
    path: str, as_of_instant: str | None = None
) -> dict[str, str]:
    """fileId -> path of the latest completed file slice <= as_of.
    Overwrite commits reset the group set: only file groups written at
    or after the newest INSERT_OVERWRITE instant are live."""
    instants = _completed_instants(path)
    if as_of_instant is not None:
        instants = [(i, k) for i, k in instants if i <= as_of_instant]
    slices: dict[str, tuple[str, str]] = {}
    barrier = ""
    for instant, kind in instants:
        meta = _read_instant_meta(path, instant, kind)
        if meta.get("operationType") == "INSERT_OVERWRITE":
            slices.clear()
            barrier = instant
        else:
            # Hudi replacecommit semantics: this instant replaces the
            # listed file groups (clustering / partial rewrites) —
            # both the engine's extraMetadata marker and the real
            # HoodieReplaceCommitMetadata top-level field (r8)
            for fid in (
                meta.get("extraMetadata", {}).get("replacedFileIds") or []
            ):
                slices.pop(fid, None)
            for fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).values():
                for fid in fids:
                    slices.pop(fid, None)
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                fid, p = st["fileId"], st["path"]
                if instant >= barrier and (
                    fid not in slices or instant > slices[fid][0]
                ):
                    slices[fid] = (instant, p)
    return {fid: p for fid, (_, p) in slices.items()}


def _col_stats_pruning(
    path: str, predicate
) -> tuple[list[tuple], dict, bool, tuple | None]:
    """Shared predicate plumbing for the foreign Hudi read paths (r10):
    normalized ``(col, op, value)`` conjuncts, the metadata table's
    ``column_stats`` state ({} when absent/compacted — scan unpruned,
    never guess), and whether hive-style PARTITION-PATH pruning is
    trustworthy (identity key generator declared in
    ``hoodie.properties`` — the common real-table case, where the
    opt-in col-stats index is usually absent but ``col=value`` paths
    prune for free). Stats are per immutable file, so they prune
    time-travel reads just as safely: a file absent from the current
    stats simply scans conservatively."""
    from hudi_and_delta_showcase_spark.tables import hoodie_metadata as hm
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _normalize_predicate,
    )

    conjuncts = _normalize_predicate(predicate) if predicate else []
    stats: dict = {}
    hive_ok = False
    ts_pruner = None
    if conjuncts:
        stats = hm.read_hoodie_metadata_col_stats(
            path, columns={c for c, _op, _v in conjuncts}
        ) or {}
        props = read_properties(path)
        hive_ok = hm.hive_path_pruning_ok(props)
        # r11: timestamp-keygen date-tree layouts prune too
        ts_pruner = hm.timestamp_path_pruner(props)
    return conjuncts, stats, hive_ok, ts_pruner


def read_hoodie_table(
    spark: SparkSession,
    path: str,
    as_of_instant: str | None = None,
    predicate: list[tuple] | None = None,
) -> DataFrame:
    """S2/C7: snapshot (or time-travel) scan of a ``.hoodie``-layout
    table — timeline replay on the driver, declarative parquet scan of
    the latest file slices. Only COMPLETED instants are visible. For a
    MoR timeline this is the READ-OPTIMIZED view (base files only —
    Hudi's ``_ro``); ``read_hoodie_table_rt`` folds the log blocks.

    ``predicate`` (r10) is a list of ``(column, op, value)`` conjuncts
    (op in ``=,<,<=,>,>=,in``) served the way Hudi's col-stats index
    serves data skipping: base files whose
    ``.hoodie/metadata/column_stats`` entry PROVES the predicate cannot
    match are pruned before the scan — a filtered 100 TB foreign table
    reads O(matching files) — then the exact filters land on the
    surviving scan for parquet row-group skipping. Files without
    usable stats scan conservatively."""
    from hudi_and_delta_showcase_spark.tables import hoodie_metadata as hm
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _predicate_filter,
    )

    slices = latest_file_slices_rt(path, as_of_instant)
    files = sorted(
        s["base"] for s in slices.values() if s["base"]
    )
    if not files:
        raise FileNotFoundError(f"no completed commits under {path}")
    conjuncts, stats, hive_ok, ts_pruner = _col_stats_pruning(
        path, predicate
    )
    kept = files
    if conjuncts and (stats or hive_ok or ts_pruner):
        kept = [
            f for f in files
            if not hm.file_provably_disjoint(
                f, stats, conjuncts, hive_ok, ts_pruner
            )
        ]
    if not kept:
        # every file provably disjoint: schema-stable empty result off
        # one footer read
        df = spark.read.parquet(fsio.join(path, files[0]))
        import pyspark.sql.functions as F

        return _predicate_filter(df.where(F.lit(False)), conjuncts)
    df = spark.read.parquet(*[fsio.join(path, f) for f in kept])
    if conjuncts:
        df = _predicate_filter(df, conjuncts)
    return df


def read_hoodie_incremental(
    spark: SparkSession,
    path: str,
    begin_instant: str,
    end_instant: str | None = None,
) -> DataFrame:
    """Hudi INCREMENTAL QUERY on a foreign ``.hoodie`` timeline
    (``hoodie.datasource.query.type=incremental`` with
    ``begin.instanttime`` exclusive / ``end.instanttime`` inclusive,
    r7): scan ONLY the base files committed in the instant range and
    keep rows whose ``_hoodie_commit_time`` falls inside it — rows
    carried forward by a rewrite keep their original stamp and are
    excluded, exactly Hudi's contract. Files without stored meta
    columns derive the stamp from the file-group naming convention
    (``<fileId>_<writeToken>_<instant>.parquet``), and — r8, closing
    the r7-advice gap — files matching NEITHER (this engine's own
    ``export_hoodie_timeline`` keeps ``part-*.parquet`` names) take
    the instant of the commit whose write stats introduced them,
    joined per file from the timeline replay already in hand; no row
    can end up with an empty stamp and silently vanish. O(changed
    files) IO, the pull that makes a foreign Hudi table a medallion
    source.

    Scope: BASE-FILE commits (CoW tables, and MoR compaction commits).
    A MoR deltacommit's log-borne changes have no per-row commit stamp
    until compaction folds them — pull after compaction, or serve the
    current state via ``read_hoodie_table_rt`` (the same bound Hudi's
    own incremental RO view has)."""
    import pyspark.sql.functions as F

    instants = _completed_instants(path)
    if not instants:
        raise FileNotFoundError(f"no completed commits under {path}")
    end = end_instant if end_instant is not None else instants[-1][0]
    file_instant: dict[str, str] = {}  # rel path -> introducing instant
    for instant, kind in instants:
        if not (begin_instant < instant <= end):
            continue
        meta = _read_instant_meta(path, instant, kind)
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                if st["path"].endswith(".parquet"):
                    file_instant[st["path"]] = instant
    if not file_instant:
        raise ValueError(
            f"no commits in instant range ({begin_instant}, {end}]"
        )
    df = spark.read.parquet(
        *[fsio.join(path, f) for f in sorted(file_instant)]
    )
    # commit-derived stamp: one tiny broadcast map (basename ->
    # introducing instant; basenames are unique under Hudi's uuid
    # file-group naming AND the engine's part-uuid export naming)
    fmap = spark.createDataFrame(
        spark.sparkContext.parallelize(
            sorted(
                (f.rsplit("/", 1)[-1], i)
                for f, i in file_instant.items()
            ),
            1,
        ),
        "__f string, __fi string",
    )
    name_instant = F.regexp_extract(
        F.col("_metadata.file_name"), r"_\d+-\d+-\d+_(\d{14,17})\.parquet$", 1
    )
    df = df.join(
        F.broadcast(fmap),
        F.col("_metadata.file_name") == F.col("__f"),
        "left",
    ).drop("__f")
    # a stamp is only trusted when it names an instant of THIS
    # timeline: stored meta columns written under a DIFFERENT commit
    # coordinate system (an engine table exported via
    # export_hoodie_timeline keeps its lakehouse commit times) would
    # otherwise fail the range filter for every row. Hudi archives old
    # instants, so on a long archived foreign timeline carried-forward
    # rows in rewritten files fall back to the commit-derived stamp —
    # the same rows-as-of-file-commit bound Hudi's own archived
    # incremental reads have.
    all_instants = [i for i, _k in instants]
    valid = lambda c: F.when(c.isin(all_instants), c)  # noqa: E731
    parts = [
        valid(F.when(name_instant == "", F.lit(None)).otherwise(name_instant)),
        F.col("__fi"),
    ]
    if "_hoodie_commit_time" in df.columns:
        parts.insert(0, valid(F.col("_hoodie_commit_time")))
    return (
        df.withColumn("__hc", F.coalesce(*parts))
        .filter((F.col("__hc") > begin_instant) & (F.col("__hc") <= end))
        .drop("__hc", "__fi")
    )


_BASE_FILE_RE = re.compile(
    r"^(?P<fid>.+)_\d+-\d+-\d+_(?P<instant>\d{14,17})\.parquet$"
)


def _archived_file_slices(
    path: str, horizon: str
) -> tuple[dict[str, tuple[str, str]], dict[str, list]]:
    """Slice discovery BELOW the active timeline's horizon, by LISTING
    (r8): Hudi ARCHIVES old instants out of ``.hoodie`` (default after
    ~30 commits), taking their write stats with them — replaying only
    the active timeline silently drops every file group last written
    before the horizon, which is the NORMAL state of any long-lived
    table. Hudi's own readers fall back to file listing there, under
    the same rule this uses: a file-group-named file whose instant
    precedes the EARLIEST active instant is definitionally committed
    (failed writes are rolled back before their instant can archive,
    and slices replaced by an archived replacecommit are CLEANED
    before it may archive — Hudi's archiver-after-cleaner ordering —
    so listing cannot resurrect them).
    Returns seed (bases, logs) keyed by fileId; the active-timeline
    replay then layers newer slices, overwrite barriers, and
    replacecommits on top. Only invoked when ``.hoodie/archived/`` is
    non-empty, so unarchived tables pay nothing. The listing PREFERS
    the table's own metadata table (``.hoodie/metadata/files``, r10 —
    O(partitions + live files) metadata IO, the reason the partition
    exists) and falls back to the O(data files) recursive walk —
    exactly what any Hudi reader without the metadata table does."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl
    from hudi_and_delta_showcase_spark.tables import hoodie_metadata

    bases: dict[str, tuple[str, str]] = {}
    logs: dict[str, list] = {}
    listing = hoodie_metadata.list_data_files(path)
    if listing is None:
        listing = [
            fsio.relpath(full, path) for full in fsio.walk_files(path)
        ]
    for rel in listing:
        if rel.startswith(".hoodie/") or rel.startswith(".staging"):
            continue
        name = rel.rsplit("/", 1)[-1]
        m = _BASE_FILE_RE.match(name)
        if m and m.group("instant") <= horizon:
            fid, inst = m.group("fid"), m.group("instant")
            if fid not in bases or inst > bases[fid][0]:
                bases[fid] = (inst, rel)
            continue
        info = hl.parse_log_file_name(name)
        if info is not None and info["base_instant"] <= horizon:
            logs.setdefault(info["file_id"], []).append(
                (info["base_instant"], info["version"], rel)
            )
    return bases, logs


def latest_file_slices_rt(
    path: str, as_of_instant: str | None = None
) -> dict[str, dict]:
    """MoR-aware slice resolution: fileId -> ``{"base", "base_instant",
    "logs"}``. Base files come from commit/deltacommit write stats
    exactly as ``_latest_file_slices``; ``.log`` write stats attach to
    the slice whose base instant matches the ``baseInstant`` embedded
    in their name — after a compaction writes a newer base, stale logs
    stop attaching, Hudi's exact slice rule. On ARCHIVED timelines
    (``.hoodie/archived/`` non-empty) slices older than the earliest
    active instant are discovered by listing first
    (``_archived_file_slices``)."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    all_instants = _completed_instants(path)
    instants = all_instants
    if as_of_instant is not None:
        instants = [(i, k) for i, k in instants if i <= as_of_instant]
    bases: dict[str, tuple[str, str]] = {}  # fid -> (instant, path)
    logs: dict[str, list[tuple[str, int, str]]] = {}
    # pre-1.0 archives to .hoodie/archived/; 1.x to the LSM tree at
    # .hoodie/timeline/history/
    archived = any(
        fsio.isdir(d) and any(fsio.listdir(d))
        for d in (
            fsio.join(_hoodie_dir(path), "archived"),
            fsio.join(_hoodie_dir(path), "timeline", "history"),
        )
    )
    if all_instants and archived:
        horizon = all_instants[0][0]
        if as_of_instant is not None:
            horizon = min(horizon, as_of_instant)
        bases, logs = _archived_file_slices(path, horizon)
    barrier = ""
    for instant, kind in instants:
        meta = _read_instant_meta(path, instant, kind)
        if meta.get("operationType") == "INSERT_OVERWRITE":
            bases.clear()
            logs.clear()
            barrier = instant
        else:
            for fid in (
                meta.get("extraMetadata", {}).get("replacedFileIds") or []
            ):
                bases.pop(fid, None)
                logs.pop(fid, None)
            # foreign replacecommit (clustering / insert_overwrite):
            # HoodieReplaceCommitMetadata records the replaced groups
            # top-level, per partition (r8)
            for fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).values():
                for fid in fids:
                    bases.pop(fid, None)
                    logs.pop(fid, None)
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                fid, p = st["fileId"], st["path"]
                info = hl.parse_log_file_name(p)
                if info is not None:
                    logs.setdefault(fid, []).append(
                        (info["base_instant"], info["version"], p)
                    )
                elif instant >= barrier and (
                    fid not in bases or instant > bases[fid][0]
                ):
                    bases[fid] = (instant, p)
    out: dict[str, dict] = {}
    for fid, (b_instant, b_path) in bases.items():
        out[fid] = {
            "base": b_path,
            "base_instant": b_instant,
            "logs": [
                p
                for (bi, _v, p) in sorted(logs.get(fid, []))
                if bi == b_instant
            ],
        }
    # log-only file groups (inserts routed to logs, no base yet)
    for fid, entries in logs.items():
        if fid not in out:
            out[fid] = {
                "base": None,
                "base_instant": None,
                "logs": [p for (_bi, _v, p) in sorted(entries)],
            }
    return out


def _file_versions_rt(
    path: str, as_of: str | None = None
) -> list[tuple[str, str | None, bool, str | None]]:
    """EVERY file version of the table up to ``as_of`` with its
    validity window — ``(relpath, valid_until_instant | None,
    is_log, opened_instant | None)`` — the union over all instants of what
    ``latest_file_slices_rt(path, instant)`` would serve (r12, the
    multi-version source the batched key-only CDC synthesis reads
    ONCE instead of building one snapshot plan per instant).

    Validity mirrors slice resolution exactly: a new BASE file closes
    every open version of its file group at its instant (a CoW
    rewrite/MoR compaction is a complete group replacement — rows
    deleted by the rewrite must not resurrect for later as-ofs);
    ``INSERT_OVERWRITE`` closes everything; replace commits close the
    named groups. Log files never close anything — their rows carry
    per-block instants and supersede by the merge order. Files the
    cleaner already reclaimed are history this listing cannot serve
    (the same retention exposure Hudi's own RFC-51 key-only read
    documents)."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    all_instants = _completed_instants(path)
    instants = all_instants
    if as_of is not None:
        instants = [(i, k) for i, k in instants if i <= as_of]
    versions: list[list] = []  # [relpath, until, is_log, fid, opened]
    open_by_fid: dict[str, list[int]] = {}

    def _close(fid: str, instant: str) -> None:
        for ix in open_by_fid.pop(fid, []):
            versions[ix][1] = instant

    archived = any(
        fsio.isdir(d) and any(fsio.listdir(d))
        for d in (
            fsio.join(_hoodie_dir(path), "archived"),
            fsio.join(_hoodie_dir(path), "timeline", "history"),
        )
    )
    if all_instants and archived:
        horizon = all_instants[0][0]
        if as_of is not None:
            horizon = min(horizon, as_of)
        a_bases, a_logs = _archived_file_slices(path, horizon)
        for fid, (bi, p) in a_bases.items():
            open_by_fid.setdefault(fid, []).append(len(versions))
            versions.append([p, None, False, fid, bi])
        for fid, entries in a_logs.items():
            for bi, _v, p in sorted(entries):
                open_by_fid.setdefault(fid, []).append(len(versions))
                versions.append([p, None, True, fid, bi])
    for instant, kind in instants:
        meta = _read_instant_meta(path, instant, kind)
        if meta.get("operationType") == "INSERT_OVERWRITE":
            for fid in list(open_by_fid):
                _close(fid, instant)
        else:
            for fid in (
                meta.get("extraMetadata", {}).get("replacedFileIds") or []
            ):
                _close(fid, instant)
            for fids in (
                meta.get("partitionToReplaceFileIds") or {}
            ).values():
                for fid in fids:
                    _close(fid, instant)
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                fid, p = st["fileId"], st["path"]
                is_log = hl.parse_log_file_name(p) is not None
                if not is_log:
                    # a new base supersedes the group's open history
                    _close(fid, instant)
                open_by_fid.setdefault(fid, []).append(len(versions))
                versions.append([p, None, is_log, fid, instant])
    return [
        (p, until, is_log, opened)
        for p, until, is_log, _fid, opened in versions
    ]


def hoodie_timeline_table(spark: SparkSession, path: str) -> DataFrame:
    """Hudi's ``show commits`` / ``.hoodie`` timeline as a DataFrame
    (r10 — the inspection sibling of ``read_delta_history`` and
    ``iceberg_metadata_table``): one row per COMPLETED instant with its
    kind, operation type, and write-stats tallies (files touched,
    records written where the writer recorded them, bytes) — the
    instant metadata the replay already parses, O(instants)
    driver-side, no data IO."""
    instants = _completed_instants(path)
    if not instants:
        raise FileNotFoundError(f"no completed commits under {path}")
    rows = []
    for instant, kind in instants:
        meta = _read_instant_meta(path, instant, kind)
        n_files = n_writes = n_bytes = 0
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                n_files += 1
                w = st.get("numWrites")
                if w is not None and w >= 0:
                    n_writes += int(w)
                n_bytes += int(st.get("fileSizeInBytes") or 0)
        replaced = len(
            meta.get("extraMetadata", {}).get("replacedFileIds") or []
        ) + sum(
            len(v)
            for v in (meta.get("partitionToReplaceFileIds") or {}).values()
        )
        rows.append((
            instant, kind, meta.get("operationType"),
            n_files, n_writes, n_bytes, replaced,
        ))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "instant string, action string, operation_type string, "
        "num_write_files int, num_writes long, total_bytes long, "
        "num_replaced_file_groups int",
    )


def read_properties(path: str) -> dict[str, str]:
    props_file = fsio.join(_hoodie_dir(path), "hoodie.properties")
    props: dict[str, str] = {}
    if fsio.exists(props_file):
        for line in fsio.read_text(props_file).splitlines():
            line = line.strip()
            if line and not line.startswith("#") and "=" in line:
                k, _, v = line.partition("=")
                props[k] = v
    return props


def read_hoodie_table_rt(
    spark: SparkSession,
    path: str,
    key_fields: list[str] | None = None,
    precombine: str | None = None,
    as_of_instant: str | None = None,
    predicate: list[tuple] | None = None,
) -> DataFrame:
    """Hudi MoR ``_rt`` view of a FOREIGN ``.hoodie`` table (r7,
    verdict #2): base parquet ∪ HoodieLogFormat Avro blocks, resolved
    latest-per-key — HoodieParquetRealtimeInputFormat semantics
    without the hudi bundle. Log blocks decode EXECUTOR-side
    (``hoodie_log.read_log_records_df``), one task per file group.

    Merge order is instant DESC then precombine DESC then log-block
    sequence DESC — commit order first, precombine within a commit,
    replay order as the last tiebreaker: the engine's (and Hudi's
    overwrite-with-latest payload's) exact discipline. Base rows take
    their slice's base instant (from the file-group naming convention;
    stored ``_hoodie_commit_time`` wins when populated); log rows take
    their block's INSTANT_TIME header. DELETE blocks (r8) surface as
    tombstones in the same merge: a key whose latest surviving entry
    is a tombstone vanishes from the view, and a later data block
    revives it — Hudi's log-scanner delete semantics. Key/precombine
    fields default from ``hoodie.properties``
    (``hoodie.table.recordkey.fields`` /
    ``hoodie.table.precombine.field``).

    ``predicate`` (r10) prunes at FILE-GROUP granularity: a slice drops
    only when its base file AND every log file carry col-stats entries
    proving the predicate cannot match — a log update can move a row
    into the predicate range, so one stats-less log file keeps the
    whole group (a record key lives in exactly one file group, Hudi's
    invariant, so dropping a group never changes another group's
    merge). The exact filters apply AFTER the merge: filtering log rows
    first could resurrect an older base row the newer out-of-range
    version should shadow."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl
    from hudi_and_delta_showcase_spark.tables import hoodie_metadata as hm
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _predicate_filter,
    )

    props = read_properties(path)
    if key_fields is None:
        rk = props.get("hoodie.table.recordkey.fields")
        if not rk:
            raise ValueError(
                "no key_fields given and hoodie.properties carries no "
                "hoodie.table.recordkey.fields"
            )
        key_fields = [c.strip() for c in rk.split(",") if c.strip()]
    if precombine is None:
        precombine = props.get("hoodie.table.precombine.field") or None

    slices = latest_file_slices_rt(path, as_of_instant)
    conjuncts, stats, hive_ok, ts_pruner = _col_stats_pruning(
        path, predicate
    )
    if conjuncts and (stats or hive_ok or ts_pruner):

        def _group_disjoint(s: dict) -> bool:
            names = ([s["base"]] if s["base"] else []) + list(s["logs"])
            if not names:
                return False
            return all(
                hm.file_provably_disjoint(
                    p, stats, conjuncts, hive_ok, ts_pruner
                )
                for p in names
            )

        pruned = {
            fid: s for fid, s in slices.items() if not _group_disjoint(s)
        }
        # keep one base-bearing slice as the schema anchor even when
        # everything pruned (the post-merge filter zeroes its rows)
        if not any(s["base"] for s in pruned.values()):
            anchor = next(
                (fid for fid, s in slices.items() if s["base"]), None
            )
            if anchor is not None:
                pruned[anchor] = slices[anchor]
        slices = pruned
    base_paths = sorted(
        fsio.join(path, s["base"]) for s in slices.values() if s["base"]
    )
    # LOG-ONLY file groups (inserts routed straight to logs — Hudi
    # does this under some index types) contribute records with no
    # base side; the union merge handles them like any other rows (r7)
    log_paths = sorted(p for s in slices.values() for p in s["logs"])
    if not base_paths:
        raise FileNotFoundError(
            f"no base files under {path}; an all-log table needs at "
            "least one compacted slice to pin the table schema"
        )
    base = spark.read.parquet(*base_paths)
    # slice instant from the file-group naming convention
    # <fileId>_<writeToken>_<instant>.parquet, stored meta column wins
    name_instant = F.regexp_extract(
        F.col("_metadata.file_name"),
        r"_\d+-\d+-\d+_(\d{14,17})\.parquet$", 1,
    )
    inst = F.when(name_instant == "", F.lit(None)).otherwise(name_instant)
    if "_hoodie_commit_time" in base.columns:
        inst = F.coalesce(F.col("_hoodie_commit_time"), inst)
    base = base.withColumn("_hl_instant", inst)
    if not log_paths:
        out = base.drop("_hl_instant")
        return _predicate_filter(out, conjuncts) if conjuncts else out
    logs = hl.read_log_records_df(
        spark, path, log_paths, base.drop("_hl_instant").schema,
        valid_instants=frozenset(i for i, _k in _completed_instants(path)),
        key_fields=key_fields, precombine=precombine,
    )
    union = base.unionByName(logs, allowMissingColumns=True)
    order = [F.desc("_hl_instant")]
    if precombine:
        order.append(F.desc(precombine))
    order.append(F.desc("_hl_seq"))  # in-file replay order (nulls last)
    w = Window.partitionBy(*key_fields).orderBy(*order)
    out = (
        union.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .filter(~F.coalesce(F.col("_hl_deleted"), F.lit(False)))
        .drop("__rn", "_hl_instant", "_hl_seq", "_hl_deleted")
    )
    return _predicate_filter(out, conjuncts) if conjuncts else out


def _hoodie_record_key_col(key_fields: list[str]):
    """The Hudi record-key string as a Column: a single key field is
    its plain string value (SimpleKeyGenerator); composite keys render
    ``f1:v1,f2:v2`` (ComplexKeyGenerator)."""
    import pyspark.sql.functions as F

    if len(key_fields) == 1:
        return F.col(key_fields[0]).cast("string")
    return F.concat_ws(
        ",",
        *[
            F.concat(F.lit(f + ":"), F.col(f).cast("string"))
            for f in key_fields
        ],
    )


def read_hoodie_changes(
    spark: SparkSession,
    path: str,
    begin_instant: str | None = None,
    end_instant: str | None = None,
    key_fields: list[str] | None = None,
    predicate: list[tuple] | str | None = None,
) -> DataFrame:
    """Hudi CHANGE-DATA-CAPTURE read (r10 — the ``.hoodie`` leg of the
    change-feed triad, next to ``read_delta_changes``): serve the
    row-level change images a ``hoodie.table.cdc.enabled`` writer
    persists as CDC_DATA log blocks (RFC-51 supplemental logging).
    All THREE logging modes serve (r11, verdict #4):

    * ``DATA_BEFORE_AFTER`` — debezium-shaped ``op``/``before``/
      ``after`` records; images come straight off the block.
    * ``DATA_BEFORE`` — ``op``/``recordKey``/``before``; the AFTER
      image is synthesized by semi-joining the record key against the
      post-instant snapshot (``read_hoodie_table_rt(as_of)``).
    * ``OP_KEY_ONLY`` — ``op``/``recordKey`` only; BOTH images
      synthesize, the before side against the snapshot as of the
      PREVIOUS completed instant.

    Output: data columns + ``_change_type`` (``insert`` /
    ``update_preimage`` / ``update_postimage`` / ``delete`` — Delta
    CDF's exact taxonomy, an update with a before image yields BOTH
    rows) + ``_commit_instant``.

    O(changes) IO in ``DATA_BEFORE_AFTER``: only the log files written
    by completed instants in ``(begin_instant, end_instant]`` are
    opened (their paths are the commits' own write stats — never a
    listing), and blocks decode EXECUTOR-side, one task per file
    group, with the same rollback-command / never-completed validity
    rules as the data merge. The key-only modes trade that for
    RFC-51's documented read cost: one snapshot semi-join per
    (instant, image side) that needs synthesis — the instant list is
    metadata-scale, the joins stay distributed, and the per-``as_of``
    snapshot plan is built once and shared. An in-range commit WITHOUT
    CDC blocks contributes nothing — refusal is the caller's call
    (absence of supplemental logging is not distinguishable from a
    metadata-only commit); an unknown ``op`` refuses loudly rather
    than mis-classifying.

    ``predicate`` (r11) applies the shared tuple/SQL row filter to the
    change rows (both images) — CDC blocks carry no col-stats, so this
    is a row filter pushed into the scan, not file pruning."""
    import pandas as pd
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    instants = _completed_instants(path)
    if not instants:
        raise FileNotFoundError(f"no completed commits under {path}")
    end = end_instant if end_instant is not None else instants[-1][0]
    valid = frozenset(i for i, _k in instants)
    log_files: set[str] = set()
    for instant, kind in instants:
        if begin_instant is not None and instant <= begin_instant:
            continue
        if instant > end:
            continue
        meta = _read_instant_meta(path, instant, kind)
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                if hl.parse_log_file_name(st["path"]) is not None:
                    log_files.add(st["path"])
    if not log_files:
        raise ValueError(
            f"no log-bearing commits in instant range "
            f"({begin_instant}, {end}]"
        )
    # one base-file FOOTER pins the data schema — never the snapshot
    # scan a change tail must not pay (r10 review finding: the schema
    # probe was O(table files) per poll)
    slices = latest_file_slices_rt(path)
    first_base = next(
        (s["base"] for s in slices.values() if s["base"]), None
    )
    if first_base is None:
        raise FileNotFoundError(
            f"no base files under {path}; an all-log table needs at "
            "least one compacted slice to pin the change-feed schema"
        )
    data_schema = spark.read.parquet(
        fsio.join(path, first_base)
    ).schema
    cols = [f.name for f in data_schema.fields]
    # StructType.add mutates in place — copy first, or data_schema
    # (reused below as the multi-version scan schema) grows the
    # bookkeeping columns and every join downstream turns ambiguous
    from pyspark.sql.types import StructType as _St

    out_schema = (
        _St(list(data_schema.fields))
        .add("_change_type", "string")
        .add("_commit_instant", "string")
        .add("__key", "string")
    )
    rows_in = []
    for p in sorted(log_files):
        info = hl.parse_log_file_name(p)
        rows_in.append((info["file_id"] if info else p, p))
    src = spark.createDataFrame(
        spark.sparkContext.parallelize(rows_in, min(len(rows_in), 32)),
        "fid string, rel string",
    )
    lo, hi = begin_instant, end

    def _decode(pdf: "pd.DataFrame") -> "pd.DataFrame":
        rels = sorted(
            pdf["rel"],
            key=lambda r: (hl.parse_log_file_name(r) or {}).get(
                "version", 0
            ),
        )
        blobs = [fsio.read_bytes(fsio.join(path, rel)) for rel in rels]
        rows: list[list] = []

        def emit(img: dict | None, ctype: str, instant: str,
                 key: str | None) -> None:
            if img is not None:
                rows.append(
                    [img.get(c) for c in cols] + [ctype, instant, None]
                )
            elif key is not None:
                # key-only modes: a placeholder row naming the record
                # key — the image synthesizes from a snapshot below
                rows.append([None] * len(cols) + [ctype, instant, key])
            else:
                raise ValueError(
                    f"cdc record of instant {instant} lacks both the "
                    f"{ctype} image and a recordKey"
                )

        for instant, records in hl.resolve_cdc_blocks(blobs, valid):
            if (lo is not None and instant <= lo) or instant > hi:
                continue
            for rec in records:
                op = rec.get("op")
                key = rec.get("recordKey")
                if op == "i":
                    emit(rec.get("after"), "insert", instant, key)
                elif op == "u":
                    # DATA_BEFORE_AFTER writers may legally omit the
                    # before image (insert-shaped upsert): skip the
                    # preimage ONLY when the schema CARRIES a before
                    # field that is null — a mode without the field
                    # (OP_KEY_ONLY) synthesizes it instead
                    if rec.get("before") is not None:
                        emit(rec["before"], "update_preimage",
                             instant, None)
                    elif "before" not in rec:
                        emit(None, "update_preimage", instant, key)
                    emit(rec.get("after"), "update_postimage",
                         instant, key)
                elif op == "d":
                    emit(rec.get("before"), "delete", instant, key)
                else:
                    raise ValueError(
                        f"unknown cdc op {op!r} in instant {instant}"
                    )
        return pd.DataFrame(
            rows,
            columns=cols + ["_change_type", "_commit_instant", "__key"],
        )

    # materialize the log decode ONCE: the mode probe below plus the
    # consumer's own action(s) — and, in the key-only modes, one
    # reference per (instant, side) synthesis group — would otherwise
    # each re-read and re-decode every log blob (r11 review finding +
    # sweep finding: the extra pass alone doubled the common path)
    decoded = src.groupBy("fid").applyInPandas(
        _decode, out_schema
    ).localCheckpoint(eager=True)

    # ---- image synthesis for the key-only modes (r11) -----------------
    # the (instant, side) list is metadata-scale: O(instants in range)
    need_groups = [
        (r["_commit_instant"], r["_change_type"])
        for r in decoded.filter(F.col("__key").isNotNull())
        .select("_commit_instant", "_change_type")
        .distinct()
        .collect()
    ]
    out = decoded.filter(F.col("__key").isNull()).drop("__key")
    need = decoded.filter(F.col("__key").isNotNull())
    if need_groups:
        if key_fields is None:
            props = read_properties(path)
            rk = props.get("hoodie.table.recordkey.fields")
            if not rk:
                raise ValueError(
                    "key-only CDC mode needs key_fields (none given and "
                    "hoodie.properties carries no "
                    "hoodie.table.recordkey.fields)"
                )
            key_fields = [c.strip() for c in rk.split(",") if c.strip()]
        from pyspark.sql import Window

        completed = [i for i, _k in instants]
        # target as-of instant per (instant, side) — metadata-scale
        target_rows = []
        for instant, ctype in sorted(need_groups):
            if ctype in ("insert", "update_postimage"):
                as_of = instant
            else:
                # before images live in the snapshot as of the PREVIOUS
                # completed instant
                prior = [i for i in completed if i < instant]
                if not prior:
                    raise ValueError(
                        f"cdc {ctype} at the table's first instant "
                        f"{instant} has no prior snapshot to synthesize "
                        "the before image from"
                    )
                as_of = prior[-1]
            target_rows.append((instant, ctype, as_of))
        # ONE multi-version plan resolves every (key, as-of) image —
        # r12, verdict #2: the old path built one read_hoodie_table_rt
        # plan + job per (instant, side) group, thousands of driver-
        # side plan builds on a long poll range. The multi-version
        # union (every file version in its slice-resolution validity
        # window, _file_versions_rt) joined to the needed keys and
        # topped by ONE as-of window is plan-count-constant in the
        # instant count; the join stays a distributed hash join on the
        # record key.
        precombine = read_properties(path).get(
            "hoodie.table.precombine.field"
        ) or None
        by_until: dict[str | None, dict[str, list[str]]] = {}
        opened_by_name: dict[str, str] = {}
        name_token_re = re.compile(r"_\d+-\d+-\d+_\d{14,17}\.parquet$")
        for p, until, is_log, opened in _file_versions_rt(path, as_of=hi):
            g = by_until.setdefault(until, {"base": [], "log": []})
            g["log" if is_log else "base"].append(p)
            # base files whose NAME carries no instant token (foreign
            # naming, populate.meta.fields=false) need a fallback
            # _hl_instant: the validity window's opening instant.
            # Driver-side map, only non-conforming names — empty (zero
            # plan overhead) for engine-written tables.
            if not is_log and opened and not name_token_re.search(p):
                opened_by_name[p.rsplit("/", 1)[-1]] = opened
        mv: DataFrame | None = None
        name_instant = F.regexp_extract(
            F.col("_metadata.file_name"),
            r"_\d+-\d+-\d+_(\d{14,17})\.parquet$", 1,
        )
        base_inst = F.when(
            name_instant == "", F.lit(None)
        ).otherwise(name_instant)
        if opened_by_name:
            opened_map = F.create_map(
                *[F.lit(x) for kv in opened_by_name.items() for x in kv]
            )
            base_inst = F.coalesce(
                base_inst, opened_map[F.col("_metadata.file_name")]
            )
        for until, grp in sorted(
            by_until.items(), key=lambda kv: kv[0] or ""
        ):
            parts: list[DataFrame] = []
            if grp["base"]:
                b = spark.read.schema(data_schema).parquet(
                    *[fsio.join(path, p) for p in sorted(grp["base"])]
                )
                inst = base_inst
                if "_hoodie_commit_time" in b.columns:
                    inst = F.coalesce(F.col("_hoodie_commit_time"), inst)
                parts.append(b.withColumn("_hl_instant", inst))
            if grp["log"]:
                parts.append(
                    hl.read_log_records_df(
                        spark, path, sorted(grp["log"]), data_schema,
                        valid_instants=valid, key_fields=key_fields,
                        precombine=precombine,
                    )
                )
            for piece in parts:
                piece = piece.withColumn("_hl_until", F.lit(until))
                mv = (
                    piece
                    if mv is None
                    else mv.unionByName(piece, allowMissingColumns=True)
                )
        if mv is None:
            raise FileNotFoundError(f"no data files under {path}")
        targets = spark.createDataFrame(
            spark.sparkContext.parallelize(target_rows, 1),
            "_tg_instant string, _tg_ctype string, _tg_asof string",
        )
        needk = (
            need.select("__key", "_commit_instant", "_change_type")
            .distinct()
            .join(
                F.broadcast(targets),
                (F.col("_commit_instant") == F.col("_tg_instant"))
                & (F.col("_change_type") == F.col("_tg_ctype")),
            )
            .select("__key", "_tg_instant", "_tg_ctype", "_tg_asof")
        )
        joined = mv.withColumn(
            "__mvk", _hoodie_record_key_col(key_fields)
        ).join(
            needk,
            (F.col("__mvk") == F.col("__key"))
            & (F.col("_hl_instant") <= F.col("_tg_asof"))
            & (
                F.col("_hl_until").isNull()
                | (F.col("_tg_asof") < F.col("_hl_until"))
            ),
        )
        order = [F.desc("_hl_instant")]
        if precombine:
            order.append(F.desc(precombine))
        if "_hl_seq" in (mv.columns or []):
            order.append(F.desc("_hl_seq"))
        w = Window.partitionBy(
            "__key", "_tg_instant", "_tg_ctype"
        ).orderBy(*order)
        img = (
            joined.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
        )
        if "_hl_deleted" in img.columns:
            img = img.filter(
                ~F.coalesce(F.col("_hl_deleted"), F.lit(False))
            )
        out = out.unionByName(
            img.select(
                *cols,
                F.col("_tg_ctype").alias("_change_type"),
                F.col("_tg_instant").alias("_commit_instant"),
            )
        )

    # declarative downstream: stamp as plain columns so filters push
    out = out.select(*cols, "_change_type", "_commit_instant")
    if predicate:
        from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
            _normalize_predicate,
            _predicate_filter,
        )

        out = _predicate_filter(out, _normalize_predicate(predicate))
    return out


def clean_hoodie_table(
    spark: SparkSession,
    path: str,
    retain_commits: int = 10,
    dry_run: bool = False,
) -> dict:
    """Hudi's CLEAN action against a foreign ``.hoodie`` timeline
    (r13 — the third protocol plane's reclamation sibling, next to
    ``vacuum_delta_table`` and ``remove_orphan_iceberg_files``):
    under KEEP_LATEST_COMMITS(``retain_commits``), delete every file
    VERSION whose validity window closed at or before the earliest
    retained instant — a base or log file no ``as-of >=
    earliestCommitToRetain`` query can ever serve (superseded by a
    newer slice of its file group, replaced by clustering, or behind
    an INSERT_OVERWRITE) — and record the action as a real
    ``.clean.requested -> .clean.inflight -> .clean`` instant whose
    metadata carries Hudi's HoodieCleanMetadata field names
    (``earliestCommitToRetain``, ``totalFilesDeleted``, per-partition
    ``successDeleteFiles``). Time travel to instants older than the
    retention window stops working — Hudi's documented trade, same as
    VACUUM's.

    The timeline readers ignore ``.clean`` instants by construction
    (slice replay parses commit/deltacommit/replacecommit only), so
    snapshot, incremental, and CDC reads after a clean serve exactly
    what they served before it.

    Scale shape: the candidate set comes from ONE driver-side replay
    (``_file_versions_rt`` — O(instants + file versions) metadata);
    deletion runs distributed (`lakehouse._distributed_remove`),
    never a driver IO loop."""
    if retain_commits < 1:
        raise ValueError("retain_commits must be >= 1")
    instants = _completed_instants(path)
    if len(instants) <= retain_commits:
        return {
            "deleted": 0,
            "would_remove_files": [],
            "earliest_retained": None,
        }
    earliest_retained = instants[-retain_commits][0]
    # a path is removable only when EVERY version row that lists it
    # closed at or before the earliest retained instant
    closed_by: dict[str, bool] = {}
    for p, until, _is_log, _opened in _file_versions_rt(path):
        ok = until is not None and until <= earliest_retained
        closed_by[p] = closed_by.get(p, True) and ok
    candidates = sorted(
        p
        for p, ok in closed_by.items()
        if ok and fsio.exists(fsio.join(path, p))
    )
    if dry_run or not candidates:
        return {
            "deleted": 0,
            "would_remove_files": candidates,
            "earliest_retained": earliest_retained,
        }
    from hudi_and_delta_showcase_spark.tables.lakehouse import (
        _distributed_remove,
    )

    n = _distributed_remove(
        spark, [fsio.join(path, p) for p in candidates]
    )
    by_partition: dict[str, list[str]] = {}
    for p in candidates:
        part = posixpath.dirname(p)
        by_partition.setdefault(part or "", []).append(p)
    instant = mf.make_commit_time()
    tdir = _timeline_dir(path)
    meta = {
        "startCleanTime": instant,
        "timeTakenInMillis": 0,
        "totalFilesDeleted": n,
        "earliestCommitToRetain": earliest_retained,
        "cleanerPolicy": "KEEP_LATEST_COMMITS",
        "partitionMetadata": {
            part: {
                "partitionPath": part,
                "policy": "KEEP_LATEST_COMMITS",
                "deletePathPatterns": files,
                "successDeleteFiles": files,
                "failedDeleteFiles": [],
            }
            for part, files in sorted(by_partition.items())
        },
    }
    fsio.write_atomic(fsio.join(tdir, f"{instant}.clean.requested"), "{}")
    fsio.write_atomic(fsio.join(tdir, f"{instant}.clean.inflight"), "{}")
    fsio.write_atomic(
        fsio.join(tdir, f"{instant}.clean"), json.dumps(meta, indent=1)
    )
    return {
        "deleted": n,
        "would_remove_files": candidates,
        "earliest_retained": earliest_retained,
        "instant": instant,
    }


def append_log_commit(
    path: str,
    file_id: str,
    base_instant: str,
    records: list[dict],
    avro_schema: dict,
    deletes: list[dict] | None = None,
    block_format: str = "avro",
    cdc_records: list[dict] | None = None,
    cdc_schema: dict | None = None,
) -> str:
    """Author one MoR delta commit the way Hudi lays it out: a hidden
    ``.log`` file of one Avro data block appended to ``file_id``'s
    slice — plus, when ``deletes`` is given, a ``HoodieDeleteBlock``
    after it (a hard delete routed to the log, Hudi's normal
    delete-on-MoR shape) — plus the ``.deltacommit`` instant
    (requested -> inflight -> completed) whose write stats reference
    the log file. Used by the protocol-pin goldens and the foreign-MoR
    registry queries; real Hudi writers produce exactly this shape
    (one rolled log file per commit)."""
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

    instant = mf.make_commit_time()
    existing = [
        p
        for s in latest_file_slices_rt(path).values()
        if s["base_instant"] == base_instant or s["base_instant"] is None
        for p in s["logs"]
    ]
    version = (
        max(
            (hl.parse_log_file_name(p)["version"] for p in existing),
            default=0,
        )
        + 1
    )
    req = fsio.join(_hoodie_dir(path), f"{instant}.deltacommit.requested")
    fsio.write_atomic(req, "")
    inflight = fsio.join(_hoodie_dir(path), f"{instant}.deltacommit.inflight")
    fsio.write_atomic(inflight, "")
    log_name = hl.log_file_name(file_id, base_instant, version=version)
    blocks = []
    if records:
        blocks.append(
            hl.parquet_data_block(records, instant)
            if block_format == "parquet"
            else hl.avro_data_block(records, avro_schema, instant)
        )
    if deletes:
        blocks.append(hl.delete_block(deletes, instant))
    if cdc_records:
        # hoodie.table.cdc.enabled supplemental logging: the commit's
        # change images ride a CDC_DATA block in the same log file
        # (cdc_schema overrides for the key-only RFC-51 modes, r11)
        blocks.append(
            hl.cdc_data_block(
                cdc_records,
                cdc_schema or hl.cdc_avro_schema(avro_schema),
                instant,
            )
        )
    hl.write_log_file(fsio.join(path, log_name), blocks)
    meta = {
        "partitionToWriteStats": {
            NON_PARTITIONED: [
                {
                    "fileId": file_id,
                    "path": log_name,
                    "prevCommit": base_instant,
                    "numWrites": len(records),
                    "numUpdateWrites": len(records),
                    "fileSizeInBytes": fsio.file_size(
                        fsio.join(path, log_name)
                    ),
                    "logVersion": version,
                }
            ]
        },
        "compacted": False,
        "extraMetadata": {},
        "operationType": "UPSERT",
    }
    fsio.write_atomic(
        fsio.join(_hoodie_dir(path), f"{instant}.deltacommit"),
        json.dumps(meta, indent=2),
    )
    fsio.remove(inflight)
    fsio.remove(req)
    return instant


def export_hoodie_timeline(table, table_version: int = 6) -> str:
    """The ``.hoodie`` sibling of ``delta_log.export_delta_log``
    (Apache XTable both ways): materialize the lakehouse manifest
    timeline as Hudi instant files over the SAME parquet files —
    metadata-only. Each data file is its own file group (deterministic
    fileId from its path); a commit that removed files lists their
    fileIds as ``replacedFileIds`` (Hudi's replacecommit semantics).
    Incremental and idempotent via the ``lakehouseVersion`` marker each
    exported instant carries. Returns the newest instant.

    ``table_version`` picks the layout DIALECT (r12, verdict #4):
    ``6`` (default) writes the pre-1.0 flat ``.hoodie/`` timeline;
    ``8`` writes Hudi 1.x — instant files under ``.hoodie/timeline/``
    named ``<requestedTime>_<completionTime>.<action>`` with
    ``hoodie.table.version: 8`` / ``hoodie.timeline.layout.version:
    2``, the layout every 1.x reader (and this engine's own read
    side, ``_V8_STEM_RE`` / ``_timeline_dir``) expects. A table
    already exported in one dialect refuses the other — mixing
    layouts would hide half the timeline from every reader.

    MoR logs and live deletion vectors must be folded first — and for
    MoR this is a SEMANTIC bound, not a missing feature (r7, after the
    HoodieLogFormat reader landed): Hudi's realtime view merges a log
    file only against ITS OWN file group's base file, so exporting the
    engine's table-wide log batches would require routing every log row
    to the file group holding its key's base row — information a
    non-clustered table does not have. Rendering them as log-only
    groups instead would silently change merge semantics (Hudi never
    merges across groups). Compaction folds the ambiguity away;
    refusing until then beats a view that serves different rows under
    Hudi than under this engine. (The import direction has no such
    ambiguity: foreign log files arrive already group-scoped.)"""
    if table_version not in (6, 8):
        raise ValueError(
            f"unknown hoodie export dialect table_version={table_version}"
        )
    if table._commit(None).log_files:
        raise RuntimeError("compact() MoR log files before export")
    if table._commit(None).dv_files:
        raise RuntimeError(
            "materialize deletion vectors (compact/optimize) before export"
        )
    fsio.makedirs(_hoodie_dir(table.path))
    props_file = fsio.join(_hoodie_dir(table.path), "hoodie.properties")
    if not fsio.exists(props_file):
        _write_properties(
            table.path, posixpath.basename(table.path.rstrip("/")),
            table_version=table_version,
        )
    else:
        declared = read_properties(table.path).get(
            "hoodie.table.version", "6"
        )
        if declared != str(table_version):
            raise ValueError(
                f"table already exported as hoodie.table.version="
                f"{declared}; re-exporting as {table_version} would "
                "split the timeline across layouts"
            )
    instant_dir = _hoodie_dir(table.path)
    if table_version >= 8:
        instant_dir = fsio.join(_hoodie_dir(table.path), "timeline")
        fsio.makedirs(instant_dir)
    done: dict[int, str] = {}
    for instant, kind in _completed_instants(table.path):
        meta = _read_instant_meta(table.path, instant, kind)
        v = meta.get("extraMetadata", {}).get("lakehouseVersion")
        if v is not None:
            done[int(v)] = instant
    fid = lambda f: str(uuid.uuid5(uuid.NAMESPACE_URL, f))  # noqa: E731
    last_instant = max(done.values()) if done else ""
    prior: set[str] = set()
    for v in sorted(mf.list_versions(table.path)):
        c = mf.read_commit(table.path, v)
        if v in done:
            prior = set(c.files)
            last_instant = done[v]
            continue
        instant = mf.make_commit_time()
        cur = set(c.files)
        stats = [
            {
                "fileId": fid(f),
                "path": f,
                "prevCommit": "null",
                "numWrites": -1,
                "numInserts": -1,
                "fileSizeInBytes": fsio.file_size(
                    fsio.join(table.path, f)
                ),
            }
            for f in sorted(cur - prior)
        ]
        replaced = sorted(fid(f) for f in prior - cur)
        meta = {
            "partitionToWriteStats": {NON_PARTITIONED: stats},
            "compacted": False,
            "extraMetadata": {
                "lakehouseVersion": str(v),
                # kept alongside the real field so timelines exported
                # by earlier engine versions and this one read alike
                "replacedFileIds": replaced,
            },
            "operationType": "UPSERT" if v else "INSERT",
        }
        suffix = "commit"
        if replaced:
            # real Hudi taxonomy (r8): a commit that replaces file
            # groups is a REPLACECOMMIT carrying the replaced ids
            # top-level (HoodieReplaceCommitMetadata) — clustering for
            # the maintenance actions, overwrite for table-resetting
            # ones; upserts keep UPSERT (the replace list carries the
            # semantics, as in latest_file_slices_rt's replay)
            suffix = "replacecommit"
            meta["partitionToReplaceFileIds"] = {NON_PARTITIONED: replaced}
            if c.action in ("optimize", "purge", "compact"):
                meta["operationType"] = "CLUSTER"
            elif c.action in ("overwrite", "restore"):
                meta["operationType"] = "INSERT_OVERWRITE_TABLE"
        if table_version >= 8:
            # 1.x completed-instant naming: requested_completion stem
            # (the completion time is its own timeline event in 1.x;
            # a fresh monotonic time keeps requested < completion)
            stem = f"{instant}_{mf.make_commit_time()}"
        else:
            stem = instant
        final = fsio.join(instant_dir, f"{stem}.{suffix}")
        fsio.write_atomic(final, json.dumps(meta, indent=2))
        prior = cur
        last_instant = instant
    return last_instant
