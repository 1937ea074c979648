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
import uuid

from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables import manifest as mf

#: Hudi's default partition path for unpartitioned tables.
NON_PARTITIONED = ""


def _hoodie_dir(path: str) -> str:
    return fsio.join(path, ".hoodie")


def _write_properties(path: str, name: str) -> None:
    props = {
        "hoodie.table.name": name,
        "hoodie.table.type": "COPY_ON_WRITE",
        "hoodie.table.version": "6",
        "hoodie.timeline.layout.version": "1",
        "hoodie.table.base.file.format": "PARQUET",
        "hoodie.populate.meta.fields": "false",
    }
    fsio.write_atomic(
        fsio.join(_hoodie_dir(path), "hoodie.properties"),
        "#Updated at instant creation\n"
        + "".join(f"{k}={v}\n" for k, v in props.items()),
    )


def list_instants(path: str, state: str = "commit") -> list[str]:
    """Completed (or requested/inflight) instant times, sorted."""
    d = _hoodie_dir(path)
    if not fsio.isdir(d):
        return []
    suffix = {
        "commit": ".commit",
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
    instants = list_instants(path)
    if as_of_instant is not None:
        instants = [i for i in instants if i <= as_of_instant]
    slices: dict[str, tuple[str, str]] = {}
    barrier = ""
    for instant in instants:
        meta = json.loads(
            fsio.read_text(fsio.join(_hoodie_dir(path), f"{instant}.commit"))
        )
        if meta.get("operationType") == "INSERT_OVERWRITE":
            slices.clear()
            barrier = instant
        else:
            # Hudi replacecommit semantics: this instant replaces the
            # listed file groups (clustering / partial rewrites)
            for fid in (
                meta.get("extraMetadata", {}).get("replacedFileIds") or []
            ):
                slices.pop(fid, None)
        for stats in meta.get("partitionToWriteStats", {}).values():
            for st in stats:
                fid, p = st["fileId"], st["path"]
                if instant >= barrier and (
                    fid not in slices or instant > slices[fid][0]
                ):
                    slices[fid] = (instant, p)
    return {fid: p for fid, (_, p) in slices.items()}


def read_hoodie_table(
    spark: SparkSession, path: str, as_of_instant: str | None = None
) -> DataFrame:
    """S2/C7: snapshot (or time-travel) scan of a ``.hoodie``-layout
    table — timeline replay on the driver, declarative parquet scan of
    the latest file slices. Only COMPLETED instants are visible."""
    slices = _latest_file_slices(path, as_of_instant)
    files = sorted(fsio.join(path, p) for p in slices.values())
    if not files:
        raise FileNotFoundError(f"no completed commits under {path}")
    return spark.read.parquet(*files)


def export_hoodie_timeline(table) -> str:
    """The ``.hoodie`` sibling of ``delta_log.export_delta_log``
    (Apache XTable both ways): materialize the lakehouse manifest
    timeline as Hudi instant files over the SAME parquet files —
    metadata-only. Each data file is its own file group (deterministic
    fileId from its path); a commit that removed files lists their
    fileIds as ``replacedFileIds`` (Hudi's replacecommit semantics).
    Incremental and idempotent via the ``lakehouseVersion`` marker each
    exported instant carries. MoR logs / live deletion vectors must be
    folded first, as for the Delta export. Returns the newest instant."""
    if table._commit(None).log_files:
        raise RuntimeError("compact() MoR log files before export")
    if table._commit(None).dv_files:
        raise RuntimeError(
            "materialize deletion vectors (compact/optimize) before export"
        )
    fsio.makedirs(_hoodie_dir(table.path))
    if not fsio.exists(
        fsio.join(_hoodie_dir(table.path), "hoodie.properties")
    ):
        _write_properties(
            table.path, posixpath.basename(table.path.rstrip("/"))
        )
    done: dict[int, str] = {}
    for instant in list_instants(table.path):
        meta = json.loads(
            fsio.read_text(
                fsio.join(_hoodie_dir(table.path), f"{instant}.commit")
            )
        )
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
        meta = {
            "partitionToWriteStats": {NON_PARTITIONED: stats},
            "compacted": False,
            "extraMetadata": {
                "lakehouseVersion": str(v),
                "replacedFileIds": sorted(fid(f) for f in prior - cur),
            },
            "operationType": "UPSERT" if v else "INSERT",
        }
        final = fsio.join(_hoodie_dir(table.path), f"{instant}.commit")
        fsio.write_atomic(final, json.dumps(meta, indent=2))
        prior = cur
        last_instant = instant
    return last_instant
