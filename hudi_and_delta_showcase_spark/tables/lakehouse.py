"""Copy-on-Write / Merge-on-Read lakehouse tables on plain Parquet +
JSON manifests (SURVEY.md §2.9 C1-C8, §2.1 S2/S5-S9, §2.8 D7/D8).

The reference materializes ACID tables two ways (README.md:254-256):
* **CoW** — updates rewrite the affected Parquet base files; untouched
  rows keep their old commit time (README.md:470-491).
* **MoR** — updates append to row-oriented log files; ``_ro`` reads serve
  the stale base, ``_rt`` reads merge base∪log per key at scan time, and
  compaction folds logs into a new base (README.md:605-607,918-920).

This implementation is Spark-first: every read is a declarative parquet
scan over the manifest's live-file list (predicate pushdown + row-group
skipping free), the `_rt` merge view is a window latest-per-key, and the
CoW rewrite is partition-scoped — only partitions containing upserted keys
are rewritten ("the CDC data corresponding to the updated partition only
would be affected", README.md:1240).

Meta columns (§1.5, README.md:299-304): Hudi's five ``_hoodie_*`` columns
are stamped as ordinary derived columns at write time
(``_hoodie_file_name`` at read time via the scan's ``_metadata.file_name``).

Scale notes (100 TB):
* Partition layout is hive-style (``__pp=value`` dirs) with the partition
  column ALSO stored in the data files, so snapshot reads are plain
  file-list scans — no basePath/partition-inference coupling across
  commits.
* Upsert cost is O(files actually holding the batch's keys), not
  O(table): partition pruning first, then key-level file skipping via
  per-file record-key min/max ranges stored in the commit manifest
  (Hudi's bloom/range index tier) — see ``_probe_key_hits``. After an
  ``optimize(cluster_by=...)`` the ranges are disjoint and an upsert
  touches only the file groups its keys land in.
* The source side of an upsert broadcasts when small (CDC batches almost
  always are); the rewrite never shuffles the un-affected part of the
  table — those files are carried over by reference in the manifest.
"""

from __future__ import annotations

import copy
import json
import os
import re
import time
import urllib.parse
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables import manifest as mf

META_COLS = (
    "_hoodie_commit_time",
    "_hoodie_commit_seqno",
    "_hoodie_record_key",
    "_hoodie_partition_path",
)

COPY_ON_WRITE = "cow"
MERGE_ON_READ = "mor"

#: Spark/Hive's directory token for a null partition value.
HIVE_DEFAULT_PARTITION = "__HIVE_DEFAULT_PARTITION__"

#: engine partition-dir token: ``__pp`` (spec 0) / ``__pp{i}`` (spec i
#: after partition evolution — see ``evolve_partitioning``).
_PP_TOKEN_RE = re.compile(r"^__pp(\d*)$")

#: age beyond which a ``_meta.lock`` is judged a crashed DDL's wreckage
#: and broken by the next waiter (a DDL holds it for milliseconds).
META_LOCK_TAKEOVER_SECONDS = 30.0


def _distributed_copy(spark, pairs: list[tuple[str, str]]) -> None:
    """Byte-copy (src, dst) file pairs as a Spark job — one partition
    per slice of files, pyarrow.fs inside the task (py4j/Hadoop is
    driver-only; pyarrow's URI-aware filesystems work in executors for
    file/s3/gcs/hdfs). Parent dirs are created per task; 8 MiB chunked
    streaming keeps executor memory flat on arbitrarily large files."""
    if not pairs:
        return

    def copy_slice(it):
        import pyarrow.fs as pafs

        def fs_of(p):
            if "://" not in p:
                return pafs.LocalFileSystem(), p
            return pafs.FileSystem.from_uri(p)

        for src, dst in it:
            sfs, sp = fs_of(src)
            dfs, dp = fs_of(dst)
            parent = dp.rsplit("/", 1)[0]
            dfs.create_dir(parent, recursive=True)
            with sfs.open_input_stream(sp) as r:
                with dfs.open_output_stream(dp) as w:
                    while True:
                        chunk = r.read(8 << 20)
                        if not chunk:
                            break
                        w.write(chunk)
        return iter(())

    n = min(len(pairs), 64)
    spark.sparkContext.parallelize(pairs, n).mapPartitions(
        copy_slice
    ).count()


#: removable-file count past which VACUUM deletes as a Spark job
#: instead of a driver loop. A serial driver loop is fine locally, but
#: on an object store it is O(files) sequential DELETE round-trips —
#: vacuuming 100k expired files at ~50 ms RPC is ~80 minutes serial
#: and seconds distributed.
VACUUM_DISTRIBUTED_THRESHOLD = 64


def _distributed_remove(spark, paths: list[str]) -> int:
    """Delete files as a Spark job — same executor-side pyarrow.fs
    pattern as ``_distributed_copy``. Already-missing files are
    tolerated (a racing vacuum or lifecycle rule got there first; the
    outcome is identical)."""
    if not paths:
        return 0

    def rm_slice(it):
        import pyarrow.fs as pafs

        def fs_of(p):
            if "://" not in p:
                return pafs.LocalFileSystem(), p
            return pafs.FileSystem.from_uri(p)

        for p in it:
            fs, pp = fs_of(p)
            try:
                fs.delete_file(pp)
            except FileNotFoundError:
                pass
        return iter(())

    n = min(len(paths), 64)
    spark.sparkContext.parallelize(paths, n).mapPartitions(rm_slice).count()
    return len(paths)


def _parse_partition_value(v: str, partition_type: str):
    """Hive dir value string -> a JSON-stable typed value for the
    col_stats index (mirrors the scan-time cast in ``_repair_meta``)."""
    t = partition_type.lower()
    if t in ("tinyint", "smallint", "int", "integer", "bigint", "long"):
        return int(v)
    if t in ("float", "double"):
        return float(v)
    if t == "boolean":
        return v.lower() == "true"
    return v


class LakehouseTable:
    """A keyed, versioned, partitioned table on parquet + manifests."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = fsio.absolutize(path)
        #: write-planning snapshot cache (Delta's post-commit snapshot):
        #: holds the manifest this handle last published (or first
        #: resolved for a write). Read paths never consult it — only
        #: ``_commit_for_write`` / ``_publish`` below.
        self._latest_commit: mf.Commit | None = None
        self._load_meta(
            json.loads(
                fsio.read_pointer_text(fsio.join(self.path, "_meta.json"))
            )
        )

    def _load_meta(self, meta: dict) -> None:
        self.key_cols: list[str] = meta["key_cols"]
        self.precombine: str | None = meta["precombine"]
        self.tiebreakers: list[str] = meta.get("tiebreakers", [])
        self.partition_by: str | None = meta["partition_by"]
        #: partition-spec HISTORY (Iceberg spec-evolution model): entry i
        #: is the partition column files written under spec i used (None
        #: = unpartitioned). ``partition_by`` is always the LAST entry —
        #: the spec new writes use. Tables that never evolved have no
        #: meta key and collapse to the single-spec fast path.
        specs = meta.get("partition_specs")
        self.partition_specs: list[str | None] = (
            list(specs) if specs else [self.partition_by]
        )
        self.table_type: str = meta["table_type"]
        self.cdc_enabled: bool = meta.get("cdc_enabled", False)
        self.global_index: bool = meta.get("global_index", False)
        self.bloom_index: bool = meta.get("bloom_index", False)
        self.bloom_columns: list[str] = meta.get("bloom_columns", [])
        self.deletion_vectors: bool = meta.get("deletion_vectors", False)
        self.record_index: bool = meta.get("record_index", False)
        self.bucket_count: int | None = meta.get("bucket_count")
        self.constraints: dict[str, str] = meta.get("constraints", {})
        self.generated_columns: dict[str, str] = meta.get(
            "generated_columns", {}
        )
        #: Delta row tracking: rows carry a stable _row_id that UPDATE
        #: (upsert), OPTIMIZE, and RESTORE preserve (CoW only)
        self.row_tracking: bool = meta.get("row_tracking", False)
        #: set when a foreign hive layout was adopted by ``convert``:
        #: the partition column exists only in adopted file PATHS and
        #: is derived at scan time with this declared type.
        self.adopted_partition_type: str | None = meta.get(
            "adopted_partition_type"
        )
        #: adopted multi-column hive layouts (r7): columns BEYOND the
        #: first, {name -> declared type}. The first column is the
        #: engine's partition_by (rewrite scoping, OPTIMIZE WHERE);
        #: the extras exist only in adopted file paths — derived at
        #: scan time and seeded into col_stats for pruning.
        self.adopted_extra_partitions: dict[str, str] = meta.get(
            "adopted_extra_partitions", {}
        )
        try:
            self._meta_identity = fsio.stat_identity(
                fsio.join(self.path, "_meta.json")
            )
        except FileNotFoundError:  # create() loads before the write
            self._meta_identity = None

    def _refresh_meta(self) -> None:
        """Re-read ``_meta.json`` if it changed since this handle loaded
        it — called at write entry points so a handle opened BEFORE a
        concurrent DDL (``add_constraint`` / ``enable_cdc``) still
        enforces the new table properties, the way Delta writers resolve
        metadata per-transaction rather than per-handle. One stat call
        when nothing changed."""
        meta_path = fsio.join(self.path, "_meta.json")
        try:
            identity = fsio.stat_identity(meta_path)
        except FileNotFoundError:
            return
        if identity != self._meta_identity:
            self._load_meta(json.loads(fsio.read_pointer_text(meta_path)))

    # ------------------------------------------------------------------ #
    # creation / loading
    # ------------------------------------------------------------------ #

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        key_cols: list[str],
        precombine: str | None = None,
        tiebreakers: list[str] | None = None,
        partition_by: str | None = None,
        table_type: str = COPY_ON_WRITE,
        mode: str = "error",
        cdc_enabled: bool = False,
        global_index: bool = False,
        bloom_index: bool = False,
        deletion_vectors: bool = False,
        record_index: bool = False,
        bucket_count: int | None = None,
        bloom_columns: list[str] | None = None,
        constraints: dict[str, str] | None = None,
        generated_columns: dict[str, str] | None = None,
        row_tracking: bool = False,
        extra_stats: dict | None = None,
    ) -> "LakehouseTable":
        """C1 bulk insert: write batch as version 0, stamp meta columns
        (the reference's initial hudi insert, README.md:276-291).

        ``cdc_enabled`` opts the table into the change data feed
        (Delta ``delta.enableChangeDataFeed`` / Hudi
        ``hoodie.table.cdc.enabled``): upsert/delete then write
        O(changes) CDC sidecar files consumed by ``read_changes`` —
        opt-in because classification costs the writer a key probe.

        ``global_index`` makes the record key unique across the WHOLE
        table instead of per partition (Hudi GLOBAL_BLOOM /
        ``hoodie.bloom.index.update.partition.path=true``): an upserted
        key whose partition value changed RELOCATES — the old
        partition's row is removed and the row lands in the new
        partition — where the default non-global index would keep both
        rows. The trade-off is Hudi's: candidate files for a global
        upsert span every partition (key-range pruning still applies,
        so cluster global tables by key), while non-global rewrites
        only source partitions.

        ``bloom_index`` (Hudi ``hoodie.index.type=BLOOM``) additionally
        stores an 8 KiB key bloom per file in the commit manifest and
        probes it during upsert/delete — prunes candidate files even
        when key min/max ranges fully overlap (unclustered tables,
        where the range tier declines). Opt-in: building blooms
        re-scans each commit's newly written files once.

        ``deletion_vectors`` (Delta deletion vectors / Iceberg position
        deletes) changes DELETE from copy-on-write to merge-on-read:
        instead of rewriting every file holding a matched key, the
        delete writes an O(deleted rows) parquet sidecar of
        ``(file_name, pos)`` row positions and leaves the base files
        untouched. Readers anti-join the (small) DV set against the
        scan's native ``(_metadata.file_name, _metadata.row_index)``.
        At 100 TB this turns a delete touching 10k files from a
        multi-TB rewrite into a megabyte append; the rewrite cost is
        deferred to the next upsert/compaction of each file, which
        materializes the deletes and drops the vectors.

        ``constraints`` (Delta ``ALTER TABLE ... ADD CONSTRAINT CHECK``)
        maps constraint name -> SQL predicate every written row must
        satisfy. Standard CHECK semantics: a row violates only when the
        predicate evaluates to FALSE (NULL passes — add an explicit
        ``IS NOT NULL`` term for non-null enforcement). ``create`` and
        ``upsert`` REJECT batches containing violations (Delta
        behavior); ``upsert_quarantine`` instead applies the valid rows
        and hands the violating rows back — the data-pipeline idiom
        where bad records route to a quarantine sink instead of failing
        the load. Validation is a map-only filter fused into the write
        scan: zero extra shuffles at any scale.

        ``bucket_count`` (Hudi ``hoodie.index.type=BUCKET`` with
        ``hoodie.bucket.index.num.buckets``) hash-routes every row to
        one of N fixed buckets by record key (``pmod(xxhash64(key),
        N)``, encoded in each file's ``__bk=`` dir). Upserts and point
        lookups then route by PURE ARITHMETIC — candidate files are
        the batch's buckets, no footer/bloom/index probe JOB at all —
        which at 100 TB removes the probe scan entirely and bounds
        file-group count at N per partition. The trade-offs are
        Hudi's: N is fixed at creation (pick for target file size at
        expected volume), and a batch spraying all N buckets rewrites
        the whole partition (bucket indexes shine on key-skewed,
        incremental workloads). OCC bonus: on unpartitioned tables the
        bucket dir doubles as the partition token, so bucket-disjoint
        concurrent upserts COMMUTE under the rebase rules instead of
        conflicting. Composes with range/bloom tiers (they prune
        further within the routed buckets).

        ``bloom_columns`` (Delta ``delta.bloomFilter.enabled`` column
        indexes / Hudi's any-column bloom) stores an 8 KiB bloom per
        file per NAMED DATA COLUMN, serving EQUALITY reads
        (``read_where(col, v, v)``) on unclustered high-cardinality
        columns — exactly where min/max stats decline because every
        file spans most of the value range. Build cost: one extra scan
        of each commit's new files per indexed column."""
        path = fsio.absolutize(path)
        if table_type not in (COPY_ON_WRITE, MERGE_ON_READ):
            raise ValueError(
                f"table_type must be {COPY_ON_WRITE!r} or "
                f"{MERGE_ON_READ!r}, got {table_type!r}"
            )
        if row_tracking and table_type == MERGE_ON_READ:
            # a MoR log row has no pre-image to inherit from until
            # compaction resolves it; Delta (the feature's origin) has
            # no MoR either — refuse rather than track approximately
            raise ValueError("row_tracking requires a copy-on-write table")
        if fsio.exists(fsio.join(path, "_meta.json")):
            if mode == "overwrite":
                fsio.rmtree(path)
            else:
                raise FileExistsError(f"table exists: {path}")
        fsio.makedirs(path)
        fsio.write_atomic(
            fsio.join(path, "_meta.json"),
            json.dumps(
                {
                    "key_cols": key_cols,
                    "precombine": precombine,
                    "tiebreakers": tiebreakers or [],
                    "partition_by": partition_by,
                    "table_type": table_type,
                    "cdc_enabled": cdc_enabled,
                    "global_index": global_index,
                    "bloom_index": bloom_index,
                    "deletion_vectors": deletion_vectors,
                    "record_index": record_index,
                    "bucket_count": bucket_count,
                    "bloom_columns": bloom_columns or [],
                    "constraints": constraints or {},
                    "generated_columns": generated_columns or {},
                    "row_tracking": row_tracking,
                },
                indent=1,
            ),
        )
        table = cls(spark, path)
        commit_time = mf.make_commit_time()
        df = table._apply_generated(df)
        if precombine is not None:
            df = precombine_dedup(
                df, table._resolution_cols(), precombine, tiebreakers
            )
        df = table._enforce_constraints(df)
        stamped = table._stamp_meta(df, commit_time)
        if bucket_count:
            # align tasks to buckets: one initial file per bucket
            # instead of tasks x buckets (see optimize's bucket note)
            stamped = stamped.withColumn(
                "__bko", table._bucket_expr()
            ).repartition(int(bucket_count), F.col("__bko")).drop("__bko")
        files = table._write_files(stamped, f"c{0:05d}")
        # record the physical read schema in the commit (Delta's
        # metaData action): upserts reconcile types against THIS instead
        # of sweeping every file footer, and widenings evolve it as
        # metadata. All-nullable — parquet reads are nullable anyway.
        from pyspark.sql.types import StructField, StructType

        schema_json = json.dumps(
            StructType(
                [
                    StructField(f.name, f.dataType, True)
                    for f in stamped.schema.fields
                ]
            ).jsonValue()
        )
        mf.append_commit(
            path,
            mf.Commit(
                version=0,
                action="insert",
                commit_time=commit_time,
                files=files,
                log_files=[],
                # Delta CDF's add-only rule (r7): a blind insert writes
                # NO change sidecar — read_changes synthesizes the
                # insert images from the commit's own data files, so a
                # CDC-enabled bulk load costs ONE write of the batch,
                # not two.
                stats={"written_files": len(files),
                       **({"cdc_add_only": True} if cdc_enabled else {}),
                       **(extra_stats or {})},
                cdc_files=[],
                ri_files=table._write_record_index(files, 0),
                table_schema=schema_json,
                **table._index_fields(files),
            ),
        )
        return table

    @classmethod
    def convert(
        cls,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        precombine: str | None = None,
        tiebreakers: list[str] | None = None,
        table_type: str = COPY_ON_WRITE,
        partition_by: str | None = None,
        partition_type: str = "string",
    ) -> "LakehouseTable":
        """Delta ``CONVERT TO DELTA`` / Hudi METADATA_ONLY bootstrap:
        adopt an EXISTING parquet directory as a lakehouse table
        in place — version 0 is a metadata-only commit referencing the
        original files byte-identically; nothing is copied or
        rewritten. At 100 TB this is the difference between an import
        that finishes in seconds and one that rewrites the corpus.

        Imported files carry no Hudi meta columns; reads derive them at
        scan time (``_repair_meta``: record key from the key columns,
        commit time from the convert commit), so every path — snapshot,
        time travel, point lookup, upsert rewrite, MoR merge — behaves
        as if the files had been written by this engine. Rewrites
        materialize real meta columns as files cycle. Footer column
        stats are harvested at convert (data-skipping works
        immediately); record-key ranges don't exist yet, so key-level
        file skipping is conservative until the first rewrite of each
        file.

        Duplicates are adopted as-is (convert never dedups, exactly
        like Delta's CONVERT).

        Hive-partitioned layouts (``col=value`` directories — the
        reference's own Hudi tables are partitioned, README.md:278,320)
        are adopted by declaring ``partition_by`` + ``partition_type``,
        mirroring Delta's ``CONVERT TO DELTA ... PARTITIONED BY (col
        type)`` (the type must be declared because hive dirs carry only
        strings). The partition COLUMN exists only in the paths of
        adopted files, so reads derive it at scan time from
        ``_metadata.file_path`` (``_repair_meta`` — same discipline as
        the derived Hudi meta columns; rows from post-adoption engine
        writes keep their stored column), rewrite scoping maps foreign
        ``col=value`` dirs alongside the engine's own ``__pp=`` dirs,
        and the convert commit seeds ``col_stats`` with each file's
        partition value so partition pruning via ``read_where`` works
        from version 0.

        r7 (verdict #7): MULTI-COLUMN hive nesting
        (``k1=v1/k2=v2/...``) adopts too — pass lists for
        ``partition_by``/``partition_type``. The FIRST column becomes
        the engine's partition column (rewrite scoping, OPTIMIZE
        WHERE); the rest derive at scan time and seed ``col_stats``,
        so ``read_where`` prunes on EVERY level from version 0.
        Post-adoption engine writes lay files out under ``__pp=<k1>``
        only — the extra columns live in the data files from then on,
        where footer stats keep the pruning exact."""
        path = fsio.absolutize(path)
        if fsio.exists(fsio.join(path, "_meta.json")):
            raise FileExistsError(f"already a lakehouse table: {path}")
        files = sorted(
            fsio.relpath(p, path) for p in fsio.walk_files(path, ".parquet")
        )
        if not files:
            raise FileNotFoundError(f"no parquet files to convert: {path}")
        partitioned = [f for f in files if "=" in f.split("/")[0]]
        if partitioned and partition_by is None:
            raise ValueError(
                "hive-partitioned layout: declare partition_by (and "
                "partition_type), like Delta's CONVERT TO DELTA ... "
                "PARTITIONED BY"
            )
        part_cols = (
            [partition_by]
            if isinstance(partition_by, str)
            else list(partition_by or [])
        )
        part_types = (
            [partition_type]
            if isinstance(partition_type, str)
            else list(partition_type or [])
        )
        if part_cols and len(part_types) != len(part_cols):
            raise ValueError(
                "declare one partition_type per partition_by column"
            )
        adopted_partition = bool(part_cols)
        if adopted_partition:
            bad = [
                f for f in files
                if f.count("/") != len(part_cols)
                or any(
                    not f.split("/")[i].startswith(f"{c}=")
                    for i, c in enumerate(part_cols)
                )
            ]
            if bad:
                raise ValueError(
                    f"expected a {'/'.join(c + '=<v>' for c in part_cols)} "
                    f"layout for every file; offending: {bad[:3]}"
                )
        fsio.write_atomic(
            fsio.join(path, "_meta.json"),
            json.dumps(
                {
                    "key_cols": key_cols,
                    "precombine": precombine,
                    "tiebreakers": tiebreakers or [],
                    "partition_by": part_cols[0] if part_cols else None,
                    "table_type": table_type,
                    "cdc_enabled": False,
                    "global_index": False,
                    "bloom_index": False,
                    "deletion_vectors": False,
                    "record_index": False,
                    "constraints": {},
                    "generated_columns": {},
                    **(
                        {"adopted_partition_type": part_types[0]}
                        if adopted_partition
                        else {}
                    ),
                    **(
                        {
                            "adopted_extra_partitions": dict(
                                zip(part_cols[1:], part_types[1:])
                            )
                        }
                        if len(part_cols) > 1
                        else {}
                    ),
                },
                indent=1,
            ),
        )
        table = cls(spark, path)
        index = table._index_fields(files)
        if adopted_partition:
            # seed per-file [v, v] stats for every path-only partition
            # column: data skipping on them works from version 0 even
            # though no footer carries the columns
            for f in files:
                segs = dict(
                    seg.split("=", 1)
                    for seg in f.split("/")
                    if "=" in seg
                )
                for c, t in zip(part_cols, part_types):
                    v = urllib.parse.unquote(segs.get(c, ""))
                    if not v or v == HIVE_DEFAULT_PARTITION:
                        continue
                    typed = _parse_partition_value(v, t)
                    index["col_stats"].setdefault(f, {})[c] = [typed, typed]
        mf.append_commit(
            path,
            mf.Commit(
                version=0,
                action="convert",
                commit_time=mf.make_commit_time(),
                files=files,
                log_files=[],
                stats={"converted_files": len(files)},
                **index,
            ),
        )
        return table

    @classmethod
    def convert_hoodie(
        cls,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        precombine: str | None = None,
        tiebreakers: list[str] | None = None,
        table_type: str = COPY_ON_WRITE,
    ) -> "LakehouseTable":
        """``convert`` for a ``.hoodie``-layout Hudi table, completing
        the adoption matrix in BOTH directions for all three protocols
        (export: delta/hoodie/iceberg; adopt: hive/delta/hoodie/
        iceberg): adopt the current timeline snapshot in place,
        metadata-only.

        The live set is the timeline's latest file slice per file
        group (``hoodie_timeline.latest_file_slices_rt`` — the same
        replay the foreign-authored-timeline reader pins: overwrite
        barriers, replacecommit ``replacedFileIds``), so superseded
        slices awaiting Hudi's cleaner are ignored, never resurrected.
        Real-Hudi data files already carry the ``_hoodie_*`` meta
        columns, so adopted reads serve them as written; files from
        this engine's own ``export_hoodie_timeline`` behave
        identically.

        r7 (verdict #2): MERGE-ON-READ timelines adopt too. Each file
        group's surviving HoodieLogFormat Avro blocks (rollback command
        blocks honored) decode EXECUTOR-side and materialize as this
        engine's parquet log files — O(log records), i.e. O(changes
        since the last Hudi compaction), never O(table); base files
        stay byte-identical in place. Rows keep their delta commit's
        instant as ``_hoodie_commit_time``, so the ``_rt`` merge
        (commit order first, precombine second) resolves exactly as
        Hudi's realtime view; base rows without stored meta columns
        take their slice instant from the file-group naming convention
        (``_repair_meta``). Log-only file groups adopt too. DELETE
        blocks (r8, verdict r7 #1) fold as engine state at version 0:
        killed log records are simply not materialized, killed base
        rows become deletion-vector entries — zero base rewrites.
        HFile/parquet data blocks and legacy kryo delete blocks refuse
        loudly (``hoodie_log``). A MoR timeline forces
        ``table_type='mor'``."""
        from hudi_and_delta_showcase_spark.tables import (
            hoodie_timeline as ht,
        )

        path = fsio.absolutize(path)
        if fsio.exists(fsio.join(path, "_meta.json")):
            raise FileExistsError(f"already a lakehouse table: {path}")
        slices = ht.latest_file_slices_rt(path)
        files = sorted(s["base"] for s in slices.values() if s["base"])
        # log-only file groups (no base yet) adopt too: their records
        # materialize into the engine's log files like any others —
        # the engine's MoR logs are table-wide, not group-scoped (r7)
        log_paths = sorted(p for s in slices.values() for p in s["logs"])
        if not files:
            raise FileNotFoundError(
                f"no base files under {path}; compact at least one "
                "slice with Hudi so a schema-bearing base exists"
            )
        if log_paths:
            table_type = MERGE_ON_READ
        fsio.write_atomic(
            fsio.join(path, "_meta.json"),
            json.dumps(
                {
                    "key_cols": key_cols,
                    "precombine": precombine,
                    "tiebreakers": tiebreakers or [],
                    "partition_by": None,
                    "table_type": table_type,
                    "cdc_enabled": False,
                    "global_index": False,
                    "bloom_index": False,
                    "deletion_vectors": False,
                    "record_index": False,
                    "constraints": {},
                    "generated_columns": {},
                },
                indent=1,
            ),
        )
        table = cls(spark, path)
        log_files: list[str] = []
        dv_files: list[str] = []
        n_tombstones = 0
        if log_paths:
            from hudi_and_delta_showcase_spark.tables import (
                hoodie_log as hl,
            )

            base_schema = spark.read.parquet(
                *[fsio.join(path, f) for f in files]
            ).schema
            logs = hl.read_log_records_df(
                spark, path, log_paths, base_schema,
                valid_instants=frozenset(
                    i for i, _k in ht._completed_instants(path)
                ),
                key_fields=key_cols, precombine=precombine,
            )
            # DELETE-block tombstones (r8, verdict r7 #1) materialize
            # as engine state at version 0: a tombstone kills every log
            # record at-or-before its (instant, seq) for the same key
            # — a LATER data block revives the key — and the base row,
            # which is always older than any log entry of its slice,
            # becomes a deletion-vector entry. Tombstones are O(deletes
            # since last compaction), so both sides broadcast.
            # (Keys are assumed unique per partition — Hudi's
            # record-key contract — matching the engine's table-wide
            # MoR merge.)
            # one decode pass total: the tombstone probe caches the
            # decoded log rows the materializing write then reuses
            logs = logs.persist()
            tomb = logs.filter(F.col("_hl_deleted"))
            last_tomb = tomb.groupBy(*key_cols).agg(
                F.max(F.struct("_hl_instant", "_hl_seq")).alias("__t")
            )
            n_tombstones = last_tomb.count()
            data = logs.filter(~F.col("_hl_deleted"))
            if n_tombstones:
                data = (
                    data.join(F.broadcast(last_tomb), key_cols, "left")
                    .filter(
                        F.col("__t").isNull()
                        | (F.struct("_hl_instant", "_hl_seq") > F.col("__t"))
                    )
                    .drop("__t")
                )
                hits = (
                    spark.read.parquet(
                        *[fsio.join(path, f) for f in files]
                    )
                    .withColumn("__file", table._dv_file_col())
                    .withColumn("__pos", F.col("_metadata.row_index"))
                    .join(
                        F.broadcast(last_tomb.select(*key_cols)),
                        key_cols,
                        "left_semi",
                    )
                    .select(
                        F.col("__file").alias("file_name"),
                        F.col("__pos").alias("pos"),
                    )
                )
                dv_files = table._write_dv_files(hits, "c00000")
            data = data.drop("_hl_seq", "_hl_deleted")
            if "_hoodie_commit_time" in base_schema.fieldNames():
                data = data.withColumn(
                    "_hoodie_commit_time",
                    F.coalesce(
                        F.col("_hoodie_commit_time"), F.col("_hl_instant")
                    ),
                ).drop("_hl_instant")
            else:
                data = data.withColumnRenamed(
                    "_hl_instant", "_hoodie_commit_time"
                )
            log_files = table._write_files(data, "l00000", log=True)
            logs.unpersist()
        mf.append_commit(
            path,
            mf.Commit(
                version=0,
                action="convert",
                commit_time=mf.make_commit_time(),
                files=files,
                log_files=log_files,
                dv_files=dv_files,
                stats={
                    "converted_files": len(files),
                    "source_format": "hoodie",
                    **(
                        {"adopted_log_files": len(log_paths)}
                        if log_paths
                        else {}
                    ),
                    **(
                        {"adopted_tombstone_keys": n_tombstones}
                        if n_tombstones
                        else {}
                    ),
                },
                **table._index_fields(files),
            ),
        )
        return table

    @classmethod
    def convert_delta(
        cls,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        precombine: str | None = None,
        tiebreakers: list[str] | None = None,
        table_type: str = COPY_ON_WRITE,
    ) -> "LakehouseTable":
        """``convert`` for a Delta table (CONVERT FROM DELTA — the
        inverse of ``delta_log.export_delta_log``, completing the
        adoption matrix: hive-parquet, Iceberg, Delta): adopt the
        CURRENT ``_delta_log`` snapshot in place, metadata-only.

        The live-file list comes from log replay (checkpoint-aware),
        so files Delta has removed — old CoW versions awaiting VACUUM
        — are correctly ignored, not resurrected; they stay on disk
        untouched.

        r7, closing the round-6 verdict's #1 gap: snapshots carrying
        **deletion vectors** (default-on in modern Databricks writers)
        and **columnMapping.mode=name** adopt cleanly instead of
        refusing. DVs translate at convert time into the engine's own
        ``(file_name, pos)`` parquet sidecar — decoded EXECUTOR-side
        (``delta_dv.dv_rows_df``), O(deleted rows), zero data-file
        rewrites — so from version 0 every read path applies them via
        the normal ``_apply_dvs`` anti-join and the first rewrite of
        each file materializes them, exactly like native DV tables.
        Column mapping seeds the manifest's ``column_mapping``
        (physical -> logical), the same machinery ``rename_column``
        maintains; ``key_cols``/``precombine``/``tiebreakers`` are
        given in LOGICAL names and stored physical, since every engine
        internal addresses physical names. Partitioned Delta tables
        adopt with the same path-derived mechanism as hive-layout
        ``convert`` — Delta data files never CONTAIN the partition
        column, only the ``col=value`` dirs name it — including the
        version-0 ``col_stats`` seed so partition pruning works
        immediately (single partition column; multi-column layouts are
        refused, same bound as ``convert``). What still refuses:
        reader features beyond {deletionVectors, columnMapping,
        timestampNtz} and ``columnMapping.mode=id``
        (``delta_log.adopt_delta_snapshot``); column-mapped tables
        whose physical layout drops the hive dirs adopt only
        unpartitioned (their partition record lives in
        ``partitionValues``, which ``convert``'s path-derived reads
        cannot see)."""
        from hudi_and_delta_showcase_spark.tables import delta_log as dl

        path = fsio.absolutize(path)
        if fsio.exists(fsio.join(path, "_meta.json")):
            raise FileExistsError(f"already a lakehouse table: {path}")
        meta_d, files, adds = dl.adopt_delta_snapshot(path)
        if not files:
            raise FileNotFoundError(f"current snapshot lists no files: {path}")
        mapping = dl.column_mapping_of(meta_d)  # physical -> logical
        if dl._mapping_mode(meta_d) == "id":
            # id-mapped adoption rides the physicalName map (assigned
            # once, never renamed), which is only sound while every
            # file's columns are actually NAMED by their physicalName
            # — true for delta-spark id-mode writers. Verify per file
            # (footer-only reads, the same O(files) driver class as
            # the stats harvest below) and refuse divergence loudly:
            # the engine's post-adoption reads match by name.
            phys_names = {
                f.name for f in dl._physical_schema(meta_d)[1].fields
            }
            for f in sorted(files):
                have = dl.parquet_column_names(fsio.join(path, f))
                missing = phys_names - have
                if missing:
                    raise RuntimeError(
                        f"id-mapped file {f} stores columns {sorted(have)}"
                        f" without physicalNames {sorted(missing)}; read "
                        "it via read_delta_table (field-id resolution) "
                        "instead of adopting"
                    )
        to_phys = {log: phys for phys, log in mapping.items()}
        key_cols = [to_phys.get(c, c) for c in key_cols]
        precombine = to_phys.get(precombine, precombine)
        tiebreakers = [to_phys.get(c, c) for c in (tiebreakers or [])]
        part_cols_logical = meta_d.get("partitionColumns") or []
        part_cols = [to_phys.get(c, c) for c in part_cols_logical]
        partition_by = part_cols[0] if part_cols else None
        part_types: list[str] = []
        if part_cols:
            from pyspark.sql.types import StructType

            schema = StructType.fromJson(
                json.loads(meta_d["schemaString"])
            )
            part_types = [
                schema[c].dataType.simpleString()
                for c in part_cols_logical
            ]
            hive_laid = all(
                f.count("/") == len(part_cols)
                and all(
                    f.split("/")[i].startswith(f"{c}=")
                    for i, c in enumerate(part_cols)
                )
                for f in files
            )
            if not hive_laid:
                raise ValueError(
                    "partitioned delta snapshot without hive-style "
                    f"{'/'.join(c + '=<v>' for c in part_cols)} dirs "
                    "(column-mapped layouts record partitions only in "
                    "partitionValues) — read it via read_delta_table "
                    "instead"
                )
        fsio.write_atomic(
            fsio.join(path, "_meta.json"),
            json.dumps(
                {
                    "key_cols": key_cols,
                    "precombine": precombine,
                    "tiebreakers": tiebreakers or [],
                    "partition_by": partition_by,
                    "table_type": table_type,
                    "cdc_enabled": False,
                    "global_index": False,
                    "bloom_index": False,
                    # live foreign DVs keep working post-adoption: the
                    # flag turns on the engine's DV machinery so later
                    # deletes extend the sidecars instead of rewriting
                    "deletion_vectors": any(
                        a.get("deletionVector") for a in adds.values()
                    ),
                    "record_index": False,
                    "constraints": {},
                    "generated_columns": {},
                    **(
                        {"adopted_partition_type": part_types[0]}
                        if partition_by is not None
                        else {}
                    ),
                    **(
                        {
                            "adopted_extra_partitions": dict(
                                zip(part_cols[1:], part_types[1:])
                            )
                        }
                        if len(part_cols) > 1
                        else {}
                    ),
                },
                indent=1,
            ),
        )
        table = cls(spark, path)
        index = table._index_fields(sorted(files))
        if partition_by is not None:
            import urllib.parse as _up

            for f in files:
                segs = dict(
                    seg.split("=", 1)
                    for seg in f.split("/")
                    if "=" in seg
                )
                for c, t in zip(part_cols, part_types):
                    v = _up.unquote(segs.get(c, ""))
                    if not v or v == HIVE_DEFAULT_PARTITION:
                        continue
                    typed = _parse_partition_value(v, t)
                    index["col_stats"].setdefault(f, {})[c] = [typed, typed]
        dv_map = {
            f: a["deletionVector"]
            for f, a in adds.items()
            if a.get("deletionVector")
        }
        dv_files: list[str] = []
        if dv_map:
            from hudi_and_delta_showcase_spark.tables import delta_dv

            dv_files = table._write_dv_files(
                delta_dv.dv_rows_df(spark, path, dv_map), "c00000"
            )
        # foreign TYPE-WIDENED table (r8, typeWidening reader feature):
        # fields carrying delta.typeChanges metadata mean legacy files
        # are narrower than the current schema — pin the commit's
        # table_schema (physical names) so every engine read declares
        # the widened schema and Spark's parquet reader upcasts, the
        # same mechanism the engine's own widen_column uses.
        widened_schema: str | None = None
        if any(
            (f.get("metadata") or {}).get("delta.typeChanges")
            for f in json.loads(meta_d["schemaString"])["fields"]
        ):
            widened_schema = json.dumps(
                dl._physical_schema(meta_d)[1].jsonValue()
            )
        mf.append_commit(
            path,
            mf.Commit(
                version=0,
                action="convert",
                commit_time=mf.make_commit_time(),
                files=sorted(files),
                log_files=[],
                table_schema=widened_schema,
                stats={
                    "converted_files": len(files),
                    "source_format": "delta",
                    **(
                        {"adopted_dv_files": len(dv_map)} if dv_map else {}
                    ),
                },
                dv_files=dv_files,
                column_mapping=dict(mapping),
                **index,
            ),
        )
        return table

    @classmethod
    def convert_iceberg(
        cls,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        precombine: str | None = None,
        tiebreakers: list[str] | None = None,
        table_type: str = COPY_ON_WRITE,
    ) -> "LakehouseTable":
        """``convert`` for an Apache Iceberg table (the incoming XTable
        direction, complementing ``iceberg_meta.export_iceberg_metadata``):
        adopt the CURRENT Iceberg snapshot in place, metadata-only.

        Unlike the directory-walk convert, the live file set comes from
        the Iceberg metadata itself (metadata.json -> manifest-list ->
        manifests), so files orphaned by Iceberg's own history — dead
        snapshots not yet expired — are correctly ignored rather than
        resurrected; they stay on disk untouched (this engine's vacuum
        only ever deletes files its own commits referenced).

        r7: snapshots carrying v2 DELETE files adopt too — their whole
        delete state (position deletes directly; equality deletes via
        the same sequence-ordered null-safe join the read path uses)
        materializes as the engine's ``(file_name, pos)`` DV sidecar
        at version 0 (``iceberg_meta.deleted_positions_df``): data
        files stay byte-identical, O(deleted rows) sidecar IO plus one
        scan of the equality-candidate files, and every read path
        applies the sidecar through the normal ``_apply_dvs``
        anti-join. Identity-partitioned Iceberg tables keep their
        partition column in the data files, so they adopt as
        unpartitioned lakehouse tables: reads are value-complete; only
        rewrite scoping loses partition granularity until files
        cycle."""
        from hudi_and_delta_showcase_spark.tables import iceberg_meta as im

        path = fsio.absolutize(path)
        if fsio.exists(fsio.join(path, "_meta.json")):
            raise FileExistsError(f"already a lakehouse table: {path}")
        meta = im.read_iceberg_metadata(path)
        snap = {s["snapshot-id"]: s for s in meta["snapshots"]}[
            meta["current-snapshot-id"]
        ]
        entries, pos_dels, eq_dels = im._snapshot_entries(
            path, snap, with_deletes=True
        )
        files = sorted(
            fsio.relpath(
                im._resolve(path, e["data_file"]["file_path"]), path
            )
            for e in entries
        )
        if not files:
            raise FileNotFoundError(f"current snapshot lists no files: {path}")
        if (pos_dels or eq_dels) and any(f.startswith("..") for f in files):
            # DV sidecar identity is the file's path RELATIVE to the
            # table root; a delete-bearing tree whose recorded data
            # paths resolve OUTSIDE the root (a live duplicate of the
            # source tree) cannot carry that identity — refuse instead
            # of silently resurrecting rows, BEFORE any adoption
            # metadata lands. Relocate (move/copy the whole tree,
            # retire the source) and adopt again.
            outside = next(f for f in files if f.startswith(".."))
            raise RuntimeError(
                "delete-bearing snapshot references data files "
                f"outside the table root (e.g. {outside!r}); "
                "relocate the tree before adoption"
            )
        fsio.write_atomic(
            fsio.join(path, "_meta.json"),
            json.dumps(
                {
                    "key_cols": key_cols,
                    "precombine": precombine,
                    "tiebreakers": tiebreakers or [],
                    "partition_by": None,
                    "table_type": table_type,
                    "cdc_enabled": False,
                    "global_index": False,
                    "bloom_index": False,
                    # adopted delete state lives in DV sidecars; the
                    # flag keeps later deletes on the same discipline
                    "deletion_vectors": bool(pos_dels or eq_dels),
                    "record_index": False,
                    "constraints": {},
                    "generated_columns": {},
                },
                indent=1,
            ),
        )
        table = cls(spark, path)
        dv_files: list[str] = []
        if pos_dels or eq_dels:
            dv_files = table._write_dv_files(
                im.deleted_positions_df(
                    spark, path, entries, pos_dels, eq_dels, meta
                ),
                "c00000",
            )
        mf.append_commit(
            path,
            mf.Commit(
                version=0,
                action="convert",
                commit_time=mf.make_commit_time(),
                files=files,
                log_files=[],
                stats={
                    "converted_files": len(files),
                    "source_format": "iceberg",
                    "source_snapshot_id": meta["current-snapshot-id"],
                    **(
                        {
                            "adopted_delete_files": len(pos_dels)
                            + len(eq_dels)
                        }
                        if (pos_dels or eq_dels)
                        else {}
                    ),
                },
                dv_files=dv_files,
                **table._index_fields(files),
            ),
        )
        return table

    @classmethod
    def clone(
        cls,
        spark: SparkSession,
        src_path: str,
        dest_path: str,
        deep: bool = False,
    ) -> "LakehouseTable":
        """Delta ``CREATE TABLE ... SHALLOW CLONE``: a zero-copy table
        whose version 0 REFERENCES the source's current files (as
        absolute paths — ``fsio.resolve`` passes them through), copying
        only metadata: O(1) data IO however big the table. The clone
        then diverges independently — upserts rewrite only the
        partitions they touch (rewritten data lands under the clone;
        untouched source files stay referenced), ``optimize()``
        materializes it fully, and ``vacuum`` on either table never
        deletes the other's files (vacuum only walks its OWN root; a
        clone's references into the source dir are invisible to the
        source's vacuum, so vacuum the source only after its clones are
        materialized or dropped — Delta documents the same hazard).

        The file-skipping indexes (key ranges, column stats, blooms)
        come along re-keyed to the absolute references; the record
        index does not (its rows name source-relative paths) — the
        probe tier is conservative until the clone's own writes rebuild
        it. Change-data-feed history is NOT inherited (the clone's feed
        starts at its own version 1, like Delta). Tables with
        outstanding deletion vectors must ``optimize()`` first (DV
        entries name source-relative files)."""
        src = cls(spark, src_path)
        prev = src._commit(None)
        if prev.dv_files:
            raise ValueError(
                "cannot shallow-clone a table with outstanding deletion "
                "vectors: run optimize() on the source first"
            )
        dest = fsio.absolutize(dest_path)
        if fsio.exists(fsio.join(dest, "_meta.json")):
            raise FileExistsError(f"already a lakehouse table: {dest}")
        fsio.makedirs(dest)
        fsio.write_atomic(
            fsio.join(dest, "_meta.json"),
            fsio.read_pointer_text(fsio.join(src.path, "_meta.json")),
        )

        if deep:
            # Delta DEEP CLONE: byte-copy the source's LIVE files (base
            # + MoR logs) under the same relative names, one task per
            # file slice — a DISTRIBUTED pyarrow-fs copy, never a
            # driver-side loop (the copy is the operation; O(live data)
            # cluster IO is its floor). Relative names surviving means
            # every file-skipping index entry carries over verbatim.
            _distributed_copy(
                spark,
                [
                    (fsio.resolve(src.path, f), fsio.join(dest, f))
                    for f in [*prev.files, *prev.log_files]
                ],
            )

            def ref(f: str) -> str:
                return f  # self-contained: dest-relative names

        else:

            def ref(f: str) -> str:
                return fsio.resolve(src.path, f)

        mf.append_commit(
            dest,
            mf.Commit(
                version=0,
                action="clone",
                commit_time=mf.make_commit_time(),
                files=[ref(f) for f in prev.files],
                log_files=[ref(f) for f in prev.log_files],
                stats={
                    "cloned_from": src.path,
                    "source_version": prev.version,
                    "clone_depth": "deep" if deep else "shallow",
                },
                key_ranges={ref(f): v for f, v in prev.key_ranges.items()},
                col_stats={ref(f): v for f, v in prev.col_stats.items()},
                row_counts={ref(f): v for f, v in prev.row_counts.items()},
                key_blooms={ref(f): v for f, v in prev.key_blooms.items()},
                column_blooms={ref(f): v for f, v in prev.column_blooms.items()},
                table_schema=prev.table_schema,
                column_mapping=dict(prev.column_mapping),
            ),
        )
        return cls(spark, dest)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "LakehouseTable":
        return cls(spark, path)

    # ------------------------------------------------------------------ #
    # reads (S2/S5: snapshot, read-optimized, real-time)
    # ------------------------------------------------------------------ #

    def read(self, version: int | None = None) -> DataFrame:
        """Snapshot view. CoW: latest base files. MoR: the real-time view
        (base∪log merged), matching Hudi's default snapshot semantics.
        Columns come back under the version's LOGICAL names (column
        mapping, see ``rename_column``)."""
        commit = self._commit(version)
        return self._logical(self._read_physical(version), commit)

    def _read_physical(self, version: int | None = None) -> DataFrame:
        """Snapshot under PHYSICAL (on-disk) column names — the shape
        every internal write/maintenance path works in."""
        if self.table_type == MERGE_ON_READ:
            return self._read_rt_physical(version)
        return self._read_base(self._commit(version))

    def read_ro(self, version: int | None = None) -> DataFrame:
        """S5 read-optimized: base files only — serves stale values between
        upsert and compaction (samsung still 20, README.md:920,958)."""
        commit = self._commit(version)
        return self._logical(self._read_base(commit), commit)

    def read_rt(self, version: int | None = None) -> DataFrame:
        """S5 real-time: base ∪ logs resolved latest-per-key at scan time
        (HoodieParquetRealtimeInputFormat semantics, README.md:689).

        Resolution order: commit time DESC FIRST — a later upsert batch
        overwrites the stored row even if its precombine value is older,
        exactly like the CoW write path (Hudi's default overwrite-with-
        latest payload: precombine dedups WITHIN a batch, commits apply
        in order ACROSS batches; divergence found by
        tests/test_properties.py::test_cow_equals_mor_rt). Then
        precombine DESC + tiebreakers within a commit. One window over
        the unioned scan, shuffled once on the record key.

        Index semantics: NON-GLOBAL (Hudi's default) — the record key is
        unique PER PARTITION, so the resolution window includes the
        partition column. A key that re-arrives under a new partition
        value becomes a new row in that partition and the old partition's
        row survives, identically in CoW (partition-scoped rewrite) and
        MoR `_rt` (per-partition window)."""
        commit = self._commit(version)
        return self._logical(self._read_rt_physical(version), commit)

    def _read_rt_physical(self, version: int | None = None) -> DataFrame:
        commit = self._commit(version)
        base = self._read_base(commit)
        if not commit.log_files:
            return base
        log = self._read_parquet(commit.log_files, commit)
        union = base.unionByName(log, allowMissingColumns=True)
        order = [F.desc("_hoodie_commit_time")]
        if self.precombine:
            order.append(F.desc(self.precombine))
        order += [F.desc(t) for t in self.tiebreakers]
        w = Window.partitionBy(*self._resolution_cols()).orderBy(*order)
        return (
            union.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )

    def read_for_keys(
        self, keys: list, version: int | None = None
    ) -> DataFrame:
        """Point-lookup read path: scan ONLY the files whose record-key
        range can contain one of ``keys`` (driver-side metadata check
        against the manifest's per-file key ranges — no Spark job for
        the pruning itself), then filter exactly. After
        ``optimize(cluster_by=...)`` ranges are disjoint, so a k-key
        lookup reads O(k) files out of millions — Hudi's record-index
        read path expressed on the manifest. Files with unknown ranges
        are scanned conservatively. MoR with outstanding logs resolves
        through the `_rt` merge first (logs are unindexed until
        compaction, as in Hudi), then filters."""
        commit = self._commit(version)
        rks = {
            "|".join("" if v is None else str(v) for v in k)
            if isinstance(k, (tuple, list))
            else ("" if k is None else str(k))
            for k in keys
        }
        if self.table_type == MERGE_ON_READ and commit.log_files:
            return self.read_rt(version).filter(
                F.col("_hoodie_record_key").isin(*sorted(rks))
            )
        if self.record_index and commit.ri_files:
            # record-index tier: the index names the files holding the
            # keys EXACTLY — a k-key lookup reads O(k) files out of
            # millions even on unclustered tables where every range
            # overlaps (the shape the range tier below cannot prune)
            live = set(commit.files)
            hit = {
                r.file
                for r in self._ri_scan(commit)
                .filter(F.col("_hoodie_record_key").isin(*sorted(rks)))
                .select("file")
                .distinct()
                .collect()
            }
            candidates = sorted(hit & live)
        else:
            candidates = []
            for f in commit.files:
                rng = commit.key_ranges.get(f)
                if rng is None or any(rng[0] <= rk <= rng[1] for rk in rks):
                    candidates.append(f)
        if self.bucket_count and len(candidates) > 1:
            # bucket-index routing: the keys' hash buckets name the
            # candidate files arithmetically (one tiny 1-task job to
            # evaluate the engine hash on k keys — exact, no false
            # positives beyond hash collisions within a bucket)
            kdf = self.spark.createDataFrame(
                self.spark.sparkContext.parallelize(
                    [(k,) for k in sorted(rks)], 1
                ),
                "_hoodie_record_key string",
            )
            key_buckets = {
                r[0]
                for r in kdf.select(
                    self._bucket_expr().alias("b")
                ).distinct().collect()
            }
            candidates = [
                f
                for f in candidates
                if (b := self._bucket_of(f)) is None or b in key_buckets
            ]
        # bloom tier for point lookups: on unclustered tables the ranges
        # above keep nearly every file; the per-file blooms cut the scan
        # to the files that can actually hold one of the keys
        if self.bloom_index and len(candidates) > 1:
            blooms = {
                f: commit.key_blooms[f]
                for f in candidates
                if f in commit.key_blooms
            }
            if blooms:
                from hudi_and_delta_showcase_spark.tables.bloom import (
                    probe_blooms,
                )

                kdf = self.spark.createDataFrame(
                    [(k,) for k in sorted(rks)],
                    "_hoodie_record_key string",
                )
                hits = probe_blooms(self.spark, kdf, blooms)
                candidates = [
                    f for f in candidates if f not in blooms or f in hits
                ]
        if not candidates:
            return self._logical(self._read_base(commit).limit(0), commit)
        df = self._apply_dvs(self._read_parquet(candidates, commit), commit)
        return self._logical(
            df.filter(F.col("_hoodie_record_key").isin(*sorted(rks))),
            commit,
        )

    def history(self) -> list[mf.Commit]:
        """C7: the commit timeline (Hudi `.hoodie` / Delta `_delta_log`)."""
        return [mf.read_commit(self.path, v) for v in mf.list_versions(self.path)]

    def detail(self) -> dict:
        """Delta ``DESCRIBE DETAIL``: one metadata-only summary of the
        current snapshot — latest-commit read plus ``_meta.json``, zero
        data IO and zero listings. ``num_rows`` comes from the
        manifest's per-file footer counts and is None when it cannot be
        exact — a live file lacks a footer count (adopted files before
        their first rewrite) or unmerged MoR log files hold rows the
        footers don't see. Live deletion vectors are subtracted via the
        same O(deleted rows) sidecar semi-join ``metadata_agg`` uses —
        absent beats wrong."""
        c = self._commit(None)
        rc = [c.row_counts.get(f) for f in c.files]
        num_rows = None
        if not any(r is None for r in rc) and not c.log_files:
            num_rows = sum(rc)
            if c.dv_files and num_rows:
                dv = (
                    self.spark.read.parquet(
                        *[fsio.resolve(self.path, f) for f in c.dv_files]
                    )
                    .select("file_name", "pos")
                    .distinct()
                )
                live = self.spark.createDataFrame(
                    [(f,) for f in c.files], "file_name string"
                )
                num_rows -= dv.join(live, "file_name", "semi").count()
        return {
            "format": "lakehouse",
            "location": self.path,
            "table_type": self.table_type,
            "version": c.version,
            "last_commit_time": c.commit_time,
            "num_files": len(c.files),
            "num_log_files": len(c.log_files),
            "num_rows": num_rows,
            "partition_columns": (
                [self.partition_by] if self.partition_by else []
            ),
            "key_columns": list(self.key_cols),
            "features": sorted(
                name
                for name, on in (
                    ("cdc", self.cdc_enabled),
                    ("deletion_vectors", self.deletion_vectors),
                    ("global_index", self.global_index),
                    ("bloom_index", self.bloom_index),
                    ("record_index", self.record_index),
                    ("bucket_index", bool(self.bucket_count)),
                    ("row_tracking", self.row_tracking),
                    ("constraints", bool(self.constraints)),
                    ("generated_columns", bool(self.generated_columns)),
                )
                if on
            ),
        }

    # ------------------------------------------------------------------ #
    # column mapping (Delta columnMapping.mode=name)
    # ------------------------------------------------------------------ #

    def _logical(self, df: DataFrame, commit: mf.Commit) -> DataFrame:
        """Physical -> logical column names for the given version.
        SIMULTANEOUS rename (one select of aliases): a rename chain that
        permutes names — v->metric then sq->v, so logical 'v' now means
        the old 'sq' — would make sequential withColumnRenamed collide
        on the intermediate duplicate name."""
        mapping = commit.column_mapping
        if not mapping:
            return df
        return df.select(
            *[df[c].alias(mapping.get(c, c)) for c in df.columns]
        )

    def _physical(self, df: DataFrame) -> DataFrame:
        """Logical -> physical names (latest mapping) on a write input.
        Simultaneous, like ``_logical``."""
        inverse = {
            log: phys
            for phys, log in self._commit_for_write().column_mapping.items()
        }
        if not inverse:
            return df
        return df.select(
            *[df[c].alias(inverse.get(c, c)) for c in df.columns]
        )

    def _phys_name(self, logical: str, commit: mf.Commit) -> str:
        return next(
            (
                p
                for p, l in commit.column_mapping.items()
                if l == logical
            ),
            logical,
        )

    def rename_column(self, old: str, new: str) -> mf.Commit:
        """Delta ``ALTER TABLE ... RENAME COLUMN`` under column mapping:
        a METADATA-ONLY commit updating the physical->logical name map —
        zero data files touched, O(1) regardless of table size (the
        alternative, a full rewrite, is petabytes at 100 TB). The map
        lives in the commit record, so time travel to a pre-rename
        version sees the old name, and every read path translates at
        the public boundary. Key/partition/precombine internals keep
        addressing physical names; constraint predicates keep their
        creation-time (physical) spelling."""
        prev = self._commit(None)
        logical_cols = [
            prev.column_mapping.get(c, c)
            for c in self._read_base(prev).columns
        ]
        if old not in logical_cols:
            raise ValueError(f"no such column: {old!r}")
        if new in logical_cols or new.startswith("_hoodie_"):
            raise ValueError(f"column name already in use: {new!r}")
        mapping = dict(prev.column_mapping)
        phys = self._phys_name(old, prev)
        if phys == new:
            mapping.pop(phys, None)
        else:
            mapping[phys] = new
        commit = mf.Commit(
            version=prev.version + 1,
            action="rename",
            commit_time=mf.make_commit_time(),
            files=list(prev.files),
            log_files=list(prev.log_files),
            stats={"renamed_from": old, "renamed_to": new},
            key_ranges=dict(prev.key_ranges),
            col_stats=dict(prev.col_stats),
            row_counts=dict(prev.row_counts),
            key_blooms=dict(prev.key_blooms),
            column_blooms=dict(prev.column_blooms),
            dv_files=list(prev.dv_files),
            txn=dict(prev.txn),
            ri_files=list(prev.ri_files),
            table_schema=prev.table_schema,
            column_mapping=mapping,
        )
        commit = self._publish(commit)
        return commit

    def drop_column(self, name: str) -> mf.Commit:
        """Delta ``ALTER TABLE ... DROP COLUMN`` under column mapping:
        a METADATA-ONLY commit — the field leaves the commit's read
        schema, so every subsequent scan simply never reads it (zero
        files rewritten; the bytes are physically reclaimed as rewrites
        and vacuum naturally cycle the files). Time travel to a
        pre-drop version shows the column; RESTORE restores it. The
        physical name is tombstoned in the column mapping so a later
        batch carrying the same name is REFUSED instead of silently
        resurrecting old file data — re-introduce the concept under a
        new name (or rename first), exactly the discipline Delta's
        column-mapping ids enforce. Key/partition/precombine/
        tiebreaker columns cannot be dropped."""
        prev = self._commit(None)
        phys = self._phys_name(name, prev)
        protected = set(
            self.key_cols
            # every HISTORICAL spec column stays protected: files written
            # under an old spec still partition-prune against it
            + [s for s in self.partition_specs if s]
            + ([self.precombine] if self.precombine else [])
            + self.tiebreakers
        )
        if phys in protected or phys.startswith("_hoodie_"):
            raise ValueError(f"cannot drop column {name!r}")
        for cname, pred in self.constraints.items():
            if phys in pred:
                raise ValueError(
                    f"cannot drop {name!r}: referenced by constraint "
                    f"{cname!r} ({pred!r})"
                )
        # generated columns: dropping the column itself would leave its
        # meta entry re-adding it on every write straight into the
        # tombstone refusal (permanently wedging writes); dropping an
        # INPUT of a generated expression breaks every future write's
        # F.expr resolution. Refuse both, mirroring the constraint check.
        if name in self.generated_columns or phys in self.generated_columns:
            raise ValueError(
                f"cannot drop generated column {name!r} "
                "(remove the generated-column definition first)"
            )
        for gcol, gexpr in self.generated_columns.items():
            if phys in gexpr or name in gexpr:
                raise ValueError(
                    f"cannot drop {name!r}: referenced by generated "
                    f"column {gcol!r} ({gexpr!r})"
                )
        schema = self._commit_schema(prev)
        if schema is None:  # legacy table: derive once
            schema = self.spark.read.option("mergeSchema", "true").parquet(
                *[fsio.resolve(self.path, f)
                  for f in prev.files + prev.log_files]
            ).schema
        if phys not in schema.fieldNames():
            raise ValueError(f"no such column: {name!r}")
        from pyspark.sql.types import StructType

        new_schema = StructType(
            [f for f in schema.fields if f.name != phys]
        )
        mapping = dict(prev.column_mapping)
        mapping[phys] = f"__dropped_v{prev.version + 1}"
        commit = mf.Commit(
            version=prev.version + 1,
            action="drop_column",
            commit_time=mf.make_commit_time(),
            files=list(prev.files),
            log_files=list(prev.log_files),
            stats={"dropped_column": name, "physical_name": phys},
            key_ranges=dict(prev.key_ranges),
            col_stats=dict(prev.col_stats),
            row_counts=dict(prev.row_counts),
            key_blooms=dict(prev.key_blooms),
            column_blooms=dict(prev.column_blooms),
            dv_files=list(prev.dv_files),
            txn=dict(prev.txn),
            ri_files=list(prev.ri_files),
            table_schema=json.dumps(new_schema.jsonValue()),
            column_mapping=mapping,
        )
        return self._publish(commit)

    # ------------------------------------------------------------------ #
    # table-property evolution (Delta ALTER TABLE ... SET TBLPROPERTIES /
    # ADD CONSTRAINT): _meta.json holds table-level properties; these
    # mutate it atomically and take effect from the NEXT write.
    # ------------------------------------------------------------------ #

    def _update_meta(self, transform) -> None:
        """Serialized read-modify-write of ``_meta.json``: an exclusive
        ``_meta.lock`` (the same put-if-absent primitive commits use)
        brackets read -> ``transform(meta)`` -> write, so two
        concurrent DDLs compose instead of silently losing one change —
        the property Delta gets by putting metadata in the commit
        protocol. ``transform`` mutates/validates against the FRESH
        on-disk meta (a handle's cached view may be stale) and may
        raise to abort. The handle's fields are refreshed from the
        result."""
        meta_path = fsio.join(self.path, "_meta.json")
        lock = fsio.join(self.path, "_meta.lock")
        deadline = time.time() + 10.0
        while True:
            try:
                fsio.publish_exclusive(lock, uuid.uuid4().hex)
                break
            except FileExistsError:
                # stale-lock takeover: a DDL is a sub-second metadata
                # write, so a lock older than the takeover window can
                # only be a crashed holder's wreckage — break it
                # (removal is idempotent if two waiters race to break)
                try:
                    mtime, _size = fsio.stat_identity(lock)
                    age = time.time() - (
                        mtime / 1000.0
                        if fsio.is_remote(lock)
                        else mtime / 1e9
                    )
                    if age > META_LOCK_TAKEOVER_SECONDS:
                        fsio.remove(lock)
                        continue
                except (FileNotFoundError, OSError):
                    continue  # holder released (or a waiter broke it)
                if time.time() > deadline:
                    raise RuntimeError(
                        f"timed out acquiring {lock!r} — another DDL is "
                        "in flight (crashed holders are broken "
                        f"automatically after {META_LOCK_TAKEOVER_SECONDS}s)"
                    ) from None
                time.sleep(0.05)
        try:
            meta = json.loads(fsio.read_pointer_text(meta_path))
            transform(meta)
            fsio.write_atomic(meta_path, json.dumps(meta, indent=1))
        finally:
            fsio.remove(lock)
        self._load_meta(meta)

    def enable_cdc(self) -> None:
        """Delta ``SET TBLPROPERTIES (delta.enableChangeDataFeed=true)``
        on an existing table: change capture begins with the NEXT
        commit — earlier versions have no change files, exactly Delta's
        behavior (``table_changes`` from a pre-enablement version
        errors). Works on MoR too (r6): pre-images resolve through the
        key-pruned ``_rt`` view at write time, Hudi's
        ``hoodie.table.cdc.enabled`` semantics."""
        self._update_meta(lambda meta: meta.update(cdc_enabled=True))

    def add_constraint(self, name: str, predicate: str) -> None:
        """Delta ``ALTER TABLE ... ADD CONSTRAINT name CHECK (pred)``:
        validates the EXISTING snapshot first (one scan — Delta refuses
        the constraint if any current row violates it), then enforces
        on every future write. Standard CHECK semantics: NULL passes.
        The predicate uses the table's physical column spelling, like
        create-time constraints."""
        if name in self.constraints:
            raise ValueError(f"constraint exists: {name!r}")
        violating = (
            self._read_physical()
            .filter(~F.coalesce(F.expr(predicate), F.lit(True)))
            .limit(1)
            .count()
        )
        if violating:
            raise ValueError(
                f"cannot add constraint {name!r}: existing rows violate "
                f"{predicate!r}"
            )

        def transform(meta):
            cons = meta.get("constraints", {})
            if name in cons:  # re-check against FRESH meta inside lock
                raise ValueError(f"constraint exists: {name!r}")
            cons[name] = predicate
            meta["constraints"] = cons

        self._update_meta(transform)

    def drop_constraint(self, name: str) -> None:
        """Delta ``ALTER TABLE ... DROP CONSTRAINT``."""
        if name not in self.constraints:
            raise ValueError(f"no such constraint: {name!r}")

        def transform(meta):
            cons = meta.get("constraints", {})
            if name not in cons:
                raise ValueError(f"no such constraint: {name!r}")
            del cons[name]
            meta["constraints"] = cons

        self._update_meta(transform)

    def evolve_partitioning(self, column: str | None) -> None:
        """Iceberg-style partition-spec evolution (Iceberg spec
        `ALTER TABLE ... REPLACE PARTITION FIELD`): a METADATA-ONLY DDL
        that changes the partition column for writes going FORWARD —
        zero existing files are rewritten. ``None`` un-partitions.

        Why this is safe without a rewrite (the Iceberg argument,
        re-expressed on this engine's layout):

        * Every spec column also lives IN the data files (the hive dirs
          duplicate it), so readers never depend on the layout — scans
          are explicit file lists and all read-side pruning
          (``read_where``) is per-file column STATS, spec-agnostic.
        * Each file's own spec is encoded in its directory token
          (``__pp=`` for spec 0, ``__pp{i}=`` for spec i — see
          ``_partition_spec_value_of``), so upsert partition pruning
          and the non-global index's partition matching evaluate each
          file against the BATCH VALUES OF THAT FILE'S OWN COLUMN:
          pruning stays exact across the evolution instead of
          degrading to scan-everything.
        * Rewrite commits (compact / optimize) emit output under the
          CURRENT spec, so maintenance naturally converges the table
          to the new layout — Iceberg's migration story (spec-id per
          manifest entry), with zero upfront IO.
        * OCC: two concurrent writers whose touched partitions belong
          to DIFFERENT specs cannot prove disjointness, so the rebase
          rules treat cross-spec overlap as a conflict (conservative,
          and only in the brief window around an evolution).

        Like the single-spec engine (and Hudi's non-global index), the
        exactness of partition pruning assumes a record's value for
        each HISTORICAL spec column is stable per key; a key whose old
        spec-column value changed routes like a new record in old-spec
        files (standard non-global-index semantics). Tables needing
        key moves across partitions use ``global_index=True``, which
        never partition-prunes."""
        if column is not None:
            cols = set(self.read().columns)
            if column not in cols:
                raise ValueError(
                    f"partition column {column!r} not in table schema"
                )
            if column.startswith("_hoodie"):
                raise ValueError("cannot partition by a meta column")

        def transform(meta):
            cur = meta["partition_by"]
            if column == cur:
                raise ValueError(
                    f"partition spec is already {column!r}"
                )
            specs = list(meta.get("partition_specs") or [cur])
            specs.append(column)
            meta["partition_specs"] = specs
            meta["partition_by"] = column

        self._update_meta(transform)

    def version_as_of(self, instant: str) -> int:
        """Delta ``TIMESTAMP AS OF`` / Hudi ``as.of.instant``: the latest
        version whose commit time is <= ``instant`` (Hudi-style
        ``yyyyMMddHHmmssSSS``; any prefix works — '20240101' means that
        day's midnight). Driver-side metadata scan of the timeline, no
        Spark job. Raises if the instant precedes the first commit."""
        digits = "".join(ch for ch in instant if ch.isdigit()).ljust(17, "0")
        best = None
        for c in self.history():
            if c.commit_time <= digits:
                best = c.version
        if best is None:
            raise ValueError(
                f"no commit at or before {instant!r} "
                f"(first commit: {self.history()[0].commit_time})"
            )
        return best

    def read_incremental(
        self, begin_version: int, end_version: int | None = None
    ) -> DataFrame:
        """Hudi incremental query (the reference's "Snapshot and
        Incremental Data", README.md:576): the LATEST state of records
        changed in commits ``(begin_version, end_version]`` — begin
        exclusive, end inclusive, like Hudi's
        ``hoodie.datasource.read.begin.instanttime``.

        Works because the CoW rewrite PRESERVES ``_hoodie_commit_time``
        on carried-over rows (only upserted rows are re-stamped), so the
        snapshot filtered by commit-time range is exactly the incremental
        change set. MoR resolves through the ``_rt`` merge first, then
        filters the winning rows — a record whose latest change predates
        ``begin`` is excluded even if it has unmerged log entries.

        Scale: the commit-time predicate is an ordinary pushed-down
        parquet filter; with time-ordered commit file layout most base
        files are skipped by row-group min/max stats — an incremental
        pull reads O(changed data), never O(table)."""
        begin_time = self._commit(begin_version).commit_time
        end = self._commit(end_version)
        snap = self._read_physical(end.version)
        return self._logical(
            snap.filter(
                (F.col("_hoodie_commit_time") > F.lit(begin_time))
                & (F.col("_hoodie_commit_time") <= F.lit(end.commit_time))
            ),
            end,
        )

    # ------------------------------------------------------------------ #
    # writes
    # ------------------------------------------------------------------ #

    def upsert(
        self,
        source: DataFrame,
        _validated: bool = False,
        txn_app_id: str | None = None,
        txn_version: int | None = None,
        extra_stats: dict | None = None,
    ) -> mf.Commit:
        """C2 (CoW) / C3 (MoR) keyed upsert with precombine dedup.

        CoW: rewrites only partitions containing source keys; untouched
        files carry over (their rows keep the old commit time —
        README.md:470-491). MoR: appends the batch as log files; base
        untouched until compact() (README.md:896-916).

        ``txn_app_id``/``txn_version`` make the upsert IDEMPOTENT per
        writer (Delta ``txnAppId``/``txnVersion``): if this (app,
        version) is at or below the table's recorded watermark the call
        is a no-op returning the current commit — the contract a
        foreachBatch streaming writer needs so a micro-batch replayed
        after a crash (table commit landed, stream checkpoint didn't)
        cannot double-apply."""
        self._refresh_meta()
        commit_time = mf.make_commit_time()
        prev = self._commit_for_write()
        if txn_app_id is not None and txn_version is not None:
            last = prev.txn.get(txn_app_id)
            if last is not None and txn_version <= last:
                return prev  # replayed batch: already applied
        new_txn = dict(prev.txn)
        if txn_app_id is not None and txn_version is not None:
            new_txn[txn_app_id] = txn_version
        source = self._apply_generated(self._physical(source))
        source, table_schema = self._reconcile_schema(source, prev)
        if self.precombine is not None:
            source = precombine_dedup(
                source, self._resolution_cols(), self.precombine,
                self.tiebreakers,
            )
        if not _validated:
            source = self._enforce_constraints(source)
        stamped = self._stamp_meta(source, commit_time)
        version = prev.version + 1

        if self.table_type == MERGE_ON_READ:
            new_logs = self._write_files(stamped, f"l{version:05d}", log=True)
            mor_cdc: list[str] = []
            if self.cdc_enabled:
                # Hudi MoR CDC (hoodie.table.cdc.enabled): pre-images
                # are the RT-RESOLVED current rows holding the batch's
                # keys — base scan filtered on the record key (pushed
                # down; logs are unindexed until compaction, as in
                # Hudi), NOT a full-table diff. Post/insert split by
                # the same key probe the CoW branch uses.
                pre_source = self._read_rt_physical().drop(
                    "_hoodie_file_name"
                )
                mor_cdc = self._classify_upsert_cdc(
                    pre_source, stamped, version, commit_time
                )
            commit = mf.Commit(
                version=version,
                action="upsert",
                commit_time=commit_time,
                files=prev.files,
                log_files=prev.log_files + new_logs,
                cdc_files=mor_cdc,
                stats={"log_files_added": len(new_logs),
                       **(extra_stats or {})},
                key_ranges=prev.key_ranges,
                col_stats=prev.col_stats,
                row_counts=prev.row_counts,
                key_blooms=prev.key_blooms,
                column_blooms=prev.column_blooms,
                dv_files=list(prev.dv_files),
                txn=new_txn,
                ri_files=list(prev.ri_files),
                table_schema=table_schema,
                column_mapping=dict(prev.column_mapping),
            )
            commit = self._publish(commit)
            return commit

        # ---- CoW: partition-scoped rewrite (C8) ----
        # Non-global index: the anti-join key includes the partition
        # column, and only partitions present in the source are rewritten
        # — O(affected partitions), never O(table).
        affected, untouched = self._split_affected(prev.files, source)
        # Bucket-index tier: hash-route the batch to its buckets —
        # candidate files shrink to the touched buckets with no probe
        # scan of table data (Hudi BUCKET index).
        bucket_skipped: list[str] = []
        if self.bucket_count:
            affected, bucket_skipped = self._split_bucket_affected(
                affected, stamped
            )
            untouched = untouched + bucket_skipped
        # Second pruning tier — key-level file skipping (Hudi bloom/range
        # index): within affected partitions, rewrite only files whose
        # footer key range intersects the batch. At 100 TB this is the
        # difference between rewriting a partition and rewriting the
        # handful of file groups the keys actually live in.
        ri_skipped: list[str] = []
        if self.record_index:
            # exact tier: the record index names the files holding the
            # batch's keys — no range/bloom false positives
            affected, ri_skipped = self._probe_ri_hits(
                affected, prev, stamped
            )
            untouched = untouched + ri_skipped
        affected, range_skipped = self._probe_key_hits(
            affected, prev.key_ranges, stamped
        )
        untouched = untouched + range_skipped
        bloom_skipped: list[str] = []
        if self.bloom_index:
            affected, bloom_skipped = self._probe_bloom_hits(
                affected, prev.key_blooms, stamped
            )
            untouched = untouched + bloom_skipped
        cdc_added: list[str] = []
        add_only_cdc = False
        if affected:
            # apply DVs before the rewrite so rows already deleted via
            # deletion vectors don't resurrect into the new files
            target = self._apply_dvs(
                self._read_parquet(affected, prev), prev
            )
            if self.cdc_enabled:
                # CDC consumes target TWICE (kept anti-join + pre-image
                # semi-join) and the batch THREE times (merge, post,
                # insert split): a lazy localCheckpoint materializes
                # each once on first use — the affected files are
                # scanned once instead of twice and the batch's
                # dedup/constraint pipeline runs once instead of three
                # times, at toy scale also 3 fewer fixed-cost jobs
                # (measured 10 -> 7 per CDC upsert).
                target = target.localCheckpoint(eager=False)
                stamped = stamped.localCheckpoint(eager=False)
            target = target.alias("t")
            keys = self._resolution_cols()
            if self.row_tracking:
                # Delta row tracking: an UPDATE keeps the logical row's
                # identity — matched batch rows inherit the pre-image's
                # _row_id via one key-probe join against the rows the
                # rewrite is reading anyway; unmatched (insert) rows
                # keep their freshly-stamped id. Runs BEFORE the merge
                # and CDC classify so post-images carry the stable id.
                pre = target.select(
                    *[F.col(f"t.{c}").alias(f"__rk_{c}") for c in keys],
                    F.col("t._row_id").alias("__old_rid"),
                )
                icond = None
                for c in keys:
                    e = F.col(c).eqNullSafe(F.col(f"__rk_{c}"))
                    icond = e if icond is None else icond & e
                stamped = (
                    stamped.join(pre, icond, "left")
                    .withColumn(
                        "_row_id",
                        F.coalesce(F.col("__old_rid"), F.col("_row_id")),
                    )
                    .drop("__old_rid", *[f"__rk_{c}" for c in keys])
                )
            source_keys = F.broadcast(
                stamped.select(*keys).distinct().alias("s")
            )
            # null-safe equality: a null partition value must MATCH the
            # incoming null (plain `=` never matches null, so the old
            # row would escape the anti-join and duplicate the key)
            cond = None
            for c in keys:
                e = F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
                cond = e if cond is None else cond & e
            kept = target.join(source_keys, cond, "left_anti")
            merged = kept.unionByName(stamped, allowMissingColumns=True)
            if self.cdc_enabled:
                # change data feed (Delta CDF): matched old rows are
                # update pre-images; source rows split update/insert by
                # the same key probe. O(changes) extra IO, opt-in.
                cdc_added = self._classify_upsert_cdc(
                    target.select(
                        *[
                            c
                            for c in target.columns
                            if c != "_hoodie_file_name"
                        ]
                    ),
                    stamped,
                    version,
                    commit_time,
                )
        else:
            merged = stamped
            # every source row is an insert (no affected files): the
            # commit's new data files ARE the change set — Delta CDF's
            # add-only rule, read_changes synthesizes (r7)
            add_only_cdc = self.cdc_enabled
        if self.bucket_count:
            # keep ONE new file per touched bucket: align write tasks
            # to buckets (an unaligned shuffle output would cross every
            # task with every bucket dir)
            merged = merged.withColumn(
                "__bko", self._bucket_expr()
            ).repartition(
                int(self.bucket_count), F.col("__bko")
            ).drop("__bko")
        new_files = self._write_files(merged, f"c{version:05d}")
        commit = mf.Commit(
            version=version,
            action="upsert",
            commit_time=commit_time,
            files=untouched + new_files,
            log_files=[],
            stats={
                "rewritten_files": len(affected),
                "carried_over_files": len(untouched),
                "bucket_skipped_files": len(bucket_skipped),
                "key_range_skipped_files": len(range_skipped),
                "bloom_skipped_files": len(bloom_skipped),
                "record_index_skipped_files": len(ri_skipped),
                "written_files": len(new_files),
                **({"cdc_add_only": True} if add_only_cdc else {}),
                **(extra_stats or {}),
            },
            ri_files=prev.ri_files
            + self._write_record_index(new_files, version),
            # DV entries for untouched files stay live; entries naming
            # rewritten files are inert (the file left the live set)
            dv_files=list(prev.dv_files),
            txn=new_txn,
            cdc_files=cdc_added,
            table_schema=table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(new_files, carry_from=prev,
                                 carried=untouched),
        )
        commit = self._publish(commit)
        return commit

    def upsert_quarantine(
        self, source: DataFrame
    ) -> tuple[mf.Commit, DataFrame]:
        """Constraint-quarantine upsert: rows satisfying every CHECK
        constraint are applied as a normal upsert; violating rows are
        RETURNED (with a ``violated_constraints`` name array) instead of
        failing the batch — the pipeline idiom where bad records route
        to a quarantine sink rather than abort the load. One map-only
        predicate split; no extra shuffle."""
        self._refresh_meta()
        source = self._apply_generated(self._physical(source))
        if self.precombine is not None:
            source = precombine_dedup(
                source, self._resolution_cols(), self.precombine,
                self.tiebreakers,
            )
        valid, bad = self._split_constraints(source)
        return self.upsert(valid, _validated=True), bad

    def _split_constraints(
        self, df: DataFrame
    ) -> tuple[DataFrame, DataFrame]:
        """(valid rows, violating rows + violated_constraints names).
        Standard CHECK semantics: a row violates only when a predicate
        is FALSE; NULL passes."""
        checks = {n: F.expr(p) for n, p in self.constraints.items()}
        ok = F.lit(True)
        for c in checks.values():
            ok = ok & F.coalesce(c, F.lit(True))
        names = F.array_compact(
            F.array(
                *[
                    F.when(~F.coalesce(c, F.lit(True)), F.lit(n))
                    for n, c in checks.items()
                ]
            )
        )
        if not checks:
            names = F.array().cast("array<string>")
        return (
            df.filter(ok),
            df.filter(~ok).withColumn("violated_constraints", names),
        )

    def _apply_generated(self, df: DataFrame) -> DataFrame:
        """Delta GENERATED ALWAYS AS columns: absent generated columns
        are COMPUTED from their expression (one codegen'd projection —
        how a generated partition column derives on every write);
        provided values are VALIDATED against the expression and the
        batch is rejected on any mismatch, exactly Delta's contract.
        Expressions keep their creation-time (physical) spelling, like
        constraints."""
        for col, expr in self.generated_columns.items():
            if col not in df.columns:
                df = df.withColumn(col, F.expr(expr))
            else:
                bad = df.filter(
                    ~F.col(col).eqNullSafe(F.expr(expr))
                ).limit(1)
                if bad.count() > 0:
                    raise ValueError(
                        f"generated column {col!r} provided with values "
                        f"that do not match its expression {expr!r}: "
                        f"batch rejected"
                    )
        return df

    def _enforce_constraints(self, df: DataFrame) -> DataFrame:
        """Delta CHECK-constraint behavior: reject the whole batch if
        any written row violates a constraint."""
        if not self.constraints:
            return df
        _valid, bad = self._split_constraints(df)
        sample = bad.select("violated_constraints").limit(1).collect()
        if sample:
            raise ValueError(
                "CHECK constraint violation "
                f"{sorted(set(sample[0][0]))}: batch rejected "
                f"(constraints: {self.constraints})"
            )
        return df

    def delete(self, keys: DataFrame) -> mf.Commit:
        """Hard delete by key (Hudi DELETE operation / Delta DELETE):
        rewrite only the files that can hold the keys (same partition +
        key-range pruning as upsert), anti-joining the keys out.
        Physical erasure of prior versions then requires ``vacuum`` —
        the MVCC property the reference calls out (README.md:1240).

        MoR tables compact first (folding logs into a base) so the
        delete is a base-file rewrite — equivalent to Hudi deleting via
        a compaction-scheduled plan; a log-tombstone fast path would be
        the next refinement if delete latency ever matters."""
        self._refresh_meta()
        prev = self._commit_for_write()
        if self.table_type == MERGE_ON_READ and prev.log_files:
            self.compact()
            prev = self._commit_for_write()  # the compaction commit
        commit_time = mf.make_commit_time()
        version = prev.version + 1
        kcols = self._resolution_cols()
        # the caller's key frame is often a full table-read pipeline
        # (delete WHERE <pred> passes t.read().filter(...)); it is
        # consumed 2-3 times below (partition split / range-bloom
        # probes / the delete join itself) — one lazy localCheckpoint
        # materializes the O(deleted keys) distinct set on first use
        # instead of re-running the caller's scan per consumer (r14,
        # guide §5: at scale each re-evaluation is a full scan)
        keys = (
            self._physical(keys).select(*kcols).distinct()
            .localCheckpoint(eager=False)
        )
        affected, untouched = self._split_affected(prev.files, keys)
        stamped_keys = self._stamp_meta(keys, commit_time)
        if self.bucket_count:
            affected, bucket_skipped = self._split_bucket_affected(
                affected, stamped_keys
            )
            untouched = untouched + bucket_skipped
        affected, range_skipped = self._probe_key_hits(
            affected, prev.key_ranges, stamped_keys
        )
        untouched = untouched + range_skipped
        if self.bloom_index:
            affected, bloom_skipped = self._probe_bloom_hits(
                affected, prev.key_blooms, stamped_keys
            )
            untouched = untouched + bloom_skipped

        cond = None
        for c in kcols:
            e = F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
            cond = e if cond is None else cond & e

        if self.deletion_vectors:
            # merge-on-read delete: no base file is rewritten — record
            # the matched ROW POSITIONS as an O(deleted rows) sidecar.
            # The pruned `affected` scan reads only key columns +
            # _metadata (column pruning), so the write cost is
            # O(candidate files' keys), the commit is an append.
            dv_added: list[str] = []
            cdc_added: list[str] = []
            if affected:
                # project the row position BEFORE the DV anti-join —
                # _metadata resolves on the scan's project chain, not
                # reliably through a join's output
                target = self._apply_dvs(
                    self._read_parquet(affected, prev)
                    .withColumn("__file", self._dv_file_col())
                    .withColumn("__pos", F.col("_metadata.row_index")),
                    prev,
                )
                matched = target.alias("t").join(
                    F.broadcast(keys.alias("s")), cond, "left_semi"
                )
                hits = matched.select(
                    F.col("__file").alias("file_name"),
                    F.col("__pos").alias("pos"),
                )
                dv_added = self._write_dv_files(hits, f"c{version:05d}")
                if self.cdc_enabled:
                    cdc_added = self._write_cdc_files(
                        matched.drop("__file", "__pos").withColumn(
                            "_change_type", F.lit("delete")
                        ),
                        version,
                        commit_time,
                    )
            commit = mf.Commit(
                version=version,
                action="delete",
                commit_time=commit_time,
                files=prev.files,
                log_files=[],
                stats={
                    "rewritten_files": 0,
                    "dv_candidate_files": len(affected),
                    "dv_files_added": len(dv_added),
                    "key_range_skipped_files": len(range_skipped),
                },
                key_ranges=prev.key_ranges,
                col_stats=prev.col_stats,
                row_counts=prev.row_counts,
                key_blooms=prev.key_blooms,
                column_blooms=prev.column_blooms,
                dv_files=prev.dv_files + dv_added,
                txn=dict(prev.txn),
                cdc_files=cdc_added,
                ri_files=list(prev.ri_files),
                table_schema=prev.table_schema,
                column_mapping=dict(prev.column_mapping),
            )
            commit = self._publish(commit)
            return commit

        new_files: list[str] = []
        cdc_added = []
        if affected:
            target = self._apply_dvs(
                self._read_parquet(affected, prev), prev
            ).alias("t")
            kept = target.join(
                F.broadcast(keys.alias("s")), cond, "left_anti"
            )
            new_files = self._write_files(kept, f"c{version:05d}")
            if self.cdc_enabled:
                cdc_added = self._write_cdc_files(
                    target.join(
                        F.broadcast(keys.alias("s")), cond, "left_semi"
                    ).withColumn("_change_type", F.lit("delete")),
                    version,
                    commit_time,
                )
        commit = mf.Commit(
            version=version,
            action="delete",
            commit_time=commit_time,
            files=untouched + new_files,
            log_files=[],
            stats={
                "rewritten_files": len(affected),
                "key_range_skipped_files": len(range_skipped),
            },
            dv_files=list(prev.dv_files),
            txn=dict(prev.txn),
            cdc_files=cdc_added,
            ri_files=prev.ri_files
            + self._write_record_index(new_files, version),
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(new_files, carry_from=prev,
                                 carried=untouched),
        )
        commit = self._publish(commit)
        return commit

    def _optimize_partition(
        self,
        prev: mf.Commit,
        value: str,
        target_files: int | None,
        cluster_by: list[str] | None,
        zorder_by: list[str] | None,
    ) -> mf.Commit:
        """Delta ``OPTIMIZE t WHERE part = v``: rewrite ONE partition's
        files, carry every other file with its skipping indexes intact
        — at 100 TB the difference between touching the hot partition
        and rewriting the table. Deletion vectors on the rewritten
        files materialize (their old entries reference dead file names
        and simply never match again); DVs on carried files stay live.
        MoR log files must be compacted first (they are unindexed by
        partition), and spec-evolved tables are refused — a value means
        different things under different specs."""
        if not self.partition_by:
            raise ValueError("where_partition requires a partitioned table")
        if len(self.partition_specs) > 1:
            raise ValueError(
                "where_partition on a spec-evolved table is ambiguous; "
                "run a full optimize to converge the layout first"
            )
        if prev.log_files:
            raise RuntimeError("compact() MoR log files before a scoped "
                               "optimize")
        scoped = [
            f for f in prev.files if self._partition_value_of(f) == value
        ]
        if not scoped:
            return prev
        carried = [f for f in prev.files if f not in set(scoped)]
        df = self._apply_dvs(self._read_parquet(scoped, prev), prev)
        cluster_by = (
            [self._phys_name(c, prev) for c in cluster_by]
            if cluster_by
            else None
        )
        zorder_by = (
            [self._phys_name(c, prev) for c in zorder_by]
            if zorder_by
            else None
        )
        n = target_files or 1
        if zorder_by:
            z, _zb = self._morton_key(df, zorder_by)
            df = (
                df.withColumn("__z", z)
                .repartitionByRange(n, F.col("__z"))
                .sortWithinPartitions("__z", *zorder_by)
                .drop("__z")
            )
        elif cluster_by:
            df = df.repartitionByRange(
                n, *[F.col(c) for c in cluster_by]
            ).sortWithinPartitions(*cluster_by)
        else:
            df = df.coalesce(n)
        if self.bucket_count:
            # mirror optimize()'s bucket branch: align tasks to buckets
            # so _write_files' partitionBy(__bk) emits ONE file per
            # bucket — a range/hash-repartitioned df would cross every
            # task with every bucket dir (tasks x buckets files),
            # defeating target_files. Cluster/z-order intent degrades
            # gracefully to sort-within-bucket.
            sort_cols = (cluster_by or []) + (zorder_by or [])
            df = df.withColumn("__bko", self._bucket_expr()).repartition(
                min(n, int(self.bucket_count)), F.col("__bko")
            )
            if sort_cols:
                df = df.sortWithinPartitions("__bko", *sort_cols)
            df = df.drop("__bko")
        version = prev.version + 1
        new_files = self._write_files(df, f"c{version:05d}")
        commit = mf.Commit(
            version=version,
            action="optimize",
            commit_time=mf.make_commit_time(),
            files=carried + new_files,
            log_files=[],
            stats={
                "optimize_where": f"{self.partition_by}={value}",
                "before_files": len(prev.files),
                "rewritten_files": len(scoped),
                "carried_over_files": len(carried),
                "after_files": len(new_files),
            },
            dv_files=list(prev.dv_files),
            txn=dict(prev.txn),
            ri_files=prev.ri_files
            + self._write_record_index(new_files, version),
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(
                new_files, carry_from=prev, carried=carried
            ),
        )
        return self._publish(commit)

    def compact(self) -> mf.Commit:
        """MoR compaction: fold log files into a fresh base (the async
        compaction the reference schedules, README.md:605,918)."""
        if self.table_type != MERGE_ON_READ:
            raise ValueError("compact() applies to merge-on-read tables")
        prev = self._commit_for_write()
        if not prev.log_files:
            return prev
        rt = self._read_rt_physical()  # files keep PHYSICAL names
        version = prev.version + 1
        commit_time = mf.make_commit_time()
        if self.bucket_count:
            # one output file per bucket (see optimize's bucket note)
            rt = rt.withColumn("__bko", self._bucket_expr()).repartition(
                int(self.bucket_count), F.col("__bko")
            ).drop("__bko")
        files = self._write_files(rt, f"c{version:05d}")
        commit = mf.Commit(
            version=version,
            action="compact",
            commit_time=commit_time,
            files=files,
            log_files=[],
            stats={"compacted_log_files": len(prev.log_files)},
            txn=dict(prev.txn),
            ri_files=self._write_record_index(files, version),
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(files),
        )
        commit = self._publish(commit)
        return commit

    # ------------------------------------------------------------------ #
    # maintenance (D7 / D8)
    # ------------------------------------------------------------------ #

    def optimize(
        self,
        target_files: int | None = None,
        cluster_by: list[str] | None = None,
        zorder_by: list[str] | None = None,
        incremental: bool = False,
        where_partition=None,
    ) -> mf.Commit:
        """D8 OPTIMIZE: compact small files into ~target_files per
        partition (the reference's file-compaction maintenance,
        README.md:1240). ``cluster_by`` additionally sorts rows within
        files (linear clustering): parquet row-group min/max stats on
        the clustered columns become selective, so point/range scans on
        them skip most of the table. ``zorder_by`` instead interleaves
        MULTIPLE numeric dimensions (Delta ``ZORDER BY``): each column
        is quantile-bucketed (driver-side ``approxQuantile`` — bounded
        Greenwald-Khanna sketch, the same sampling family the range
        partitioner uses) and the bucket bits interleaved into a Morton
        key; files then carry tight [min,max] on EVERY z-dimension, so
        ``read_where`` prunes on any of them — linear clustering can
        only ever serve its leading column.

        ``incremental=True`` (Delta liquid-clustering economics, with
        ``cluster_by`` only): restack ONLY the files written since the
        last clustering commit with the same spec — O(new data) per
        maintenance run instead of O(table), the difference between a
        nightly touch-up and a multi-PB rewrite at 100 TB. Each run
        adds one internally-disjoint file GENERATION; a selective read
        then hits ~1 file per generation (vs 1 after a full recluster),
        and a periodic full ``optimize(cluster_by=...)`` collapses the
        generations. Already-clustered files are carried over with
        their skipping indexes; deletion vectors on them stay live."""
        if cluster_by and zorder_by:
            raise ValueError("cluster_by and zorder_by are exclusive")
        prev = self._commit_for_write()
        if where_partition is not None:
            if incremental:
                raise ValueError(
                    "where_partition and incremental are exclusive "
                    "(a scoped restack is not a clustering generation)"
                )
            return self._optimize_partition(
                prev, str(where_partition), target_files, cluster_by,
                zorder_by,
            )
        if incremental:
            return self._optimize_incremental(
                prev, target_files, cluster_by, zorder_by
            )
        df = self._read_physical()  # MoR folds logs; PHYSICAL names
        # callers address cluster/z-order columns by LOGICAL name
        cluster_by = (
            [self._phys_name(c, prev) for c in cluster_by]
            if cluster_by
            else cluster_by
        )
        zorder_by = (
            [self._phys_name(c, prev) for c in zorder_by]
            if zorder_by
            else zorder_by
        )
        version = prev.version + 1
        commit_time = mf.make_commit_time()
        n = target_files or 1
        zbounds: dict[str, list[float]] = {}
        if zorder_by:
            z, zbounds = self._morton_key(df, zorder_by)
            df = df.withColumn("__z", z)
            range_cols = (
                [self.partition_by] if self.partition_by else []
            ) + ["__z"]
            df = (
                df.repartitionByRange(n, *[F.col(c) for c in range_cols])
                .sortWithinPartitions(*range_cols, *zorder_by)
                .drop("__z")
            )
        elif cluster_by:
            # Range-partition on (partition, cluster cols) so FILES get
            # DISJOINT key ranges — row-group min/max stats and the
            # key_ranges file-skipping index both become selective.
            # (coalesce+sort would only sort within files, leaving every
            # file spanning nearly the full key space.)
            range_cols = (
                [self.partition_by] if self.partition_by else []
            ) + cluster_by
            df = df.repartitionByRange(n, *[F.col(c) for c in range_cols])
            df = df.sortWithinPartitions(*range_cols)
        elif self.partition_by:
            df = df.repartition(n, F.col(self.partition_by))
        else:
            df = df.coalesce(n)
        if self.bucket_count:
            # bucket-index tables: align tasks to buckets so the write's
            # partitionBy(__bk) emits ONE file per bucket (a range- or
            # hash-repartitioned df would cross every task with every
            # bucket dir -> tasks x buckets files). Cluster/z-order
            # intent degrades gracefully to sort-within-bucket.
            sort_cols = (cluster_by or []) + (zorder_by or [])
            df = df.withColumn("__bko", self._bucket_expr()).repartition(
                min(n, int(self.bucket_count)), F.col("__bko")
            )
            if sort_cols:
                df = df.sortWithinPartitions("__bko", *sort_cols)
            df = df.drop("__bko")
        files = self._write_files(df, f"c{version:05d}")
        stats: dict = {"before_files": len(prev.files), "after_files": len(files)}
        if cluster_by:
            # record the clustering generation so incremental runs can
            # tell clustered files from later, unclustered arrivals
            stats["cluster_spec"] = ",".join(cluster_by)
            stats["clustered_output"] = files
        elif zorder_by:
            # same for z-order, plus the quantile boundaries: an
            # incremental run must bucket with the SAME boundaries or
            # its Morton keys would live on a different curve
            stats["zorder_spec"] = ",".join(zorder_by)
            stats["clustered_output"] = files
            stats["zorder_bounds"] = zbounds
        commit = mf.Commit(
            version=version,
            action="optimize",
            commit_time=commit_time,
            files=files,
            log_files=[],
            stats=stats,
            txn=dict(prev.txn),
            ri_files=self._write_record_index(files, version),
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(files),
        )
        commit = self._publish(commit)
        return commit

    def reorg_purge(self, min_deleted_ratio: float = 0.05):
        """Delta ``REORG TABLE ... APPLY (PURGE)``: materialize
        deletion vectors ONLY for files whose deleted-row fraction has
        crossed ``min_deleted_ratio`` — the compaction half of the DV
        lifecycle. A DV keeps each delete O(deleted rows) at write
        time, but a mostly-dead file keeps paying full scan IO for
        rows the anti-join discards; purge rewrites exactly those
        files with their vectors applied, drops the now-dead vector
        rows from the sidecar set, and carries every sparse file (and
        its live DVs) untouched. O(purged bytes + deleted rows), never
        O(table) — at 100 TB the difference between a nightly
        touch-up and a full rewrite. Files without a recorded row
        count (rare adopted edges) are conservatively left alone.
        Returns ``None`` without committing when nothing crosses the
        threshold, so schedulers can call it unconditionally."""
        if not 0 < min_deleted_ratio <= 1:
            raise ValueError("min_deleted_ratio must be in (0, 1]")
        self._refresh_meta()
        prev = self._commit_for_write()
        if not prev.dv_files:
            return None
        dv = self.spark.read.parquet(
            *[fsio.resolve(self.path, f) for f in prev.dv_files]
        ).select("file_name", "pos")
        # per-file deleted counts: O(deleted rows) in, O(files) out
        per_file = {
            r["file_name"]: r["n"]
            for r in dv.groupBy("file_name").agg(
                F.count_distinct("pos").alias("n")
            ).collect()
        }
        live = set(prev.files)
        victims = sorted(
            f
            for f, dead in per_file.items()
            if f in live
            and prev.row_counts.get(f)
            and dead / prev.row_counts[f] >= min_deleted_ratio
        )
        if not victims:
            return None
        version = prev.version + 1
        commit_time = mf.make_commit_time()
        rewritten = self._apply_dvs(
            self._read_parquet(victims, prev), prev
        )
        new_files = self._write_files(rewritten, f"c{version:05d}")
        vset = set(victims)
        untouched = [f for f in prev.files if f not in vset]
        # shed the purged vectors: keep only rows naming surviving
        # files (Delta's purge drops the DV descriptors with the
        # rewrite) — one O(deleted rows) filter, empty set drops the
        # sidecars entirely
        surviving = dv.filter(
            F.col("file_name").isin([f for f in untouched if f in per_file])
        )
        new_dvs: list[str] = []
        if any(f in per_file for f in untouched):
            new_dvs = self._write_dv_files(surviving, f"c{version:05d}")
        commit = mf.Commit(
            version=version,
            action="purge",
            commit_time=commit_time,
            files=untouched + new_files,
            log_files=prev.log_files,
            stats={
                "purged_files": len(victims),
                "carried_over_files": len(untouched),
                "written_files": len(new_files),
                "purged_dv_rows": sum(
                    per_file[f] for f in victims
                ),
            },
            dv_files=new_dvs,
            txn=dict(prev.txn),
            ri_files=prev.ri_files
            + self._write_record_index(new_files, version),
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(new_files, carry_from=prev,
                                 carried=untouched),
        )
        return self._publish(commit)

    def _optimize_incremental(
        self,
        prev: mf.Commit,
        target_files: int | None,
        cluster_by: list[str] | None,
        zorder_by: list[str] | None = None,
    ) -> mf.Commit:
        """Liquid-style incremental clustering: restack only files not
        produced by a prior clustering commit with the same spec. See
        ``optimize``. Works for linear clustering AND z-order — the
        z-order variant reuses the quantile boundaries recorded by the
        last FULL z-order commit, so every generation buckets on the
        same Morton curve (fresh boundaries would put the same value in
        different buckets across generations, quietly breaking the
        files' z-range disjointness). CoW only — compact MoR logs first
        (the log fold would force a full-table window anyway)."""
        if not cluster_by and not zorder_by:
            raise ValueError("incremental optimize requires cluster_by")
        if cluster_by and zorder_by:
            raise ValueError("cluster_by and zorder_by are exclusive")
        if prev.log_files:
            raise RuntimeError(
                "incremental optimize on a MoR table with pending log "
                "files — run compact() first"
            )
        spec_key = "cluster_spec" if cluster_by else "zorder_spec"
        phys = [
            self._phys_name(c, prev) for c in (cluster_by or zorder_by)
        ]
        spec = ",".join(phys)
        clustered: set[str] = set()
        zbounds: dict[str, list[float]] | None = None
        for c in self.history():
            if c.action == "optimize" and c.stats.get(spec_key) == spec:
                clustered |= set(c.stats.get("clustered_output", ()))
                if c.stats.get("zorder_bounds"):
                    zbounds = c.stats["zorder_bounds"]
        if zorder_by and zbounds is None:
            raise RuntimeError(
                "incremental z-order needs a prior full "
                "optimize(zorder_by=...) to pin the quantile boundaries"
            )
        carried = [f for f in prev.files if f in clustered]
        stale = [f for f in prev.files if f not in clustered]
        if not stale:
            return prev  # clustering is already current: zero-IO no-op
        version = prev.version + 1
        commit_time = mf.make_commit_time()
        df = self._apply_dvs(self._read_parquet(stale, prev), prev).drop(
            "_hoodie_file_name"
        )
        part_cols = [self.partition_by] if self.partition_by else []
        if zorder_by:
            z, _ = self._morton_key(df, phys, bounds_by_col=zbounds)
            range_cols = part_cols + ["__z"]
            df = (
                df.withColumn("__z", z)
                .repartitionByRange(
                    target_files or 1, *[F.col(c) for c in range_cols]
                )
                .sortWithinPartitions(*range_cols, *phys)
                .drop("__z")
            )
        else:
            range_cols = part_cols + phys
            df = df.repartitionByRange(
                target_files or 1, *[F.col(c) for c in range_cols]
            ).sortWithinPartitions(*range_cols)
        new_files = self._write_files(df, f"c{version:05d}")
        stats = {
            "mode": "incremental",
            spec_key: spec,
            "clustered_output": new_files,
            "restacked_files": len(stale),
            "carried_files": len(carried),
        }
        if zorder_by:
            stats["zorder_bounds"] = zbounds
        commit = mf.Commit(
            version=version,
            action="optimize",
            commit_time=commit_time,
            files=carried + new_files,
            log_files=[],
            stats=stats,
            # DVs on carried files stay live; entries naming restacked
            # files just became inert (their file left the live set)
            dv_files=list(prev.dv_files),
            txn=dict(prev.txn),
            ri_files=prev.ri_files
            + self._write_record_index(new_files, version),
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
            **self._index_fields(new_files, carry_from=prev, carried=carried),
        )
        return self._publish(commit)

    _Z_BITS = 4  # quantile buckets per dimension = 2**_Z_BITS

    def _morton_key(
        self,
        df: DataFrame,
        cols: list[str],
        bounds_by_col: dict[str, list[float]] | None = None,
    ):
        """Morton (Z-order) key: quantile-bucket each numeric column
        into ``2**_Z_BITS`` ranks, then interleave the rank bits. The
        quantile boundaries come from ONE driver-side ``approxQuantile``
        pass (mergeable sketch, O(1) driver memory at any scale); the
        per-row bucket/interleave math is pure codegen'd JVM column
        arithmetic. Nulls land in bucket 0. Bucketing by rank (not raw
        value) makes the curve robust to skewed distributions — every
        bucket holds ~1/16th of the rows regardless of the value
        histogram."""
        nbuckets = 1 << self._Z_BITS
        probs = [i / nbuckets for i in range(1, nbuckets)]
        zsum = F.lit(0)
        out_bounds: dict[str, list[float]] = {}
        for j, c in enumerate(cols):
            dcol = F.col(c).cast("double")
            if bounds_by_col is not None and c in bounds_by_col:
                bounds = list(bounds_by_col[c])
            else:
                qs = df.select(dcol.alias("v")).approxQuantile(
                    "v", probs, 0.01
                )
                # strictly-increasing boundary subset (ties collapse
                # buckets)
                bounds = []
                for q in qs:
                    if not bounds or q > bounds[-1]:
                        bounds.append(q)
            out_bounds[c] = bounds
            bucket = F.lit(0)
            for b in bounds:
                bucket = bucket + F.when(dcol >= F.lit(b), 1).otherwise(0)
            for i in range(self._Z_BITS):
                bit = F.shiftright(bucket, i).bitwiseAND(F.lit(1))
                zsum = zsum + F.shiftleft(bit, i * len(cols) + j)
        return zsum, out_bounds

    def _savepoints_path(self) -> str:
        return fsio.join(self.path, "_savepoints.json")

    def savepoints(self) -> dict[int, str]:
        """version -> label of every live savepoint."""
        try:
            return {
                int(k): v
                for k, v in json.loads(
                    fsio.read_pointer_text(self._savepoints_path(), attempts=2)
                ).items()
            }
        except FileNotFoundError:
            return {}

    def savepoint(self, version: int | None = None, label: str = "") -> int:
        """Hudi savepoint: pin a version so VACUUM never collects the
        files it references — the restore point that survives retention.
        Metadata-only (a JSON entry); ``restore`` to a savepointed
        version is then guaranteed to succeed regardless of vacuum
        history. ``delete_savepoint`` releases the pin."""
        if version is None:
            version = self._commit(None).version
        if version not in mf.list_versions(self.path):
            raise ValueError(f"no such version: {version}")
        sp = self.savepoints()
        sp[version] = label
        fsio.write_atomic(
            self._savepoints_path(),
            json.dumps({str(k): v for k, v in sp.items()}),
        )
        return version

    def delete_savepoint(self, version: int) -> None:
        sp = self.savepoints()
        sp.pop(version, None)
        fsio.write_atomic(
            self._savepoints_path(),
            json.dumps({str(k): v for k, v in sp.items()}),
        )

    def vacuum(
        self,
        retain_versions: int = 1,
        dry_run: bool = False,
        retain_hours: float | None = None,
    ) -> dict:
        """D7 VACUUM: physically delete data files not referenced by the
        newest ``retain_versions`` commits (README.md:1240: old files
        remain until vacuum) — nor by any SAVEPOINTED version (Hudi
        savepoint semantics: pinned versions survive retention).
        ``dry_run`` (Delta ``VACUUM ... DRY RUN``) lists what WOULD be
        deleted without touching anything.

        ``retain_hours`` (Delta ``VACUUM ... RETAIN n HOURS``, default
        retention ``delta.deletedFileRetentionDuration``): additionally
        retains every version whose commit time falls within the last
        n hours — the time-travel-safety contract Delta enforces so
        readers as-of a recent timestamp never lose their files. The
        retention sets UNION (a version survives if either rule keeps
        it): versions, hours, and savepoints."""
        versions = mf.list_versions(self.path)
        retained = versions[-max(1, retain_versions):]
        if retain_hours is not None:
            cutoff_ms = int(time.time() * 1000) - int(
                retain_hours * 3600 * 1000
            )
            cutoff = (
                time.strftime(
                    "%Y%m%d%H%M%S", time.gmtime(cutoff_ms / 1000)
                )
                + f"{cutoff_ms % 1000:03d}"
            )
            retained += [
                v
                for v in versions
                if mf.read_commit(self.path, v).commit_time >= cutoff
            ]
        retained = sorted(set(retained) | set(self.savepoints()))
        keep: set[str] = set()
        for v in retained:
            c = mf.read_commit(self.path, v)
            keep.update(c.files)
            keep.update(c.log_files)
            keep.update(c.cdc_files)
            keep.update(c.dv_files)
            keep.update(c.ri_files)
        doomed: list[str] = []
        would_remove: list[str] = []
        for sub in ("data", "log", "cdc", "dv", "_index"):
            root = fsio.join(self.path, sub)
            for full in fsio.walk_files(root, ".parquet"):
                rel = fsio.relpath(full, self.path)
                if rel not in keep:
                    would_remove.append(rel)
                    doomed.append(full)
        if dry_run:
            return {
                "would_remove_files": sorted(would_remove),
                "retained_versions": retained,
            }
        if len(doomed) > VACUUM_DISTRIBUTED_THRESHOLD:
            # large expirations delete executor-side: O(files/slices)
            # wall time instead of O(files) serial driver RPCs
            removed = _distributed_remove(self.spark, doomed)
        else:
            for full in doomed:
                fsio.remove(full)
            removed = len(doomed)
        return {"removed_files": removed, "retained_versions": retained}

    def fsck(self, dry_run: bool = False) -> dict:
        """Delta ``FSCK REPAIR TABLE``: find live-snapshot manifest
        entries whose underlying files have VANISHED (deleted behind the
        table's back — lifecycle rules, manual cleanup, a partial
        restore) and, unless ``dry_run``, publish a repair commit that
        drops the dead references so snapshot reads stop failing with
        ``FileNotFoundException``. Rows that lived only in a vanished
        file are lost — exactly Delta's FSCK contract — but every
        surviving file keeps serving, and history is preserved (the
        repair is an ordinary commit; time travel BEFORE it still sees
        the dead references, as in Delta).

        Discovery is LISTING-driven for table-rooted entries — one
        recursive listing per storage subdir, the same object-store
        prefix-LIST economics as ``vacuum`` (O(files/page) RPCs), never
        a HEAD per manifest entry; only entries resolving OUTSIDE the
        table root (shallow-clone references into a source table) fall
        back to a per-file existence probe, and those are rare by
        construction. Skipping indexes (key ranges, col stats, row
        counts, blooms) are pruned alongside their files so
        metadata-only aggregation can never answer from a dead entry."""
        prev = self._commit_for_write()
        present: set[str] = set()
        for sub in ("data", "log", "dv", "_index", "cdc"):
            for full in fsio.walk_files(fsio.join(self.path, sub)):
                present.add(fsio.relpath(full, self.path))

        def _missing(entries: list[str]) -> list[str]:
            out = []
            for e in entries:
                if fsio.is_external_entry(e):
                    if not fsio.exists(fsio.resolve(self.path, e)):
                        out.append(e)
                elif e not in present:
                    out.append(e)
            return out

        dead = {
            "files": _missing(prev.files),
            "log_files": _missing(prev.log_files),
            "dv_files": _missing(prev.dv_files),
            "ri_files": _missing(prev.ri_files),
        }
        # CDF sidecars are per-HISTORICAL-commit references that
        # `read_changes` replays; a vanished one can't be dropped from
        # the live snapshot (history is immutable), so FSCK REPORTS it
        # — the operator learns which version ranges read_changes will
        # refuse — but never counts it toward the repair commit.
        cdc_refs = sorted(
            {
                f
                for v in mf.list_versions(self.path)
                for f in mf.read_commit(self.path, v).cdc_files
            }
        )
        dead_cdc = _missing(cdc_refs)
        n_dead = sum(len(v) for v in dead.values())
        dead["cdc_files"] = dead_cdc
        if dry_run or n_dead == 0:
            return {"missing": dead, "repaired": False}
        gone = set(dead["files"])
        commit = mf.Commit(
            version=prev.version + 1,
            action="fsck",
            commit_time=mf.make_commit_time(),
            files=[f for f in prev.files if f not in gone],
            log_files=[
                f for f in prev.log_files if f not in set(dead["log_files"])
            ],
            stats={"fsck_removed": n_dead, **{k: v for k, v in dead.items() if v}},
            key_ranges={k: v for k, v in prev.key_ranges.items() if k not in gone},
            col_stats={k: v for k, v in prev.col_stats.items() if k not in gone},
            row_counts={k: v for k, v in prev.row_counts.items() if k not in gone},
            key_blooms={k: v for k, v in prev.key_blooms.items() if k not in gone},
            column_blooms={
                k: v for k, v in prev.column_blooms.items() if k not in gone
            },
            dv_files=[
                f for f in prev.dv_files if f not in set(dead["dv_files"])
            ],
            txn=dict(prev.txn),
            ri_files=[
                f for f in prev.ri_files if f not in set(dead["ri_files"])
            ],
            table_schema=prev.table_schema,
            column_mapping=dict(prev.column_mapping),
        )
        self._publish(commit)
        return {"missing": dead, "repaired": True}

    def restore(self, version: int) -> mf.Commit:
        """Delta ``RESTORE TABLE ... VERSION AS OF`` / Hudi
        savepoint-rollback: append a NEW commit that points back at an
        earlier version's file set. History is preserved — the restore
        is itself a commit, so it can be time-traveled past or restored
        again — and no data files are copied: restore is O(1) metadata
        regardless of table size. The file-skipping indexes (key ranges
        + column stats) come along from the target commit. Raises if
        vacuum already removed any file the target version references
        (Delta errors identically)."""
        target = mf.read_commit(self.path, version)
        missing = [
            f
            for f in [*target.files, *target.log_files, *target.dv_files]
            if not fsio.exists(fsio.resolve(self.path, f))
        ]
        if missing:
            raise RuntimeError(
                f"cannot restore {self.path} to version {version}: "
                f"{len(missing)} referenced file(s) vacuumed, "
                f"e.g. {missing[0]}"
            )
        prev = self._commit(None)
        commit = mf.Commit(
            version=prev.version + 1,
            action="restore",
            commit_time=mf.make_commit_time(),
            files=list(target.files),
            log_files=list(target.log_files),
            stats={"restored_version": version},
            key_ranges=dict(target.key_ranges),
            col_stats=dict(target.col_stats),
            row_counts=dict(target.row_counts),
            key_blooms=dict(target.key_blooms),
            column_blooms=dict(target.column_blooms),
            dv_files=list(target.dv_files),
            # writer watermarks never rewind: carry the LATEST txn map,
            # not the restore target's (stream progress is not data)
            txn=dict(prev.txn),
            ri_files=list(target.ri_files),
            table_schema=target.table_schema,
            # schema follows the restored version (Delta RESTORE
            # restores data AND schema): take the TARGET's mapping
            column_mapping=dict(target.column_mapping),
        )
        commit = self._publish(commit)
        return commit

    # ------------------------------------------------------------------ #
    # internals
    # ------------------------------------------------------------------ #

    def _resolution_cols(self) -> list[str]:
        """Key columns for upsert/merge resolution. Non-global index
        (default): the partition column participates, so key uniqueness
        is scoped to the partition (Hudi SIMPLE/BLOOM index semantics).
        Global index: the record key alone resolves, table-wide — the
        anti-join, MoR `_rt` window, and precombine dedup all ignore the
        partition, which is what makes partition-change relocation
        work."""
        if self.global_index:
            return list(self.key_cols)
        if self.partition_by and self.partition_by not in self.key_cols:
            return [*self.key_cols, self.partition_by]
        return list(self.key_cols)

    def _commit(self, version: int | None) -> mf.Commit:
        if version is None:
            commit = mf.latest_commit(self.path)
            if commit is None:
                raise RuntimeError(f"no commits in {self.path}")
            return commit
        return mf.read_commit(self.path, version)

    def _commit_for_write(self) -> mf.Commit:
        """Write-planning snapshot: the cached post-commit snapshot when
        this handle has resolved/published before, else one fresh
        resolution. Staleness is safe BY CONSTRUCTION under OCC —
        planning against an old base only means the prepared version
        collides at publish and rebases (or raises
        ``ConcurrentWriteConflict``), the exact window any concurrent
        writer already occupies between read and publish. The payoff is
        object-store economics: a steady-state writer (a foreachBatch
        loop) does ZERO ``_last_checkpoint`` reads and ZERO directory
        LISTs per commit — the put-if-absent publish itself is the
        coherence point. Read paths (``read``/``read_rt``/
        ``read_changes``/``version_as_of``) never use this; they keep
        per-query fresh resolution."""
        if self._latest_commit is None:
            self._latest_commit = self._commit(None)
        # deep copy, same contract as manifest._snapshot_cache: callers
        # feed the dict/list fields straight into their next Commit
        return copy.deepcopy(self._latest_commit)

    def _publish(self, commit: mf.Commit) -> mf.Commit:
        """Publish through OCC and remember the result as the next
        write-planning base. On conflict the cache is dropped so a
        caller's retry starts from a fresh read."""
        try:
            final = mf.append_commit_rebase(self.path, commit)
        except Exception:
            self._latest_commit = None
            raise
        self._latest_commit = copy.deepcopy(final)
        return final

    def _stamp_meta(self, df: DataFrame, commit_time: str) -> DataFrame:
        """§1.5: Hudi's meta columns as ordinary derived columns."""
        key = F.concat_ws("|", *[F.col(k).cast("string") for k in self.key_cols])
        # a global-index delete stamps a keys-only frame that carries no
        # partition column; its _hoodie_partition_path is never read
        pp = (
            F.col(self.partition_by).cast("string")
            if self.partition_by and self.partition_by in df.columns
            else F.lit("")
        )
        out = (
            df.withColumn("_hoodie_commit_time", F.lit(commit_time))
            .withColumn(
                "_hoodie_commit_seqno",
                F.concat_ws("_", F.lit(commit_time), F.monotonically_increasing_id()),
            )
            .withColumn("_hoodie_record_key", key)
            .withColumn("_hoodie_partition_path", pp)
        )
        if self.row_tracking:
            # fresh id at birth (globally unique: commit_time + per-write
            # monotonic id); the upsert merge OVERWRITES this for matched
            # rows with the pre-image's id — Delta row-tracking semantics
            out = out.withColumn("_row_id", F.col("_hoodie_commit_seqno"))
        return out

    def _write_files(
        self, df: DataFrame, commit_dir: str, log: bool = False
    ) -> list[str]:
        sub = "log" if log else "data"
        # "/" not os.path.join: rel_dir is recorded in the MANIFEST,
        # which must be byte-stable across host OSes
        rel_dir = f"{sub}/{commit_dir}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, rel_dir)
        # _hoodie_file_name is a READ-time column (_metadata.file_name);
        # persisting it would accrete a stale column on every rewrite.
        if "_hoodie_file_name" in df.columns:
            df = df.drop("_hoodie_file_name")
        writer = df.write.mode("error")
        part_tokens: list[str] = []
        if self.partition_by and not log:
            # duplicate the partition column into hive-style dirs (__pp=v)
            # while keeping it in the data files -> reads stay plain
            # file-list scans and pruning is a path-prefix filter. After
            # a partition-spec evolution the token carries the spec
            # index (__pp{i}=v) so every file self-identifies which
            # spec laid it out (see evolve_partitioning).
            idx = len(self.partition_specs) - 1
            tok = "__pp" if idx == 0 else f"__pp{idx}"
            df = df.withColumn(tok, F.col(self.partition_by).cast("string"))
            part_tokens.append(tok)
        if self.bucket_count and not log:
            # bucket-index layout: every file belongs to exactly one
            # hash bucket of the record key (__bk= dir). Routing is
            # then arithmetic — see create()'s bucket_count docs.
            df = df.withColumn("__bk", self._bucket_expr())
            part_tokens.append("__bk")
        if part_tokens:
            writer = df.write.mode("error").partitionBy(*part_tokens)
        writer.parquet(out)
        return sorted(
            fsio.relpath(p, self.path)
            for p in fsio.walk_files(out, ".parquet")
        )

    def _file_key_ranges(self, rel_files: list[str]) -> dict[str, list[str]]:
        """Per-file [min, max] of ``_hoodie_record_key`` from parquet
        FOOTERS — metadata-only, O(files) driver work (the same cost
        class as the manifest write itself; Hudi stores the identical
        ranges in its commit metadata for bloom-index pruning).

        Parquet may truncate binary stats: the reported min/max are then
        valid loose BOUNDS, so range pruning stays sound (a file is
        never skipped while holding a matching key)."""
        stats = self._file_column_stats(rel_files, ["_hoodie_record_key"])
        return {
            f: cols["_hoodie_record_key"]
            for f, cols in stats.items()
            if "_hoodie_record_key" in cols
        }

    def _index_fields(
        self,
        new_files: list[str],
        carry_from: mf.Commit | None = None,
        carried: list[str] | None = None,
    ) -> dict:
        """Build the commit's file-skipping index fields: footer stats
        for the NEW files (one pass each) merged with carried-over
        entries from the previous commit for untouched files; plus, on
        ``bloom_index`` tables, an 8 KiB key bloom per new file (one
        extra scan of just-written data)."""
        row_counts: dict[str, int] = {}
        stats = self._file_column_stats(new_files, counts_out=row_counts)
        key_ranges = {
            f: c["_hoodie_record_key"]
            for f, c in stats.items()
            if "_hoodie_record_key" in c
        }
        col_stats = dict(stats)
        key_blooms: dict[str, str] = {}
        if self.bloom_index and new_files:
            from hudi_and_delta_showcase_spark.tables.bloom import (
                build_file_blooms,
            )

            # key blooms by the scan's FULL file path, not the basename:
            # a partitioned write reuses one task's part-file name across
            # every partition directory, so basenames are ambiguous
            scan = self.spark.read.option("mergeSchema", "true").parquet(
                *[fsio.join(self.path, f) for f in new_files]
            ).select(
                F.col("_metadata.file_path").alias("__fp"),
                "_hoodie_record_key",
            )
            wanted = set(new_files)
            root_path = fsio.uri_path(self.path)
            for uri, b64 in build_file_blooms(scan, file_col="__fp").items():
                local = urllib.parse.unquote(urllib.parse.urlparse(uri).path)
                rel = os.path.relpath(local, root_path)
                if rel in wanted:
                    key_blooms[rel] = b64
        column_blooms: dict[str, dict[str, str]] = {}
        if self.bloom_columns and new_files:
            from hudi_and_delta_showcase_spark.tables.bloom import (
                build_file_blooms,
            )

            wanted = set(new_files)
            root_path = fsio.uri_path(self.path)
            for col in self.bloom_columns:
                scan = self.spark.read.option("mergeSchema", "true").parquet(
                    *[fsio.join(self.path, f) for f in new_files]
                ).select(F.col("_metadata.file_path").alias("__fp"), col)
                # xxhash64 is TYPE-dependent, so each bloom records the
                # hashed type beside the bitmap; the probe replays the
                # literal under each recorded type — blooms stay valid
                # across type-widening evolution (legacy narrow files
                # keep narrow-typed blooms, new wide files get wide ones)
                t_str = scan.schema[col].dataType.simpleString()
                for uri, b64 in build_file_blooms(
                    scan, key_col=col, file_col="__fp"
                ).items():
                    local = urllib.parse.unquote(
                        urllib.parse.urlparse(uri).path
                    )
                    rel = os.path.relpath(local, root_path)
                    if rel in wanted:
                        column_blooms.setdefault(rel, {})[col] = [t_str, b64]
        if carry_from is not None:
            for f in carried or []:
                if f in carry_from.key_ranges:
                    key_ranges[f] = carry_from.key_ranges[f]
                if f in carry_from.col_stats:
                    col_stats[f] = carry_from.col_stats[f]
                if f in carry_from.row_counts:
                    row_counts[f] = carry_from.row_counts[f]
                if f in carry_from.key_blooms:
                    key_blooms[f] = carry_from.key_blooms[f]
                if f in carry_from.column_blooms:
                    column_blooms[f] = carry_from.column_blooms[f]
        return {
            "key_ranges": key_ranges,
            "col_stats": col_stats,
            "row_counts": row_counts,
            "key_blooms": key_blooms,
            "column_blooms": column_blooms,
        }

    def _file_column_stats(
        self,
        rel_files: list[str],
        cols: list[str] | None = None,
        counts_out: dict[str, int] | None = None,
    ) -> dict[str, dict[str, list]]:
        """Column-stats index (Hudi col-stats / Delta data skipping):
        per-file [min, max] for each requested column, harvested from
        parquet footers in one pass per file. JSON-stable scalar
        types record directly (str/int/float/bool); timestamp/date
        footer stats record as ISO-8601 strings (r12 — JSON-stable,
        lexicographically time-ordered, coerced back at compare time
        by ``_interval_can_match``'s temporal rule so ts-range
        data-skipping works on ingest tables); other types are left
        unindexed and scanned conservatively.

        ``counts_out`` (if given) receives each readable file's EXACT
        footer row count — the same single footer open feeds both
        indexes, so metadata-only COUNT(*) costs no extra IO."""
        import datetime as _dt

        import pyarrow.parquet as pq

        out: dict[str, dict[str, list]] = {}
        ok = (str, int, float, bool, _dt.date)  # datetime is a date
        for rel in rel_files:
            src = fsio.resolve(self.path, rel)
            try:
                if fsio.is_remote(src):
                    # footer read via pyarrow's own URI-aware FS layer
                    # (file/s3/gcs/hdfs); unsupported schemes fall back
                    # to "unindexed" = conservative full scan
                    import pyarrow.fs as pafs

                    pfs, ppath = pafs.FileSystem.from_uri(src)
                    with pfs.open_input_file(ppath) as fh:
                        md = pq.ParquetFile(fh).metadata
                else:
                    md = pq.ParquetFile(src).metadata
            except Exception:
                continue
            if counts_out is not None:
                counts_out[rel] = md.num_rows
            names = md.schema.names
            # cols=None: index every scalar column, capped at 32 like
            # Delta's default stats collection
            wanted = cols if cols is not None else names[:32]
            per_col: dict[str, list] = {}
            for col in wanted:
                if col not in names:
                    continue
                idx = names.index(col)
                mins, maxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx).statistics
                    if (
                        st is None
                        or st.min is None
                        or st.max is None
                        or not isinstance(st.min, ok)
                    ):
                        mins, maxs = [], []
                        break
                    mins.append(st.min)
                    maxs.append(st.max)
                if mins:
                    lo, hi = min(mins), max(maxs)
                    if isinstance(lo, _dt.datetime):
                        # naive UTC before serializing: aware bounds
                        # would re-parse aware and never compare
                        # against the engine's naive literals
                        if lo.tzinfo is not None:
                            lo = lo.astimezone(
                                _dt.timezone.utc
                            ).replace(tzinfo=None)
                            hi = hi.astimezone(
                                _dt.timezone.utc
                            ).replace(tzinfo=None)
                        lo, hi = lo.isoformat(), hi.isoformat()
                    elif isinstance(lo, _dt.date):
                        lo, hi = lo.isoformat(), hi.isoformat()
                    per_col[col] = [lo, hi]
            if per_col:
                out[rel] = per_col
        return out

    def read_where(
        self,
        col: str,
        lo=None,
        hi=None,
        version: int | None = None,
    ) -> DataFrame:
        """Stats-pruned range read: skip every file whose footer
        [min, max] for ``col`` cannot intersect [lo, hi] (driver-side
        metadata check against the commit's ``col_stats``), then apply
        the exact filter on the surviving scan — where Spark's own
        row-group skipping finishes the job. After
        ``optimize(cluster_by=[col])`` file ranges on ``col`` are
        disjoint, so a selective range reads O(matching files), not
        O(table) — Delta data skipping / Hudi column-stats-index
        semantics on the manifest. Files without recorded stats are
        scanned conservatively; MoR logs are always scanned.

        ``col`` is the LOGICAL name; stats are keyed by physical."""
        from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
            _interval_can_match,
        )

        commit = self._commit(version)
        col = self._phys_name(col, commit)
        keep = []
        for f in commit.files:
            rng = commit.col_stats.get(f, {}).get(col)
            if rng is None:
                keep.append(f)
            # the shared compare: type mismatches scan conservatively
            # and temporal literals coerce against the index's
            # ISO-string bounds (r12)
            elif (
                lo is None or _interval_can_match(rng[0], rng[1], ">=", lo)
            ) and (
                hi is None or _interval_can_match(rng[0], rng[1], "<=", hi)
            ):
                keep.append(f)
        if lo is not None and hi is not None and lo == hi:
            # column-bloom tier (Delta bloomFilter column index): for
            # EQUALITY reads, probe each candidate's per-column bloom.
            # Blooms are grouped by their recorded hash type and the
            # literal is replayed under each type, so blooms built
            # before a type widening still answer correctly (an
            # overflowing narrow cast can only mis-hash for a value the
            # narrow file could not contain anyway).
            by_type: dict[str, dict[str, str]] = {}
            for f in keep:
                ent = commit.column_blooms.get(f, {}).get(col)
                if ent is not None:
                    by_type.setdefault(ent[0], {})[f] = ent[1]
            if by_type:
                from hudi_and_delta_showcase_spark.tables.bloom import (
                    probe_blooms,
                    typed_literal_df,
                )

                hits: set[str] = set()
                for t_str, blooms in by_type.items():
                    keys_df = typed_literal_df(self.spark, col, lo, t_str)
                    hits |= probe_blooms(
                        self.spark, keys_df, blooms, key_col=col
                    )
                keep = [
                    f
                    for f in keep
                    if col not in commit.column_blooms.get(f, {}) or f in hits
                ]
        df = self._serve_pruned(commit, keep)
        if lo is not None:
            df = df.filter(F.col(col) >= lo)
        if hi is not None:
            df = df.filter(F.col(col) <= hi)
        return self._logical(df, commit)

    def _serve_pruned(self, commit: "mf.Commit", keep: list[str]):
        """Serve a stats-pruned file subset PHYSICALLY (caller applies
        exact filters, then ``_logical``): MoR merges the pruned base
        against ALL logs (log rows are never stats-pruned), CoW applies
        live DVs; an empty keep set serves a schema-stable empty scan."""
        if self.table_type == MERGE_ON_READ and commit.log_files:
            pruned = mf.Commit(**{**commit.__dict__, "files": keep})
            base = self._read_base(pruned)
            log = self._read_parquet(commit.log_files, commit)
            df = base.unionByName(log, allowMissingColumns=True)
            order = [F.desc("_hoodie_commit_time")]
            if self.precombine:
                order.append(F.desc(self.precombine))
            order += [F.desc(t) for t in self.tiebreakers]
            w = Window.partitionBy(*self._resolution_cols()).orderBy(*order)
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )
        if keep:
            return self._apply_dvs(self._read_parquet(keep, commit), commit)
        return self._read_base(commit).limit(0).filter(F.lit(False))

    def read_matching(
        self, predicate, version: int | None = None
    ) -> DataFrame:
        """Multi-conjunct stats-pruned read (r10): the engine table's
        own leg of the predicate API every foreign reader takes —
        ``[(col, op, value), ...]`` tuples (op in =,<,<=,>,>=,in) or a
        conjunct-only SQL string. Files are skipped when ANY conjunct
        is provably disjoint with their footer [min, max] (driver-side
        against the commit's ``col_stats``); equality conjuncts
        additionally probe the per-column blooms where recorded; the
        exact filters land on the surviving scan for row-group
        skipping. ``read_where`` stays the single-column range
        convenience over the same machinery."""
        from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
            _interval_can_match,
            _normalize_predicate,
            _predicate_filter,
        )

        commit = self._commit(version)
        conjuncts = _normalize_predicate(predicate)
        phys = [
            (self._phys_name(c, commit), op, v) for c, op, v in conjuncts
        ]
        keep = []
        for f in commit.files:
            ok = True
            for col, op, val in phys:
                rng = commit.col_stats.get(f, {}).get(col)
                if rng is None or rng[0] is None or rng[1] is None:
                    continue
                if not _interval_can_match(rng[0], rng[1], op, val):
                    ok = False
                    break
            if ok:
                keep.append(f)
        for col, op, val in phys:
            if op != "=" or not keep:
                continue
            by_type: dict[str, dict[str, str]] = {}
            for f in keep:
                ent = commit.column_blooms.get(f, {}).get(col)
                if ent is not None:
                    by_type.setdefault(ent[0], {})[f] = ent[1]
            if not by_type:
                continue
            from hudi_and_delta_showcase_spark.tables.bloom import (
                probe_blooms,
                typed_literal_df,
            )

            hits: set[str] = set()
            for t_str, blooms in by_type.items():
                keys_df = typed_literal_df(self.spark, col, val, t_str)
                hits |= probe_blooms(
                    self.spark, keys_df, blooms, key_col=col
                )
            keep = [
                f
                for f in keep
                if col not in commit.column_blooms.get(f, {}) or f in hits
            ]
        df = self._logical(self._serve_pruned(commit, keep), commit)
        return _predicate_filter(df, conjuncts)

    def metadata_agg(
        self,
        cols: list[str] | tuple = (),
        version: int | None = None,
        require_metadata_only: bool = False,
    ) -> DataFrame:
        """Metadata-only aggregation (Delta's OptimizeMetadataOnlyQuery /
        ``numRecords``-based COUNT): answer ``COUNT(*)`` and per-column
        ``MIN``/``MAX`` from the manifest's footer indexes with ZERO
        data-file IO — at 100 TB the difference between milliseconds of
        driver arithmetic and a full scan. Returns one row:
        ``count_rows`` then ``min_<col>``/``max_<col>`` per requested
        logical column, identically shaped on both paths.

        The metadata path is used only when it is provably EXACT:

        * no unmerged MoR log files (log rows add/overwrite),
        * every live file has a recorded footer row count,
        * min/max only for numeric/boolean columns (parquet writers may
          TRUNCATE string footer stats, which widens bounds — safe for
          skipping, wrong for answers) with stats on every non-empty
          live file, and only when no deletion vectors are live
          (removing rows can tighten a column's true min/max),
        * live deletion vectors reduce COUNT via their exact sidecar
          cardinality — an O(deleted rows) sidecar scan, never a data
          scan.

        Anything short of that falls back to one ordinary scan-side
        aggregate (or raises when ``require_metadata_only``), so
        callers always get the exact answer."""
        from pyspark.sql import types as Ty

        commit = self._commit(version)
        df = self.read(version)  # logical schema source + scan fallback
        numeric_ok = (
            Ty.ByteType, Ty.ShortType, Ty.IntegerType, Ty.LongType,
            Ty.FloatType, Ty.DoubleType, Ty.BooleanType,
        )
        reasons: list[str] = []
        if self.table_type == MERGE_ON_READ and commit.log_files:
            reasons.append("unmerged MoR log files")
        if any(f not in commit.row_counts for f in commit.files):
            reasons.append("live file(s) without a footer row count")
        # empty files can't carry column stats; they don't affect min/max
        stat_files = [
            f for f in commit.files if commit.row_counts.get(f, 1) != 0
        ]
        col_vals: dict[str, tuple] = {}
        for c in cols:
            phys = self._phys_name(c, commit)
            dt = df.schema[c].dataType
            if not isinstance(dt, numeric_ok):
                reasons.append(
                    f"{c}: {dt.simpleString()} footer stats may be "
                    "truncated; only numeric/boolean are exact"
                )
                continue
            if commit.dv_files:
                reasons.append(f"{c}: live deletion vectors")
                continue
            entries = [
                commit.col_stats.get(f, {}).get(phys) for f in stat_files
            ]
            if any(e is None for e in entries):
                reasons.append(f"{c}: live file(s) without footer stats")
            elif entries:
                col_vals[c] = (
                    min(e[0] for e in entries),
                    max(e[1] for e in entries),
                )
            else:
                col_vals[c] = (None, None)
        if not reasons:
            n = sum(commit.row_counts[f] for f in commit.files)
            if commit.dv_files and n:
                dv = (
                    self.spark.read.parquet(
                        *[fsio.resolve(self.path, f) for f in commit.dv_files]
                    )
                    .select("file_name", "pos")
                    .distinct()
                )
                live = self.spark.createDataFrame(
                    [(f,) for f in commit.files], "file_name string"
                )
                n -= dv.join(live, "file_name", "semi").count()
            schema = Ty.StructType(
                [Ty.StructField("count_rows", Ty.LongType(), False)]
                + [
                    fld
                    for c in cols
                    for fld in (
                        Ty.StructField(f"min_{c}", df.schema[c].dataType),
                        Ty.StructField(f"max_{c}", df.schema[c].dataType),
                    )
                ]
            )
            row = tuple([n] + [v for c in cols for v in col_vals[c]])
            return self.spark.createDataFrame([row], schema)
        if require_metadata_only:
            raise ValueError(
                "metadata-only aggregation is not exact here: "
                + "; ".join(reasons)
            )
        aggs = [F.count(F.lit(1)).cast("long").alias("count_rows")] + [
            a
            for c in cols
            for a in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
        ]
        return df.agg(*aggs)

    def _write_record_index(
        self, new_files: list[str], version: int
    ) -> list[str]:
        """Record-level index maintenance (Hudi 1.0 record index): one
        extra scan of the just-written files emits skinny
        ``(_hoodie_record_key, file)`` rows — O(new rows) per commit,
        the same opt-in economics as the bloom tier. Entries for files
        that later die are filtered against the live set at probe time;
        full-rewrite commits reset the sidecar list."""
        if not self.record_index or not new_files:
            return []
        scan = self.spark.read.parquet(
            *[fsio.join(self.path, f) for f in new_files]
        ).select(
            F.col("_hoodie_record_key"), self._dv_file_col().alias("file")
        )
        rel_dir = f"_index/ri-c{version:05d}-{uuid.uuid4().hex[:8]}"
        scan.write.parquet(fsio.join(self.path, rel_dir))
        return sorted(
            fsio.relpath(p, self.path)
            for p in fsio.walk_files(
                fsio.join(self.path, rel_dir), ".parquet"
            )
        )

    def _ri_scan(self, commit: mf.Commit) -> DataFrame:
        return self.spark.read.parquet(
            *[fsio.resolve(self.path, f) for f in commit.ri_files]
        )

    def _probe_ri_hits(
        self,
        affected: list[str],
        prev: mf.Commit,
        stamped: DataFrame,
    ) -> tuple[list[str], list[str]]:
        """Exact key->file probe via the record index: scan the skinny
        index sidecar, broadcast the batch's distinct keys into it, and
        keep only affected files that actually hold a batch key. The
        scan is O(index), the broadcast O(batch), the collected hit
        list O(batch keys x replication) — never O(table data). Unlike
        the range/bloom tiers this has no false positives from
        overlapping ranges, so it prunes even unclustered tables."""
        if len(affected) <= 1 or not prev.ri_files:
            return affected, []
        keys = stamped.select(
            F.col("_hoodie_record_key").alias("__k")
        ).distinct()
        hits = {
            r.file
            for r in self._ri_scan(prev)
            .join(
                F.broadcast(keys),
                F.col("_hoodie_record_key") == F.col("__k"),
            )
            .select("file")
            .distinct()
            .collect()
        }
        hit = [f for f in affected if f in hits]
        return hit, [f for f in affected if f not in hits]

    def _probe_key_hits(
        self,
        affected: list[str],
        ranges: dict[str, list[str]],
        stamped: DataFrame,
    ) -> tuple[list[str], list[str]]:
        """Key-level file skipping: of the partition-affected files,
        find those whose record-key range actually intersects the source
        batch's keys. The probe is a distributed broadcast join — file
        range METADATA broadcast to the source keys, never the reverse —
        so it scales with the batch, not the table. Files without known
        ranges are conservatively treated as hit."""
        if len(affected) <= 1:
            return affected, []  # nothing to prune; skip the probe job
        unknown = [f for f in affected if f not in ranges]
        ranged = [f for f in affected if f in ranges]
        if not ranged:
            return affected, []
        # Cheap driver-side payoff check: when file key ranges mutually
        # overlap (hash-distributed writes, no clustering), every file
        # intersects every batch and the probe job is pure overhead.
        # Pruning only pays when files are mostly DISJOINT in key space
        # (post optimize(cluster_by=...)); measure that in O(n log n).
        spans = sorted(ranges[f] for f in ranged)
        disjoint = sum(
            1
            for i in range(1, len(spans))
            if spans[i][0] > spans[i - 1][1]
        )
        if disjoint < len(spans) // 2:
            return affected, []
        # Global index: the key's previous row may live in ANY partition,
        # so the probe matches on key range alone; non-global also
        # requires the partition to match — against each file's OWN
        # spec column (files written before a partition evolution carry
        # a different spec; see evolve_partitioning). The source side
        # carries one array slot per live spec column and each file
        # row carries the 1-based slot index of ITS spec (0 = no known
        # spec / column missing from the batch: match-all,
        # conservative).
        partitioned = bool(self.partition_by) and not self.global_index
        spec_cols: list[str] = []
        pi_of: dict[str, int] = {}
        if partitioned:
            src_cols = set(stamped.columns)
            spec_cols = [
                c
                for c in dict.fromkeys(
                    s for s in self.partition_specs if s
                )
                if c in src_cols
            ]
            for f in ranged:
                idx, _pv = self._partition_spec_value_of(f)
                col = (
                    self.partition_specs[idx]
                    if 0 <= idx < len(self.partition_specs)
                    else None
                )
                pi_of[f] = (
                    spec_cols.index(col) + 1
                    if col is not None and col in spec_cols
                    else 0
                )
        pp_of = {f: self._partition_spec_value_of(f)[1] for f in ranged}
        ranges_df = self.spark.createDataFrame(
            [
                (f, pi_of.get(f, 0), pp_of[f], ranges[f][0], ranges[f][1])
                for f in ranged
            ],
            "f string, pi int, pp string, kmin string, kmax string",
        )
        src = stamped.select(
            F.col("_hoodie_record_key").alias("k"),
            (
                F.array(
                    *[
                        F.coalesce(
                            F.col(c).cast("string"),
                            F.lit(HIVE_DEFAULT_PARTITION),
                        )
                        for c in spec_cols
                    ]
                )
                if spec_cols
                else F.array().cast("array<string>")
            ).alias("pps"),
        ).distinct()
        cond = (F.col("s.k") >= F.col("r.kmin")) & (
            F.col("s.k") <= F.col("r.kmax")
        )
        if partitioned and spec_cols:
            # F.get (0-based) returns null out of bounds — never throws,
            # even under ANSI where element_at(_, 0) would error.
            cond = (
                (F.col("r.pi") == F.lit(0))
                | (
                    F.get(F.col("s.pps"), F.col("r.pi") - 1)
                    == F.col("r.pp")
                )
            ) & cond
        hits = {
            r.f
            for r in src.alias("s")
            .join(F.broadcast(ranges_df.alias("r")), cond, "inner")
            .select("r.f")
            .distinct()
            .collect()
        }
        hit = unknown + [f for f in ranged if f in hits]
        skipped = [f for f in ranged if f not in hits]
        return hit, skipped

    def _probe_bloom_hits(
        self,
        affected: list[str],
        blooms: dict[str, str],
        stamped: DataFrame,
    ) -> tuple[list[str], list[str]]:
        """Bloom tier of file skipping: of the still-affected files,
        keep those whose key bloom claims at least one batch key.
        Applies where the range tier is weakest — overlapping key spans
        on unclustered tables. Files without a bloom are conservative
        hits; a skipped file is a DEFINITE miss (blooms have no false
        negatives), so correctness never depends on the filter."""
        if len(affected) <= 1:
            return affected, []
        with_bloom = {f: blooms[f] for f in affected if f in blooms}
        if not with_bloom:
            return affected, []
        from hudi_and_delta_showcase_spark.tables.bloom import probe_blooms

        hits = probe_blooms(self.spark, stamped, with_bloom)
        kept = [f for f in affected if f not in with_bloom or f in hits]
        skipped = [f for f in affected if f in with_bloom and f not in hits]
        return kept, skipped

    def _partition_value_of(self, rel_file: str) -> str:
        """Partition value encoded in a file's path: the engine's own
        ``__pp=`` dirs, or — on adopted foreign layouts — the declared
        partition column's ``col=value`` dir."""
        parts = dict(
            seg.split("=", 1) for seg in rel_file.split("/") if "=" in seg
        )
        if "__pp" in parts:
            return urllib.parse.unquote(parts["__pp"])
        if self.partition_by and self.partition_by in parts:
            return urllib.parse.unquote(parts[self.partition_by])
        return ""

    def _bucket_expr(self) -> F.Column:
        """The bucket id of each row: ``pmod(xxhash64(record_key), N)``
        — pure codegen arithmetic, identical on the write path, the
        upsert router and the point-lookup router."""
        return F.pmod(
            F.xxhash64(F.col("_hoodie_record_key")),
            F.lit(self.bucket_count),
        ).cast("int")

    def _bucket_of(self, rel_file: str) -> int | None:
        """Bucket id encoded in a file's ``__bk=`` dir, or None for
        files written before bucketing existed (conservative: such a
        file is a candidate for every batch)."""
        for seg in rel_file.split("/"):
            if seg.startswith("__bk="):
                try:
                    return int(seg[5:])
                except ValueError:
                    return None
        return None

    def _split_bucket_affected(
        self, files: list[str], stamped: DataFrame
    ) -> tuple[list[str], list[str]]:
        """Bucket-index routing tier (Hudi BUCKET index): candidate
        files are exactly the batch keys' hash buckets. One tiny
        distinct over the batch's bucket ids (ints — the job's output
        is <= N rows no matter the batch size); the file-side check is
        driver-side metadata, no probe scan of table data at all."""
        if not self.bucket_count:
            return files, []
        hit_buckets = {
            r[0]
            for r in stamped.select(
                self._bucket_expr().alias("b")
            ).distinct().collect()
        }
        affected, skipped = [], []
        for f in files:
            b = self._bucket_of(f)
            (affected if b is None or b in hit_buckets else skipped).append(f)
        return affected, skipped

    def _partition_spec_value_of(self, rel_file: str) -> tuple[int, str]:
        """(spec index, partition value) a file's path encodes: ``__pp=``
        is spec 0, ``__pp{i}=`` spec i (see ``evolve_partitioning``);
        adopted foreign layouts use the declared column's own
        ``col=value`` dir. Spec index -1 = no partition dir / unknown
        spec — such a file is NEVER partition-pruned (conservative)."""
        for seg in rel_file.split("/"):
            if "=" not in seg or seg.endswith(".parquet"):
                continue
            k, v = seg.split("=", 1)
            m = _PP_TOKEN_RE.match(k)
            if m:
                idx = int(m.group(1)) if m.group(1) else 0
                if idx >= len(self.partition_specs):
                    return (-1, "")  # foreign/newer token: conservative
                return (idx, urllib.parse.unquote(v))
            if k in self.partition_specs:
                return (
                    self.partition_specs.index(k),
                    urllib.parse.unquote(v),
                )
        return (-1, "")

    #: allowed type widenings (Delta ``typeWidening`` lattice, the
    #: subset parquet scans can upcast natively): integer chain,
    #: float->double, integers->double.
    _WIDEN = {
        ("tinyint", "smallint"), ("tinyint", "int"), ("tinyint", "bigint"),
        ("smallint", "int"), ("smallint", "bigint"), ("int", "bigint"),
        ("float", "double"),
        ("tinyint", "double"), ("smallint", "double"), ("int", "double"),
    }

    def _reconcile_schema(self, source: DataFrame, prev: mf.Commit):
        """Type-widening schema evolution (Delta ``typeWidening``):
        reconcile the incoming batch's types with the table's.

        * source column WIDER than the table's (e.g. bigint vs int):
          the table schema widens — a METADATA-only change recorded in
          the commit's ``table_schema``; legacy narrow files are
          upcast at scan time, zero files rewritten.
        * source column NARROWER: the batch upcasts on write (the
          normal case — new data fits the table type).
        * anything else mismatched: refused loudly; silent coercion
          between e.g. string and int is how tables rot.

        Returns (possibly-cast source, table_schema JSON for the new
        commit). Tables carry their schema from create() (Delta's
        metaData action), so reconciliation is a pure metadata
        comparison; only LEGACY tables (created before schemas rode in
        commits) pay a one-off mergeSchema footer sweep per upsert, and
        only until their first widening records one.
        """
        cur = self._commit_schema(prev)
        if cur is None:
            if not prev.files and not prev.log_files:
                return source, prev.table_schema
            cur = self.spark.read.option("mergeSchema", "true").parquet(
                *[fsio.resolve(self.path, f)
                  for f in prev.files + prev.log_files]
            ).schema
        fields = {f.name: f.dataType for f in cur.fields}
        tombstoned = {
            p
            for p, logical in prev.column_mapping.items()
            if str(logical).startswith("__dropped_")
        }
        widened = False
        for f in source.schema.fields:
            if f.name in tombstoned:
                raise ValueError(
                    f"column {f.name!r} was dropped; re-introduce it "
                    f"under a new name (old file data must not "
                    f"resurrect)"
                )
            have = fields.get(f.name)
            if have is None:
                fields[f.name] = f.dataType  # additive evolution
            elif have != f.dataType:
                pair = (have.simpleString(), f.dataType.simpleString())
                if pair in self._WIDEN:
                    fields[f.name] = f.dataType
                    widened = True
                elif (pair[1], pair[0]) in self._WIDEN:
                    source = source.withColumn(
                        f.name, F.col(f.name).cast(have)
                    )
                else:
                    raise ValueError(
                        f"incompatible type for column {f.name!r}: table "
                        f"has {have.simpleString()}, batch has "
                        f"{f.dataType.simpleString()} (not a supported "
                        f"widening)"
                    )
        if not widened and not prev.table_schema:
            return source, ""  # feature not activated: keep inference
        from pyspark.sql.types import StructField, StructType

        out = StructType(
            [StructField(n, t, True) for n, t in fields.items()]
        )
        return source, json.dumps(out.jsonValue())

    def _commit_schema(self, commit: mf.Commit | None):
        """The explicit read schema a commit carries once type widening
        activated (``table_schema``), else None (infer + mergeSchema)."""
        if commit is None or not commit.table_schema:
            return None
        from pyspark.sql.types import StructType

        return StructType.fromJson(json.loads(commit.table_schema))

    def _read_parquet(
        self, rel_files: list[str], commit: mf.Commit | None = None
    ) -> DataFrame:
        paths = [fsio.resolve(self.path, f) for f in rel_files]
        schema = self._commit_schema(commit)
        if schema is not None:
            # type-widened table: declare the current schema so legacy
            # narrow files (int32/float) upcast at scan time — exactly
            # how Delta reads under the typeWidening feature. mergeSchema
            # would refuse to merge int with bigint.
            df = self.spark.read.schema(schema).parquet(*paths)
            return self._repair_meta(df).withColumn(
                "_hoodie_file_name", F.col("_metadata.file_name")
            )
        # mergeSchema: files may span commits with (additively) evolved
        # schemas
        df = self.spark.read.option("mergeSchema", "true").parquet(*paths)
        # _hoodie_file_name from the scan's native _metadata column, NOT
        # input_file_name(): the latter is non-deterministic, and a
        # Project containing it BLOCKS predicate pushdown into the scan
        # (turning incremental pulls / point lookups into full scans at
        # 100 TB — caught by test_incremental_pull_pushes_commit_time_filter).
        return self._repair_meta(df).withColumn(
            "_hoodie_file_name", F.col("_metadata.file_name")
        )

    @property
    def _convert_time(self) -> str | None:
        """Commit time of an in-place CONVERT (version 0 with action
        'convert'), or None for normally-created tables. Cached — one
        tiny metadata read per table handle."""
        if not hasattr(self, "__convert_time"):
            try:
                v0 = mf.read_commit(self.path, 0)
                ct = v0.commit_time if v0.action == "convert" else None
            except FileNotFoundError:
                ct = None
            setattr(self, "__convert_time", ct)
        return getattr(self, "__convert_time")

    def _repair_meta(self, df: DataFrame) -> DataFrame:
        """Derive the Hudi meta columns AT SCAN TIME for files imported
        by ``convert`` (which are left byte-identical on disk and carry
        no meta columns). They are pure derivations: the record key from
        the key columns, the commit time from the convert commit. Rows
        from normally-written files keep their stored values
        (coalesce); tables never converted skip this entirely — zero
        overhead on the normal path."""
        if self._convert_time is None:
            return df
        # adopted files were laid out under the ORIGINAL spec — after a
        # partition evolution that column is partition_specs[0], not
        # partition_by.
        adopted_col = self.partition_specs[0]
        adopted = []
        if adopted_col and self.adopted_partition_type:
            adopted.append((adopted_col, self.adopted_partition_type))
        adopted.extend(self.adopted_extra_partitions.items())
        for col, ptype in adopted:
            # adopted hive layout: the partition column(s) live only in
            # the PATHS of adopted files — derive them from the scan's
            # native _metadata.file_path (stays inside codegen, no
            # per-partition union of scans). Engine-written files carry
            # the real columns; coalesce keeps their stored values.
            import re as _re

            seg = F.regexp_extract(
                F.col("_metadata.file_path"),
                f"/{_re.escape(col)}=([^/]+)/",
                1,
            )
            val = F.when(seg == "", F.lit(None)).otherwise(F.url_decode(seg))
            val = (
                F.when(val == HIVE_DEFAULT_PARTITION, F.lit(None))
                .otherwise(val)
                .cast(ptype)
            )
            if col in df.columns:
                df = df.withColumn(col, F.coalesce(F.col(col), val))
            else:
                df = df.withColumn(col, val)
        key = F.concat_ws(
            "|", *[F.col(k).cast("string") for k in self.key_cols]
        )
        pp = (
            F.col(self.partition_by).cast("string")
            if self.partition_by and self.partition_by in df.columns
            else F.lit("")
        )
        # adopted files following Hudi's file-group naming convention
        # (<fileId>_<writeToken>_<instant>.parquet) keep their SLICE
        # instant — an adopted MoR table's log rows (stamped with their
        # delta commit instant) must outrank base rows in the _rt merge,
        # and the convert time (now) would outrank everything. Files
        # without the convention (plain hive parquet) fall back to the
        # convert commit time, as before. Anchored on the FULL
        # convention — writeToken digits included — so a plain-hive
        # dump that merely ends in a timestamp-like digit run
        # (events_20240101123045.parquet) is NOT mistaken for a file
        # group (r8, r7-advice #3).
        name_instant = F.regexp_extract(
            F.col("_metadata.file_name"),
            r"_\d+-\d+-\d+_(\d{14,17})\.parquet$", 1,
        )
        ct = F.when(name_instant != "", name_instant).otherwise(
            F.lit(self._convert_time)
        )
        derived = {
            "_hoodie_commit_time": ct,
            "_hoodie_commit_seqno": F.concat_ws("_", ct, key),
            "_hoodie_record_key": key,
            "_hoodie_partition_path": pp,
        }
        for name, expr in derived.items():
            if name not in df.columns:
                df = df.withColumn(name, expr)
            else:
                df = df.withColumn(name, F.coalesce(F.col(name), expr))
        return df

    def _dv_file_col(self):
        """Table-RELATIVE file path of each scanned row, from the native
        ``_metadata.file_path`` URI. The bare ``_metadata.file_name``
        is NOT unique here: with ``partitionBy`` one write task emits
        identically-named part files into every partition dir it sees.
        Computing the relative path against the CURRENT table root on
        both the write and read side also keeps DVs valid if the table
        directory is relocated. The marker is the table root's PATH
        component (scheme/authority stripped): ``_metadata.file_path``
        reports a normalized URI whose scheme form may differ from the
        configured root (``file:///x`` vs ``file:/x``), but the path
        component is stable across both."""
        return F.substring_index(
            F.col("_metadata.file_path"), fsio.uri_path(self.path) + "/", -1
        )

    def _apply_dvs(self, df: DataFrame, commit: mf.Commit) -> DataFrame:
        """Filter out rows marked deleted by the commit's deletion
        vectors: anti-join the scan's native (relative file path,
        ``_metadata.row_index``) against the DV sidecar ``(file_name,
        pos)`` rows. The DV side is a parquet scan with known size
        stats, so Catalyst broadcasts it while it is small (the normal
        case — deleted rows, not table rows) and AQE falls back to a
        shuffle join if a table accumulates huge vectors; either way
        the base scan itself is untouched: pushdown, pruning, and
        row-group skipping all still apply. DV entries naming files no
        longer in the live set simply never match."""
        if not commit.dv_files:
            return df
        # DV sidecars are engine-written with exactly (file_name string,
        # pos long) — pin that schema instead of paying Spark's
        # footer-sampling inference job on every DV-table read (r14 opt)
        from pyspark.sql.types import LongType, StringType, StructField
        from pyspark.sql.types import StructType as _St

        dv_schema = _St(
            [
                StructField("file_name", StringType(), True),
                StructField("pos", LongType(), True),
            ]
        )
        dv = self.spark.read.schema(dv_schema).parquet(
            *[fsio.resolve(self.path, f) for f in commit.dv_files]
        ).select("file_name", "pos")
        return (
            df.withColumn("__dv_file", self._dv_file_col())
            .withColumn("__dv_pos", F.col("_metadata.row_index"))
            .join(
                dv,
                (F.col("__dv_file") == dv["file_name"])
                & (F.col("__dv_pos") == dv["pos"]),
                "left_anti",
            )
            .drop("__dv_file", "__dv_pos")
        )

    def _classify_upsert_cdc(
        self,
        target: DataFrame,
        stamped: DataFrame,
        version: int,
        commit_time: str,
    ) -> list[str]:
        """Split an upsert batch into CDF rows: ``target`` rows whose
        key matches the batch are update pre-images; batch rows are
        update post-images when a pre-image shares their key, else
        inserts. One broadcast of the batch's DISTINCT keys finds the
        pre-images; the post/insert split is a window over the union's
        keys (r8) — O(changes) rows through one hash exchange instead
        of a second broadcast build+probe, one fewer job per CDC
        commit. O(changes) total, never O(table)."""
        from pyspark.sql import Window

        keys = self._resolution_cols()
        source_keys = F.broadcast(stamped.select(*keys).distinct().alias("s"))
        cond = None
        for c in keys:
            e = F.col(f"t.{c}").eqNullSafe(F.col(f"s.{c}"))
            cond = e if cond is None else cond & e
        pre = target.alias("t").join(source_keys, cond, "left_semi")
        tagged = pre.withColumn("__cdc_src", F.lit("t")).unionByName(
            stamped.withColumn("__cdc_src", F.lit("s")),
            allowMissingColumns=True,
        )
        # window partitioning groups null keys together — the same
        # null-safe match discipline as the eqNullSafe probes
        n_pre = F.sum(
            F.when(F.col("__cdc_src") == "t", 1).otherwise(0)
        ).over(Window.partitionBy(*keys))
        classified = tagged.withColumn(
            "_change_type",
            F.when(F.col("__cdc_src") == "t", F.lit("update_preimage"))
            .when(n_pre > 0, F.lit("update_postimage"))
            .otherwise(F.lit("insert")),
        ).drop("__cdc_src")
        return self._write_cdc_files(classified, version, commit_time)

    def _write_cdc_files(
        self, changes: DataFrame, version: int, commit_time: str
    ) -> list[str]:
        """Write a commit's change-data-feed sidecar (Delta CDF change
        files): full row images + ``_change_type``, stamped with the
        commit version/instant so ``read_changes`` needs no join."""
        if "_hoodie_file_name" in changes.columns:
            changes = changes.drop("_hoodie_file_name")
        changes = changes.withColumn(
            "_commit_version", F.lit(version)
        ).withColumn("_cdc_commit_time", F.lit(commit_time))
        rel_dir = f"cdc/c{version:05d}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, rel_dir)
        changes.write.mode("error").parquet(out)
        return sorted(
            fsio.relpath(p, self.path)
            for p in fsio.walk_files(out, ".parquet")
        )

    def read_changes(
        self, begin_version: int = 0, end_version: int | None = None
    ) -> DataFrame:
        """Change data feed (Delta ``table_changes`` / Hudi CDC query):
        every row-level change committed in versions ``[begin_version,
        end_version]`` with ``_change_type`` in {insert,
        update_preimage, update_postimage, delete}, plus the commit
        version/instant. Pre-images make downstream RETRACTION possible
        — incremental aggregate maintenance subtracts the pre-image and
        adds the post-image instead of rescanning the table.

        Reads ONLY the O(changes) sidecar files of the requested
        commits; file re-org commits (compact/optimize/restore)
        contribute nothing, exactly like Delta CDF. ADD-ONLY commits
        (bulk insert, upsert that matched no existing key) carry no
        sidecar at all — their insert images are synthesized here from
        the commit's own new data files (Delta CDF's exact rule), so a
        CDC-enabled load never writes its batch twice (r7)."""
        if not self.cdc_enabled:
            raise ValueError(
                "change data feed requires cdc_enabled=True at create()"
            )
        end = (
            self._commit(None).version
            if end_version is None
            else end_version
        )
        files: list[str] = []
        parts: list[DataFrame] = []
        prior_files: set[str] = set()
        for v in mf.list_versions(self.path):
            if v > end:
                break
            c = mf.read_commit(self.path, v)
            if v >= begin_version:
                files.extend(c.cdc_files)
                if c.stats.get("cdc_add_only"):
                    new = [f for f in c.files if f not in prior_files]
                    if new:
                        parts.append(
                            self._read_parquet(new, c)
                            .drop("_hoodie_file_name")
                            .withColumn("_change_type", F.lit("insert"))
                            .withColumn("_commit_version", F.lit(v))
                            .withColumn(
                                "_cdc_commit_time", F.lit(c.commit_time)
                            )
                        )
            prior_files = set(c.files)
        if files:
            paths = [fsio.resolve(self.path, f) for f in files]
            # pin the sidecar schema when the table records one (r14
            # opt): CDC files carry the stamped data schema plus the
            # three CDF columns; older files from before an additive
            # evolution read null for new columns exactly as
            # mergeSchema would, and legacy narrow files upcast under
            # a widened schema natively. Tables without a recorded
            # schema (legacy/converted) keep the mergeSchema sweep.
            pinned = self._commit_schema(self._commit(end))
            if pinned is not None:
                from pyspark.sql.types import (
                    IntegerType,
                    StringType,
                    StructField,
                    StructType,
                )

                pinned = StructType(
                    [
                        f
                        for f in pinned.fields
                        if f.name != "_hoodie_file_name"
                    ]
                    + [
                        StructField("_change_type", StringType(), True),
                        StructField("_commit_version", IntegerType(), True),
                        StructField("_cdc_commit_time", StringType(), True),
                    ]
                )
                parts.append(self.spark.read.schema(pinned).parquet(*paths))
            else:
                parts.append(
                    self.spark.read.option("mergeSchema", "true").parquet(
                        *paths
                    )
                )
        if not parts:
            raise ValueError(
                f"no change files in versions [{begin_version}, {end}]"
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return self._logical(out, self._commit(end))

    def _write_dv_files(self, hits: DataFrame, commit_dir: str) -> list[str]:
        """Write ``(file_name, pos)`` rows as a DV sidecar under dv/."""
        rel_dir = f"dv/{commit_dir}-{uuid.uuid4().hex[:8]}"
        out = fsio.join(self.path, rel_dir)
        hits.write.mode("error").parquet(out)
        return sorted(
            fsio.relpath(p, self.path)
            for p in fsio.walk_files(out, ".parquet")
        )

    def _read_base(self, commit: mf.Commit) -> DataFrame:
        return self._apply_dvs(self._read_parquet(commit.files, commit), commit)

    def _split_affected(
        self, files: list[str], source: DataFrame
    ) -> tuple[list[str], list[str]]:
        """Partition pruning for the CoW rewrite: affected = files in
        partitions present in the source batch. A GLOBAL index can't
        partition-prune — the incoming key's previous row may live in
        any partition — so every file stays a candidate and pruning
        falls to the key-range probe (Hudi's global-index cost)."""
        if not self.partition_by or self.global_index:
            return files, []
        # After a partition evolution, files written under an OLD spec
        # prune against the batch's values of THAT spec's column (every
        # spec column also lives in the data) — one distinct job over
        # all live spec columns covers every spec at once. Null
        # partition values land in the hive default-partition dir —
        # match them under the same token str(None) would never hit.
        spec_cols = [
            c
            for c in dict.fromkeys(s for s in self.partition_specs if s)
            if c in source.columns
        ]
        if not spec_cols:
            return files, []
        rows = source.select(
            *[F.col(c).cast("string").alias(c) for c in spec_cols]
        ).distinct().collect()
        values = {
            c: {
                HIVE_DEFAULT_PARTITION if r[c] is None else str(r[c])
                for r in rows
            }
            for c in spec_cols
        }
        affected, untouched = [], []
        for f in files:
            idx, pv = self._partition_spec_value_of(f)
            col = (
                self.partition_specs[idx]
                if 0 <= idx < len(self.partition_specs)
                else None
            )
            if col is None or col not in values or pv in values[col]:
                affected.append(f)  # unknown spec: conservative hit
            else:
                untouched.append(f)
        return affected, untouched


def maintenance_plan(
    table: LakehouseTable,
    max_log_files: int = 8,
    max_unclustered_fraction: float = 0.3,
    retain_versions: int = 10,
) -> dict:
    """Hudi table-services style advisor: inspect the latest commit and
    recommend which maintenance actions pay for themselves right now.
    Pure metadata — O(commits) driver work, no Spark job — so it can run
    on every ingest cycle; ``run_maintenance`` executes the plan.

    * ``compact``   — MoR log files outstanding >= ``max_log_files``
      (each `_rt` read pays a window merge over all of them).
    * ``cluster``   — a clustering spec was established by a previous
      ``optimize`` and more than ``max_unclustered_fraction`` of live
      files arrived after the last clustering generation (incremental
      restack is O(those files)).
    * ``vacuum``    — more than ``retain_versions`` versions on the
      timeline (dead files beyond retention keep disk + confuse
      restores; savepointed versions survive regardless).
    """
    prev = table._commit(None)
    plan: dict = {"compact": False, "cluster": None, "vacuum": False}
    if table.table_type == MERGE_ON_READ and len(prev.log_files) >= max_log_files:
        plan["compact"] = True
    # latest clustering spec (linear or z-order) + its covered files
    spec_key, spec, clustered = None, None, set()
    for c in table.history():
        for k in ("cluster_spec", "zorder_spec"):
            if c.action == "optimize" and c.stats.get(k):
                spec_key, spec = k, c.stats[k]
        if c.action == "optimize" and c.stats.get("clustered_output"):
            clustered |= set(c.stats["clustered_output"])
    if spec and prev.files:
        stale = [f for f in prev.files if f not in clustered]
        if len(stale) / len(prev.files) > max_unclustered_fraction:
            # optimize() records the spec under PHYSICAL names; resolve
            # to logical here so run_maintenance can hand them back to
            # optimize(), which maps logical->physical — otherwise a
            # post-optimize rename could cluster the wrong column.
            logical = [
                prev.column_mapping.get(c, c) for c in spec.split(",")
            ]
            plan["cluster"] = {
                "mode": "incremental",
                ("zorder_by" if spec_key == "zorder_spec" else "cluster_by"):
                    logical,
                "stale_files": len(stale),
            }
    if len(mf.list_versions(table.path)) > retain_versions:
        plan["vacuum"] = True
    return plan


def run_maintenance(table: LakehouseTable, plan: dict | None = None,
                    retain_versions: int = 10) -> dict:
    """Execute a ``maintenance_plan`` (or compute one): compaction
    first (folds logs into indexed base files), then incremental
    clustering (restacks the arrivals), then vacuum (collects what the
    previous steps orphaned beyond retention). Returns what ran."""
    plan = plan or maintenance_plan(table, retain_versions=retain_versions)
    ran: dict = {}
    if plan.get("compact"):
        ran["compact"] = table.compact().version
    if plan.get("cluster"):
        spec = dict(plan["cluster"])
        spec.pop("stale_files", None)
        spec.pop("mode", None)
        ran["cluster"] = table.optimize(incremental=True, **spec).version
    if plan.get("vacuum"):
        ran["vacuum"] = table.vacuum(retain_versions=retain_versions)
    return ran
