"""OPTIMIZE (bin-pack) against a raw _delta_log (r12): small-file
partitions compact as remove+add dataChange=false commits, DVs
compact away, stats re-stamp, writer-protocol guards refuse what this
writer cannot author."""

from __future__ import annotations

import json
import os

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.delta_log import (
    export_delta_log,
    optimize_delta_table,
    read_delta_changes,
    read_delta_table,
    write_delta_table,
)


def _commit_actions(path, v):
    fn = os.path.join(path, "_delta_log", f"{v:020d}.json")
    return [json.loads(x) for x in open(fn) if x.strip()]


def test_optimize_binpacks_unpartitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    for i in range(4):
        write_delta_table(
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(5)],
                "k int, v string",
            ).coalesce(1),
            path,
            mode="append",
        )
    before = sorted(tuple(r) for r in read_delta_table(spark, path).collect())
    assert len(read_delta_table(spark, path).inputFiles()) == 4

    out = optimize_delta_table(spark, path)
    assert out["groups_rewritten"] == 1
    assert out["files_before"] == 4 and out["files_after"] == 1
    after_df = read_delta_table(spark, path)
    assert sorted(tuple(r) for r in after_df.collect()) == before
    assert len(after_df.inputFiles()) == 1

    # the commit: removes+adds all dataChange=false, OPTIMIZE op,
    # fresh stats on the packed add
    acts = _commit_actions(path, out["version"])
    removes = [a["remove"] for a in acts if "remove" in a]
    adds = [a["add"] for a in acts if "add" in a]
    ci = next(a["commitInfo"] for a in acts if "commitInfo" in a)
    assert len(removes) == 4 and len(adds) == 1
    assert all(r["dataChange"] is False for r in removes)
    assert all(a["dataChange"] is False for a in adds)
    assert ci["operation"] == "OPTIMIZE"
    st = json.loads(adds[0]["stats"])
    assert st["numRecords"] == 20
    assert st["minValues"]["k"] == 0 and st["maxValues"]["k"] == 34
    # dataChange=false: the CDF/incremental readers skip the version
    ch = read_delta_changes(spark, path, 1, out["version"])
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}
    assert ch.count() == 15  # versions 1-3 only; OPTIMIZE adds nothing
    # time travel to the pre-OPTIMIZE version still serves old files
    old = read_delta_table(spark, path, version=out["version"] - 1)
    assert sorted(tuple(r) for r in old.collect()) == before


def test_optimize_partitioned_engine_export_with_dvs(spark, tmp_path):
    """An exported partitioned table with live DVs: OPTIMIZE packs
    each partition, the DV compacts away (packed adds carry no
    descriptor), deleted rows stay deleted."""
    df = spark.createDataFrame(
        [(i, f"v{i}", "a" if i % 2 else "b") for i in range(20)],
        "k int, v string, g string",
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        partition_by="g", deletion_vectors=True,
    )
    t.delete(
        spark.createDataFrame([(3, "a"), (8, "b")], "k int, g string")
    )
    export_delta_log(t)
    before = sorted(
        (r.k, r.g) for r in read_delta_table(spark, t.path)
        .select("k", "g").collect()
    )
    assert len(before) == 18
    n_before = len(read_delta_table(spark, t.path).inputFiles())
    out = optimize_delta_table(spark, t.path)
    assert out["groups_rewritten"] == 2
    assert out["files_after"] < out["files_before"] == n_before
    after_df = read_delta_table(spark, t.path)
    assert sorted(
        (r.k, r.g) for r in after_df.select("k", "g").collect()
    ) == before
    acts = _commit_actions(t.path, out["version"])
    adds = [a["add"] for a in acts if "add" in a]
    assert adds and all("deletionVector" not in a for a in adds)
    # partitionValues is the authoritative record; packed files LACK
    # the partition column (write.partitionBy strips it — delta-spark's
    # own OPTIMIZE layout), so the in-file tag must NOT be stamped and
    # the values above came through the reconstruction join
    assert {a["partitionValues"]["g"] for a in adds} == {"a", "b"}
    assert all("tags" not in a for a in adds)


def test_optimize_guards(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame([(1, "a")], "k int, v string"), path
    )
    write_delta_table(
        spark.createDataFrame([(2, "b")], "k int, v string"), path,
        mode="append",
    )
    # appendOnly refusal: patch the config in a metaData re-commit
    log = os.path.join(path, "_delta_log")
    acts = _commit_actions(path, 0)
    meta = next(a["metaData"] for a in acts if "metaData" in a)
    meta = {**meta, "configuration": {"delta.appendOnly": "true"}}
    with open(os.path.join(log, f"{2:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": meta}))
    with pytest.raises(ValueError, match="appendOnly"):
        optimize_delta_table(spark, path)
    # rowTracking writer feature refusal
    with open(os.path.join(log, f"{3:020d}.json"), "w") as fh:
        fh.write(json.dumps({"metaData": {**meta, "configuration": {}}}))
        fh.write("\n" + json.dumps({"protocol": {
            "minReaderVersion": 1, "minWriterVersion": 7,
            "writerFeatures": ["rowTracking"]}}))
    with pytest.raises(ValueError, match="rowTracking"):
        optimize_delta_table(spark, path)


def test_optimize_noop_when_converged(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        .coalesce(1),
        path,
    )
    out = optimize_delta_table(spark, path)
    assert out["groups_rewritten"] == 0 and out["version"] is None


def test_optimize_protocol_walk_skips_checkpointed_tail(
    spark, tmp_path, monkeypatch
):
    """r13 (verdict wrong #3): the OPTIMIZE writer-protocol guard must
    not re-read every commit JSON below the newest checkpoint — the
    checkpoint's protocol row already covers them. Pin: with a
    checkpoint at version N, only commits > N are text-read during
    the guard (100k-commit foreign logs exist)."""
    from hudi_and_delta_showcase_spark.tables import delta_log, fsio
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        write_checkpoint,
    )

    path = str(tmp_path / "t")
    for i in range(6):
        write_delta_table(
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(5)],
                "k int, v string",
            ).coalesce(1),
            path,
            mode="append",
        )
    cp_v = write_checkpoint(spark, path)
    assert cp_v == 5
    write_delta_table(
        spark.createDataFrame([(990, "tail")], "k int, v string")
        .coalesce(1),
        path,
        mode="append",
    )
    before = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )

    read_versions: list[int] = []
    orig = fsio.read_text

    def spy(p):
        import re as _re

        m = _re.search(r"_delta_log/(\d{20})\.json$", p)
        if m:
            read_versions.append(int(m.group(1)))
        return orig(p)

    # the guard goes through delta_log's fsio binding
    monkeypatch.setattr(delta_log.fsio, "read_text", spy)
    out = optimize_delta_table(spark, path)
    assert out["files_after"] < out["files_before"]
    # ONLY the post-checkpoint tail was text-read, and each at most
    # a bounded number of times (replay + guard)
    assert read_versions, "expected the tail commit to be scanned"
    assert min(read_versions) > cp_v, (
        f"guard re-read pre-checkpoint commits: {sorted(set(read_versions))}"
    )
    after = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )
    assert after == before


def test_optimize_cluster_by_prunes_on_cluster_key(spark, tmp_path):
    """r13 (verdict #6): the clustered OPTIMIZE dialect — every live
    file rewrites range-partitioned + sorted on the cluster columns,
    the commit stamps delta.clustering domain metadata (with an
    in-commit protocol upgrade on legacy logs), and the packed files'
    narrow footer min/max make the predicate read prune on the
    cluster key that previously pruned NOTHING (each original file
    spanned the full key range)."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        delta_clustering_columns,
    )

    path = str(tmp_path / "t")
    # 4 interleaved appends: every file covers k in [i, 200): stats
    # pruning on k is useless before clustering
    for i in range(4):
        write_delta_table(
            spark.createDataFrame(
                [(j * 4 + i, f"v{j * 4 + i}") for j in range(50)],
                "k int, v string",
            ).coalesce(1),
            path,
            mode="append",
        )
    before = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )
    unpruned = read_delta_table(spark, path, predicate=[("k", "<", 10)])
    assert len(unpruned.inputFiles()) == 4  # every file might match

    out = optimize_delta_table(
        spark, path, target_file_bytes=2048, cluster_by=["k"]
    )
    assert out["groups_rewritten"] == 1
    n_after = out["files_after"]
    assert n_after >= 2, "need >1 packed file to prove pruning"

    after_df = read_delta_table(spark, path)
    assert sorted(tuple(r) for r in after_df.collect()) == before
    # the cluster key now prunes: only the low-range file(s) scan
    pruned = read_delta_table(spark, path, predicate=[("k", "<", 10)])
    assert len(pruned.inputFiles()) < n_after
    assert sorted(r.k for r in pruned.collect()) == list(range(10))
    # delta-spark's DESCRIBE DETAIL source sees the clustering
    assert delta_clustering_columns(path) == [["k"]]
    # the commit upgraded the legacy protocol to table features
    acts = _commit_actions(path, out["version"])
    protos = [a["protocol"] for a in acts if "protocol" in a]
    assert protos and protos[0]["minWriterVersion"] == 7
    assert {"clustering", "domainMetadata"} <= set(
        protos[0]["writerFeatures"]
    )
    dms = [a["domainMetadata"] for a in acts if "domainMetadata" in a]
    assert dms and dms[0]["domain"] == "delta.clustering"
    # dataChange=false throughout: CDF still sees only the inserts
    ch = read_delta_changes(spark, path, 0, out["version"])
    assert {r["_change_type"] for r in ch.collect()} == {"insert"}
    assert ch.count() == 200


def test_optimize_cluster_by_rejects_bad_columns(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1),
        path,
    )
    with pytest.raises(ValueError, match="not in the table schema"):
        optimize_delta_table(spark, path, cluster_by=["nope"])


def test_optimize_where_partition_scopes_rewrite(spark, tmp_path):
    """r13: OPTIMIZE ... WHERE on a raw foreign log — only the named
    partition's files rewrite (whole partitions, delta-spark's own
    restriction); the other partition's adds are untouched, and
    non-partition columns refuse."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
    )

    # partitioned foreign log via the engine's export
    df = spark.createDataFrame(
        [(i, "A" if i % 2 else "B", f"v{i}") for i in range(40)],
        "k int, g string, v string",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "src"), df.coalesce(4),
        key_cols=["k"], partition_by="g",
    )
    for i in range(2):
        t.upsert(
            spark.createDataFrame(
                [(100 + 2 * i, "A", "xa"), (101 + 2 * i, "B", "xb")],
                "k int, g string, v string",
            )
        )
    export_delta_log(t)
    path = t.path
    before = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )
    b_files = {
        f for f in read_delta_table(
            spark, path, predicate=[("g", "=", "B")]
        ).inputFiles()
    }

    out = optimize_delta_table(
        spark, path, min_input_files=1, where_partition={"g": "A"}
    )
    assert out["groups_rewritten"] == 1
    after_df = read_delta_table(spark, path)
    assert sorted(tuple(r) for r in after_df.collect()) == before
    # partition B's files are byte-for-byte the same adds
    b_after = {
        f for f in read_delta_table(
            spark, path, predicate=[("g", "=", "B")]
        ).inputFiles()
    }
    assert b_after == b_files
    with pytest.raises(ValueError, match="partition columns"):
        optimize_delta_table(spark, path, where_partition={"v": "x"})


def test_vacuum_foreign_log(spark, tmp_path):
    """r13: VACUUM on a raw foreign log — superseded files delete only
    once both unreferenced-by-HEAD and older than the retention
    window; live files and the log itself are never touched."""
    import os

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        vacuum_delta_table,
    )

    path = str(tmp_path / "t")
    for i in range(4):
        write_delta_table(
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(5)],
                "k int, v string",
            ).coalesce(1),
            path,
            mode="append",
        )
    out = optimize_delta_table(spark, path)  # supersedes all 4 files
    assert out["files_after"] == 1
    before = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )

    # default 7-day window: the just-superseded files are protected
    res = vacuum_delta_table(spark, path, dry_run=True)
    assert res["would_remove_files"] == []
    # retention 0 waives the window (the RETAIN 0 HOURS test shape)
    res = vacuum_delta_table(spark, path, retain_hours=0, dry_run=True)
    assert len(res["would_remove_files"]) == 4
    res = vacuum_delta_table(spark, path, retain_hours=0)
    assert res["deleted"] == 4
    assert all(not os.path.exists(p) for p in res["would_remove_files"])
    # HEAD reads exactly; the log dir is untouched
    assert sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    ) == before
    assert os.path.isdir(os.path.join(path, "_delta_log"))
    # idempotent
    assert vacuum_delta_table(spark, path, retain_hours=0)["deleted"] == 0
    # time travel past the vacuumed files now fails (delta's trade)
    with pytest.raises(Exception):
        read_delta_table(spark, path, version=0).collect()


# --- r13: OPTIMIZE under column mapping -------------------------------


def _install_mapping(path, mode, fields):
    """Patch a metaData commit installing columnMapping over the raw
    log (the foreign-writer shape test_convert_delta.py pins)."""
    v = len(
        [f for f in os.listdir(os.path.join(path, "_delta_log"))
         if f.endswith(".json")]
    )
    with open(
        os.path.join(path, "_delta_log", f"{v:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps(
                {"type": "struct", "fields": fields}
            ),
            "partitionColumns": [],
            "configuration": {
                "delta.columnMapping.mode": mode,
                "delta.columnMapping.maxColumnId": str(len(fields)),
            },
        }}))


def test_optimize_name_mapped_table(spark, tmp_path):
    """A renamed (name-mapped) table compacts: packed files carry the
    PHYSICAL column names, stats are physical-keyed, logical reads
    round-trip."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        parquet_column_names,
    )

    path = str(tmp_path / "t")
    for i in range(4):
        write_delta_table(
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(5)],
                "k int, v string",
            ).coalesce(1),
            path, mode="append",
        )
    _install_mapping(path, "name", [
        {"name": "key_id", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "k",
                      "delta.columnMapping.id": 1}},
        {"name": "val", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "v",
                      "delta.columnMapping.id": 2}},
    ])
    before = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )
    out = optimize_delta_table(spark, path)
    assert out["files_before"] == 4 and out["files_after"] == 1
    after_df = read_delta_table(spark, path)
    assert after_df.columns == ["key_id", "val"]
    assert sorted(tuple(r) for r in after_df.collect()) == before

    acts = _commit_actions(path, out["version"])
    add = next(a["add"] for a in acts if "add" in a)
    # the packed file: physical names inside, physical-keyed stats
    assert parquet_column_names(os.path.join(path, add["path"])) == {
        "k", "v",
    }
    st = json.loads(add["stats"])
    assert st["numRecords"] == 20
    assert set(st["minValues"]) == {"k", "v"}


def test_optimize_id_mapped_table_stamps_field_ids(spark, tmp_path):
    """id-mode: the packed file carries real parquet field ids so
    spec readers resolve it by id."""
    import pyarrow.parquet as pq

    path = str(tmp_path / "t")
    spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    for i in range(3):
        write_delta_table(
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(4)],
                "k int, v string",
            ).coalesce(1)
            .withMetadata("k", {"parquet.field.id": 1})
            .withMetadata("v", {"parquet.field.id": 2}),
            path, mode="append",
        )
    _install_mapping(path, "id", [
        {"name": "key_id", "type": "integer", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "k",
                      "delta.columnMapping.id": 1}},
        {"name": "val", "type": "string", "nullable": True,
         "metadata": {"delta.columnMapping.physicalName": "v",
                      "delta.columnMapping.id": 2}},
    ])
    before = sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    )
    out = optimize_delta_table(spark, path)
    assert out["files_after"] == 1
    assert sorted(
        tuple(r) for r in read_delta_table(spark, path).collect()
    ) == before
    add = next(
        a["add"] for a in _commit_actions(path, out["version"]) if "add" in a
    )
    sch = pq.ParquetFile(os.path.join(path, add["path"])).schema_arrow
    ids = {
        f.name: (f.metadata or {}).get(b"PARQUET:field_id")
        for f in sch
    }
    assert ids == {"k": b"1", "v": b"2"}


def test_optimize_partitioned_mapped_refuses(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta_table(
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1),
        path,
    )
    v = 1
    with open(
        os.path.join(path, "_delta_log", f"{v:020d}.json"), "w"
    ) as fh:
        fh.write(json.dumps({"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": json.dumps({"type": "struct", "fields": [
                {"name": "key_id", "type": "integer", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "k",
                              "delta.columnMapping.id": 1}},
                {"name": "val", "type": "string", "nullable": True,
                 "metadata": {"delta.columnMapping.physicalName": "v",
                              "delta.columnMapping.id": 2}},
            ]}),
            "partitionColumns": ["val"],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.columnMapping.maxColumnId": "2"},
        }}))
    with pytest.raises(ValueError, match="PARTITIONED column-mapped"):
        optimize_delta_table(spark, path)
