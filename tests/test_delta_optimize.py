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
