"""RESTORE TABLE … TO VERSION|TIMESTAMP AS OF against a raw
_delta_log (r13): a NEW commit re-adds the target snapshot's missing
files and removes the rest (dataChange=true, delta-spark's
RestoreTableCommand shape), rolls back metadata when it changed,
never downgrades the protocol, and refuses when the target's files
were vacuumed away."""

from __future__ import annotations

import json
import os

import pytest

from hudi_and_delta_showcase_spark.tables.delta_log import (
    optimize_delta_table,
    read_delta_table,
    restore_delta_table,
    vacuum_delta_table,
    write_delta_table,
)


def _commit_actions(path, v):
    fn = os.path.join(path, "_delta_log", f"{v:020d}.json")
    return [json.loads(x) for x in open(fn) if x.strip()]


def _rows(spark, path, version=None):
    return sorted(
        tuple(r) for r in read_delta_table(spark, path, version=version).collect()
    )


def _mk(spark, path, n_appends=3):
    for i in range(n_appends):
        write_delta_table(
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(4)],
                "k int, v string",
            ).coalesce(1),
            path,
            mode="append",
        )


def test_restore_rolls_back_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    want_v0 = _rows(spark, path, version=0)
    assert len(want_v0) == 4

    out = restore_delta_table(spark, path, version=0)
    assert out["restored_to"] == 0
    assert out["version"] == 3  # a NEW commit, history preserved
    assert out["files_added"] == 0  # v0's file is still live
    assert out["files_removed"] == 2
    assert out["metadata_restored"] is False

    assert _rows(spark, path) == want_v0
    # the restore commit: removes stamped dataChange=true, op RESTORE
    acts = _commit_actions(path, 3)
    removes = [a["remove"] for a in acts if "remove" in a]
    ci = next(a["commitInfo"] for a in acts if "commitInfo" in a)
    assert len(removes) == 2
    assert all(r["dataChange"] is True for r in removes)
    assert ci["operation"] == "RESTORE"
    assert ci["operationParameters"]["version"] == "0"
    # the restore is itself time-travelable: pre-restore still serves
    assert len(_rows(spark, path, version=2)) == 12


def test_restore_readds_files_after_optimize(spark, tmp_path):
    """After OPTIMIZE replaced the originals, restoring to a
    pre-OPTIMIZE version re-ADDS the original files (they still
    exist — OPTIMIZE never deletes data) with their original stats
    riding along and dataChange=true."""
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    before = _rows(spark, path)
    opt = optimize_delta_table(spark, path)
    assert opt["files_after"] == 1

    out = restore_delta_table(spark, path, version=2)
    assert out["files_added"] == 3  # the three original appends
    assert out["files_removed"] == 1  # the packed file
    assert _rows(spark, path) == before
    acts = _commit_actions(path, out["version"])
    adds = [a["add"] for a in acts if "add" in a]
    assert len(adds) == 3
    assert all(a["dataChange"] is True for a in adds)
    # the original add actions ride along verbatim (path/size/pv)
    orig = {
        a["add"]["path"]: a["add"]
        for v in range(3)
        for a in _commit_actions(path, v)
        if "add" in a
    }
    for a in adds:
        assert a["size"] == orig[a["path"]]["size"]
        assert a["partitionValues"] == orig[a["path"]]["partitionValues"]


def test_restore_to_newest_is_noop(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=2)
    out = restore_delta_table(spark, path, version=1)
    assert out["version"] is None
    assert out["files_added"] == out["files_removed"] == 0
    with pytest.raises(ValueError, match="not in log"):
        restore_delta_table(spark, path, version=9)


def test_restore_by_timestamp(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=2)
    ts0 = next(
        a["commitInfo"]["timestamp"]
        for a in _commit_actions(path, 0)
        if "commitInfo" in a
    )
    out = restore_delta_table(spark, path, timestamp_ms=ts0)
    assert out["restored_to"] == 0
    assert len(_rows(spark, path)) == 4


def test_restore_refuses_vacuumed_target(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=3)
    optimize_delta_table(spark, path)
    # vacuum with zero retention deletes the pre-OPTIMIZE originals
    out = vacuum_delta_table(spark, path, retain_hours=0)
    assert out["deleted"] == 3
    with pytest.raises(ValueError, match="no longer exist"):
        restore_delta_table(spark, path, version=1)
    # the current snapshot still reads fine
    assert len(_rows(spark, path)) == 12


def test_restore_requires_exactly_one_target(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk(spark, path, n_appends=1)
    with pytest.raises(ValueError, match="exactly one"):
        restore_delta_table(spark, path)
    with pytest.raises(ValueError, match="exactly one"):
        restore_delta_table(spark, path, version=0, timestamp_ms=1)
