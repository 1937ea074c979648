"""Iceberg v2 position deletes: DV tables export without
materialization, readers (ours and relocated-foreign shapes) apply the
deletes, sequence numbers and lifecycle behave per spec."""

from __future__ import annotations

import os
import shutil

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    expire_iceberg_snapshots,
    export_iceberg_metadata,
    iceberg_snapshots,
    read_iceberg_metadata,
    read_iceberg_table,
    read_iceberg_where,
)


def _dv_table(spark, path) -> LakehouseTable:
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 5) for i in range(40)], "k int, v string, g int"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, path, df, key_cols=["k"], deletion_vectors=True
    )
    t.delete(spark.createDataFrame([(3,), (7,), (11,), (25,)], "k int"))
    return t


def _keys(df):
    return sorted(r.k for r in df.select("k").collect())


def test_dv_export_roundtrip_v2(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    assert t._commit(None).dv_files, "fixture must produce deletion vectors"
    export_iceberg_metadata(t)

    meta = read_iceberg_metadata(t.path)
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 2
    snaps = iceberg_snapshots(t.path)
    assert [s["sequence-number"] for s in snaps] == [1, 2]
    assert snaps[-1]["summary"]["operation"] == "delete"
    assert snaps[-1]["summary"]["total-delete-files"] >= "1"

    got = read_iceberg_table(spark, t.path)
    assert _keys(got) == _keys(t.read())
    assert 3 not in _keys(got) and len(_keys(got)) == 36
    # the deletes live under metadata/ (outside the VACUUM lifecycle)
    assert os.path.isdir(os.path.join(t.path, "metadata", "deletes"))


def test_dv_export_time_travel_sees_predelete_state(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    v0 = read_iceberg_table(spark, t.path, snapshot_id=snaps[0]["snapshot-id"])
    assert len(_keys(v0)) == 40


def test_read_where_applies_deletes(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    got = read_iceberg_where(spark, t.path, "k", lo=0, hi=15)
    assert _keys(got) == [k for k in range(16) if k not in (3, 7, 11)]


def test_relocated_tree_still_applies_deletes(spark, tmp_path):
    """Delete rows reference the AUTHOR's absolute data paths; after a
    tree copy the reader must re-anchor both the data scan and the
    delete rows, or deleted rows silently resurface."""
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    moved = str(tmp_path / "moved")
    shutil.copytree(t.path, moved)
    got = read_iceberg_table(spark, moved)
    assert _keys(got) == _keys(t.read())


def test_incremental_reexport_idempotent(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    v1 = export_iceberg_metadata(t)
    assert export_iceberg_metadata(t) == v1
    t.delete(spark.createDataFrame([(30,)], "k int"))
    v2 = export_iceberg_metadata(t)
    assert v2 == v1 + 1
    got = read_iceberg_table(spark, t.path)
    assert len(_keys(got)) == 35 and 30 not in _keys(got)


def test_optimize_materializes_and_export_continues(spark, tmp_path):
    """OPTIMIZE resets the DV set by rewriting; the next snapshot goes
    back to data-only manifests while the tree stays v2 and sequence
    numbers keep increasing."""
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    t.optimize()
    export_iceberg_metadata(t)
    meta = read_iceberg_metadata(t.path)
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 3
    snaps = iceberg_snapshots(t.path)
    assert snaps[-1]["summary"]["total-delete-files"] == "0"
    assert _keys(read_iceberg_table(spark, t.path)) == _keys(t.read())


def test_convert_refuses_live_position_deletes(spark, tmp_path):
    """CONVERT FROM ICEBERG adopts data files only — adopting a
    delete-bearing snapshot would resurrect deleted rows, so it must
    refuse loudly."""
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    foreign = str(tmp_path / "foreign")
    shutil.copytree(t.path, foreign)
    os.remove(os.path.join(foreign, "_meta.json"))
    shutil.rmtree(os.path.join(foreign, "_commits"))
    with pytest.raises(RuntimeError, match="delete files"):
        LakehouseTable.convert_iceberg(spark, foreign, key_cols=["k"])


def test_expire_reaps_our_exported_delete_parquet(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    t.delete(spark.createDataFrame([(30,)], "k int"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    first_del_sid = snaps[1]["snapshot-id"]
    old_dir = os.path.join(t.path, "metadata", "deletes", f"s{first_del_sid}")
    assert os.path.isdir(old_dir)
    expire_iceberg_snapshots(t.path, keep_last=1)
    assert not any(
        f.endswith(".parquet") for f in _walk(old_dir)
    ), "expired snapshot's exported delete parquet must be reaped"
    # the kept snapshot still reads correctly
    got = read_iceberg_table(spark, t.path)
    assert _keys(got) == _keys(t.read())


def _walk(root):
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            yield os.path.join(dirpath, f)
