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


def test_convert_adopts_live_position_deletes(spark, tmp_path):
    """r7: CONVERT FROM ICEBERG on a delete-bearing v2 snapshot — the
    position-delete state materializes as the engine's DV sidecar at
    version 0 (data files byte-identical, O(deleted rows) IO) and
    every read honors it; post-adoption deletes stay on the DV
    discipline."""
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    src_files = sorted(t._commit(None).files)
    foreign = str(tmp_path / "foreign")
    # a genuine RELOCATION: the tree moves, the source retires (while
    # the source tree is still live, recorded paths resolve outside
    # the new root and adoption refuses — tested below)
    shutil.copytree(t.path, foreign)
    os.remove(os.path.join(foreign, "_meta.json"))
    shutil.rmtree(os.path.join(foreign, "_commits"))
    with pytest.raises(RuntimeError, match="outside the table root"):
        LakehouseTable.convert_iceberg(spark, foreign, key_cols=["k"])
    shutil.rmtree(t.path)
    a = LakehouseTable.convert_iceberg(spark, foreign, key_cols=["k"])
    c = a._commit(None)
    assert c.dv_files and c.stats["adopted_delete_files"] >= 1
    want = [k for k in range(40) if k not in (3, 7, 11, 25)]
    assert _keys(a.read()) == want
    # no data bytes rewritten: the adopted files are the source's own
    assert sorted(c.files) == src_files
    # deletes keep extending sidecars, never rewriting base files
    c2 = a.delete(spark.createDataFrame([(30,)], "k int"))
    assert c2.files == c.files
    assert _keys(a.read()) == [k for k in want if k != 30]


def test_convert_adopts_equality_deletes(spark, tmp_path):
    """r7: equality deletes materialize at adoption through the same
    sequence-ordered join the read path uses — same-sequence
    re-inserts survive in the adopted table too."""
    from tests.test_iceberg_meta import (
        _add_equality_delete_snapshot,
        _foreign_v2_tree,
    )

    root = str(tmp_path / "ice_eq")
    _sid1, sid2 = _foreign_v2_tree(root)
    _add_equality_delete_snapshot(root, sid2)
    a = LakehouseTable.convert_iceberg(spark, root, key_cols=["k"])
    assert a._commit(None).dv_files
    got = sorted(
        (r.k, r.v) for r in a.read().select("k", "v").collect()
    )
    assert got == [(1, "a"), (3, "c2")]


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
