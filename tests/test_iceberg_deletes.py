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


# ---------------------------------------------------------------------------
# equality-delete EXPORT dialect (r8)
# ---------------------------------------------------------------------------

from hudi_and_delta_showcase_spark.tables.iceberg_meta import (  # noqa: E402
    FILE_CONTENT_EQ_DELETES,
    STATUS_ADDED,
    STATUS_EXISTING,
    _snapshot_entries,
)


def test_equality_export_roundtrip_and_reinsert(spark, tmp_path):
    """Delete commits export as deleted-KEY files (equality_ids = the
    record key's field id); strict data_seq < delete_seq means a key
    re-inserted AFTER the delete survives the read-back."""
    t = _dv_table(spark, str(tmp_path / "t"))  # deletes 3, 7, 11, 25
    t.upsert(
        spark.createDataFrame([(3, "v3new", 99)], "k int, v string, g int")
    )
    t.delete(spark.createDataFrame([(11,), (12,)], "k int"))
    export_iceberg_metadata(t, delete_dialect="equality")

    got = read_iceberg_table(spark, t.path)
    assert sorted((r.k, r.v) for r in got.collect()) == sorted(
        (r.k, r.v) for r in t.read().select("k", "v").collect()
    )
    ks = _keys(got)
    assert 3 in ks and all(k not in ks for k in (7, 11, 12, 25))

    snaps = iceberg_snapshots(t.path)
    data, pos, eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    assert pos == [], "equality dialect must not emit position entries"
    assert eq, "delete commits must emit equality entries"
    # field id 1 = column k; every eq entry names exactly the key
    assert all(e["data_file"]["equality_ids"] == [1] for e in eq)
    assert all(
        e["data_file"]["content"] == FILE_CONTENT_EQ_DELETES for e in eq
    )
    # the first delete's entries ride EXISTING with their ORIGINAL
    # sequence number; the second delete's are ADDED at its own
    seqs = {(e["status"], e["sequence_number"]) for e in eq}
    assert (STATUS_EXISTING, 2) in seqs and (STATUS_ADDED, 4) in seqs
    # the delete file bodies are the KEYS, not positions
    eq_paths = [e["data_file"]["file_path"] for e in eq]
    body = spark.read.parquet(*eq_paths)
    assert body.columns == ["k"]
    # 11 appears once: the second delete found it already dead, so its
    # increment (and thus its eq file) carries only 12
    assert sorted(r.k for r in body.collect()) == [3, 7, 11, 12, 25]


def test_equality_export_time_travel_and_idempotent(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    v1 = export_iceberg_metadata(t, delete_dialect="equality")
    assert export_iceberg_metadata(t, delete_dialect="equality") == v1
    snaps = iceberg_snapshots(t.path)
    v0 = read_iceberg_table(
        spark, t.path, snapshot_id=snaps[0]["snapshot-id"]
    )
    assert len(_keys(v0)) == 40
    # incremental continuation keeps prior eq files EXISTING
    t.delete(spark.createDataFrame([(30,)], "k int"))
    assert export_iceberg_metadata(t, delete_dialect="equality") == v1 + 1
    got = read_iceberg_table(spark, t.path)
    assert len(_keys(got)) == 35 and 30 not in _keys(got)


def test_equality_export_optimize_resets_delete_state(spark, tmp_path):
    """OPTIMIZE rewrites the base (DV set resets): dead groups drop
    out of the next snapshot's manifests entirely."""
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t, delete_dialect="equality")
    t.optimize()
    export_iceberg_metadata(t, delete_dialect="equality")
    snaps = iceberg_snapshots(t.path)
    assert snaps[-1]["summary"]["total-delete-files"] == "0"
    assert _keys(read_iceberg_table(spark, t.path)) == _keys(t.read())


def test_equality_export_refuses_column_mapping(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    t.rename_column("v", "val")
    with pytest.raises(RuntimeError, match="column mapping"):
        export_iceberg_metadata(t, delete_dialect="equality")
    with pytest.raises(ValueError, match="delete_dialect"):
        export_iceberg_metadata(t, delete_dialect="positional")


def test_equality_export_expire_keeps_shared_eq_files(spark, tmp_path):
    """An eq file is SHARED by every later snapshot via EXISTING
    entries; expiring old snapshots must not reap it while a kept
    snapshot still references it."""
    t = _dv_table(spark, str(tmp_path / "t"))
    t.upsert(
        spark.createDataFrame([(50, "x", 0)], "k int, v string, g int")
    )
    export_iceberg_metadata(t, delete_dialect="equality")
    expire_iceberg_snapshots(t.path, keep_last=1)
    got = read_iceberg_table(spark, t.path)
    assert _keys(got) == _keys(t.read())


def test_equality_export_partitioned_table(spark, tmp_path):
    """A PARTITIONED (non-global-index) DV table resolves deletes on
    (key, partition): the equality files must carry BOTH columns and
    equality_ids must name both field ids — a key deleted in one
    partition must not kill its twin in another."""
    df = spark.createDataFrame(
        [(k, f"v{k}", g) for k in range(10) for g in ("a", "b")],
        "k int, v string, g string",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], partition_by="g", deletion_vectors=True,
    )
    # delete k=3 only in partition a
    t.delete(spark.createDataFrame([(3, "a")], "k int, g string"))
    export_iceberg_metadata(t, delete_dialect="equality")
    got = read_iceberg_table(spark, t.path)
    rows = sorted((r.k, r.g) for r in got.select("k", "g").collect())
    assert (3, "a") not in rows and (3, "b") in rows
    assert rows == sorted(
        (r.k, r.g) for r in t.read().select("k", "g").collect()
    )
    snaps = iceberg_snapshots(t.path)
    _, pos, eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    assert pos == [] and eq
    # both resolution columns ride equality_ids (k=1, g=3 in the
    # exported schema's field order k, v, g)
    ids = eq[0]["data_file"]["equality_ids"]
    assert len(ids) == 2
    body = spark.read.parquet(eq[0]["data_file"]["file_path"])
    assert sorted(body.columns) == ["g", "k"]
    assert [(r.k, r.g) for r in body.collect()] == [(3, "a")]


def test_equality_export_survives_relocation(spark, tmp_path):
    """Equality-delete files record the author's absolute paths; a
    copied tree must re-anchor them or deleted keys resurface."""
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t, delete_dialect="equality")
    moved = str(tmp_path / "moved")
    shutil.copytree(t.path, moved)
    shutil.rmtree(t.path)
    got = read_iceberg_table(spark, moved)
    assert _keys(got) == [k for k in range(40) if k not in (3, 7, 11, 25)]
