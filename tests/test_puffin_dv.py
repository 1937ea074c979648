"""Iceberg v3 deletion vectors: Puffin container + deletion-vector-v1
blobs (keyed Roaring64 portable, Delta-compatible framing), read through
the same position-delete plan v2 parquet deletes use, and adopted by
CONVERT FROM ICEBERG."""

from __future__ import annotations

import json
import os
import shutil
import struct

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable, puffin
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    read_iceberg_table,
)


# ---------------------------------------------------------------------------
# codec units
# ---------------------------------------------------------------------------


def test_dv_blob_roundtrip_and_framing():
    positions = [0, 1, 5, 70000, (3 << 32) | 7, (3 << 32) | 8, (9 << 32)]
    blob = puffin.encode_dv_blob(positions)
    # framing: int32 BE length of (magic + vector), the magic sequence
    (body_len,) = struct.unpack_from(">i", blob, 0)
    assert blob[4:8] == bytes((0xD1, 0xD3, 0x39, 0x64))
    assert len(blob) == 4 + body_len + 4
    assert puffin.decode_dv_blob(blob) == sorted(positions)
    # keyed SPARSE portable: high keys 0, 3, 9 -> exactly 3 bitmaps
    (n_bitmaps,) = struct.unpack_from("<q", blob, 8)
    assert n_bitmaps == 3


def test_dv_blob_rejects_corruption():
    blob = bytearray(puffin.encode_dv_blob([1, 2, 3]))
    blob[-1] ^= 0xFF  # flip a CRC byte
    with pytest.raises(ValueError, match="CRC"):
        puffin.decode_dv_blob(bytes(blob))
    blob = bytearray(puffin.encode_dv_blob([1, 2, 3]))
    blob[4] ^= 0xFF  # break the magic
    with pytest.raises(ValueError, match="magic"):
        puffin.decode_dv_blob(bytes(blob))


def test_puffin_container_roundtrip(tmp_path):
    path = str(tmp_path / "dvs.puffin")
    ranges = puffin.write_puffin_dvs(
        path,
        {"data/a.parquet": [0, 2], "data/b.parquet": [1, (1 << 32) | 3]},
        snapshot_id=77,
        sequence_number=3,
    )
    assert set(ranges) == {"data/a.parquet", "data/b.parquet"}
    # manifest-recorded byte ranges decode without the footer
    off, size, card = ranges["data/a.parquet"]
    assert card == 2
    assert puffin.read_dv_positions(path, off, size) == [0, 2]
    off, size, _ = ranges["data/b.parquet"]
    assert puffin.read_dv_positions(path, off, size) == [1, (1 << 32) | 3]
    # ...and the footer indexes the same blobs for footer-driven readers
    footer = puffin.read_puffin_footer(path)
    blobs = {b["properties"]["referenced-data-file"]: b for b in footer["blobs"]}
    assert blobs["data/a.parquet"]["type"] == "deletion-vector-v1"
    assert blobs["data/a.parquet"]["offset"] == ranges["data/a.parquet"][0]
    assert blobs["data/a.parquet"]["length"] == ranges["data/a.parquet"][1]
    assert blobs["data/b.parquet"]["snapshot-id"] == 77
    assert blobs["data/b.parquet"]["sequence-number"] == 3


def test_puffin_footer_rejects_compressed_payload(tmp_path):
    path = str(tmp_path / "bad.puffin")
    puffin.write_puffin_dvs(path, {"f": [1]}, 1, 1)
    raw = bytearray(open(path, "rb").read())
    raw[-8] |= 1  # set the lz4 flag bit
    open(path, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="lz4"):
        puffin.read_puffin_footer(path)


# ---------------------------------------------------------------------------
# foreign v3 tree: DV delete manifests served and adopted
# ---------------------------------------------------------------------------


def _opt(name, t, fid):
    return {"name": name, "type": ["null", t], "default": None,
            "field-id": fid}


def _foreign_v3_tree(root: str) -> tuple[int, int]:
    """A format-version 3 tree the way an iceberg-java v3 writer lays
    it out: snapshot 1 appends two data files, snapshot 2 deletes rows
    via a deletion vector — a content=1 manifest entry naming a Puffin
    file, the blob byte range (fields 144/145) and the one referenced
    data file (field 143). Returns (sid1, sid2)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hudi_and_delta_showcase_spark.avro_ocf import ocf_encode

    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    f0 = os.path.join(root, "data", "00000-0-dat-a.parquet")
    f1 = os.path.join(root, "data", "00001-0-dat-b.parquet")
    pq.write_table(
        pa.table(
            {"k": pa.array([1, 2, 4], pa.int32()),
             "v": pa.array(["a", "b", "d"])}
        ),
        f0,
    )
    pq.write_table(
        pa.table({"k": pa.array([3], pa.int32()), "v": pa.array(["c"])}), f1
    )
    sid1, sid2 = 5100000000000000001, 5100000000000000002

    # the deletion vector: kill rows 0 and 2 of f0 (k=1, k=4)
    pf = os.path.join(root, "data", "dv-0001.puffin")
    ranges = puffin.write_puffin_dvs(
        pf, {f0: [0, 2]}, snapshot_id=sid2, sequence_number=2
    )
    dv_off, dv_size, dv_card = ranges[f0]

    data_file = {
        "type": "record", "name": "r2",
        "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition",
             "type": {"type": "record", "name": "r102", "fields": []},
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            _opt("referenced_data_file", "string", 143),
            _opt("content_offset", "long", 144),
            _opt("content_size_in_bytes", "long", 145),
        ],
    }
    entry_schema = {
        "type": "record", "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            _opt("snapshot_id", "long", 1),
            _opt("sequence_number", "long", 3),
            _opt("file_sequence_number", "long", 4),
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }
    mlist_schema = {
        "type": "record", "name": "manifest_file",
        "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_data_files_count", "type": "int",
             "field-id": 504},
            {"name": "existing_data_files_count", "type": "int",
             "field-id": 505},
            {"name": "deleted_data_files_count", "type": "int",
             "field-id": 506},
        ],
    }

    def dentry(status, sid, seq, path, rows, ref=None, off=None, size=None):
        return {
            "status": status, "snapshot_id": sid, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": 0 if ref is None else 1,
                "file_path": path,
                "file_format": "PARQUET" if ref is None else "PUFFIN",
                "partition": {}, "record_count": rows,
                "file_size_in_bytes": os.path.getsize(path),
                "referenced_data_file": ref,
                "content_offset": off,
                "content_size_in_bytes": size,
            },
        }

    m1 = os.path.join(root, "metadata", "aaa-1111-m0.avro")
    b1 = ocf_encode(
        entry_schema,
        [dentry(1, sid1, 1, f0, 3), dentry(1, sid1, 1, f1, 1)],
        codec="deflate",
    )
    open(m1, "wb").write(b1)
    m2 = os.path.join(root, "metadata", "bbb-2222-m1.avro")
    b2 = ocf_encode(
        entry_schema,
        [dentry(1, sid2, 2, pf, dv_card, ref=f0, off=dv_off, size=dv_size)],
        codec="deflate",
    )
    open(m2, "wb").write(b2)

    def mfile(path, blob, content, seq, sid, a, e):
        return {
            "manifest_path": path, "manifest_length": len(blob),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": 1,
            "added_snapshot_id": sid,
            "added_data_files_count": a, "existing_data_files_count": e,
            "deleted_data_files_count": 0,
        }

    l1 = os.path.join(root, "metadata", f"snap-{sid1}-1-ccc.avro")
    open(l1, "wb").write(
        ocf_encode(mlist_schema, [mfile(m1, b1, 0, 1, sid1, 2, 0)],
                   codec="deflate")
    )
    l2 = os.path.join(root, "metadata", f"snap-{sid2}-1-ddd.avro")
    open(l2, "wb").write(
        ocf_encode(
            mlist_schema,
            [mfile(m1, b1, 0, 1, sid1, 2, 0), mfile(m2, b2, 1, 2, sid2, 1, 0)],
            codec="deflate",
        )
    )

    schema = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "int"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }
    meta = {
        "format-version": 3,
        "table-uuid": "9c3b1712-0000-4000-8000-000000000003",
        "location": root, "last-sequence-number": 2,
        "last-updated-ms": 1700000100000, "last-column-id": 2,
        "current-schema-id": 0, "schemas": [schema], "schema": schema,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}], "properties": {},
        "current-snapshot-id": sid2,
        "snapshots": [
            {"sequence-number": 1, "snapshot-id": sid1,
             "timestamp-ms": 1700000000000,
             "summary": {"operation": "append"}, "manifest-list": l1,
             "schema-id": 0},
            {"sequence-number": 2, "snapshot-id": sid2,
             "parent-snapshot-id": sid1, "timestamp-ms": 1700000100000,
             "summary": {"operation": "delete"}, "manifest-list": l2,
             "schema-id": 0},
        ],
        "snapshot-log": [], "metadata-log": [],
    }
    with open(
        os.path.join(
            root, "metadata",
            "00002-7a1f0000-0000-4000-8000-000000000003.metadata.json",
        ),
        "w",
    ) as fh:
        json.dump(meta, fh)
    return sid1, sid2


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_reads_foreign_v3_dv_tree(spark, tmp_path):
    root = str(tmp_path / "ice_v3")
    sid1, _sid2 = _foreign_v3_tree(root)
    assert _rows(read_iceberg_table(spark, root)) == [(2, "b"), (3, "c")]
    # time travel below the DV sees the pre-delete rows
    assert _rows(read_iceberg_table(spark, root, snapshot_id=sid1)) == [
        (1, "a"), (2, "b"), (3, "c"), (4, "d"),
    ]


def test_relocated_v3_tree_reanchors_dvs(spark, tmp_path):
    """Both the Puffin path and the referenced data file are recorded
    as the AUTHOR's absolute paths; a copied tree must re-anchor both
    or deleted rows resurface."""
    root = str(tmp_path / "ice_v3")
    _foreign_v3_tree(root)
    moved = str(tmp_path / "moved")
    shutil.copytree(root, moved)
    shutil.rmtree(root)
    assert _rows(read_iceberg_table(spark, moved)) == [(2, "b"), (3, "c")]


def test_convert_adopts_v3_dv_tree(spark, tmp_path):
    """CONVERT FROM ICEBERG on a v3 DV snapshot: the Puffin blob
    materializes as the engine's own DV sidecar at version 0; data
    files stay byte-identical."""
    root = str(tmp_path / "ice_v3")
    _foreign_v3_tree(root)
    a = LakehouseTable.convert_iceberg(spark, root, key_cols=["k"])
    c = a._commit(None)
    assert c.dv_files, "v3 DVs must adopt as DV sidecars"
    assert _rows(a.read().select("k", "v")) == [(2, "b"), (3, "c")]
    # post-adoption deletes keep extending sidecars
    a.delete(spark.createDataFrame([(3,)], "k int"))
    assert _rows(a.read().select("k", "v")) == [(2, "b")]


# ---------------------------------------------------------------------------
# v3 EXPORT: engine DV state -> Puffin deletion vectors + row lineage
# ---------------------------------------------------------------------------

from hudi_and_delta_showcase_spark.tables.iceberg_meta import (  # noqa: E402
    export_iceberg_metadata,
    iceberg_snapshots,
    read_iceberg_metadata,
    _snapshot_entries,
)


def _dv_table(spark, path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k int, v string"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, path, df, key_cols=["k"], deletion_vectors=True
    )
    t.delete(spark.createDataFrame([(3,), (7,), (25,)], "k int"))
    return t


def test_v3_export_roundtrip(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t, format_version=3)
    meta = read_iceberg_metadata(t.path)
    assert meta["format-version"] == 3
    # row lineage: every data file got an explicit first_row_id and
    # the metadata carries the running next-row-id
    assert meta["next-row-id"] == 40
    snaps = iceberg_snapshots(t.path)
    assert [s["first-row-id"] for s in snaps] == [0, 40]
    data, pos, eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    assert eq == []
    assert pos and all(
        e["data_file"]["file_format"] == "PUFFIN"
        and e["data_file"]["referenced_data_file"]
        and e["data_file"]["content_offset"] is not None
        for e in pos
    )
    frids = sorted(e["data_file"]["first_row_id"] for e in data)
    rows = sorted(e["data_file"]["record_count"] for e in data)
    assert frids[0] == 0 and len(frids) == 2
    assert frids[1] in rows  # second file starts after the first
    # the blobs decode through the same read path
    got = read_iceberg_table(spark, t.path)
    ks = sorted(r.k for r in got.collect())
    assert ks == [k for k in range(40) if k not in (3, 7, 25)]
    # time travel below the delete
    v0 = read_iceberg_table(spark, t.path, snapshot_id=snaps[0]["snapshot-id"])
    assert v0.count() == 40


def test_v3_export_incremental_and_adoption(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    v1 = export_iceberg_metadata(t, format_version=3)
    assert export_iceberg_metadata(t, format_version=3) == v1
    # once v3, always v3 — a later export without the flag stays v3,
    # and an explicit downgrade refuses
    t.delete(spark.createDataFrame([(30,)], "k int"))
    v2 = export_iceberg_metadata(t)
    assert v2 == v1 + 1
    assert read_iceberg_metadata(t.path)["format-version"] == 3
    with pytest.raises(ValueError, match="downgrade"):
        export_iceberg_metadata(t, format_version=2)
    got = read_iceberg_table(spark, t.path)
    assert sorted(r.k for r in got.collect()) == [
        k for k in range(40) if k not in (3, 7, 25, 30)
    ]
    # the v3 tree adopts back (full circle)
    import os
    import shutil

    foreign = str(tmp_path / "foreign")
    shutil.copytree(t.path, foreign)
    os.remove(os.path.join(foreign, "_meta.json"))
    shutil.rmtree(os.path.join(foreign, "_commits"))
    shutil.rmtree(t.path)
    a = LakehouseTable.convert_iceberg(spark, foreign, key_cols=["k"])
    assert sorted(r.k for r in a.read().collect()) == [
        k for k in range(40) if k not in (3, 7, 25, 30)
    ]


def test_v3_export_positions_never_collected(spark, tmp_path, monkeypatch):
    """The v3 DV export must stay executor-authored: every DataFrame
    the export collects on the driver is manifest-scale (descriptor /
    count columns), never row positions or position sets — the exact
    funnel the r8/r9 verdicts flagged at the old per-snapshot writer."""
    try:  # pyspark 4: the concrete class defines its own collect
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # pragma: no cover - pyspark 3 layout
        from pyspark.sql import DataFrame

    t = _dv_table(spark, str(tmp_path / "t"))
    seen: list[list[str]] = []
    orig = DataFrame.collect

    def spy(self):
        seen.append(list(self.columns))
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", spy)
    export_iceberg_metadata(t, format_version=3)
    monkeypatch.setattr(DataFrame, "collect", orig)
    assert seen, "the export collects descriptor rows"
    for cols in seen:
        assert "pos" not in cols and "ps" not in cols, cols
    # the per-file containers it wrote decode through the read path
    got = read_iceberg_table(spark, t.path)
    assert sorted(r.k for r in got.collect()) == [
        k for k in range(40) if k not in (3, 7, 25)
    ]


def test_v3_export_refuses_equality_dialect(spark, tmp_path):
    t = _dv_table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="v3"):
        export_iceberg_metadata(
            t, delete_dialect="equality", format_version=3
        )


# ---------------------------------------------------------------------------
# property: any position set roundtrips the blob codec
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=60, deadline=None)
@given(
    st.sets(
        st.one_of(
            st.integers(min_value=0, max_value=1 << 20),
            # straddle container boundaries and high-key space
            st.integers(min_value=(1 << 32) - 8, max_value=(1 << 32) + 8),
            st.integers(min_value=0, max_value=(1 << 40)),
        ),
        max_size=400,
    )
)
def test_dv_blob_roundtrip_property(positions):
    blob = puffin.encode_dv_blob(sorted(positions))
    assert puffin.decode_dv_blob(blob) == sorted(positions)


def test_dv_entry_without_byte_range_refuses(spark, tmp_path):
    """A deletion-vector entry whose manifest omits content_offset /
    content_size_in_bytes cannot be decoded — the reader must refuse
    loudly, never silently skip the deletes."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _pos_delete_rows,
    )

    entry = {
        "data_file": {
            "content": 1,
            "file_path": str(tmp_path / "dv.puffin"),
            "file_format": "PUFFIN",
            "record_count": 2,
            "referenced_data_file": str(tmp_path / "a.parquet"),
            "content_offset": None,
            "content_size_in_bytes": None,
        }
    }
    with pytest.raises(ValueError, match="content_offset"):
        _pos_delete_rows(spark, str(tmp_path), [entry])


def test_file_scoped_v2_pos_delete_parquet_not_mistaken_for_dv():
    """v2 writers may stamp referenced_data_file (field 143) on
    FILE-SCOPED position-delete parquet; only the format / byte range
    marks a Puffin deletion vector."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _is_dv_entry,
    )

    pos_parquet = {"data_file": {
        "content": 1, "file_path": "d.parquet", "file_format": "PARQUET",
        "referenced_data_file": "a.parquet",
        "content_offset": None, "content_size_in_bytes": None,
    }}
    dv = {"data_file": {
        "content": 1, "file_path": "d.puffin", "file_format": "PUFFIN",
        "referenced_data_file": "a.parquet",
        "content_offset": 4, "content_size_in_bytes": 40,
    }}
    assert not _is_dv_entry(pos_parquet)
    assert _is_dv_entry(dv)


def test_v3_export_partitioned_table(spark, tmp_path):
    """A partitioned DV table exports v3 with the same Puffin-per-
    snapshot layout: vectors reference the hive-laid data files and
    the partition-scoped delete stays partition-scoped on read-back."""
    df = spark.createDataFrame(
        [(k, f"v{k}", g) for k in range(10) for g in ("a", "b")],
        "k int, v string, g string",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], partition_by="g", deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3, "a")], "k int, g string"))
    export_iceberg_metadata(t, format_version=3)
    got = read_iceberg_table(spark, t.path)
    rows = sorted((r.k, r.g) for r in got.select("k", "g").collect())
    assert (3, "a") not in rows and (3, "b") in rows
    assert rows == sorted(
        (r.k, r.g) for r in t.read().select("k", "g").collect()
    )
    snaps = iceberg_snapshots(t.path)
    _, pos, eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    assert eq == [] and pos
    assert all(
        e["data_file"]["file_format"] == "PUFFIN"
        and e["data_file"]["referenced_data_file"]
        for e in pos
    )


def test_v3_expire_reaps_puffin(spark, tmp_path):
    """Expired snapshots' Puffin files live under metadata/deletes/
    and must reap with them; the kept snapshot still reads."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        expire_iceberg_snapshots,
    )

    import glob

    t = _dv_table(spark, str(tmp_path / "t"))  # delete at v1
    t.delete(spark.createDataFrame([(30,)], "k int"))  # v2
    export_iceberg_metadata(t, format_version=3)
    snaps = iceberg_snapshots(t.path)
    old_sid = snaps[1]["snapshot-id"]
    old_puffins = glob.glob(
        os.path.join(t.path, "metadata", "deletes", f"s{old_sid}-*.puffin")
    )
    assert old_puffins
    expire_iceberg_snapshots(t.path, keep_last=1)
    assert not any(os.path.exists(p) for p in old_puffins)
    got = read_iceberg_table(spark, t.path)
    assert sorted(r.k for r in got.collect()) == [
        k for k in range(40) if k not in (3, 7, 25, 30)
    ]
