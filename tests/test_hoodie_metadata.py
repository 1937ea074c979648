"""Foreign Hudi METADATA TABLE (r10, verdict r8/r9 #7): the
``.hoodie/metadata/files`` partition resolves file listings —
O(partitions + live files) metadata IO instead of a recursive walk —
with timeline replay / listing as the pinned fallback for
HFile-compacted partitions."""

from __future__ import annotations

import os

import pytest

from hudi_and_delta_showcase_spark.tables import fsio, hoodie_metadata
from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

#: the HoodieMetadataRecord writer schema a 0.14+ files-partition log
#: block carries in its SCHEMA header (trimmed to the fields this
#: reader consumes; real blocks add more nullable metadata branches,
#: which generic header-schema decode skips past)
_MD_SCHEMA = {
    "namespace": "org.apache.hudi.avro.model",
    "type": "record",
    "name": "HoodieMetadataRecord",
    "fields": [
        {"name": "key", "type": "string"},
        {"name": "type", "type": "int"},
        {
            "name": "filesystemMetadata",
            "type": [
                "null",
                {
                    "type": "map",
                    "values": {
                        "type": "record",
                        "name": "HoodieMetadataFileInfo",
                        "fields": [
                            {"name": "size", "type": "long"},
                            {"name": "isDeleted", "type": "boolean"},
                        ],
                    },
                },
            ],
            "default": None,
        },
    ],
}


def _files_record(key: str, files: dict[str, int | None]) -> dict:
    return {
        "key": key,
        "type": 2,
        "filesystemMetadata": {
            name: {
                "size": 0 if size is None else size,
                "isDeleted": size is None,
            }
            for name, size in files.items()
        },
    }


def _write_md_commit(root: str, instant: str, records: list[dict],
                     version: int = 1) -> None:
    """One deltacommit of the metadata table's files partition: a log
    file of one Avro data block + the completed instant file."""
    md = os.path.join(root, ".hoodie", "metadata")
    files_dir = os.path.join(md, "files")
    os.makedirs(files_dir, exist_ok=True)
    os.makedirs(os.path.join(md, ".hoodie"), exist_ok=True)
    blob = hl.avro_data_block(records, _MD_SCHEMA, instant)
    hl.write_log_file(
        os.path.join(
            files_dir,
            hl.log_file_name("files-0000", "00000000000000",
                             version=version),
        ),
        [blob],
    )
    open(os.path.join(md, ".hoodie", f"{instant}.deltacommit"), "w").close()


def test_reads_files_partition_and_merges(tmp_path):
    root = str(tmp_path / "ht")
    _write_md_commit(root, "20240101000000001", [
        {"key": hoodie_metadata.ALL_PARTITIONS_KEY, "type": 1,
         "filesystemMetadata": {"2024": {"size": 0, "isDeleted": False}}},
        _files_record("2024", {"f1_0-0-0_20240101000000001.parquet": 100}),
        _files_record(".", {"g1_0-0-0_20240101000000001.parquet": 50}),
    ], version=1)
    # a later commit adds one file, deletes another, in a NEW log file
    _write_md_commit(root, "20240102000000002", [
        _files_record("2024", {
            "f2_0-0-0_20240102000000002.parquet": 200,
            "f1_0-0-0_20240101000000001.parquet": None,  # deleted
        }),
    ], version=2)
    state = hoodie_metadata.read_hoodie_metadata_files(root)
    assert state == {
        "2024": {"f2_0-0-0_20240102000000002.parquet": 200},
        "": {"g1_0-0-0_20240101000000001.parquet": 50},
    }
    assert hoodie_metadata.list_data_files(root) == [
        "2024/f2_0-0-0_20240102000000002.parquet",
        "g1_0-0-0_20240101000000001.parquet",
    ]


def test_uncommitted_metadata_blocks_ignored(tmp_path):
    root = str(tmp_path / "ht")
    _write_md_commit(root, "001", [_files_record(".", {"a.parquet": 1})])
    # a block from an instant with no completed deltacommit is invisible
    md = os.path.join(root, ".hoodie", "metadata", "files")
    blob = hl.avro_data_block(
        [_files_record(".", {"torn.parquet": 9})], _MD_SCHEMA, "002"
    )
    hl.write_log_file(
        os.path.join(md, hl.log_file_name("files-0000", "00000000000000",
                                          version=2)),
        [blob],
    )
    assert hoodie_metadata.read_hoodie_metadata_files(root) == {
        "": {"a.parquet": 1}
    }


def test_hfile_compacted_partition_falls_back(tmp_path):
    root = str(tmp_path / "ht")
    _write_md_commit(root, "001", [_files_record(".", {"a.parquet": 1})])
    md = os.path.join(root, ".hoodie", "metadata", "files")
    open(os.path.join(
        md, "files-0000_0-0-0_001.hfile"
    ), "wb").write(b"HFILEBYTES")
    assert hoodie_metadata.read_hoodie_metadata_files(root) is None
    assert hoodie_metadata.list_data_files(root) is None


def test_absent_metadata_table_falls_back(tmp_path):
    root = str(tmp_path / "ht")
    os.makedirs(os.path.join(root, ".hoodie"))
    assert hoodie_metadata.read_hoodie_metadata_files(root) is None


def _archived_foreign_tree(spark, root: str, with_metadata: bool):
    """A 0.14+-shaped foreign tree whose FIRST commit has been archived
    (write stats gone from the active timeline): one Hudi-named base
    file below the horizon + one active commit, plus — when asked — a
    metadata table listing both files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    i1, i2 = "20240101000000001", "20240102000000002"
    f1 = f"fid-a_0-0-0_{i1}.parquet"
    f2 = f"fid-b_0-0-0_{i2}.parquet"
    os.makedirs(os.path.join(root, ".hoodie", "archived"))
    pq.write_table(
        pa.table({"k": pa.array([1], pa.int64()), "v": pa.array(["a"])}),
        os.path.join(root, f1),
    )
    pq.write_table(
        pa.table({"k": pa.array([2], pa.int64()), "v": pa.array(["b"])}),
        os.path.join(root, f2),
    )
    # archived marker for i1 (content opaque); active timeline has i2
    open(os.path.join(root, ".hoodie", "archived",
                      "commits_.archive.1_1-0-1"), "w").close()
    import json

    meta = {
        "partitionToWriteStats": {"": [
            {"fileId": "fid-b", "path": f2, "prevCommit": "null",
             "numWrites": 1, "fileSizeInBytes": 500}
        ]},
        "compacted": False, "extraMetadata": {},
        "operationType": "UPSERT",
    }
    with open(os.path.join(root, ".hoodie", f"{i2}.commit"), "w") as fh:
        json.dump(meta, fh)
    if with_metadata:
        _write_md_commit(root, i2, [
            _files_record(".", {f1: 100, f2: 100}),
        ])
    return f1, f2


def test_archived_listing_prefers_metadata_table(spark, tmp_path,
                                                 monkeypatch):
    """THE PIN: with a metadata table present, below-horizon slice
    discovery never walks the directory tree — the recursive walk is
    monkeypatched to fail."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        latest_file_slices_rt,
        read_hoodie_table,
    )

    root = str(tmp_path / "ht")
    f1, f2 = _archived_foreign_tree(spark, root, with_metadata=True)

    def no_walk(*a, **k):
        raise AssertionError(
            "metadata-table listing must replace the directory walk"
        )

    monkeypatch.setattr(fsio, "walk_files", no_walk)
    slices = latest_file_slices_rt(root)
    assert {s["base"] for s in slices.values()} == {f1, f2}
    monkeypatch.undo()
    got = sorted(
        (r.k, r.v)
        for r in read_hoodie_table(spark, root).select("k", "v").collect()
    )
    assert got == [(1, "a"), (2, "b")]


def test_archived_listing_walk_fallback_still_works(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        read_hoodie_table,
    )

    root = str(tmp_path / "ht")
    _archived_foreign_tree(spark, root, with_metadata=False)
    got = sorted(
        (r.k, r.v)
        for r in read_hoodie_table(spark, root).select("k", "v").collect()
    )
    assert got == [(1, "a"), (2, "b")]


# ---------------------------------------------------------------------------
# r11: HFile-compacted partitions decode natively (tables/hfile.py)
# ---------------------------------------------------------------------------


def _write_md_hfile_base(root: str, instant: str,
                         records: list[dict]) -> None:
    """One COMPACTION commit of the metadata files partition: an HFile
    v3 base file whose cells are (record key, avro-binary record), the
    record schema stamped in the HFile's file info — the byte shape
    Hudi's metadata compaction writes."""
    import io
    import json

    from hudi_and_delta_showcase_spark import avro_ocf
    from hudi_and_delta_showcase_spark.tables import hfile

    md = os.path.join(root, ".hoodie", "metadata")
    files_dir = os.path.join(md, "files")
    os.makedirs(files_dir, exist_ok=True)
    os.makedirs(os.path.join(md, ".hoodie"), exist_ok=True)
    cells = []
    for rec in sorted(records, key=lambda r: r["key"]):
        buf = io.BytesIO()
        avro_ocf._encode(_MD_SCHEMA, rec, buf)
        cells.append((rec["key"].encode(), buf.getvalue()))
    blob = hfile.write_hfile(
        cells, {b"schema": json.dumps(_MD_SCHEMA).encode()}
    )
    open(os.path.join(
        files_dir, f"files-0000_0-0-0_{instant}.hfile"
    ), "wb").write(blob)
    open(os.path.join(md, ".hoodie", f"{instant}.commit"), "w").close()


def _write_md_log_on_slice(root: str, instant: str, base_instant: str,
                           records: list[dict], version: int = 1) -> None:
    md = os.path.join(root, ".hoodie", "metadata")
    files_dir = os.path.join(md, "files")
    blob = hl.avro_data_block(records, _MD_SCHEMA, instant)
    hl.write_log_file(
        os.path.join(
            files_dir,
            hl.log_file_name("files-0000", base_instant, version=version),
        ),
        [blob],
    )
    open(os.path.join(md, ".hoodie", f"{instant}.deltacommit"), "w").close()


def test_hfile_compacted_base_serves(tmp_path):
    """r11 (verdict #6): an HFile-compacted files partition serves the
    O(partitions) listing natively — no recursive walk, no fallback."""
    root = str(tmp_path / "ht")
    compaction = "20240105000000000"
    _write_md_hfile_base(root, compaction, [
        {"key": hoodie_metadata.ALL_PARTITIONS_KEY, "type": 1,
         "filesystemMetadata": {"2024": {"size": 0, "isDeleted": False}}},
        _files_record("2024", {"f1_0-0-0_20240101000000001.parquet": 100}),
        _files_record(".", {"g1_0-0-0_20240101000000001.parquet": 50}),
    ])
    state = hoodie_metadata.read_hoodie_metadata_files(root)
    assert state == {
        "2024": {"f1_0-0-0_20240101000000001.parquet": 100},
        "": {"g1_0-0-0_20240101000000001.parquet": 50},
    }


def test_hfile_base_plus_slice_logs_merge(tmp_path):
    """Logs of the compacted slice apply ON TOP of the HFile fold;
    pre-compaction logs (older base instant) are already inside the
    fold and must not replay."""
    root = str(tmp_path / "ht")
    # a PRE-compaction log whose adds were later superseded: replaying
    # it would resurrect f0
    _write_md_commit(root, "20240101000000001", [
        _files_record("2024", {"f0_0-0-0_20240101000000001.parquet": 10}),
    ], version=1)
    compaction = "20240105000000000"
    _write_md_hfile_base(root, compaction, [
        _files_record("2024", {"f1_0-0-0_20240104000000004.parquet": 100}),
    ])
    # post-compaction delta: adds f2, deletes f1
    _write_md_log_on_slice(root, "20240106000000006", compaction, [
        _files_record("2024", {
            "f2_0-0-0_20240106000000006.parquet": 200,
            "f1_0-0-0_20240104000000004.parquet": None,
        }),
    ])
    state = hoodie_metadata.read_hoodie_metadata_files(root)
    assert state == {
        "2024": {"f2_0-0-0_20240106000000006.parquet": 200},
    }


def test_hfile_uncommitted_base_ignored(tmp_path):
    """An HFile whose instant never completed is an in-progress or
    crashed compaction: Hudi's rule is to IGNORE it and serve the
    previous slice — the log-only state here."""
    root = str(tmp_path / "ht")
    _write_md_commit(root, "20240101000000001",
                     [_files_record(".", {"a.parquet": 1})])
    _write_md_hfile_base(root, "20240109000000009",
                         [_files_record(".", {"b.parquet": 2})])
    os.remove(os.path.join(
        root, ".hoodie", "metadata", ".hoodie",
        "20240109000000009.commit",
    ))
    assert hoodie_metadata.read_hoodie_metadata_files(root) == {
        "": {"a.parquet": 1}
    }


def test_hfile_gz_and_none_round_trip():
    from hudi_and_delta_showcase_spark.tables import hfile

    cells = [(f"r{i:04d}".encode(), bytes([i % 251]) * (i % 97 + 1))
             for i in range(3000)]
    for comp in ("none", "gz"):
        blob = hfile.write_hfile(cells, {b"k": b"v"}, compression=comp,
                                 block_size=2048)
        parsed = hfile.read_hfile(blob)
        assert parsed["cells"] == cells
        assert parsed["file_info"][b"k"] == b"v"
        assert parsed["entry_count"] == len(cells)


def test_hfile_refuses_unsupported(tmp_path):
    import struct as _s

    from hudi_and_delta_showcase_spark.tables import hfile

    with pytest.raises(ValueError, match="trailer"):
        hfile.read_hfile(b"\x00" * 5000)
    blob = bytearray(hfile.write_hfile([(b"a", b"1")]))
    blob[-4:] = _s.pack(">i", 2)  # masquerade as HFile v2
    with pytest.raises(ValueError, match="major version"):
        hfile.read_hfile(bytes(blob))
    with pytest.raises(ValueError, match="sorted"):
        hfile.write_hfile([(b"b", b"1"), (b"a", b"2")])


def test_compact_then_export_cycle(spark, tmp_path):
    """r11 write side: compact_hoodie_metadata folds the exported log
    slices into HFile v3 bases (the format real Hudi compaction
    writes); later exports append their deltas to the NEW slice and
    the listing + col-stats reads serve through the compacted state."""
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 4 else "b") for k in range(8)],
        "k int, v string, g string",
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], partition_by="g"
    )
    assert hoodie_metadata.export_hoodie_metadata(t) is not None
    before = hoodie_metadata.read_hoodie_metadata_files(t.path)
    inst = hoodie_metadata.compact_hoodie_metadata(t.path)
    assert inst is not None
    md_files = os.listdir(
        os.path.join(t.path, ".hoodie", "metadata", "files")
    )
    assert any(f.endswith(".hfile") for f in md_files)
    assert hoodie_metadata.read_hoodie_metadata_files(t.path) == before
    stats = hoodie_metadata.read_hoodie_metadata_col_stats(t.path)
    assert stats  # col-stats partition compacted and still serves
    # a post-compaction commit exports a delta onto the NEW slice
    t.upsert(spark.createDataFrame(
        [(10, "x", "c")], "k int, v string, g string"
    ))
    assert hoodie_metadata.export_hoodie_metadata(t) is not None
    after = hoodie_metadata.read_hoodie_metadata_files(t.path)
    assert any("=c" in part for part in after)
    for part, files in before.items():
        assert set(files) <= set(after.get(part, {}))


def test_hfile_mvcc_vlong_cells_decode():
    """r11 review fix: the per-cell memstore timestamp is a Hadoop
    WritableUtils vlong — a multi-byte sequence id must not desync the
    cell stream."""
    import struct as _s

    from hudi_and_delta_showcase_spark.tables import hfile

    cells = [(b"a", b"v1"), (b"b", b"v2"), (b"c", b"v3")]
    payload = bytearray()
    for row, val in cells:
        key = hfile.cell_key(row)
        payload += _s.pack(">ii", len(key), len(val)) + key + val
        # Hadoop vlong 200 = 0x8F 0xC8 (two bytes, NOT protobuf varint)
        payload += hfile._hadoop_vint_write(200)
    got = hfile._parse_cells(bytes(payload), includes_mvcc=True,
                             includes_tags=False)
    assert [(hfile.cell_row(k), v) for k, v in got] == cells


def test_hfile_truncation_raises_valueerror():
    """r11 review fix: corrupt structures surface as ValueError (the
    fallback contract), never struct.error/IndexError."""
    import struct as _s

    from hudi_and_delta_showcase_spark.tables import hfile

    # a trailer whose protobuf is an endless varint: the raw parse
    # would IndexError off the buffer — the contract wants ValueError
    body = b"\x00" * 100
    trailer = hfile.TRAILER_MAGIC + hfile.PB_MAGIC + b"\xff" * 16
    trailer += b"\x00" * (hfile.TRAILER_SIZE - len(trailer) - 4)
    trailer += _s.pack(">i", 3 | (3 << 24))
    with pytest.raises(ValueError):
        hfile.read_hfile(body + trailer)
    # mid-cell truncation inside a data block: struct.error -> ValueError
    blob = bytearray(hfile.write_hfile(
        [(f"k{i:03d}".encode(), b"v" * 50) for i in range(50)],
        compression="none",
    ))
    # shrink a data block payload claim past its real extent
    import struct
    pos = bytes(blob).find(hfile.DATA_MAGIC)
    # bump onDiskDataSizeWithHeader so cell parsing walks off the end
    blob[pos + 29:pos + 33] = struct.pack(">i", 10_000_000)
    blob[pos + 8:pos + 12] = struct.pack(">i", 10_000_000)
    with pytest.raises(ValueError):
        hfile.read_hfile(bytes(blob))


def test_hfile_writer_stamps_minor_version():
    """r11 review fix: checksum-bearing 33-byte headers require
    minor >= 1 in the trailer version int; minor 0 files refuse."""
    import struct as _s

    from hudi_and_delta_showcase_spark.tables import hfile

    blob = hfile.write_hfile([(b"a", b"1")])
    (v,) = _s.unpack(">i", blob[-4:])
    assert v & 0x00FFFFFF == 3
    assert (v >> 24) & 0xFF >= 1
    minor0 = bytearray(blob)
    minor0[-4:] = _s.pack(">i", 3)
    with pytest.raises(ValueError, match="minor"):
        hfile.read_hfile(bytes(minor0))


def test_crashed_compaction_then_export_stays_consistent(spark, tmp_path):
    """r11 review fix: after a compaction that never committed, the
    next export attaches its log to the last COMMITTED slice — the
    served state includes the new data instead of silently losing it."""
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(4)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df,
                              key_cols=["k"])
    hoodie_metadata.export_hoodie_metadata(t)
    inst = hoodie_metadata.compact_hoodie_metadata(t.path)
    # crash: the compaction's commit marker never lands
    os.remove(os.path.join(
        t.path, ".hoodie", "metadata", ".hoodie", f"{inst}.commit"
    ))
    t.upsert(spark.createDataFrame([(10, "x")], "k int, v string"))
    hoodie_metadata.export_hoodie_metadata(t)
    state = hoodie_metadata.read_hoodie_metadata_files(t.path)
    assert state is not None
    live = {n for files in state.values() for n in files}
    manifest_live = {f.rsplit("/", 1)[-1] for f in t._commit(None).files}
    assert manifest_live <= live
