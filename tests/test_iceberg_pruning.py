"""Manifest-level file pruning for Iceberg reads (r10, verdict #2):
``read_iceberg_table(predicate=...)`` prunes manifest entries on
identity-partition values and per-file lower/upper bounds (manifest
fields 125-130) BEFORE building the file list — the files-read count is
pinned pruned vs unpruned — then applies the exact filter on the
surviving scan. Covers engine-exported trees (partition + bounds both
authored by this exporter) and a hand-authored foreign v2 tree."""

from __future__ import annotations

import json
import os
import struct

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    _entry_can_match,
    _identity_partition_names,
    _interval_can_match,
    export_iceberg_metadata,
    read_iceberg_table,
)


def _ktuples(df):
    return sorted((r.k, r.g) for r in df.select("k", "g").collect())


def _part_table(spark, path, dv=False):
    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 20 else "b") for k in range(40)],
        "k int, v string, g string",
    ).coalesce(2)
    return LakehouseTable.create(
        spark, path, df,
        key_cols=["k"], partition_by="g", deletion_vectors=dv,
    )


# ---------------------------------------------------------------------------
# engine-exported tree: partition pruning + bounds pruning, file count pinned
# ---------------------------------------------------------------------------


def test_partition_pruning_engine_tree(spark, tmp_path):
    t = _part_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    full = read_iceberg_table(spark, t.path)
    pruned = read_iceberg_table(
        spark, t.path, predicate=[("g", "=", "a")]
    )
    # the pin: the pruned scan's file list is strictly smaller
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _ktuples(pruned) == [(k, "a") for k in range(20)]
    # exact-filter equivalence against the unpruned read
    assert _ktuples(pruned) == _ktuples(full.filter("g = 'a'"))


def test_bounds_pruning_engine_tree(spark, tmp_path):
    t = _part_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    full = read_iceberg_table(spark, t.path)
    pruned = read_iceberg_table(
        spark, t.path, predicate=[("k", ">=", 30)]
    )
    # k in [0,19] lives in partition a's file; bounds alone prune it
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _ktuples(pruned) == [(k, "b") for k in range(30, 40)]


def test_pruned_read_with_deletion_vectors(spark, tmp_path):
    """Pruning composes with v3 DV application: deletes referencing
    pruned-away files never match, surviving files still anti-join."""
    t = _part_table(spark, str(tmp_path / "t"), dv=True)
    t.delete(
        spark.createDataFrame([(3, "a"), (25, "b")], "k int, g string")
    )
    export_iceberg_metadata(t, format_version=3)
    pruned = read_iceberg_table(
        spark, t.path, predicate=[("g", "=", "b")]
    )
    assert _ktuples(pruned) == [
        (k, "b") for k in range(20, 40) if k != 25
    ]


def test_all_files_pruned_keeps_schema(spark, tmp_path):
    t = _part_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    out = read_iceberg_table(
        spark, t.path, predicate=[("g", "=", "zz")]
    )
    assert out.count() == 0
    assert set(out.columns) >= {"k", "v", "g"}


def test_in_and_range_conjuncts(spark, tmp_path):
    t = _part_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    out = read_iceberg_table(
        spark,
        t.path,
        predicate=[("g", "in", ["a", "zz"]), ("k", "<", 5)],
    )
    assert len(out.inputFiles()) == 1
    assert _ktuples(out) == [(k, "a") for k in range(5)]


def test_bad_predicate_refuses(spark, tmp_path):
    t = _part_table(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    with pytest.raises(ValueError, match="unsupported predicate op"):
        read_iceberg_table(spark, t.path, predicate=[("k", "!=", 3)])
    with pytest.raises(ValueError, match="empty IN"):
        read_iceberg_table(spark, t.path, predicate=[("k", "in", [])])


# ---------------------------------------------------------------------------
# foreign v2 tree: bounds maps authored the iceberg-java way
# ---------------------------------------------------------------------------


def _opt(name, t, fid):
    return {"name": name, "type": ["null", t], "default": None,
            "field-id": fid}


def _bounds_map_schema(name, fid, kid, vid):
    return {
        "name": name,
        "type": ["null", {
            "type": "array", "logicalType": "map",
            "items": {
                "type": "record", "name": f"k{kid}_v{vid}",
                "fields": [
                    {"name": "key", "type": "int", "field-id": kid},
                    {"name": "value", "type": "bytes", "field-id": vid},
                ],
            },
        }],
        "default": None, "field-id": fid,
    }


def _foreign_bounded_tree(root: str) -> None:
    """A v2 tree with two data files carrying int bounds for column k
    (field-id 1) and string bounds for v (field-id 2) — the shape
    iceberg-java records in manifest fields 125/128."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from hudi_and_delta_showcase_spark.avro_ocf import ocf_encode

    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    f0 = os.path.join(root, "data", "00000-0-a.parquet")
    f1 = os.path.join(root, "data", "00001-0-b.parquet")
    pq.write_table(
        pa.table({"k": pa.array([1, 2, 3], pa.int32()),
                  "v": pa.array(["aa", "ab", "ac"])}), f0)
    pq.write_table(
        pa.table({"k": pa.array([100, 200], pa.int32()),
                  "v": pa.array(["ma", "mb"])}), f1)

    def b_int(v):
        return struct.pack("<i", v)

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
            _bounds_map_schema("lower_bounds", 125, 126, 127),
            _bounds_map_schema("upper_bounds", 128, 129, 130),
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
    sid = 6100000000000000001

    def dentry(path, rows, klo, khi, vlo, vhi):
        return {
            "status": 1, "snapshot_id": sid, "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {
                "content": 0, "file_path": path,
                "file_format": "PARQUET", "partition": {},
                "record_count": rows,
                "file_size_in_bytes": os.path.getsize(path),
                "lower_bounds": [
                    {"key": 1, "value": b_int(klo)},
                    {"key": 2, "value": vlo.encode()},
                ],
                "upper_bounds": [
                    {"key": 1, "value": b_int(khi)},
                    {"key": 2, "value": vhi.encode()},
                ],
            },
        }

    m1 = os.path.join(root, "metadata", "aaa-1111-m0.avro")
    b1 = ocf_encode(
        entry_schema,
        [dentry(f0, 3, 1, 3, "aa", "ac"), dentry(f1, 2, 100, 200, "ma", "mb")],
        codec="deflate",
    )
    open(m1, "wb").write(b1)
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
    l1 = os.path.join(root, "metadata", f"snap-{sid}-1-ccc.avro")
    open(l1, "wb").write(ocf_encode(mlist_schema, [{
        "manifest_path": m1, "manifest_length": len(b1),
        "partition_spec_id": 0, "content": 0,
        "sequence_number": 1, "min_sequence_number": 1,
        "added_snapshot_id": sid,
        "added_data_files_count": 2, "existing_data_files_count": 0,
        "deleted_data_files_count": 0,
    }], codec="deflate"))
    schema = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "int"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }
    meta = {
        "format-version": 2,
        "table-uuid": "9c3b1712-0000-4000-8000-00000000000a",
        "location": root, "last-sequence-number": 1,
        "last-updated-ms": 1700000000000, "last-column-id": 2,
        "current-schema-id": 0, "schemas": [schema], "schema": schema,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}], "properties": {},
        "current-snapshot-id": sid,
        "snapshots": [
            {"sequence-number": 1, "snapshot-id": sid,
             "timestamp-ms": 1700000000000,
             "summary": {"operation": "append"}, "manifest-list": l1,
             "schema-id": 0},
        ],
        "snapshot-log": [], "metadata-log": [],
    }
    with open(
        os.path.join(
            root, "metadata",
            "00001-7a1f0000-0000-4000-8000-00000000000a.metadata.json",
        ),
        "w",
    ) as fh:
        json.dump(meta, fh)


def test_foreign_tree_int_bounds_prune(spark, tmp_path):
    root = str(tmp_path / "ice")
    _foreign_bounded_tree(root)
    full = read_iceberg_table(spark, root)
    assert len(full.inputFiles()) == 2
    pruned = read_iceberg_table(spark, root, predicate=[("k", "<=", 50)])
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [1, 2, 3]


def test_foreign_tree_string_bounds_prune(spark, tmp_path):
    root = str(tmp_path / "ice")
    _foreign_bounded_tree(root)
    pruned = read_iceberg_table(spark, root, predicate=[("v", ">=", "m")])
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.v for r in pruned.collect()) == ["ma", "mb"]


def test_missing_bounds_scan_conservatively(spark, tmp_path):
    """A file without bounds for the referenced column must survive
    pruning — pruning is an optimization, never a filter."""
    entry = {"partition": {}, "lower_bounds": None, "upper_bounds": None}
    fields = {"k": {"id": 1, "name": "k", "type": "int"}}
    assert _entry_can_match(entry, [("k", "=", 7)], fields, {})


# ---------------------------------------------------------------------------
# unit coverage for the interval logic and spec-ambiguity guard
# ---------------------------------------------------------------------------


def test_interval_can_match_ops():
    assert _interval_can_match(5, 10, "=", 7)
    assert not _interval_can_match(5, 10, "=", 11)
    assert _interval_can_match(5, 10, "in", [0, 6])
    assert not _interval_can_match(5, 10, "in", [0, 100])
    assert _interval_can_match(5, 10, "<", 6)
    assert not _interval_can_match(5, 10, "<", 5)
    assert _interval_can_match(5, 10, "<=", 5)
    assert _interval_can_match(5, 10, ">", 9)
    assert not _interval_can_match(5, 10, ">", 10)
    assert _interval_can_match(5, 10, ">=", 10)


def test_identity_partition_names_skips_ambiguous_and_nonidentity():
    meta = {
        "schema": {"fields": [
            {"id": 1, "name": "k", "type": "int"},
            {"id": 2, "name": "g", "type": "string"},
        ]},
        "partition-specs": [
            {"spec-id": 0, "fields": [
                {"name": "g", "transform": "identity", "source-id": 2,
                 "field-id": 1000},
                {"name": "k_bucket", "transform": "bucket[4]",
                 "source-id": 1, "field-id": 1001},
            ]},
            # spec evolution rebinds "g" to a different source: ambiguous
            {"spec-id": 1, "fields": [
                {"name": "g", "transform": "identity", "source-id": 1,
                 "field-id": 1000},
            ]},
        ],
    }
    assert _identity_partition_names(meta) == {}
    meta["partition-specs"].pop()
    assert _identity_partition_names(meta) == {"g": ["g"]}


def test_null_identity_partition_prunes():
    """identity partition value null = every row null in that column:
    no comparison predicate can match the file."""
    fields = {"g": {"id": 2, "name": "g", "type": "string"}}
    ident = {"g": ["g"]}
    entry = {"partition": {"g": None}}
    assert not _entry_can_match(entry, [("g", "=", "a")], fields, ident)
    # absent key (older spec) stays conservative
    assert _entry_can_match({"partition": {}}, [("g", "=", "a")],
                            fields, ident)


def test_pruning_skips_pruned_files_dv_fetch(spark, tmp_path):
    """File-scoped delete entries (v3 DVs) referencing pruned-away
    data files are dropped BEFORE any blob fetch: with partition b's
    Puffin container deleted from disk, the pruned read of partition a
    still serves, while an unpruned read (which must apply b's DV)
    fails loudly."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _snapshot_entries,
        iceberg_snapshots,
    )

    t = _part_table(spark, str(tmp_path / "t"), dv=True)
    t.delete(
        spark.createDataFrame([(3, "a"), (25, "b")], "k int, g string")
    )
    export_iceberg_metadata(t, format_version=3)
    snaps = iceberg_snapshots(t.path)
    _, pos, _eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    b_puffins = {
        e["data_file"]["file_path"]
        for e in pos
        if "=b/" in (e["data_file"].get("referenced_data_file") or "")
    }
    assert b_puffins, "partition b must have its own DV container"
    for p in b_puffins:
        os.remove(p)
    pruned = read_iceberg_table(
        spark, t.path, predicate=[("g", "=", "a")]
    )
    assert _ktuples(pruned) == [
        (k, "a") for k in range(20) if k != 3
    ]
    with pytest.raises(Exception):
        read_iceberg_table(spark, t.path).collect()


def test_type_mismatched_predicate_scans_conservatively():
    """A predicate value whose type cannot compare against the
    recorded bounds proves nothing — keep the file, never crash."""
    assert _interval_can_match(1, 10, "=", "seven")
    assert _interval_can_match("a", "z", ">", 5)
    fields = {"k": {"id": 1, "name": "k", "type": "int"}}
    entry = {
        "partition": {},
        "lower_bounds": [{"key": 1, "value": b"\x01\x00\x00\x00"}],
        "upper_bounds": [{"key": 1, "value": b"\x0a\x00\x00\x00"}],
    }
    assert _entry_can_match(entry, [("k", "=", "seven")], fields, {})
