"""Iceberg CHANGELOG SCAN (r10 — ``create_changelog_view`` against the
raw tree): row-level changes per snapshot, file-scoped. Appends emit
inserts; CoW overwrites emit delete+insert pairs (collapsed to
update_pre/postimage under identifier_fields); delete snapshots
materialize exactly the rows their NEW delete files kill, with rows
already dead at the parent subtracted (the Flink re-delete case)."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    export_iceberg_metadata,
    iceberg_snapshots,
    read_iceberg_changelog,
)


def _ch(df):
    return sorted(
        (r.k, r.v, r._change_type, r._change_ordinal)
        for r in df.select("k", "v", "_change_type",
                           "_change_ordinal").collect()
    )


def test_appends_and_cow_update_collapse(spark, tmp_path):
    df1 = spark.createDataFrame(
        [(k, f"v{k}", "p1") for k in range(6)], "k int, v string, b string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"], partition_by="b"
    )
    # pure append into a new partition
    t.upsert(spark.createDataFrame(
        [(10, "x", "p2")], "k int, v string, b string"
    ))
    # CoW update of k=3: rewrite emits delete+insert pairs for the
    # whole rewritten file; identifier_fields collapses the carried
    # rows into update pairs too (Iceberg's raw-changelog shape)
    t.upsert(spark.createDataFrame(
        [(3, "v3x", "p1")], "k int, v string, b string"
    ))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    raw = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    got = _ch(raw)
    assert (10, "x", "insert", 0) in got
    assert (3, "v3", "delete", 1) in got
    assert (3, "v3x", "insert", 1) in got
    upd = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"],
        identifier_fields=["k"],
    )
    got_u = _ch(upd)
    assert (3, "v3", "update_preimage", 1) in got_u
    assert (3, "v3x", "update_postimage", 1) in got_u
    assert (10, "x", "insert", 0) in got_u
    # carried rows of the rewritten file collapse to update pairs,
    # never bare deletes
    assert not [g for g in got_u if g[2] == "delete"]


def test_delete_snapshot_materializes_killed_rows(spark, tmp_path):
    df1 = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(2,), (5,)], "k int"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    assert snaps[-1]["summary"]["operation"] == "delete"
    ch = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    assert _ch(ch) == [
        (2, "v2", "delete", 0), (5, "v5", "delete", 0)
    ]


def test_second_delete_reports_only_new_rows(spark, tmp_path):
    """The parent's cumulative delete state is subtracted: a second
    delete snapshot reports ONLY its newly killed rows even though its
    (replacing) delete file covers the old positions too."""
    df1 = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(2,)], "k int"))
    t.delete(spark.createDataFrame([(5,)], "k int"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    ch = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[1]["snapshot-id"]
    )
    assert _ch(ch) == [(5, "v5", "delete", 0)]


def _opt(name, typ, fid):
    return {"name": name, "type": ["null", typ], "default": None,
            "field-id": fid}


def test_same_snapshot_add_plus_delete_never_inserts_dead_rows(
    spark, tmp_path
):
    """r10 review finding: a foreign writer may ADD a data file and a
    deletion vector REFERENCING IT in one snapshot (spec-legal,
    data_seq <= delete_seq) — the dead rows never existed logically,
    so the changelog must not emit them as inserts (and must not emit
    deletes for them either), agreeing with the snapshot read."""
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hudi_and_delta_showcase_spark.avro_ocf import ocf_encode
    from hudi_and_delta_showcase_spark.tables import puffin
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
    )

    root = str(tmp_path / "ice")
    os.makedirs(os.path.join(root, "data"))
    os.makedirs(os.path.join(root, "metadata"))
    f0 = os.path.join(root, "data", "00000-0-a.parquet")
    f1 = os.path.join(root, "data", "00001-0-b.parquet")
    pq.write_table(pa.table({
        "k": pa.array([1, 2], pa.int32()), "v": pa.array(["a", "b"]),
    }), f0)
    pq.write_table(pa.table({
        "k": pa.array([3, 4, 5], pa.int32()),
        "v": pa.array(["c", "d", "e"]),
    }), f1)
    sid1, sid2 = 7100000000000000001, 7100000000000000002
    pf = os.path.join(root, "data", "dv-0001.puffin")
    ranges = puffin.write_puffin_dvs(
        pf, {f1: [0]}, snapshot_id=sid2, sequence_number=2
    )
    dv_off, dv_size, dv_card = ranges[f1]

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
            {"name": "file_size_in_bytes", "type": "long",
             "field-id": 104},
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
            {"name": "min_sequence_number", "type": "long",
             "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
            {"name": "added_data_files_count", "type": "int",
             "field-id": 504},
            {"name": "existing_data_files_count", "type": "int",
             "field-id": 505},
            {"name": "deleted_data_files_count", "type": "int",
             "field-id": 506},
        ],
    }

    def dentry(sid, seq, path, rows, ref=None, off=None, size=None):
        return {
            "status": 1, "snapshot_id": sid, "sequence_number": seq,
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

    def mfile(path, blob, content, seq, sid, a):
        return {
            "manifest_path": path, "manifest_length": len(blob),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": 1,
            "added_snapshot_id": sid,
            "added_data_files_count": a, "existing_data_files_count": 0,
            "deleted_data_files_count": 0,
        }

    md = os.path.join(root, "metadata")
    m1 = os.path.join(md, "aaa-m0.avro")
    b1 = ocf_encode(entry_schema, [dentry(sid1, 1, f0, 2)],
                    codec="deflate")
    open(m1, "wb").write(b1)
    m2 = os.path.join(md, "bbb-m1.avro")
    b2 = ocf_encode(entry_schema, [dentry(sid2, 2, f1, 3)],
                    codec="deflate")
    open(m2, "wb").write(b2)
    m3 = os.path.join(md, "ccc-m2.avro")
    b3 = ocf_encode(
        entry_schema,
        [dentry(sid2, 2, pf, dv_card, ref=f1, off=dv_off, size=dv_size)],
        codec="deflate",
    )
    open(m3, "wb").write(b3)
    l1 = os.path.join(md, f"snap-{sid1}-1-x.avro")
    open(l1, "wb").write(ocf_encode(
        mlist_schema, [mfile(m1, b1, 0, 1, sid1, 1)], codec="deflate"))
    l2 = os.path.join(md, f"snap-{sid2}-1-y.avro")
    open(l2, "wb").write(ocf_encode(
        mlist_schema,
        [mfile(m1, b1, 0, 1, sid1, 1), mfile(m2, b2, 0, 2, sid2, 1),
         mfile(m3, b3, 1, 2, sid2, 1)],
        codec="deflate",
    ))
    schema = {
        "type": "struct", "schema-id": 0,
        "fields": [
            {"id": 1, "name": "k", "required": False, "type": "int"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }
    meta = {
        "format-version": 3,
        "table-uuid": "9c3b1712-0000-4000-8000-00000000c10c",
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
             "summary": {"operation": "overwrite"}, "manifest-list": l2,
             "schema-id": 0},
        ],
        "snapshot-log": [], "metadata-log": [],
    }
    with open(os.path.join(
        md, "00002-7a1f0000-0000-4000-8000-00000000c10c.metadata.json"
    ), "w") as fh:
        json.dump(meta, fh)

    # snapshot read hides k=3; the changelog must agree
    assert sorted(
        r.k for r in read_iceberg_table(spark, root).collect()
    ) == [1, 2, 4, 5]
    ch = read_iceberg_changelog(spark, root, from_snapshot_id=sid1)
    got = sorted((r.k, r._change_type) for r in ch.collect())
    assert got == [(4, "insert"), (5, "insert")]


def test_replace_snapshots_skipped_and_empty_range_refuses(
    spark, tmp_path
):
    df1 = spark.createDataFrame(
        [(k, f"v{k}") for k in range(8)], "k int, v string"
    ).coalesce(2)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df1,
                              key_cols=["k"])
    t.optimize(target_files=1)
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    assert snaps[-1]["summary"]["operation"] == "replace"
    with pytest.raises(ValueError, match="no row-level changes"):
        read_iceberg_changelog(
            spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"]
        )


def test_chain_decodes_each_snapshot_once(spark, tmp_path, monkeypatch):
    """r11 memoization pin: one `_snapshot_entries` decode per snapshot
    in the range (iteration k's parent entries are iteration k-1's
    own) — previously each snapshot decoded ~twice, worst-case
    O(chain²) avro work on long ranges."""
    from hudi_and_delta_showcase_spark.tables import iceberg_meta as im

    df1 = spark.createDataFrame(
        [(k, f"v{k}", "p1") for k in range(4)], "k int, v string, b string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"], partition_by="b"
    )
    for i in range(4):
        t.upsert(spark.createDataFrame(
            [(100 + i, "x", f"p{2 + i}")], "k int, v string, b string"
        ))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)

    calls: list[int] = []
    real = im._snapshot_entries

    def counting(table_path, snap, with_deletes=False):
        calls.append(snap["snapshot-id"])
        return real(table_path, snap, with_deletes)

    monkeypatch.setattr(im, "_snapshot_entries", counting)
    ch = im.read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    got = sorted(r.k for r in ch.collect())
    assert got == [100, 101, 102, 103]
    # 4 changed snapshots + the from-snapshot (first parent): 5 decodes,
    # each snapshot exactly once
    assert len(calls) == len(set(calls)) == 5


def test_changelog_predicate_prunes_and_filters(spark, tmp_path):
    """r11: the changelog takes the same tuple/SQL predicate as every
    sibling reader — changed entries prune on partition values before
    any scan, and the row filter applies to both change sides."""
    df1 = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 4 else "b") for k in range(8)],
        "k int, v string, g string",
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"], partition_by="g"
    )
    t.upsert(spark.createDataFrame(
        [(10, "x", "a"), (11, "y", "b")], "k int, v string, g string"
    ))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    full = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    pruned = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"],
        predicate="g = 'a'",
    )
    # files-shrank pin: only partition a's changed files scan
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    got = sorted((r.k, r._change_type) for r in pruned.collect())
    # the upsert rewrote partition a's file: carried rows report as
    # delete+insert pairs plus the new row's insert — all g='a'
    assert (10, "insert") in got
    assert all(
        r.g == "a" for r in pruned.collect()
    )
    assert not [x for x in got if x[0] == 11]


def test_changelog_predicate_all_pruned_returns_empty(spark, tmp_path):
    df1 = spark.createDataFrame(
        [(k, f"v{k}", "a") for k in range(4)], "k int, v string, g string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"], partition_by="g"
    )
    t.upsert(spark.createDataFrame(
        [(10, "x", "a")], "k int, v string, g string"
    ))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    out = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"],
        predicate="g = 'zz'",
    )
    assert out.count() == 0
    assert {"_change_type", "_change_ordinal",
            "_commit_snapshot_id"} <= set(out.columns)


def test_net_changes_cancels_carried_rows(spark, tmp_path):
    """r11: net_changes=True — a CoW rewrite's carried rows (identical
    delete+insert across the range) cancel; only genuinely changed
    content remains, typed by the net sign."""
    df1 = spark.createDataFrame(
        [(k, f"v{k}") for k in range(6)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df1,
                              key_cols=["k"])
    t.upsert(spark.createDataFrame([(3, "v3x")], "k int, v string"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    net = read_iceberg_changelog(
        spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"],
        net_changes=True,
    )
    got = sorted((r.k, r.v, r._change_type) for r in net.collect())
    assert got == [(3, "v3", "delete"), (3, "v3x", "insert")]
    # a row deleted and reinserted IDENTICALLY nets to nothing
    t.delete(spark.createDataFrame([(2,)], "k int"))
    t.upsert(spark.createDataFrame([(2, "v2")], "k int, v string"))
    export_iceberg_metadata(t)
    net2 = read_iceberg_changelog(
        spark, t.path,
        from_snapshot_id=iceberg_snapshots(t.path)[1]["snapshot-id"],
        net_changes=True,
    )
    assert not [r for r in net2.collect() if r.k == 2]


def test_net_changes_refuses_identifier_fields(spark, tmp_path):
    df1 = spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df1,
                              key_cols=["k"])
    t.upsert(spark.createDataFrame([(2, "b")], "k int, v string"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    with pytest.raises(ValueError, match="net_changes"):
        read_iceberg_changelog(
            spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"],
            identifier_fields=["k"], net_changes=True,
        )
