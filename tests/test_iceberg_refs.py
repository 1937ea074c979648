"""Iceberg refs (branches/tags) + timestamp travel: exports carry a
``main`` branch and savepoint TAGS; reads resolve any of snapshot_id /
ref / as_of_timestamp_ms; expire protects ref'd snapshots."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    expire_iceberg_snapshots,
    export_iceberg_metadata,
    read_iceberg_metadata,
    read_iceberg_table,
)


def _t(spark, path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(spark, path, df, key_cols=["k"])
    t.savepoint(0, label="golden")
    t.upsert(spark.createDataFrame([(1, "v1b"), (99, "x")], "k int, v string"))
    t.upsert(spark.createDataFrame([(2, "v2b")], "k int, v string"))
    return t


def _keys(df):
    return sorted(r.k for r in df.collect())


def test_export_writes_main_branch_and_savepoint_tag(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    meta = read_iceberg_metadata(t.path)
    refs = meta["refs"]
    assert refs["main"]["type"] == "branch"
    assert refs["main"]["snapshot-id"] == meta["current-snapshot-id"]
    assert refs["golden"]["type"] == "tag"
    assert refs["golden"]["snapshot-id"] == meta["snapshots"][0]["snapshot-id"]

    assert _keys(read_iceberg_table(spark, t.path, ref="main")) == _keys(
        t.read()
    )
    tagged = read_iceberg_table(spark, t.path, ref="golden")
    assert _keys(tagged) == list(range(8))  # pre-upsert state
    with pytest.raises(ValueError, match="unknown ref"):
        read_iceberg_table(spark, t.path, ref="nope")
    with pytest.raises(ValueError, match="pick ONE"):
        read_iceberg_table(spark, t.path, ref="main", snapshot_id=1)


def test_timestamp_travel_via_snapshot_log(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    meta = read_iceberg_metadata(t.path)
    log = meta["snapshot-log"]
    assert len(log) == 3
    # exactly the first snapshot's instant -> first snapshot
    first = read_iceberg_table(
        spark, t.path, as_of_timestamp_ms=log[0]["timestamp-ms"]
    )
    assert _keys(first) == list(range(8))
    # between snapshots 2 and 3 -> snapshot 2
    mid = read_iceberg_table(
        spark, t.path, as_of_timestamp_ms=log[2]["timestamp-ms"] - 1
    )
    assert _keys(mid) == list(range(8)) + [99]
    with pytest.raises(ValueError, match="no snapshot at or before"):
        read_iceberg_table(
            spark, t.path, as_of_timestamp_ms=log[0]["timestamp-ms"] - 1
        )


def test_expire_protects_tagged_snapshot(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    export_iceberg_metadata(t)
    out = expire_iceberg_snapshots(t.path, keep_last=1)
    meta = read_iceberg_metadata(t.path)
    kept_ids = {s["snapshot-id"] for s in meta["snapshots"]}
    # the tagged snapshot survived; the untagged middle one expired
    assert meta["refs"]["golden"]["snapshot-id"] in kept_ids
    assert len(meta["snapshots"]) == 2 and out["expired"] == 1
    assert _keys(read_iceberg_table(spark, t.path, ref="golden")) == list(
        range(8)
    )


def test_metadata_tables(spark, tmp_path):
    """The $snapshots / $history / $manifests / $files / $delete_files
    inspection relations over an exported tree."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        iceberg_metadata_table,
    )

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3,)], "k int"))
    export_iceberg_metadata(t)

    snaps = iceberg_metadata_table(spark, t.path, "snapshots").collect()
    assert [r.operation for r in snaps] == ["append", "delete"]
    assert snaps[1].parent_id == snaps[0].snapshot_id
    assert snaps[0].summary["operation"] == "append"

    hist = iceberg_metadata_table(spark, t.path, "history").collect()
    assert len(hist) == 2 and all(r.is_current_ancestor for r in hist)

    man = iceberg_metadata_table(spark, t.path, "manifests").collect()
    assert {r.content for r in man} == {0, 1}

    files = iceberg_metadata_table(spark, t.path, "files")
    assert files.agg({"record_count": "sum"}).collect()[0][0] == 10
    dels = iceberg_metadata_table(spark, t.path, "delete_files").collect()
    assert len(dels) >= 1 and all(r.content == 1 for r in dels)
    assert sum(r.record_count for r in dels) == 1

    # r10: $refs — the live head as the main branch (savepoints would
    # appear as TAG rows)
    refs = iceberg_metadata_table(spark, t.path, "refs").collect()
    by_name = {r.name: r for r in refs}
    assert by_name["main"].type == "BRANCH"
    assert by_name["main"].snapshot_id == snaps[-1].snapshot_id

    # r10: $entries — ALL statuses visible, including the DELETED and
    # EXISTING bookkeeping the live-only $files view hides
    entries = iceberg_metadata_table(spark, t.path, "entries").collect()
    assert {r.status for r in entries} <= {0, 1, 2}
    assert any(r.status == 1 for r in entries)  # ADDED present
    data_live = [r for r in entries if r.content == 0 and r.status != 2]
    assert sum(r.record_count for r in data_live) == 10

    with pytest.raises(ValueError, match="unknown metadata table"):
        iceberg_metadata_table(spark, t.path, "nope")


def test_partitions_metadata_table(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        iceberg_metadata_table,
    )

    df = spark.createDataFrame(
        [(i, "us" if i % 2 else "eu") for i in range(10)],
        "k int, region string",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], partition_by="region",
    )
    export_iceberg_metadata(t)
    parts = {
        tuple(sorted(r.partition.items())): (r.record_count, r.file_count)
        for r in iceberg_metadata_table(spark, t.path, "partitions")
        .collect()
    }
    assert parts[(("region", "eu"),)][0] == 5
    assert parts[(("region", "us"),)][0] == 5
    assert all(fc >= 1 for _rc, fc in parts.values())


# --- r13: ref management + rollback (manageSnapshots surface) ---------


def _dataset(spark, root, n=3):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        write_iceberg_dataset,
    )

    for i in range(n):
        write_iceberg_dataset(
            spark,
            spark.createDataFrame(
                [(10 * i + j, f"v{10 * i + j}") for j in range(4)],
                "k int, v string",
            ).coalesce(1),
            root,
            mode="error" if i == 0 else "append",
        )


def test_create_and_drop_refs(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        drop_iceberg_ref,
        read_iceberg_metadata,
        read_iceberg_table,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=3)
    meta = read_iceberg_metadata(root)
    first_sid = meta["snapshots"][0]["snapshot-id"]
    v_before = len(meta.get("metadata-log", []))

    out = create_iceberg_ref(root, "v1", ref_type="tag", snapshot_id=first_sid)
    assert out["snapshot_id"] == first_sid
    create_iceberg_ref(root, "dev", ref_type="branch")  # at current

    meta = read_iceberg_metadata(root)
    assert meta["refs"]["v1"] == {"snapshot-id": first_sid, "type": "tag"}
    assert meta["refs"]["dev"]["type"] == "branch"
    assert meta["refs"]["dev"]["snapshot-id"] == meta["current-snapshot-id"]
    # each ref change is a metadata COMMIT (metadata-log grew)
    assert len(meta["metadata-log"]) == v_before + 2

    # the tag scans the first snapshot's 4 rows
    assert read_iceberg_table(spark, root, ref="v1").count() == 4
    assert read_iceberg_table(spark, root, ref="dev").count() == 12

    with pytest.raises(ValueError, match="already exists"):
        create_iceberg_ref(root, "v1")
    with pytest.raises(ValueError, match="not in table"):
        create_iceberg_ref(root, "bad", snapshot_id=123)
    with pytest.raises(ValueError, match="main branch"):
        drop_iceberg_ref(root, "main")

    drop_iceberg_ref(root, "dev")
    meta = read_iceberg_metadata(root)
    assert "dev" not in meta["refs"] and "v1" in meta["refs"]


def test_refs_protect_expire_on_dataset_trees(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        expire_iceberg_snapshots,
        read_iceberg_metadata,
        read_iceberg_table,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=3)
    meta = read_iceberg_metadata(root)
    first_sid = meta["snapshots"][0]["snapshot-id"]
    create_iceberg_ref(root, "keep", ref_type="tag", snapshot_id=first_sid)
    out = expire_iceberg_snapshots(root, keep_last=1)
    assert out["expired"] == 1  # the middle one; tag protects the first
    assert read_iceberg_table(spark, root, ref="keep").count() == 4


def test_rollback_to_ancestor(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_metadata,
        read_iceberg_table,
        rollback_iceberg_table,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=3)
    meta = read_iceberg_metadata(root)
    sids = [s["snapshot-id"] for s in meta["snapshots"]]

    out = rollback_iceberg_table(root, snapshot_id=sids[1])
    assert out["rolled_back_to"] == sids[1]
    assert read_iceberg_table(spark, root).count() == 8

    meta = read_iceberg_metadata(root)
    assert meta["current-snapshot-id"] == sids[1]
    assert meta["refs"]["main"]["snapshot-id"] == sids[1]
    # nothing deleted: all three snapshots still present (re-rollforward
    # works), snapshot-log records the state change
    assert [s["snapshot-id"] for s in meta["snapshots"]] == sids
    assert meta["snapshot-log"][-1]["snapshot-id"] == sids[1]

    # roll FORWARD again (head is still in the metadata)... a forward
    # target is NOT an ancestor of the new current -> refuses
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_iceberg_table(root, snapshot_id=sids[2])

    # no-op rollback to the current snapshot
    out = rollback_iceberg_table(root, snapshot_id=sids[1])
    assert out["version"] is None


def test_rollback_by_timestamp(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_metadata,
        read_iceberg_table,
        rollback_iceberg_table,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=3)
    meta = read_iceberg_metadata(root)
    ts1 = meta["snapshots"][1]["timestamp-ms"]

    out = rollback_iceberg_table(root, timestamp_ms=ts1)
    assert out["rolled_back_to"] == meta["snapshots"][1]["snapshot-id"]
    assert read_iceberg_table(spark, root).count() == 8

    with pytest.raises(ValueError, match="no ancestor"):
        rollback_iceberg_table(
            root, timestamp_ms=meta["snapshots"][0]["timestamp-ms"] - 10_000
        )
    with pytest.raises(ValueError, match="exactly one"):
        rollback_iceberg_table(root)


def test_refs_survive_dataset_appends(spark, tmp_path):
    """r13 regression pin: an append REBUILDS the metadata json — tags/
    branches and the declared sort order must carry across (Iceberg's
    rule), not reset to {main} + unsorted."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        read_iceberg_metadata,
        read_iceberg_table,
        write_iceberg_dataset,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=2)
    create_iceberg_ref(root, "golden", ref_type="tag")
    write_iceberg_dataset(
        spark,
        spark.createDataFrame([(99, "x")], "k int, v string"),
        root,
        mode="append",
    )
    meta = read_iceberg_metadata(root)
    assert "golden" in meta["refs"]
    assert meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]
    # the tag still scans the pre-append state
    assert read_iceberg_table(spark, root, ref="golden").count() == 8


def test_branch_write_and_fast_forward(spark, tmp_path):
    """r13 WAP workflow: create branch -> append to it (main
    untouched) -> audit via ref scan -> fast-forward main."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        fast_forward_iceberg_branch,
        read_iceberg_metadata,
        read_iceberg_table,
        write_iceberg_dataset,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=2)  # main: 8 rows
    create_iceberg_ref(root, "audit", ref_type="branch")
    write_iceberg_dataset(
        spark,
        spark.createDataFrame([(100, "x"), (101, "y")], "k int, v string"),
        root,
        mode="append",
        branch="audit",
    )
    meta = read_iceberg_metadata(root)
    # main untouched; branch moved; branch snapshot's parent is the
    # branch-create head; snapshot-log stays main-lineage (2 entries)
    assert read_iceberg_table(spark, root).count() == 8
    assert read_iceberg_table(spark, root, ref="audit").count() == 10
    assert meta["refs"]["main"]["snapshot-id"] == meta["current-snapshot-id"]
    b_sid = meta["refs"]["audit"]["snapshot-id"]
    b_snap = next(
        s for s in meta["snapshots"] if s["snapshot-id"] == b_sid
    )
    assert b_snap["parent-snapshot-id"] == meta["current-snapshot-id"]
    assert len(meta["snapshot-log"]) == 2

    # a second branch append chains on the branch head
    write_iceberg_dataset(
        spark,
        spark.createDataFrame([(102, "z")], "k int, v string"),
        root, mode="append", branch="audit",
    )
    assert read_iceberg_table(spark, root, ref="audit").count() == 11
    assert read_iceberg_table(spark, root).count() == 8

    # publish: fast-forward main to the audited branch head
    out = fast_forward_iceberg_branch(root, "main", "audit")
    meta = read_iceberg_metadata(root)
    assert out["snapshot_id"] == meta["refs"]["audit"]["snapshot-id"]
    assert meta["current-snapshot-id"] == out["snapshot_id"]
    assert read_iceberg_table(spark, root).count() == 11
    assert meta["snapshot-log"][-1]["snapshot-id"] == out["snapshot_id"]

    # no-op fast-forward; then a DIVERGED main refuses
    assert fast_forward_iceberg_branch(root, "main", "audit")["version"] is None


def test_branch_write_guards(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        fast_forward_iceberg_branch,
        read_iceberg_metadata,
        write_iceberg_dataset,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=2)
    one = spark.createDataFrame([(1, "a")], "k int, v string")
    with pytest.raises(ValueError, match="does not exist"):
        write_iceberg_dataset(spark, one, root, mode="append", branch="nope")
    meta = read_iceberg_metadata(root)
    create_iceberg_ref(
        root, "t0", ref_type="tag",
        snapshot_id=meta["snapshots"][0]["snapshot-id"],
    )
    with pytest.raises(ValueError, match="tag, not a branch"):
        write_iceberg_dataset(spark, one, root, mode="append", branch="t0")
    # diverged fast-forward refuses: branch at an OLD main snapshot,
    # then main advances -> branch head no longer main's ancestor...
    # (main ahead of branch: ff of main to branch target is a rewind,
    # not an ancestor move)
    create_iceberg_ref(
        root, "old", ref_type="branch",
        snapshot_id=meta["snapshots"][0]["snapshot-id"],
    )
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward_iceberg_branch(root, "main", "old")
    with pytest.raises(ValueError, match="does not exist"):
        fast_forward_iceberg_branch(root, "main", "nope")


def test_cherrypick_diverged_branch(spark, tmp_path):
    """r13: when main moved after the branch forked, fast-forward
    refuses and cherrypick re-applies the branch's append on top of
    the current head with provenance stamped."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        cherrypick_iceberg_snapshot,
        create_iceberg_ref,
        fast_forward_iceberg_branch,
        read_iceberg_metadata,
        read_iceberg_table,
        write_iceberg_dataset,
    )

    root = str(tmp_path / "ds")
    _dataset(spark, root, n=2)  # main: 8 rows
    create_iceberg_ref(root, "wap", ref_type="branch")
    write_iceberg_dataset(
        spark,
        spark.createDataFrame([(100, "x"), (101, "y")], "k int, v string"),
        root, mode="append", branch="wap",
    )
    # main moves too -> diverged
    write_iceberg_dataset(
        spark,
        spark.createDataFrame([(200, "m")], "k int, v string"),
        root, mode="append",
    )
    assert read_iceberg_table(spark, root).count() == 9
    with pytest.raises(ValueError, match="not an ancestor"):
        fast_forward_iceberg_branch(root, "main", "wap")

    meta = read_iceberg_metadata(root)
    staged_sid = meta["refs"]["wap"]["snapshot-id"]
    out = cherrypick_iceberg_snapshot(root, staged_sid)
    assert out["source_snapshot_id"] == staged_sid

    # main now serves base + its own append + the cherry-picked rows
    ks = sorted(
        r.k for r in read_iceberg_table(spark, root).select("k").collect()
    )
    assert ks == sorted([0, 1, 2, 3, 10, 11, 12, 13, 100, 101, 200])
    meta = read_iceberg_metadata(root)
    head = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert head["summary"]["source-snapshot-id"] == str(staged_sid)
    assert head["summary"]["operation"] == "append"

    # already-applied and non-append snapshots refuse
    with pytest.raises(ValueError, match="already an ancestor"):
        cherrypick_iceberg_snapshot(root, staged_sid)
    with pytest.raises(ValueError, match="not in table"):
        cherrypick_iceberg_snapshot(root, 42)
