"""Iceberg RewriteManifests (r12): bin-pack an append-heavy tree's
manifests into few, as a ``replace``-operation snapshot — metadata
only, byte-identical reads, incremental scans skip it, delete
manifests carry over, old snapshots stay time-travelable."""

from __future__ import annotations

from datetime import datetime

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    export_iceberg_metadata,
    iceberg_metadata_table,
    iceberg_snapshots,
    read_iceberg_incremental,
    read_iceberg_metadata,
    read_iceberg_table,
    rewrite_iceberg_manifests,
    write_iceberg_dataset,
)


def _batch(spark, day0: int, n: int, base: int):
    rows = [
        (base + i, datetime(2024, 1, day0 + i % 2, i % 24), i % 7)
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long"
    ).coalesce(1)


def _ids(df):
    return sorted(r.event_id for r in df.select("event_id").collect())


@pytest.fixture(scope="module")
def appended_tree(spark, tmp_path_factory):
    """A day-partitioned dataset tree with 20 appends — 21 manifests,
    one per write, the shape rewrite_manifests exists for. Built with
    the batched writer (r14): identical tree, one Spark write instead
    of 21 (fixture setup was ~29 s of the suite wall)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        write_iceberg_dataset_batches,
    )

    root = str(tmp_path_factory.mktemp("rw") / "tree")
    batches = [_batch(spark, 1, 6, 0)] + [
        _batch(spark, 3 + a, 4, 1000 + 100 * a) for a in range(20)
    ]
    write_iceberg_dataset_batches(
        spark, batches, root, partition_by=[("ts", "day")]
    )
    return root


def test_rewrite_binpacks_21_manifests_byte_identical(spark, appended_tree):
    root = appended_tree
    before_rows = _ids(read_iceberg_table(spark, root))
    assert len(before_rows) == 6 + 20 * 4
    manifests = iceberg_metadata_table(spark, root, "manifests")
    assert manifests.count() == 21  # one per write — the problem
    pre_meta = read_iceberg_metadata(root)
    pre_sid = pre_meta["current-snapshot-id"]
    pre_seq = pre_meta["last-sequence-number"]

    n_files = len(read_iceberg_table(spark, root).inputFiles())
    out = rewrite_iceberg_manifests(root)
    assert out["manifests_before"] == 21
    assert out["manifests_after"] <= 3  # THE PIN (8 MiB target -> 1)
    assert out["entries"] == n_files  # every live file, none twice

    # the scan now opens <= 3 manifests and serves identical rows
    manifests = iceberg_metadata_table(spark, root, "manifests")
    assert manifests.count() == out["manifests_after"] <= 3
    after = read_iceberg_table(spark, root)
    assert _ids(after) == before_rows
    assert len(after.inputFiles()) == out["entries"]

    # the rewrite is a replace snapshot, child of the old head, at the
    # next sequence number — and main points at it
    meta = read_iceberg_metadata(root)
    snaps = iceberg_snapshots(root)
    assert snaps[-1]["summary"]["operation"] == "replace"
    assert snaps[-1]["parent-snapshot-id"] == pre_sid
    assert meta["last-sequence-number"] == pre_seq + 1
    assert meta["refs"]["main"]["snapshot-id"] == snaps[-1]["snapshot-id"]

    # pruning still works on the packed manifests: one day's files
    pruned = read_iceberg_table(
        spark, root,
        predicate="ts >= TIMESTAMP '2024-01-01' AND "
        "ts < TIMESTAMP '2024-01-02'",
    )
    assert 0 < len(pruned.inputFiles()) < len(after.inputFiles())

    # time travel to the pre-rewrite head reads the untouched old tree
    old = read_iceberg_table(spark, root, snapshot_id=pre_sid)
    assert _ids(old) == before_rows

    # idempotent: a second rewrite is a no-op
    again = rewrite_iceberg_manifests(root)
    assert again["manifests_after"] == again["manifests_before"]


def test_incremental_scan_skips_rewrite_snapshot(spark, appended_tree):
    root = appended_tree
    rewrite_iceberg_manifests(root)  # no-op if the first test packed it
    snaps = iceberg_snapshots(root)
    appends = [
        s for s in snaps if s["summary"].get("operation") == "append"
    ]
    assert any(
        s["summary"].get("operation") == "replace" for s in snaps
    )
    # pull from the 10th append ACROSS the rewrite boundary
    from_sid = appends[9]["snapshot-id"]
    inc = read_iceberg_incremental(spark, root, from_snapshot_id=from_sid)
    expect = sorted(
        1000 + 100 * a + i for a in range(9, 20) for i in range(4)
    )
    assert _ids(inc) == expect


def test_rewrite_carries_delete_manifests(spark, tmp_path):
    """A DV-bearing exported tree rewrites its data manifests; the
    delete manifests ride the new manifest list untouched and deleted
    keys stay deleted."""
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 5) for i in range(40)], "k int, v string, g int"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.upsert(
        spark.createDataFrame(
            [(i, f"v{i}", i % 5) for i in range(100, 120)],
            "k int, v string, g int",
        ).coalesce(1)
    )
    t.delete(spark.createDataFrame([(3,), (7,), (11,)], "k int"))
    export_iceberg_metadata(t)
    before = sorted(r.k for r in read_iceberg_table(spark, t.path).collect())
    assert 3 not in before and len(before) == 57
    # our export packs ONE data manifest per snapshot; split it in two
    # to simulate the append-heavy foreign shape rewrite exists for
    _split_data_manifest(t.path)
    out = rewrite_iceberg_manifests(t.path)
    assert out["manifests_before"] == 2
    assert out["manifests_after"] == 1
    after = sorted(r.k for r in read_iceberg_table(spark, t.path).collect())
    assert after == before


def _split_data_manifest(root: str) -> None:
    """Metadata surgery: split the current snapshot's single data
    manifest into two (same entries, same list row fields) so the
    tree has something to bin-pack. Delete manifests untouched."""
    import json
    import os

    from hudi_and_delta_showcase_spark.avro_ocf import (
        ocf_decode,
        ocf_encode,
    )
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        MANIFEST_CONTENT_DATA,
        MANIFEST_LIST_SCHEMA_V2,
    )

    hint = os.path.join(root, "metadata", "version-hint.text")
    v = int(open(hint).read().strip())
    mpath = os.path.join(root, "metadata", f"v{v}.metadata.json")
    meta = json.load(open(mpath))
    snap = next(
        s
        for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )

    def local(p):
        return os.path.join(
            root, "metadata", p.rsplit("/metadata/", 1)[-1]
        ) if "/metadata/" in p else p

    list_path = local(snap["manifest-list"])
    _, rows = ocf_decode(open(list_path, "rb").read())
    data_rows = [
        r for r in rows if r.get("content", 0) == MANIFEST_CONTENT_DATA
    ]
    other = [r for r in rows if r not in data_rows]
    assert len(data_rows) == 1 and other, "fixture shape"
    drow = data_rows[0]
    schema, entries = ocf_decode(open(local(drow["manifest_path"]), "rb").read())
    assert len(entries) >= 2
    halves = [entries[: len(entries) // 2], entries[len(entries) // 2:]]
    new_rows = []
    for i, half in enumerate(halves):
        name = f"split-{i}.avro"
        blob = ocf_encode(schema, half, codec="null")
        open(os.path.join(root, "metadata", name), "wb").write(blob)
        r = dict(drow)
        r["manifest_path"] = drow["manifest_path"].rsplit("/", 1)[0] + "/" + name
        r["manifest_length"] = len(blob)
        new_rows.append(r)
    open(list_path, "wb").write(
        ocf_encode(
            MANIFEST_LIST_SCHEMA_V2, new_rows + other, codec="null"
        )
    )


def test_rewrite_refuses_v1_and_unhinted(tmp_path):
    with pytest.raises(FileNotFoundError, match="version-hint"):
        rewrite_iceberg_manifests(str(tmp_path / "nope"))


def test_rewrite_then_expire_reclaims_small_manifests(spark, tmp_path):
    """RewriteManifests composes with expireSnapshots the way Iceberg
    maintenance runs do: the rewrite supersedes the per-append
    manifests, expiration deletes them (only expired snapshots
    referenced them), and the packed tree still reads byte-identically
    from its single surviving manifest list."""
    import os

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        expire_iceberg_snapshots,
    )

    root = str(tmp_path / "tree")
    write_iceberg_dataset(
        spark, _batch(spark, 1, 6, 0), root, partition_by=[("ts", "day")]
    )
    for a in range(5):
        write_iceberg_dataset(
            spark, _batch(spark, 3 + a, 4, 1000 + 100 * a), root,
            partition_by=[("ts", "day")], mode="append",
        )
    before = _ids(read_iceberg_table(spark, root))
    meta_dir = os.path.join(root, "metadata")
    n_avro_before = len(
        [f for f in os.listdir(meta_dir) if f.endswith(".avro")]
    )
    out = rewrite_iceberg_manifests(root)
    assert out["manifests_before"] == 6 and out["manifests_after"] == 1
    res = expire_iceberg_snapshots(root, keep_last=1)
    assert res["expired"] >= 5
    assert len(res["deleted_files"]) > 0
    n_avro_after = len(
        [f for f in os.listdir(meta_dir) if f.endswith(".avro")]
    )
    # the per-append manifests and their lists are gone; what remains
    # is the packed manifest + the surviving snapshot's list
    assert n_avro_after < n_avro_before
    assert _ids(read_iceberg_table(spark, root)) == before
    assert (
        iceberg_metadata_table(spark, root, "manifests").count() == 1
    )


def test_rewrite_data_files_binpacks_partitions(spark, tmp_path):
    """r12: RewriteDataFiles — overlapping-day appends leave each day
    partition holding one small file per append; the bin-pack rewrites
    every qualifying partition into one file as a replace snapshot,
    byte-identical reads, pruning intact, incremental scans skipping
    it, second call a no-op."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        rewrite_iceberg_data_files,
    )

    root = str(tmp_path / "tree")
    # 5 appends over the SAME two days -> each day has 5 small files
    write_iceberg_dataset(
        spark, _batch(spark, 1, 6, 0), root, partition_by=[("ts", "day")]
    )
    for a in range(4):
        write_iceberg_dataset(
            spark, _batch(spark, 1, 6, 1000 + 100 * a), root,
            partition_by=[("ts", "day")], mode="append",
        )
    before_rows = _ids(read_iceberg_table(spark, root))
    n_before = len(read_iceberg_table(spark, root).inputFiles())
    assert n_before == 10  # 5 writes x 2 days

    out = rewrite_iceberg_data_files(spark, root)
    assert out["groups_rewritten"] == 2
    assert out["files_before"] == 10
    assert out["files_after"] == 2  # one packed file per day

    after = read_iceberg_table(spark, root)
    assert _ids(after) == before_rows
    assert len(after.inputFiles()) == 2
    # day pruning still works on the packed files
    pruned = read_iceberg_table(
        spark, root,
        predicate="ts >= TIMESTAMP '2024-01-01' AND "
        "ts < TIMESTAMP '2024-01-02'",
    )
    assert len(pruned.inputFiles()) == 1
    # the rewrite is a replace snapshot: incremental pulls skip it
    snaps = iceberg_snapshots(root)
    assert snaps[-1]["summary"]["operation"] == "replace"
    appends = [
        s for s in snaps if s["summary"].get("operation") == "append"
    ]
    inc = read_iceberg_incremental(
        spark, root, from_snapshot_id=appends[1]["snapshot-id"]
    )
    expect = sorted(
        1000 + 100 * a + i for a in range(1, 4) for i in range(6)
    )
    assert _ids(inc) == expect
    # converged: a second rewrite finds nothing to pack
    again = rewrite_iceberg_data_files(spark, root)
    assert again["groups_rewritten"] == 0


def test_remove_orphans_after_rewrite_and_expire(spark, tmp_path):
    """The full maintenance cycle: data-file rewrite supersedes the
    small files, expiration drops the snapshots that could time-travel
    to them, orphan removal reclaims their bytes — and the table reads
    byte-identically throughout. Live files are NEVER deleted (the
    dry-run/before pins)."""
    import os

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        expire_iceberg_snapshots,
        remove_orphan_iceberg_files,
        rewrite_iceberg_data_files,
    )

    root = str(tmp_path / "tree")
    write_iceberg_dataset(
        spark, _batch(spark, 1, 6, 0), root, partition_by=[("ts", "day")]
    )
    for a in range(3):
        write_iceberg_dataset(
            spark, _batch(spark, 1, 6, 1000 + 100 * a), root,
            partition_by=[("ts", "day")], mode="append",
        )
    before = _ids(read_iceberg_table(spark, root))

    # before any rewrite: nothing is orphaned
    res = remove_orphan_iceberg_files(spark, root, dry_run=True)
    assert res["orphans"] == []

    rewrite_iceberg_data_files(spark, root)
    # old snapshots still reference the small files: still no orphans
    res = remove_orphan_iceberg_files(spark, root, dry_run=True)
    assert res["orphans"] == []

    expire_iceberg_snapshots(root, keep_last=1)
    # the DEFAULT 3-day cutoff keeps the just-written superseded files
    # (they could be a racing writer's staged data, r13 verdict #4)
    res = remove_orphan_iceberg_files(spark, root, dry_run=True)
    assert res["orphans"] == []
    res = remove_orphan_iceberg_files(
        spark, root, dry_run=True, older_than_ms=0
    )
    assert len(res["orphans"]) == 8  # 4 writes x 2 days, all superseded
    res = remove_orphan_iceberg_files(spark, root, older_than_ms=0)
    assert res["deleted"] == 8
    assert all(not os.path.exists(p) for p in res["orphans"])
    assert _ids(read_iceberg_table(spark, root)) == before
    # idempotent
    assert remove_orphan_iceberg_files(
        spark, root, older_than_ms=0
    )["deleted"] == 0


def test_append_after_rewrite_composes(spark, tmp_path):
    """An append AFTER a manifest rewrite parents on the replace
    snapshot, carries the packed manifest-list rows untouched, and
    the incremental pull across the whole history still serves
    exactly the appended rows."""
    root = str(tmp_path / "tree")
    write_iceberg_dataset(
        spark, _batch(spark, 1, 6, 0), root, partition_by=[("ts", "day")]
    )
    for a in range(3):
        write_iceberg_dataset(
            spark, _batch(spark, 3 + a, 4, 1000 + 100 * a), root,
            partition_by=[("ts", "day")], mode="append",
        )
    rewrite_iceberg_manifests(root)
    write_iceberg_dataset(
        spark, _batch(spark, 10, 4, 9000), root,
        partition_by=[("ts", "day")], mode="append",
    )
    rows = _ids(read_iceberg_table(spark, root))
    assert rows == sorted(
        list(range(6))
        + [1000 + 100 * a + i for a in range(3) for i in range(4)]
        + [9000 + i for i in range(4)]
    )
    # packed manifest + the append's one: 2 manifests, not 5
    assert iceberg_metadata_table(spark, root, "manifests").count() == 2
    snaps = iceberg_snapshots(root)
    assert [s["summary"]["operation"] for s in snaps] == (
        ["append"] * 4 + ["replace", "append"]
    )
    first = snaps[0]["snapshot-id"]
    inc = read_iceberg_incremental(spark, root, from_snapshot_id=first)
    assert _ids(inc) == sorted(
        [1000 + 100 * a + i for a in range(3) for i in range(4)]
        + [9000 + i for i in range(4)]
    )


def _keys(df):
    return sorted(r.k for r in df.select("k").collect())


def test_rewrite_applies_position_deletes(spark, tmp_path):
    """r13 (verdict #3): RewritePositionDeleteFiles semantics — a
    delete-bearing v2 tree compacts with the position-delete state
    FOLDED INTO the packed files; all delete files drop in the same
    replace snapshot; reads stay byte-identical; incremental scans
    skip the replace."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _snapshot_entries,
        rewrite_iceberg_data_files,
    )

    df = spark.createDataFrame(
        [(i, f"v{i}", i % 5) for i in range(40)], "k int, v string, g int"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3,), (7,), (11,), (25,)], "k int"))
    export_iceberg_metadata(t)
    before = _keys(read_iceberg_table(spark, t.path))
    assert len(before) == 36

    out = rewrite_iceberg_data_files(spark, t.path, min_input_files=1)
    assert out["removed_delete_files"] >= 1
    assert out["files_after"] < out["files_before"] + 1  # packed

    snaps = iceberg_snapshots(t.path)
    assert snaps[-1]["summary"]["operation"] == "replace"
    data, pos, eq = _snapshot_entries(
        t.path, snaps[-1], with_deletes=True
    )
    assert pos == [] and eq == []  # the delete files are GONE
    after = read_iceberg_table(spark, t.path)
    assert _keys(after) == before  # deletes applied, not resurrected
    # prior snapshots still time-travel (old files + deletes intact)
    v_old = read_iceberg_table(
        spark, t.path, snapshot_id=snaps[0]["snapshot-id"]
    )
    assert len(_keys(v_old)) == 40


def test_rewrite_applies_equality_deletes_strict_seq(spark, tmp_path):
    """Equality-dialect trees compact too — and the spec's strict
    data_seq < delete_seq rule survives: a key re-inserted AFTER the
    delete keeps living through the compaction."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _snapshot_entries,
        rewrite_iceberg_data_files,
    )

    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3,), (7,)], "k int"))
    # re-insert k=7 AFTER the delete: data_seq > delete_seq -> lives
    t.upsert(spark.createDataFrame([(7, "reborn")], "k int, v string"))
    export_iceberg_metadata(t, delete_dialect="equality")
    before = sorted(
        (r.k, r.v)
        for r in read_iceberg_table(spark, t.path)
        .select("k", "v").collect()
    )
    assert (7, "reborn") in before and (3, "v3") not in before

    out = rewrite_iceberg_data_files(spark, t.path, min_input_files=1)
    assert out["removed_delete_files"] >= 1
    snaps = iceberg_snapshots(t.path)
    _d, pos, eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    assert pos == [] and eq == []
    after = sorted(
        (r.k, r.v)
        for r in read_iceberg_table(spark, t.path)
        .select("k", "v").collect()
    )
    assert after == before


def test_rewrite_migrates_multi_spec_tree_to_default_spec(spark, tmp_path):
    """Late r13 (lifting the earlier refusal): a multi-spec tree
    compacts by SPEC MIGRATION — every entry on an older spec is
    force-rewritten under the current default spec (iceberg-java's
    RewriteDataFiles always writes output with the current spec), so
    the combined manifest is genuinely single-spec."""
    import json

    from hudi_and_delta_showcase_spark.avro_ocf import ocf_decode
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_metadata,
        rewrite_iceberg_data_files,
    )

    root = str(tmp_path / "tree")
    write_iceberg_dataset(spark, _batch(spark, 1, 6, 0), root)
    before = sorted(
        (r.event_id, r.user_id)
        for r in read_iceberg_table(spark, root)
        .select("event_id", "user_id").collect()
    )
    # evolve the declared layout: spec 1 partitions by
    # identity(user_id);
    # the live files all remain stamped spec 0 (the foreign shape a
    # partition-spec evolution leaves behind)
    hint = f"{root}/metadata/version-hint.text"
    with open(hint) as fh:
        v = int(fh.read().strip())
    mf = f"{root}/metadata/v{v}.metadata.json"
    with open(mf) as fh:
        meta = json.load(fh)
    v_id = next(
        f["id"] for f in meta["schema"]["fields"]
        if f["name"] == "user_id"
    )
    meta["partition-specs"] = (meta.get("partition-specs") or [
        {"spec-id": 0, "fields": []}
    ]) + [{"spec-id": 1, "fields": [
        {"name": "user_id", "transform": "identity",
         "source-id": v_id, "field-id": 1000},
    ]}]
    meta["default-spec-id"] = 1
    meta["last-partition-id"] = 1000
    with open(mf, "w") as fh:
        json.dump(meta, fh)

    out = rewrite_iceberg_data_files(spark, root, min_input_files=2)
    # the single file did not qualify as a small-file group, but the
    # spec migration force-rewrote it anyway
    assert out["files_before"] >= 1
    after = sorted(
        (r.event_id, r.user_id)
        for r in read_iceberg_table(spark, root)
        .select("event_id", "user_id").collect()
    )
    assert after == before

    meta = read_iceberg_metadata(root)
    snap = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    _, rows = ocf_decode(open(snap["manifest-list"], "rb").read())
    assert [r["partition_spec_id"] for r in rows] == [1]
    # the migrated entries carry real identity(v) partition values
    _, entries = ocf_decode(open(rows[0]["manifest_path"], "rb").read())
    parts = {
        e["data_file"]["partition"].get("user_id")
        for e in entries
        if e["status"] != 2
    }
    assert parts and None not in parts


def test_rewrite_manifests_mixed_writer_schemas(spark, tmp_path):
    """r13 ADVICE: manifests authored by DIFFERENT writers (foreign +
    engine, differing optional stats fields) must re-encode each
    entry under its OWN decoded writer schema — one-schema-per-spec
    either raised KeyError on absent fields or silently dropped
    stats. Entries group by (spec, writer schema); stats survive
    exactly where they existed."""
    import json as _json

    from hudi_and_delta_showcase_spark.avro_ocf import (
        ocf_decode,
        ocf_encode,
    )
    from hudi_and_delta_showcase_spark.tables import fsio
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _resolve,
        rewrite_iceberg_manifests,
    )

    root = str(tmp_path / "tree")
    write_iceberg_dataset(spark, _batch(spark, 1, 6, 0), root)
    for a in range(2):
        write_iceberg_dataset(
            spark, _batch(spark, 1, 4, 1000 + 100 * a), root,
            mode="append",
        )
    before_rows = _ids(read_iceberg_table(spark, root))

    # simulate a foreign writer: re-encode ONE manifest under a
    # REDUCED schema lacking the optional value_counts stats field
    meta = read_iceberg_metadata(root)
    snap = [
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    ][0]
    _, list_rows = ocf_decode(
        fsio.read_bytes(_resolve(root, snap["manifest-list"]))
    )
    target = [m for m in list_rows if m.get("content", 0) == 0][0]
    mpath = _resolve(root, target["manifest_path"])
    mschema, recs = ocf_decode(fsio.read_bytes(mpath))

    def _record(s):
        if isinstance(s, list):
            (s,) = [
                b for b in s
                if isinstance(b, dict) and b.get("type") == "record"
            ]
        return s

    df_schema = _record(
        next(
            f["type"] for f in _record(mschema)["fields"]
            if f["name"] == "data_file"
        )
    )
    stats_fields = {"lower_bounds", "upper_bounds"}
    assert any(f["name"] in stats_fields for f in df_schema["fields"])
    df_schema["fields"] = [
        f for f in df_schema["fields"] if f["name"] not in stats_fields
    ]
    for r in recs:
        r["data_file"] = {
            k: v for k, v in r["data_file"].items()
            if k not in stats_fields
        }
    fsio.write_bytes_atomic(
        mpath, ocf_encode(mschema, recs, codec="null")
    )
    assert _ids(read_iceberg_table(spark, root)) == before_rows

    out = rewrite_iceberg_manifests(root)
    assert out["manifests_before"] == 3
    assert out["manifests_after"] == 2  # one bin per writer schema
    assert _ids(read_iceberg_table(spark, root)) == before_rows

    # stats survive exactly where they existed: the reduced group's
    # entries carry no bounds, the engine group's still do
    meta2 = read_iceberg_metadata(root)
    snap2 = [
        s for s in meta2["snapshots"]
        if s["snapshot-id"] == meta2["current-snapshot-id"]
    ][0]
    _, rows2 = ocf_decode(
        fsio.read_bytes(_resolve(root, snap2["manifest-list"]))
    )
    flags = []
    for m in rows2:
        if m.get("content", 0) != 0:
            continue
        _, es = ocf_decode(fsio.read_bytes(_resolve(root, m["manifest_path"])))
        flags.append(
            all("lower_bounds" in e["data_file"] for e in es)
            or all("lower_bounds" not in e["data_file"] for e in es)
        )
        assert es, _json.dumps(m, default=str)
    assert flags and all(flags), "a packed manifest mixed writer schemas"


def test_orphan_removal_spares_recent_staged_files(spark, tmp_path):
    """r13 (verdict #4): a racing writer's staged-but-uncommitted data
    file — on disk under data/, snapshot not yet committed — survives
    the default 3-day window; only once its mtime ages past the
    cutoff does it become eligible."""
    import os

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        remove_orphan_iceberg_files,
    )

    root = str(tmp_path / "tree")
    write_iceberg_dataset(spark, _batch(spark, 1, 6, 0), root)
    staged = os.path.join(root, "data", "staged-racing-writer.parquet")
    with open(staged, "wb") as fh:
        fh.write(b"PAR1 staged bytes")

    res = remove_orphan_iceberg_files(spark, root)  # default window
    assert res["orphans"] == [] and os.path.exists(staged)

    # age the staged file past the cutoff: now it is a true orphan
    old = (os.path.getmtime(staged)) - 4 * 24 * 3600
    os.utime(staged, (old, old))
    res = remove_orphan_iceberg_files(spark, root)
    assert res["deleted"] == 1 and not os.path.exists(staged)
    # live data untouched
    assert len(_ids(read_iceberg_table(spark, root))) == 6


def test_rewrite_data_files_sort_strategy(spark, tmp_path):
    """r13: RewriteDataFiles' SORT strategy — interleaved appends
    leave every file spanning the full event_id range; the sorted
    rewrite packs narrow-range files (manifest bounds prune
    read_iceberg_where), records the sort order in the metadata, and
    reads back byte-identically."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_where,
        rewrite_iceberg_data_files,
    )

    root = str(tmp_path / "tree")
    # 4 interleaved appends: each file holds event_id residues -> the
    # full range, so bounds pruning on event_id is useless before
    for i in range(4):
        rows = [
            (j * 4 + i, datetime(2024, 1, 1, 0), (j * 4 + i) % 7)
            for j in range(50)
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long"
        ).coalesce(1)
        write_iceberg_dataset(
            spark, df, root, mode="append" if i else "error"
        )
    before = _ids(read_iceberg_table(spark, root))
    pre = read_iceberg_where(spark, root, "event_id", hi=9)
    assert len(pre.inputFiles()) == 4  # nothing prunes

    out = rewrite_iceberg_data_files(
        spark, root, target_file_bytes=1024, sort_by=["event_id"]
    )
    assert out["groups_rewritten"] == 1
    assert out["files_after"] >= 2
    assert out["sort_order_id"] == 1

    assert _ids(read_iceberg_table(spark, root)) == before
    post = read_iceberg_where(spark, root, "event_id", hi=9)
    assert len(post.inputFiles()) < out["files_after"]
    assert sorted(r.event_id for r in post.collect()) == list(range(10))
    meta = read_iceberg_metadata(root)
    assert meta["default-sort-order-id"] == 1
    order = [
        o for o in meta["sort-orders"] if o["order-id"] == 1
    ][0]
    assert order["fields"][0]["transform"] == "identity"
    assert order["fields"][0]["direction"] == "asc"
    with pytest.raises(ValueError, match="not in the current schema"):
        rewrite_iceberg_data_files(spark, root, sort_by=["nope"])
