"""Hudi `.hoodie` on-disk layout (tables/hoodie_timeline.py): file-group
naming, instant state machine, snapshot isolation, time travel,
overwrite semantics — against the PUBLIC Apache Hudi layout."""

from __future__ import annotations

import os
import re

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
    list_instants,
    read_hoodie_table,
    write_hoodie_table,
)

FILE_RE = re.compile(
    r"^[0-9a-f-]{36}_0-1-0_\d{17}\.parquet$"
)


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )


def test_layout_and_roundtrip(spark, events, tmp_path):
    path = str(tmp_path / "hudi_tbl")
    half = events.filter(F.col("event_id") % 2 == 0)
    rest = events.filter(F.col("event_id") % 2 == 1)
    i0 = write_hoodie_table(half, path)
    i1 = write_hoodie_table(rest, path)
    assert i0 < i1

    # timeline: completed instants only; state files cleaned up
    assert list_instants(path) == [i0, i1]
    assert list_instants(path, "inflight") == []
    assert list_instants(path, "requested") == []
    assert os.path.exists(os.path.join(path, ".hoodie", "hoodie.properties"))
    assert os.path.exists(os.path.join(path, ".hoodie_partition_metadata"))

    # file-group naming convention
    data_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert data_files and all(FILE_RE.match(f) for f in data_files)

    # snapshot == union; time travel at i0 == first half
    total = events.count()
    assert read_hoodie_table(spark, path).count() == total
    assert read_hoodie_table(spark, path, as_of_instant=i0).count() == (
        half.count()
    )
    got = sorted(
        r.event_id for r in read_hoodie_table(spark, path).collect()
    )
    assert got == sorted(r.event_id for r in events.collect())


def test_incomplete_instant_invisible(spark, events, tmp_path):
    """Snapshot isolation: data staged under a non-completed instant is
    never read — only `.commit` instants resolve file slices."""
    path = str(tmp_path / "hudi_tbl")
    write_hoodie_table(events.limit(10), path)
    # simulate a crashed writer: inflight instant + orphan data file
    orphan_instant = "99999999999999999"
    open(
        os.path.join(path, ".hoodie", f"{orphan_instant}.inflight"), "w"
    ).close()
    events.limit(5).write.parquet(str(tmp_path / "stage"))
    part = next(
        f for f in os.listdir(tmp_path / "stage") if f.endswith(".parquet")
    )
    os.rename(
        str(tmp_path / "stage" / part),
        os.path.join(
            path, f"{'0' * 8}-dead-beef-dead-beefdeadbeef_0-1-0_{orphan_instant}.parquet"
        ),
    )
    assert read_hoodie_table(spark, path).count() == 10


def test_overwrite_resets_file_groups(spark, events, tmp_path):
    path = str(tmp_path / "hudi_tbl")
    write_hoodie_table(events.limit(50), path)
    i1 = write_hoodie_table(events.limit(7), path, mode="overwrite")
    assert read_hoodie_table(spark, path).count() == 7
    # append after overwrite stacks on the new snapshot
    write_hoodie_table(events.limit(3), path)
    assert read_hoodie_table(spark, path).count() == 10
    # time travel: as-of the overwrite instant sees exactly 7
    assert read_hoodie_table(spark, path, as_of_instant=i1).count() == 7


def test_export_lakehouse_timeline_as_hoodie(spark, tmp_path):
    """XTable-style export to .hoodie: the Hudi-protocol reader serves
    the lakehouse table's state from the SAME files, per version, with
    partial rewrites expressed as replacecommit semantics; re-export is
    incremental."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        list_instants,
        read_hoodie_table,
    )
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "k int, v int, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.upsert(spark.createDataFrame([(2, 22, 2), (3, 30, 2)],
                                   "k int, v int, sq int"))
    i1 = export_hoodie_timeline(t)
    # r8: the key-overlapping upsert replaced a file group, so it
    # exports as a REAL replacecommit — one .commit + one .replacecommit
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        _completed_instants,
    )
    kinds = [k for _i, k in _completed_instants(str(tmp_path / "t"))]
    assert kinds == ["commit", "replacecommit"]
    native = {(r.k, r.v) for r in t.read().select("k", "v").collect()}
    via_hudi = {
        (r.k, r.v)
        for r in read_hoodie_table(spark, t.path).select("k", "v").collect()
    }
    assert native == via_hudi
    # time travel: the first instant serves version-0 state
    first = _completed_instants(str(tmp_path / "t"))[0][0]
    v0 = {
        (r.k, r.v)
        for r in read_hoodie_table(spark, t.path, as_of_instant=first)
        .select("k", "v")
        .collect()
    }
    assert v0 == {(1, 10), (2, 20)}
    # incremental re-export appends exactly one instant
    t.upsert(spark.createDataFrame([(4, 40, 3)], "k int, v int, sq int"))
    i2 = export_hoodie_timeline(t)
    assert i2 > i1
    assert len(_completed_instants(str(tmp_path / "t"))) == 3
    assert {
        r.k for r in read_hoodie_table(spark, t.path).select("k").collect()
    } == {1, 2, 3, 4}


def test_incremental_query_foreign_timeline(spark, tmp_path):
    """Hudi incremental query on a foreign .hoodie timeline: rows
    committed in (begin, end] only — carried-forward rows keep their
    original stamp and stay excluded."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        list_instants,
        read_hoodie_incremental,
        write_hoodie_table,
    )

    root = str(tmp_path / "ht")
    write_hoodie_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        .coalesce(1),
        root,
    )
    write_hoodie_table(
        spark.createDataFrame([(3, "c")], "k int, v string").coalesce(1),
        root,
    )
    write_hoodie_table(
        spark.createDataFrame([(4, "d")], "k int, v string").coalesce(1),
        root,
    )
    i1, i2, i3 = list_instants(root)
    pull = read_hoodie_incremental(spark, root, begin_instant=i1)
    assert sorted((r.k, r.v) for r in pull.select("k", "v").collect()) == [
        (3, "c"), (4, "d")]
    pull2 = read_hoodie_incremental(
        spark, root, begin_instant=i1, end_instant=i2
    )
    assert [r.k for r in pull2.collect()] == [3]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="no commits"):
        read_hoodie_incremental(spark, root, begin_instant=i3)


def test_incremental_pull_on_engine_export_stamps_from_commits(
    spark, tmp_path
):
    """r8 (r7-advice, medium): an incremental pull over THIS ENGINE'S
    export_hoodie_timeline output — whose parquet files keep their
    part-*.parquet names, matching neither stored meta columns nor the
    file-group naming convention — must stamp rows with the instant
    whose write stats introduced their file, not silently filter
    everything to zero rows."""
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        list_instants,
        read_hoodie_incremental,
    )

    root = str(tmp_path / "lh")
    t = LakehouseTable.create(
        spark, root,
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        key_cols=["k"],
    )
    t.upsert(spark.createDataFrame([(3, "c")], "k int, v string"))
    export_hoodie_timeline(t)
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        _completed_instants,
    )
    instants = [i for i, _k in _completed_instants(root)]
    assert len(instants) >= 2
    pull = read_hoodie_incremental(spark, root, begin_instant=instants[-2])
    got = sorted((r.k, r.v) for r in pull.select("k", "v").collect())
    assert got == [(3, "c")]


def test_archived_timeline_serves_by_listing(spark, tmp_path):
    """r8: Hudi ARCHIVES old instants out of .hoodie (the normal state
    of any long-lived table), taking their write stats with them —
    slices below the horizon must be discovered by listing, layered
    under the active timeline's replay (newer slices supersede,
    overwrite barriers still clear)."""
    import shutil

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        latest_file_slices_rt,
    )

    root = str(tmp_path / "ht")
    for batch in ([(1, "a")], [(2, "b")], [(3, "c")]):
        write_hoodie_table(
            spark.createDataFrame(batch, "k int, v string").coalesce(1),
            root,
        )
    i1, i2, i3 = list_instants(root)
    # simulate archival of the FIRST commit: instant files move into
    # .hoodie/archived (content opaque to the reader)
    arch = os.path.join(root, ".hoodie", "archived")
    os.makedirs(arch)
    os.rename(
        os.path.join(root, ".hoodie", f"{i1}.commit"),
        os.path.join(arch, "commits_.archive.1_1-0-1"),
    )
    assert list_instants(root) == [i2, i3]
    got = sorted(
        (r.k, r.v)
        for r in read_hoodie_table(spark, root).select("k", "v").collect()
    )
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # time travel BELOW the horizon serves the listed state
    tt = sorted(
        (r.k, r.v)
        for r in read_hoodie_table(spark, root, as_of_instant=i1)
        .select("k", "v").collect()
    )
    assert tt == [(1, "a")]
    # adoption sees the archived slice too
    t = LakehouseTable.convert_hoodie(spark, root, key_cols=["k"])
    assert sorted((r.k, r.v) for r in t.read().select("k", "v").collect()) \
        == [(1, "a"), (2, "b"), (3, "c")]


def test_archived_timeline_respects_overwrite_barrier(spark, tmp_path):
    """A file below the horizon that was superseded by an ACTIVE
    INSERT_OVERWRITE must NOT resurrect via listing."""
    root = str(tmp_path / "ht")
    write_hoodie_table(
        spark.createDataFrame([(1, "old")], "k int, v string").coalesce(1),
        root,
    )
    write_hoodie_table(
        spark.createDataFrame([(2, "new")], "k int, v string").coalesce(1),
        root, mode="overwrite",
    )
    i1, i2 = list_instants(root)
    arch = os.path.join(root, ".hoodie", "archived")
    os.makedirs(arch)
    os.rename(
        os.path.join(root, ".hoodie", f"{i1}.commit"),
        os.path.join(arch, "commits_.archive.1_1-0-1"),
    )
    got = sorted(
        (r.k, r.v)
        for r in read_hoodie_table(spark, root).select("k", "v").collect()
    )
    assert got == [(2, "new")]


def test_hoodie_timeline_table_relation(spark, tmp_path):
    """r10: the show-commits inspection relation over a foreign tree —
    completed instants only, write-stats tallies from the commit
    metadata alone."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        hoodie_timeline_table,
        write_hoodie_table,
    )

    root = str(tmp_path / "ht")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_hoodie_table(df.coalesce(1), root)
    write_hoodie_table(
        spark.createDataFrame([(3, "c")], "k long, v string").coalesce(1),
        root,
    )
    rows = hoodie_timeline_table(spark, root).collect()
    assert [r.action for r in rows] == ["commit", "commit"]
    assert [r.num_write_files for r in rows] == [1, 1]
    assert rows[0].instant < rows[1].instant
    assert all(r.total_bytes > 0 for r in rows)


def test_export_hoodie_timeline_v8_dialect(spark, tmp_path):
    """r12 (verdict #4): export_hoodie_timeline(table_version=8) writes
    the Hudi 1.x layout — instant files under .hoodie/timeline/ named
    <requested>_<completion>.<action>, hoodie.table.version=8 /
    timeline.layout.version=2 — and the engine's own 1.x read side
    serves it byte-for-byte-equivalently to the v6 dialect: same rows,
    same replacecommit taxonomy, same time travel, same incremental
    re-export."""
    import os

    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        _completed_instants,
        export_hoodie_timeline,
        read_hoodie_table,
        read_properties,
    )
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    def build(root):
        df = spark.createDataFrame(
            [(1, 10, 1), (2, 20, 1)], "k int, v int, sq int"
        )
        t = LakehouseTable.create(
            spark, root, df, key_cols=["k"], precombine="sq"
        )
        t.upsert(
            spark.createDataFrame(
                [(2, 22, 2), (3, 30, 2)], "k int, v int, sq int"
            )
        )
        return t

    t8 = build(str(tmp_path / "v8"))
    export_hoodie_timeline(t8, table_version=8)
    t6 = build(str(tmp_path / "v6"))
    export_hoodie_timeline(t6)

    # layout pins: 1.x dir + stem naming + declared version
    tl = os.path.join(t8.path, ".hoodie", "timeline")
    names = sorted(os.listdir(tl))
    assert all(
        len(n.split(".")[0].split("_")) == 2
        and all(p.isdigit() for p in n.split(".")[0].split("_"))
        for n in names
    ), names
    req, comp = names[0].split(".")[0].split("_")
    assert req < comp  # requested strictly before completion
    props = read_properties(t8.path)
    assert props["hoodie.table.version"] == "8"
    assert props["hoodie.timeline.layout.version"] == "2"
    # no completed instants leak into the flat .hoodie/ dir
    flat = [
        f for f in os.listdir(os.path.join(t8.path, ".hoodie"))
        if f.endswith((".commit", ".replacecommit", ".deltacommit"))
    ]
    assert flat == []

    # read-side equivalence with the v6 dialect, taxonomy included
    assert [k for _i, k in _completed_instants(t8.path)] == [
        k for _i, k in _completed_instants(t6.path)
    ] == ["commit", "replacecommit"]
    rows8 = {(r.k, r.v) for r in read_hoodie_table(spark, t8.path)
             .select("k", "v").collect()}
    rows6 = {(r.k, r.v) for r in read_hoodie_table(spark, t6.path)
             .select("k", "v").collect()}
    assert rows8 == rows6 == {(1, 10), (2, 22), (3, 30)}
    first = _completed_instants(t8.path)[0][0]
    v0 = {(r.k, r.v)
          for r in read_hoodie_table(spark, t8.path, as_of_instant=first)
          .select("k", "v").collect()}
    assert v0 == {(1, 10), (2, 20)}

    # incremental re-export appends one 1.x instant, idempotently
    t8.upsert(spark.createDataFrame([(4, 40, 3)], "k int, v int, sq int"))
    export_hoodie_timeline(t8, table_version=8)
    export_hoodie_timeline(t8, table_version=8)  # no-op
    assert len(_completed_instants(t8.path)) == 3
    assert {r.k for r in read_hoodie_table(spark, t8.path)
            .select("k").collect()} == {1, 2, 3, 4}

    # dialect mixing refuses both ways
    import pytest as _pytest

    with _pytest.raises(ValueError, match="split the timeline"):
        export_hoodie_timeline(t8, table_version=6)
    with _pytest.raises(ValueError, match="split the timeline"):
        export_hoodie_timeline(t6, table_version=8)


# --- r13: CLEAN action (KEEP_LATEST_COMMITS reclamation) --------------


def test_clean_removes_superseded_versions(spark, events, tmp_path):
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        clean_hoodie_table,
    )

    path = str(tmp_path / "hudi_tbl")
    half = events.filter(F.col("event_id") % 2 == 0)
    rest = events.filter(F.col("event_id") % 2 == 1)
    write_hoodie_table(half.coalesce(1), path)
    write_hoodie_table(rest.coalesce(1), path)
    i2 = write_hoodie_table(events.coalesce(2), path, mode="overwrite")
    before = sorted(
        r.event_id for r in read_hoodie_table(spark, path).collect()
    )

    # a wide retention window protects everything
    protected = clean_hoodie_table(spark, path, retain_commits=10)
    assert protected["deleted"] == 0 and protected["earliest_retained"] is None

    # dry run lists the two pre-overwrite files without deleting
    dry = clean_hoodie_table(
        spark, path, retain_commits=1, dry_run=True
    )
    assert len(dry["would_remove_files"]) == 2 and dry["deleted"] == 0
    assert dry["earliest_retained"] == i2
    assert all(
        os.path.exists(os.path.join(path, p))
        for p in dry["would_remove_files"]
    )

    out = clean_hoodie_table(spark, path, retain_commits=1)
    assert out["deleted"] == 2
    assert not any(
        os.path.exists(os.path.join(path, p))
        for p in out["would_remove_files"]
    )
    # the snapshot read serves exactly what it served before
    after = sorted(
        r.event_id for r in read_hoodie_table(spark, path).collect()
    )
    assert after == before
    # the action is a real timeline instant with Hudi's metadata names
    import json as _json

    cf = os.path.join(path, ".hoodie", f"{out['instant']}.clean")
    assert os.path.exists(cf)
    meta = _json.loads(open(cf).read())
    assert meta["earliestCommitToRetain"] == i2
    assert meta["totalFilesDeleted"] == 2
    assert meta["cleanerPolicy"] == "KEEP_LATEST_COMMITS"
    files = [
        f
        for pm in meta["partitionMetadata"].values()
        for f in pm["successDeleteFiles"]
    ]
    assert sorted(files) == out["would_remove_files"]
    # idempotent: nothing left to clean at this retention
    again = clean_hoodie_table(spark, path, retain_commits=1)
    assert again["deleted"] == 0


def test_clean_keeps_live_slices_of_retained_window(spark, events, tmp_path):
    """Versions still serving any as-of >= earliestCommitToRetain
    survive: with retain_commits=2 the pre-overwrite files closed AT
    the earliest retained instant are removable, but the overwrite's
    own files are not."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        clean_hoodie_table,
        list_instants,
    )

    path = str(tmp_path / "hudi_tbl")
    write_hoodie_table(events.coalesce(1), path)
    write_hoodie_table(events.coalesce(1), path, mode="overwrite")
    write_hoodie_table(events.coalesce(1), path, mode="overwrite")
    i0, i1, i2 = list_instants(path)
    out = clean_hoodie_table(spark, path, retain_commits=2)
    # retained window starts at i1: the i0 file (closed at i1) goes,
    # the i1 file (closed at i2 > i1) stays for as-of i1 reads
    assert out["earliest_retained"] == i1
    assert out["deleted"] == 1
    assert read_hoodie_table(spark, path, as_of_instant=i1).count() == (
        events.count()
    )
