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
