"""Iceberg INCREMENTAL APPEND SCAN (r10): rows added between two
snapshots, walking the parent lineage — ``replace`` (compaction)
snapshots skipped, ``overwrite``/``delete`` refused, O(changed files)
manifest IO (only manifests the contributing snapshot added are
opened). The Iceberg leg of the incremental-pull triad."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    export_iceberg_metadata,
    iceberg_snapshots,
    read_iceberg_incremental,
    read_iceberg_table,
)


def _rows(df):
    return sorted((r.k, r.b) for r in df.select("k", "b").collect())


@pytest.fixture()
def tree(spark, tmp_path):
    """create (partition p1) -> upsert into a NEW partition p2 (a pure
    append — partition-scoped routing touches no p1 file) -> optimize
    (a replace) -> export."""
    df1 = spark.createDataFrame(
        [(k, f"v{k}", "p1") for k in range(20)], "k int, v string, b string"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"], partition_by="b"
    )
    df2 = spark.createDataFrame(
        [(k, f"v{k}", "p2") for k in range(100, 120)],
        "k int, v string, b string",
    ).coalesce(2)
    t.upsert(df2)
    t.optimize(target_files=2)
    export_iceberg_metadata(t)
    return t


def test_operations_append_then_replace(spark, tree):
    ops = [
        s["summary"]["operation"] for s in iceberg_snapshots(tree.path)
    ]
    assert ops == ["append", "append", "replace"]


def test_incremental_pull_added_rows_only(spark, tree):
    snaps = iceberg_snapshots(tree.path)
    out = read_iceberg_incremental(
        spark, tree.path, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    # only the p2 batch: the optimize snapshot added files but no rows
    # (replace — skipped); the full current snapshot has all 40 rows
    assert _rows(out) == [(k, "p2") for k in range(100, 120)]
    assert len(_rows(read_iceberg_table(spark, tree.path))) == 40


def test_incremental_from_table_creation(spark, tree):
    out = read_iceberg_incremental(spark, tree.path)
    assert _rows(out) == (
        [(k, "p1") for k in range(20)] + [(k, "p2") for k in range(100, 120)]
    )


def test_incremental_predicate_prunes_added_files(spark, tree):
    snaps = iceberg_snapshots(tree.path)
    full = read_iceberg_incremental(
        spark, tree.path, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    pruned = read_iceberg_incremental(
        spark, tree.path, from_snapshot_id=snaps[0]["snapshot-id"],
        predicate=[("k", ">=", 110)],
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _rows(pruned) == [(k, "p2") for k in range(110, 120)]
    # pruned-to-empty keeps the schema
    none = read_iceberg_incremental(
        spark, tree.path, from_snapshot_id=snaps[0]["snapshot-id"],
        predicate=[("k", ">", 10_000)],
    )
    assert none.count() == 0 and none.schema == full.schema


def test_overwrite_snapshot_refuses(spark, tmp_path):
    df1 = spark.createDataFrame(
        [(k, f"v{k}") for k in range(10)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df1, key_cols=["k"]
    )
    # overlapping keys: the CoW upsert rewrites files -> overwrite
    t.upsert(spark.createDataFrame([(5, "v5x")], "k int, v string"))
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(t.path)
    with pytest.raises(ValueError, match="operation 'overwrite'"):
        read_iceberg_incremental(
            spark, t.path, from_snapshot_id=snaps[0]["snapshot-id"]
        )


def test_unknown_and_non_ancestor_snapshots_refuse(spark, tree):
    snaps = iceberg_snapshots(tree.path)
    with pytest.raises(ValueError, match="unknown snapshot-id"):
        read_iceberg_incremental(spark, tree.path, from_snapshot_id=12345)
    with pytest.raises(ValueError, match="not an ancestor"):
        # walking from the FIRST snapshot can never reach the last
        read_iceberg_incremental(
            spark, tree.path,
            from_snapshot_id=snaps[-1]["snapshot-id"],
            to_snapshot_id=snaps[0]["snapshot-id"],
        )


def test_empty_range_refuses(spark, tree):
    snaps = iceberg_snapshots(tree.path)
    sid = snaps[1]["snapshot-id"]
    with pytest.raises(ValueError, match="no data files added"):
        read_iceberg_incremental(
            spark, tree.path, from_snapshot_id=sid, to_snapshot_id=sid
        )
