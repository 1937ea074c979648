"""Delta INCREMENTAL APPEND READ (r10): rows added in a version range
of a raw ``_delta_log`` — the streaming-source discipline for tables
WITHOUT change data feed. dataChange=false versions (OPTIMIZE) are
skipped — the exporter now stamps maintenance rewrites that way, which
also unblocks CDF reads over exported logs with compactions."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.delta_log import (
    export_delta_log,
    read_delta_changes,
    read_delta_incremental,
    read_delta_table,
)


def _rows(df):
    return sorted((r.k, r.b) for r in df.select("k", "b").collect())


@pytest.fixture()
def tree(spark, tmp_path):
    """create (partition p1) -> upsert into a NEW partition p2 (pure
    append) -> optimize (maintenance rewrite) -> export."""
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
    export_delta_log(t)
    return t


def test_incremental_pull_added_rows_only(spark, tree):
    out = read_delta_incremental(spark, tree.path, from_version=0)
    # only the p2 batch: the optimize version is all dataChange=false
    assert _rows(out) == [(k, "p2") for k in range(100, 120)]
    assert len(_rows(read_delta_table(spark, tree.path))) == 40


def test_incremental_predicate_prunes_added_files(spark, tree):
    full = read_delta_incremental(spark, tree.path, from_version=0)
    pruned = read_delta_incremental(
        spark, tree.path, from_version=0, predicate=[("k", ">=", 110)]
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _rows(pruned) == [(k, "p2") for k in range(110, 120)]
    none = read_delta_incremental(
        spark, tree.path, from_version=0, predicate=[("k", ">", 9000)]
    )
    assert none.count() == 0 and none.schema == full.schema


def test_cdf_read_skips_exported_optimize_version(spark, tree):
    """The dataChange=false stamping unblocks read_delta_changes over a
    log holding a compaction — previously the remove actions made it
    refuse."""
    ch = read_delta_changes(spark, tree.path, begin_version=1)
    got = sorted(
        (r.k, r.b, r._change_type)
        for r in ch.select("k", "b", "_change_type").collect()
    )
    assert got == [(k, "p2", "insert") for k in range(100, 120)]


def test_rewrite_version_refuses(spark, tmp_path):
    df1 = spark.createDataFrame(
        [(k, f"v{k}") for k in range(10)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df1,
                              key_cols=["k"])
    t.upsert(spark.createDataFrame([(5, "v5x")], "k int, v string"))
    export_delta_log(t)
    with pytest.raises(ValueError, match="removes/changes data"):
        read_delta_incremental(spark, t.path, from_version=0)


def test_empty_range_and_bad_versions_refuse(spark, tree):
    with pytest.raises(ValueError, match="no data files added"):
        read_delta_incremental(
            spark, tree.path, from_version=2, to_version=2
        )
    with pytest.raises(ValueError, match="not in log"):
        read_delta_incremental(
            spark, tree.path, from_version=0, to_version=99
        )


def test_cdf_predicate_prunes_and_filters(spark, tree):
    """r11: read_delta_changes takes the shared tuple/SQL predicate —
    add/cdc actions prune on partitionValues + stats before any file
    opens, the row filter applies to the surviving change rows, and an
    all-pruned range returns an empty stamped frame."""
    full = read_delta_changes(spark, tree.path, begin_version=0)
    pruned = read_delta_changes(
        spark, tree.path, begin_version=0, predicate="b = 'p2'"
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _rows(pruned) == [(k, "p2") for k in range(100, 120)]
    # stats pruning on a non-partition column
    stat = read_delta_changes(
        spark, tree.path, begin_version=0, predicate=[("k", ">=", 100)]
    )
    assert _rows(stat) == [(k, "p2") for k in range(100, 120)]
    assert len(stat.inputFiles()) < len(full.inputFiles())
    # all-pruned: empty stamped frame, never a raise
    empty = read_delta_changes(
        spark, tree.path, begin_version=0, predicate="b = 'zz'"
    )
    assert empty.count() == 0
    assert {"_change_type", "_commit_version",
            "_commit_timestamp"} <= set(empty.columns)
