"""Deletion vectors (Delta DV / Iceberg position deletes): with
``deletion_vectors=True`` a DELETE writes an O(deleted rows) parquet
sidecar of ``(file_name, pos)`` row positions instead of rewriting base
files; every read path anti-joins the sidecar against the scan's native
``(_metadata.file_name, _metadata.row_index)``. File-rewriting commits
(upsert of the file's partition, compact, optimize) materialize the
deletes and the vectors never resurrect rows."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables import manifest as mf


def _base(spark):
    return spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (2, "a", 20, 100),
            (3, "a", 30, 100),
            (4, "b", 40, 100),
            (5, "b", 50, 100),
        ],
        "k long, region string, v long, ts long",
    )


_REGION = {1: "a", 2: "a", 3: "a", 4: "b", 5: "b"}


def _keys(spark, *ks):
    # non-global index: the delete key includes the partition column
    return spark.createDataFrame(
        [(k, _REGION[k]) for k in ks], "k long, region string"
    )


def _make(spark, tmp_path, **kw):
    return LakehouseTable.create(
        spark,
        str(tmp_path / "dv_tbl"),
        _base(spark),
        key_cols=["k"],
        precombine="ts",
        partition_by="region",
        deletion_vectors=True,
        **kw,
    )


def _ks(df):
    return {r.k for r in df.select("k").collect()}


def test_dv_delete_rewrites_no_base_files(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = t._commit(None).files
    c = t.delete(_keys(spark, 2, 4))
    assert c.files == before  # merge-on-read delete: base untouched
    assert c.stats["rewritten_files"] == 0
    assert c.dv_files  # sidecar written
    assert _ks(t.read()) == {1, 3, 5}


def test_dv_read_paths_all_filter(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(_keys(spark, 2))
    assert _ks(t.read()) == {1, 3, 4, 5}
    # point lookup: deleted key invisible, live key found
    assert _ks(t.read_for_keys([2])) == set()
    assert _ks(t.read_for_keys([3])) == {3}
    # stats-pruned range read
    assert _ks(t.read_where("v", lo=15, hi=45)) == {3, 4}


def test_dv_time_travel_sees_pre_delete_state(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(_keys(spark, 1, 5))
    assert _ks(t.read(version=0)) == {1, 2, 3, 4, 5}
    assert _ks(t.read()) == {2, 3, 4}


def test_dv_consecutive_deletes_accumulate(spark, tmp_path):
    t = _make(spark, tmp_path)
    c1 = t.delete(_keys(spark, 1))
    c2 = t.delete(_keys(spark, 2))
    assert set(c1.dv_files) < set(c2.dv_files)  # append, no DV rewrite
    assert _ks(t.read()) == {3, 4, 5}


def test_dv_upsert_does_not_resurrect(spark, tmp_path):
    """Upsert rewrites the affected partition reading THROUGH the DVs, so
    a deleted row is gone from the new files, not revived by them."""
    t = _make(spark, tmp_path)
    t.delete(_keys(spark, 2))  # region=a row deleted via DV
    t.upsert(
        spark.createDataFrame(
            [(1, "a", 11, 200)], "k long, region string, v long, ts long"
        )
    )
    got = {(r.k, r.v) for r in t.read().select("k", "v").collect()}
    assert got == {(1, 11), (3, 30), (4, 40), (5, 50)}


def test_dv_optimize_materializes_and_clears(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(_keys(spark, 4))
    c = t.optimize(target_files=1)
    assert c.dv_files == []  # rewrite materialized the deletes
    assert _ks(t.read()) == {1, 2, 3, 5}
    # after vacuum drops pre-optimize versions the state still holds
    t.vacuum(retain_versions=1)
    assert _ks(t.read()) == {1, 2, 3, 5}


def test_dv_vacuum_keeps_referenced_sidecars(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(_keys(spark, 1))
    res = t.vacuum(retain_versions=1)
    c = t._commit(None)
    for f in c.dv_files:
        assert os.path.exists(os.path.join(t.path, f)), (f, res)
    assert _ks(t.read()) == {2, 3, 4, 5}


def test_dv_restore_carries_vectors(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(_keys(spark, 1))  # v1
    t.delete(_keys(spark, 2))  # v2
    t.restore(1)
    assert _ks(t.read()) == {2, 3, 4, 5}


def test_dv_delete_prunes_candidate_files(spark, tmp_path):
    """The DV probe scans only partition/key-range candidate files."""
    t = _make(spark, tmp_path)
    c = t.delete(_keys(spark, 4))  # region=b only
    files_a = [f for f in t._commit(None).files if "__pp=a" in f]
    assert files_a  # partition a exists...
    assert c.stats["dv_candidate_files"] < len(t._commit(None).files)


def test_dv_matches_rewrite_delete_semantics(spark, tmp_path):
    """DV table and rewrite table answer identically after the same ops."""
    dv = _make(spark, tmp_path)
    rw = LakehouseTable.create(
        spark, str(tmp_path / "rw_tbl"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
    )
    for t in (dv, rw):
        t.delete(_keys(spark, 2, 5))
        t.upsert(
            spark.createDataFrame(
                [(6, "c", 60, 300)], "k long, region string, v long, ts long"
            )
        )
    cols = ["k", "region", "v", "ts"]
    assert sorted(map(tuple, dv.read().select(cols).collect())) == sorted(
        map(tuple, rw.read().select(cols).collect())
    )


def test_dv_mor_compacts_then_vectors(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "mor_dv"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
        table_type="mor", deletion_vectors=True,
    )
    t.upsert(
        spark.createDataFrame(
            [(2, "a", 21, 200)], "k long, region string, v long, ts long"
        )
    )  # lands in log
    t.delete(_keys(spark, 2))  # compacts logs, then DV-deletes
    c = t._commit(None)
    assert c.log_files == []
    assert c.stats["rewritten_files"] == 0 and c.dv_files
    assert _ks(t.read()) == {1, 3, 4, 5}


def test_dv_sidecar_schema_and_positions(spark, tmp_path):
    t = _make(spark, tmp_path)
    c = t.delete(_keys(spark, 1, 3))
    dv = spark.read.parquet(*[os.path.join(t.path, f) for f in c.dv_files])
    assert set(dv.columns) == {"file_name", "pos"}
    assert dv.count() == 2
    for r in dv.collect():
        assert r.file_name in set(c.files)  # table-relative live paths
        assert r.pos >= 0


def test_describe_detail_num_rows_subtracts_live_dvs(spark, tmp_path):
    """detail()'s num_rows must honor live deletion vectors via the
    same sidecar semi-join metadata_agg uses — the raw footer sum
    would overcount deleted rows (ADVICE r6)."""
    t = _make(spark, tmp_path)
    assert t.detail()["num_rows"] == 5
    t.delete(_keys(spark, 2, 4))
    assert t._commit(None).dv_files  # DVs live, base files untouched
    assert t.detail()["num_rows"] == 3


def test_describe_detail_num_rows_none_with_mor_logs(spark, tmp_path):
    """Unmerged MoR log rows aren't in the footer counts — num_rows
    must be None (absent beats wrong), and recover after compaction."""
    t = _make(spark, tmp_path, table_type="mor")
    t.upsert(_base(spark).limit(2).withColumn("ts", F.col("ts") + 1))
    assert t._commit(None).log_files
    assert t.detail()["num_rows"] is None
    t.compact()
    assert t.detail()["num_rows"] == 5
