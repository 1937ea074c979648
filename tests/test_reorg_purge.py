"""REORG ... APPLY (PURGE): DV-density-targeted rewrite — only files
whose deleted fraction crossed the threshold rewrite; sparse files and
their live vectors carry over untouched."""

from __future__ import annotations

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _t(spark, path):
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(40)], "k int, v string"
    ).coalesce(2)
    return LakehouseTable.create(
        spark, path, df, key_cols=["k"], deletion_vectors=True
    )


def _keys(t):
    return sorted(r.k for r in t.read().select("k").collect())


def test_purge_rewrites_only_dense_files(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    # one file holds 0..19, the other 20..39: kill 15/20 of the first,
    # 1/20 of the second
    dense = [(k,) for k in range(15)]
    t.delete(spark.createDataFrame(dense + [(25,)], "k int"))
    before = t._commit(None)
    want = _keys(t)

    c = t.reorg_purge(min_deleted_ratio=0.5)
    assert c is not None
    assert c.stats["purged_files"] == 1
    assert c.stats["carried_over_files"] == 1
    assert c.stats["purged_dv_rows"] == 15
    # the sparse file keeps its live vector; the dense one shed its
    assert c.dv_files and c.dv_files != before.dv_files
    assert _keys(t) == want
    # the carried file is byte-identical (same relative path)
    assert len(set(before.files) & set(c.files)) == 1
    # below threshold now: purge is a no-op, no commit
    assert t.reorg_purge(min_deleted_ratio=0.5) is None
    assert t._commit(None).version == c.version

    # time travel below the purge still serves the DV view
    assert sorted(
        r.k for r in t.read(version=before.version).select("k").collect()
    ) == want


def test_purge_to_zero_drops_all_sidecars(spark, tmp_path):
    t = _t(spark, str(tmp_path / "t"))
    t.delete(spark.createDataFrame([(1,), (2,), (21,)], "k int"))
    c = t.reorg_purge(min_deleted_ratio=0.01)
    assert c is not None and c.dv_files == []
    assert c.stats["purged_files"] == 2
    assert _keys(t) == [k for k in range(40) if k not in (1, 2, 21)]
    # further deletes go back on the DV discipline
    c2 = t.delete(spark.createDataFrame([(30,)], "k int"))
    assert c2.dv_files and c2.files == c.files


def test_reorg_purge_sql_statement(spark, tmp_path):
    """The Delta dialect form: REORG TABLE t APPLY (PURGE)."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    t = _t(spark, str(tmp_path / "t"))
    t.delete(spark.createDataFrame([(k,) for k in range(12)], "k int"))
    out = execute_ddl(spark, "REORG TABLE ev APPLY (PURGE)", {"ev": t})
    assert out["statement"] == "reorg_purge"
    assert out["purged_files"] == 1 and out["version"] == 2
    assert _keys(t) == list(range(12, 40))
    # idempotent at the SQL surface too
    out2 = execute_ddl(spark, "reorg table ev apply (purge)", {"ev": t})
    assert out2["version"] is None and out2["purged_files"] == 0


def test_purge_mor_table_with_live_logs(spark, tmp_path):
    """On a MoR table, purge rewrites only DV-dense BASE files; log
    records land on the realtime view unchanged (the merge resolves by
    key, not by file), so purging never disturbs unfolded upserts."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(20)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], table_type="mor", deletion_vectors=True,
    )
    # delete on MoR compacts first, then records DVs on the new base
    t.delete(spark.createDataFrame([(k,) for k in range(10)], "k int"))
    # fresh log-borne upserts on top of the DV state
    t.upsert(spark.createDataFrame([(15, "vX"), (30, "new")],
                                   "k int, v string"))
    before = sorted(
        (r.k, r.v) for r in t.read().select("k", "v").collect()
    )
    c = t.reorg_purge(min_deleted_ratio=0.3)
    assert c is not None and c.dv_files == []
    assert c.log_files, "unfolded logs must carry through the purge"
    after = sorted(
        (r.k, r.v) for r in t.read().select("k", "v").collect()
    )
    assert after == before
    assert (15, "vX") in after and (30, "new") in after
    assert all(k >= 10 for k, _v in after)
