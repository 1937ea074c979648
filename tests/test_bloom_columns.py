"""Column-level bloom filter indexes (Delta ``delta.bloomFilter.enabled``
on arbitrary data columns): per-file 8 KiB blooms on columns named in
``bloom_columns``, probed by ``read_where``'s EQUALITY path to skip
files the stats tier can't (key-clustered tables where every file spans
most of the indexed column's range). Each bloom records the xxhash64'd
TYPE beside the bitmap so probes stay exact across type widening."""

from __future__ import annotations

import pyspark.sql.functions as F

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _make(spark, tmp_path, **kw):
    rows = [(i, (i * 7919) % 400, float(i), 100) for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, cust long, v double, ts long")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], precombine="ts", bloom_columns=["cust"], **kw,
    )
    t.optimize(target_files=16, cluster_by=["k"])
    return t


def test_equality_read_prunes_and_stays_exact(spark, tmp_path):
    t = _make(spark, tmp_path)
    out = t.read_where("cust", 123, 123)
    got = sorted(r.k for r in out.collect())
    want = sorted(
        r.k for r in t.read().filter(F.col("cust") == 123).collect()
    )
    assert got == want and got
    assert 0 < len(out.inputFiles()) < len(t._commit(None).files)


def test_range_read_ignores_bloom_tier(spark, tmp_path):
    t = _make(spark, tmp_path)
    out = t.read_where("cust", 100, 200)
    got = sorted(r.k for r in out.collect())
    want = sorted(
        r.k
        for r in t.read().filter(F.col("cust").between(100, 200)).collect()
    )
    assert got == want


def test_upsert_builds_new_blooms_and_carries_old(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.upsert(
        spark.createDataFrame(
            [(5000, 123, 1.0, 200)], "k long, cust long, v double, ts long"
        )
    )
    c = t._commit(None)
    assert all("cust" in c.column_blooms.get(f, {}) for f in c.files)
    out = t.read_where("cust", 123, 123)
    got = sorted(r.k for r in out.collect())
    want = sorted(
        r.k for r in t.read().filter(F.col("cust") == 123).collect()
    )
    assert got == want and 5000 in got


def test_probe_survives_type_widening(spark, tmp_path):
    df = spark.createDataFrame(
        [(i, i % 97, 100) for i in range(1000)], "k long, c int, ts long"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], precombine="ts", bloom_columns=["c"],
    )
    # widen c: int -> bigint; legacy files keep int-typed blooms, the
    # new file gets a bigint-typed one — probes replay per type
    t.upsert(
        spark.createDataFrame(
            [(9000, 2**40, 200)], "k long, c bigint, ts long"
        )
    )
    got = sorted(r.k for r in t.read_where("c", 42, 42).collect())
    want = sorted(r.k for r in t.read().filter(F.col("c") == 42).collect())
    assert got == want and got
    wide = t.read_where("c", 2**40, 2**40)
    assert [r.k for r in wide.collect()] == [9000]
    # the wide probe reads only the file(s) whose bloom claims the value
    assert len(wide.inputFiles()) < len(t._commit(None).files)


def test_compact_and_clone_keep_column_blooms(spark, tmp_path):
    t = _make(spark, tmp_path, table_type="mor")
    t.upsert(
        spark.createDataFrame(
            [(1, 999, 1.0, 200)], "k long, cust long, v double, ts long"
        )
    )
    t.compact()
    c = t._commit(None)
    assert c.files and all(
        "cust" in c.column_blooms.get(f, {}) for f in c.files
    )
    clone = LakehouseTable.clone(spark, str(tmp_path / "t"),
                                 str(tmp_path / "c"))
    cc = clone._commit(None)
    assert len(cc.column_blooms) == len(c.column_blooms)
