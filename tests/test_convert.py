"""In-place CONVERT (Delta CONVERT TO DELTA / Hudi METADATA_ONLY
bootstrap): adopt an existing parquet directory as a lakehouse table
without copying data; meta columns derive at scan time."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _plain_seed(spark, path):
    df = spark.createDataFrame(
        [
            (1, 10, 100), (2, 20, 100),
            (2, 21, 101),             # duplicate key: adopted AS-IS
            (3, 30, 100),
        ],
        "k int, v int, sq int",
    )
    df.coalesce(2).write.parquet(path)
    return df


def test_convert_adopts_files_in_place(spark, tmp_path):
    path = str(tmp_path / "t")
    _plain_seed(spark, path)
    before = sorted(
        f for f in os.listdir(path) if f.endswith(".parquet")
    )
    t = LakehouseTable.convert(
        spark, path, key_cols=["k"], precombine="sq"
    )
    c0 = t._commit(None)
    assert c0.action == "convert" and len(c0.files) == len(before)
    # files untouched: same names, nothing rewritten or copied
    after = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
    assert after == before
    # duplicates adopted as-is (convert never dedups, like Delta)
    assert t.read().count() == 4
    # column stats harvested at convert -> data skipping live
    assert any("v" in cols for cols in c0.col_stats.values())


def test_convert_scan_time_meta_and_point_lookup(spark, tmp_path):
    path = str(tmp_path / "t")
    _plain_seed(spark, path)
    t = LakehouseTable.convert(spark, path, key_cols=["k"], precombine="sq")
    # the physical frame exposes derived meta columns
    phys = t._read_physical()
    row = phys.filter(F.col("k") == 1).select("_hoodie_record_key").first()
    assert row[0] == "1"
    # point-lookup path (filters on _hoodie_record_key) works
    got = sorted(r.k for r in t.read_for_keys(["1", "3"]).collect())
    assert got == [1, 3]


def test_convert_then_upsert_rewrites_and_stamps(spark, tmp_path):
    path = str(tmp_path / "t")
    _plain_seed(spark, path)
    t = LakehouseTable.convert(
        spark, path, key_cols=["k"], precombine="sq"
    )
    t.upsert(spark.createDataFrame([(2, 99, 200)], "k int, v int, sq int"))
    # the duplicate k=2 rows are BOTH replaced by the upsert
    got = {r.k: r.v for r in t.read().collect()}
    assert got == {1: 10, 2: 99, 3: 30}
    # time travel back to the converted snapshot
    assert t.read(version=0).count() == 4
    # rewritten files carry REAL meta columns now; survivors of the
    # rewrite resolve identically either way
    assert t.read_for_keys(["2"]).first().v == 99


def test_convert_refuses_tables_and_hive_layouts(spark, tmp_path):
    path = str(tmp_path / "t")
    _plain_seed(spark, path)
    LakehouseTable.convert(spark, path, key_cols=["k"], precombine="sq")
    with pytest.raises(FileExistsError):
        LakehouseTable.convert(spark, path, key_cols=["k"])
    hive = str(tmp_path / "h")
    spark.createDataFrame([(1, "a")], "k int, p string").write.partitionBy(
        "p"
    ).parquet(hive)
    with pytest.raises(ValueError, match="hive-partitioned"):
        LakehouseTable.convert(spark, hive, key_cols=["k"])
    with pytest.raises(FileNotFoundError):
        LakehouseTable.convert(
            spark, str(tmp_path / "empty"), key_cols=["k"]
        )


def test_convert_mor_upsert_merges_logs(spark, tmp_path):
    path = str(tmp_path / "t")
    _plain_seed(spark, path)
    t = LakehouseTable.convert(
        spark, path, key_cols=["k"], precombine="sq", table_type="mor"
    )
    t.upsert(spark.createDataFrame([(3, 77, 200)], "k int, v int, sq int"))
    # rt view merges the log over the converted base (commit order wins)
    got = {r.k: r.v for r in t.read_rt().filter(F.col("k") == 3).collect()}
    assert got == {3: 77}
    # ro view still serves the converted base
    assert t.read_ro().filter(F.col("k") == 3).first().v == 30
