"""Column mapping (Delta columnMapping.mode=name): RENAME COLUMN is a
metadata-only commit; reads translate physical->logical per version,
writes accept logical names, and no data file is ever rewritten."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable

SCHEMA = "k long, region string, v long, ts long"


def _make(spark, tmp_path, **kw):
    df = spark.createDataFrame(
        [(1, "a", 10, 100), (2, "b", 20, 100)], SCHEMA
    )
    return LakehouseTable.create(
        spark, str(tmp_path / "cm"), df,
        key_cols=["k"], precombine="ts", **kw,
    )


def test_rename_is_metadata_only(spark, tmp_path):
    t = _make(spark, tmp_path)
    before = t._commit(None).files
    c = t.rename_column("v", "amount")
    assert c.files == before and c.action == "rename"
    got = {r.k: r.amount for r in t.read().select("k", "amount").collect()}
    assert got == {1: 10, 2: 20}
    assert "v" not in t.read().columns


def test_time_travel_sees_old_name(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("v", "amount")
    assert "v" in t.read(version=0).columns
    assert "amount" in t.read().columns


def test_upsert_with_new_name_merges_old_files(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("v", "amount")
    t.upsert(
        spark.createDataFrame(
            [(1, "a", 11, 200), (3, "c", 30, 200)],
            "k long, region string, amount long, ts long",
        )
    )
    got = {r.k: r.amount for r in t.read().select("k", "amount").collect()}
    assert got == {1: 11, 2: 20, 3: 30}


def test_double_rename_chains(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("v", "amount")
    t.rename_column("amount", "price")
    assert {r.k: r.price for r in t.read().select("k", "price").collect()} \
        == {1: 10, 2: 20}
    # rename back to the physical name clears the mapping entry
    t.rename_column("price", "v")
    assert t._commit(None).column_mapping == {}


def test_rename_key_column_delete_by_logical_name(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("k", "id")
    t.delete(spark.createDataFrame([(2,)], "id long"))
    assert {r.id for r in t.read().select("id").collect()} == {1}


def test_read_where_on_renamed_column(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("v", "amount")
    got = {r.k for r in t.read_where("amount", lo=15).collect()}
    assert got == {2}


def test_rename_rejects_collision_and_missing(spark, tmp_path):
    t = _make(spark, tmp_path)
    with pytest.raises(ValueError, match="already in use"):
        t.rename_column("v", "region")
    with pytest.raises(ValueError, match="no such column"):
        t.rename_column("nope", "x")


def test_optimize_preserves_logical_view(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("v", "amount")
    t.optimize(target_files=1, cluster_by=["amount"])  # logical name OK
    got = {r.k: r.amount for r in t.read().select("k", "amount").collect()}
    assert got == {1: 10, 2: 20}


def test_restore_restores_schema(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.rename_column("v", "amount")  # v1
    t.restore(0)
    assert "v" in t.read().columns and "amount" not in t.read().columns


def test_mor_rt_with_rename(spark, tmp_path):
    df = spark.createDataFrame([(1, "a", 10, 100)], SCHEMA)
    t = LakehouseTable.create(
        spark, str(tmp_path / "mor_cm"), df,
        key_cols=["k"], precombine="ts", table_type="mor",
    )
    t.rename_column("v", "amount")
    t.upsert(
        spark.createDataFrame(
            [(1, "a", 11, 200)], "k long, region string, amount long, ts long"
        )
    )
    assert t.read_rt().select("amount").collect()[0].amount == 11
    t.compact()
    assert t.read().select("amount").collect()[0].amount == 11


def test_cdf_reads_logical_names(spark, tmp_path):
    t = _make(spark, tmp_path, cdc_enabled=True)
    t.rename_column("v", "amount")
    t.upsert(
        spark.createDataFrame(
            [(1, "a", 11, 200)], "k long, region string, amount long, ts long"
        )
    )
    ch = t.read_changes(2, 2)
    assert "amount" in ch.columns and "v" not in ch.columns


def test_drop_column_metadata_only(spark, tmp_path):
    """DROP COLUMN: metadata-only — the column disappears from reads
    with zero files rewritten; time travel shows it; RESTORE brings it
    back; a batch re-carrying the dropped name is refused."""
    df = spark.createDataFrame(
        [(1, "a", 10, 1), (2, "b", 20, 1)],
        "pk_id int, name string, value int, sq int",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"], precombine="sq"
    )
    v0_files = list(t._commit(None).files)
    c = t.drop_column("name")
    assert c.action == "drop_column"
    assert c.files == v0_files  # zero files touched
    assert "name" not in t.read().columns
    assert set(t.read().columns) >= {"pk_id", "value", "sq"}
    # time travel to the pre-drop version still reads it
    assert "name" in t.read(version=0).columns
    # upserts without the column work; with it, refused
    t.upsert(spark.createDataFrame([(3, 30, 2)], "pk_id int, value int, sq int"))
    assert {r.pk_id for r in t.read().collect()} == {1, 2, 3}
    bad = spark.createDataFrame(
        [(4, "zombie", 40, 2)], "pk_id int, name string, value int, sq int"
    )
    with pytest.raises(ValueError, match="was dropped"):
        t.upsert(bad)
    # RESTORE restores data AND schema
    t.restore(0)
    assert "name" in t.read().columns
    assert {r.name for r in t.read().collect()} == {"a", "b"}


def test_drop_column_protections(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "A", 10, 1)], "pk_id int, part string, value int, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"],
        precombine="sq", partition_by="part",
        constraints={"v_pos": "value >= 0"},
    )
    for col in ("pk_id", "part", "sq"):
        with pytest.raises(ValueError, match="cannot drop"):
            t.drop_column(col)
    with pytest.raises(ValueError, match="constraint"):
        t.drop_column("value")
    with pytest.raises(ValueError, match="no such column"):
        t.drop_column("ghost")


def test_drop_after_rename_chain(spark, tmp_path):
    """rename then drop the renamed column: the tombstone lands on the
    PHYSICAL name, so neither the new nor the old logical name can
    resurrect the data."""
    df = spark.createDataFrame(
        [(1, "a", 1)], "pk_id int, label string, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"], precombine="sq"
    )
    t.rename_column("label", "tag")
    t.drop_column("tag")
    assert "tag" not in t.read().columns and "label" not in t.read().columns
    bad = spark.createDataFrame([(2, "x", 2)], "pk_id int, label string, sq int")
    with pytest.raises(ValueError, match="was dropped"):
        t.upsert(bad)


def test_permutation_rename_chain(spark, tmp_path):
    """Renames that PERMUTE names — v->metric, then sq->v, so logical
    'v' now denotes the old sq column — must keep reads and writes
    correct (simultaneous mapping; sequential withColumnRenamed would
    collide on the intermediate duplicate)."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame(
        [(1, 10, 100), (2, 20, 200)], "k int, v int, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.rename_column("v", "metric")
    t.rename_column("sq", "v")
    got = {r.k: (r.metric, r.v) for r in t.read().collect()}
    assert got == {1: (10, 100), 2: (20, 200)}
    # write under the NEW logical names routes to the right physicals
    t.upsert(
        spark.createDataFrame([(1, 11, 101)], "k int, metric int, v int")
    )
    got = {r.k: (r.metric, r.v) for r in t.read().collect()}
    assert got == {1: (11, 101), 2: (20, 200)}
    # time travel shows the original names and values
    v0 = {r.k: (r.v, r.sq) for r in t.read(version=0).collect()}
    assert v0 == {1: (10, 100), 2: (20, 200)}
