"""Delta-join incremental view maintenance (join_view_apply)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hudi_and_delta_showcase_spark.operators.incremental import (
    join_view_apply,
)
from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _df(spark, rows, schema):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema
    )


def _setup(spark, tmp_path):
    fact = LakehouseTable.create(
        spark, str(tmp_path / "fact"),
        _df(spark, [(1, 10, 100, 1), (2, 20, 200, 1), (3, 10, 300, 1)],
            "eid int, uid int, v int, sq int"),
        key_cols=["eid"], precombine="sq", cdc_enabled=True,
    )
    dim = LakehouseTable.create(
        spark, str(tmp_path / "dim"),
        _df(spark, [(10, "gold"), (20, "silver")], "uid int, tier string"),
        key_cols=["uid"], cdc_enabled=True,
    )
    view = LakehouseTable.create(
        spark, str(tmp_path / "view"),
        fact.read().select("eid", "uid", "v", "sq").join(
            dim.read().select(F.col("uid").alias("__dk"), "tier"),
            F.col("uid") == F.col("__dk"), "left",
        ).drop("__dk"),
        key_cols=["eid"], precombine="sq",
    )
    return fact, dim, view


def _state(view):
    return sorted(
        (r.eid, r.uid, r.v, r.tier)
        for r in view.read().select("eid", "uid", "v", "tier").collect()
    )


def test_fact_and_dim_changes_fold_in_one_apply(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    fv, dv = fact._commit(None).version, dim._commit(None).version
    fact.upsert(_df(spark, [(2, 20, 222, 2), (4, 20, 400, 2)],
                    "eid int, uid int, v int, sq int"))
    dim.upsert(_df(spark, [(10, "platinum")], "uid int, tier string"))
    join_view_apply(view, fact, dim, fk="uid", dim_key="uid",
                    dim_attrs=["tier"], fact_since=fv + 1,
                    dim_since=dv + 1)
    assert _state(view) == [
        (1, 10, 100, "platinum"),
        (2, 20, 222, "silver"),
        (3, 10, 300, "platinum"),
        (4, 20, 400, "silver"),
    ]


def test_fact_delete_removes_view_rows(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    fv, dv = fact._commit(None).version, dim._commit(None).version
    fact.delete(_df(spark, [(2,)], "eid int"))
    join_view_apply(view, fact, dim, fk="uid", dim_key="uid",
                    dim_attrs=["tier"], fact_since=fv + 1,
                    dim_since=dv + 1)
    assert [e for e, *_ in _state(view)] == [1, 3]


def test_dim_delete_nulls_attrs(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    fv, dv = fact._commit(None).version, dim._commit(None).version
    dim.delete(_df(spark, [(10,)], "uid int"))
    join_view_apply(view, fact, dim, fk="uid", dim_key="uid",
                    dim_attrs=["tier"], fact_since=fv + 1,
                    dim_since=dv + 1)
    assert _state(view) == [
        (1, 10, 100, None),
        (2, 20, 200, "silver"),
        (3, 10, 300, None),
    ]


def test_no_changes_is_a_no_op(spark, tmp_path):
    fact, dim, view = _setup(spark, tmp_path)
    fv, dv = fact._commit(None).version, dim._commit(None).version
    v_before = view._commit(None).version
    out = join_view_apply(view, fact, dim, fk="uid", dim_key="uid",
                          dim_attrs=["tier"], fact_since=fv + 1,
                          dim_since=dv + 1)
    assert out is None
    assert view._commit(None).version == v_before

def test_delete_then_reinsert_in_one_window_survives(spark, tmp_path):
    """A fact key deleted THEN re-inserted within the consumed feed
    range must end up present in the view: the delete is older than
    the re-insert, so applying it after the upsert would silently
    diverge the view from the fact table (ADVICE r6)."""
    fact, dim, view = _setup(spark, tmp_path)
    fv, dv = fact._commit(None).version, dim._commit(None).version
    fact.delete(_df(spark, [(2,)], "eid int"))
    fact.upsert(_df(spark, [(2, 20, 999, 2)],
                    "eid int, uid int, v int, sq int"))
    join_view_apply(view, fact, dim, fk="uid", dim_key="uid",
                    dim_attrs=["tier"], fact_since=fv + 1,
                    dim_since=dv + 1)
    assert _state(view) == [
        (1, 10, 100, "gold"),
        (2, 20, 999, "silver"),
        (3, 10, 300, "gold"),
    ]
    assert _state(view) == sorted(
        (r.eid, r.uid, r.v, r.tier)
        for r in fact.read().join(
            dim.read().select(F.col("uid").alias("__dk"), "tier"),
            F.col("uid") == F.col("__dk"), "left").drop("__dk")
        .select("eid", "uid", "v", "tier").collect()
    )


def test_upsert_then_delete_in_one_window_removes(spark, tmp_path):
    """The mirror case: updated then deleted within the window — the
    latest change is the delete, so the key must vanish."""
    fact, dim, view = _setup(spark, tmp_path)
    fv, dv = fact._commit(None).version, dim._commit(None).version
    fact.upsert(_df(spark, [(2, 20, 555, 2)],
                    "eid int, uid int, v int, sq int"))
    fact.delete(_df(spark, [(2,)], "eid int"))
    join_view_apply(view, fact, dim, fk="uid", dim_key="uid",
                    dim_attrs=["tier"], fact_since=fv + 1,
                    dim_since=dv + 1)
    assert [e for e, *_ in _state(view)] == [1, 3]
