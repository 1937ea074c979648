"""CONVERT FROM HOODIE: metadata-only adoption of a .hoodie timeline —
stale file slices excluded, MoR timelines refused."""

from __future__ import annotations

import os

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
    read_hoodie_table,
    write_hoodie_table,
)


def _rows(df):
    return sorted((r.k, r.v) for r in df.select("k", "v").collect())


def test_adopts_live_slices_not_stale_groups(spark, tmp_path):
    root = str(tmp_path / "ht")
    decoy = spark.createDataFrame([(9, "stale")], "k int, v string")
    live = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    write_hoodie_table(decoy.coalesce(1), root)
    write_hoodie_table(live.coalesce(1), root, mode="overwrite")
    assert _rows(read_hoodie_table(spark, root)) == [(1, "a"), (2, "b")]

    t = LakehouseTable.convert_hoodie(spark, root, key_cols=["k"])
    assert _rows(t.read()) == [(1, "a"), (2, "b")]
    assert t._commit(None).stats["source_format"] == "hoodie"
    # adopted table serves keyed upserts immediately
    t.upsert(spark.createDataFrame([(2, "b2"), (3, "c")], "k int, v string"))
    assert _rows(t.read()) == [(1, "a"), (2, "b2"), (3, "c")]


def test_refuses_mor_timeline(spark, tmp_path):
    root = str(tmp_path / "ht")
    write_hoodie_table(
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1), root
    )
    open(os.path.join(root, ".hoodie", "20240101000000000.deltacommit"), "w").close()
    with pytest.raises(RuntimeError, match="deltacommit"):
        LakehouseTable.convert_hoodie(spark, root, key_cols=["k"])


def test_refuses_double_adoption(spark, tmp_path):
    root = str(tmp_path / "ht")
    write_hoodie_table(
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1), root
    )
    LakehouseTable.convert_hoodie(spark, root, key_cols=["k"])
    with pytest.raises(FileExistsError):
        LakehouseTable.convert_hoodie(spark, root, key_cols=["k"])
