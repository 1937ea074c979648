"""Global-index upsert semantics (Hudi GLOBAL_BLOOM with
``hoodie.bloom.index.update.partition.path=true``): a record key is unique
across the WHOLE table, so an upsert whose partition value changed
RELOCATES the row — old partition's copy removed, new partition's copy
written — where the default non-global index (partition-scoped keys,
documented in lakehouse.py) keeps both. Covers CoW, MoR `_rt` + compact,
and keys-only delete."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10, 100), (2, "a", 20, 100), (3, "b", 30, 100)],
        "k long, region string, v long, ts long",
    )


def _move(spark):
    # key 1 moves region a -> b with a newer precombine ts
    return spark.createDataFrame(
        [(1, "b", 11, 200)], "k long, region string, v long, ts long"
    )


def _rows(df):
    return {(r.k, r.region, r.v) for r in df.select("k", "region", "v").collect()}


def test_cow_global_relocates_partition_change(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "g"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
        global_index=True,
    )
    t.upsert(_move(spark))
    got = _rows(t.read())
    assert got == {(1, "b", 11), (2, "a", 20), (3, "b", 30)}
    # exactly one physical copy: the old region=a row was anti-joined out
    assert t.read().filter(F.col("k") == 1).count() == 1


def test_cow_non_global_keeps_both_rows(spark, tmp_path):
    """Contrast: the default non-global index treats (k, region) as the
    identity, so the moved key becomes a second row — Hudi-faithful."""
    t = LakehouseTable.create(
        spark, str(tmp_path / "ng"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
    )
    t.upsert(_move(spark))
    got = _rows(t.read())
    assert got == {(1, "a", 10), (1, "b", 11), (2, "a", 20), (3, "b", 30)}


def test_mor_global_relocates_in_rt_and_after_compact(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "m"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
        table_type="mor", global_index=True,
    )
    t.upsert(_move(spark))
    want = {(1, "b", 11), (2, "a", 20), (3, "b", 30)}
    assert _rows(t.read_rt()) == want  # log merge resolves table-wide
    t.compact()
    assert _rows(t.read_ro()) == want  # materialized relocation


def test_global_delete_by_key_only(spark, tmp_path):
    """Global index deletes take bare keys — no partition column needed
    (the row is found wherever it lives)."""
    t = LakehouseTable.create(
        spark, str(tmp_path / "d"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
        global_index=True,
    )
    t.delete(spark.createDataFrame([(3,)], "k long"))
    assert _rows(t.read()) == {(1, "a", 10), (2, "a", 20)}


def test_global_reload_preserves_flag(spark, tmp_path):
    LakehouseTable.create(
        spark, str(tmp_path / "p"), _base(spark),
        key_cols=["k"], precombine="ts", partition_by="region",
        global_index=True,
    )
    t2 = LakehouseTable.load(spark, str(tmp_path / "p"))
    assert t2.global_index is True
    t2.upsert(_move(spark))
    assert _rows(t2.read()) == {(1, "b", 11), (2, "a", 20), (3, "b", 30)}
