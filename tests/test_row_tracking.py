"""Delta row tracking: _row_id is born unique, survives UPDATE (the
logical row keeps its identity), survives file re-orgs, and is refused
where its semantics can't hold (MoR)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.tables import LakehouseTable


@pytest.fixture()
def tracked(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(300)
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "t"),
        ev,
        key_cols=["event_id"],
        row_tracking=True,
    )
    return t, ev


def _ids(t):
    return {r.event_id: r.rid for r in
            t.read().select("event_id", F.col("_row_id").alias("rid")).collect()}


def test_ids_unique_at_birth(tracked):
    t, _ = tracked
    ids = _ids(t)
    assert len(set(ids.values())) == len(ids)


def test_update_preserves_ids_inserts_get_fresh(spark, tracked):
    t, ev = tracked
    before = _ids(t)
    updates = ev.limit(60).withColumn("value", F.col("value") + 1)
    inserts = ev.withColumn(
        "event_id", F.col("event_id") + 1_000_000
    ).limit(10)
    t.upsert(updates.unionByName(inserts))
    after = _ids(t)
    updated_keys = {r.event_id for r in updates.select("event_id").collect()}
    assert all(after[k] == before[k] for k in updated_keys)
    assert all(after[k] == v for k, v in before.items() if k not in updated_keys)
    fresh = {after[k] for k in after if k not in before}
    assert len(fresh) == 10 and fresh.isdisjoint(set(before.values()))
    # values actually changed: identity is stable, content is not
    changed = t.read().filter(F.col("event_id").isin(list(updated_keys)))
    orig = {r.event_id: r.value for r in ev.limit(60).collect()}
    assert all(r.value == orig[r.event_id] + 1 for r in changed.collect())


def test_optimize_and_restore_preserve_ids(spark, tracked):
    t, ev = tracked
    t.upsert(ev.limit(40).withColumn("value", F.col("value") + 1))
    before = _ids(t)
    t.optimize()
    assert _ids(t) == before
    t.restore(1)  # back to the post-upsert version
    assert _ids(t) == before


def test_mor_refused(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").limit(20)
    with pytest.raises(ValueError, match="copy-on-write"):
        LakehouseTable.create(
            spark,
            str(tmp_path / "t"),
            ev,
            key_cols=["event_id"],
            table_type="mor",
            row_tracking=True,
        )


def test_cdf_post_images_carry_stable_ids(spark, sf_dir, tmp_path):
    """The CDF consumer sees the SAME _row_id on update pre and post
    images — the row-lineage contract row tracking exists for."""
    ev = load_table(spark, sf_dir, "events").limit(100)
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "t"),
        ev,
        key_cols=["event_id"],
        row_tracking=True,
        cdc_enabled=True,
    )
    t.upsert(ev.limit(30).withColumn("value", F.col("value") + 1))
    ch = t.read_changes(1, 1).select("event_id", "_row_id", "_change_type")
    pre = {r.event_id: r._row_id for r in
           ch.filter(F.col("_change_type") == "update_preimage").collect()}
    post = {r.event_id: r._row_id for r in
            ch.filter(F.col("_change_type") == "update_postimage").collect()}
    assert pre and pre == post
