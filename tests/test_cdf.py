"""Change data feed (Delta CDF semantics on the manifest) and the
incremental aggregate maintenance it enables."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.operators.incremental import (
    agg_delta,
    apply_delta,
)
from hudi_and_delta_showcase_spark.tables import LakehouseTable

SCHEMA = "k long, grp string, v long, ts long"


def _make(spark, tmp_path, **kw):
    df = spark.createDataFrame(
        [(1, "a", 10, 100), (2, "a", 20, 100), (3, "b", 30, 100)], SCHEMA
    )
    return LakehouseTable.create(
        spark, str(tmp_path / "cdf"), df,
        key_cols=["k"], precombine="ts", cdc_enabled=True, **kw,
    )


def _changes(t, v):
    return {
        (r.k, r._change_type)
        for r in t.read_changes(v, v).select("k", "_change_type").collect()
    }


def test_upsert_classifies_changes(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.upsert(
        spark.createDataFrame([(2, "a", 21, 200), (4, "c", 40, 200)], SCHEMA)
    )
    assert _changes(t, 0) == {(1, "insert"), (2, "insert"), (3, "insert")}
    assert _changes(t, 1) == {
        (2, "update_preimage"), (2, "update_postimage"), (4, "insert"),
    }
    pre = t.read_changes(1, 1).filter(
        "_change_type = 'update_preimage'"
    ).collect()[0]
    assert pre.v == 20 and pre._commit_version == 1


def test_delete_writes_preimages(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(spark.createDataFrame([(1,), (3,)], "k long"))
    assert _changes(t, 1) == {(1, "delete"), (3, "delete")}


def test_dv_delete_also_feeds_cdf(spark, tmp_path):
    t = _make(spark, tmp_path, deletion_vectors=True)
    c = t.delete(spark.createDataFrame([(2,)], "k long"))
    assert c.stats["rewritten_files"] == 0  # DV path taken
    assert _changes(t, 1) == {(2, "delete")}


def test_mor_cdf_classifies_changes(spark, tmp_path):
    """r6: CDF on merge-on-read — pre-images resolve through the
    key-pruned _rt view at write time (Hudi hoodie.table.cdc.enabled
    semantics), so a log-append upsert still emits exact
    pre/post/insert classification."""
    t = _make(spark, tmp_path, table_type="mor")
    t.upsert(
        spark.createDataFrame([(2, "a", 21, 200), (4, "c", 40, 200)], SCHEMA)
    )
    assert _changes(t, 1) == {
        (2, "update_preimage"), (2, "update_postimage"), (4, "insert"),
    }
    pre = t.read_changes(1, 1).filter(
        "_change_type = 'update_preimage'"
    ).collect()[0]
    assert pre.v == 20 and pre._commit_version == 1
    # second upsert: the pre-image must be the RT-RESOLVED latest value
    # (the log row from v1, not the stale base row)
    t.upsert(spark.createDataFrame([(2, "a", 22, 300)], SCHEMA))
    pre2 = t.read_changes(2, 2).filter(
        "_change_type = 'update_preimage'"
    ).collect()[0]
    assert pre2.v == 21
    # compaction is a file re-org: no change rows
    t.compact()
    with pytest.raises(ValueError, match="no change files"):
        t.read_changes(3, 3)


def test_mor_cdf_equals_cow_cdf(spark, tmp_path):
    """The same upsert sequence must produce identical change feeds on
    CoW and MoR tables (storage discipline is a physical choice, CDF is
    a logical contract)."""
    batches = [
        [(2, "a", 21, 200), (4, "c", 40, 200)],
        [(4, "c", 41, 300), (5, "d", 50, 300)],
    ]
    feeds = {}
    for kind in ("cow", "mor"):
        t = _make(spark, tmp_path / kind, table_type=kind)
        for b in batches:
            t.upsert(spark.createDataFrame(b, SCHEMA))
        feeds[kind] = sorted(
            (r._commit_version, r.k, r._change_type, r.v)
            for r in t.read_changes(0).select(
                "_commit_version", "k", "_change_type", "v"
            ).collect()
        )
    assert feeds["cow"] == feeds["mor"]


def test_reorg_commits_emit_nothing(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.optimize(target_files=1)
    with pytest.raises(ValueError, match="no change files"):
        t.read_changes(1, 1)


def test_incremental_agg_equals_recompute(spark, tmp_path):
    """The retraction-maintained aggregate must EXACTLY equal a
    from-scratch groupBy over the final state, across inserts, group
    moves, and deletes."""
    import pyspark.sql.functions as F

    t = _make(spark, tmp_path)
    t.upsert(
        spark.createDataFrame(
            [(2, "b", 21, 200), (4, "c", 40, 200)], SCHEMA
        )  # k=2 MOVES group a->b
    )
    t.delete(spark.createDataFrame([(3,)], "k long"))
    gold = None
    for v in range(t._commit(None).version + 1):
        try:
            changes = t.read_changes(v, v)
        except ValueError:
            continue
        gold = apply_delta(
            gold, agg_delta(changes, ["grp"], ["v"]), ["grp"], ["v"]
        )
    got = {
        r.grp: (r.n, float(r.sum_v)) for r in gold.collect()
    }
    full = {
        r.grp: (r.n, float(r.s))
        for r in t.read()
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(32,6)")).alias("s"),
        )
        .collect()
    }
    assert got == full == {"a": (1, 10.0), "b": (1, 21.0), "c": (1, 40.0)}


def test_empty_group_drops_out(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.delete(spark.createDataFrame([(3,)], "k long"))  # group b empties
    gold = None
    for v in (0, 1):
        gold = apply_delta(
            gold,
            agg_delta(t.read_changes(v, v), ["grp"], ["v"]),
            ["grp"],
            ["v"],
        )
    assert {r.grp for r in gold.collect()} == {"a"}
