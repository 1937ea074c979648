"""Idempotent-writer transactions (Delta SetTransaction /
txnAppId+txnVersion) and timestamp time travel (TIMESTAMP AS OF)."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _make(spark, tmp_path, **kw):
    df = spark.createDataFrame(
        [(1, "a", 10, 100), (2, "b", 20, 100)],
        "k long, name string, v long, ts long",
    )
    return LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts",
        **kw,
    )


def _batch(spark, k, v, ts):
    return spark.createDataFrame(
        [(k, "x", v, ts)], "k long, name string, v long, ts long"
    )


def test_replayed_txn_is_noop(spark, tmp_path):
    t = _make(spark, tmp_path)
    c1 = t.upsert(_batch(spark, 1, 11, 200), txn_app_id="app", txn_version=0)
    assert c1.version == 1 and c1.txn == {"app": 0}
    # crash-replay of the same micro-batch: no new commit, no change
    c2 = t.upsert(_batch(spark, 1, 99, 300), txn_app_id="app", txn_version=0)
    assert c2.version == 1
    assert t.read().filter("k = 1").collect()[0].v == 11


def test_next_txn_version_applies(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.upsert(_batch(spark, 1, 11, 200), txn_app_id="app", txn_version=0)
    c = t.upsert(_batch(spark, 1, 12, 300), txn_app_id="app", txn_version=1)
    assert c.version == 2 and c.txn == {"app": 1}
    assert t.read().filter("k = 1").collect()[0].v == 12


def test_apps_are_independent(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.upsert(_batch(spark, 1, 11, 200), txn_app_id="a1", txn_version=5)
    c = t.upsert(_batch(spark, 2, 22, 300), txn_app_id="a2", txn_version=0)
    assert c.txn == {"a1": 5, "a2": 0}


def test_watermark_survives_maintenance(spark, tmp_path):
    """Compaction/optimize/delete/restore carry writer watermarks — a
    replay after table maintenance still no-ops."""
    t = _make(spark, tmp_path, table_type="mor")
    t.upsert(_batch(spark, 1, 11, 200), txn_app_id="app", txn_version=3)
    t.compact()
    t.optimize(target_files=1)
    t.delete(spark.createDataFrame([(2,)], "k long"))
    replay = t.upsert(
        _batch(spark, 1, 99, 999), txn_app_id="app", txn_version=3
    )
    assert replay.version == t._commit(None).version  # no-op
    assert t.read().filter("k = 1").collect()[0].v == 11


def test_untracked_upserts_unaffected(spark, tmp_path):
    t = _make(spark, tmp_path)
    t.upsert(_batch(spark, 1, 11, 200))
    c = t.upsert(_batch(spark, 1, 12, 300))
    assert c.version == 2  # no txn ids -> every call commits


def test_version_as_of_instant(spark, tmp_path):
    t = _make(spark, tmp_path)
    v0_time = t._commit(None).commit_time
    t.upsert(_batch(spark, 1, 11, 200))
    v1_time = t._commit(None).commit_time
    assert t.version_as_of(v0_time) == 0
    assert t.version_as_of(v1_time) == 1
    assert t.version_as_of("9999") == 1  # far future -> latest
    assert t.read(version=t.version_as_of(v0_time)).filter(
        "k = 1"
    ).collect()[0].v == 10
    with pytest.raises(ValueError, match="no commit"):
        t.version_as_of("1999")
