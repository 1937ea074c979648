"""FSCK REPAIR TABLE: dead manifest references are detected by listing,
dropped by an ordinary repair commit, and history stays intact."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables import manifest as mf


@pytest.fixture()
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").limit(400).cache()


def _vanish(table: LakehouseTable, rel: str) -> None:
    os.remove(os.path.join(table.path, rel))


def test_fsck_clean_table_is_noop(spark, events, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), events, key_cols=["event_id"]
    )
    report = t.fsck()
    assert report == {
        "missing": {
            "files": [],
            "log_files": [],
            "dv_files": [],
            "ri_files": [],
            "cdc_files": [],
        },
        "repaired": False,
    }
    assert t._commit(None).version == 0  # no empty repair commit


def test_fsck_repairs_vanished_base_file(spark, events, tmp_path):
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "t"),
        events.withColumn("pp", F.col("user_id") % 2),
        key_cols=["event_id"],
        partition_by="pp",
    )
    prev = t._commit(None)
    assert len(prev.files) >= 2
    victim = sorted(prev.files)[0]
    survivors = [f for f in prev.files if f != victim]
    _vanish(t, victim)

    # scan now fails at execution (the manifest still names the file)
    with pytest.raises(Exception):
        t.read().count()

    dry = t.fsck(dry_run=True)
    assert dry == {
        "missing": {
            "files": [victim],
            "log_files": [],
            "dv_files": [],
            "ri_files": [],
            "cdc_files": [],
        },
        "repaired": False,
    }
    assert t._commit(None).version == 0  # dry run commits nothing

    report = t.fsck()
    assert report["repaired"] is True
    cur = t._commit(None)
    assert cur.action == "fsck" and cur.version == 1
    assert sorted(cur.files) == sorted(survivors)
    # skipping indexes pruned with the file: metadata-only COUNT must
    # answer from surviving entries only
    assert victim not in cur.row_counts
    assert victim not in cur.key_ranges
    assert t.read().count() == sum(cur.row_counts[f] for f in cur.files)
    # history preserved: version 0 still names the dead file
    assert victim in mf.read_commit(t.path, 0).files


def test_fsck_repairs_vanished_mor_log(spark, events, tmp_path):
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "t"),
        events,
        key_cols=["event_id"],
        precombine="ts",
        table_type="mor",
    )
    t.upsert(events.limit(50).withColumn("value", F.col("value") + 1))
    prev = t._commit(None)
    assert prev.log_files
    _vanish(t, prev.log_files[0])
    report = t.fsck()
    assert report["missing"]["log_files"] == [prev.log_files[0]]
    assert t._commit(None).log_files == []
    # RO and RT views both serve again from base files alone
    assert t.read_ro().count() == t.read().count() == events.count()


def test_vacuum_distributed_remove_path(spark, events, tmp_path, monkeypatch):
    """Past the threshold, VACUUM deletes executor-side (pyarrow.fs) —
    the outcome must be identical to the serial driver loop."""
    from hudi_and_delta_showcase_spark.tables import lakehouse as lh

    monkeypatch.setattr(lh, "VACUUM_DISTRIBUTED_THRESHOLD", 1)
    t = lh.LakehouseTable.create(
        spark, str(tmp_path / "t"), events, key_cols=["event_id"]
    )
    t.upsert(events.limit(100))  # v1 rewrites: v0 files become removable
    t.upsert(events.limit(100))
    dry = t.vacuum(retain_versions=1, dry_run=True)
    assert len(dry["would_remove_files"]) > 1
    out = t.vacuum(retain_versions=1)
    assert out["removed_files"] == len(dry["would_remove_files"])
    # removed on disk, and the live snapshot still serves
    for rel in dry["would_remove_files"]:
        assert not os.path.exists(os.path.join(t.path, rel))
    assert t.read().count() == events.count()


def test_fsck_reports_vanished_cdc_sidecar(spark, events, tmp_path):
    """CDF sidecars belong to HISTORICAL commits, so FSCK can't repair
    them away — but it must REPORT them so the operator knows which
    version ranges read_changes will refuse (ADVICE r6)."""
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), events, key_cols=["event_id"],
        precombine="ts", cdc_enabled=True,
    )
    t.upsert(events.limit(20).withColumn("value", F.col("value") + 1))
    cdc_refs = [
        f for v in mf.list_versions(t.path)
        for f in mf.read_commit(t.path, v).cdc_files
    ]
    assert cdc_refs
    victim = cdc_refs[0]
    _vanish(t, victim)
    report = t.fsck(dry_run=True)
    assert report["missing"]["cdc_files"] == [victim]
    # a vanished CDF sidecar alone never triggers a repair commit
    report = t.fsck()
    assert report["repaired"] is False
    assert t._commit(None).action != "fsck"
