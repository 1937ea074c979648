"""CHECK constraints (Delta ALTER TABLE ... ADD CONSTRAINT semantics):
strict writes reject a batch containing a violating row; the quarantine
variant applies valid rows and returns the violators tagged with the
constraint names they failed. NULL predicates pass (standard CHECK)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable

CONS = {"value_nonneg": "v >= 0", "name_ok": "name <> 'bad'"}


def _make(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "k long, name string, v long, ts long")
    return LakehouseTable.create(
        spark, str(tmp_path / "c"), df,
        key_cols=["k"], precombine="ts", constraints=CONS,
    )


def test_create_rejects_violations(spark, tmp_path):
    with pytest.raises(ValueError, match="value_nonneg"):
        _make(spark, tmp_path, [(1, "a", -5, 100)])


def test_upsert_rejects_violations(spark, tmp_path):
    t = _make(spark, tmp_path, [(1, "a", 10, 100)])
    with pytest.raises(ValueError, match="CHECK constraint"):
        t.upsert(
            t.spark.createDataFrame(
                [(2, "bad", 5, 200)], "k long, name string, v long, ts long"
            )
        )
    assert t.read().count() == 1  # nothing applied


def test_null_passes_check(spark, tmp_path):
    t = _make(spark, tmp_path, [(1, None, None, 100)])  # NULLs pass
    assert t.read().count() == 1


def test_quarantine_splits_and_applies(spark, tmp_path):
    t = _make(spark, tmp_path, [(1, "a", 10, 100)])
    commit, bad = t.upsert_quarantine(
        t.spark.createDataFrame(
            [(1, "a2", 11, 200), (2, "bad", -1, 200), (3, "c", 3, 200)],
            "k long, name string, v long, ts long",
        )
    )
    got = {r.k: r.name for r in t.read().select("k", "name").collect()}
    assert got == {1: "a2", 3: "c"}
    bad_rows = bad.collect()
    assert len(bad_rows) == 1
    assert sorted(bad_rows[0].violated_constraints) == [
        "name_ok", "value_nonneg",
    ]
    assert commit.version == 1


def test_quarantine_precombine_checks_written_row(spark, tmp_path):
    """Validation applies AFTER precombine: an old violating duplicate
    that loses the precombine race cannot poison the batch."""
    t = _make(spark, tmp_path, [(1, "a", 10, 100)])
    commit, bad = t.upsert_quarantine(
        t.spark.createDataFrame(
            [(1, "stale-bad", -9, 150), (1, "fresh", 12, 200)],
            "k long, name string, v long, ts long",
        )
    )
    assert bad.count() == 0  # the stale violator never would be written
    assert t.read().filter("k = 1").collect()[0].name == "fresh"


def test_unconstrained_table_unaffected(spark, tmp_path):
    df = spark.createDataFrame([(1, "x", -5, 1)],
                               "k long, name string, v long, ts long")
    t = LakehouseTable.create(
        spark, str(tmp_path / "u"), df, key_cols=["k"], precombine="ts"
    )
    commit, bad = t.upsert_quarantine(df)
    assert bad.count() == 0 and t.read().count() == 1


def test_generated_columns_derive_and_validate(spark, tmp_path):
    """Delta GENERATED ALWAYS AS: missing generated columns compute from
    their expression on every write (incl. a generated PARTITION
    column); provided-but-mismatched values reject the batch; matching
    provided values pass."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 10.0), (2, "2024-02-03 09:30:00", 20.0)],
        "k int, ts_s string, value double",
    ).select("k", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts",
        partition_by="event_day",
        generated_columns={"event_day": "date_trunc('day', ts)"},
    )
    rows = {r.k: r.event_day for r in t.read().collect()}
    assert str(rows[1]).startswith("2024-01-01")
    assert str(rows[2]).startswith("2024-02-03")
    # upsert WITHOUT the generated column: derived again
    up = spark.createDataFrame(
        [(1, "2024-03-05 01:00:00", 11.0)], "k int, ts_s string, value double"
    ).select("k", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value")
    t.upsert(up)
    # non-global index: k=1 now exists in old AND new day partitions
    days = {str(r.event_day)[:10] for r in t.read().filter(F.col("k") == 1).collect()}
    assert "2024-03-05" in days
    # provided-but-wrong generated value -> batch rejected
    bad = t.read().filter(F.col("k") == 2).withColumn(
        "event_day", F.expr("timestamp_ntz'1999-01-01 00:00:00'")
    ).select("k", "ts", "value", "event_day")
    with pytest.raises(ValueError, match="generated column"):
        t.upsert(bad)
    # provided-and-correct passes
    ok = t.read().filter(F.col("k") == 2).select("k", "ts", "value", "event_day")
    t.upsert(ok)


def test_vacuum_dry_run_lists_without_deleting(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame([(1, 10, 1)], "k int, v int, sq int")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.upsert(spark.createDataFrame([(1, 11, 2)], "k int, v int, sq int"))
    preview = t.vacuum(retain_versions=1, dry_run=True)
    assert preview["would_remove_files"]
    # nothing deleted: time travel still works
    assert t.read(version=0).count() == 1
    real = t.vacuum(retain_versions=1)
    assert real["removed_files"] == len(preview["would_remove_files"])


def test_drop_column_refuses_generated_and_inputs(spark, tmp_path):
    """Dropping a generated column (or an input its expression reads)
    would wedge every future write — _apply_generated re-adds the
    column straight into the tombstone refusal, or its F.expr stops
    resolving. Both refuse up front, like the constraint guard."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 10.0)], "k int, ts_s string, value double"
    ).select("k", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts",
        generated_columns={"event_day": "date_trunc('day', ts)"},
    )
    with pytest.raises(ValueError, match="generated column"):
        t.drop_column("event_day")
    # 'value' is not referenced -> drops fine; 'ts' is protected as
    # precombine already, so test the input guard on a fresh table
    t.drop_column("value")
    df2 = spark.createDataFrame(
        [(1, 5, 100, 7)], "k int, base int, seq int, other int"
    )
    t2 = LakehouseTable.create(
        spark, str(tmp_path / "t2"), df2, key_cols=["k"], precombine="seq",
        generated_columns={"doubled": "base * 2"},
    )
    with pytest.raises(ValueError, match="referenced by generated"):
        t2.drop_column("base")
    t2.drop_column("other")  # untouched column still droppable
    # writes still work after the refusals (dropped col stays absent)
    t2.upsert(
        spark.createDataFrame([(1, 6, 101)], "k int, base int, seq int")
    )
    assert t2.read().select("doubled").first()[0] == 12


def test_execute_update_recomputes_generated_columns(spark, tmp_path):
    """UPDATE SET on an input of a generated expression must recompute
    the generated column rather than replaying the stale stored value
    into _apply_generated's mismatch rejection."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_update

    df = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 10.0), (2, "2024-02-03 09:30:00", 20.0)],
        "k int, ts_s string, value double",
    ).select("k", F.col("ts_s").cast("timestamp_ntz").alias("ts"), "value")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts",
        generated_columns={"event_day": "date_trunc('day', ts)"},
    )
    res = execute_update(
        spark,
        "UPDATE events SET ts = timestamp_ntz'2024-06-15 12:00:00' WHERE k = 1",
        {"events": t},
    )
    assert res["updated"] == 1
    rows = {r.k: str(r.event_day)[:10] for r in t.read().collect()}
    assert rows[1] == "2024-06-15"  # recomputed from the NEW ts
    assert rows[2] == "2024-02-03"  # untouched row unchanged


def test_add_constraint_validates_existing_data(spark, tmp_path):
    """Delta ALTER TABLE ADD CONSTRAINT parity: adding a constraint the
    current snapshot violates is refused; a satisfiable one enforces on
    future writes; drop_constraint releases it."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame(
        [(1, "a", 10, 100), (2, "b", -5, 100)],
        "k long, name string, v long, ts long",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts"
    )
    with pytest.raises(ValueError, match="existing rows violate"):
        t.add_constraint("v_nonneg", "v >= 0")
    t.add_constraint("v_bounded", "v >= -10")
    with pytest.raises(ValueError, match="constraint exists"):
        t.add_constraint("v_bounded", "v >= -10")
    # enforced from the next write on — including on a FRESH handle
    t2 = LakehouseTable(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="CHECK constraint"):
        t2.upsert(
            spark.createDataFrame(
                [(3, "c", -99, 200)], "k long, name string, v long, ts long"
            )
        )
    t2.drop_constraint("v_bounded")
    with pytest.raises(ValueError, match="no such constraint"):
        t2.drop_constraint("v_bounded")
    t3 = LakehouseTable(spark, str(tmp_path / "t"))
    t3.upsert(
        spark.createDataFrame(
            [(3, "c", -99, 200)], "k long, name string, v long, ts long"
        )
    )
    assert t3.read().count() == 3


def test_enable_cdc_after_create(spark, tmp_path):
    """CDF enabled mid-life: capture begins with the NEXT commit;
    earlier versions have no change files (Delta behavior)."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame([(1, 10, 100)], "k int, v int, ts long")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts"
    )
    t.upsert(spark.createDataFrame([(1, 11, 101)], "k int, v int, ts long"))
    t.enable_cdc()
    t2 = LakehouseTable(spark, str(tmp_path / "t"))
    t2.upsert(spark.createDataFrame([(1, 12, 102)], "k int, v int, ts long"))
    ch = t2.read_changes(2, 2)
    types = sorted(r._change_type for r in ch.select("_change_type").collect())
    assert types == ["update_postimage", "update_preimage"]
    with pytest.raises(ValueError, match="no change files"):
        t2.read_changes(0, 1)  # pre-enablement commits captured nothing


def test_meta_lock_stale_takeover(spark, tmp_path, monkeypatch):
    """A crashed DDL's leftover _meta.lock must not wedge future DDLs:
    once past the takeover window the next waiter breaks it."""
    import pyspark.sql.functions as F

    import hudi_and_delta_showcase_spark.tables.lakehouse as lh
    from hudi_and_delta_showcase_spark.tables import LakehouseTable, fsio

    df = spark.range(5).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    path = str(tmp_path / "t")
    t = LakehouseTable.create(spark, path, df, key_cols=["k"])
    fsio.publish_exclusive(fsio.join(path, "_meta.lock"), "dead-holder")
    monkeypatch.setattr(lh, "META_LOCK_TAKEOVER_SECONDS", 0.0)
    t.add_constraint("pos", "v >= 0")          # breaks the stale lock
    assert "pos" in LakehouseTable(spark, path).constraints
    assert not fsio.exists(fsio.join(path, "_meta.lock"))
