"""CHECK constraints (Delta ALTER TABLE ... ADD CONSTRAINT semantics):
strict writes reject a batch containing a violating row; the quarantine
variant applies valid rows and returns the violators tagged with the
constraint names they failed. NULL predicates pass (standard CHECK)."""

from __future__ import annotations

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
