"""SCD Type 2 dimension maintenance (operators/scd.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from hudi_and_delta_showcase_spark.operators.scd import (
    scd2_apply,
    scd2_create,
)


def _batch(spark, rows):
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        "uid int, attr string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))


def _state(t):
    return sorted(
        (
            r.uid,
            r.attr,
            str(r.effective_from),
            str(r.effective_to),
            r.is_current,
        )
        for r in t.read()
        .select("uid", "attr", "effective_from", "effective_to", "is_current")
        .collect()
    )


def test_scd2_three_batches_chain_versions(spark, tmp_path):
    t = scd2_create(
        spark,
        str(tmp_path / "dim"),
        _batch(spark, [(1, "a", "2024-01-01 00:00:00"),
                       (2, "x", "2024-01-01 00:00:00")]),
        natural_key="uid",
        ts_col="ts",
    )
    scd2_apply(t, _batch(spark, [(1, "b", "2024-02-01 00:00:00")]),
               natural_key="uid", ts_col="ts")
    scd2_apply(
        t,
        _batch(spark, [(1, "c", "2024-03-01 00:00:00"),
                       (3, "new", "2024-03-01 00:00:00")]),
        natural_key="uid", ts_col="ts",
    )
    assert _state(t) == sorted(
        [
            (1, "a", "2024-01-01 00:00:00", "2024-02-01 00:00:00", False),
            (1, "b", "2024-02-01 00:00:00", "2024-03-01 00:00:00", False),
            (1, "c", "2024-03-01 00:00:00", "None", True),
            (2, "x", "2024-01-01 00:00:00", "None", True),
            (3, "new", "2024-03-01 00:00:00", "None", True),
        ]
    )
    # exactly one current row per key, always
    cur = t.read().filter("is_current").groupBy("uid").count().collect()
    assert all(r["count"] == 1 for r in cur)


def test_scd2_within_batch_dedup_keeps_latest(spark, tmp_path):
    t = scd2_create(
        spark,
        str(tmp_path / "dim"),
        _batch(spark, [(1, "old", "2024-01-01 00:00:00"),
                       (1, "newer", "2024-01-02 00:00:00")]),
        natural_key="uid",
        ts_col="ts",
    )
    assert _state(t) == [
        (1, "newer", "2024-01-02 00:00:00", "None", True)
    ]


def test_scd2_late_batch_is_dropped_not_spliced(spark, tmp_path):
    t = scd2_create(
        spark,
        str(tmp_path / "dim"),
        _batch(spark, [(1, "cur", "2024-05-01 00:00:00")]),
        natural_key="uid",
        ts_col="ts",
    )
    scd2_apply(t, _batch(spark, [(1, "late", "2024-01-01 00:00:00")]),
               natural_key="uid", ts_col="ts")
    assert _state(t) == [
        (1, "cur", "2024-05-01 00:00:00", "None", True)
    ]


def test_scd2_current_row_lookup_skips_history_files(spark, tmp_path):
    """After maintenance rewrites concentrate history, the close-out
    scan's read_where(is_current) prunes all-history files via col
    stats."""
    t = scd2_create(
        spark,
        str(tmp_path / "dim"),
        _batch(spark, [(i, "v0", "2024-01-01 00:00:00")
                       for i in range(1, 9)]),
        natural_key="uid",
        ts_col="ts",
    )
    scd2_apply(
        t,
        _batch(spark, [(i, "v1", "2024-02-01 00:00:00")
                       for i in range(1, 9)]),
        natural_key="uid", ts_col="ts",
    )
    c = t._commit(None)
    stats = [
        c.col_stats.get(f, {}).get("is_current") for f in c.files
    ]
    assert any(s is not None for s in stats), "no bool stats recorded"
    # at least the current/history split is visible to the pruner after
    # an optimize clustered on the flag
    t.optimize(cluster_by=["is_current"], target_files=2)
    c = t._commit(None)
    skippable = [
        f
        for f in c.files
        if (s := c.col_stats.get(f, {}).get("is_current"))
        and s[1] is False
    ]
    assert skippable, "history never concentrated into skippable files"
