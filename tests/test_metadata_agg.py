"""Metadata-only aggregation (``LakehouseTable.metadata_agg`` — Delta
OptimizeMetadataOnlyQuery / per-AddFile numRecords parity): COUNT(*) and
numeric MIN/MAX answered from the manifest's footer row counts + column
stats with zero data-file IO, falling back to one scan-side aggregate
whenever the metadata answer would not be exact."""

from __future__ import annotations

import os

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _base(spark):
    return spark.createDataFrame(
        [(i, float(i) * 1.5, f"n{i}", 100) for i in range(1, 41)],
        "k long, v double, name string, ts long",
    )


def _scan_agg(t, cols):
    aggs = [F.count(F.lit(1)).cast("long").alias("count_rows")] + [
        a
        for c in cols
        for a in (F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}"))
    ]
    return t.read().agg(*aggs).collect()[0]


def test_metadata_path_is_exact_and_reads_no_data(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), _base(spark),
        key_cols=["k"], precombine="ts",
    )
    t.upsert(
        spark.createDataFrame(
            [(i, float(i) * -2.0, f"m{i}", 200) for i in range(30, 51)],
            "k long, v double, name string, ts long",
        )
    )
    got = t.metadata_agg(["v", "k"], require_metadata_only=True).collect()[0]
    want = _scan_agg(t, ["v", "k"])
    assert tuple(got) == tuple(want)
    assert got["count_rows"] == 50

    # the strongest zero-data-IO proof available: clobber every base
    # file's bytes — the metadata answer must still come back intact
    for root, _dirs, files in os.walk(tmp_path / "t"):
        if "_commits" in root:
            continue
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "wb") as fh:
                    fh.write(b"garbage")
    again = t.metadata_agg(["v", "k"], require_metadata_only=True).collect()[0]
    assert tuple(again) == tuple(want)


def test_dv_count_subtracts_exactly_and_minmax_refuses(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), _base(spark),
        key_cols=["k"], precombine="ts", deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3,), (7,), (11,)], "k long"))
    got = t.metadata_agg(require_metadata_only=True).collect()[0]
    assert got["count_rows"] == 37
    with pytest.raises(ValueError, match="deletion vectors"):
        t.metadata_agg(["v"], require_metadata_only=True)
    # fallback is still exact
    got = t.metadata_agg(["v"]).collect()[0]
    assert tuple(got) == tuple(_scan_agg(t, ["v"]))


def test_mor_outstanding_logs_fall_back(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), _base(spark),
        key_cols=["k"], precombine="ts", table_type="mor",
    )
    t.upsert(
        spark.createDataFrame(
            [(1, 999.0, "x", 200), (99, 1.0, "y", 200)],
            "k long, v double, name string, ts long",
        )
    )
    with pytest.raises(ValueError, match="MoR log"):
        t.metadata_agg(require_metadata_only=True)
    got = t.metadata_agg(["v"]).collect()[0]
    assert got["count_rows"] == 41
    assert got["max_v"] == 999.0
    # after compaction the logs are merged and metadata is exact again
    t.compact()
    got = t.metadata_agg(["v"], require_metadata_only=True).collect()[0]
    assert tuple(got) == tuple(_scan_agg(t, ["v"]))


def test_string_minmax_refuses_metadata_path(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), _base(spark),
        key_cols=["k"], precombine="ts",
    )
    with pytest.raises(ValueError, match="truncated"):
        t.metadata_agg(["name"], require_metadata_only=True)
    got = t.metadata_agg(["name"]).collect()[0]
    assert (got["min_name"], got["max_name"]) == ("n1", "n9")


def test_row_counts_survive_rename_and_restore(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), _base(spark),
        key_cols=["k"], precombine="ts",
    )
    t.upsert(
        spark.createDataFrame(
            [(41, 0.5, "z", 200)], "k long, v double, name string, ts long"
        )
    )
    t.rename_column("v", "val")
    got = t.metadata_agg(["val"], require_metadata_only=True).collect()[0]
    assert got["count_rows"] == 41
    assert got["min_val"] == 0.5
    # restore rewinds the column mapping with the data: logical name is
    # "v" again, and the restored version's row counts are carried
    t.restore(0)
    got = t.metadata_agg(["v"], require_metadata_only=True).collect()[0]
    assert got["count_rows"] == 40


def test_time_travel_versioned_metadata_agg(spark, tmp_path):
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), _base(spark),
        key_cols=["k"], precombine="ts",
    )
    t.upsert(
        spark.createDataFrame(
            [(50, -5.0, "w", 200)], "k long, v double, name string, ts long"
        )
    )
    v0 = t.metadata_agg(["v"], version=0, require_metadata_only=True)
    assert v0.collect()[0]["count_rows"] == 40
    v1 = t.metadata_agg(["v"], version=1, require_metadata_only=True)
    r = v1.collect()[0]
    assert (r["count_rows"], r["min_v"]) == (41, -5.0)
