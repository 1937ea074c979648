"""Record-level index (Hudi 1.0 record index): exact key->file mapping
maintained O(new rows) per commit; point lookups and upsert probes read
only the files that actually hold the requested keys — including on
UNCLUSTERED tables where every key range overlaps and the range tier
cannot prune."""

from __future__ import annotations

import pyspark.sql.functions as F

from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable


def _table(spark, path, **kw):
    # interleaved keys across many files -> every file spans nearly the
    # whole key range (the range tier's worst case). AQE coalescing is
    # suspended for the create: it would legitimately fold these small
    # files into one, removing the multi-file shape under test.
    df = spark.range(400).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v"),
        F.lit(1).alias("sq"),
    ).repartition(8)
    coalesce_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(coalesce_key, "true")
    spark.conf.set(coalesce_key, "false")
    try:
        return LakehouseTable.create(
            spark, path, df, key_cols=["k"], precombine="sq",
            record_index=True, **kw,
        )
    finally:
        spark.conf.set(coalesce_key, old)


def test_point_lookup_reads_only_holding_files(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    commit = t._commit(None)
    assert commit.ri_files, "index sidecar must exist"
    out = t.read_for_keys([7, 203])
    rows = {r.k: r.v for r in out.collect()}
    assert rows == {7: 21, 203: 609}
    # the scan touched a strict subset of files (2 keys -> <=2 files)
    assert 0 < len(out.inputFiles()) <= 2 < len(commit.files)


def test_upsert_probe_prunes_unclustered_files(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    n_files = len(t._commit(None).files)
    batch = spark.createDataFrame([(7, 700, 2), (203, 2030, 2)],
                                  "k long, v long, sq int")
    commit = t.upsert(batch)
    # the exact index probe rewrote only the files holding keys 7 and 203
    assert commit.stats["rewritten_files"] <= 2 < n_files
    assert commit.stats["record_index_skipped_files"] >= n_files - 2
    rows = {r.k: r.v for r in t.read().filter(F.col("k").isin(7, 203)).collect()}
    assert rows == {7: 700, 203: 2030}
    assert t.read().count() == 400


def test_index_follows_rewrites_and_maintenance(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.upsert(spark.createDataFrame([(7, 700, 2)], "k long, v long, sq int"))
    # stale entries (key 7 -> dead file) are filtered by liveness
    out = t.read_for_keys([7])
    assert [(r.k, r.v) for r in out.collect()] == [(7, 700)]
    # full optimize resets the sidecar to its own output's index
    t.optimize(target_files=2, cluster_by=["k"])
    commit = t._commit(None)
    assert commit.ri_files
    out = t.read_for_keys([7])
    assert [(r.k, r.v) for r in out.collect()] == [(7, 700)]
    # vacuum drops the pre-optimize index sidecars along with old data
    import os
    before = sum(len(fs) for _, _, fs in os.walk(str(tmp_path / "t" / "_index")))
    t.vacuum(retain_versions=1)
    after = sum(len(fs) for _, _, fs in os.walk(str(tmp_path / "t" / "_index")))
    assert after < before
    assert [(r.k, r.v) for r in t.read_for_keys([7]).collect()] == [(7, 700)]


def test_deletes_respected_through_index(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.delete(spark.createDataFrame([(7,)], "k long"))
    assert t.read_for_keys([7]).count() == 0
    assert t.read_for_keys([8]).count() == 1
