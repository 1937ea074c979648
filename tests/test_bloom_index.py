"""Bloom-index file skipping (Hudi ``hoodie.index.type=BLOOM`` parity):
per-file key blooms prune upsert/delete candidates where the range tier
cannot — unclustered files with fully overlapping key spans. Contract
under test: no false negatives ever (every file holding a batch key is
rewritten), real pruning on scattered keys, manifest persistence."""

from __future__ import annotations

import pyspark.sql.functions as F

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.bloom import (
    build_file_blooms,
    probe_blooms,
)


def _unclustered(spark, tmp_path, n=1000, files=8, **kw):
    """A table whose every file spans ~the whole key range (hash
    distribution) — the shape where min/max range pruning declines.
    AQE partition coalescing is suspended for the write: these rows are
    tiny, and AQE would legitimately fold the hash partitions back into
    one file, destroying the many-overlapping-files shape under test."""
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 7).alias("v"),
            F.lit(1).cast("long").alias("ts"),
        )
        .repartition(files)
    )
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    skey = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    sold = spark.conf.get(skey)
    # pin shuffle partitions too (r14): the precombine-dedup window
    # RE-shuffles the batch, so the written file count follows the
    # session's shuffle parallelism, not the repartition above — the
    # many-overlapping-files shape must not depend on the test
    # session's core count
    spark.conf.set(key, "false")
    spark.conf.set(skey, str(files))
    try:
        return LakehouseTable.create(
            spark, str(tmp_path / "t"), df,
            key_cols=["k"], precombine="ts", bloom_index=True, **kw,
        )
    finally:
        spark.conf.set(key, old)
        spark.conf.set(skey, sold)


def test_bloom_build_probe_no_false_negatives(spark, tmp_path):
    t = _unclustered(spark, tmp_path)
    commit = t.history()[-1]
    assert set(commit.key_blooms) == set(commit.files)  # every file bloomed
    # every present key must hit the file that holds it
    full = t.read().select(
        "_hoodie_record_key", "_hoodie_file_name"
    ).collect()
    holder = {}
    for r in full:
        holder.setdefault(r._hoodie_record_key, set()).add(r._hoodie_file_name)
    probe_keys = spark.createDataFrame(
        [(k,) for k in list(holder)[:50]], "_hoodie_record_key string"
    )
    import os

    hits = probe_blooms(
        spark, probe_keys,
        {os.path.basename(f): b for f, b in commit.key_blooms.items()},
    )
    for k in list(holder)[:50]:
        assert holder[k] <= hits  # no false negatives


def test_bloom_prunes_unclustered_upsert(spark, tmp_path):
    t = _unclustered(spark, tmp_path)
    src = spark.createDataFrame([(3, 99, 2)], "k long, v long, ts long")
    commit = t.upsert(src)
    # range tier is useless here (overlapping spans -> probe declines)…
    assert commit.stats["key_range_skipped_files"] == 0
    # …but the bloom tier prunes most of the 8 files
    assert commit.stats["bloom_skipped_files"] >= 5
    assert commit.stats["rewritten_files"] <= 3
    got = {(r.k, r.v) for r in t.read().filter("k in (3, 4)").collect()}
    assert got == {(3, 99), (4, 4 % 7)}
    assert t.read().count() == 1000  # nothing lost, nothing duplicated


def test_bloom_prunes_delete_and_carries_over(spark, tmp_path):
    t = _unclustered(spark, tmp_path)
    commit = t.delete(spark.createDataFrame([(7,)], "k long"))
    assert commit.stats["rewritten_files"] <= 3
    assert t.read().filter("k = 7").count() == 0
    assert t.read().count() == 999
    # untouched files keep their blooms across the commit (carry-over)
    assert len(commit.key_blooms) >= 7


def test_bloom_prunes_point_lookup(spark, tmp_path):
    """read_for_keys on an unclustered bloom table scans a strict
    subset of files (ranges alone keep every file here) and still
    returns exactly the requested keys."""
    t = _unclustered(spark, tmp_path)
    total = len(t._commit(None).files)
    assert total >= 8
    out = t.read_for_keys([11, 22])
    assert len(out.inputFiles()) < total
    got = {(r.k, r.v) for r in out.select("k", "v").collect()}
    assert got == {(11, 11 % 7), (22, 22 % 7)}


def test_bloom_with_global_index(spark, tmp_path):
    """Bloom tier composes with global_index: candidates span all
    partitions, blooms prune them back down."""
    df = (
        spark.range(400)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 4).cast("string").alias("part"),
            F.lit(1).cast("long").alias("ts"),
        )
        .repartition(8)
    )
    key = "spark.sql.adaptive.coalescePartitions.enabled"
    skey = "spark.sql.shuffle.partitions"
    old = spark.conf.get(key)
    sold = spark.conf.get(skey)
    spark.conf.set(key, "false")
    spark.conf.set(skey, "8")  # shape independent of session cores (r14)
    try:
        t = LakehouseTable.create(
            spark, str(tmp_path / "g"), df,
            key_cols=["k"], precombine="ts", partition_by="part",
            global_index=True, bloom_index=True,
        )
    finally:
        spark.conf.set(key, old)
        spark.conf.set(skey, sold)
    src = spark.createDataFrame([(5, "0", 2)], "k long, part string, ts long")
    commit = t.upsert(src)
    assert commit.stats["bloom_skipped_files"] > 0
    assert t.read().filter("k = 5").count() == 1
    assert t.read().count() == 400
