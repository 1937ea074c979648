"""``write_iceberg_dataset_batches`` must build a tree EQUIVALENT to
the sequential create+append form: same snapshot chain, sequence
numbers, per-snapshot file sets (counts and per-partition layout),
manifest carry-over shape, and byte-identical read-back rows — just
with the data plane landed in one combined Spark write (r14 opt)."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    _snapshot_entries,
    iceberg_snapshots,
    read_iceberg_incremental,
    read_iceberg_metadata,
    read_iceberg_table,
    write_iceberg_dataset,
    write_iceberg_dataset_batches,
)


def _batches(spark, n=3):
    from pyspark.sql import functions as F

    df = spark.range(120).select(
        F.col("id").alias("event_id"),
        (F.col("id") % 7).alias("user_id"),
        F.expr(
            "cast(timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,"
            "cast(id % 5 as int),0,0,0) as timestamp_ntz)"
        ).alias("ts"),
        (F.col("id") * 1.5).alias("value"),
    )
    return [df.filter(F.pmod(F.col("event_id"), F.lit(n)) == i) for i in range(n)]


def _tree_shape(root):
    snaps = iceberg_snapshots(root)
    shape = []
    for s in snaps:
        data, pos, eq = _snapshot_entries(root, s, with_deletes=True)
        per_part = {}
        for e in data:
            key = tuple(sorted((e["data_file"].get("partition") or {}).items()))
            per_part[key] = per_part.get(key, 0) + 1
        shape.append(
            {
                "seq": s["sequence-number"],
                "op": s["summary"]["operation"],
                "parented": "parent-snapshot-id" in s,
                "n_files": len(data),
                "per_part": per_part,
                "rows": sum(e["data_file"]["record_count"] for e in data),
                "deletes": (len(pos), len(eq)),
            }
        )
    return shape


@pytest.mark.parametrize("partition_by", [None, [("ts", "day")]])
def test_batched_equals_sequential(spark, tmp_path, partition_by):
    # single-partition batches (the query-fixture shape: each batch is
    # a filter of a one-file scan). NOTE the one contract difference
    # from the sequential form: an UNPARTITIONED sequential write
    # keeps the upstream partitioning (one file per upstream task),
    # while the batched writer always clusters — one file per batch
    # per partition value. For multi-partition upstreams the file
    # COUNTS may differ; rows, snapshots and sequence numbers never do.
    batches = [b.coalesce(1) for b in _batches(spark)]
    seq_root = str(tmp_path / "seq")
    write_iceberg_dataset(
        spark, batches[0], seq_root, partition_by=partition_by
    )
    for b in batches[1:]:
        write_iceberg_dataset(
            spark, b, seq_root, partition_by=partition_by, mode="append"
        )
    bat_root = str(tmp_path / "bat")
    write_iceberg_dataset_batches(
        spark, batches, bat_root, partition_by=partition_by
    )

    assert _tree_shape(bat_root) == _tree_shape(seq_root)
    meta_s = read_iceberg_metadata(seq_root)
    meta_b = read_iceberg_metadata(bat_root)
    for k in ("last-sequence-number", "format-version", "schemas",
              "partition-specs", "default-spec-id", "last-column-id"):
        assert meta_b[k] == meta_s[k], k
    rows_s = sorted(
        tuple(r) for r in read_iceberg_table(spark, seq_root).collect()
    )
    rows_b = sorted(
        tuple(r) for r in read_iceberg_table(spark, bat_root).collect()
    )
    assert rows_b == rows_s
    # the staging dir is gone
    assert not fsio.exists(fsio.join(bat_root, "data_staging"))


def test_batched_incremental_scan(spark, tmp_path):
    batches = _batches(spark)
    root = str(tmp_path / "t")
    write_iceberg_dataset_batches(
        spark, batches, root, partition_by=[("ts", "day")]
    )
    first = iceberg_snapshots(root)[0]["snapshot-id"]
    got = sorted(
        r.event_id
        for r in read_iceberg_incremental(
            spark, root, from_snapshot_id=first
        ).collect()
    )
    want = sorted(
        r.event_id for b in batches[1:] for r in b.collect()
    )
    assert got == want


def test_batched_refuses_existing_tree(spark, tmp_path):
    batches = _batches(spark, n=2)
    root = str(tmp_path / "t")
    write_iceberg_dataset(spark, batches[0], root)
    with pytest.raises(ValueError, match="already exists"):
        write_iceberg_dataset_batches(spark, batches, root)
