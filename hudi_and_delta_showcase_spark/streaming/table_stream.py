"""Streaming incremental read of a lakehouse table — the Hudi
streaming read / Delta ``spark.readStream.format("delta")`` surface
(SURVEY.md §2.10 + C7): tail a table's committed changes as Structured
Streaming micro-batches.

How exactly-once change extraction works WITHOUT a custom DataSource:
every commit writes its files under ``data/c{version:05d}-*/`` (MoR log
commits under ``log/l{version:05d}-*/``), so a file's commit version is
encoded in its path. CoW rewrites copy untouched rows forward, but
carried-over rows KEEP their original ``_hoodie_commit_time`` (the
invariant that also powers ``read_incremental``), while the rows a
commit actually changed are stamped with that commit's instant. A row
in a version-``v`` file is therefore a CHANGE of commit ``v`` iff its
stamp equals commit ``v``'s instant — everything else in the file is
carry-over that already streamed in an earlier batch. The filter is a
pure JVM expression (regex on ``_metadata.file_path`` + a literal
version→instant map), so the whole stream stays inside the file
source's checkpointed, exactly-once delivery.

Consequences that mirror the real systems:
* ``optimize``/``compact``/``restore`` emit NOTHING (they re-arrange
  files without logical changes — every row keeps an older stamp).
* MoR log commits stream as they land (the ``log/`` glob), and their
  later compaction is silent — no double delivery.
* Soft deletes (tombstone upserts) stream as ordinary changes; HARD
  deletes are invisible, exactly like a Hudi incremental query.

Scale: the file source lists only NEW files per trigger (checkpointed
offset log), each micro-batch reads O(changed data), and the
version→instant map is O(commits) driver memory — the same cost class
as reading the timeline, which every Hudi/Delta streaming reader does.

The literal map is frozen when the streaming DataFrame is built, so
rows from commits created AFTER that point are conservatively dropped
rather than mis-classified: with ``trigger(availableNow=True)`` (the
bounded-replay mode used by the oracle gate) the map always covers the
replayed history; a long-lived tailer should rebuild the stream (or
resolve instants per batch in ``foreachBatch``) to pick up new commits.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.tables import manifest as mf


def read_table_changes_stream(
    spark: SparkSession,
    table_path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming DataFrame of the table's committed CHANGES, each
    delivered exactly once across the stream's lifetime, starting from
    the table's first commit (Hudi ``hoodie.datasource.read.begin
    .instanttime=earliest`` streaming-read semantics)."""
    versions = mf.list_versions(table_path)
    if not versions:
        raise RuntimeError(f"no commits in {table_path}")
    instants = {
        v: mf.read_commit(table_path, v).commit_time for v in versions
    }
    sample = mf.read_commit(table_path, versions[-1])
    rel = (sample.files or sample.log_files)[0]
    schema = spark.read.parquet(os.path.join(table_path, rel)).schema

    reader = (
        spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(os.path.join(table_path, "{data,log}"))

    # file path -> commit version -> instant; change iff row stamp
    # equals the file's commit instant (all codegen'd JVM exprs)
    version_of_file = F.regexp_extract(
        F.col("_metadata.file_path"), r"/[cl](\d{5})-[0-9a-f]{8}/", 1
    ).cast("int")
    instant_map = F.create_map(
        *[F.lit(x) for kv in sorted(instants.items()) for x in kv]
    )
    return (
        stream.withColumn("__commit_instant", instant_map[version_of_file])
        .filter(F.col("_hoodie_commit_time") == F.col("__commit_instant"))
        .drop("__commit_instant")
    )
