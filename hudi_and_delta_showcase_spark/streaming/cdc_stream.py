"""Streaming CDC apply: the reference's Datastream→merge loop as a
Structured Streaming pipeline (SURVEY.md §2.10 upgrade path).

Reference flow (/root/reference/README.md:97-174,440-461): Datastream
drops Avro change-event files into a bucket; each file batch is read,
flattened (``select("payload.*", "*")``), timestamp-normalized, and
UPSERTed into the lakehouse table. Here the drop directory is a
``readStream`` file source and the merge runs in ``foreachBatch`` — the
standard Delta/Hudi CDC-apply recipe, giving exactly-once application via
the streaming checkpoint + idempotent keyed upsert.

Scale notes: each micro-batch upsert is partition-scoped (only
partitions containing batch keys rewrite — tables/lakehouse.py), so
steady-state cost tracks CDC volume, not table size. ``maxFilesPerTrigger``
bounds batch memory; the checkpoint makes restarts resume from the last
committed file offset.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.operators.cdc import (
    ENVELOPE_SCHEMA,
    flatten_envelope,
    normalize_timestamps,
)
from hudi_and_delta_showcase_spark.tables import LakehouseTable


def read_envelope_stream(
    spark: SparkSession,
    drop_dir: str,
    max_files_per_trigger: int | None = 1,
    envelope_type=None,
) -> DataFrame:
    """File-source stream of Datastream CDC envelopes (parquet files in a
    drop directory; the reference's files are Avro — same envelope, format
    per io.read_avro availability). ``envelope_type`` declares the full
    envelope schema for non-golden payloads (``operators.cdc.
    envelope_schema(payload_type)``); default is the golden contract."""
    reader = spark.readStream.schema(envelope_type or ENVELOPE_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(drop_dir)


def normalize_cdc_batch(batch: DataFrame) -> DataFrame:
    """The reference's per-batch prep, payload-schema-GENERIC: flatten
    the envelope, convert every timestamp payload column to epoch
    seconds (README.md:267,270-273), keep the change markers for
    soft-delete semantics (README.md:529). The payload's own fields —
    whatever table is riding the envelope — become the row columns, so
    any relational source flows through the same apply loop."""
    payload_fields = batch.schema["payload"].dataType
    ts_cols = [
        f.name
        for f in payload_fields.fields
        if f.dataType.typeName().startswith("timestamp")
    ]
    flat = flatten_envelope(batch)
    flat = normalize_timestamps(flat, ts_cols)
    return flat.select(
        *[f.name for f in payload_fields.fields],
        flat["source_metadata.change_type"].alias("change_type"),
        flat["source_metadata.is_deleted"].alias("is_deleted"),
    )


def apply_cdc_stream(
    spark: SparkSession,
    drop_dir: str,
    table_path: str,
    checkpoint_dir: str | None = None,
    max_files_per_trigger: int | None = 1,
    table_type: str = "cow",
    key_cols: list[str] | None = None,
    precombine: str = "updated_at",
    envelope_type=None,
) -> LakehouseTable:
    """Consume every envelope file currently in ``drop_dir`` (availableNow)
    and merge each micro-batch into the lakehouse table at ``table_path``
    via keyed upsert. Creates the table from the first batch if absent.

    Returns the table handle after the stream drains."""
    checkpoint_dir = checkpoint_dir or tempfile.mkdtemp(prefix="cdc_ckpt_")
    stream = read_envelope_stream(
        spark, drop_dir, max_files_per_trigger, envelope_type=envelope_type
    )

    # writer identity for idempotent commits (Delta txnAppId): tied to
    # the checkpoint, whose batch ids are the monotonically increasing
    # transaction versions. A replayed batch (table commit landed, the
    # stream checkpoint didn't) finds its own watermark in the manifest
    # and no-ops — exactly-once at the COMMIT level, not just by
    # latest-per-key overwrite.
    txn_app = f"cdc-apply:{os.path.abspath(checkpoint_dir)}"

    def merge_batch(batch: DataFrame, batch_id: int) -> None:
        from hudi_and_delta_showcase_spark.tables import fsio

        rows = normalize_cdc_batch(batch)
        if not fsio.exists(fsio.join(table_path, "_meta.json")):
            LakehouseTable.create(
                spark,
                table_path,
                rows,
                key_cols=key_cols or ["pk_id"],
                precombine=precombine,
                tiebreakers=["change_type"],
                table_type=table_type,
            )
        else:
            LakehouseTable.load(spark, table_path).upsert(
                rows, txn_app_id=txn_app, txn_version=batch_id
            )

    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return LakehouseTable.load(spark, table_path)
