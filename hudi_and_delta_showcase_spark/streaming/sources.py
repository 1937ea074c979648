"""Streaming sources over the driver fixtures.

``read_events_stream`` is the file-source twin of ``io.load_table(...,
"events")``: same nanos->NTZ normalization, but through ``readStream`` so
downstream operators run under the micro-batch engine. A directory of
parquet files IS the stream — exactly the reference's Datastream model
(files arriving in a bucket, /root/reference/README.md:164-169).

Scale notes: the parquet file stream source lists new files per trigger
(``maxFilesPerTrigger`` bounds batch size) and each batch is a normal
parquet scan — pushdown/pruning work per micro-batch as in batch mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hudi_and_delta_showcase_spark.io import nanos_to_ntz

#: events.parquet carries TIMESTAMP(NANOS) -> read as raw long
#: (spark.sql.legacy.parquet.nanosAsLong) and convert to NTZ ourselves.
EVENTS_STREAM_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def read_events_stream(
    spark: SparkSession,
    sf_dir: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """The events fixture as a file-source stream (S10 upgrade path)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(EVENTS_STREAM_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # glob form: the file stream source requires a directory or glob path
    # (a bare file path fails partition-discovery's basePath check)
    df = reader.parquet(f"{sf_dir}/events.*")
    return df.withColumn("ts", nanos_to_ntz("ts"))
