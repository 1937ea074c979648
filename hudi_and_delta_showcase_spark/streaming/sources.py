"""Streaming sources over the driver fixtures.

``read_events_stream`` is the file-source twin of ``io.load_table(...,
"events")``: identical timestamp normalization, but through ``readStream``
so downstream operators run under the micro-batch engine. A directory of
parquet files IS the stream — exactly the reference's Datastream model
(files arriving in a bucket, /root/reference/README.md:164-169).

Timestamp units are PROBED, never assumed: the fixture's ``ts`` column has
shipped as both parquet TIMESTAMP(NANOS) (older driver environments; Spark
surfaces it as a raw nanosecond long under
``spark.sql.legacy.parquet.nanosAsLong``) and TIMESTAMP(MICROS) (current
environment; Spark 4 reads it natively as ``timestamp_ntz``). The file
stream source requires an explicit schema, so we do ONE batch footer read
of the same files and mirror ``io.load_table``'s dtype-conditional
conversion — whatever type the batch path sees, the stream path declares,
and the nanos->NTZ division only runs when the column really is a raw
nanos long. Assuming a unit here is how you collapse every streamed
timestamp into January 1970.

Scale notes: the parquet file stream source lists new files per trigger
(``maxFilesPerTrigger`` bounds batch size) and each batch is a normal
parquet scan — pushdown/pruning work per micro-batch as in batch mode.
The schema probe is a driver-side footer read of one directory, cached
per (session, path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    DataType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from hudi_and_delta_showcase_spark.io import nanos_to_ntz


def _probe_ts_type(spark: SparkSession, sf_dir: str) -> DataType:
    """Batch-read the events fixture's footer and return the type Spark
    gives ``ts`` — ``timestamp_ntz`` for TIMESTAMP(MICROS) parquet (read
    natively), ``bigint`` for TIMESTAMP(NANOS) under ``nanosAsLong``.

    Cached per (session, sf_dir): one footer read, no data scan."""
    cache = getattr(spark, "_hds_stream_ts_type", None)
    if cache is None:
        cache = {}
        spark._hds_stream_ts_type = cache
    if sf_dir not in cache:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        cache[sf_dir] = (
            spark.read.parquet(f"{sf_dir}/events.parquet").schema["ts"].dataType
        )
    return cache[sf_dir]


def events_stream_schema(ts_type: DataType) -> StructType:
    """The stream-reader schema with ``ts`` declared as whatever type the
    batch path observes for the same files."""
    return StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", ts_type),
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
    """The events fixture as a file-source stream (S10 upgrade path).

    Output ``ts`` is TIMESTAMP_NTZ at microsecond precision — bit-identical
    to ``io.load_table(spark, sf_dir, "events")`` regardless of the parquet
    timestamp unit on disk (see module docstring)."""
    ts_type = _probe_ts_type(spark, sf_dir)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.readStream.schema(events_stream_schema(ts_type))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    # glob form: the file stream source requires a directory or glob path
    # (a bare file path fails partition-discovery's basePath check)
    df = reader.parquet(f"{sf_dir}/events.*")
    if isinstance(ts_type, LongType):
        df = df.withColumn("ts", nanos_to_ntz("ts"))
    return df
