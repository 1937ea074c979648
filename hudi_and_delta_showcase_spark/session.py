"""SparkSession factory.

Mirrors the reference's session setup (Kryo serializer — Hudi notebook cell 0;
Delta extension configs — Delta notebook cell 1, see
``/root/reference/Notebooks/scala-cdc-hudi.ipynb:1`` and
``/root/reference/Notebooks/Delta-test-nb.ipynb:1``) re-expressed for a pure
PySpark engine:

* **AQE on** (coalesce shuffle partitions, skew-join handling) so the same
  declarative plans re-tune themselves between local[32] tests and a
  1000-executor cluster.
* **UTC, timestamp-NTZ discipline** — all engine timestamps are wall-clock
  (TIMESTAMP_NTZ), making results independent of cluster timezone.
* ``spark.sql.legacy.parquet.nanosAsLong=true`` — the driver fixtures store
  ``events.ts`` as parquet TIMESTAMP(NANOS), which Spark has no native type
  for; we read the raw nanos and convert in the IO layer (io.load_table).

Scale notes (100 TB): ``shuffle.partitions`` here is sized for local runs;
on a real cluster set it ~2-3x total cores (or rely on AQE's coalescing from
a high initial value), raise ``maxPartitionBytes`` to 256m for fewer, fatter
scan tasks, and leave broadcast threshold at default so dimension tables
(region/nation/supplier/part) broadcast instead of shuffling.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    env = os.environ.get("SPARK_GRAFT_CPUS")
    if env:
        return max(1, int(env))
    return os.cpu_count() or 4


def get_spark(
    app_name: str = "hudi-and-delta-showcase-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine SparkSession."""
    cpus = _default_parallelism()
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        # TIMESTAMP_MICROS (not the legacy INT96 default): INT96
        # columns carry NO parquet min/max statistics, which silently
        # disables timestamp data-skipping everywhere (r12); micros is
        # also what every modern reader (and the Iceberg/Delta/Hudi
        # stats dialects) speak natively
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    return spark
