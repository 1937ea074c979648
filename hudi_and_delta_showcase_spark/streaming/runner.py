"""Run a streaming DataFrame to completion and hand back the result.

``trigger(availableNow=True)`` processes everything currently in the
source then stops — the bounded-replay mode that makes streaming queries
deterministic and therefore oracle-checkable. The memory sink collects
results on the driver: strictly a test/debug sink (production writes go
to parquet/lakehouse sinks or ``foreachBatch``; see cdc_stream.py).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession


def run_to_memory(
    sdf: DataFrame,
    mode: str = "complete",
    name: str | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow + memory sink;
    block until done; return the materialized result table."""
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", tempfile.mkdtemp(prefix=f"ckpt_{name}_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark: SparkSession = sdf.sparkSession
    return spark.table(name)
