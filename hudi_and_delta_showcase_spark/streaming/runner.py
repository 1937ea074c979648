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
    state_partitions: int | None = None,
) -> DataFrame:
    """Execute a streaming DataFrame with availableNow + memory sink;
    block until done; return the materialized result table.

    ``state_partitions`` sizes the STATE STORE: a streaming query's
    state partitioning is fixed from the session's shuffle-partition
    setting at first start, and every micro-batch pays one state-store
    commit per partition per stateful operator — at fixture scale, 32
    partitions of near-empty state cost ~3s of pure checkpoint IO per
    run (measured: the stream-stream join dropped 4.7s -> 1.7s at 8).
    Size it to the state volume, exactly as production streaming jobs
    tune shuffle partitions before the FIRST run of a query (the
    setting is sticky in the checkpoint). None = session default."""
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    spark: SparkSession = sdf.sparkSession
    key = "spark.sql.shuffle.partitions"
    saved = spark.conf.get(key) if state_partitions is not None else None
    if state_partitions is not None:
        spark.conf.set(key, str(state_partitions))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option(
                "checkpointLocation",
                tempfile.mkdtemp(prefix=f"ckpt_{name}_"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if saved is not None:
            spark.conf.set(key, saved)
    return spark.table(name)
