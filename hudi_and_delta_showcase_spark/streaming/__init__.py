"""Structured Streaming layer (SURVEY.md §2.10 + M7).

The reference's streaming is external (GCP Datastream drops CDC files,
Spark merges them batch-by-batch — /root/reference/README.md:97-174).
This package is the idiomatic Spark upgrade path the survey prescribes:
``readStream`` file sources + ``foreachBatch(upsert)`` for the CDC loop,
and watermarked window / session / custom-stateful operators for the
``events`` stream.
"""

from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
    apply_cdc_stream,
    read_envelope_stream,
)
from hudi_and_delta_showcase_spark.streaming.runner import run_to_memory
from hudi_and_delta_showcase_spark.streaming.sources import read_events_stream
from hudi_and_delta_showcase_spark.streaming.table_stream import (
    read_table_changes_stream,
)
from hudi_and_delta_showcase_spark.streaming.windows import (
    session_stats,
    sliding_avg,
    stateful_user_stats,
    tumbling_counts,
)

__all__ = [
    "apply_cdc_stream",
    "read_envelope_stream",
    "read_events_stream",
    "read_table_changes_stream",
    "run_to_memory",
    "session_stats",
    "sliding_avg",
    "stateful_user_stats",
    "tumbling_counts",
]
