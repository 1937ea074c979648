"""Windowed / sessionized / custom-stateful streaming operators (M7).

Each transformation takes a DataFrame that may be STREAMING or BATCH —
``F.window`` / ``F.session_window`` are engine-agnostic, so the same
function body is both the streaming operator and its batch twin (tests
assert stream ≡ batch on identical input; the DuckDB oracle checks the
batch semantics).

Determinism contract: aggregates over the double ``value`` column go
through the DECIMAL(18,2)-cast pattern (see queries/relational.py) so
sums are summation-order-independent and match DuckDB exactly.

Scale notes (100 TB stream): watermarks bound state (late rows beyond
the delay are dropped, state for closed windows is evicted); grouped
state in ``stateful_user_stats`` shuffles once on the key and holds O(1)
state per key. Skewed keys in windowed aggs get partial aggregation
map-side for counts/sums (built-in).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def _dec(col: str) -> F.Column:
    return F.col(col).cast("decimal(18,2)")


def ntz_epoch_instant(col: str) -> F.Column:
    """TIMESTAMP_NTZ -> TIMESTAMP (LTZ) whose instant is the NTZ wall
    clock read as UTC — **independent of the session timezone**, which a
    plain ``cast`` (and ``to_utc_timestamp``, which casts first) is not:
    both route through the session zone and shift every event-time
    window under a non-UTC driver session. ``timestampdiff`` on NTZ is
    pure wall-clock arithmetic and ``timestamp_micros`` constructs from
    epoch micros directly, so no zone is consulted. This is THE bridge
    for watermarking the engine's NTZ columns (``withWatermark`` needs
    an instant-typed event-time column)."""
    return F.expr(
        f"timestamp_micros(timestampdiff(MICROSECOND, "
        f"TIMESTAMP_NTZ'1970-01-01 00:00:00', {col}))"
    )


def tumbling_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    group_col: str = "event_type",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling-window counts + exact decimal sums per group."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), F.col(group_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            group_col,
            "n_events",
            "sum_value",
        )
    )


def sliding_avg(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Sliding-window (overlapping) aggregate: each event lands in
    duration/slide windows. avg = exact decimal sum / count, divided in
    double — identical operands cross-engine, so identical quotient."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("wstart"),
            F.col("w.end").alias("wend"),
            "n_events",
            (F.col("sum_value") / F.col("n_events")).alias("avg_value"),
        )
    )


def session_stats(
    df: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows: activity periods per key closed by ``gap`` of
    silence (`F.session_window` — dynamic, data-driven window bounds)."""
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(key_col),
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


STATEFUL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_types", LongType()),
        StructField("min_ts_us", LongType()),
        StructField("max_ts_us", LongType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("types", StringType()),  # sorted '\x1f'-joined set
        StructField("min_us", LongType()),
        StructField("max_us", LongType()),
    ]
)


def _user_stats_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Custom per-key stateful aggregate: running count, distinct event
    types, min/max event time (epoch micros). Emits the updated snapshot
    once per micro-batch."""
    if state.exists:
        n, types_s, mn, mx = state.get
        types: set[str] = set(types_s.split("\x1f")) if types_s else set()
    else:
        n, types, mn, mx = 0, set(), None, None
    for pdf in pdfs:
        n += len(pdf)
        types.update(pdf["event_type"].dropna().unique().tolist())
        # pin the unit: pandas/Arrow may deliver NTZ as datetime64[us]
        # or [ns] depending on version — normalize to ns before scaling
        us = pdf["ts"].astype("datetime64[ns]").astype("int64") // 1000
        lo, hi = int(us.min()), int(us.max())
        mn = lo if mn is None else min(mn, lo)
        mx = hi if mx is None else max(mx, hi)
    state.update((n, "\x1f".join(sorted(types)), mn, mx))
    yield pd.DataFrame(
        [(key[0], n, len(types), mn, mx)],
        columns=["user_id", "n_events", "n_types", "min_ts_us", "max_ts_us"],
    )


def stateful_user_stats(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Arbitrary stateful processing via ``applyInPandasWithState`` — the
    custom-operator escape hatch Structured Streaming offers when window
    built-ins can't express the semantics. State: one small tuple per key,
    Arrow-batched in and out."""
    return df.groupBy(key_col).applyInPandasWithState(
        _user_stats_fn,
        outputStructType=STATEFUL_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def batch_user_stats(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Batch twin of ``stateful_user_stats`` for equivalence testing —
    same output schema from plain aggregates."""
    us = F.expr("timestampdiff(MICROSECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', ts)")
    return df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("event_type").alias("n_types"),
        F.min(us).alias("min_ts_us"),
        F.max(us).alias("max_ts_us"),
    )
