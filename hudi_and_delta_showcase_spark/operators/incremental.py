"""Incremental aggregate maintenance over a change data feed.

The medallion pattern's expensive tier is GOLD: an aggregate table over
silver. Recomputing it per sync is O(silver); with a change data feed
(``LakehouseTable.read_changes``, pre- AND post-images) the aggregate is
maintained by RETRACTION instead: every change row contributes
``+1`` (insert, update_postimage) or ``-1`` (delete, update_preimage)
to its group's count, and ``±value`` to each tracked sum — so one
O(changes) pass produces per-group deltas and a broadcast-size merge
updates the state. This is the classic incremental view-maintenance
delta algebra (the same machinery streaming engines call retract
streams), and at 100 TB it is the difference between an hourly
full-table aggregation and a seconds-long delta apply.

Exactness: tracked sums run in DECIMAL — float retraction (x + v - v)
does not round-trip bit-exactly, decimal does, so the incrementally
maintained state equals a from-scratch recompute EXACTLY (tested, and
the oracle gate depends on it)."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: enough integer headroom for 1e20 row-sums; 6dp covers the fixtures'
#: 2dp values with margin
_DEC = "decimal(32,6)"


def agg_delta(
    changes: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """One CDF slice -> per-group (d_count, d_sum_<col>...) deltas.
    Map-side combinable single aggregation over O(changes) rows."""
    is_add = F.col("_change_type").isin("insert", "update_postimage")
    sign = F.when(is_add, F.lit(1)).otherwise(F.lit(-1))
    # Apply the sign via ``when`` AFTER a single decimal cast: a
    # ``sign_dec * value_dec`` product rides Spark's decimal-precision
    # reduction ((32,6)x(32,6)->(38,6)) whose behavior can depend on
    # session decimal settings; negation preserves the cast type exactly.
    aggs = [F.sum(sign).alias("d_count")] + [
        F.sum(
            F.when(is_add, F.col(c).cast(_DEC)).otherwise(
                -F.col(c).cast(_DEC)
            )
        ).alias(f"d_sum_{c}")
        for c in sum_cols
    ]
    return changes.groupBy(*group_cols).agg(*aggs)


def apply_delta(
    state: DataFrame | None,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Merge group deltas into the running (n, sum_<col>...) state.
    Groups whose count reaches zero drop out (their sums are exact
    zeros by decimal retraction). ``state=None`` starts empty.

    The join is keyed on the GROUP columns — state size is the group
    cardinality, not the table size, so at scale this is a small-table
    merge regardless of corpus volume."""
    if state is None:
        out = delta.select(
            *group_cols,
            F.col("d_count").alias("n"),
            *[
                F.col(f"d_sum_{c}").cast(_DEC).alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        return out.filter(F.col("n") > 0)
    joined = state.alias("s").join(
        delta.alias("d"), on=group_cols, how="full_outer"
    )
    zero = F.lit(0).cast(_DEC)
    out = joined.select(
        *group_cols,
        (
            F.coalesce(F.col("s.n"), F.lit(0))
            + F.coalesce(F.col("d.d_count"), F.lit(0))
        ).alias("n"),
        *[
            (
                F.coalesce(F.col(f"s.sum_{c}"), zero)
                + F.coalesce(F.col(f"d.d_sum_{c}"), zero)
            )
            .cast(_DEC)
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.filter(F.col("n") > 0)
