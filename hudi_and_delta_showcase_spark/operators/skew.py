"""Skew-mitigation operators (SURVEY.md §4 / SCALE.md).

AQE's skew-join splitting handles most shuffle skew automatically; these
are the explicit tools for the cases AQE can't see:

* ``salted_agg`` — two-stage aggregation for hot GROUP BY keys: partial
  aggregate on (key, salt) spreads one hot key over ``buckets`` reducers,
  then a final aggregate on the key merges the partials. Only valid for
  decomposable aggregates (sum/count/min/max — exposed as named specs).
* ``replicated_salt_join`` — shuffle join where one side has hot keys:
  the big side salts each row deterministically, the small side is
  replicated across all salt values; the join key becomes (key, salt) so
  a hot key spreads over ``buckets`` tasks. For genuinely small sides
  prefer ``broadcast()`` — this is for the mid-size case (too big to
  broadcast, small enough to replicate ``buckets``-fold).

Salts are DETERMINISTIC (hash of a designated column, never rand()) so
results are reproducible and retried tasks are consistent.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: decomposable aggregate specs: name -> (partial_expr, final_expr)
_DECOMPOSABLE = {
    "count": (
        lambda c: F.count(F.lit(1)),
        lambda p: F.sum(p).cast("long"),
    ),
    "sum": (lambda c: F.sum(c), lambda p: F.sum(p)),
    "min": (lambda c: F.min(c), lambda p: F.min(p)),
    "max": (lambda c: F.max(c), lambda p: F.max(p)),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_col: str,
    buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output name -> (agg_fn, input_col) with agg_fn in
    {count,sum,min,max}; ``salt_col`` is any column whose hash spreads
    the hot key's rows (an id/timestamp column — NOT one of ``keys``).

    Equivalent to ``df.groupBy(keys).agg(...)`` for decomposable
    aggregates; the extra partial stage caps any single reducer's input
    at ~|hot key| / buckets rows."""
    for name, (fn, _col) in aggs.items():
        if fn not in _DECOMPOSABLE:
            raise ValueError(f"{name}: '{fn}' is not decomposable")
    salt = F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets)).alias("__salt")
    partial = df.groupBy(*keys, salt).agg(
        *[
            _DECOMPOSABLE[fn][0](F.col(col)).alias(f"__p_{name}")
            for name, (fn, col) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            _DECOMPOSABLE[fn][1](F.col(f"__p_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )


def replicated_salt_join(
    big: DataFrame,
    small: DataFrame,
    key_cols: list[str],
    salt_col: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe shuffle join: ``big`` rows get a deterministic salt from
    ``salt_col``; ``small`` is exploded across all ``buckets`` salt
    values; the shuffle key becomes (key, salt)."""
    salted_big = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(salt_col)), F.lit(buckets))
    )
    replicated = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)).cast("array<long>")),
    )
    return (
        salted_big.join(replicated, [*key_cols, "__salt"], how)
        .drop("__salt")
    )
