"""As-of (point-in-time) join — the timeseries operator Spark's built-in
join strategies don't provide directly.

For each left row, find the single latest right row with the same key and
``right_ts <= left_ts``. A naive range join explodes to |matches| pairs
before picking the latest; this implementation uses the union trick:

    tag left(src=1) and right(src=0) rows -> union -> ONE window per key
    ordered by (ts, src, tiebreak) -> last(right-col, ignorenulls) carries
    the most recent right values forward -> keep left rows.

Cost: one shuffle on the key + one window pass — O(n log n) per key
group, never a pair explosion, skew-safe under AQE like any single-key
window. Equal timestamps: src=0 sorts before src=1, so a right row at
exactly left_ts IS visible (>= semantics, matching DuckDB's ASOF JOIN).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    tiebreak: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Point-in-time join. ``right_vals`` are the right columns carried
    onto each left row (plus ``right_ts`` as ``asof_ts``). ``tiebreak``
    orders right rows sharing (key, ts) — pre-dedup the right side if it
    can hold true duplicates. ``how='left'`` keeps unmatched left rows
    with nulls; ``'inner'`` drops them."""
    rcols = [right_ts, *right_vals]
    r = right.select(
        F.col(right_key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.col(right_ts).alias("__r_asof_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_vals],
        *(
            [F.col(tiebreak).alias("__tb")]
            if tiebreak
            else [F.lit(0).alias("__tb")]
        ),
    )
    l = left.select(
        "*",
        F.col(left_key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__src"),
        F.lit(0).alias("__tb"),
    )
    unioned = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("__k")
        .orderBy(F.asc("__ts"), F.asc("__src"), F.asc("__tb"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("__r_asof_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in right_vals
        ],
    )
    out = carried.filter(F.col("__src") == 1).drop(
        "__k", "__ts", "__src", "__tb", "__r_asof_ts",
        *[f"__r_{c}" for c in right_vals],
    )
    if how == "inner":
        out = out.filter(F.col("asof_ts").isNotNull())
    return out
