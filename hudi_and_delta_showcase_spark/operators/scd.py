"""Slowly-changing-dimension maintenance (SCD Type 2) over the
lakehouse table: every change to a natural key CLOSES the key's current
version row (``effective_to`` set, ``is_current`` false) and APPENDS a
new current row — the warehouse pattern Delta documents as its canonical
``MERGE`` example and the reference's dimension-handling idiom for the
MySQL->lakehouse loop (/root/reference/README.md:1213-1224 exercises the
same MERGE machinery this builds on).

Scale shape (one batch application):

1. latest-change-per-key inside the batch — one window over the batch
   (the batch, never the table);
2. current-row lookup — ``read_where(is_current, True, True)``: files
   whose footer says they hold only history are SKIPPED driver-side
   (after rewrites cycle, history concentrates in all-false files), then
   a key semi-join against the batch (AQE broadcasts the smaller side);
3. one upsert carrying close-outs + new rows — partition/bucket/range/
   bloom pruning applies as on any upsert; the close-out rows hit the
   key (natural key, effective_from) of the row they replace.

Assumes batches arrive in event-time order (the standard SCD2 loader
contract): a change older than the key's current ``effective_from`` is
DROPPED rather than splicing history (splice-on-late-arrival is a
rebuild-the-key operation, not an incremental apply).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from hudi_and_delta_showcase_spark.tables import LakehouseTable

SCD2_META = ["effective_from", "effective_to", "is_current"]


def scd2_prepare(
    batch: DataFrame,
    natural_key: str,
    ts_col: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """Latest change per natural key within the batch, shaped as SCD2
    version rows (``effective_from`` = change ts, open-ended,
    current)."""
    order = [F.desc(ts_col)] + [F.desc(t) for t in tiebreakers or []]
    w = Window.partitionBy(natural_key).orderBy(*order)
    return (
        batch.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumn("effective_from", F.col(ts_col))
        .withColumn(
            "effective_to", F.lit(None).cast(batch.schema[ts_col].dataType)
        )
        .withColumn("is_current", F.lit(True))
    )


def scd2_create(
    spark,
    path: str,
    batch: DataFrame,
    natural_key: str,
    ts_col: str,
    tiebreakers: list[str] | None = None,
    **create_kwargs,
) -> LakehouseTable:
    """Create an SCD2 dimension table from the first change batch. The
    table key is (natural key, effective_from) — one row per VERSION —
    with no precombine: commit order resolves re-applied versions."""
    rows = scd2_prepare(batch, natural_key, ts_col, tiebreakers)
    return LakehouseTable.create(
        spark,
        path,
        rows,
        key_cols=[natural_key, "effective_from"],
        precombine=None,
        **create_kwargs,
    )


def scd2_apply(
    table: LakehouseTable,
    batch: DataFrame,
    natural_key: str,
    ts_col: str,
    tiebreakers: list[str] | None = None,
):
    """Apply one change batch to an SCD2 dimension: close out the
    touched keys' current rows, insert the new current versions — ONE
    upsert commit (close-outs and new rows have distinct
    (key, effective_from) keys, so they ride the same atomic commit)."""
    new_rows = scd2_prepare(batch, natural_key, ts_col, tiebreakers)
    cur = (
        table.read_where("is_current", True, True)
        .filter(F.col("is_current"))
        .select(*new_rows.columns)
        .alias("c")
    )
    incoming = new_rows.select(
        F.col(natural_key).alias("__nk"),
        F.col("effective_from").alias("__new_from"),
    ).alias("n")
    closeouts = (
        cur.join(incoming, F.col(natural_key) == F.col("__nk"), "inner")
        # ordered-batch contract: only close rows the change supersedes
        .filter(F.col("__new_from") > F.col("effective_from"))
        .withColumn("effective_to", F.col("__new_from"))
        .withColumn("is_current", F.lit(False))
        .drop("__nk", "__new_from")
    )
    # drop changes older than the key's current version (see module doc)
    stale = (
        cur.select(
            F.col(natural_key).alias("__nk"),
            F.col("effective_from").alias("__cur_from"),
        )
    )
    fresh = (
        new_rows.join(
            stale, new_rows[natural_key] == F.col("__nk"), "left"
        )
        .filter(
            F.col("__cur_from").isNull()
            | (F.col("effective_from") > F.col("__cur_from"))
        )
        .drop("__nk", "__cur_from")
    )
    return table.upsert(closeouts.unionByName(fresh))
