"""Training-sequence packing: lay documents out in a deterministic
pseudo-random order, concatenate them into one token stream, and cut the
stream into fixed-budget training sequences (the GPT-style pack-and-chunk
a pre-training dataloader performs, done once at corpus-build time so the
loader becomes a dumb sequential reader).

Each document gets its absolute ``start_offset`` in the stream and the
``seq_first``/``seq_last`` training-sequence ids it spans (a document
crosses a boundary rather than leaving pad slack — the standard
concatenation regime).

The core primitive is a GLOBAL running sum. The naive Spark spelling —
``SUM() OVER (ORDER BY k)`` with no PARTITION BY — collapses the whole
corpus into ONE window partition: a single-task sort that dies at 100 TB.
This implementation is the scale-safe two-phase form:

1. range-repartition + sort within partitions on the order key (the
   same machinery as a global sort — parallel, spills fine);
2. one tiny aggregation computes PER-PARTITION token sums; the P partial
   sums (P = shuffle partitions, a few thousand at most) come to the
   driver and prefix-sum in O(P);
3. an Arrow ``mapInPandas`` pass streams each partition once, adding its
   broadcast prefix to a local cumulative sum — map-only, no second
   shuffle.

The materialized projection between phase 1 and 3 is pinned with
``localCheckpoint`` so both passes see identical partitioning (range
boundaries come from sampling; without pinning, phases could disagree).
At 100 TB you would swap the checkpoint for a temp-table write — same
plan shape, one extra column-pruned pass either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def packed_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Assign every document its offset and sequence span in the packed
    stream. Order is md5(id) — deterministic, engine-independent, and a
    good corpus shuffle (adjacent source docs land far apart).

    Output: ``(id_col, n_tokens, start_offset, seq_first, seq_last)``
    with ``seq = start_offset div budget`` boundaries; empty documents
    occupy their start sequence."""
    if budget <= 0:
        raise ValueError("budget must be positive")
    key = F.md5(F.col(id_col).cast("string"))
    slim = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        key.alias("__k"),
    )
    n_parts = partitions or slim.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ordered = (
        slim.repartitionByRange(int(n_parts), "__k")
        .sortWithinPartitions("__k")
        .localCheckpoint()  # pin partitioning for the two passes below
    )

    # phase 2: P partial sums -> driver prefix-sum (bounded metadata)
    partials = {
        r.pid: r.s
        for r in ordered.groupBy(
            F.spark_partition_id().alias("pid")
        )
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    prefix: dict[int, int] = {}
    running = 0
    for pid in sorted(partials):
        prefix[pid] = running
        running += partials[pid]

    # output schema: the input id field + fixed long columns
    id_field = ordered.schema[id_col]
    out_schema = (
        f"{id_field.name} {id_field.dataType.simpleString()}, "
        "n_tokens long, start_offset long"
    )

    def add_offsets(
        pdfs: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        local = prefix.get(pid, 0)
        for pdf in pdfs:
            csum = pdf["n_tokens"].cumsum()
            start = local + csum - pdf["n_tokens"]
            local += int(pdf["n_tokens"].sum())
            yield pd.DataFrame(
                {
                    id_field.name: pdf[id_field.name],
                    "n_tokens": pdf["n_tokens"],
                    "start_offset": start.astype("int64"),
                }
            )

    with_off = ordered.mapInPandas(add_offsets, schema=out_schema)
    return (
        with_off.withColumn(
            "seq_first", F.expr(f"start_offset div {int(budget)}")
        )
        .withColumn(
            "seq_last",
            F.expr(
                f"(start_offset + greatest(n_tokens, 1L) - 1L) "
                f"div {int(budget)}"
            ),
        )
    )


def budget_select(
    df: DataFrame,
    id_col: str,
    token_col: str,
    order_col: str,
    budget: int,
    partitions: int | None = None,
) -> DataFrame:
    """Data selection under a token budget: take documents in priority
    order (``order_col`` ascending — e.g. LM cross-entropy, so best
    first) until the cumulative token count exceeds ``budget`` — the
    quality-ranked corpus-size cut of LLM dataset builds.

    Same scale-safe two-phase global cumsum as ``packed_sequences``
    (range sort on the priority key, P driver-side partial sums, one
    Arrow map pass) — never a single-partition ``SUM() OVER (ORDER
    BY)``. Ties break on the id so the cut is total-ordered and
    engine-independent.

    Output: ``(id_col, n_tokens, cum_tokens)`` for selected documents
    (those whose INCLUSIVE cumulative count stays within budget).
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    slim = df.select(
        F.col(id_col),
        F.col(token_col).cast("long").alias("n_tokens"),
        F.col(order_col).alias("__o"),
    )
    n_parts = partitions or slim.sparkSession.conf.get(
        "spark.sql.shuffle.partitions", "32"
    )
    ordered = (
        slim.repartitionByRange(int(n_parts), "__o", id_col)
        .sortWithinPartitions("__o", id_col)
        .localCheckpoint()
    )
    partials = {
        r.pid: r.s
        for r in ordered.groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    prefix: dict[int, int] = {}
    running = 0
    for pid in sorted(partials):
        prefix[pid] = running
        running += partials[pid]

    id_field = ordered.schema[id_col]
    out_schema = (
        f"{id_field.name} {id_field.dataType.simpleString()}, "
        "n_tokens long, cum_tokens long"
    )

    def add_cum(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pyspark

        pid = pyspark.TaskContext.get().partitionId()
        base = prefix.get(pid, 0)
        for pdf in it:
            cum = base + pdf["n_tokens"].cumsum()
            base = int(cum.iloc[-1]) if len(cum) else base
            out = pd.DataFrame(
                {
                    id_field.name: pdf[id_field.name],
                    "n_tokens": pdf["n_tokens"],
                    "cum_tokens": cum,
                }
            )
            yield out[out["cum_tokens"] <= budget]

    return ordered.mapInPandas(add_cum, out_schema)
