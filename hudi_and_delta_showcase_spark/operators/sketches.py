"""Frequent-items (heavy hitters) over an unbounded token domain.

The 100 TB problem: "which tokens/domains/ngrams exceed phi of the
corpus" with a naive ``groupBy(token).count()`` shuffles the ENTIRE
vocabulary — billions of distinct keys, almost all of which are
irrelevant tail. The classic two-phase answer (Misra-Gries / Space-
Saving, made distributed by the mergeable-summaries result of Agarwal
et al., PODS'12):

1. **Sketch pass (map-only)**: each partition maintains a capacity-k
   Misra-Gries summary. Vectorized: per Arrow batch a C-speed
   ``value_counts``, merged into the partition summary with the MG
   trim (subtract the (k+1)-th largest count from all, drop <=0) —
   never a per-token Python loop. Each partition emits <= k summary
   rows plus ONE null-token row carrying the partition's exact total,
   so the stream total rides the same scan instead of a third pass.
2. **Candidate union**: the union of partition summaries is a SUPERSET
   of the merged-MG summary, so the pigeonhole guarantee survives:
   every token with global count >= N/k appears in at least one
   partition summary. Candidates are tiny (<= k * partitions),
   localCheckpoint'd once (they feed two consumers), and broadcast.
3. **Exact verify pass**: re-scan the token stream filtered to
   candidates (broadcast hash join — the tail never shuffles) and
   count exactly; keep counts >= threshold. Map-side partial
   aggregation bounds the shuffle at partitions x |candidates| rows.

Exactly two map-only scans of the token stream, no materialization of
it (at scale the exploded token stream dwarfs the source; recomputing
the tokenize-explode is cheaper than storing it). The output is EXACT
(same contract as the repo's other sketch gates: the sketch prunes,
the exact pass answers), provided ``capacity >= 1/min_share`` —
enforced with a loud check rather than a silent recall loss.

Reference scope note: the reference has no sketch surface at all; this
is north-star LLM-pipeline tooling (frequent-token stats feed stopword
lists, boilerplate detection, and domain mixing decisions).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def mg_partials(tokens: DataFrame, token_col: str, capacity: int) -> DataFrame:
    """Per-partition capacity-``capacity`` Misra-Gries summaries:
    ``(token, cnt_lower)`` rows (<= capacity per partition; cnt_lower
    undercounts by at most partition-N/capacity — used only for
    candidate selection, never reported) plus one ``(NULL, exact
    partition total)`` row."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        summary = pd.Series(dtype="int64")
        n_total = 0
        for pdf in batches:
            n_total += len(pdf)
            counts = pdf[token_col].value_counts()
            summary = summary.add(counts, fill_value=0)
            if len(summary) > capacity:
                # MG trim: decrement all by the (k+1)-th largest and
                # drop non-positive — the mergeable-summaries merge
                kth = summary.nlargest(capacity + 1).iloc[-1]
                summary = summary - kth
                summary = summary[summary > 0]
        out = pd.DataFrame(
            {
                "token": summary.index.astype(str),
                "cnt_lower": summary.values.astype("int64"),
            }
        )
        total_row = pd.DataFrame({"token": [None], "cnt_lower": [n_total]})
        yield pd.concat([out, total_row], ignore_index=True)

    return tokens.select(
        F.col(token_col).cast("string").alias(token_col)
    ).mapInPandas(summarize, "token string, cnt_lower long")


def heavy_hitters(
    tokens: DataFrame,
    token_col: str,
    min_share: float,
    capacity: int = 8192,
) -> DataFrame:
    """Tokens whose exact occurrence count is >= ``min_share`` of the
    total stream, with exact counts — via the two-phase sketch+verify
    plan documented in the module docstring.

    Completeness is guaranteed when ``capacity >= 1 / min_share`` (then
    N/capacity <= min_share * N, so no qualifying token can be trimmed
    out of every partition summary); smaller capacities are refused
    loudly instead of silently losing recall.

    Returns ``(token, cnt, share)`` with exact values; ordering is the
    caller's concern."""
    if capacity < 1.0 / min_share:
        raise ValueError(
            f"capacity {capacity} cannot guarantee recall at "
            f"min_share {min_share}: need >= {1.0 / min_share:.0f}"
        )
    toks = tokens.select(F.col(token_col).cast("string").alias(token_col))
    # tiny (<= capacity * partitions + partitions rows): materialize
    # once for its two consumers instead of re-running the sketch scan
    partials = mg_partials(toks, token_col, capacity).localCheckpoint()
    candidates = partials.filter(F.col("token").isNotNull()).select("token").distinct()
    total = partials.filter(F.col("token").isNull()).agg(
        F.sum("cnt_lower").alias("n_total")
    )
    exact = (
        toks.join(
            F.broadcast(candidates),
            toks[token_col] == candidates["token"],
            "inner",
        )
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") >= F.col("n_total") * F.lit(min_share))
        .select(
            "token",
            "cnt",
            F.round(F.col("cnt") / F.col("n_total"), 6).alias("share"),
        )
    )
