"""Deterministic sampling for training-data pipelines.

Every sampler here is HASH-based, not RNG-based: the keep/assign decision
is a pure function of the row's key, so results are (a) reproducible
across runs, engines, and cluster sizes, (b) stable under repartitioning,
and (c) exactly expressible in ANSI SQL for the DuckDB oracle — unlike
``df.sample()``, whose per-partition RNG stream changes with the physical
plan. This is how production corpus pipelines sample: membership must
survive re-runs and incremental appends.

Hash bucket: the first 12 hex digits of md5(key || seed) as a bigint
(48 bits < 2^53, exact in every engine). ``fraction`` keeps rows whose
bucket < fraction * 2**48.

Scale notes (100 TB):
* ``hash_sample`` / ``train_split`` are map-only (no shuffle) and
  whole-stage-codegen'd — they run at scan speed and push the *other*
  predicates down untouched.
* ``stratified_take`` is one shuffle on the strata key (window
  row_number over hash order). Per-stratum top-N with skewed strata is
  rank-bounded per task via the window's partial sort; for extreme
  heavy-hitter strata, pre-aggregate with a per-partition partial top-N
  first (same shape as topk).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window

#: 2^48 — the bucket space of a 12-hex-digit md5 prefix.
BUCKETS = 1 << 48


def hash_bucket(key: Column, seed: str = "") -> Column:
    """Deterministic 48-bit bucket for a key: uniform on [0, 2^48)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(seed)))
    return F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint")


def hash_sample(
    df: DataFrame, key: str, fraction: float, seed: str = ""
) -> DataFrame:
    """Keep a deterministic ``fraction`` of rows by key hash (map-only)."""
    return df.filter(
        hash_bucket(F.col(key), seed) < int(fraction * BUCKETS)
    )


def train_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float],
    seed: str = "",
    out_col: str = "split",
) -> DataFrame:
    """Assign each row to a named split (train/val/test) by hash range.

    ``weights`` maps split name -> fraction; fractions must sum to <= 1
    (any remainder falls into the LAST split). Assignment is a pure
    function of (key, seed): adding new rows later never reshuffles
    existing rows' splits — the property training pipelines need to
    avoid train/test contamination across corpus refreshes."""
    total = sum(weights.values())
    if not 0 < total <= 1.0 + 1e-9:
        raise ValueError(f"weights must sum to (0, 1], got {total}")
    bucket = hash_bucket(F.col(key), seed)
    expr: Column | None = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(cum * BUCKETS)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    out = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(out_col, out)


def stratified_take(
    df: DataFrame,
    strata_cols: list[str],
    n_per_stratum: int,
    key: str,
    seed: str = "",
) -> DataFrame:
    """Take exactly min(N, |stratum|) rows per stratum, chosen by hash
    order — a deterministic reservoir sample per group. One shuffle on
    the strata columns; ties broken by the key itself so the pick is
    total-ordered and engine-independent."""
    w = Window.partitionBy(*strata_cols).orderBy(
        hash_bucket(F.col(key), seed).asc(), F.col(key).asc()
    )
    return (
        df.withColumn("__srn", F.row_number().over(w))
        .filter(F.col("__srn") <= n_per_stratum)
        .drop("__srn")
    )


def temperature_mix(
    df: DataFrame,
    group_col: str,
    key: str,
    alpha: float,
    seed: str = "",
) -> DataFrame:
    """Temperature-based source/language rebalancing (the multilingual /
    multi-domain data-mixing step of LLM corpus builds): resample so
    group g's share follows n_g^alpha / sum(n^alpha) instead of its raw
    share — alpha=1 keeps proportions, alpha=0 equalizes groups, and the
    usual 0<alpha<1 upweights low-resource groups. Target size is the
    corpus size; per-group take is t_g = min(n_g, floor(total * w_g /
    sum(w))) — groups whose target exceeds their population are kept
    whole (no replication), the standard sampling-without-replacement
    variant.

    Membership is deterministic: within each group, rows are ranked by
    key hash (uniform, engine-independent) and the first t_g win — the
    same anti-contamination property as the other samplers here.

    Scale: per-group counts are one tiny aggregate (|groups| rows);
    targets are computed as column expressions on that aggregate (never
    collected) and broadcast-joined back; the final filter is one window
    shuffle on the group key. The pow/floor arithmetic is the SAME
    expression tree the DuckDB oracle runs, so targets agree exactly.
    """
    n = F.col("__n").cast("double")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
    w = F.pow(n, F.lit(float(alpha)))
    tot = Window.partitionBy()  # |groups| rows — bounded, never row data
    targets = counts.select(
        group_col,
        F.col("__n"),
        F.least(
            F.col("__n"),
            F.floor(F.sum("__n").over(tot) * w / F.sum(w).over(tot)).cast(
                "bigint"
            ),
        ).alias("__take"),
    )
    rank_w = Window.partitionBy(group_col).orderBy(
        hash_bucket(F.col(key), seed).asc(), F.col(key).asc()
    )
    return (
        df.join(F.broadcast(targets), on=group_col)
        .withColumn("__trn", F.row_number().over(rank_w))
        .filter(F.col("__trn") <= F.col("__take"))
        .drop("__n", "__take", "__trn")
    )
