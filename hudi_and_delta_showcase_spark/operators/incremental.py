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


def join_view_apply(
    view,
    fact,
    dim,
    fk: str,
    dim_key: str,
    dim_attrs: list[str],
    fact_since: int = 0,
    dim_since: int = 0,
):
    """Incremental maintenance of a materialized JOIN view (the silver
    enrichment tier of the medallion pattern): ``view`` materializes
    ``fact JOIN dim ON fact.fk = dim.dim_key`` keyed by the FACT key,
    and one apply folds in both tables' change feeds:

    * fact inserts/updates -> their post-images re-enrich against the
      CURRENT dim and upsert (O(fact changes));
    * fact deletes -> view deletes (O(deletes));
    * dim changes -> every fact row referencing a changed dim key
      re-enriches (the classic delta-join term A ⋈ ΔB): a semi-join of
      the fact against the changed-key set — broadcast when small —
      then the same enrich+upsert. The fact-side lookup prunes like
      any fact scan (cluster the fact by ``fk`` to make it
      O(matching files)); everything downstream is O(affected rows).

    Both feeds in ONE view upsert commit: a fact row that was both
    changed and dim-refreshed resolves through the view's normal
    precombine path. This is standard incremental view maintenance
    (ΔV = ΔA⋈B ∪ A⋈ΔB with upsert-by-key replacing retraction —
    exact because the view key is the fact key), the join analogue of
    ``agg_delta``/``apply_delta``'s aggregate IVM."""
    fact_cols = [
        c for c in view.read().columns
        if not c.startswith("_hoodie") and c not in dim_attrs
    ]

    def _changes(t, since):
        try:
            return t.read_changes(since)
        except ValueError:
            return None

    fc = _changes(fact, fact_since)
    parts = []
    del_keys = None
    if fc is not None:
        parts.append(
            fc.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).select(*fact_cols)
        )
        # Delete handling is gated on DRIVER-SIDE commit metadata (r8):
        # delete change rows only ever come from action="delete"
        # commits, so when the consumed window has none — the common
        # append/update sync — the delete branch costs zero jobs
        # instead of a CDF aggregation + probe per apply.
        has_deletes = any(
            c.action == "delete" and c.version >= fact_since
            for c in fact.history()
        )
        if has_deletes:
            # Delete only keys whose LATEST change in the consumed
            # window is a delete: a key deleted then re-inserted within
            # the same window is upserted by `parts` and must NOT be
            # removed afterwards (delete runs after the upsert below).
            # One groupBy over the already-read feed — O(changes), no
            # extra scan.
            kc = [c for c in fact_cols if c in view.key_cols]
            last = fc.groupBy(*kc).agg(
                F.max(
                    F.when(
                        F.col("_change_type") == "delete",
                        F.col("_commit_version"),
                    )
                ).alias("__del_v"),
                F.max(
                    F.when(
                        F.col("_change_type").isin(
                            "insert", "update_postimage"
                        ),
                        F.col("_commit_version"),
                    )
                ).alias("__up_v"),
            )
            del_keys = last.filter(
                F.col("__del_v").isNotNull()
                & (
                    F.col("__up_v").isNull()
                    | (F.col("__del_v") > F.col("__up_v"))
                )
            ).select(*kc)
    dc = _changes(dim, dim_since)
    if dc is not None:
        changed = dc.filter(
            F.col("_change_type").isin(
                "insert", "update_postimage", "delete"
            )
        ).select(F.col(dim_key).alias("__ck")).distinct()
        # no forced broadcast: the changed-key set is usually tiny (AQE
        # broadcasts it from its measured size) but a dim backfill can
        # legitimately touch millions of keys
        refresh = fact.read().join(
            changed,
            F.col(fk) == F.col("__ck"),
            "left_semi",
        ).select(*fact_cols)
        parts.append(refresh)
    if not parts and (del_keys is None):
        return None
    commit = None
    if parts:
        affected = parts[0]
        for p in parts[1:]:
            affected = affected.unionByName(p)
        enriched = affected.join(
            dim.read().select(
                F.col(dim_key).alias("__dk"), *dim_attrs
            ),
            F.col(fk) == F.col("__dk"),
            "left",
        ).drop("__dk")
        # the upsert consumes its source several times (affected-file
        # probes, key broadcast, the write); a lazy localCheckpoint
        # pays the two-scan enrich join ONCE at O(changes) size instead
        # of re-executing it per consumer
        commit = view.upsert(enriched.localCheckpoint(eager=False))
    if del_keys is not None and del_keys.limit(1).count() > 0:
        commit = view.delete(del_keys)
    return commit
