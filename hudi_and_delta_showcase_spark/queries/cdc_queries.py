"""CDC / upsert / lakehouse queries (SURVEY.md §2.9) wired into the
driver's DuckDB-oracle gate.

Trick: the ``events`` table plays the CDC stream (key=user_id,
precombine=ts, tiebreak=event_id). A base snapshot is built from events
before CUTOFF, the post-CUTOFF slice is the incremental batch, and each
lakehouse read path's post-state is then expressible as ANSI window SQL
over the raw events table:

* CoW post-upsert state == latest-per-key over ALL events
* MoR ``_ro``           == latest-per-key over pre-CUTOFF events (stale)
* MoR ``_rt``           == latest-per-key over ALL events (fresh)
* time travel to v0     == latest-per-key over pre-CUTOFF events

These queries run the REAL table machinery (write parquet + manifests to a
temp dir, upsert, read back) — the oracle checks the whole pipeline, not a
shortcut DataFrame. That is the strongest correctness statement available
for non-ANSI operators (SURVEY §7 "oracle expressibility").
"""

from __future__ import annotations

import json
import os
import tempfile
import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators.upsert import merge_routing
from hudi_and_delta_showcase_spark.queries.registry import query
from hudi_and_delta_showcase_spark.tables import LakehouseTable

CUTOFF = "2024-01-20 00:00:00"

_FINAL_COLS = ["event_id", "user_id", "ts", "event_type", "value"]

_LATEST_ALL_SQL = """
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
"""

_LATEST_PRE_CUTOFF_SQL = f"""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
"""


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    cutoff = F.lit(CUTOFF).cast("timestamp_ntz")
    return events.filter(F.col("ts") < cutoff), events.filter(
        F.col("ts") >= cutoff
    )


#: (applicationId, sf_dir) -> prototype path for _clone_base_table
_BASE_PROTO_CACHE: dict[tuple[str, str], str] = {}


def _clone_base_table(spark: SparkSession, sf_dir: str) -> LakehouseTable:
    """Shared harness fixture for the SQL-MERGE variants (r10, sweep-
    cost trim): the (pre-cutoff events, key user_id, precombine ts,
    tiebreaker event_id) prototype builds ONCE per session+sf_dir and
    every caller takes a SHALLOW CLONE — O(metadata) per query instead
    of a full table rewrite. Clones diverge independently (rewrites
    land under the clone; the prototype is never mutated or vacuumed
    within the session), so each variant's merge semantics are exactly
    what a fresh table would give — pinned against the same oracles."""
    key = (spark.sparkContext.applicationId, sf_dir)
    proto = _BASE_PROTO_CACHE.get(key)
    if proto is None:
        base, _ = _split(spark, sf_dir)
        proto = tempfile.mkdtemp(prefix="lakehouse_proto_") + "/events_tbl"
        LakehouseTable.create(
            spark, proto, base,
            key_cols=["user_id"], precombine="ts",
            tiebreakers=["event_id"],
        )
        _BASE_PROTO_CACHE[key] = proto
    path = tempfile.mkdtemp(prefix="lakehouse_clone_") + "/events_tbl"
    return LakehouseTable.clone(spark, proto, path)


def _make_table(
    spark: SparkSession, sf_dir: str, table_type: str
) -> LakehouseTable:
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix=f"lakehouse_{table_type}_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        table_type=table_type,
    )
    t.upsert(incr)
    return t


@query(
    "cdc_upsert_cow_roundtrip",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "upsert"),
    bench=True,
)
def cdc_upsert_cow_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 end-to-end: create CoW table from the pre-cutoff snapshot, upsert
    the post-cutoff batch (precombine dedup inside), read the merged base
    back from disk. Post-state must equal latest-per-key over all events."""
    t = _make_table(spark, sf_dir, "cow")
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_time_travel",
    oracle=_LATEST_PRE_CUTOFF_SQL,
    tags=("cdc", "table"),
)
def cdc_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: after the upsert commit, version 0 still reads the pre-merge
    snapshot (Hudi commit timeline / Delta versionAsOf semantics)."""
    t = _make_table(spark, sf_dir, "cow")
    return t.read(version=0).select(*_FINAL_COLS)


@query(
    "cdc_upsert_mor_rt",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "upsert"),
    bench=True,
)
def cdc_upsert_mor_rt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/S5: MoR real-time view — base ∪ log merged at scan time; fresh
    values visible without compaction (README.md:920 `_rt`)."""
    t = _make_table(spark, sf_dir, "mor")
    return t.read_rt().select(*_FINAL_COLS)


@query(
    "cdc_upsert_mor_ro",
    oracle=_LATEST_PRE_CUTOFF_SQL,
    tags=("cdc", "table"),
)
def cdc_upsert_mor_ro(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3/S5: MoR read-optimized view — serves the STALE base after an
    upsert (README.md:920 `_ro`: samsung still 20)."""
    t = _make_table(spark, sf_dir, "mor")
    return t.read_ro().select(*_FINAL_COLS)


@query(
    "cdc_mor_compacted",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "maintenance"),
)
def cdc_mor_compacted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 compaction: after compact(), the read-optimized view catches up
    to the real-time view (README.md:605,918)."""
    t = _make_table(spark, sf_dir, "mor")
    t.compact()
    return t.read_ro().select(*_FINAL_COLS)


@query(
    "cdc_optimize_vacuum",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "maintenance"),
)
def cdc_optimize_vacuum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7/D8: OPTIMIZE (small-file compaction) then VACUUM (drop
    unreferenced files) preserve the snapshot exactly (README.md:1240)."""
    t = _make_table(spark, sf_dir, "cow")
    t.optimize(target_files=4)
    t.vacuum(retain_versions=1)
    return t.read().select(*_FINAL_COLS)


_LATEST_POST_CUTOFF_SQL = f"""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
"""


@query(
    "cdc_incremental_pull",
    oracle=_LATEST_POST_CUTOFF_SQL,
    tags=("cdc", "table"),
)
def cdc_incremental_pull(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi incremental query (README.md:576 "Snapshot and Incremental
    Data"): after the v1 upsert, pull only records changed since v0 —
    the latest state of every key the incremental batch touched, i.e.
    latest-per-key over the post-cutoff events. The pushed-down
    ``_hoodie_commit_time`` range predicate makes the pull O(changed
    data) at scale (row-group skipping on time-ordered commit files)."""
    t = _make_table(spark, sf_dir, "cow")
    return t.read_incremental(begin_version=0).select(*_FINAL_COLS)


@query(
    "cdc_merge_routing",
    oracle=f"""
    SELECT s.event_id, s.user_id,
           CASE WHEN t.user_id IS NOT NULL THEN 'update' ELSE 'insert' END
             AS merge_action
    FROM (SELECT * FROM events WHERE ts >= TIMESTAMP '{CUTOFF}') s
    LEFT JOIN (SELECT DISTINCT user_id FROM events
               WHERE ts < TIMESTAMP '{CUTOFF}') t
      ON s.user_id = t.user_id
    """,
    tags=("cdc", "join"),
)
def cdc_merge_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6/J3: tag each incoming row update vs insert — the WHEN MATCHED /
    WHEN NOT MATCHED routing of MERGE INTO (README.md:1223-1224)."""
    base, incr = _split(spark, sf_dir)
    return merge_routing(base, incr, ["user_id"]).select(
        "event_id", "user_id", "merge_action"
    )


@query(
    "cdc_soft_delete_state",
    oracle="""
    SELECT user_id, event_id, is_deleted FROM (
      SELECT user_id, event_id,
             (event_type = 'error') AS is_deleted,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc",),
)
def cdc_soft_delete_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 soft delete: tombstones (here: event_type='error') are UPSERTED,
    not removed — the final state retains them with a marker, exactly as
    the reference keeps pk 3 'dell' (README.md:511-531,1222-1224)."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup

    latest = precombine_dedup(events, ["user_id"], "ts", ["event_id"])
    return latest.select(
        "user_id", "event_id", (F.col("event_type") == "error").alias("is_deleted")
    )


@query(
    "cdc_hard_delete_state",
    oracle="""
    SELECT user_id, event_id FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("cdc",),
)
def cdc_hard_delete_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 hard-delete variant (`whenMatchedDelete`): keys whose latest
    change is a tombstone drop out of the final state."""
    from hudi_and_delta_showcase_spark.operators.upsert import upsert

    base, incr = _split(spark, sf_dir)
    merged = upsert(
        base.withColumn("__del", F.col("event_type") == "error"),
        incr.withColumn("__del", F.col("event_type") == "error"),
        ["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        hard_delete_col="__del",
    )
    return merged.select("user_id", "event_id")


@query(
    "sql_merge_schema_evolution",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    inc AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT event_id, user_id, ts, event_type, value, 'cdc' AS src_tag
    FROM inc
    UNION ALL
    SELECT b.event_id, b.user_id, b.ts, b.event_type, b.value,
           CAST(NULL AS VARCHAR) AS src_tag
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM inc WHERE inc.user_id = b.user_id)
    """,
    tags=("cdc", "table", "sql", "merge"),
)
def sql_merge_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``MERGE WITH SCHEMA EVOLUTION INTO`` (r8, Delta's explicit
    opt-in clause): the CDC batch carries a column the target never
    had (``src_tag``); with the clause, the star-actions ADD it to the
    target via additive evolution inside the upsert, rows the batch
    never touched read it back as null, and the statement WITHOUT the
    clause would have dropped the column entirely (pinned in
    ``tests/test_merge_sql.py``). The oracle derives the same final
    table from the raw events."""
    from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    _base, incr = _split(spark, sf_dir)
    t = _clone_base_table(spark, sf_dir)
    precombine_dedup(
        incr, ["user_id"], "ts", ["event_id"]
    ).withColumn("src_tag", F.lit("cdc")).createOrReplaceTempView(
        "events_cdc_sev_src"
    )
    execute_merge(
        spark,
        """MERGE WITH SCHEMA EVOLUTION INTO events_tbl t
           USING events_cdc_sev_src s
           ON t.user_id = s.user_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *""",
        {"events_tbl": t},
    )
    return t.read().select(
        "event_id", "user_id", "ts", "event_type", "value", "src_tag"
    )


@query(
    "sql_merge_into",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    inc AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT event_id, user_id, ts, event_type, value
    FROM inc WHERE event_type <> 'error'
    UNION ALL
    SELECT b.event_id, b.user_id, b.ts, b.event_type, b.value
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM inc WHERE inc.user_id = b.user_id)
    """,
    tags=("cdc", "table", "sql", "merge"),
)
def sql_merge_into(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's literal MERGE statement (README.md:1213-1224)
    against the engine: C5-reduce the CDC batch to latest-change-per-key,
    then run conditional-DELETE/UPDATE/INSERT clauses as one SQL string
    through tables.merge_sql (clause routing + pruned upsert/delete).
    Keys whose latest change is a tombstone (event_type='error') drop;
    the rest upsert — the hard-delete MERGE variant the reference's
    soft-delete merge deliberately omits."""
    from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    _base, incr = _split(spark, sf_dir)
    t = _clone_base_table(spark, sf_dir)
    precombine_dedup(
        incr, ["user_id"], "ts", ["event_id"]
    ).createOrReplaceTempView("events_cdc_merge_src")
    execute_merge(
        spark,
        """MERGE INTO events_tbl t USING events_cdc_merge_src s
           ON t.user_id = s.user_id
           WHEN MATCHED AND s.event_type = 'error' THEN DELETE
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED AND s.event_type <> 'error' THEN INSERT *""",
        {"events_tbl": t},
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "sql_merge_by_source_update",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    inc AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT event_id, user_id, ts, event_type, value FROM inc
    UNION ALL
    SELECT b.event_id, b.user_id,
           b.ts + INTERVAL 1 SECOND AS ts,
           'stale' AS event_type, b.value
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM inc WHERE inc.user_id = b.user_id)
    """,
    tags=("cdc", "table", "sql", "merge"),
)
def sql_merge_by_source_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``WHEN NOT MATCHED BY SOURCE THEN UPDATE SET`` (r12, verdict
    #3) — Delta's "mark stale rows" full-sync idiom: the CDC batch
    upserts its keys, and every target row whose key the batch does
    NOT carry updates IN PLACE from expressions over target columns
    (here: stamped ``event_type='stale'`` with the precombine bumped
    one second so the rewrite deterministically supersedes). The
    routing reuses the merge's one existence probe: by-source rows are
    the target-side anti-join complement, first-satisfied-clause
    routed like the other two groups, folded into the SAME
    delete/upsert commits."""
    from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    _base, incr = _split(spark, sf_dir)
    t = _clone_base_table(spark, sf_dir)
    precombine_dedup(
        incr, ["user_id"], "ts", ["event_id"]
    ).createOrReplaceTempView("events_cdc_bysrc_src")
    execute_merge(
        spark,
        """MERGE INTO events_tbl t USING events_cdc_bysrc_src s
           ON t.user_id = s.user_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN UPDATE SET
               event_type = 'stale', ts = t.ts + INTERVAL 1 SECOND""",
        {"events_tbl": t},
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "sql_merge_matched_assignments",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    inc AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT b.event_id, b.user_id, i.ts, b.event_type,
           i.value + b.value AS value
    FROM base b JOIN inc i ON i.user_id = b.user_id
    UNION ALL
    SELECT b.event_id, b.user_id, b.ts, b.event_type, b.value
    FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM inc WHERE inc.user_id = b.user_id)
    UNION ALL
    SELECT i.event_id, i.user_id, i.ts,
           CAST(NULL AS VARCHAR) AS event_type, i.value
    FROM inc i
    WHERE NOT EXISTS (SELECT 1 FROM base WHERE base.user_id = i.user_id)
    """,
    tags=("cdc", "table", "sql", "merge"),
)
def sql_merge_matched_assignments(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matched-clause explicit assignments + explicit-column INSERT
    (r13, verdict #2 — the most common real-world MERGE shape beyond
    star expansion): ``WHEN MATCHED THEN UPDATE SET col = expr``
    evaluates expressions over BOTH aliases (``s.value + t.value``
    here) by joining the routed source rows back to the target
    snapshot, while unassigned target columns (``event_id``,
    ``event_type``) carry through unchanged; ``INSERT (cols) VALUES
    (exprs)`` binds source expressions to named target columns and
    fills the unlisted ``event_type`` with NULL — both frames fold
    into the same single upsert commit as star clauses."""
    from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    _base, incr = _split(spark, sf_dir)
    t = _clone_base_table(spark, sf_dir)
    precombine_dedup(
        incr, ["user_id"], "ts", ["event_id"]
    ).createOrReplaceTempView("events_cdc_ma_src")
    execute_merge(
        spark,
        """MERGE INTO events_tbl t USING events_cdc_ma_src s
           ON t.user_id = s.user_id
           WHEN MATCHED THEN UPDATE SET
               value = s.value + t.value, ts = s.ts
           WHEN NOT MATCHED THEN
               INSERT (event_id, user_id, ts, value)
               VALUES (s.event_id, s.user_id, s.ts, s.value)""",
        {"events_tbl": t},
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_column_mapping_roundtrip",
    oracle="""
    SELECT event_id, user_id, ts, event_type, amount FROM (
      SELECT *, value AS amount, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "schema"),
)
def cdc_column_mapping_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column mapping (Delta RENAME COLUMN): after the initial load,
    ``value`` is renamed to ``amount`` as a METADATA-ONLY commit (the
    query asserts zero files changed), then the CDC batch upserts under
    the NEW name and merges correctly with pre-rename files. Final state
    equals latest-per-key with the renamed column — old data never
    rewritten, old versions still readable under the old name."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_cm_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
    )
    before = t._commit(None).files
    rc = t.rename_column("value", "amount")
    assert rc.files == before  # metadata-only: no file rewritten
    t.upsert(incr.withColumnRenamed("value", "amount"))
    assert "value" in t.read(version=0).columns  # time travel: old name
    return t.read().select(
        "event_id", "user_id", "ts", "event_type", "amount"
    )


#: gold bronze fixture path per sf_dir — SHARED by the batch and
#: streaming gold-aggregate twins (both need the same 3-commit
#: CDC-enabled bronze table and only ever read it after build).
_GOLD_BRONZE_CACHE: dict[str, str] = {}


def gold_bronze_fixture(spark: SparkSession, sf_dir: str) -> LakehouseTable:
    """The CDC-enabled bronze events table (base + 2 upsert slices)
    behind cdc_incremental_gold_agg AND stream_gold_agg: pure,
    deterministic setup for the operators under test, memoized per
    (process, sf_dir) so the second twin — and repeated analyses in
    one process — pay zero rebuild (VERDICT r5 #8)."""
    path = _GOLD_BRONZE_CACHE.get(sf_dir)
    if path is not None:
        return LakehouseTable.load(spark, path)
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    cutoff = F.lit(CUTOFF).cast("timestamp_ntz")
    mid = F.lit("2024-01-25 00:00:00").cast("timestamp_ntz")
    root = tempfile.mkdtemp(prefix="gold_bronze_")
    t = LakehouseTable.create(
        spark, f"{root}/bronze",
        events.filter(F.col("ts") < cutoff),
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        cdc_enabled=True,
    )
    t.upsert(events.filter((F.col("ts") >= cutoff) & (F.col("ts") < mid)))
    t.upsert(events.filter(F.col("ts") >= mid))
    _GOLD_BRONZE_CACHE[sf_dir] = t.path
    return t


@query(
    "cdc_incremental_gold_agg",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(32,6))) AS DOUBLE) AS sum_value
    FROM (
      SELECT event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    GROUP BY event_type
    """,
    tags=("cdc", "table", "incremental", "cdf"),
)
def cdc_incremental_gold_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental GOLD maintenance via the change data feed: a per-
    event-type (count, decimal sum) aggregate over the latest-per-user
    state is maintained purely by RETRACTION — each commit's CDF slice
    (insert/update pre+post images from ``read_changes``) becomes group
    deltas (+post, -pre) merged into the running state; the bronze table
    is never rescanned after version 0. The oracle recomputes the same
    aggregate from scratch — decimal retraction makes the incremental
    state EXACTLY equal, not approximately."""
    from hudi_and_delta_showcase_spark.operators.incremental import (
        agg_delta,
        apply_delta,
    )

    t = gold_bronze_fixture(spark, sf_dir)
    gold = None
    for v in range(3):  # one delta apply per commit, never a rescan
        delta = agg_delta(
            t.read_changes(v, v), ["event_type"], ["value"]
        )
        gold = apply_delta(gold, delta, ["event_type"], ["value"])
    # Internal retraction algebra stays DECIMAL (exactness); the OUTPUT
    # follows the repo-wide convention (relational.py q1) of casting
    # aggregate columns to DOUBLE so the driver's hash canonicalization
    # never sees mixed decimal precisions across engines.
    return gold.select(
        "event_type", "n", F.col("sum_value").cast("double").alias("sum_value")
    )


@query(
    "cdc_constraint_quarantine",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}' AND value >= 1
      ) WHERE rn = 1
    ),
    inc AS (
      SELECT event_id, user_id, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    valid AS (SELECT * FROM inc WHERE value >= 1)
    SELECT event_id, user_id, 'state' AS tag FROM valid
    UNION ALL
    SELECT b.event_id, b.user_id, 'state' FROM base b
    WHERE NOT EXISTS (SELECT 1 FROM valid v WHERE v.user_id = b.user_id)
    UNION ALL
    SELECT event_id, user_id, 'quarantined' FROM inc WHERE value < 1
    """,
    tags=("cdc", "table", "constraints"),
)
def cdc_constraint_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHECK constraints (Delta ADD CONSTRAINT) with quarantine routing:
    the table enforces ``value >= 1``; the CDC batch's violating rows are
    returned tagged 'quarantined' (never written) while valid rows
    upsert — final state + quarantine set in one frame. Validation is a
    map-only split fused into the write scan."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_cons_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base.filter(F.col("value") >= 1),  # pre-cleaned initial load
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        constraints={"value_min": "value >= 1"},
    )
    _commit, bad = t.upsert_quarantine(incr)
    state = t.read().select("event_id", "user_id").withColumn(
        "tag", F.lit("state")
    )
    quarantined = bad.select("event_id", "user_id").withColumn(
        "tag", F.lit("quarantined")
    )
    return state.unionByName(quarantined)


@query(
    "cdc_deletion_vector_state",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("cdc", "table", "delete", "dv"),
)
def cdc_deletion_vector_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 hard delete via DELETION VECTORS (Delta DV / Iceberg position
    deletes): the delete writes an O(deleted rows) position sidecar and
    rewrites ZERO base files — the read anti-joins
    (_metadata.file_name, _metadata.row_index) against the vectors.
    The commit is asserted rewrite-free (stats.rewritten_files == 0), so
    a passing row proves the merge-on-read delete path end to end."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_dv_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        deletion_vectors=True,
    )
    t.upsert(incr)
    tombstones = t.read().filter(F.col("event_type") == "error").select(
        "user_id"
    )
    commit = t.delete(tombstones)
    assert commit.stats["rewritten_files"] == 0 and commit.dv_files
    return t.read().select(*_FINAL_COLS)


@query(
    "avro_envelope_scan",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'apple',     10, 1673496060, 'INSERT',        FALSE, 'mysql-backfill-fulldump'),
      (2, 'samsung',   20, 1673496061, 'INSERT',        FALSE, 'mysql-backfill-fulldump'),
      (3, 'dell',      30, 1673496062, 'INSERT',        FALSE, 'mysql-backfill-fulldump'),
      (4, 'motorola',  40, 1673496063, 'INSERT',        FALSE, 'mysql-backfill-fulldump'),
      (5, 'htc',       50, 1673501400, 'INSERT',        FALSE, 'mysql-cdc-binlog'),
      (2, 'samsung',  201, 1673501401, 'UPDATE-INSERT', FALSE, 'mysql-cdc-binlog'),
      (3, 'dell',      30, 1673501402, 'DELETE',        TRUE,  'mysql-cdc-binlog')
    ) AS t(pk_id, name, value, updated_at, change_type, is_deleted, read_method)
    """,
    tags=("cdc", "source", "avro"),
)
def avro_envelope_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 end-to-end: the golden Datastream batches serialized as REAL
    Avro Object Container Files (pure-Python OCF codec, avro_ocf.py),
    scanned back through io.read_avro's distributed fallback
    (binaryFile + mapInPandas — the reference's
    `spark.read.format("avro")`, README.md:264), then flattened and
    timestamp-normalized exactly like the reference's ingestion
    (README.md:267-273). The oracle pins every envelope row."""
    import tempfile

    from hudi_and_delta_showcase_spark import avro_ocf as A
    from hudi_and_delta_showcase_spark.io import read_avro
    from hudi_and_delta_showcase_spark.operators.cdc import (
        ENVELOPE_SCHEMA,
        flatten_envelope,
        golden_backfill,
        golden_cdc_batch,
        normalize_timestamps,
    )

    avro_schema = A.spark_schema_to_avro(ENVELOPE_SCHEMA, "envelope")
    root = tempfile.mkdtemp(prefix="avro_scan_")
    for i, batch in enumerate([golden_backfill(spark), golden_cdc_batch(spark)]):
        rows = []
        for r in batch.collect():
            d = r.asDict(recursive=True)
            d["sort_keys"] = [dict(sk) for sk in d["sort_keys"]]
            rows.append(d)
        with open(f"{root}/batch{i}.avro", "wb") as fh:
            fh.write(A.ocf_encode(avro_schema, rows))

    env = read_avro(spark, f"{root}/*.avro", schema=ENVELOPE_SCHEMA)
    flat = normalize_timestamps(
        flatten_envelope(env),
        ["updated_at", "created_at", "read_timestamp", "source_timestamp"],
    )
    return flat.select(
        "pk_id", "name", "value", "updated_at",
        F.col("source_metadata.change_type").alias("change_type"),
        F.col("source_metadata.is_deleted").alias("is_deleted"),
        "read_method",
    )


@query(
    "delta_log_roundtrip",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           (SELECT COUNT(*) FROM events WHERE ts < TIMESTAMP '{CUTOFF}')
             AS v0_rows
    FROM events
    """,
    tags=("cdc", "delta", "source"),
)
def delta_log_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3/C7 on the REAL Delta on-disk protocol (no delta-spark jar):
    commit the pre-cutoff events as version 0 of a _delta_log table,
    append the post-cutoff slice as version 1, then read the snapshot
    back through log replay + parquet scan (tables/delta_log.py;
    reference Delta flow at README.md:1205-1240). ``v0_rows`` carries
    the version-0 TIME-TRAVEL row count through the oracle check, so
    both the snapshot and the history replay are value-verified."""
    import tempfile

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_table,
        write_delta_table,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="delta_rt_") + "/events_delta"
    write_delta_table(base, path)
    write_delta_table(incr, path, mode="append")
    v0_rows = read_delta_table(spark, path, version=0).count()
    return read_delta_table(spark, path).withColumn(
        "v0_rows", F.lit(v0_rows).cast("long")
    )


@query(
    "cdc_schema_evolution",
    oracle=f"""
    SELECT event_id, user_id, ts, value,
           CASE WHEN ts >= TIMESTAMP '{CUTOFF}' THEN 'b1' END AS batch_tag
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "schema"),
)
def cdc_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution through upsert (Hudi/Delta add-column semantics,
    the schema tracking the reference attributes to the table log,
    README.md:1235): the incremental batch carries a NEW column; merged
    rows expose it, carried-over rows read it as NULL. Mechanics:
    unionByName(allowMissingColumns) in the CoW merge + mergeSchema on
    the manifest scan — no table-wide rewrite, old files stay valid
    (the 100 TB property: adding a column is a metadata operation)."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_evo_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        table_type="cow",
    )
    t.upsert(incr.withColumn("batch_tag", F.lit("b1")))
    return t.read().select("event_id", "user_id", "ts", "value", "batch_tag")


@query(
    "hoodie_timeline_roundtrip",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           (SELECT COUNT(*) FROM events WHERE ts < TIMESTAMP '{CUTOFF}')
             AS v0_rows
    FROM events
    """,
    tags=("cdc", "hudi", "source"),
)
def hoodie_timeline_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2/C7 on the REAL Hudi on-disk layout (no hudi jar): commit the
    pre-cutoff events through the `.hoodie` instant state machine
    (requested -> inflight -> completed), append the post-cutoff slice
    as a second instant, then read the snapshot back through timeline
    replay + file-slice resolution (tables/hoodie_timeline.py; the
    reference's `.hoodie` directory at README.md:334). ``v0_rows``
    carries the first-instant TIME-TRAVEL row count through the oracle,
    so snapshot and timeline replay are both value-verified."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        read_hoodie_table,
        write_hoodie_table,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="hoodie_rt_") + "/events_hudi"
    i0 = write_hoodie_table(base, path)
    write_hoodie_table(incr, path)
    v0_rows = read_hoodie_table(spark, path, as_of_instant=i0).count()
    return read_hoodie_table(spark, path).withColumn(
        "v0_rows", F.lit(v0_rows).cast("long")
    )


@query(
    "iceberg_metadata_roundtrip",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           (SELECT COUNT(*) FROM events WHERE ts < TIMESTAMP '{CUTOFF}')
             AS v0_rows
    FROM events
    """,
    tags=("cdc", "iceberg", "source"),
)
def iceberg_metadata_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Iceberg v1 on-disk metadata tree (no iceberg jar),
    completing tri-format interop next to ``delta_log_roundtrip`` and
    ``hoodie_timeline_roundtrip``: commit the pre-cutoff events as a
    lakehouse table, upsert the post-cutoff slice, export BOTH commits
    as Iceberg snapshots (metadata.json + manifest-list/manifest Avro,
    written by the repo's own OCF codec with Iceberg field-ids), then
    read the current snapshot back through the Iceberg metadata path —
    version-hint -> metadata.json -> manifest-list -> manifests -> one
    parquet scan. ``v0_rows`` time-travels to the FIRST snapshot-id, so
    the snapshot timeline is value-verified too (UniForm/XTable-style
    export, reference lakehouse deployment at README.md:264,1176)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_table,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="iceberg_rt_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, base,
        key_cols=["event_id"], precombine="ts", table_type="cow",
    )
    t.upsert(incr)
    export_iceberg_metadata(t)
    first = iceberg_snapshots(path)[0]["snapshot-id"]
    v0_rows = read_iceberg_table(spark, path, snapshot_id=first).count()
    return (
        read_iceberg_table(spark, path)
        .select(*_FINAL_COLS)
        .withColumn("v0_rows", F.lit(v0_rows).cast("long"))
    )


@query(
    "delta_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events
    WHERE event_type = 'purchase' AND user_id <= 75
    """,
    tags=("cdc", "delta", "source", "pruning"),
)
def delta_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stats-based file pruning on a Delta read (r10, the `_delta_log`
    twin of ``iceberg_pruned_read``): the events table lands
    partitioned by event_type, exports a real `_delta_log` whose add
    actions carry ``stats`` (numRecords + minValues/maxValues straight
    from the manifest's row-count/col-stats indexes — r10 export
    addition), and the read takes a PREDICATE that prunes add actions
    on those stats before the file list is built — delta-spark's data
    skipping discipline against the raw protocol. ``pruned`` carries
    the proof through the oracle: TRUE only when the pruned file list
    is strictly smaller than the snapshot's."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="delta_prune_") + "/events_dl"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
        partition_by="event_type",
    )
    export_delta_log(t)
    full_files = len(read_delta_table(spark, path).inputFiles())
    pruned = read_delta_table(
        spark, path,
        predicate=[
            ("event_type", "=", "purchase"), ("user_id", "<=", 75),
        ],
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "iceberg_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events
    WHERE event_type = 'click' AND user_id <= 75
    """,
    tags=("cdc", "iceberg", "source", "pruning"),
)
def iceberg_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-level file pruning on an Iceberg read (r10, verdict
    #2): the events table lands partitioned by event_type, exports an
    Iceberg tree (identity partition spec + per-file bounds from the
    commit's col-stats index), and the read takes a PREDICATE that
    prunes manifest entries on partition values and lower/upper bounds
    (manifest fields 125-130) before the file list is built — how an
    Iceberg planner reduces a 100 TB snapshot to O(matching files)
    without touching a footer. ``pruned`` carries the proof through
    the oracle: it is TRUE only when the pruned file list is strictly
    smaller than the snapshot's, so a silently-unpruned read
    hash-fails (reference: the metadata-driven read discipline the
    showcase delegates to its table formats, README.md:1235-1240)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="iceberg_prune_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
        partition_by="event_type",
    )
    export_iceberg_metadata(t)
    full_files = len(read_iceberg_table(spark, path).inputFiles())
    pruned = read_iceberg_table(
        spark, path,
        predicate=[("event_type", "=", "click"), ("user_id", "<=", 75)],
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "delta_generated_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    tags=("cdc", "delta", "source", "pruning", "transforms"),
)
def delta_generated_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GENERATED-COLUMN partition pruning on a Delta read (r11 — the
    `_delta_log` twin of `iceberg_day_pruned_read`): the dominant
    delta-spark daily layout — a table partitioned by
    ``event_date GENERATED ALWAYS AS (CAST(ts AS DATE))`` — exports
    its ``delta.generationExpression`` in the schemaString, and a
    timestamp-range predicate on ``ts`` projects through the
    expression onto the generated partition values
    (``_generated_projectors``, strict ``<`` boundary-tightened),
    pruning add actions to O(matching days) before the file list is
    built. ``pruned`` carries the files-shrank proof through the
    oracle."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="delta_gen_") + "/events_dl"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
        partition_by="event_date",
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )
    export_delta_log(t)
    full_files = len(read_delta_table(spark, path).inputFiles())
    pruned = read_delta_table(
        spark, path,
        predicate="ts >= TIMESTAMP '2024-01-10 00:00:00' AND "
        "ts < TIMESTAMP '2024-01-12 00:00:00'",
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "iceberg_day_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    tags=("cdc", "iceberg", "source", "pruning", "transforms"),
)
def iceberg_day_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform-aware manifest pruning over a ``days(ts)`` tree (r11,
    verdict #1): the DOMINANT real-world foreign Iceberg layout — a
    daily-partitioned event table — written by
    ``write_iceberg_dataset`` (partition values computed JVM-side, one
    distributed write, O(files) driver metadata), then read with a
    timestamp-range predicate that projects through the ``day``
    transform (Iceberg's inclusive projection, boundary-tightened for
    strict ``<``) and prunes manifest entries to O(matching days)
    before the file list is built. ``pruned`` carries the proof: TRUE
    only when the pruned file list is strictly smaller than the
    snapshot's (reference: the partition-scoped read discipline at
    README.md:1240)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_day_") + "/events_ice"
    write_iceberg_dataset(spark, events, root, partition_by=[("ts", "day")])
    full_files = len(read_iceberg_table(spark, root).inputFiles())
    pruned = read_iceberg_table(
        spark,
        root,
        predicate="ts >= TIMESTAMP '2024-01-10 00:00:00' AND "
        "ts < TIMESTAMP '2024-01-12 00:00:00'",
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "iceberg_bucket_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events WHERE user_id = 7
    """,
    tags=("cdc", "iceberg", "source", "pruning", "transforms"),
)
def iceberg_bucket_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Transform-aware manifest pruning over a ``bucket(8, user_id)``
    tree (r11, verdict #1): the write-distribution layout Iceberg
    writers use for high-cardinality keys. The equality predicate
    hashes through the spec's Murmur3 bucket transform
    (``iceberg_transforms.bucket_value``, Appendix B vectors pinned in
    tests) and prunes the snapshot to the ONE matching bucket's files;
    bounds are deliberately not written so the proof column pins the
    bucket transform itself doing the pruning."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_bkt_") + "/events_ice"
    write_iceberg_dataset(
        spark, events, root,
        partition_by=[("user_id", "bucket[8]")], with_bounds=False,
    )
    full_files = len(read_iceberg_table(spark, root).inputFiles())
    pruned = read_iceberg_table(
        spark, root, predicate=[("user_id", "=", 7)]
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "iceberg_day_incremental_read",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value
    FROM events
    WHERE ts >= TIMESTAMP '{CUTOFF}'
      AND ts < TIMESTAMP '2024-01-25 00:00:00'
    """,
    tags=("cdc", "iceberg", "source", "incremental", "transforms"),
)
def iceberg_day_incremental_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PRUNED incremental tail over an APPENDED ``days(ts)`` tree (r11
    — `write_iceberg_dataset(mode="append")` composed with the
    transform-aware pruning and the incremental append scan): the
    post-cutoff batch lands as a second snapshot (one new manifest at
    the next sequence number, parent manifest-list rows carried
    untouched), and the incremental pull takes a day-range predicate
    that prunes the ADDED entries through the day transform before the
    scan — the daily-ingest consumption loop a 100 TB event table
    actually runs: O(matching changed files) per poll."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        iceberg_snapshots,
        read_iceberg_incremental,
        write_iceberg_dataset_batches,
    )

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="iceberg_dayinc_") + "/events_ice"
    # r14: both snapshots' data plane in one combined write (same tree)
    write_iceberg_dataset_batches(
        spark,
        [base.select(*_FINAL_COLS), incr.select(*_FINAL_COLS)],
        root,
        partition_by=[("ts", "day")],
    )
    first = iceberg_snapshots(root)[0]["snapshot-id"]
    return read_iceberg_incremental(
        spark, root, from_snapshot_id=first,
        predicate="ts < TIMESTAMP '2024-01-25 00:00:00'",
    ).select(*_FINAL_COLS)


@query(
    "iceberg_rewrite_manifests_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS packed
    FROM events
    """,
    tags=("cdc", "iceberg", "maintenance", "transforms"),
)
def iceberg_rewrite_manifests_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg RewriteManifests over an append-heavy ``days(ts)`` tree
    (r12, verdict #1): six appended snapshots leave six small
    manifests — O(appends) Avro opens per scan forever — and
    ``rewrite_iceberg_manifests`` bin-packs the live entries into ONE
    as a ``replace``-operation snapshot (metadata-only; entries keep
    their original sequence numbers, data files never move; the
    incremental scan and the changelog skip it by their existing
    rule). ``packed`` carries the proof: TRUE only when the manifest
    count strictly shrank AND the post-rewrite scan still serves every
    row (reference anchor: the small-file maintenance discipline at
    README.md:1240, applied to the metadata tree)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        rewrite_iceberg_manifests,
        write_iceberg_dataset_batches,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_rw_") + "/events_ice"
    # three append snapshots: a batch per event_id residue class
    # (r13 sweep-cost trim: each day-partitioned append writes one
    # file per day — 3 appends prove the same 3-manifests-to-1 pack
    # at half the construction; the 21-to-1 case stays pytest-pinned).
    # r14: the three snapshots' data plane lands in ONE combined write
    # (write_iceberg_dataset_batches — same tree, 3 fewer jobs).
    batches = [
        events.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    write_iceberg_dataset_batches(
        spark, batches, root, partition_by=[("ts", "day")]
    )
    out = rewrite_iceberg_manifests(root)
    packed = (
        out["manifests_before"] == 3
        and out["manifests_after"] < out["manifests_before"]
    )
    return read_iceberg_table(spark, root).select(*_FINAL_COLS).withColumn(
        "packed", F.lit(bool(packed))
    )


@query(
    "iceberg_rewrite_datafiles_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS packed
    FROM events
    """,
    tags=("cdc", "iceberg", "maintenance", "transforms"),
)
def iceberg_rewrite_datafiles_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg RewriteDataFiles over a small-file ``days(ts)`` tree
    (r12 — the DATA-plane sibling of `iceberg_rewrite_manifests_read`):
    six appends over the SAME day range leave every day partition
    holding six small files, and ``rewrite_iceberg_data_files``
    bin-packs each qualifying partition in ONE distributed job
    (helper transform columns recomputed JVM-side, the dataset
    writer's own write distribution) committed as a ``replace``
    snapshot — untouched partitions carry EXISTING entries with their
    original sequence numbers; incremental scans and the changelog
    skip the rewrite. ``packed`` proves the live file count strictly
    shrank with every row still served."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        rewrite_iceberg_data_files,
        write_iceberg_dataset_batches,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_rwd_") + "/events_ice"
    # r13 sweep-cost trim: 3 residue-class appends still leave every
    # day partition holding 3 small files — the same pack proof.
    # r14: one combined write builds all 3 snapshots (same tree).
    batches = [
        events.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    write_iceberg_dataset_batches(
        spark, batches, root, partition_by=[("ts", "day")]
    )
    out = rewrite_iceberg_data_files(spark, root)
    packed = (
        out["groups_rewritten"] > 0
        and out["files_after"] < out["files_before"]
    )
    return read_iceberg_table(spark, root).select(*_FINAL_COLS).withColumn(
        "packed", F.lit(bool(packed))
    )


@query(
    "iceberg_compact_with_deletes_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS compacted
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'error'
    """,
    tags=("cdc", "iceberg", "maintenance", "delete", "dv"),
)
def iceberg_compact_with_deletes_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Delete-applying Iceberg compaction (r13, verdict #3 —
    RewritePositionDeleteFiles semantics): a CDC-shaped DV table
    (base + upsert + tombstone delete) exports as a delete-bearing v2
    tree, and ``rewrite_iceberg_data_files`` folds the position-delete
    state INTO the packed files — the read path's own anti-joins run
    once over the files being rewritten — and drops every delete file
    in the SAME ``replace`` snapshot. ``compacted`` proves the trilogy:
    delete files were removed, the new snapshot carries ZERO delete
    entries, and the file count did not grow — while the read-back
    equals the pre-compaction state exactly (the oracle's latest-per-
    key minus tombstoned keys)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _snapshot_entries,
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_table,
        rewrite_iceberg_data_files,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_icd_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        deletion_vectors=True,
    )
    t.upsert(incr)
    t.delete(
        t.read().filter(F.col("event_type") == "error").select("user_id")
    )
    export_iceberg_metadata(t)
    out = rewrite_iceberg_data_files(spark, t.path, min_input_files=1)
    snaps = iceberg_snapshots(t.path)
    _d, pos, eq = _snapshot_entries(t.path, snaps[-1], with_deletes=True)
    compacted = (
        out["removed_delete_files"] > 0
        and pos == [] and eq == []
        and out["files_after"] <= out["files_before"]
        and snaps[-1]["summary"]["operation"] == "replace"
    )
    return read_iceberg_table(spark, t.path).select(*_FINAL_COLS).withColumn(
        "compacted", F.lit(bool(compacted))
    )


@query(
    "delta_optimize_binpack_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS packed
    FROM events
    """,
    tags=("cdc", "delta", "maintenance"),
)
def delta_optimize_binpack_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """delta-spark's OPTIMIZE against a raw ``_delta_log`` (r12 — the
    Delta sibling of `iceberg_rewrite_datafiles_read`): six appended
    commits leave six small files, and ``optimize_delta_table``
    bin-packs them as remove+add actions with ``dataChange=false``
    (so CDF readers and streaming sources skip the compaction), fresh
    per-add ``stats`` stamped from the packed footers. ``packed``
    proves the live file count strictly shrank with every row still
    served; the pre-OPTIMIZE version stays time-travelable."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        optimize_delta_table,
        read_delta_table,
        write_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="delta_opt_") + "/events_dl"
    for i in range(6):
        write_delta_table(
            events.filter(F.pmod(F.col("event_id"), F.lit(6)) == i),
            path, mode="append",
        )
    out = optimize_delta_table(spark, path)
    packed = (
        out["groups_rewritten"] > 0
        and out["files_after"] < out["files_before"]
    )
    return read_delta_table(spark, path).select(*_FINAL_COLS).withColumn(
        "packed", F.lit(bool(packed))
    )


@query(
    "delta_optimize_cluster_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS clustered
    FROM events
    """,
    tags=("cdc", "delta", "maintenance", "clustering"),
)
def delta_optimize_cluster_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Clustered OPTIMIZE against a raw ``_delta_log`` (r13, verdict
    #6 — the ZORDER/CLUSTER BY dialect): six interleaved appends leave
    every file spanning the FULL ``user_id`` range (stats pruning on
    the key is useless), then ``optimize_delta_table(cluster_by=
    ['user_id'])`` rewrites all live files range-partitioned + sorted
    on the key, stamps delta-spark's ``delta.clustering`` domain
    metadata (in-commit protocol upgrade on the legacy log), and the
    packed files' narrow footer min/max make the predicate read prune.
    ``clustered`` proves the trilogy: a low-range predicate scanned
    EVERY file before and a strict subset after, the domain metadata
    reads back, and every row is still served."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        delta_clustering_columns,
        optimize_delta_table,
        read_delta_table,
        write_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="delta_optc_") + "/events_dl"
    # residue-class appends: each file's user_id min/max spans the
    # whole domain, so the key prunes nothing pre-clustering
    for i in range(6):
        write_delta_table(
            events.filter(F.pmod(F.col("event_id"), F.lit(6)) == i),
            path, mode="append",
        )
    # the probe cut sits a quarter into the OBSERVED key range (the
    # sf0.001 table only spans user_id 0..14 — a fixed cut above the
    # max would prune nothing at any layout)
    b = events.agg(
        F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
    ).collect()[0]
    lo_cut = int(b.lo) + max(1, (int(b.hi) - int(b.lo)) // 4)
    pre = read_delta_table(
        spark, path, predicate=[("user_id", "<", lo_cut)]
    )
    n_pre = len(pre.inputFiles())
    # target ~1/6 of the live bytes so the clustered rewrite yields a
    # handful of packed files at EVERY scale factor (a fixed byte
    # target packs sf0.001 into one file, which can't prove pruning)
    from hudi_and_delta_showcase_spark.tables import fsio

    live_bytes = sum(
        fsio.file_size(p)
        for p in fsio.walk_files(path, suffix=".parquet")
        if "_delta_log" not in p
    )
    out = optimize_delta_table(
        spark, path,
        target_file_bytes=max(16 * 1024, live_bytes // 6),
        cluster_by=["user_id"],
    )
    post = read_delta_table(
        spark, path, predicate=[("user_id", "<", lo_cut)]
    )
    clustered = (
        n_pre == 6  # pruned nothing before
        and out["files_after"] >= 2
        and len(post.inputFiles()) < out["files_after"]  # prunes now
        and delta_clustering_columns(path) == [["user_id"]]
    )
    return read_delta_table(spark, path).select(*_FINAL_COLS).withColumn(
        "clustered", F.lit(bool(clustered))
    )


@query(
    "delta_vacuum_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS vacuumed
    FROM events
    """,
    tags=("cdc", "delta", "maintenance"),
)
def delta_vacuum_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VACUUM against a raw foreign ``_delta_log`` (r13 — the Delta
    sibling of ``remove_orphan_iceberg_files``): six appends, OPTIMIZE
    supersedes the small files, and ``vacuum_delta_table`` deletes
    exactly the unreferenced-by-HEAD parquet older than the retention
    window (waived here: single-writer fixture) — the default 7-day
    window first proves it PROTECTS the fresh files. ``vacuumed``
    proves deletion count, protection, and an exact HEAD read."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        optimize_delta_table,
        read_delta_table,
        vacuum_delta_table,
        write_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="delta_vac_") + "/events_dl"
    for i in range(6):
        write_delta_table(
            events.filter(F.pmod(F.col("event_id"), F.lit(6)) == i),
            path, mode="append",
        )
    opt = optimize_delta_table(spark, path)
    protected = vacuum_delta_table(spark, path, dry_run=True)
    out = vacuum_delta_table(spark, path, retain_hours=0)
    vacuumed = (
        opt["files_after"] < opt["files_before"]
        and protected["would_remove_files"] == []  # 7-day window holds
        and out["deleted"] == opt["files_before"]
    )
    return read_delta_table(spark, path).select(*_FINAL_COLS).withColumn(
        "vacuumed", F.lit(bool(vacuumed))
    )


@query(
    "delta_restore_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS restored
    FROM events WHERE event_id % 6 IN (0, 1, 2)
    """,
    tags=("cdc", "delta", "maintenance", "time-travel"),
)
def delta_restore_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE against a raw foreign ``_delta_log`` (r13 — completing
    the foreign-log maintenance surface beside OPTIMIZE and VACUUM):
    six residue-class appends, an OPTIMIZE that supersedes the
    originals, then ``restore_delta_table(version=2)`` rolls the table
    back to the first three appends as a NEW commit — the target
    snapshot's files RE-ADD (metadata only, zero data movement; their
    original stats ride along), everything newer removes, and the
    pre-restore head stays time-travelable. ``restored`` proves the
    re-add/remove counts, history preservation, and that the final
    read serves exactly the version-2 rows the oracle recomputes."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        optimize_delta_table,
        read_delta_table,
        restore_delta_table,
        write_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="delta_rst_") + "/events_dl"
    for i in range(6):
        write_delta_table(
            events.filter(F.pmod(F.col("event_id"), F.lit(6)) == i),
            path, mode="append",
        )
    n_all = events.count()
    opt = optimize_delta_table(spark, path)  # v6: originals superseded
    out = restore_delta_table(spark, path, version=2)
    pre_restore = read_delta_table(spark, path, version=out["version"] - 1)
    restored = (
        out["restored_to"] == 2
        and out["version"] == 7  # appends 0-5, OPTIMIZE 6, RESTORE 7
        and out["files_added"] == 3  # v2's originals re-added
        and out["files_removed"] == opt["files_after"]
        and out["metadata_restored"] is False
        and pre_restore.count() == n_all  # head stays travelable
    )
    return read_delta_table(spark, path).select(*_FINAL_COLS).withColumn(
        "restored", F.lit(bool(restored))
    )


@query(
    "iceberg_rollback_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS rolled_back
    FROM events WHERE event_id % 4 IN (0, 1, 2)
    """,
    tags=("cdc", "iceberg", "maintenance", "time-travel"),
)
def iceberg_rollback_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """manageSnapshots rollback + ref management on an Iceberg dataset
    tree (r13 — the Iceberg twin of ``delta_restore_read``): four
    residue-class appends, a TAG stamped after the third
    (``create_iceberg_ref``), then ``rollback_iceberg_table`` rewinds
    main to the tagged snapshot as a new metadata commit — the bad
    fourth load vanishes from the current read while NOTHING is
    deleted (all four snapshots stay; expire reclaims later), the tag
    scan and the post-rollback read agree, and a non-ancestor
    rollforward refuses. ``rolled_back`` proves snapshot retention,
    ref/current agreement, and the refusal."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        read_iceberg_metadata,
        read_iceberg_table,
        rollback_iceberg_table,
        write_iceberg_dataset,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_rb_") + "/events_ice"
    for i in range(4):
        write_iceberg_dataset(
            spark,
            events.filter(F.pmod(F.col("event_id"), F.lit(4)) == i),
            root,
            mode="error" if i == 0 else "append",
        )
        if i == 2:
            create_iceberg_ref(root, "pre-bad-load", ref_type="tag")
    meta = read_iceberg_metadata(root)
    good_sid = meta["refs"]["pre-bad-load"]["snapshot-id"]
    out = rollback_iceberg_table(root, snapshot_id=good_sid)
    post = read_iceberg_metadata(root)
    forward_refused = False
    try:
        rollback_iceberg_table(
            root, snapshot_id=meta["snapshots"][-1]["snapshot-id"]
        )
    except ValueError:
        forward_refused = True
    tag_n = read_iceberg_table(spark, root, ref="pre-bad-load").count()
    main = read_iceberg_table(spark, root)
    rolled_back = (
        out["rolled_back_to"] == good_sid
        and post["current-snapshot-id"] == good_sid
        and post["refs"]["main"]["snapshot-id"] == good_sid
        and len(post["snapshots"]) == 4  # nothing deleted
        and forward_refused
        and tag_n == main.count()
    )
    return main.select(*_FINAL_COLS).withColumn(
        "rolled_back", F.lit(bool(rolled_back))
    )


@query(
    "hoodie_clean_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS cleaned
    FROM events
    """,
    tags=("cdc", "hoodie", "maintenance"),
)
def hoodie_clean_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi CLEAN against a foreign ``.hoodie`` timeline (r13 — the
    third protocol plane's reclamation row, completing the trilogy
    beside ``delta_vacuum_read`` and the Iceberg orphan removal): two
    appends then an INSERT_OVERWRITE leave the original file groups
    as unreachable-at-head history; ``clean_hoodie_table`` under
    KEEP_LATEST_COMMITS(1) first PROTECTS everything at a wide
    retention, then deletes exactly the superseded versions and
    records a real ``.clean`` instant with Hudi's HoodieCleanMetadata
    field names. ``cleaned`` proves protection, the deletion count,
    the timeline instant, and an exact head read."""
    import json as _json

    from hudi_and_delta_showcase_spark.tables import fsio as _fsio
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        clean_hoodie_table,
        read_hoodie_table,
        write_hoodie_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="hoodie_cln_") + "/events_hudi"
    write_hoodie_table(
        events.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0), path
    )
    write_hoodie_table(
        events.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1), path
    )
    write_hoodie_table(events, path, mode="overwrite")
    protected = clean_hoodie_table(spark, path, retain_commits=10)
    out = clean_hoodie_table(spark, path, retain_commits=1)
    clean_meta = _json.loads(
        _fsio.read_text(
            _fsio.join(path, ".hoodie", f"{out['instant']}.clean")
        )
    )
    cleaned = (
        protected["deleted"] == 0
        and out["deleted"] >= 2
        and clean_meta["totalFilesDeleted"] == out["deleted"]
        and clean_meta["cleanerPolicy"] == "KEEP_LATEST_COMMITS"
        and clean_meta["earliestCommitToRetain"]
        == out["earliest_retained"]
    )
    return read_hoodie_table(spark, path).select(*_FINAL_COLS).withColumn(
        "cleaned", F.lit(bool(cleaned))
    )


@query(
    "iceberg_wap_branch_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS published
    FROM events
    """,
    tags=("cdc", "iceberg", "branch", "wap"),
)
def iceberg_wap_branch_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full write-audit-publish workflow on an Iceberg tree (r13):
    main holds the first half of events, an ``audit`` branch is
    created (``create_iceberg_ref``) and the second half lands on it
    via ``write_iceberg_dataset(branch='audit')`` — main,
    current-snapshot-id, and the main-lineage snapshot-log stay
    untouched while the branch scan serves the staged rows — then
    ``fast_forward_iceberg_branch('main', 'audit')`` publishes.
    ``published`` proves staged-not-visible, audit-visible, and
    post-publish main == the whole table the oracle recomputes."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        create_iceberg_ref,
        fast_forward_iceberg_branch,
        read_iceberg_metadata,
        read_iceberg_table,
        write_iceberg_dataset,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_wap_") + "/events_ice"
    first = events.filter(F.pmod(F.col("event_id"), F.lit(2)) == 0)
    second = events.filter(F.pmod(F.col("event_id"), F.lit(2)) == 1)
    n_first = first.count()
    write_iceberg_dataset(spark, first, root)
    create_iceberg_ref(root, "audit", ref_type="branch")
    write_iceberg_dataset(
        spark, second, root, mode="append", branch="audit"
    )
    pre = read_iceberg_metadata(root)
    staged_hidden = (
        read_iceberg_table(spark, root).count() == n_first
        and pre["refs"]["main"]["snapshot-id"]
        == pre["current-snapshot-id"]
        and len(pre["snapshot-log"]) == 1
    )
    audit_n = read_iceberg_table(spark, root, ref="audit").count()
    out = fast_forward_iceberg_branch(root, "main", "audit")
    post = read_iceberg_metadata(root)
    published = (
        staged_hidden
        and audit_n == events.count()
        and post["current-snapshot-id"] == out["snapshot_id"]
        and post["snapshot-log"][-1]["snapshot-id"] == out["snapshot_id"]
    )
    return read_iceberg_table(spark, root).select(*_FINAL_COLS).withColumn(
        "published", F.lit(bool(published))
    )


@query(
    "iceberg_sort_compaction_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS sorted_layout
    FROM events
    """,
    tags=("cdc", "iceberg", "maintenance", "transforms"),
)
def iceberg_sort_compaction_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RewriteDataFiles' SORT strategy (r13 — the Iceberg twin of the
    clustered Delta OPTIMIZE): six residue-class appends leave every
    file spanning the FULL ``user_id`` range, then
    ``rewrite_iceberg_data_files(sort_by=['user_id'])`` rewrites all
    live files range-partitioned + sorted so the manifest bounds
    narrow and ``read_iceberg_where`` prunes to O(matching files);
    the metadata records the sort order (``sort-orders`` +
    ``default-sort-order-id``). ``sorted_layout`` proves
    pruned-nothing-before / prunes-now plus the recorded order."""
    from hudi_and_delta_showcase_spark.tables import fsio as _fsio
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_metadata,
        read_iceberg_table,
        read_iceberg_where,
        rewrite_iceberg_data_files,
        write_iceberg_dataset_batches,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_sort_") + "/events_ice"
    # r13 sweep-cost trim: 4 residue-class appends still span the full
    # key range per file — the same pruned-nothing-before proof.
    # r14: one combined write builds all 4 snapshots (same tree).
    batches = [
        events.filter(F.pmod(F.col("event_id"), F.lit(4)) == i)
        for i in range(4)
    ]
    write_iceberg_dataset_batches(spark, batches, root)
    b = events.agg(
        F.min("user_id").alias("lo"), F.max("user_id").alias("hi")
    ).collect()[0]
    cut = int(b.lo) + max(1, (int(b.hi) - int(b.lo)) // 4)
    n_pre = len(
        read_iceberg_where(spark, root, "user_id", hi=cut).inputFiles()
    )
    live_bytes = sum(
        _fsio.file_size(p)
        for p in _fsio.walk_files(
            _fsio.join(root, "data"), suffix=".parquet"
        )
    )
    out = rewrite_iceberg_data_files(
        spark, root,
        target_file_bytes=max(16 * 1024, live_bytes // 4),
        sort_by=["user_id"],
    )
    n_post = len(
        read_iceberg_where(spark, root, "user_id", hi=cut).inputFiles()
    )
    meta = read_iceberg_metadata(root)
    sorted_layout = (
        n_pre == 4
        and out["files_after"] >= 2
        and n_post < out["files_after"]
        and meta.get("default-sort-order-id") == out["sort_order_id"]
    )
    return read_iceberg_table(spark, root).select(*_FINAL_COLS).withColumn(
        "sorted_layout", F.lit(bool(sorted_layout))
    )


@query(
    "iceberg_maintenance_cycle",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS maintained
    FROM events
    """,
    tags=("cdc", "iceberg", "maintenance", "transforms"),
)
def iceberg_maintenance_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL Iceberg maintenance cycle over an append-heavy tree
    (r12): rewrite_data_files bin-packs the small files,
    rewrite_manifests packs the metadata, expire_snapshots drops the
    superseded history, remove_orphan_files reclaims the dead bytes —
    and the table serves every row byte-identically at the end. This
    is the weekly job a 100 TB ingest table actually schedules;
    ``maintained`` proves each stage did real work: files shrank,
    manifests shrank, snapshots expired, orphans deleted."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        expire_iceberg_snapshots,
        read_iceberg_table,
        remove_orphan_iceberg_files,
        rewrite_iceberg_data_files,
        rewrite_iceberg_manifests,
        write_iceberg_dataset_batches,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    root = tempfile.mkdtemp(prefix="iceberg_mx_") + "/events_ice"
    # r13 sweep-cost trim: 3 appends + the data-rewrite replace make
    # 4 snapshots (the manifest rewrite no-ops after the data rewrite
    # already packed to one manifest) — keep_last=1 expires 3.
    # r14: one combined write builds all 3 snapshots (same tree).
    batches = [
        events.filter(F.pmod(F.col("event_id"), F.lit(3)) == i)
        for i in range(3)
    ]
    write_iceberg_dataset_batches(
        spark, batches, root, partition_by=[("ts", "day")]
    )
    rwd = rewrite_iceberg_data_files(spark, root)
    rwm = rewrite_iceberg_manifests(root)
    exp = expire_iceberg_snapshots(root, keep_last=1)
    # older_than_ms=0: this single-writer fixture has no racing
    # writer, so the 3-day staged-file safety window (the default)
    # can be waived to reclaim the just-superseded files
    orph = remove_orphan_iceberg_files(spark, root, older_than_ms=0)
    maintained = (
        rwd["files_after"] < rwd["files_before"]
        and rwm["manifests_after"] <= rwm["manifests_before"]
        and exp["expired"] >= 3
        and orph["deleted"] > 0
    )
    return read_iceberg_table(spark, root).select(*_FINAL_COLS).withColumn(
        "maintained", F.lit(bool(maintained))
    )


@query(
    "iceberg_incremental_read",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value, 'b2' AS batch
    FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    """,
    tags=("cdc", "iceberg", "source", "incremental"),
)
def iceberg_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg INCREMENTAL APPEND SCAN (r10 — the Iceberg leg of the
    incremental-pull triad, next to Hudi's `cdc_incremental_pull` and
    Delta's `cdc_delta_changes_tail`): daily-ingest shape — the
    post-cutoff batch lands in a NEW partition (partition-scoped
    routing touches no existing file, so the exported snapshot is a
    real `append`), then `read_iceberg_incremental` pulls exactly the
    rows added after the first snapshot, opening only the manifests
    the contributing snapshots added — O(changed files) metadata and
    data IO on a 100 TB foreign table. Compaction (`replace`)
    snapshots are skipped; `overwrite`/`delete` refuse loudly
    (reference: the incremental-consumption pattern the showcase
    demonstrates on Hudi, README.md:576)."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_incremental,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="iceberg_incr_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, base.withColumn("batch", F.lit("b1")),
        key_cols=["event_id"], precombine="ts", partition_by="batch",
    )
    t.upsert(incr.withColumn("batch", F.lit("b2")))
    export_iceberg_metadata(t)
    first = iceberg_snapshots(path)[0]["snapshot-id"]
    return read_iceberg_incremental(
        spark, path, from_snapshot_id=first
    ).select(*_FINAL_COLS, "batch")


@query(
    "delta_history_read",
    oracle="""
    SELECT 0 AS version, 'INSERT' AS operation,
           TRUE AS adds_are_data_change
    UNION ALL SELECT 1, 'UPSERT', TRUE
    UNION ALL SELECT 2, 'OPTIMIZE', FALSE
    """,
    tags=("cdc", "delta", "introspection"),
)
def delta_history_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DESCRIBE HISTORY over a raw foreign `_delta_log` (r10,
    `read_delta_history`): per-commit operation + action tallies from
    the commit JSONs alone, O(versions) metadata. The
    `adds_are_data_change` column pins the exporter's maintenance
    stamping through the oracle: the OPTIMIZE version's adds carry
    `dataChange=false` (so CDF readers and incremental tails skip it),
    while the INSERT/UPSERT versions' adds are real data changes."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_history,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="delta_hist_") + "/events_dl"
    t = LakehouseTable.create(
        spark, path, base.withColumn("batch", F.lit("b1")),
        key_cols=["event_id"], precombine="ts", partition_by="batch",
    )
    t.upsert(incr.withColumn("batch", F.lit("b2")))
    t.optimize(target_files=2)
    export_delta_log(t)
    h = read_delta_history(spark, path)
    return h.select(
        "version", "operation",
        (
            (F.col("num_added_files") > 0)
            & (F.col("num_data_change_added_files")
               == F.col("num_added_files"))
        ).alias("adds_are_data_change"),
    )


@query(
    "hoodie_timeline_read",
    oracle="""
    SELECT 1 AS ordinal, 'commit' AS action, 'INSERT' AS operation,
           FALSE AS replaced_groups
    UNION ALL SELECT 2, 'commit', 'UPSERT', FALSE
    UNION ALL SELECT 3, 'replacecommit', 'CLUSTER', TRUE
    """,
    tags=("cdc", "hoodie", "introspection"),
)
def hoodie_timeline_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi `show commits` over a foreign `.hoodie` timeline (r10,
    `hoodie_timeline_table`): one row per completed instant with its
    kind, operation type and replaced-group tally — pinning the
    exporter's real Hudi taxonomy (a pure-append upsert stays a
    `commit`; the clustering rewrite lands as a `replacecommit` with
    `operationType=CLUSTER` and a non-empty replaced list)."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        hoodie_timeline_table,
    )
    from pyspark.sql import Window

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="hoodie_hist_") + "/events_ht"
    t = LakehouseTable.create(
        spark, path, base.withColumn("batch", F.lit("b1")),
        key_cols=["event_id"], precombine="ts", partition_by="batch",
    )
    t.upsert(incr.withColumn("batch", F.lit("b2")))
    t.optimize(target_files=2)
    export_hoodie_timeline(t)
    tl = hoodie_timeline_table(spark, path)
    w = Window.orderBy("instant")
    return tl.select(
        F.row_number().over(w).alias("ordinal"),
        F.col("action"),
        F.col("operation_type").alias("operation"),
        (F.col("num_replaced_file_groups") > 0).alias("replaced_groups"),
    )


@query(
    "iceberg_incremental_tail",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           CASE WHEN ts < TIMESTAMP '{CUTOFF}' THEN 'b1'
                WHEN ts < TIMESTAMP '2024-01-25 00:00:00' THEN 'b2'
                ELSE 'b3' END AS batch
    FROM events
    """,
    tags=("cdc", "iceberg", "source", "incremental"),
)
def iceberg_incremental_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous INCREMENTAL TAIL of a foreign Iceberg tree (r10 —
    the Iceberg-source sibling of ``cdc_hoodie_incremental_tail`` /
    ``cdc_delta_changes_tail``): three append snapshots land (each
    batch into a new partition); the consumer polls
    ``read_iceberg_incremental`` over exactly the new snapshot range
    ``(last_seen, head]`` after each — O(changed files) per poll,
    only the contributing snapshots' manifests open — and the union of
    the three pulls must equal the full table (no row lost, none
    double-delivered; either hash-fails the oracle). Every source
    protocol now tails incrementally."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_incremental,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    c1 = F.lit(CUTOFF).cast("timestamp_ntz")
    c2 = F.lit("2024-01-25 00:00:00").cast("timestamp_ntz")
    parts = [
        ("b1", events.filter(F.col("ts") < c1)),
        ("b2", events.filter((F.col("ts") >= c1) & (F.col("ts") < c2))),
        ("b3", events.filter(F.col("ts") >= c2)),
    ]
    path = tempfile.mkdtemp(prefix="iceberg_tail_") + "/events_ice"
    t = None
    for tag, p in parts:
        batch = p.withColumn("batch", F.lit(tag))
        if t is None:
            t = LakehouseTable.create(
                spark, path, batch,
                key_cols=["event_id"], precombine="ts",
                partition_by="batch",
            )
        else:
            t.upsert(batch)
    export_iceberg_metadata(t)
    snaps = iceberg_snapshots(path)
    acc: DataFrame | None = None
    last: int | None = None
    for s in snaps:
        sid = s["snapshot-id"]
        pull = read_iceberg_incremental(
            spark, path, from_snapshot_id=last, to_snapshot_id=sid
        )
        acc = pull if acc is None else acc.unionByName(pull)
        last = sid
    return acc.select(*_FINAL_COLS, "batch")


@query(
    "iceberg_changelog_read",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           'b2' AS batch, 'insert' AS change_type, 0 AS change_ordinal
    FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value,
           CASE WHEN ts >= TIMESTAMP '{CUTOFF}' THEN 'b2' ELSE 'b1' END,
           'delete', 1
    FROM events WHERE event_id % 7 = 0
    """,
    tags=("cdc", "iceberg", "source", "cdf"),
)
def iceberg_changelog_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg CHANGELOG SCAN (r10 — `create_changelog_view` against
    the raw tree, the Iceberg leg of the change-feed triad): an append
    snapshot (post-cutoff batch into a new partition) then a
    DELETION-VECTOR delete snapshot (every event_id % 7 row). The
    changelog emits the append's rows as `insert` at ordinal 0 and
    materializes EXACTLY the rows the delete snapshot's DVs killed as
    `delete` at ordinal 1 — file-scoped (only added files and
    DV-referenced files scan, never a snapshot diff), with rows
    already dead at the parent subtracted."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_changelog,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="iceberg_chlog_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, base.withColumn("batch", F.lit("b1")),
        key_cols=["event_id"], precombine="ts", partition_by="batch",
        deletion_vectors=True,
    )
    t.upsert(incr.withColumn("batch", F.lit("b2")))
    t.delete(
        t.read()
        .filter(F.col("event_id") % 7 == 0)
        .select("event_id", "batch")
    )
    export_iceberg_metadata(t)
    first = iceberg_snapshots(path)[0]["snapshot-id"]
    return read_iceberg_changelog(
        spark, path, from_snapshot_id=first
    ).select(
        *_FINAL_COLS, "batch",
        F.col("_change_type").alias("change_type"),
        F.col("_change_ordinal").alias("change_ordinal"),
    )


@query(
    "iceberg_changelog_net",
    oracle=f"""
    WITH pre AS (
      SELECT event_id, user_id, ts, event_type, value
      FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
    ), post AS (
      SELECT event_id, user_id, ts, event_type,
             CASE WHEN user_id <= 50 THEN value * 2 ELSE value END AS value
      FROM pre
    )
    SELECT *, 'insert' AS change_type
    FROM (SELECT * FROM post EXCEPT ALL SELECT * FROM pre)
    UNION ALL
    SELECT *, 'delete' AS change_type
    FROM (SELECT * FROM pre EXCEPT ALL SELECT * FROM post)
    """,
    tags=("cdc", "iceberg", "source", "cdf"),
)
def iceberg_changelog_net(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NET-CHANGES changelog scan (r11 — Iceberg's
    ``create_changelog_view(net_changes=True)``): a CoW upsert doubles
    ``value`` for the user_id<=50 rows, rewriting whole files, so the
    RAW changelog emits delete+insert pairs for every carried row —
    and the net collapse cancels them, leaving exactly the
    old-content deletes and new-content inserts of genuinely changed
    rows. The oracle is the two-way EXCEPT ALL between the pre and
    post states, so any carried row leaking through (or a changed row
    cancelled wrongly) hash-fails."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_changelog,
    )

    base, _incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="iceberg_net_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, base.withColumn("batch", F.lit("b1")),
        key_cols=["event_id"], precombine="ts", partition_by="batch",
    )
    t.upsert(
        base.filter(F.col("user_id") <= 50)
        .withColumn("value", F.col("value") * 2)
        .withColumn("batch", F.lit("b1"))
    )
    export_iceberg_metadata(t)
    first = iceberg_snapshots(path)[0]["snapshot-id"]
    return read_iceberg_changelog(
        spark, path, from_snapshot_id=first, net_changes=True
    ).select(*_FINAL_COLS, F.col("_change_type").alias("change_type"))


@query(
    "hoodie_cdc_changes",
    oracle=f"""
    WITH pre AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ), post AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT p.event_id, p.user_id, p.ts, p.event_type, p.value,
           CASE WHEN q.user_id IS NULL THEN 'insert'
                ELSE 'update_postimage' END AS change_type
    FROM post p LEFT JOIN pre q ON p.user_id = q.user_id
    UNION ALL
    SELECT q.event_id, q.user_id, q.ts, q.event_type, q.value,
           'update_preimage' AS change_type
    FROM pre q JOIN post p ON p.user_id = q.user_id
    """,
    tags=("cdc", "hoodie", "source", "cdf"),
)
def hoodie_cdc_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi CHANGE-DATA-CAPTURE read (r10 — the ``.hoodie`` leg of the
    change-feed triad): a foreign MoR table written with
    ``hoodie.table.cdc.enabled`` supplemental logging — base = latest
    pre-cutoff event per user; one deltacommit upserts each user's
    post-cutoff latest AND rides the debezium-shaped change images in a
    CDC_DATA log block (RFC-51 DATA_BEFORE_AFTER). The reader serves
    Delta CDF's exact taxonomy (an update yields BOTH pre- and
    post-image rows), decoding blocks executor-side with O(changes) IO
    — only the commit's own log files open. The block build collects
    O(users) rows, the same bounded-collect fixture class as the other
    foreign-MoR queries."""
    from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro
    from hudi_and_delta_showcase_spark.tables import hoodie_timeline as ht

    base, incr = _split(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = lambda df: (  # noqa: E731
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    pre, post = latest(base), latest(incr)
    root = tempfile.mkdtemp(prefix="hoodie_cdc_") + "/t"
    ht.write_hoodie_table(pre.coalesce(1), root)
    ((fid, s),) = ht.latest_file_slices_rt(root).items()
    pre_by_user = {r["user_id"]: r.asDict() for r in pre.collect()}
    records = [r.asDict() for r in post.collect()]
    cdc_records = []
    for rec in records:
        before = pre_by_user.get(rec["user_id"])
        cdc_records.append({
            "op": "u" if before else "i",
            "ts_ms": None,
            "before": before,
            "after": rec,
        })
    ht.append_log_commit(
        root, fid, s["base_instant"], records,
        spark_schema_to_avro(pre.schema), cdc_records=cdc_records,
    )
    return ht.read_hoodie_changes(spark, root).select(
        *_FINAL_COLS, F.col("_change_type").alias("change_type")
    )


@query(
    "hoodie_cdc_key_only_changes",
    oracle=f"""
    WITH pre AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ), post AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT p.event_id, p.user_id, p.ts, p.event_type, p.value,
           CASE WHEN q.user_id IS NULL THEN 'insert'
                ELSE 'update_postimage' END AS change_type
    FROM post p LEFT JOIN pre q ON p.user_id = q.user_id
    UNION ALL
    SELECT q.event_id, q.user_id, q.ts, q.event_type, q.value,
           'update_preimage' AS change_type
    FROM pre q JOIN post p ON p.user_id = q.user_id
    """,
    tags=("cdc", "hoodie", "source", "cdf"),
)
def hoodie_cdc_key_only_changes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """RFC-51 ``OP_KEY_ONLY`` supplemental logging served through the
    SAME Delta-CDF taxonomy (r11, verdict #4): the cost-conscious CDC
    mode real writers enable — the commit's CDC block persists only
    ``op`` + ``recordKey``, and the reader synthesizes both images by
    semi-joining the keys against the pre-/post-instant MoR snapshots
    (``read_hoodie_table_rt(as_of)``). Identical logical change set —
    and oracle — as `hoodie_cdc_changes`, pinning mode equivalence:
    a reader that mis-synthesizes either image hash-fails."""
    from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro
    from hudi_and_delta_showcase_spark.tables import hoodie_log as hl
    from hudi_and_delta_showcase_spark.tables import hoodie_timeline as ht

    base, incr = _split(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest = lambda df: (  # noqa: E731
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    pre, post = latest(base), latest(incr)
    root = tempfile.mkdtemp(prefix="hoodie_cdc_ko_") + "/t"
    ht.write_hoodie_table(pre.coalesce(1), root)
    ((fid, s),) = ht.latest_file_slices_rt(root).items()
    pre_users = {r.user_id for r in pre.select("user_id").collect()}
    records = [r.asDict() for r in post.collect()]
    cdc_records = [
        {
            "op": "u" if rec["user_id"] in pre_users else "i",
            "recordKey": str(rec["user_id"]),
        }
        for rec in records
    ]
    ht.append_log_commit(
        root, fid, s["base_instant"], records,
        spark_schema_to_avro(pre.schema),
        cdc_records=cdc_records,
        cdc_schema=hl.cdc_avro_schema_key_only(),
    )
    return ht.read_hoodie_changes(
        spark, root, key_fields=["user_id"]
    ).select(*_FINAL_COLS, F.col("_change_type").alias("change_type"))


@query(
    "delta_incremental_read",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value, 'b2' AS batch
    FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    """,
    tags=("cdc", "delta", "source", "incremental"),
)
def delta_incremental_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta INCREMENTAL APPEND READ (r10 — the `_delta_log` leg of the
    append-tail triad, for logs WITHOUT change data feed): same
    daily-ingest shape as `iceberg_incremental_read` — the post-cutoff
    batch lands in a new partition, `read_delta_incremental` pulls
    exactly the rows its versions added, reading only those commits'
    dataChange add actions — O(changed files) IO. Maintenance versions
    (all dataChange=false, the exporter's new OPTIMIZE stamping) are
    skipped; data-removing versions refuse loudly toward
    `read_delta_changes`."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_incremental,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="delta_incr_") + "/events_dl"
    t = LakehouseTable.create(
        spark, path, base.withColumn("batch", F.lit("b1")),
        key_cols=["event_id"], precombine="ts", partition_by="batch",
    )
    t.upsert(incr.withColumn("batch", F.lit("b2")))
    export_delta_log(t)
    return read_delta_incremental(
        spark, path, from_version=0
    ).select(*_FINAL_COLS, "batch")


@query(
    "hoodie_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events
    WHERE event_type = 'view' AND user_id <= 75
    """,
    tags=("cdc", "hoodie", "source", "pruning"),
)
def hoodie_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Col-stats file pruning on a foreign Hudi read (r10, the
    ``.hoodie`` leg of the pruning triad): the events table lands
    partitioned by event_type, exports a real timeline PLUS a real
    ``.hoodie/metadata`` table (``files`` + ``column_stats`` partitions
    stamped from the manifest's col-stats/row-count indexes —
    metadata-only), and the read takes a PREDICATE that prunes base
    files on the metadata table's per-file bounds before the scan —
    Hudi's col-stats data-skipping discipline against the raw layout,
    reducing a filtered 100 TB foreign table to O(matching files).
    ``pruned`` carries the proof through the oracle: TRUE only when
    the pruned file list is strictly smaller than the snapshot's
    (reference: the metadata-driven read discipline the showcase
    delegates to its table formats, README.md:1235-1240)."""
    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        export_hoodie_metadata,
    )
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="hoodie_prune_") + "/events_ht"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
        partition_by="event_type",
    )
    export_hoodie_timeline(t)
    export_hoodie_metadata(t)
    full_files = len(read_hoodie_table(spark, path).inputFiles())
    pruned = read_hoodie_table(
        spark, path,
        predicate=[("event_type", "=", "view"), ("user_id", "<=", 75)],
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "hoodie_hfile_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value, TRUE AS pruned
    FROM events
    WHERE event_type = 'view' AND user_id <= 75
    """,
    tags=("cdc", "hoodie", "source", "pruning", "hfile"),
)
def hoodie_hfile_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The `hoodie_pruned_read` cycle THROUGH an HFILE-COMPACTED
    metadata table (r11, verdict #6): after the export, the metadata
    table's files/column_stats log slices compact into HBase HFile v3
    base files (``compact_hoodie_metadata`` — the format real Hudi
    metadata compaction writes, GZ-coded blocks + protobuf trailer),
    and the pruned read serves THROUGH the compacted state
    (``tables/hfile.py``): mature 0.14+ foreign tables — the biggest
    ones — keep O(matching files) reads instead of losing the
    metadata path at compaction. The log files are DELETED after
    compaction so a silent fallback to log replay is impossible;
    ``pruned`` carries the files-shrank proof through the oracle."""
    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        compact_hoodie_metadata,
        export_hoodie_metadata,
    )
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="hoodie_hfile_") + "/events_ht"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
        partition_by="event_type",
    )
    export_hoodie_timeline(t)
    export_hoodie_metadata(t)
    assert compact_hoodie_metadata(path) is not None
    # drop the pre-compaction logs: the read below can ONLY be served
    # by the HFile decode path
    for part in ("files", "column_stats"):
        pdir = os.path.join(path, ".hoodie", "metadata", part)
        for fn in os.listdir(pdir):
            if ".log." in fn:
                os.remove(os.path.join(pdir, fn))
    full_files = len(read_hoodie_table(spark, path).inputFiles())
    pruned = read_hoodie_table(
        spark, path,
        predicate=[("event_type", "=", "view"), ("user_id", "<=", 75)],
    )
    is_pruned = len(pruned.inputFiles()) < full_files
    return pruned.select(*_FINAL_COLS).withColumn(
        "pruned", F.lit(is_pruned)
    )


@query(
    "cdc_row_tracking_stability",
    oracle=f"""
    SELECT user_id,
           user_id IN (
             SELECT DISTINCT user_id FROM events
             WHERE ts < TIMESTAMP '{CUTOFF}'
           ) AS id_preserved
    FROM (
      SELECT user_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    """,
    tags=("cdc", "table", "row-tracking"),
)
def cdc_row_tracking_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ROW TRACKING: every row carries a stable ``_row_id`` that
    an UPDATE preserves — the logical row keeps its identity while its
    content changes — and an INSERT mints fresh. The query snapshots
    version 0's (user_id, _row_id) pairs, upserts the post-cutoff
    batch, and emits per-user whether the id actually survived; the
    oracle states the contract exactly (preserved iff the user existed
    before the upsert), so a tracking bug in either direction — a
    re-minted id on update, or a reused id on insert — hash-fails.
    The inherit is one key-probe join against rows the CoW rewrite
    reads anyway (operators unchanged for untracked tables)."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_rowtrack_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        row_tracking=True,
    )
    # version-0 ids: the file list resolves NOW, so the lazy plan keeps
    # reading the pre-upsert files (CoW: old files live until vacuum)
    ids0 = t.read().select("user_id", F.col("_row_id").alias("rid0"))
    t.upsert(incr)
    return (
        t.read()
        .select("user_id", "_row_id")
        .join(ids0, "user_id", "left")
        .select(
            "user_id",
            F.coalesce(
                F.col("_row_id") == F.col("rid0"), F.lit(False)
            ).alias("id_preserved"),
        )
    )


@query(
    "iceberg_pos_delete_roundtrip",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events WHERE event_id % 7 <> 0
    """,
    tags=("cdc", "iceberg", "source"),
)
def iceberg_pos_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg v2 POSITION deletes end-to-end: a deletion-vector table
    (merge-on-read DELETE — base files untouched) exports WITHOUT
    materializing the deletes — the DV set becomes sorted
    ``(file_path, pos)`` position-delete parquet under a ``content=1``
    delete manifest with sequence numbers, the one-way v1 -> v2 tree
    upgrade — and the Iceberg read path applies them by the same
    (file, row_index) anti-join the engine's own DV reader uses. The
    oracle is the logical post-delete state; a reader that ignores the
    delete manifest resurrects every seventh event and hash-fails."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_metadata,
        read_iceberg_table,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="iceberg_pd_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, events, key_cols=["event_id"], deletion_vectors=True
    )
    t.delete(events.filter(F.col("event_id") % 7 == 0).select("event_id"))
    export_iceberg_metadata(t)
    assert read_iceberg_metadata(path)["format-version"] == 2
    return read_iceberg_table(spark, path).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@query(
    "iceberg_equality_delete_export",
    oracle="""
    SELECT event_id, user_id, ts, event_type,
           CASE WHEN event_id % 14 = 0 THEN value + 1000 ELSE value END
             AS value
    FROM events
    WHERE event_id % 7 <> 0 OR event_id % 14 = 0
    """,
    tags=("cdc", "iceberg", "sink"),
)
def iceberg_equality_delete_export(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v2 EQUALITY-delete EXPORT (r8, closing the r7 verdict's
    last dialect gap): the engine's DV-table delete commit exports as
    the deleted KEY rows with ``equality_ids`` naming the record key —
    the Flink-CDC writer shape — instead of materialized positions, so
    a delete commit's export cost is O(deleted keys) regardless of how
    many base files the keys touched. Sequence-number precedence
    (``data_seq < delete_seq``, strict) carries the semantics: every
    14th event is RE-INSERTED with a bumped value AFTER the delete and
    must survive the read-back, while the rest of the deleted sevenths
    stay dead. The final snapshot is value-verified against the oracle
    through the engine's own equality-delete read path; a reader that
    applied the delete to later sequence numbers would kill the
    re-inserts and hash-fail."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _snapshot_entries,
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_table,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="iceberg_eq_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, events, key_cols=["event_id"], deletion_vectors=True
    )
    t.delete(events.filter(F.col("event_id") % 7 == 0).select("event_id"))
    t.upsert(
        events.filter(F.col("event_id") % 14 == 0).withColumn(
            "value", F.col("value") + F.lit(1000.0)
        )
    )
    export_iceberg_metadata(t, delete_dialect="equality")
    _, pos, eq = _snapshot_entries(
        path, iceberg_snapshots(path)[-1], with_deletes=True
    )
    assert eq and not pos, "equality dialect must emit eq entries only"
    return read_iceberg_table(spark, path).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@query(
    "iceberg_snapshots_table",
    oracle=f"""
    SELECT 1 AS ordinal, 'append' AS operation,
           (SELECT COUNT(*) FROM events WHERE ts < TIMESTAMP '{CUTOFF}')
             AS total_records
    UNION ALL
    SELECT 2, 'overwrite', (SELECT COUNT(*) FROM events)
    """,
    tags=("cdc", "iceberg", "introspection"),
)
def iceberg_snapshots_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg's ``tbl$snapshots`` inspection relation (r8,
    ``iceberg_meta.iceberg_metadata_table``): exported trees answer
    metadata questions as DataFrames — here, each snapshot's operation
    and its summary's running ``total-records``, value-checked against
    fixture-derived truth (snapshot 1 = the pre-cutoff slice at
    'append'; snapshot 2 = everything at 'overwrite' — the upsert
    rewrites key-overlapping files, so files were REMOVED and Iceberg's
    operation taxonomy says overwrite even though event_id uniqueness
    makes every row an insert). Driver-side metadata only — no data
    files read."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        iceberg_metadata_table,
    )
    from pyspark.sql import Window

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="iceberg_meta_t_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, base,
        key_cols=["event_id"], precombine="ts", table_type="cow",
    )
    t.upsert(incr)
    export_iceberg_metadata(t)
    snaps = iceberg_metadata_table(spark, path, "snapshots")
    w = Window.orderBy("committed_at_ms", "snapshot_id")
    return snaps.select(
        F.row_number().over(w).alias("ordinal"),
        F.col("operation"),
        F.element_at(F.col("summary"), "total-records")
        .cast("long")
        .alias("total_records"),
    )


@query(
    "iceberg_v3_dv_export",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events WHERE event_id % 7 <> 0
    """,
    tags=("cdc", "iceberg", "sink"),
)
def iceberg_v3_dv_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg FORMAT-VERSION 3 EXPORT (r8): the engine's DV-table
    delete state renders as real Puffin deletion vectors — one
    ``deletion-vector-v1`` blob per deleted-from data file, manifest
    entries carrying the blob byte range + referenced file — plus v3
    row lineage (explicit ``first_row_id`` per data file, running
    ``next-row-id``). The tree reads back through the engine's own v3
    DV path and is value-verified against the logical post-delete
    state; together with ``iceberg_v3_dv_read`` this closes v3 DVs in
    BOTH directions."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _snapshot_entries,
        export_iceberg_metadata,
        iceberg_snapshots,
        read_iceberg_metadata,
        read_iceberg_table,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="iceberg_v3x_") + "/events_ice"
    t = LakehouseTable.create(
        spark, path, events, key_cols=["event_id"], deletion_vectors=True
    )
    t.delete(events.filter(F.col("event_id") % 7 == 0).select("event_id"))
    export_iceberg_metadata(t, format_version=3)
    meta = read_iceberg_metadata(path)
    assert meta["format-version"] == 3 and "next-row-id" in meta
    _, pos, eq = _snapshot_entries(
        path, iceberg_snapshots(path)[-1], with_deletes=True
    )
    assert pos and not eq
    assert all(e["data_file"]["file_format"] == "PUFFIN" for e in pos)
    return read_iceberg_table(spark, path).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@query(
    "iceberg_v3_dv_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events WHERE event_id % 7 <> 0
    """,
    tags=("cdc", "iceberg", "source"),
)
def iceberg_v3_dv_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg FORMAT-VERSION 3 deletion vectors (r8): v3 drops
    position-delete parquet for per-data-file RoaringBitmaps stored as
    ``deletion-vector-v1`` blobs in a Puffin container, with the
    manifest entry carrying the blob's exact byte range
    (content_offset/content_size_in_bytes) and its one referenced data
    file — so the reader fetches one blob per data file, never a
    whole-file stream. This authors a v3 tree over the events fixture
    (data parquet + a real Puffin DV killing every 7th event + v3
    manifests/metadata via the engine's own codecs) and serves it
    through ``read_iceberg_table``: the DV blobs decode EXECUTOR-side
    (``tables/puffin.py::dv_rows_df``) into the same (file, pos)
    anti-join the v2 position-delete path uses. A reader that ignored
    the DV manifest would resurrect every 7th event and hash-fail."""
    import json as _json

    from hudi_and_delta_showcase_spark.avro_ocf import ocf_encode
    from hudi_and_delta_showcase_spark.tables import fsio, puffin
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        MANIFEST_LIST_SCHEMA_V2,
        _record_counts,
        manifest_entry_schema,
        read_iceberg_table,
        spark_schema_to_iceberg,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="iceberg_v3_") + "/events_v3"
    data_dir, meta_dir = f"{root}/data", f"{root}/metadata"
    fsio.makedirs(meta_dir)
    events.repartition(4).write.parquet(data_dir)
    files = sorted(fsio.walk_files(data_dir, ".parquet"))
    # deleted positions per file, from the scan's native row_index —
    # O(deleted rows) through the driver, the size of the DV itself
    hits = (
        spark.read.parquet(data_dir)
        .withColumn("__f", F.col("_metadata.file_path"))
        .withColumn("__p", F.col("_metadata.row_index"))
        .filter(F.col("event_id") % 7 == 0)
        .select("__f", "__p")
        .collect()
    )
    by_file: dict[str, list[int]] = {}
    for r in hits:
        by_file.setdefault(fsio.uri_path(r["__f"]), []).append(r["__p"])
    norm = {fsio.uri_path(f): f for f in files}
    pf = f"{data_dir}/dv-00001.puffin"
    sid1, sid2 = 1, 2
    ranges = puffin.write_puffin_dvs(
        pf,
        {norm[f]: sorted(p) for f, p in by_file.items()},
        snapshot_id=sid2,
        sequence_number=2,
    )
    entry_schema = manifest_entry_schema([], 3)
    counts = _record_counts(spark, root, [fsio.relpath(f, root) for f in files])
    counts = {fsio.resolve(root, r): n for r, n in counts.items()}

    def _dfile(path, rows, ref=None, off=None, size=None):
        return {
            "content": 0 if ref is None else 1,
            "file_path": path,
            "file_format": "PARQUET" if ref is None else "PUFFIN",
            "partition": {},
            "record_count": rows,
            "file_size_in_bytes": fsio.file_size(path),
            "block_size_in_bytes": 64 * 1024 * 1024,
            "lower_bounds": None,
            "upper_bounds": None,
            "equality_ids": None,
            "first_row_id": None,
            "referenced_data_file": ref,
            "content_offset": off,
            "content_size_in_bytes": size,
        }

    data_entries = [
        {
            "status": 1, "snapshot_id": sid1,
            "sequence_number": 1, "file_sequence_number": 1,
            "data_file": _dfile(f, counts[f]),
        }
        for f in files
    ]
    dv_entries = [
        {
            "status": 1, "snapshot_id": sid2,
            "sequence_number": 2, "file_sequence_number": 2,
            "data_file": _dfile(pf, card, ref=ref, off=off, size=size),
        }
        for ref, (off, size, card) in sorted(ranges.items())
    ]
    m1 = f"{meta_dir}/m0-data.avro"
    b1 = ocf_encode(entry_schema, data_entries, codec="deflate")
    fsio.write_bytes_atomic(m1, b1)
    m2 = f"{meta_dir}/m1-dvs.avro"
    b2 = ocf_encode(entry_schema, dv_entries, codec="deflate")
    fsio.write_bytes_atomic(m2, b2)

    def _mfile(path, blob, content, seq, sid, n, rows):
        return {
            "manifest_path": path, "manifest_length": len(blob),
            "partition_spec_id": 0, "content": content,
            "sequence_number": seq, "min_sequence_number": seq,
            "added_snapshot_id": sid, "added_files_count": n,
            "existing_files_count": 0, "deleted_files_count": 0,
            "added_rows_count": rows, "existing_rows_count": 0,
            "deleted_rows_count": 0,
        }

    total = sum(counts.values())
    l2 = f"{meta_dir}/snap-{sid2}.avro"
    fsio.write_bytes_atomic(
        l2,
        ocf_encode(
            MANIFEST_LIST_SCHEMA_V2,
            [
                _mfile(m1, b1, 0, 1, sid1, len(data_entries), total),
                _mfile(m2, b2, 1, 2, sid2, len(dv_entries), len(hits)),
            ],
            codec="deflate",
        ),
    )
    ice_schema, last_col = spark_schema_to_iceberg(
        _json.loads(events.schema.json())
    )
    meta = {
        "format-version": 3, "table-uuid": str(uuid.uuid4()),
        "location": fsio.absolutize(root), "last-sequence-number": 2,
        "last-updated-ms": 1700000100000, "last-column-id": last_col,
        "current-schema-id": 0,
        "schemas": [{**ice_schema, "schema-id": 0}],
        "schema": {**ice_schema, "schema-id": 0},
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}], "properties": {},
        "current-snapshot-id": sid2,
        "snapshots": [
            {"sequence-number": 2, "snapshot-id": sid2,
             "timestamp-ms": 1700000100000,
             "summary": {"operation": "delete"},
             "manifest-list": l2, "schema-id": 0},
        ],
        "snapshot-log": [], "metadata-log": [],
    }
    fsio.write_atomic(f"{meta_dir}/v1.metadata.json", _json.dumps(meta))
    fsio.write_atomic(f"{meta_dir}/version-hint.text", "1")
    return read_iceberg_table(spark, root).select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


@query(
    "cdc_medallion_sync",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "incremental"),
)
def cdc_medallion_sync(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Medallion incremental ETL (bronze -> silver): the downstream
    silver table is maintained ONLY by incremental pulls — after each
    bronze commit, `read_incremental(prev, cur)` fetches the changed
    records and upserts them downstream. Silver must converge to the
    bronze snapshot without ever full-scanning bronze — the O(changed
    data) sync pattern that makes derived tables affordable at 100 TB.
    Three bronze commits (base + two incremental slices) exercise
    multi-step catch-up."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    cutoff = F.lit(CUTOFF).cast("timestamp_ntz")
    mid = F.lit("2024-01-25 00:00:00").cast("timestamp_ntz")
    slices = [
        events.filter(F.col("ts") < cutoff),
        events.filter((F.col("ts") >= cutoff) & (F.col("ts") < mid)),
        events.filter(F.col("ts") >= mid),
    ]
    root = tempfile.mkdtemp(prefix="medallion_")
    bronze = LakehouseTable.create(
        spark, f"{root}/bronze", slices[0],
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    bronze.upsert(slices[1])
    bronze.upsert(slices[2])

    silver = None
    for prev_v, cur_v in [(None, 0), (0, 1), (1, 2)]:
        if prev_v is None:
            batch = bronze.read(version=cur_v).select(*_FINAL_COLS)
        else:
            batch = bronze.read_incremental(prev_v, cur_v).select(*_FINAL_COLS)
        if silver is None:
            silver = LakehouseTable.create(
                spark, f"{root}/silver", batch,
                key_cols=["user_id"], precombine="ts",
                tiebreakers=["event_id"],
            )
        else:
            silver.upsert(batch)
    return silver.read().select(*_FINAL_COLS)


@query(
    "table_history",
    oracle="""
    SELECT * FROM (VALUES
      (0, 'insert',   TRUE,  0),
      (1, 'upsert',   TRUE,  0),
      (2, 'optimize', TRUE,  0),
      (3, 'upsert',   TRUE,  1)
    ) AS t(version, action, has_files, key_range_skipped)
    """,
    tags=("cdc", "table", "ddl"),
)
def table_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7/D10: the commit timeline surface (Hudi `show_commits` / Delta
    DESCRIBE HISTORY, README.md:1230-1240): create -> upsert ->
    optimize(cluster) -> narrow upsert, then read the history back.
    The last row pins key-level file skipping working through the
    PUBLIC history API: after clustering, the narrow upsert must have
    skipped at least one file (emitted as a saturating 0/1 flag so the
    oracle literal is stable across file-layout noise)."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="history_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    t.upsert(incr)
    t.optimize(target_files=8, cluster_by=["_hoodie_record_key"])
    one_key = incr.limit(1)
    t.upsert(one_key.withColumn("value", F.col("value") + 1.0))
    hist = [
        (
            c.version,
            c.action,
            len(c.files) > 0,
            min(1, c.stats.get("key_range_skipped_files", 0)),
        )
        for c in t.history()
    ]
    return spark.createDataFrame(
        hist, "version int, action string, has_files boolean, "
        "key_range_skipped int"
    )


@query(
    "cdc_fsck_repair",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value
    FROM events WHERE event_type <> 'click'
    """,
    tags=("cdc", "table", "maintenance"),
)
def cdc_fsck_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ``FSCK REPAIR TABLE``: the 'click' partition's base files
    vanish behind the table's back (simulating lifecycle deletion);
    before repair the snapshot scan would fail with
    FileNotFoundException, after ``fsck()`` the dead references are
    dropped by an ordinary repair commit and the table serves every
    surviving partition. Discovery is one recursive LIST against the
    manifest (never a HEAD per file); skipping indexes are pruned with
    their files. Rows in the vanished files are lost — exactly Delta's
    FSCK contract — hence the oracle: all events outside the vanished
    partition."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    path = tempfile.mkdtemp(prefix="lakehouse_fsck_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        events,
        key_cols=["event_id"],
        partition_by="event_type",
    )
    for f in t._commit(None).files:
        if "__pp=click/" in f:
            os.remove(os.path.join(t.path, f))
    report = t.fsck()
    assert report["repaired"], "fsck found nothing to repair"
    return t.read().select("event_id", "user_id", "ts", "event_type", "value")


@query(
    "cdc_gdpr_purge",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS physically_erased
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND user_id NOT IN (1, 2, 3)
    """,
    tags=("cdc", "table", "maintenance"),
)
def cdc_gdpr_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure purge: hard-delete a key set from the CoW table,
    then VACUUM so the pre-delete file versions are physically gone —
    deletion is only real once no retained file still holds the rows
    (the reference's note that old files persist until vacuum,
    README.md:1240). ``physically_erased`` re-scans EVERY parquet file
    left on disk for the purged keys and rides the oracle row, so a
    retention bug (vacuum keeping an old version, rewrite missing a
    file) flips the driver check red."""
    import os as _os

    purge_keys = [1, 2, 3]
    t = _make_table(spark, sf_dir, "cow")
    t.delete(
        spark.createDataFrame([(k,) for k in purge_keys], "user_id long")
    )
    t.vacuum(retain_versions=1)

    # physical audit: raw-scan every parquet file still on disk
    leftover = []
    for dirpath, _dn, fns in _os.walk(t.path):
        leftover += [
            _os.path.join(dirpath, f) for f in fns if f.endswith(".parquet")
        ]
    raw = spark.read.option("mergeSchema", "true").parquet(*leftover)
    erased = raw.filter(F.col("user_id").isin(purge_keys)).count() == 0
    return t.read().select(*_FINAL_COLS).withColumn(
        "physically_erased", F.lit(erased)
    )


@query(
    "cdc_reorg_purge",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS vectors_shed
    FROM events WHERE event_id % 3 <> 0
    """,
    tags=("cdc", "table", "maintenance"),
)
def cdc_reorg_purge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REORG TABLE ... APPLY (PURGE) — the compaction half of the DV
    lifecycle (r8): a deletion-vector delete keeps the commit
    O(deleted rows), but once a third of every file is dead the scan
    keeps paying for rows the anti-join discards. ``reorg_purge``
    rewrites ONLY files whose deleted fraction crossed the threshold
    (all of them here, by construction), applying and then SHEDDING
    their vectors — ``vectors_shed`` pins that the purge commit
    carries zero DV sidecars while a second no-op call (nothing left
    over the threshold) declines to commit. The oracle is the logical
    post-delete state: a purge that dropped or resurrected a row
    hash-fails."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="reorg_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events, key_cols=["event_id"], deletion_vectors=True
    )
    t.delete(events.filter(F.col("event_id") % 3 == 0).select("event_id"))
    c = t.reorg_purge(min_deleted_ratio=0.2)
    shed = c is not None and c.dv_files == [] and c.stats["purged_files"] > 0
    noop = t.reorg_purge(min_deleted_ratio=0.2) is None
    return t.read().select(*_FINAL_COLS).withColumn(
        "vectors_shed", F.lit(bool(shed and noop))
    )


@query(
    "cdc_restore_version",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value,
           1 AS restore_commits
    FROM ({_LATEST_ALL_SQL})
    """,
    tags=("cdc", "table"),
)
def cdc_restore_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE (Delta ``RESTORE VERSION AS OF`` / Hudi
    savepoint-rollback, README.md:1230-1240 time-travel family):
    create -> upsert -> restore(0) -> re-upsert. The restore is O(1)
    manifest metadata (no file copies); the re-applied batch then
    upserts against the RESTORED snapshot, so the final state equals
    latest-per-key over all events — proving normal writes continue
    cleanly on top of a restore. ``restore_commits`` pins that the
    timeline really recorded the rollback."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="restore_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    t.upsert(incr)
    t.restore(0)
    t.upsert(incr)
    n_restores = sum(1 for c in t.history() if c.action == "restore")
    return t.read().select(*_FINAL_COLS).withColumn(
        "restore_commits", F.lit(n_restores)
    )


@query(
    "cdc_zorder_skipping_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS value_files_pruned, TRUE AS user_files_pruned
    FROM events WHERE value BETWEEN 100 AND 200
    """,
    tags=("cdc", "table", "scan"),
)
def cdc_zorder_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order multi-dimensional data skipping (Delta ``ZORDER BY``):
    cluster on the Morton interleave of (user_id, value), then range-
    read on EACH dimension independently through ``read_where``. Both
    reads must scan a strict subset of files — the property linear
    clustering cannot give (its trailing columns span every file). The
    two pruning assertions are folded into the oracle row."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="zorder_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events, key_cols=["event_id"], precombine="ts",
    )
    t.optimize(target_files=16, zorder_by=["user_id", "value"])
    total = len(t._commit(None).files)
    out = t.read_where("value", lo=100.0, hi=200.0)
    v_pruned = 0 < len(out.inputFiles()) < total
    u_pruned = 0 < len(
        t.read_where("user_id", lo=0, hi=3).inputFiles()
    ) < total
    return (
        out.select(*_FINAL_COLS)
        .withColumn("value_files_pruned", F.lit(v_pruned))
        .withColumn("user_files_pruned", F.lit(u_pruned))
    )


@query(
    "cdc_bloom_skipping_upsert",
    oracle="""
    SELECT event_id, CAST(-event_id AS DOUBLE) AS value,
           TRUE AS bloom_pruned
    FROM events WHERE event_id IN (10, 20, 30)
    """,
    tags=("cdc", "table", "index"),
)
def cdc_bloom_skipping_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-index file skipping (Hudi ``hoodie.index.type=BLOOM``) on
    the shape the range tier cannot prune: an UNCLUSTERED table whose
    every file spans the whole key range (hash-distributed write), so
    per-file min/max ranges all overlap and the range probe declines.
    The per-file key blooms stored in the commit manifest still prune —
    a 3-key upsert rewrites only the files whose blooms claim a key.
    ``bloom_pruned`` pins that the commit really skipped files AND
    rewrote a strict subset, folded into the oracle row. (AQE partition
    coalescing is suspended for the create: it would legitimately fold
    these small files into one, removing the multi-file shape whose
    pruning this query demonstrates.)"""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="bloomskip_") + "/events_tbl"
    conf_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        t = LakehouseTable.create(
            spark, path, events.repartition(8),
            key_cols=["event_id"], precombine="ts", bloom_index=True,
        )
    finally:
        spark.conf.set(conf_key, old)
    src = (
        events.filter(F.col("event_id").isin(10, 20, 30))
        .withColumn("value", (-F.col("event_id")).cast("double"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    )
    commit = t.upsert(src)
    pruned = (
        commit.stats["bloom_skipped_files"] > 0
        and commit.stats["rewritten_files"] < 8
    )
    return (
        t.read()
        .filter(F.col("event_id").isin(10, 20, 30))
        .select("event_id", "value")
        .withColumn("bloom_pruned", F.lit(pruned))
    )


@query(
    "cdc_column_bloom_lookup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           TRUE AS files_pruned
    FROM orders WHERE o_custkey = 8
    """,
    tags=("cdc", "table", "scan", "bloom"),
)
def cdc_column_bloom_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level bloom filter index (Delta
    ``delta.bloomFilter.enabled`` on arbitrary columns): the table is
    clustered by its KEY, so every file's ``o_custkey`` [min, max]
    spans most of the customer range and the stats tier cannot prune —
    exactly the regime where Delta reaches for per-file column blooms.
    The equality read probes each candidate file's 8 KiB ``o_custkey``
    bloom and scans only claimed files; ``files_pruned`` pins that a
    strict subset of the live files was read, folded into the oracle
    row."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    path = tempfile.mkdtemp(prefix="colbloom_") + "/orders_tbl"
    t = LakehouseTable.create(
        spark, path, orders,
        key_cols=["o_orderkey"], bloom_columns=["o_custkey"],
    )
    t.optimize(target_files=24, cluster_by=["o_orderkey"])
    out = t.read_where("o_custkey", 8, 8)
    pruned = 0 < len(out.inputFiles()) < len(t._commit(None).files)
    return out.select("o_orderkey", "o_custkey", "o_totalprice").withColumn(
        "files_pruned", F.lit(pruned)
    )


@query(
    "cdc_stats_skipping_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS files_pruned
    FROM events WHERE user_id BETWEEN 10 AND 40
    """,
    tags=("cdc", "table", "scan"),
)
def cdc_stats_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-stats data skipping (Delta stats / Hudi col-stats index):
    cluster the table on ``user_id``, then range-read via ``read_where``
    — the manifest's per-file min/max prunes non-intersecting files
    driver-side BEFORE the scan, and the exact predicate pushes into
    the surviving files for row-group skipping. ``files_pruned``
    asserts the scan really read a strict subset of the table's files,
    folded into the oracle row."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="statsskip_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
    )
    t.optimize(target_files=8, cluster_by=["user_id"])
    out = t.read_where("user_id", lo=10, hi=40)
    pruned = 0 < len(out.inputFiles()) < len(t._commit(None).files)
    return out.select(*_FINAL_COLS).withColumn(
        "files_pruned", F.lit(pruned)
    )


@query(
    "cdc_multi_predicate_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS files_pruned
    FROM events
    WHERE event_type = 'click' AND user_id BETWEEN 10 AND 40
    """,
    tags=("cdc", "table", "scan"),
)
def cdc_multi_predicate_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-conjunct stats skipping on the engine's OWN manifest
    (r10, `read_matching` — the same `(col, op, value)` / SQL-string
    predicate API every foreign reader takes): cluster on user_id,
    then serve a two-column conjunct predicate — any provably-disjoint
    conjunct skips the file driver-side, the exact filters push into
    the surviving scan. `files_pruned` asserts a strict subset of the
    table's files was read, folded into the oracle row."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="multipred_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
    )
    t.optimize(target_files=8, cluster_by=["user_id"])
    out = t.read_matching(
        "event_type = 'click' AND user_id >= 10 AND user_id <= 40"
    )
    pruned = 0 < len(out.inputFiles()) < len(t._commit(None).files)
    return out.select(*_FINAL_COLS).withColumn(
        "files_pruned", F.lit(pruned)
    )


@query(
    "cdc_ts_range_pruned_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS files_pruned
    FROM events
    WHERE ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts <  TIMESTAMP '2024-01-12 00:00:00'
    """,
    tags=("cdc", "table", "scan", "pruning"),
)
def cdc_ts_range_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIMESTAMP-range data skipping on the engine's own manifest
    (r12): the dominant ingest-table read — "last two days of events"
    — over a table range-clustered on ``ts``. Footer datetime stats
    index as ISO strings in the manifest (INT96 parquet carried NO
    stats, silently disabling ts skipping everywhere — the session
    now writes TIMESTAMP_MICROS), and the shared interval compare
    coerces the datetime literals against them, so the driver-side
    check skips every file whose ts window is provably disjoint
    BEFORE the scan. `files_pruned` asserts a strict subset of the
    table's files was read, folded into the oracle row."""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="tsprune_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
    )
    t.optimize(target_files=8, cluster_by=["ts"])
    out = t.read_matching(
        "ts >= TIMESTAMP '2024-01-10 00:00:00' AND "
        "ts < TIMESTAMP '2024-01-12 00:00:00'"
    )
    pruned = 0 < len(out.inputFiles()) < len(t._commit(None).files)
    return out.select(*_FINAL_COLS).withColumn(
        "files_pruned", F.lit(pruned)
    )


@query(
    "cdc_metadata_only_agg",
    oracle=f"""
    SELECT COUNT(*) AS count_rows,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM ({_LATEST_ALL_SQL})
    """,
    tags=("cdc", "table", "agg"),
)
def cdc_metadata_only_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation (Delta OptimizeMetadataOnlyQuery /
    per-AddFile ``numRecords``): after the create+upsert cycle,
    ``COUNT(*)`` and ``MIN/MAX(value)`` are answered purely from the
    manifest's footer row counts and column stats —
    ``require_metadata_only=True`` makes the query FAIL rather than
    silently scan, so the green row proves zero-data-IO aggregation,
    the 100 TB instant-count path. The oracle recomputes the same
    aggregate over the table's logical post-state in SQL."""
    t = _make_table(spark, sf_dir, "cow")
    return t.metadata_agg(["value"], require_metadata_only=True)


@query(
    "iceberg_stats_skipping_read",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS files_pruned
    FROM events WHERE user_id BETWEEN 10 AND 40
    """,
    tags=("cdc", "iceberg", "scan"),
)
def iceberg_stats_skipping_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data skipping THROUGH the Iceberg metadata path: cluster the
    table on ``user_id``, export it as an Iceberg tree (whose manifest
    entries carry the col-stats bounds), then range-read via
    ``read_iceberg_where`` — file pruning happens purely against the
    manifest bounds, exactly how an Iceberg planner serves a selective
    predicate on a 100 TB table without touching one parquet footer.
    ``files_pruned`` asserts the scan read a strict subset of the live
    files, folded into the oracle row."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_where,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="icestatsskip_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
    )
    t.optimize(target_files=8, cluster_by=["user_id"])
    export_iceberg_metadata(t)
    out = read_iceberg_where(spark, path, "user_id", lo=10, hi=40)
    pruned = 0 < len(out.inputFiles()) < len(t._commit(None).files)
    return out.select(*_FINAL_COLS).withColumn(
        "files_pruned", F.lit(pruned)
    )


@query(
    "iceberg_equality_delete_read",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND user_id NOT IN (
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      )
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "iceberg", "scan", "eq-delete"),
)
def iceberg_equality_delete_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Iceberg v2 EQUALITY deletes on read (r7, VERDICT r6 #3) — the
    exact shape a Flink CDC writer emits: sequence 1 holds the
    pre-cutoff events; sequence 2 is one upsert checkpoint carrying an
    equality-delete file on ``user_id`` (every post-cutoff user) plus
    a data file of those users' latest events. The reader must kill
    pre-cutoff rows of deleted users via the null-safe
    ``equality_ids`` anti-join with STRICT ``data_seq < delete_seq``
    ordering — the same-sequence re-inserts survive, which is what
    makes Flink's delete+insert protocol correct."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
    )

    root = _author_eq_delete_tree(spark, sf_dir)
    return read_iceberg_table(spark, root).select(*_FINAL_COLS)


def _author_eq_delete_tree(spark: SparkSession, sf_dir: str) -> str:
    """Hand-author the Flink-CDC-shaped v2 tree both eq-delete queries
    share. Data files are written by Spark jobs (never collected);
    only the O(files) metadata tree is authored on the driver."""
    from hudi_and_delta_showcase_spark.avro_ocf import ocf_encode
    from hudi_and_delta_showcase_spark.tables import fsio

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ice_eqdel_") + "/t"
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest_incr = (
        incr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    parts: dict[str, list[str]] = {}
    for sub, df in (
        ("base", base),
        ("eqdel", incr.select("user_id").distinct()),
        ("new", latest_incr),
    ):
        df.write.parquet(f"{root}/data/{sub}")
        parts[sub] = sorted(
            fsio.relpath(p, root)
            for p in fsio.walk_files(f"{root}/data/{sub}", ".parquet")
        )

    # -- hand-author the v2 metadata tree (driver-side, O(files)) ----
    def opt(name, t, fid):
        return {"name": name, "type": ["null", t], "default": None,
                "field-id": fid}

    data_file = {
        "type": "record", "name": "r2", "fields": [
            {"name": "content", "type": "int", "field-id": 134},
            {"name": "file_path", "type": "string", "field-id": 100},
            {"name": "file_format", "type": "string", "field-id": 101},
            {"name": "partition",
             "type": {"type": "record", "name": "r102", "fields": []},
             "field-id": 102},
            {"name": "record_count", "type": "long", "field-id": 103},
            {"name": "file_size_in_bytes", "type": "long", "field-id": 104},
            opt("equality_ids", {"type": "array", "items": "int"}, 135),
        ],
    }
    entry_schema = {
        "type": "record", "name": "manifest_entry", "fields": [
            {"name": "status", "type": "int", "field-id": 0},
            opt("snapshot_id", "long", 1),
            opt("sequence_number", "long", 3),
            opt("file_sequence_number", "long", 4),
            {"name": "data_file", "type": data_file, "field-id": 2},
        ],
    }
    mlist_schema = {
        "type": "record", "name": "manifest_file", "fields": [
            {"name": "manifest_path", "type": "string", "field-id": 500},
            {"name": "manifest_length", "type": "long", "field-id": 501},
            {"name": "partition_spec_id", "type": "int", "field-id": 502},
            {"name": "content", "type": "int", "field-id": 517},
            {"name": "sequence_number", "type": "long", "field-id": 515},
            {"name": "min_sequence_number", "type": "long", "field-id": 516},
            {"name": "added_snapshot_id", "type": "long", "field-id": 503},
        ],
    }

    def entry(rel, seq, content, eq_ids=None):
        return {
            "status": 1, "snapshot_id": SID, "sequence_number": seq,
            "file_sequence_number": seq,
            "data_file": {
                "content": content, "file_path": f"{root}/{rel}",
                "file_format": "PARQUET", "partition": {},
                "record_count": -1,
                "file_size_in_bytes": fsio.file_size(fsio.join(root, rel)),
                "equality_ids": eq_ids,
            },
        }

    SID = 8800000000000000001
    fsio.makedirs(f"{root}/metadata")
    manifests = []
    for name, entries, content in (
        ("m0", [entry(r, 1, 0) for r in parts["base"]]
         + [entry(r, 2, 0) for r in parts["new"]], 0),
        # equality_ids=[2]: user_id is field id 2 in the schema below
        ("m1", [entry(r, 2, 2, [2]) for r in parts["eqdel"]], 1),
    ):
        blob = ocf_encode(entry_schema, entries, codec="deflate")
        p = f"{root}/metadata/eq-{name}.avro"
        fsio.write_bytes_atomic(p, blob)
        manifests.append({
            "manifest_path": p, "manifest_length": len(blob),
            "partition_spec_id": 0, "content": content,
            "sequence_number": 2, "min_sequence_number": 1,
            "added_snapshot_id": SID,
        })
    mlist = f"{root}/metadata/snap-{SID}-1-eq.avro"
    fsio.write_bytes_atomic(
        mlist, ocf_encode(mlist_schema, manifests, codec="deflate")
    )
    schema = {
        "type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "event_id", "required": False, "type": "long"},
            {"id": 2, "name": "user_id", "required": False, "type": "long"},
            {"id": 3, "name": "ts", "required": False, "type": "timestamp"},
            {"id": 4, "name": "event_type", "required": False,
             "type": "string"},
            {"id": 5, "name": "value", "required": False, "type": "double"},
        ],
    }
    meta = {
        "format-version": 2, "table-uuid": str(uuid.uuid4()),
        "location": root, "last-sequence-number": 2,
        "last-updated-ms": 1700000000000, "last-column-id": 5,
        "current-schema-id": 0, "schemas": [schema], "schema": schema,
        "default-spec-id": 0,
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "last-partition-id": 999, "default-sort-order-id": 0,
        "sort-orders": [{"order-id": 0, "fields": []}], "properties": {},
        "current-snapshot-id": SID,
        "snapshots": [{"sequence-number": 2, "snapshot-id": SID,
                       "timestamp-ms": 1700000000000,
                       "summary": {"operation": "overwrite"},
                       "manifest-list": mlist, "schema-id": 0}],
        "snapshot-log": [], "metadata-log": [],
    }
    fsio.write_atomic(
        f"{root}/metadata/00001-{uuid.uuid4()}.metadata.json",
        json.dumps(meta),
    )
    return root


@query(
    "delta_dv_export_roundtrip",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND event_id NOT IN (
        SELECT event_id FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
          AND user_id % 7 = 0
      )
    """,
    tags=("cdc", "table", "delta", "dv", "export"),
)
def delta_dv_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DV EXPORT (late r7): a lakehouse table with LIVE deletion
    vectors exports its ``_delta_log`` WITHOUT materialization — the
    engine sidecar becomes a real RoaringBitmapArray DV bin and the
    data file re-adds with a ``deletionVector`` descriptor under
    protocol 3/7, exactly what a delta-spark DELETE emits — and the
    foreign-protocol reader must serve the post-delete state from the
    log alone. Any resurrected deleted row (or over-deleted survivor)
    hash-fails the oracle."""
    from hudi_and_delta_showcase_spark.tables import delta_log as dl

    base, _ = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="delta_dv_export_") + "/t"
    t = LakehouseTable.create(
        spark, root, base,
        key_cols=["event_id"], precombine="ts", deletion_vectors=True,
    )
    t.delete(base.filter(F.col("user_id") % 7 == 0).select("event_id"))
    assert t._commit(None).dv_files  # merge-on-read delete state, live
    dl.export_delta_log(t)
    return dl.read_delta_table(spark, root).select(*_FINAL_COLS)


@query(
    "delta_cdf_export_roundtrip",
    oracle="""
    WITH pre AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ), allv AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), upd AS (
      SELECT user_id FROM pre
      WHERE user_id IN (SELECT user_id FROM events
                        WHERE ts >= TIMESTAMP '{CUTOFF}')
    )
    SELECT 0 AS commit_version, 'insert' AS change_type, user_id, event_id, value
    FROM pre
    UNION ALL
    SELECT 1, 'update_preimage', p.user_id, p.event_id, p.value
    FROM pre p JOIN upd u ON p.user_id = u.user_id
    UNION ALL
    SELECT 1, 'update_postimage', a.user_id, a.event_id, a.value
    FROM allv a JOIN upd u ON a.user_id = u.user_id
    UNION ALL
    SELECT 1, 'insert', a.user_id, a.event_id, a.value
    FROM allv a
    WHERE a.user_id NOT IN (SELECT user_id FROM pre)
      AND a.user_id IN (SELECT user_id FROM events
                        WHERE ts >= TIMESTAMP '{CUTOFF}')
    """.replace("{CUTOFF}", CUTOFF),
    tags=("cdc", "table", "cdf", "delta", "export"),
)
def delta_cdf_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta CHANGE DATA FEED through the exported ``_delta_log`` (late
    r7): the engine's CDC sidecars become real ``cdc`` actions and
    ``read_delta_changes`` — Delta's ``table_changes()`` semantics
    against the raw protocol — must replay the identical feed the
    engine's own ``read_changes`` serves: version-0 inserts
    SYNTHESIZED from the add actions (the commit carries no cdc action,
    Delta's add-only rule), version-1 pre/post/insert images from the
    exported change files. Same full-surface oracle as
    cdc_mor_changes_feed."""
    from hudi_and_delta_showcase_spark.tables import delta_log as dl

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="delta_cdf_")
    t = LakehouseTable.create(
        spark, f"{path}/t", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        cdc_enabled=True,
    )
    t.upsert(incr)
    dl.export_delta_log(t)
    return dl.read_delta_changes(spark, t.path, 0).select(
        F.col("_commit_version").cast("int").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
        "user_id", "event_id", "value",
    )


@query(
    "cdc_convert_iceberg_deletes",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND user_id NOT IN (
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      )
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "iceberg", "convert", "eq-delete"),
)
def cdc_convert_iceberg_deletes(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CONVERT FROM ICEBERG on a DELETE-BEARING v2 snapshot (late r7):
    the same Flink-CDC-shaped tree as ``iceberg_equality_delete_read``
    adopts in place — the equality-delete state materializes as the
    engine's DV sidecar at version 0 (``deleted_positions_df``: the
    read path's sequence-ordered null-safe join, inverted to FIND the
    rows), data files byte-identical. The adopted table must serve the
    identical post-delete state through the normal ``_apply_dvs``
    path; a resurrected pre-cutoff row of an upserted user hash-fails
    the oracle."""
    root = _author_eq_delete_tree(spark, sf_dir)
    t = LakehouseTable.convert_iceberg(
        spark, root,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_concurrent_writers",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "occ"),
)
def cdc_concurrent_writers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-writer OCC (Delta optimistic concurrency / Hudi
    OPTIMISTIC_CONCURRENCY_CONTROL): two writers upsert DISJOINT
    partition sets of the post-cutoff batch concurrently — writer B's
    commit lands between writer A's snapshot read and A's commit
    attempt (a real version race, staged by intercepting the commit
    append). A's commit must detect the collision, prove
    partition-disjointness from the manifests, REBASE onto B's commit,
    and land at the next version — no locks, neither writer's changes
    lost. Final state must equal latest-per-(key, partition) over ALL
    events, exactly as if the writers had run serially.
    """
    from hudi_and_delta_showcase_spark.tables import manifest as mf

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_occ_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        partition_by="event_type",
    )
    a_types = ("click", "view")
    batch_a = incr.filter(F.col("event_type").isin(*a_types))
    batch_b = incr.filter(~F.col("event_type").isin(*a_types))

    fired = [False]
    orig = mf.append_commit

    def inject(table_path, commit):
        if not fired[0]:
            fired[0] = True
            LakehouseTable(spark, t.path).upsert(batch_b)  # writer B wins
        return orig(table_path, commit)

    mf.append_commit = inject
    try:
        rebased = t.upsert(batch_a)  # writer A: collides, rebases
    finally:
        mf.append_commit = orig
    assert rebased.version == 2, "writer A must rebase to version 2"
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_liquid_clustering",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS carried_untouched, TRUE AS restacked_only_new,
           TRUE AS point_read_pruned
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "maintenance"),
)
def cdc_liquid_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental clustering (Delta liquid-clustering economics): a
    full OPTIMIZE clusters the pre-cutoff snapshot on user_id; the
    post-cutoff upsert then lands new, unclustered files; an
    ``optimize(cluster_by=..., incremental=True)`` restacks ONLY those
    arrivals — O(new data), with every already-clustered file carried
    over by name and a point read pruning to at most one file per
    clustering generation. The three structural assertions are folded
    into the oracle row; table state must still equal
    latest-per-key over all events."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="liquid_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, base, key_cols=["user_id"], precombine="ts",
        tiebreakers=["event_id"],
    )
    t.optimize(target_files=8, cluster_by=["user_id"])
    gen0 = t._commit(None)
    t.upsert(incr)
    after_upsert = t._commit(None)
    survivors = [f for f in after_upsert.files if f in gen0.files]
    arrived = [f for f in after_upsert.files if f not in gen0.files]
    inc = t.optimize(target_files=8, cluster_by=["user_id"], incremental=True)
    # every clustered file the upsert left alone is carried by NAME
    carried_untouched = all(f in inc.files for f in survivors)
    restacked_only_new = inc.stats["mode"] == "incremental" and inc.stats[
        "restacked_files"
    ] == len(arrived)
    total = len(inc.files)
    probe = t.read_where("user_id", lo=1, hi=1)
    point_read_pruned = 0 < len(probe.inputFiles()) < total
    return (
        t.read()
        .select(*_FINAL_COLS)
        .withColumn("carried_untouched", F.lit(bool(carried_untouched)))
        .withColumn("restacked_only_new", F.lit(bool(restacked_only_new)))
        .withColumn("point_read_pruned", F.lit(bool(point_read_pruned)))
    )


@query(
    "cdc_type_widening",
    oracle=f"""
    SELECT event_id, user_id,
           CASE WHEN ts < TIMESTAMP '{CUTOFF}'
                THEN CAST(CAST(value AS REAL) AS DOUBLE)
                ELSE value END AS value,
           TRUE AS schema_widened, TRUE AS no_rewrite
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "schema"),
)
def cdc_type_widening(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-widening schema evolution (Delta ``typeWidening``): the base
    snapshot is written with NARROW columns (event_id/user_id int,
    value float); the post-cutoff batch arrives with the natural wider
    types (bigint/double). The upsert widens the TABLE schema as pure
    metadata — ``schema_widened`` pins the recorded schema and the read
    dtypes, ``no_rewrite`` pins that files the upsert didn't touch for
    data reasons were NOT rewritten for schema reasons (legacy narrow
    files upcast at scan time). Values written through the float era
    keep float precision — the oracle reproduces that with the same
    double(float(x)) round-trip."""
    base, incr = _split(spark, sf_dir)
    narrow = base.select(
        F.col("event_id").cast("int").alias("event_id"),
        F.col("user_id").cast("int").alias("user_id"),
        F.col("ts"),
        F.col("value").cast("float").alias("value"),
    )
    wide = incr.select("event_id", "user_id", "ts", "value")
    path = tempfile.mkdtemp(prefix="widen_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, narrow, key_cols=["user_id"], precombine="ts",
        tiebreakers=["event_id"],
    )
    v0 = t._commit(None)
    t.upsert(wide)
    commit = t._commit(None)
    out = t.read()
    dt = dict(out.dtypes)
    schema_widened = bool(commit.table_schema) and dt == {
        **dt, "event_id": "bigint", "user_id": "bigint", "value": "double"
    }
    untouched = [f for f in commit.files if f in v0.files]
    no_rewrite = commit.stats["carried_over_files"] == len(untouched)
    return (
        out.select("event_id", "user_id", "value")
        .withColumn("schema_widened", F.lit(schema_widened))
        .withColumn("no_rewrite", F.lit(bool(no_rewrite)))
    )


@query(
    "cdc_record_index_lookup",
    oracle="""
    SELECT event_id, CAST(-event_id AS DOUBLE) AS value,
           TRUE AS upsert_pruned, TRUE AS lookup_pruned
    FROM events WHERE event_id IN (11, 21, 31)
    """,
    tags=("cdc", "table", "index"),
)
def cdc_record_index_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level index (Hudi 1.0 record index): an exact key->file
    mapping maintained O(new rows) per commit, probed on the shape
    neither range nor bloom tiers serve perfectly — an UNCLUSTERED
    hash-distributed table where every file spans the whole key range.
    The 3-key upsert rewrites ONLY the files the index names
    (``upsert_pruned``), and the subsequent point lookup scans a strict
    subset of files (``lookup_pruned``), both folded into the oracle
    row. (AQE coalescing suspended for the create, as in the bloom
    row, to preserve the multi-file shape under test.)"""
    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="riskip_") + "/events_tbl"
    conf_key = "spark.sql.adaptive.coalescePartitions.enabled"
    old = spark.conf.get(conf_key)
    spark.conf.set(conf_key, "false")
    try:
        t = LakehouseTable.create(
            spark, path, events.repartition(8),
            key_cols=["event_id"], precombine="ts", record_index=True,
        )
    finally:
        spark.conf.set(conf_key, old)
    src = (
        events.filter(F.col("event_id").isin(11, 21, 31))
        .withColumn("value", (-F.col("event_id")).cast("double"))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY"))
    )
    commit = t.upsert(src)
    upsert_pruned = (
        commit.stats["record_index_skipped_files"] > 0
        and commit.stats["rewritten_files"] <= 3
    )
    out = t.read_for_keys([11, 21, 31])
    lookup_pruned = 0 < len(out.inputFiles()) <= 3 < len(commit.files)
    return (
        out.select("event_id", "value")
        .withColumn("upsert_pruned", F.lit(bool(upsert_pruned)))
        .withColumn("lookup_pruned", F.lit(bool(lookup_pruned)))
    )


@query(
    "sql_update_delete",
    oracle=f"""
    SELECT user_id, event_id,
           CASE WHEN event_type = 'error' THEN value * 2
                ELSE value END AS value
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND event_type <> 'signup'
    """,
    tags=("cdc", "sql", "dml"),
)
def sql_update_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference scenario's DML statements
    (/root/reference/README.md:185-186 — ``update ... where``,
    ``delete from ... where``) issued DIRECTLY against the lakehouse
    table as SQL strings: UPDATE doubles the value of every live row
    whose event_type is 'error'; DELETE removes the keys whose live row
    is a 'signup'. The WHERE predicates push into the snapshot scan and
    the writes reuse the key-pruned upsert/delete paths — a DML
    touching k keys rewrites O(files holding k keys). Final state must
    equal the window-SQL oracle over raw events."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import (
        execute_delete,
        execute_update,
    )

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    path = tempfile.mkdtemp(prefix="sqldml_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, events, key_cols=["user_id"], precombine="ts",
        tiebreakers=["event_id"],
    )
    execute_update(
        spark,
        "UPDATE events_tbl SET value = value * 2 WHERE event_type = 'error'",
        {"events_tbl": t},
    )
    execute_delete(
        spark,
        "DELETE FROM events_tbl WHERE event_type = 'signup'",
        {"events_tbl": t},
    )
    return t.read().select("user_id", "event_id", "value")


@query(
    "cdc_drop_column",
    oracle="""
    SELECT event_id, user_id, ts, value,
           TRUE AS metadata_only, TRUE AS time_travel_shows_dropped,
           TRUE AS readd_refused
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "schema"),
)
def cdc_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DROP COLUMN under column mapping (Delta ALTER TABLE ... DROP
    COLUMN): after the initial load, ``event_type`` is dropped as a
    METADATA-ONLY commit — the query pins zero files changed, the
    CDC batch then upserts WITHOUT the column and merges against
    pre-drop files, time travel still shows the column at version 0,
    and a batch re-carrying the dropped name is refused (old file data
    must not resurrect). Final state equals latest-per-key minus the
    dropped column."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_drop_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
    )
    before = t._commit(None).files
    dc = t.drop_column("event_type")
    metadata_only = dc.files == before
    t.upsert(incr.drop("event_type"))
    time_travel_shows = "event_type" in t.read(version=0).columns
    try:
        t.upsert(incr.limit(1))
        readd_refused = False
    except ValueError:
        readd_refused = True
    return (
        t.read()
        .select("event_id", "user_id", "ts", "value")
        .withColumn("metadata_only", F.lit(bool(metadata_only)))
        .withColumn(
            "time_travel_shows_dropped", F.lit(bool(time_travel_shows))
        )
        .withColumn("readd_refused", F.lit(bool(readd_refused)))
    )


@query(
    "cdc_uniform_export",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value,
           TRUE AS export_incremental, TRUE AS hoodie_export_matches,
           TRUE AS iceberg_export_matches
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "interop"),
)
def cdc_uniform_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta UniForm / Apache XTable interop, ALL THREE formats: the
    lakehouse table's manifest timeline is exported as a REAL
    ``_delta_log``, a real ``.hoodie`` instant timeline, AND a real
    Iceberg ``metadata/`` tree over the SAME parquet files
    (metadata-only, no data copied). Final state read back through the
    DELTA-protocol reader must equal latest-per-key over all events;
    ``hoodie_export_matches`` / ``iceberg_export_matches`` pin that the
    HUDI- and ICEBERG-protocol readers serve the identical rows, and
    ``export_incremental`` that re-export appends rather than
    rewrites."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        delta_history,
        export_delta_log,
        read_delta_table,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="uniform_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, base, key_cols=["user_id"], precombine="ts",
        tiebreakers=["event_id"],
    )
    assert export_delta_log(t) == 0
    t.upsert(incr)
    assert export_delta_log(t) == 1
    export_incremental = len(delta_history(t.path)) == 2
    # the .hoodie sibling: same files, Hudi instant timeline, identical
    # state through the Hudi-protocol reader
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )

    export_hoodie_timeline(t)
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )

    export_iceberg_metadata(t)
    via_delta = read_delta_table(spark, t.path).select(*_FINAL_COLS)
    via_hudi = read_hoodie_table(spark, t.path).select(*_FINAL_COLS)
    via_iceberg = read_iceberg_table(spark, t.path).select(*_FINAL_COLS)
    hoodie_matches = (
        via_hudi.exceptAll(via_delta).isEmpty()
        and via_delta.exceptAll(via_hudi).isEmpty()
    )
    iceberg_matches = (
        via_iceberg.exceptAll(via_delta).isEmpty()
        and via_delta.exceptAll(via_iceberg).isEmpty()
    )
    return (
        via_delta
        .withColumn("export_incremental", F.lit(bool(export_incremental)))
        .withColumn("hoodie_export_matches", F.lit(bool(hoodie_matches)))
        .withColumn("iceberg_export_matches", F.lit(bool(iceberg_matches)))
    )


@query(
    "cdc_generated_partition",
    oracle="""
    SELECT event_id, user_id, ts, value,
           CAST(ts AS DATE) AS event_day,
           TRUE AS mismatch_rejected
    FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id, CAST(ts AS DATE)
        ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "schema"),
)
def cdc_generated_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generated columns (Delta GENERATED ALWAYS AS) driving the
    PARTITION layout: the table partitions on ``event_day =
    cast(ts as date)`` (timezone-free on NTZ — date_trunc would coerce
    to LTZ and shift under a non-UTC session), a column no batch ever
    provides — every
    write derives it in one codegen'd projection, so ingest stays
    day-partitioned with zero caller cooperation. A batch providing a
    WRONG value for the generated column is rejected
    (``mismatch_rejected``). Final state = latest-per-(user, day) over
    all events — the non-global resolution the generated partition
    induces."""
    base, incr = _split(spark, sf_dir)
    keep = ["event_id", "user_id", "ts", "value"]
    path = tempfile.mkdtemp(prefix="genpart_") + "/events_tbl"
    t = LakehouseTable.create(
        spark, path, base.select(*keep),
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        partition_by="event_day",
        generated_columns={"event_day": "cast(ts as date)"},
    )
    t.upsert(incr.select(*keep))
    try:
        t.upsert(
            incr.select(*keep)
            .limit(1)
            .withColumn("event_day", F.expr("date'1999-01-01'"))
        )
        mismatch_rejected = False
    except ValueError:
        mismatch_rejected = True
    return (
        t.read()
        .select(*keep, "event_day")
        .withColumn("mismatch_rejected", F.lit(bool(mismatch_rejected)))
    )


@query(
    "cdc_jdbc_backfill_loop",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'apple',    10, 1673496060, 'INSERT',        FALSE),
      (2, 'samsung', 201, 1673501401, 'UPDATE-INSERT', FALSE),
      (3, 'dell',     30, 1673501402, 'DELETE',        TRUE),
      (4, 'motorola', 40, 1673496060, 'INSERT',        FALSE),
      (5, 'htc',      50, 1673501400, 'INSERT',        FALSE)
    ) AS t(pk_id, name, value, updated_at, change_type, is_deleted)
    """,
    tags=("cdc", "jdbc", "source", "streaming"),
)
def cdc_jdbc_backfill_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 NATIVE: the reference's MySQL -> Datastream -> lakehouse loop
    with a real JDBC source standing in for the backfill dump
    (/root/reference/README.md:40-49,83-93,164-174). An embedded Derby
    database (driver ships in Spark's jars) holds the golden 4-row
    source table; ``spark.read.jdbc`` snapshots it (partitioned-read
    capable, TIMESTAMP as NTZ so wall time survives any session
    timezone), the snapshot is wrapped in Datastream BACKFILL envelopes,
    landed as a file batch, and streamed into the lakehouse table via
    ``apply_cdc_stream``; the golden 3-change binlog batch then lands
    and upserts. Final state = the reference's post-merge goldens
    (soft delete retained, README.md:511-531)."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        read_jdbc_snapshot,
        snapshot_to_envelopes,
    )
    from hudi_and_delta_showcase_spark.operators.cdc import golden_cdc_batch
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        apply_cdc_stream,
    )

    root = tempfile.mkdtemp(prefix="jdbc_loop_")
    url = f"jdbc:derby:{root}/srcdb;create=true"
    jvm = spark._jvm
    # keep derby.log out of the caller's working directory
    jvm.java.lang.System.setProperty("derby.system.home", root)
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST (pk_id INT PRIMARY KEY, "
        "name VARCHAR(64), value INT, updated_at TIMESTAMP, "
        "created_at TIMESTAMP)"
    )
    for pk, name, value in [
        (1, "apple", 10), (2, "samsung", 20),
        (3, "dell", 30), (4, "motorola", 40),
    ]:
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, '{name}', {value}, "
            "TIMESTAMP('2023-01-12 04:01:00'), "
            "TIMESTAMP('2023-01-12 04:00:00'))"
        )
    st.close()
    conn.close()

    snap = read_jdbc_snapshot(
        spark, url, "HUDI_DELTA_TEST",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        partition_column="pk_id", lower_bound=1, upper_bound=5,
        num_partitions=2,
    )
    env = snapshot_to_envelopes(
        snap, "hudi_delta_test", "db", ["pk_id"],
        read_timestamp="2023-01-12 04:05:00",
    )
    drop = f"{root}/drop"
    env.coalesce(1).write.parquet(f"{drop}/b0")
    apply_cdc_stream(
        spark, f"{drop}/*/", f"{root}/table", checkpoint_dir=f"{root}/ckpt"
    )
    golden_cdc_batch(spark).coalesce(1).write.parquet(f"{drop}/b1")
    table = apply_cdc_stream(
        spark, f"{drop}/*/", f"{root}/table", checkpoint_dir=f"{root}/ckpt"
    )
    return table.read().select(
        "pk_id", "name", "value", "updated_at", "change_type", "is_deleted"
    )


@query(
    "cdc_jdbc_incremental_diff",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'apple',    10, 1673496060, 'INSERT',        FALSE),
      (2, 'samsung', 201, 1673501401, 'UPDATE-INSERT', FALSE),
      (3, 'dell',     30, 1673496060, 'DELETE',        TRUE),
      (4, 'motorola', 40, 1673496060, 'INSERT',        FALSE),
      (5, 'htc',      50, 1673501400, 'INSERT',        FALSE)
    ) AS t(pk_id, name, value, updated_at, change_type, is_deleted)
    """,
    tags=("cdc", "jdbc", "source", "incremental"),
)
def cdc_jdbc_incremental_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10's CHANGE half without a binlog reader: after the JDBC
    backfill, the source database mutates (insert pk5, update pk2,
    delete pk3 — the reference's exact scenario, README.md:183-189);
    a second snapshot is DIFFED against the first into Datastream
    change envelopes (INSERT / UPDATE-INSERT / DELETE with the
    last-seen image, soft-delete semantics preserved) and applied
    through the same streaming CDC loop. Trigger-free JDBC CDC — one
    full-outer key join per sync, exact at any scale."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        read_jdbc_snapshot,
        snapshot_diff_envelopes,
        snapshot_to_envelopes,
    )
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        apply_cdc_stream,
    )

    root = tempfile.mkdtemp(prefix="jdbc_diff_")
    url = f"jdbc:derby:{root}/srcdb;create=true"
    jvm = spark._jvm
    # keep derby.log out of the caller's working directory
    jvm.java.lang.System.setProperty("derby.system.home", root)
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST (pk_id INT PRIMARY KEY, "
        "name VARCHAR(64), value INT, updated_at TIMESTAMP, "
        "created_at TIMESTAMP)"
    )
    for pk, name, value in [
        (1, "apple", 10), (2, "samsung", 20),
        (3, "dell", 30), (4, "motorola", 40),
    ]:
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, '{name}', {value}, "
            "TIMESTAMP('2023-01-12 04:01:00'), "
            "TIMESTAMP('2023-01-12 04:00:00'))"
        )
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    snap0 = read_jdbc_snapshot(spark, url, "HUDI_DELTA_TEST", **drv)
    env0 = snapshot_to_envelopes(
        snap0, "hudi_delta_test", "db", ["pk_id"],
        read_timestamp="2023-01-12 04:05:00",
    )
    drop = f"{root}/drop"
    env0.coalesce(1).write.parquet(f"{drop}/b0")
    apply_cdc_stream(
        spark, f"{drop}/*/", f"{root}/table", checkpoint_dir=f"{root}/ckpt"
    )
    # materialize snap0 BEFORE mutating (JDBC reads are live views)
    snap0 = snap0.localCheckpoint()

    # the reference's source-side statements (README.md:183-189)
    st.executeUpdate(
        "INSERT INTO HUDI_DELTA_TEST VALUES (5, 'htc', 50, "
        "TIMESTAMP('2023-01-12 05:30:00'), TIMESTAMP('2023-01-12 04:00:00'))"
    )
    st.executeUpdate(
        "UPDATE HUDI_DELTA_TEST SET value = 201, "
        "updated_at = TIMESTAMP('2023-01-12 05:30:01') WHERE pk_id = 2"
    )
    st.executeUpdate("DELETE FROM HUDI_DELTA_TEST WHERE pk_id = 3")
    st.close()
    conn.close()

    snap1 = read_jdbc_snapshot(spark, url, "HUDI_DELTA_TEST", **drv)
    changes = snapshot_diff_envelopes(
        snap0, snap1, ["pk_id"], "hudi_delta_test",
        read_timestamp="2023-01-12 05:31:00",
    )
    changes.coalesce(1).write.parquet(f"{drop}/b1")
    table = apply_cdc_stream(
        spark, f"{drop}/*/", f"{root}/table", checkpoint_dir=f"{root}/ckpt"
    )
    return table.read().select(
        "pk_id", "name", "value", "updated_at", "change_type", "is_deleted"
    )


@query(
    "cdc_jdbc_watermark_tail",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'apple',    10, 1673496060, 'INSERT',        FALSE),
      (2, 'samsung', 201, 1673501401, 'UPDATE-INSERT', FALSE),
      (3, 'dell',     30, 1673496060, 'INSERT',        FALSE),
      (4, 'motorola', 40, 1673496060, 'INSERT',        FALSE),
      (5, 'htc',      50, 1673501400, 'INSERT',        FALSE)
    ) AS t(pk_id, name, value, updated_at, change_type, is_deleted)
    """,
    tags=("cdc", "jdbc", "source", "incremental"),
)
def cdc_jdbc_watermark_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10's change half at O(changes) per sync: a timestamp +
    incrementing WATERMARK pull (the Kafka Connect JDBC idiom) stands
    in for Datastream's binlog tail — the reference's continuous-
    capture operating mode (README.md:97-174). After the backfill, the
    source mutates (insert pk5, update pk2, delete pk3); the next sync
    reads ONLY rows past the (updated_at, pk_id) keyset cursor — the
    predicate is pushed into the remote JDBC query
    (tests/test_jdbc_source.py pins ``PushedFilters``), so the source
    is never re-scanned, unlike ``cdc_jdbc_incremental_diff``'s
    full-outer snapshot diff. The MySQL-style created_at/updated_at
    pair classifies INSERT vs UPDATE-INSERT exactly.

    The documented caveat is IN the oracle: pk3's DELETE leaves no row
    for the tail to see, so dell survives — delete capture needs the
    periodic snapshot-diff reconciliation or source tombstones."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        increment_watermark,
        read_jdbc_snapshot,
        read_jdbc_watermark_increment,
        snapshot_to_envelopes,
        watermark_tail_envelopes,
    )
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        apply_cdc_stream,
    )

    root = tempfile.mkdtemp(prefix="jdbc_wm_")
    url = f"jdbc:derby:{root}/srcdb;create=true"
    jvm = spark._jvm
    # keep derby.log out of the caller's working directory
    jvm.java.lang.System.setProperty("derby.system.home", root)
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST (pk_id INT PRIMARY KEY, "
        "name VARCHAR(64), value INT, updated_at TIMESTAMP, "
        "created_at TIMESTAMP)"
    )
    for pk, name, value in [
        (1, "apple", 10), (2, "samsung", 20),
        (3, "dell", 30), (4, "motorola", 40),
    ]:
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, '{name}', {value}, "
            "TIMESTAMP('2023-01-12 04:01:00'), "
            "TIMESTAMP('2023-01-12 04:00:00'))"
        )
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    snap0 = read_jdbc_snapshot(spark, url, "HUDI_DELTA_TEST", **drv)
    env0 = snapshot_to_envelopes(
        snap0, "hudi_delta_test", "db", ["pk_id"],
        read_timestamp="2023-01-12 04:05:00",
    )
    drop = f"{root}/drop"
    env0.coalesce(1).write.parquet(f"{drop}/b0")
    apply_cdc_stream(
        spark, f"{drop}/*/", f"{root}/table", checkpoint_dir=f"{root}/ckpt"
    )
    # persist the keyset cursor BEFORE the source mutates
    wm, key = increment_watermark(snap0, "updated_at", "pk_id")

    # source-side churn: insert, update, and the tail-invisible delete
    st.executeUpdate(
        "INSERT INTO HUDI_DELTA_TEST VALUES (5, 'htc', 50, "
        "TIMESTAMP('2023-01-12 05:30:00'), TIMESTAMP('2023-01-12 05:30:00'))"
    )
    st.executeUpdate(
        "UPDATE HUDI_DELTA_TEST SET value = 201, "
        "updated_at = TIMESTAMP('2023-01-12 05:30:01') WHERE pk_id = 2"
    )
    st.executeUpdate("DELETE FROM HUDI_DELTA_TEST WHERE pk_id = 3")
    st.close()
    conn.close()

    inc = read_jdbc_watermark_increment(
        spark, url, "HUDI_DELTA_TEST", "updated_at", "pk_id",
        last_watermark=wm, last_key=key, **drv,
    )
    changes = watermark_tail_envelopes(
        inc, "hudi_delta_test", "db", ["pk_id"],
        created_column="created_at", updated_column="updated_at",
        read_timestamp="2023-01-12 05:31:00",
    )
    changes.coalesce(1).write.parquet(f"{drop}/b1")
    table = apply_cdc_stream(
        spark, f"{drop}/*/", f"{root}/table", checkpoint_dir=f"{root}/ckpt"
    )
    return table.read().select(
        "pk_id", "name", "value", "updated_at", "change_type", "is_deleted"
    )


@query(
    "cdc_jdbc_sync_loop",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'apple',    10, 1673496060, 'INSERT',        FALSE),
      (2, 'samsung', 201, 1673501401, 'UPDATE-INSERT', FALSE),
      (3, 'dell',     30, 1673496060, 'INSERT',        FALSE),
      (4, 'motorola', 40, 1673496060, 'INSERT',        FALSE),
      (5, 'htc',      50, 1673501400, 'INSERT',        FALSE)
    ) AS t(pk_id, name, value, updated_at, change_type, is_deleted)
    """,
    tags=("cdc", "jdbc", "source", "incremental"),
)
def cdc_jdbc_sync_loop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE continuous-capture loop as two ``sync_jdbc_source``
    cycles: cycle 1 backfills (snapshot -> envelopes -> table create,
    keyset cursor recorded IN the commit), source churns (insert pk5,
    update pk2, delete pk3), cycle 2 recovers the cursor from the
    timeline and applies only the O(changes) watermark increment. Same
    golden final state as ``cdc_jdbc_watermark_tail`` (incl. the
    documented delete-invisibility caveat on pk3), but exercised
    through the crash-atomic cursor-in-commit sync API instead of
    hand-carried state."""
    from hudi_and_delta_showcase_spark.jdbc_source import sync_jdbc_source

    root = tempfile.mkdtemp(prefix="jdbc_sync_")
    url = f"jdbc:derby:{root}/srcdb;create=true"
    jvm = spark._jvm
    # keep derby.log out of the caller's working directory
    jvm.java.lang.System.setProperty("derby.system.home", root)
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST (pk_id INT PRIMARY KEY, "
        "name VARCHAR(64), value INT, updated_at TIMESTAMP, "
        "created_at TIMESTAMP)"
    )
    for pk, name, value in [
        (1, "apple", 10), (2, "samsung", 20),
        (3, "dell", 30), (4, "motorola", 40),
    ]:
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, '{name}', {value}, "
            "TIMESTAMP('2023-01-12 04:01:00'), "
            "TIMESTAMP('2023-01-12 04:00:00'))"
        )
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    target = f"{root}/table"
    first = sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **drv)
    assert first["mode"] == "backfill" and first["rows"] == 4

    st.executeUpdate(
        "INSERT INTO HUDI_DELTA_TEST VALUES (5, 'htc', 50, "
        "TIMESTAMP('2023-01-12 05:30:00'), TIMESTAMP('2023-01-12 05:30:00'))"
    )
    st.executeUpdate(
        "UPDATE HUDI_DELTA_TEST SET value = 201, "
        "updated_at = TIMESTAMP('2023-01-12 05:30:01') WHERE pk_id = 2"
    )
    st.executeUpdate("DELETE FROM HUDI_DELTA_TEST WHERE pk_id = 3")
    st.close()
    conn.close()

    second = sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **drv)
    assert second["mode"] == "incremental" and second["rows"] == 2

    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    return LakehouseTable.load(spark, target).read().select(
        "pk_id", "name", "value", "updated_at", "change_type", "is_deleted"
    )


@query(
    "cdc_shallow_clone",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "clone"),
)
def cdc_shallow_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta SHALLOW CLONE (r6): clone the pre-cutoff table zero-copy
    (version 0 references the source's files — asserted: no parquet
    bytes under the clone), upsert the post-cutoff batch into the CLONE
    only, and read the clone back. The clone must equal latest-per-key
    over all events (the upsert applied) while the SOURCE still equals
    the pre-cutoff snapshot (divergence without interference) — the
    source assertion runs in-function; the clone state is the oracle
    row."""
    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="clone_")
    src_t = LakehouseTable.create(
        spark, f"{root}/src", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    clone = LakehouseTable.clone(spark, src_t.path, f"{root}/clone")
    import os as _os

    assert not any(
        f.endswith(".parquet")
        for _d, _s, fs in _os.walk(f"{root}/clone") for f in fs
    ), "shallow clone must copy zero data files"
    clone.upsert(incr)
    # divergence: the source is untouched by the clone's upsert
    assert src_t.read().count() == base.select("user_id").distinct().count()
    return clone.read().select(*_FINAL_COLS)


@query(
    "cdc_deep_clone",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "clone"),
)
def cdc_deep_clone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta DEEP CLONE: byte-copy the pre-cutoff table's live files as
    a distributed pyarrow-fs job (same relative names -> every
    file-skipping index entry carries over verbatim), DELETE the source
    outright, then upsert the post-cutoff batch into the surviving
    clone. A shallow clone would be unreadable the moment its source
    died; the deep clone must serve latest-per-key over all events from
    its own files alone."""
    import shutil

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="deepclone_")
    src_t = LakehouseTable.create(
        spark, f"{root}/src", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    clone = LakehouseTable.clone(
        spark, src_t.path, f"{root}/clone", deep=True
    )
    shutil.rmtree(src_t.path)  # self-containment is the contract
    clone.upsert(incr)
    return clone.read().select(*_FINAL_COLS)


@query(
    "cdc_mor_changes_feed",
    oracle="""
    WITH pre AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ), allv AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    ), upd AS (
      SELECT user_id FROM pre
      WHERE user_id IN (SELECT user_id FROM events
                        WHERE ts >= TIMESTAMP '{CUTOFF}')
    )
    SELECT 0 AS commit_version, 'insert' AS change_type, user_id, event_id, value
    FROM pre
    UNION ALL
    SELECT 1, 'update_preimage', p.user_id, p.event_id, p.value
    FROM pre p JOIN upd u ON p.user_id = u.user_id
    UNION ALL
    SELECT 1, 'update_postimage', a.user_id, a.event_id, a.value
    FROM allv a JOIN upd u ON a.user_id = u.user_id
    UNION ALL
    SELECT 1, 'insert', a.user_id, a.event_id, a.value
    FROM allv a
    WHERE a.user_id NOT IN (SELECT user_id FROM pre)
      AND a.user_id IN (SELECT user_id FROM events
                        WHERE ts >= TIMESTAMP '{CUTOFF}')
    """.replace("{CUTOFF}", CUTOFF),
    tags=("cdc", "table", "cdf", "mor"),
)
def cdc_mor_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """r6: change data feed on a MERGE-ON-READ table — the log-append
    upsert still emits exact pre/post/insert classification because
    pre-images resolve through the key-pruned RT view at write time
    (Hudi ``hoodie.table.cdc.enabled`` semantics). Feed rows are the
    full oracle surface: v0 insert images = latest-per-key pre-cutoff;
    v1 pre-images = prior values of updated keys, post-images = final
    values, inserts = new keys."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="mor_cdf_")
    t = LakehouseTable.create(
        spark, f"{path}/t", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        table_type="mor", cdc_enabled=True,
    )
    t.upsert(incr)
    return t.read_changes(0).select(
        F.col("_commit_version").cast("int").alias("commit_version"),
        F.col("_change_type").alias("change_type"),
        "user_id", "event_id", "value",
    )


@query(
    "cdc_jdbc_delete_reconcile",
    oracle="""
    SELECT * FROM (VALUES
      (1, 'apple',    10, 1673496060, 'INSERT',        FALSE),
      (2, 'samsung', 201, 1673501401, 'UPDATE-INSERT', FALSE),
      (3, 'dell',     30, 1673496060, 'DELETE',        TRUE),
      (4, 'motorola', 40, 1673496060, 'INSERT',        FALSE),
      (5, 'htc',      50, 1673501400, 'INSERT',        FALSE)
    ) AS t(pk_id, name, value, updated_at, change_type, is_deleted)
    """,
    tags=("cdc", "jdbc", "source", "incremental"),
)
def cdc_jdbc_delete_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sync loop WITH the key-only delete sweep: same two cycles as
    ``cdc_jdbc_sync_loop``, but the incremental cycle reconciles
    deletes — pk3's source-side DELETE (invisible to the watermark
    tail) is detected by anti-joining the pushed key-only source read
    against the target's live keys and soft-deleted with its last-seen
    image. Final state = the reference scenario's exact golden
    post-merge outputs, soft delete retained (README.md:511-531) —
    closing the caveat `cdc_jdbc_sync_loop`'s oracle documents."""
    from hudi_and_delta_showcase_spark.jdbc_source import sync_jdbc_source

    root = tempfile.mkdtemp(prefix="jdbc_recon_")
    url = f"jdbc:derby:{root}/srcdb;create=true"
    jvm = spark._jvm
    # keep derby.log out of the caller's working directory
    jvm.java.lang.System.setProperty("derby.system.home", root)
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST (pk_id INT PRIMARY KEY, "
        "name VARCHAR(64), value INT, updated_at TIMESTAMP, "
        "created_at TIMESTAMP)"
    )
    for pk, name, value in [
        (1, "apple", 10), (2, "samsung", 20),
        (3, "dell", 30), (4, "motorola", 40),
    ]:
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, '{name}', {value}, "
            "TIMESTAMP('2023-01-12 04:01:00'), "
            "TIMESTAMP('2023-01-12 04:00:00'))"
        )
    drv = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    target = f"{root}/table"
    sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **drv)

    st.executeUpdate(
        "INSERT INTO HUDI_DELTA_TEST VALUES (5, 'htc', 50, "
        "TIMESTAMP('2023-01-12 05:30:00'), TIMESTAMP('2023-01-12 05:30:00'))"
    )
    st.executeUpdate(
        "UPDATE HUDI_DELTA_TEST SET value = 201, "
        "updated_at = TIMESTAMP('2023-01-12 05:30:01') WHERE pk_id = 2"
    )
    st.executeUpdate("DELETE FROM HUDI_DELTA_TEST WHERE pk_id = 3")
    st.close()
    conn.close()

    r = sync_jdbc_source(
        spark, url, "HUDI_DELTA_TEST", target,
        reconcile_deletes=True, **drv,
    )
    assert r["rows"] == 2 and r["deletes"] == 1

    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    return LakehouseTable.load(spark, target).read().select(
        "pk_id", "name", "value", "updated_at", "change_type", "is_deleted"
    )


@query(
    "cdc_convert_in_place",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND user_id NOT IN (
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      )
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "convert"),
)
def cdc_convert_in_place(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta ``CONVERT TO DELTA`` / Hudi METADATA_ONLY bootstrap: a
    plain parquet directory (no meta columns, never touched by this
    engine) is adopted IN PLACE — version 0 references the original
    files byte-identically, meta columns derive at scan time — and the
    adopted table immediately serves keyed upserts. The oracle is the
    exact adoption semantics: pre-cutoff rows whose user never
    re-arrives survive AS-IS (convert never dedups, like Delta), and
    upserted users resolve to their latest post-cutoff event."""
    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="convert_")
    base.coalesce(2).write.parquet(f"{root}/t")  # a foreign parquet dir
    t = LakehouseTable.convert(
        spark, f"{root}/t",
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    t.upsert(incr)
    return t.read().select(*_FINAL_COLS)


@query(
    "sql_time_travel_select",
    oracle=f"""
    WITH v0 AS (
      SELECT event_id, user_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    post AS (
      SELECT event_id, user_id FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT event_id, user_id, 'v0' AS tag FROM v0
    UNION ALL
    SELECT event_id, user_id, 'ts0' AS tag FROM v0
    UNION ALL
    SELECT event_id, user_id, 'chg_post' AS tag FROM post
    UNION ALL
    SELECT v0.event_id, v0.user_id, 'chg_pre' AS tag FROM v0
    WHERE v0.user_id IN (SELECT user_id FROM post)
    """,
    tags=("cdc", "sql", "cdf"),
)
def sql_time_travel_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The literal Delta read-SQL forms a reference user types
    (``merge_sql.execute_query``): ``VERSION AS OF`` and ``TIMESTAMP
    AS OF`` time travel (the instant taken from the table's own
    history, as a user would) plus the ``table_changes('t', 1, 1)``
    CDF table-valued function — all three resolved against one
    CDC-enabled table and value-pinned: v0 by version and v0 by
    timestamp must agree row-for-row, and the change feed's pre/post
    split must match the relational definition of the upsert."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_query

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="sql_tt_")
    t = LakehouseTable.create(
        spark, f"{path}/events_tbl", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        cdc_enabled=True,
    )
    t.upsert(incr)
    tables = {"events_tbl": t}
    q = lambda s: execute_query(spark, s, tables)  # noqa: E731
    v0 = q("SELECT * FROM events_tbl VERSION AS OF 0")
    ts0 = q(
        "SELECT * FROM events_tbl TIMESTAMP AS OF "
        f"'{t.history()[0].commit_time}'"
    )
    chg = q("SELECT * FROM table_changes('events_tbl', 1, 1)")
    pick = lambda df, tag: df.select(  # noqa: E731
        "event_id", "user_id", F.lit(tag).alias("tag")
    )
    return (
        pick(v0, "v0")
        .unionAll(pick(ts0, "ts0"))
        .unionAll(
            pick(
                chg.filter(
                    F.col("_change_type").isin("insert", "update_postimage")
                ),
                "chg_post",
            )
        )
        .unionAll(
            pick(chg.filter(F.col("_change_type") == "update_preimage"),
                 "chg_pre")
        )
    )


@query(
    "cdc_convert_hoodie",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND user_id NOT IN (
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      )
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "convert"),
)
def cdc_convert_hoodie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT FROM HOODIE, completing the adoption matrix in BOTH
    directions for all three protocols: a pure ``.hoodie``-timeline
    table — first written with a decoy batch, then OVERWRITTEN with
    the pre-cutoff events, so stale file slices sit on disk awaiting
    Hudi's cleaner — is adopted IN PLACE from timeline replay (latest
    slice per file group); resurrecting the decoy's slices hash-fails
    the oracle. The adopted table immediately serves keyed upserts.
    Same oracle contract as the other converts."""
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        write_hoodie_table,
    )

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="convert_hoodie_") + "/t"
    decoy = base.limit(50).withColumn("user_id", F.col("user_id") + 900000)
    write_hoodie_table(decoy.coalesce(1), root)
    write_hoodie_table(base.coalesce(2), root, mode="overwrite")
    t = LakehouseTable.convert_hoodie(
        spark, root,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    t.upsert(incr)
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_convert_delta",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND user_id NOT IN (
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      )
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "convert"),
)
def cdc_convert_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT FROM DELTA (completing the adoption matrix: hive
    parquet, Iceberg, Delta): a pure ``_delta_log`` table — first
    written with a decoy batch, then OVERWRITTEN with the pre-cutoff
    events, so the log's live set differs from the directory's
    contents — is adopted IN PLACE from log replay; the decoy's
    orphaned files (on disk awaiting Delta VACUUM) must NOT resurrect,
    or the oracle hash-fails. The adopted table immediately serves
    keyed upserts. Same oracle contract as cdc_convert_in_place:
    convert never dedups; upserted users resolve to their latest
    post-cutoff event."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        write_delta_table,
    )

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="convert_delta_") + "/t"
    decoy = base.limit(50).withColumn("user_id", F.col("user_id") + 900000)
    write_delta_table(decoy.coalesce(1), root)
    write_delta_table(base.coalesce(2), root, mode="overwrite")
    t = LakehouseTable.convert_delta(
        spark, root,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    t.upsert(incr)
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_convert_hoodie_mor",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "convert", "mor"),
)
def cdc_convert_hoodie_mor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT FROM HOODIE on a MERGE-ON-READ timeline (r7, VERDICT r6
    #2): a foreign ``.hoodie`` table — base parquet file group + a
    ``deltacommit`` whose dot-hidden HoodieLogFormat log file holds one
    Avro data block of upserts — adopts IN PLACE: base files stay
    byte-identical, the surviving log blocks decode executor-side and
    materialize as engine log files, and the ``_rt`` merge folds them
    commit-order-first. Base = pre-cutoff events; the log block holds
    each post-cutoff user's LATEST event, so the adopted RT view must
    equal latest-event-per-user over ALL events — any stale base row
    (Hudi's ``_ro`` staleness) or dropped log record hash-fails. The
    log-record build collects O(post-cutoff users) rows to encode the
    Avro block — fixture construction, the same bounded-collect class
    as the JDBC envelope queries."""
    from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro
    from hudi_and_delta_showcase_spark.tables import hoodie_timeline as ht

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="convert_hoodie_mor_") + "/t"
    ht.write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = ht.latest_file_slices_rt(root).items()
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    latest_incr = (
        incr.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    records = [r.asDict() for r in latest_incr.collect()]
    ht.append_log_commit(
        root, fid, s["base_instant"], records,
        spark_schema_to_avro(base.schema),
    )
    t = LakehouseTable.convert_hoodie(
        spark, root,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_convert_hoodie_delete",
    oracle="""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1 AND (user_id % 7 <> 0 OR user_id % 14 = 0)
    """,
    tags=("cdc", "table", "convert", "mor", "delete"),
)
def cdc_convert_hoodie_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT FROM HOODIE with HoodieDeleteBlock tombstones (r8,
    VERDICT r7 #1): a foreign MoR table that hard-deleted rows since
    its last compaction — the NORMAL state of a CDC-fed table. Base =
    pre-cutoff events; delta commit 1 upserts each post-cutoff user's
    latest event; delta commit 2 is a DELETE block (Avro
    HoodieDeleteRecordList, content version 3) tombstoning every user
    with ``user_id % 7 = 0``; delta commit 3 REINSERTS the latest
    event of users with ``user_id % 14 = 0``. The adopted table must
    serve latest-per-user minus the deleted-and-not-revived users:
    killed base rows become engine DV entries at version 0, killed log
    records are never materialized, revived keys resolve through
    commit order. A resurrected deleted row, a lost revival, or a
    stale base row all hash-fail. Driver-side collects are
    O(users) fixture construction, the same bounded class as the MoR
    convert query."""
    from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro
    from hudi_and_delta_showcase_spark.tables import hoodie_timeline as ht

    base, incr = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="convert_hoodie_del_") + "/t"
    ht.write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = ht.latest_file_slices_rt(root).items()
    schema = spark_schema_to_avro(base.schema)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )
    # ONE window pass + ONE O(users) collect feeds all three log
    # commits (r14 opt — previously three window pipelines + three
    # collects): every user's overall-latest row, flagged with whether
    # the user has any post-cutoff row. The incr-only latest equals
    # the overall latest exactly when that flag is set (incr
    # timestamps are strictly above every base timestamp for the same
    # user, so the shared ts-desc ordering picks the incr row).
    cutoff_lit = F.lit(CUTOFF).cast("timestamp_ntz")
    latest_rows = (
        base.unionByName(incr)
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "__has_incr",
            F.max((F.col("ts") >= cutoff_lit).cast("int")).over(
                Window.partitionBy("user_id")
            ),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    )
    latest_incr = [
        {k: v for k, v in r.asDict().items() if k != "__has_incr"}
        for r in latest_rows
        if r["__has_incr"] == 1
    ]
    ht.append_log_commit(
        root, fid, s["base_instant"], latest_incr, schema,
    )
    doomed = sorted(
        {r.user_id for r in latest_rows if r.user_id % 7 == 0}
    )
    ht.append_log_commit(
        root, fid, s["base_instant"], [], schema,
        deletes=[{"recordKey": str(u)} for u in doomed],
    )
    revived = [
        {k: v for k, v in r.asDict().items() if k != "__has_incr"}
        for r in latest_rows
        if r.user_id % 14 == 0
    ]
    ht.append_log_commit(
        root, fid, s["base_instant"], revived, schema,
    )
    t = LakehouseTable.convert_hoodie(
        spark, root,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_hoodie_incremental_tail",
    oracle="SELECT event_id, user_id, ts, event_type, value FROM events",
    tags=("cdc", "hoodie", "incremental", "streaming"),
)
def cdc_hoodie_incremental_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous INCREMENTAL TAIL of a foreign ``.hoodie`` timeline
    (r8) — the Hudi-source sibling of ``cdc_jdbc_watermark_tail``: a
    foreign writer lands three commits; after each one, the consumer
    polls ``read_hoodie_incremental`` over exactly the new instant
    range ``(last_seen, latest]`` — O(changed files) IO per poll,
    never a snapshot re-read — and the union of the three pulls must
    equal the full table (no row lost, none double-delivered; either
    hash-fails the oracle). This is the loop that makes a foreign Hudi
    table a medallion bronze source without Spark's streaming file
    source ever seeing it."""
    from hudi_and_delta_showcase_spark.tables import hoodie_timeline as ht

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    c1 = F.lit(CUTOFF).cast("timestamp_ntz")
    c2 = F.lit("2024-01-25 00:00:00").cast("timestamp_ntz")
    parts = [
        events.filter(F.col("ts") < c1),
        events.filter((F.col("ts") >= c1) & (F.col("ts") < c2)),
        events.filter(F.col("ts") >= c2),
    ]
    root = tempfile.mkdtemp(prefix="hoodie_tail_") + "/t"
    begin = "0"
    acc: DataFrame | None = None
    for p in parts:
        ht.write_hoodie_table(p.coalesce(1), root)
        end = ht.list_instants(root)[-1]
        batch = ht.read_hoodie_incremental(
            spark, root, begin_instant=begin, end_instant=end
        )
        acc = batch if acc is None else acc.unionByName(batch)
        begin = end
    return acc.select(*_FINAL_COLS)


@query(
    "cdc_delta_changes_tail",
    oracle="SELECT event_id, user_id, ts, event_type, value FROM events",
    tags=("cdc", "delta", "incremental", "streaming"),
)
def cdc_delta_changes_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous CHANGE-FEED TAIL of a foreign ``_delta_log`` (r8) —
    the Delta-source sibling of ``cdc_hoodie_incremental_tail``: a
    foreign writer lands three append commits; after each one, the
    consumer polls ``read_delta_changes`` over exactly the new version
    range ``[last_seen + 1, latest]`` — O(changes) IO per poll, rows
    synthesized from the commits' dataChange adds under Delta's
    add-only CDF rule — and the union of the three pulls must equal
    the full table (no row lost, none double-delivered; either
    hash-fails the oracle). With the Hudi and JDBC tails, every
    source protocol now feeds a medallion bronze incrementally."""
    from hudi_and_delta_showcase_spark.tables import delta_log as dl

    events = load_table(spark, sf_dir, "events").select(*_FINAL_COLS)
    c1 = F.lit(CUTOFF).cast("timestamp_ntz")
    c2 = F.lit("2024-01-25 00:00:00").cast("timestamp_ntz")
    parts = [
        events.filter(F.col("ts") < c1),
        events.filter((F.col("ts") >= c1) & (F.col("ts") < c2)),
        events.filter(F.col("ts") >= c2),
    ]
    root = tempfile.mkdtemp(prefix="delta_tail_") + "/t"
    last = -1
    acc: DataFrame | None = None
    for p in parts:
        latest = dl.write_delta_table(p.coalesce(1), root)
        batch = dl.read_delta_changes(
            spark, root, begin_version=last + 1, end_version=latest
        )
        acc = batch if acc is None else acc.unionByName(batch)
        last = latest
    return acc.select(*_FINAL_COLS)


@query(
    "cdc_convert_delta_dv",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND event_id NOT IN (
        SELECT event_id FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
        ORDER BY event_id LIMIT 100
      )
    """,
    tags=("cdc", "table", "convert", "dv"),
)
def cdc_convert_delta_dv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT FROM DELTA with live DELETION VECTORS (r7, VERDICT r6
    #1): a foreign ``_delta_log`` whose latest commit re-adds its data
    file with a ``deletionVector`` descriptor — exactly what a modern
    delta-spark DELETE emits (protocol 3/7, readerFeatures
    [deletionVectors], RoaringBitmapArray sidecar in the public
    on-disk format) — is adopted IN PLACE: the foreign DV translates
    into the engine's own ``(file_name, pos)`` sidecar at version 0
    (executor-side decode, zero data rewrites), and every read path
    anti-joins it. The file holds pre-cutoff events sorted by
    event_id; the DV marks positions 0..99, so the oracle excludes
    exactly the 100 smallest pre-cutoff event_ids — resurrecting any
    deleted row hash-fails."""
    from hudi_and_delta_showcase_spark.tables import delta_dv
    from hudi_and_delta_showcase_spark.tables import delta_log as dl

    base, _ = _split(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="convert_delta_dv_") + "/t"
    dl.write_delta_table(
        base.coalesce(1).sortWithinPartitions("event_id"), root
    )
    _, _, adds = dl._replay(root, None)
    (f0,) = adds
    dv_add = dict(adds[f0])
    dv_add["path"] = f0
    dv_add["deletionVector"] = delta_dv.write_dv_file(
        root, list(range(100)), prefix="ab"
    )
    with open(os.path.join(root, "_delta_log",
                           "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors"],
            "writerFeatures": ["deletionVectors"]}}) + "\n")
        fh.write(json.dumps({"remove": {
            "path": f0, "deletionTimestamp": 1700000100000,
            "dataChange": True}}) + "\n")
        fh.write(json.dumps({"add": dv_add}) + "\n")
    t = LakehouseTable.convert_delta(
        spark, root,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_convert_iceberg",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM events
    WHERE ts < TIMESTAMP '{CUTOFF}'
      AND user_id NOT IN (
        SELECT user_id FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      )
    UNION ALL
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "convert", "iceberg"),
)
def cdc_convert_iceberg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERT FROM ICEBERG (the incoming XTable direction): a pure
    Iceberg table — data files plus a metadata/ tree, no lakehouse
    metadata — is adopted IN PLACE from its CURRENT snapshot's live
    file list (metadata.json -> manifest-list -> manifests; dead files
    from unexpired snapshots are ignored, never a directory walk), and
    the adopted table immediately serves keyed upserts. Same oracle
    contract as cdc_convert_in_place: convert never dedups; upserted
    users resolve to their latest post-cutoff event."""
    import shutil

    base, incr = _split(spark, sf_dir)
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
    )

    root = tempfile.mkdtemp(prefix="convert_ice_")
    # stage a REAL iceberg tree: write through the engine, export, then
    # strip the engine's own metadata so only iceberg remains
    seed = LakehouseTable.create(
        spark, f"{root}/t", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    export_iceberg_metadata(seed)
    os.remove(f"{root}/t/_meta.json")
    shutil.rmtree(f"{root}/t/_commits")

    t = LakehouseTable.convert_iceberg(
        spark, f"{root}/t",
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    t.upsert(incr)
    return t.read().select(*_FINAL_COLS)


@query(
    "sql_merge_by_source",
    oracle=f"""
    SELECT event_id, user_id, ts, event_type, value FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
    ) WHERE rn = 1
    """,
    tags=("cdc", "table", "sql", "merge"),
)
def sql_merge_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta's WHEN NOT MATCHED BY SOURCE clause — full-sync MERGE: the
    post-cutoff latest-per-key batch is the complete desired state, so
    matched keys update, new keys insert, and target keys ABSENT from
    the source delete in the same statement (one anti-probe of the
    key-pruned target scan, one delete commit shared with any matched
    deletes). Final state == exactly the source batch."""
    from hudi_and_delta_showcase_spark.operators.cdc import precombine_dedup
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    _base, incr = _split(spark, sf_dir)
    t = _clone_base_table(spark, sf_dir)
    precombine_dedup(
        incr, ["user_id"], "ts", ["event_id"]
    ).createOrReplaceTempView("events_full_sync_src")
    execute_merge(
        spark,
        """MERGE INTO events_tbl t USING events_full_sync_src s
           ON t.user_id = s.user_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        {"events_tbl": t},
    )
    return t.read().select(*_FINAL_COLS)


@query(
    "tpch_refresh_rf1_rf2",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_totalprice
    FROM orders
    WHERE o_orderkey % 7 <> 0
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    tags=("cdc", "table", "tpch"),
)
def tpch_refresh_rf1_rf2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H's refresh half (RF1/RF2) on the lakehouse: bulk-load 90%
    of orders, RF1-insert the held-out 10% as a keyed upsert, then
    RF2-delete every 7th orderkey — the insert/delete maintenance
    streams the benchmark specifies alongside Q1-Q22 — and aggregate
    the surviving table per priority. Both refresh batches are
    O(affected files) commits (partition + key-range pruned), never
    table rewrites; the oracle recomputes the final state from scratch.
    Exact money via the repo-wide cents convention."""
    from hudi_and_delta_showcase_spark.queries.relational import (
        _cents,
        _exact_money,
    )

    orders = load_table(spark, sf_dir, "orders")
    base = orders.filter(F.col("o_orderkey") % 10 != 0)
    rf1 = orders.filter(F.col("o_orderkey") % 10 == 0)
    path = tempfile.mkdtemp(prefix="tpch_rf_") + "/orders_tbl"
    t = LakehouseTable.create(
        spark, path, base, key_cols=["o_orderkey"], precombine="o_orderdate",
    )
    t.upsert(rf1)  # RF1: new sales
    t.delete(  # RF2: old sales fall off the horizon
        orders.filter(F.col("o_orderkey") % 7 == 0).select("o_orderkey")
    )
    return (
        t.read()
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            _exact_money(_cents("o_totalprice"), 2).alias("sum_totalprice"),
        )
        .orderBy("o_orderpriority")
    )


@query(
    "cdc_constraint_evolution",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    inc AS (
      SELECT event_id, user_id, ts, event_type, value FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1 AND user_id % 7 <> 0
    )
    SELECT COALESCE(i.event_id, b.event_id) AS event_id,
           COALESCE(i.user_id, b.user_id) AS user_id,
           COALESCE(i.ts, b.ts) AS ts,
           COALESCE(i.event_type, b.event_type) AS event_type,
           COALESCE(i.value, b.value) AS value
    FROM base b FULL OUTER JOIN inc i ON b.user_id = i.user_id
    """,
    tags=("cdc", "table", "constraints", "ddl"),
)
def cdc_constraint_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-create constraint DDL (Delta ALTER TABLE ... ADD
    CONSTRAINT): the table is created WITHOUT constraints; a CHECK too
    strict for the existing snapshot is REFUSED (Delta validates
    current data first); a satisfiable one lands and the next
    quarantine upsert routes violating rows aside while applying the
    rest. The incremental batch nulls ``value`` for every user_id
    divisible by 7 — those rows violate ``value IS NOT NULL`` (CHECK
    FALSE, not the NULL-passes case) and are quarantined; the oracle
    merges base state with only the surviving incremental users."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_ddl_")
    t = LakehouseTable.create(
        spark, f"{path}/events_tbl", base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
    )
    try:
        t.add_constraint("impossible", "value > 1e12")
        raise AssertionError("constraint over existing data not refused")
    except ValueError:
        pass
    t.add_constraint("value_present", "value IS NOT NULL")
    bad_incr = incr.withColumn(
        "value",
        F.when(F.col("user_id") % 7 == 0, F.lit(None)).otherwise(
            F.col("value")
        ),
    )
    t2 = LakehouseTable(spark, f"{path}/events_tbl")  # fresh handle sees it
    t2.upsert_quarantine(bad_incr)
    return t2.read().select(*_FINAL_COLS)


@query(
    "cdc_partition_evolution",
    oracle="""
    SELECT
      o_orderkey,
      o_orderpriority,
      o_orderstatus,
      CAST(
        CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1
             ELSE o_totalprice END AS DOUBLE
      ) AS total
    FROM orders
    WHERE o_orderkey % 3 <> 0 OR o_orderkey % 5 = 0
    """,
    tags=("cdc", "table", "ddl"),
)
def cdc_partition_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iceberg-style partition-spec evolution end-to-end: create the
    table partitioned by ``o_orderpriority``, EVOLVE the spec to
    ``o_orderstatus`` with a metadata-only DDL (zero files rewritten),
    then upsert a batch that both updates old-spec files (pruned
    against THEIR OWN column, see ``evolve_partitioning``) and writes
    new files under the new spec. The final read spans both layouts;
    the oracle is the plain merge semantics over ``orders``."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderstatus", "o_totalprice"
    )
    base = orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "sq", F.lit(1)
    )
    batch = (
        orders.filter(F.col("o_orderkey") % 5 == 0)
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1.0))
        .withColumn("sq", F.lit(2))
    )
    path = tempfile.mkdtemp(prefix="lakehouse_pevo_")
    t = LakehouseTable.create(
        spark,
        f"{path}/orders_tbl",
        base,
        key_cols=["o_orderkey"],
        precombine="sq",
        partition_by="o_orderpriority",
    )
    t.evolve_partitioning("o_orderstatus")
    t.upsert(batch)
    return t.read().select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.col("o_totalprice").alias("total"),
    )


@query(
    "cdc_bucket_index_routing",
    oracle=_LATEST_ALL_SQL,
    tags=("cdc", "table", "upsert", "index"),
)
def cdc_bucket_index_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hudi BUCKET-index upsert end-to-end: the table hash-routes every
    row to one of 16 fixed buckets by record key, and the incremental
    batch routes to its buckets ARITHMETICALLY — no footer/bloom probe
    job (see ``LakehouseTable.create(bucket_count=...)``). Final state
    must equal the same latest-per-key oracle as the unbucketed CoW
    roundtrip — bucketing changes the physical routing, never the
    merge semantics."""
    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_bucket_")
    t = LakehouseTable.create(
        spark,
        f"{path}/events_tbl",
        base,
        key_cols=["user_id"],
        precombine="ts",
        tiebreakers=["event_id"],
        bucket_count=16,
    )
    c = t.upsert(incr)
    assert "bucket_skipped_files" in c.stats
    return t.read().select(*_FINAL_COLS)


@query(
    "cdc_scd2_dimension",
    oracle=f"""
    WITH pre AS (
      SELECT user_id, event_type, value, ts FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    ),
    post AS (
      SELECT user_id, event_type, value, ts FROM (
        SELECT *, ROW_NUMBER() OVER (
          PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts >= TIMESTAMP '{CUTOFF}'
      ) WHERE rn = 1
    )
    SELECT u.user_id, u.event_type, u.value,
           u.ts AS effective_from,
           p.ts AS effective_to,
           p.user_id IS NULL AS is_current
    FROM pre u LEFT JOIN post p ON u.user_id = p.user_id
    UNION ALL
    SELECT p.user_id, p.event_type, p.value, p.ts,
           CAST(NULL AS TIMESTAMP), TRUE
    FROM post p
    """,
    tags=("cdc", "table", "scd"),
)
def cdc_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type 2 dimension maintenance end-to-end: the pre-cutoff
    change batch creates the dimension, the post-cutoff batch CLOSES
    each touched key's current version (effective_to stamped,
    is_current false) and appends the new current row — one upsert
    commit per batch (``operators/scd.py``). The oracle derives the
    same version chain from the raw events with window SQL."""
    from hudi_and_delta_showcase_spark.operators.scd import (
        scd2_apply,
        scd2_create,
    )

    base, incr = _split(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="lakehouse_scd2_")
    t = scd2_create(
        spark,
        f"{path}/dim_users",
        base,
        natural_key="user_id",
        ts_col="ts",
        tiebreakers=["event_id"],
    )
    scd2_apply(t, incr, natural_key="user_id", ts_col="ts",
               tiebreakers=["event_id"])
    return t.read().select(
        "user_id", "event_type", "value",
        "effective_from", "effective_to", "is_current",
    )


@query(
    "cdc_incremental_join_view",
    oracle="""
    SELECT e.event_id, e.user_id, e.value,
           c.c_name, c.c_mktsegment,
           CASE WHEN c.c_custkey % 10 = 0 THEN c.c_acctbal + 1000
                ELSE c.c_acctbal END AS acctbal
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
    tags=("cdc", "table", "join", "incremental"),
)
def cdc_incremental_join_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-JOIN-view maintenance (delta-join IVM,
    ``operators/incremental.py::join_view_apply``): the view holds
    events enriched with customer attributes; after its initial build,
    a fact batch (post-cutoff events) and a dim batch (an account-
    balance update to every 10th customer) are folded in from the two
    tables' CHANGE FEEDS — O(changes) work, never a view rebuild. The
    oracle recomputes the final join from scratch."""
    from hudi_and_delta_showcase_spark.operators.incremental import (
        join_view_apply,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    cutoff = F.lit(CUTOFF).cast("timestamp_ntz")
    fact_base = events.filter(F.col("ts") < cutoff)
    fact_incr = events.filter(F.col("ts") >= cutoff)
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    dim_incr = customer.filter(F.col("c_custkey") % 10 == 0).withColumn(
        "c_acctbal", F.col("c_acctbal") + F.lit(1000.0)
    )

    path = tempfile.mkdtemp(prefix="lakehouse_ivm_")
    fact = LakehouseTable.create(
        spark, f"{path}/fact_events", fact_base,
        key_cols=["event_id"], precombine="ts", cdc_enabled=True,
    )
    dim = LakehouseTable.create(
        spark, f"{path}/dim_customer", customer,
        key_cols=["c_custkey"], cdc_enabled=True,
    )
    attrs = ["c_name", "c_mktsegment", "c_acctbal"]
    # initial materialization: one full join, the view's version 0
    view = LakehouseTable.create(
        spark,
        f"{path}/view_enriched",
        fact.read().select("event_id", "user_id", "ts", "value").join(
            dim.read().select(
                F.col("c_custkey").alias("__dk"), *attrs
            ),
            F.col("user_id") == F.col("__dk"),
            "left",
        ).drop("__dk"),
        key_cols=["event_id"],
        precombine="ts",
    )
    fact_v, dim_v = fact._commit(None).version, dim._commit(None).version
    # the two source commits land...
    fact.upsert(fact_incr)
    dim.upsert(dim_incr)
    # ...and ONE incremental apply folds both change feeds in
    join_view_apply(
        view, fact, dim,
        fk="user_id", dim_key="c_custkey", dim_attrs=attrs,
        fact_since=fact_v + 1, dim_since=dim_v + 1,
    )
    return view.read().select(
        "event_id", "user_id", "value",
        "c_name", "c_mktsegment",
        F.col("c_acctbal").alias("acctbal"),
    )
