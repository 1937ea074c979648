"""JDBC snapshot source → Datastream envelope adapter (SURVEY.md S10).

The reference ingests a MySQL table through GCP Datastream
(/root/reference/README.md:40-49,83-93): Datastream performs an initial
BACKFILL full dump and then tails the binlog, dropping change-event
Avro files into a bucket. The binlog tail needs a log-reader service by
nature, but the BACKFILL half is exactly a relational snapshot — which
Spark can take natively via ``spark.read.jdbc``. This module closes
that loop:

* ``read_jdbc_snapshot`` — partitioned JDBC read (the 100 TB shape:
  ``partitionColumn/lowerBound/upperBound/numPartitions`` splits the
  source table into parallel range queries instead of one giant
  cursor).
* ``snapshot_to_envelopes`` — wrap snapshot rows in the SAME Datastream
  envelope schema the Avro files carry (``read_method =
  'mysql-backfill-fulldump'``, ``change_type = 'INSERT'``), so every
  downstream operator — flatten, timestamp-normalize, precombine dedup,
  streaming CDC apply — consumes a JDBC-sourced backfill identically to
  a Datastream file drop.
* ``jdbc_backfill_to_drop_dir`` — materialize the envelopes as a file
  batch in a CDC drop directory, feeding the existing
  ``streaming.cdc_stream.apply_cdc_stream`` unchanged.
* ``snapshot_diff_envelopes`` — the CHANGE half without a binlog
  reader: diff two keyed snapshots into INSERT / UPDATE-INSERT /
  DELETE envelopes (the standard trigger-free JDBC CDC technique —
  Kafka Connect JDBC's mode and Debezium's incremental-snapshot
  fallback do the same). Exact at any scale: one full-outer shuffle
  join on the primary key — but O(full snapshot) per sync.
* ``read_jdbc_watermark_increment`` / ``watermark_tail_envelopes`` —
  the O(changes) change half: a timestamp+incrementing keyset pull
  with the predicate pushed into the remote query (Kafka Connect's
  timestamp+incrementing mode), standing in for the reference's
  continuous binlog tail. Deletes are invisible to a watermark tail;
  reconcile with the snapshot diff periodically.
* ``sync_jdbc_source`` — one schedulable cycle of the whole loop:
  backfill-or-increment, applied as a keyed upsert with the keyset
  cursor recorded atomically IN the data commit (crash = replay the
  same increment, absorbed by the precombine upsert; exactly-once
  without a streaming checkpoint).

Integration-tested against an in-process Apache Derby database (the
embedded JDBC driver ships with Spark); any JDBC URL + driver works the
same way.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.operators.cdc import ENVELOPE_SCHEMA


def read_jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    properties: dict | None = None,
    prefer_timestamp_ntz: bool = True,
) -> DataFrame:
    """Relational snapshot via ``spark.read.jdbc``. With
    ``partition_column`` bounds, the read issues ``num_partitions``
    parallel range queries — the only sane shape for a large source
    table; without them it is a single-cursor read (small tables
    only).

    ``prefer_timestamp_ntz`` (default on) reads SQL TIMESTAMP columns
    as TIMESTAMP_NTZ — wall-clock preserved regardless of the session
    timezone. Without it, JDBC timestamps land as LTZ and their wall
    time SHIFTS under a non-UTC session: exactly the environment-
    sensitivity class this engine's timestamps are designed out of."""
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("preferTimestampNTZ", str(prefer_timestamp_ntz).lower())
    )
    for k, v in props.items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def snapshot_to_envelopes(
    snapshot: DataFrame,
    source_table: str,
    database: str,
    primary_keys: list[str],
    payload_cols: list[str] | None = None,
    read_timestamp=None,
    stream_name: str = "jdbc-backfill",
    payload_mode: str = "golden",
) -> DataFrame:
    """Wrap snapshot rows as Datastream BACKFILL envelopes
    (``ENVELOPE_SCHEMA``): ``change_type='INSERT'``,
    ``read_method='mysql-backfill-fulldump'`` — byte-compatible with
    what the reference's initial Datastream load drops as Avro
    (README.md:164-174,365), so the existing flatten/normalize/upsert
    pipeline applies unmodified.

    ``payload_cols`` defaults to the envelope payload field names; the
    snapshot must carry them (rename upstream if the source schema
    differs). Timestamp payload fields are cast to TIMESTAMP_NTZ at the
    session zone — the same convention the parquet fixtures use."""
    rows = snapshot.withColumn(
        "payload", _payload_struct(snapshot, payload_cols,
                                   payload_mode=payload_mode)
    ).withColumn("__change_type", F.lit("INSERT")).withColumn(
        "__is_deleted", F.lit(False)
    )
    return _wrap_envelopes(
        rows, source_table, database, primary_keys,
        read_timestamp, "mysql-backfill-fulldump", stream_name,
    )


def _payload_struct(
    df: DataFrame, payload_cols: list[str] | None, prefix: str = "",
    payload_mode: str = "golden",
) -> F.Column:
    """Build the envelope ``payload`` struct from ``df``'s columns,
    resolving names case-insensitively (JDBC dialects fold unquoted
    identifiers to upper case).

    ``payload_mode="golden"`` (default) casts to the reference's golden
    payload schema — byte-compatible with the Datastream fixtures.
    ``"auto"`` derives the payload from the SNAPSHOT'S OWN schema
    (lowercased field names; SQL TIMESTAMPs as NTZ), so ANY relational
    table rides the same envelope pipeline."""
    if payload_mode == "auto":
        cols = payload_cols or [
            c[len(prefix):] if prefix and c.startswith(prefix) else c
            for c in df.columns
            if not prefix or c.startswith(prefix)
        ]
        by_lower = {c.lower(): c for c in df.columns}
        parts = []
        for c in cols:
            srcc = by_lower.get((prefix + c).lower())
            if srcc is None:
                raise ValueError(f"snapshot lacks payload column: {c!r}")
            col = F.col(srcc)
            if df.schema[srcc].dataType.typeName().startswith("timestamp"):
                col = col.cast("timestamp_ntz")
            parts.append(col.alias(c.lower()))
        return F.struct(*parts)
    payload_fields = [
        f.name for f in ENVELOPE_SCHEMA["payload"].dataType.fields
    ]
    want = payload_cols or payload_fields
    by_lower = {c.lower(): c for c in df.columns}
    cols, missing = [], []
    for c in want:
        if prefix + c in df.columns:
            cols.append(prefix + c)
        elif (prefix + c).lower() in by_lower:
            cols.append(by_lower[(prefix + c).lower()])
        else:
            missing.append(c)
    if missing:
        raise ValueError(f"snapshot lacks payload columns: {missing}")
    return F.struct(
        *[
            F.col(c).cast(ENVELOPE_SCHEMA["payload"].dataType[f].dataType)
            .alias(f)
            for c, f in zip(cols, payload_fields)
        ]
    )


def _wrap_envelopes(
    rows: DataFrame,
    source_table: str,
    database: str,
    primary_keys: list[str],
    read_timestamp,
    read_method: str,
    stream_name: str,
) -> DataFrame:
    """Wrap rows carrying ``payload`` (struct) + ``__change_type`` +
    ``__is_deleted`` into the exact Datastream envelope schema."""
    read_ts = (
        F.lit(read_timestamp).cast("timestamp_ntz")
        if read_timestamp is not None
        else F.current_timestamp().cast("timestamp_ntz")
    )
    meta = F.struct(
        F.lit(source_table).alias("table"),
        F.lit(database).alias("database"),
        F.array(*[F.lit(k) for k in primary_keys]).alias("primary_keys"),
        F.lit("jdbc-snapshot").alias("log_file"),
        F.monotonically_increasing_id().alias("log_position"),
        F.col("__change_type").alias("change_type"),
        F.col("__is_deleted").alias("is_deleted"),
    )
    run_id = uuid.uuid4().hex[:12]
    env = rows.select(
        F.concat(F.lit(f"jdbc-{run_id}-"), F.monotonically_increasing_id())
        .alias("uuid"),
        read_ts.alias("read_timestamp"),
        read_ts.alias("source_timestamp"),
        F.lit(source_table).alias("object"),
        F.lit(read_method).alias("read_method"),
        F.lit(stream_name).alias("stream_name"),
        F.lit(f"{database}.{source_table}").alias("schema_key"),
        F.array(
            F.struct(
                F.lit("ordering").alias("member0"),
                F.monotonically_increasing_id().alias("member1"),
            )
        ).alias("sort_keys"),
        meta.alias("source_metadata"),
        F.col("payload"),
    )
    # pin the exact envelope schema (field order + types) around
    # whatever payload type the rows carry — golden payloads pin to the
    # byte-compatible golden contract, auto payloads to their own type
    from hudi_and_delta_showcase_spark.operators.cdc import envelope_schema

    schema = envelope_schema(env.schema["payload"].dataType)
    return env.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name)
          for f in schema.fields]
    )


def snapshot_diff_envelopes(
    old: DataFrame,
    new: DataFrame,
    primary_keys: list[str],
    source_table: str,
    database: str = "db",
    payload_cols: list[str] | None = None,
    read_timestamp=None,
    stream_name: str = "jdbc-incremental",
    payload_mode: str = "golden",
) -> DataFrame:
    """The CDC half of S10 WITHOUT a binlog reader: diff two keyed
    snapshots into Datastream change envelopes — rows only in ``new``
    become INSERT, rows whose payload changed become UPDATE-INSERT,
    rows only in ``old`` become DELETE with ``is_deleted=true``
    carrying the last-seen image (exactly what Datastream emits,
    README.md:183-189,529). Unchanged rows emit nothing.

    This is the standard trigger-free JDBC CDC technique (Kafka Connect
    JDBC incremental mode / Debezium incremental snapshots). The diff
    is ONE full-outer shuffle join on the primary key — exact and
    linear at any scale; what it cannot see (vs a binlog) is
    intra-interval churn: multiple updates between snapshots collapse
    into one, and insert+delete within an interval vanishes."""
    keys_l = [k.lower() for k in primary_keys]

    def norm(df, tag):
        by_lower = {c.lower(): c for c in df.columns}
        out = df
        for c in df.columns:
            out = out.withColumnRenamed(c, f"{tag}{c.lower()}")
        missing = [k for k in keys_l if k not in by_lower]
        if missing:
            raise ValueError(f"snapshot lacks key columns: {missing}")
        return out

    o = norm(old, "o_")
    n = norm(new, "n_")
    cond = [
        o[f"o_{k}"].eqNullSafe(n[f"n_{k}"]) for k in keys_l
    ]
    joined = o.join(n, cond, "full_outer")
    o_payload = _payload_struct(
        joined, payload_cols, prefix="o_", payload_mode=payload_mode
    )
    n_payload = _payload_struct(
        joined, payload_cols, prefix="n_", payload_mode=payload_mode
    )
    present_o = F.col(f"o_{keys_l[0]}").isNotNull()
    present_n = F.col(f"n_{keys_l[0]}").isNotNull()
    change = (
        F.when(~present_o, F.lit("INSERT"))
        .when(~present_n, F.lit("DELETE"))
        .when(~o_payload.eqNullSafe(n_payload), F.lit("UPDATE-INSERT"))
        .otherwise(F.lit(None))
    )
    rows = (
        joined.withColumn("__change_type", change)
        .filter(F.col("__change_type").isNotNull())
        .withColumn("__is_deleted", F.col("__change_type") == "DELETE")
        .withColumn(
            "payload",
            F.when(present_n, n_payload).otherwise(o_payload),
        )
    )
    return _wrap_envelopes(
        rows, source_table, database, primary_keys,
        read_timestamp, "mysql-cdc-binlog", stream_name,
    )


def _resolve_col(df: DataFrame, name: str) -> str:
    """Case-insensitive column resolution (JDBC dialects fold unquoted
    identifiers — Derby/Oracle to upper case)."""
    by_lower = {c.lower(): c for c in df.columns}
    if name in df.columns:
        return name
    if name.lower() in by_lower:
        return by_lower[name.lower()]
    raise ValueError(f"no such column: {name!r} in {df.columns}")


def read_jdbc_watermark_increment(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_column: str,
    key_column: str,
    last_watermark=None,
    last_key=None,
    **jdbc_kwargs,
) -> DataFrame:
    """The reference's CONTINUOUS-capture mode without a binlog reader
    (Datastream tails the MySQL binlog, /root/reference/README.md:
    97-174): a timestamp+incrementing watermark pull — the Kafka
    Connect JDBC source idiom. Each sync reads ONLY rows past the
    (watermark, key) keyset cursor::

        wm > last_watermark OR (wm = last_watermark AND pk > last_key)

    The predicate is expressed as DataFrame filters, which Spark's
    JDBC source pushes into the remote query verbatim (verify with
    ``.explain``: ``PushedFilters: [*Or(GreaterThan(...`` — the ``*``
    marks source-evaluated), so per-sync cost is O(changes) at the
    source, not O(snapshot) like ``snapshot_diff_envelopes``'s
    full-outer diff. The key tiebreak makes the cursor a strict total
    order: rows sharing the boundary timestamp are neither lost nor
    re-read across syncs.

    What a watermark tail CANNOT see (vs a real log): DELETEs (no row
    left to carry the new timestamp — run a periodic
    ``snapshot_diff_envelopes`` reconciliation or source tombstones),
    and multiple updates within one sync interval collapse to the
    final image. ``last_watermark=None`` bootstraps with the full
    table (the backfill).

    ``watermark_column`` must be monotone for changed rows (MySQL
    ``updated_at TIMESTAMP ... ON UPDATE NOW()``, README.md:74-75) and
    indexed at the source for the pushed predicate to be cheap."""
    snap = read_jdbc_snapshot(spark, url, table, **jdbc_kwargs)
    if last_watermark is None:
        return snap
    import datetime as _dt

    if isinstance(last_watermark, _dt.datetime):
        # NEVER F.lit(datetime): PySpark builds an LTZ literal through
        # the JVM default zone, and the cast back to NTZ then applies
        # the SESSION zone — under a non-UTC session the watermark
        # silently shifts and the pull re-reads (or skips) rows. A
        # wall-time string cast to the column type is zone-independent.
        last_watermark = last_watermark.strftime("%Y-%m-%d %H:%M:%S.%f")
    wm_col = F.col(_resolve_col(snap, watermark_column))
    wm_lit = F.lit(last_watermark).cast(
        snap.schema[_resolve_col(snap, watermark_column)].dataType
    )
    pred = wm_col > wm_lit
    if last_key is not None:
        pred = pred | (
            (wm_col == wm_lit)
            & (F.col(_resolve_col(snap, key_column)) > F.lit(last_key))
        )
    return snap.filter(pred)


def increment_watermark(
    increment: DataFrame, watermark_column: str, key_column: str
) -> tuple:
    """(max watermark, max key at that watermark) of a pulled
    increment — the keyset cursor to persist for the next sync. One
    tiny aggregate job (the increment is O(changes)). Returns
    (None, None) for an empty increment: keep the previous cursor."""
    wm = _resolve_col(increment, watermark_column)
    key = _resolve_col(increment, key_column)
    # ONE aggregate job: max(struct(wm, key)) orders lexicographically
    # by watermark then key, so its struct IS the keyset cursor — no
    # second filtered-max pass over the source-side scan per sync.
    row = (
        increment.filter(F.col(wm).isNotNull())
        .agg(F.max(F.struct(F.col(wm).alias("wm"), F.col(key).alias("k"))).alias("c"))
        .collect()[0]
    )
    if row["c"] is None:
        return (None, None)
    return (row["c"]["wm"], row["c"]["k"])


def watermark_tail_envelopes(
    increment: DataFrame,
    source_table: str,
    database: str,
    primary_keys: list[str],
    created_column: str | None = None,
    updated_column: str | None = None,
    payload_cols: list[str] | None = None,
    read_timestamp=None,
    stream_name: str = "jdbc-watermark-tail",
    payload_mode: str = "golden",
) -> DataFrame:
    """Wrap a watermark increment in Datastream CHANGE envelopes
    (``read_method='mysql-cdc-binlog'``) feeding the same streaming
    apply as real binlog drops. Change type: with ``created_column``
    AND ``updated_column`` given, a row whose creation timestamp equals
    its update timestamp has never been updated -> ``INSERT``; else
    ``UPDATE-INSERT`` (MySQL's paired ``DEFAULT NOW()`` / ``ON UPDATE
    NOW()`` columns, README.md:74-75, make this exact). Without them
    every row is ``UPDATE-INSERT`` — identical downstream behavior,
    the keyed upsert treats both as upserts. DELETEs never appear in a
    watermark tail (see ``read_jdbc_watermark_increment``)."""
    if created_column is not None and updated_column is not None:
        created = F.col(_resolve_col(increment, created_column))
        updated = F.col(_resolve_col(increment, updated_column))
        change = F.when(
            created == updated, F.lit("INSERT")
        ).otherwise(F.lit("UPDATE-INSERT"))
    else:
        change = F.lit("UPDATE-INSERT")
    rows = (
        increment.withColumn(
            "payload",
            _payload_struct(increment, payload_cols,
                            payload_mode=payload_mode),
        )
        .withColumn("__change_type", change)
        .withColumn("__is_deleted", F.lit(False))
    )
    return _wrap_envelopes(
        rows, source_table, database, primary_keys,
        read_timestamp, "mysql-cdc-binlog", stream_name,
    )


def jdbc_backfill_to_drop_dir(
    spark: SparkSession,
    url: str,
    table: str,
    drop_dir: str,
    database: str = "db",
    primary_keys: list[str] | None = None,
    **jdbc_kwargs,
) -> int:
    """Snapshot the JDBC table and land it as ONE envelope file batch in
    ``drop_dir`` — from there, ``apply_cdc_stream`` (file-source stream +
    foreachBatch keyed upsert) ingests it exactly like a Datastream
    drop. Returns the row count landed.

    The count is taken from a localCheckpoint shared with the write —
    counting the lazy plan after the write would re-run the JDBC
    snapshot (source read twice) and, under concurrent source
    mutation, report a count that differs from what actually landed."""
    snap = read_jdbc_snapshot(spark, url, table, **jdbc_kwargs)
    env = snapshot_to_envelopes(
        snap,
        source_table=table.lower(),
        database=database,
        primary_keys=primary_keys or ["pk_id"],
    ).localCheckpoint(eager=True)
    env.write.mode("append").parquet(drop_dir)
    return env.count()


def sync_jdbc_source(
    spark: SparkSession,
    url: str,
    table: str,
    table_path: str,
    watermark_column: str = "updated_at",
    key_column: str = "pk_id",
    created_column: str | None = "created_at",
    database: str = "db",
    primary_keys: list[str] | None = None,
    table_type: str = "cow",
    reconcile_deletes: bool = False,
    **jdbc_kwargs,
) -> dict:
    """ONE cycle of the continuous-capture loop (the reference's
    Datastream mode as a schedulable batch job): backfill on the first
    call, O(changes) watermark pull on every later call, applied as a
    keyed upsert into the lakehouse table at ``table_path``.

    EXACTLY-ONCE across crashes without a streaming checkpoint: the
    keyset cursor rides IN the data commit itself
    (``stats['jdbc_sync_cursor']``), so a cycle either lands rows AND
    cursor atomically or neither; a crashed cycle's retry re-pulls the
    same increment and the precombine-keyed upsert absorbs the replay.
    The cursor is recovered by scanning the timeline newest-first for
    the last sync commit — O(commits since last sync), which in a sync
    loop is a handful of maintenance commits at most.

    Returns ``{"mode", "rows", "cursor"}`` (+ ``"deletes"`` when
    reconciling). Deletes are invisible to a watermark tail (see
    ``read_jdbc_watermark_increment``); ``reconcile_deletes=True`` adds
    a KEY-ONLY reconciliation to the cycle: the source's key column is
    read with the projection pushed into the remote query (O(source
    keys), not O(row data)), anti-joined against the target's live
    keys, and the vanished keys are soft-deleted with their last-seen
    image — Datastream's DELETE envelope semantics (README.md:529).
    Run it on a slower cadence than the watermark pull, like any
    snapshot-based delete sweep.
    """
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        normalize_cdc_batch,
    )
    from hudi_and_delta_showcase_spark.tables import LakehouseTable, fsio
    from hudi_and_delta_showcase_spark.tables import manifest as mf

    pks = primary_keys or [key_column]
    exists = fsio.exists(fsio.join(table_path, "_meta.json"))
    cursor = None
    if exists:
        t = LakehouseTable.load(spark, table_path)
        for commit in reversed(t.history()):
            if "jdbc_sync_cursor" in commit.stats:
                cursor = commit.stats["jdbc_sync_cursor"]
                break

    if not exists:
        # backfill cycle: full snapshot, BACKFILL envelopes, create.
        # payload_mode="auto": the envelope payload is derived from the
        # SOURCE TABLE'S OWN schema, so any relational table syncs —
        # not just the reference's golden 5-column shape.
        snap = read_jdbc_snapshot(
            spark, url, table, **jdbc_kwargs
        ).localCheckpoint(eager=True)
        env = snapshot_to_envelopes(
            snap, table.lower(), database, pks, payload_mode="auto"
        )
        rows = normalize_cdc_batch(env).localCheckpoint(eager=True)
        wm, key = increment_watermark(snap, watermark_column, key_column)
        LakehouseTable.create(
            spark, table_path, rows,
            key_cols=[k.lower() for k in pks],
            precombine=watermark_column.lower(),
            tiebreakers=["change_type"],
            table_type=table_type,
            extra_stats={"jdbc_sync_cursor": _cursor_json(wm, key)},
        )
        return {
            "mode": "backfill",
            "rows": rows.count(),
            "cursor": _cursor_json(wm, key),
        }

    last_wm, last_key = (cursor or (None, None))
    inc = read_jdbc_watermark_increment(
        spark, url, table, watermark_column, key_column,
        last_watermark=last_wm, last_key=last_key, **jdbc_kwargs,
    ).localCheckpoint(eager=True)  # freeze: cursor + rows see ONE pull
    n = inc.count()
    if n == 0:
        out = {"mode": "incremental", "rows": 0, "cursor": cursor}
        if reconcile_deletes:
            out["deletes"] = _reconcile_deleted_keys(
                spark, url, table, table_path, key_column, pks, database,
                **jdbc_kwargs,
            )
        return out
    wm, key = increment_watermark(inc, watermark_column, key_column)
    by_lower = {c.lower(): c for c in inc.columns}
    env = watermark_tail_envelopes(
        inc, table.lower(), database, pks,
        created_column=(
            created_column if created_column
            and created_column.lower() in by_lower else None
        ),
        updated_column=watermark_column,
        payload_mode="auto",
    )
    rows = normalize_cdc_batch(env)
    t = LakehouseTable.load(spark, table_path)
    t.upsert(rows, extra_stats={"jdbc_sync_cursor": _cursor_json(wm, key)})
    out = {
        "mode": "incremental",
        "rows": n,
        "cursor": _cursor_json(wm, key),
    }
    if reconcile_deletes:
        out["deletes"] = _reconcile_deleted_keys(
            spark, url, table, table_path, key_column, pks, database,
            **jdbc_kwargs,
        )
    return out


def _reconcile_deleted_keys(
    spark: SparkSession,
    url: str,
    table: str,
    table_path: str,
    key_column: str,
    pks: list[str],
    database: str,
    **jdbc_kwargs,
) -> int:
    """Soft-delete target rows whose key vanished at the source. The
    source read selects ONLY the key column (Spark's JDBC source pushes
    the projection into the remote query), so the sweep costs O(source
    keys); the last-seen image comes from the TARGET (a deleted source
    row has no image to give). Returns the number of keys deleted."""
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        normalize_cdc_batch,
    )
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    t = LakehouseTable.load(spark, table_path)
    keys_l = [k.lower() for k in pks]
    live = t.read().filter(~F.col("is_deleted"))
    snap_keys = read_jdbc_snapshot(spark, url, table, **jdbc_kwargs)
    snap_keys = snap_keys.select(
        *[
            # cast to the TARGET's key type (JDBC dialects may widen)
            F.col(_resolve_col(snap_keys, k))
            .cast(live.schema[k].dataType)
            .alias(k)
            for k in keys_l
        ]
    )
    gone = live.join(snap_keys, keys_l, "left_anti").localCheckpoint(
        eager=True
    )
    n = gone.count()
    if n == 0:
        return 0
    payload_cols = [
        c for c in gone.columns if c not in ("change_type", "is_deleted")
        and not c.startswith("_hoodie_")
    ]
    rows = (
        gone.withColumn(
            "payload",
            _payload_struct(gone, payload_cols, payload_mode="auto"),
        )
        .withColumn("__change_type", F.lit("DELETE"))
        .withColumn("__is_deleted", F.lit(True))
    )
    env = _wrap_envelopes(
        rows, table.lower(), database, pks, None,
        "mysql-cdc-binlog", "jdbc-delete-reconcile",
    )
    t.upsert(normalize_cdc_batch(env))
    return n


def _cursor_json(wm, key) -> list:
    """JSON-stable keyset cursor: the watermark as a wall-time string
    (timezone-independent — see read_jdbc_watermark_increment's note on
    datetime literals), the key as-is."""
    import datetime as _dt

    if isinstance(wm, _dt.datetime):
        wm = wm.strftime("%Y-%m-%d %H:%M:%S.%f")
    return [wm, key]
