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
  join on the primary key.

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
        "payload", _payload_struct(snapshot, payload_cols)
    ).withColumn("__change_type", F.lit("INSERT")).withColumn(
        "__is_deleted", F.lit(False)
    )
    return _wrap_envelopes(
        rows, source_table, database, primary_keys,
        read_timestamp, "mysql-backfill-fulldump", stream_name,
    )


def _payload_struct(
    df: DataFrame, payload_cols: list[str] | None, prefix: str = ""
) -> F.Column:
    """Build the envelope ``payload`` struct from ``df``'s columns,
    resolving names case-insensitively (JDBC dialects fold unquoted
    identifiers to upper case)."""
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
    # pin the exact envelope schema (field order + types)
    return env.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name)
          for f in ENVELOPE_SCHEMA.fields]
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
    o_payload = _payload_struct(joined, payload_cols, prefix="o_")
    n_payload = _payload_struct(joined, payload_cols, prefix="n_")
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
