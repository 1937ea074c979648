"""CDC envelope model + normalization operators (SURVEY.md §1.2, §2.2, §2.9).

Reproduces the reference's Datastream envelope handling:
* envelope schema        — Hive DDL at /root/reference/README.md:299-320
* flatten (P1)           — ``df.select("payload.*", "*")`` at README.md:267
* timestamp normalize    — ``unix_timestamp(col(...))`` x4 at README.md:270-273
* latest-change-per-key  — GROUP BY + max + self-join at README.md:1215-1221
* precombine dedup (A3)  — PRECOMBINE_FIELD semantics at README.md:282,453

plus the golden 4-row/3-change fixture (README.md:83-87,183-187; corrected
per SURVEY §2.9: the CDC insert is pk 5 'htc', not pk 4).
"""

from __future__ import annotations

import datetime

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
)

#: Datastream change-event envelope (FIXTURES.md A2; README.md:299-320).
SOURCE_METADATA_SCHEMA = StructType(
    [
        StructField("table", StringType()),
        StructField("database", StringType()),
        StructField("primary_keys", ArrayType(StringType())),
        StructField("log_file", StringType()),
        StructField("log_position", LongType()),
        StructField("change_type", StringType()),  # INSERT|UPDATE-INSERT|DELETE
        StructField("is_deleted", BooleanType()),
    ]
)

PAYLOAD_SCHEMA = StructType(
    [
        StructField("pk_id", IntegerType()),
        StructField("name", StringType()),
        StructField("value", IntegerType()),
        StructField("updated_at", TimestampNTZType()),
        StructField("created_at", TimestampNTZType()),
    ]
)

def envelope_schema(payload_type: StructType) -> StructType:
    """The Datastream envelope around an ARBITRARY payload row type —
    the envelope's own fields are source-schema-independent
    (README.md:299-320), so any relational table can ride the same
    pipeline; ``ENVELOPE_SCHEMA`` is this factory applied to the
    reference's golden payload."""
    return StructType(
        [
            StructField("uuid", StringType()),
            StructField("read_timestamp", TimestampNTZType()),
            StructField("source_timestamp", TimestampNTZType()),
            StructField("object", StringType()),
            StructField("read_method", StringType()),
            StructField("stream_name", StringType()),
            StructField("schema_key", StringType()),
            StructField(
                "sort_keys",
                ArrayType(
                    StructType(
                        [
                            StructField("member0", StringType()),
                            StructField("member1", LongType()),
                        ]
                    )
                ),
            ),
            StructField("source_metadata", SOURCE_METADATA_SCHEMA),
            StructField("payload", payload_type),
        ]
    )


ENVELOPE_SCHEMA = StructType(
    [
        StructField("uuid", StringType()),
        StructField("read_timestamp", TimestampNTZType()),
        StructField("source_timestamp", TimestampNTZType()),
        StructField("object", StringType()),
        StructField("read_method", StringType()),
        StructField("stream_name", StringType()),
        StructField("schema_key", StringType()),
        StructField(
            "sort_keys",
            ArrayType(
                StructType(
                    [
                        StructField("member0", StringType()),
                        StructField("member1", LongType()),
                    ]
                )
            ),
        ),
        StructField("source_metadata", SOURCE_METADATA_SCHEMA),
        StructField("payload", PAYLOAD_SCHEMA),
    ]
)


def envelope_from_json(spark: SparkSession, lines: list[str]) -> DataFrame:
    """S1 contract surface, env-independent: parse JSON-serialized
    Datastream change events into the exact envelope schema the Avro
    files carry (README.md:264,299-320). Complements io.read_avro (jar
    or pure-Python OCF): proves the envelope schema mapping itself —
    same StructType, same downstream operators — from plain JSON."""
    # bounded slices: a handful of JSON lines does not need one task
    # per core (each task costs a Python worker round-trip)
    return spark.read.schema(ENVELOPE_SCHEMA).json(
        spark.sparkContext.parallelize(lines, min(4, max(1, len(lines))))
    )


def flatten_envelope(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """P1: promote payload fields to top level, keeping envelope columns
    (``select("payload.*", "*")``, README.md:267). Catalyst's nested-schema
    pruning means unaccessed envelope fields never leave the parquet
    reader."""
    return df.select(f"{payload_col}.*", "*")


def normalize_timestamps(df: DataFrame, cols: list[str]) -> DataFrame:
    """F1/P4: TimestampType -> epoch-seconds BIGINT, the reference's
    ``withColumn(c, unix_timestamp(col(c), "MM-dd-yyyy HH:mm:ss"))``
    (README.md:270-273 — the format string is inert on timestamp inputs,
    SURVEY §2.7 F1). Pure NTZ arithmetic: timezone-independent."""
    out = df
    for c in cols:
        out = out.withColumn(
            c,
            F.expr(f"timestampdiff(SECOND, TIMESTAMP_NTZ'1970-01-01 00:00:00', {c})"),
        )
    return out


def latest_change_per_key(
    df: DataFrame, key_cols: list[str], precombine: str
) -> DataFrame:
    """C5 in the reference's own shape: per-key max-precombine aggregate
    inner-joined back (README.md:1215-1221). The aggregate side is tiny
    (|keys| rows) so it broadcasts."""
    agg = df.groupBy(*key_cols).agg(F.max(precombine).alias("__max_pc"))
    cond = [df[k] == agg[k] for k in key_cols] + [
        df[precombine] == agg["__max_pc"]
    ]
    return df.join(F.broadcast(agg), cond, "inner").select(df["*"])


def precombine_dedup(
    df: DataFrame,
    key_cols: list[str],
    precombine: str,
    tiebreakers: list[str] | None = None,
) -> DataFrame:
    """A3/C5 window form: one row per key, max precombine wins
    (PRECOMBINE_FIELD_OPT_KEY semantics, README.md:282,453). Deterministic
    via explicit tiebreaker columns; single shuffle on the key."""
    order = [F.desc(precombine)] + [F.desc(t) for t in (tiebreakers or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# Golden fixture (reference demo scenario)
# ---------------------------------------------------------------------------


def _ts(s: str) -> datetime.datetime:
    return datetime.datetime.fromisoformat(s)


def golden_backfill(spark: SparkSession) -> DataFrame:
    """The 4-row backfill batch as Datastream envelopes
    (README.md:83-87,164-174; read_method='mysql-backfill-fulldump',
    README.md:365)."""
    return _envelopes(
        spark,
        read_method="mysql-backfill-fulldump",
        events=[
            ("INSERT", False, (1, "apple", 10)),
            ("INSERT", False, (2, "samsung", 20)),
            ("INSERT", False, (3, "dell", 30)),
            ("INSERT", False, (4, "motorola", 40)),
        ],
        base_ts="2023-01-12 04:01:00",
    )


def golden_cdc_batch(spark: SparkSession) -> DataFrame:
    """The 3-change CDC batch (authoritative version per SURVEY §2.9:
    insert pk5 'htc', update pk2 value->201, soft-delete pk3;
    README.md:498,529,535-552)."""
    return _envelopes(
        spark,
        read_method="mysql-cdc-binlog",
        events=[
            ("INSERT", False, (5, "htc", 50)),
            ("UPDATE-INSERT", False, (2, "samsung", 201)),
            ("DELETE", True, (3, "dell", 30)),
        ],
        base_ts="2023-01-12 05:30:00",
    )


def _envelopes(spark, read_method, events, base_ts):
    rows = []
    t0 = _ts(base_ts)
    for i, (change_type, is_deleted, (pk, name, value)) in enumerate(events):
        evt_ts = t0 + datetime.timedelta(seconds=i)
        rows.append(
            (
                f"uuid-{read_method}-{i}",
                evt_ts,
                evt_ts,
                "hudi_delta_test",
                read_method,
                "projects/demo/streams/mysql-stream",
                "schema-key",
                [("ordering", i)],
                (
                    "hudi_delta_test",
                    "db",
                    ["pk_id"],
                    "mysql-bin.000001",
                    1000 + i,
                    change_type,
                    is_deleted,
                ),
                (pk, name, value, evt_ts, _ts("2023-01-12 04:00:00")),
            )
        )
    # ONE slice: the nested schema forces the Python-RDD conversion path
    # (no Arrow), and the default parallelism would spin up 32 Python
    # workers for a handful of rows — measured ~6s per fixture build vs
    # well under a second single-sliced.
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), ENVELOPE_SCHEMA
    )
