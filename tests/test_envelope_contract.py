"""S1 Avro-envelope contract, env-independent: a JSON-serialized
Datastream envelope driven through flatten_envelope + normalize_timestamps
must reproduce EXACTLY the flattened schema the reference's hive-synced
table shows (`SHOW CREATE TABLE hudi_cow`, README.md:299-320) — column
order, names, and types, with the four timestamp columns normalized to
epoch-seconds BIGINT. The spark-avro jar is absent here by design; the
schema mapping is the contract, the container format is not."""

from __future__ import annotations

import json

from hudi_and_delta_showcase_spark.operators.cdc import (
    envelope_from_json,
    flatten_envelope,
    normalize_timestamps,
)

_TS_COLS = ["updated_at", "created_at", "read_timestamp", "source_timestamp"]

#: (name, spark simpleString type) in the reference DDL's order — payload
#: fields first (select("payload.*", "*")), then envelope columns. The
#: reference's table then moves created_at to the end as the partition
#: column; the flatten itself keeps it in payload position.
_EXPECTED = [
    ("pk_id", "int"),
    ("name", "string"),
    ("value", "int"),
    ("updated_at", "bigint"),
    ("created_at", "bigint"),
    ("uuid", "string"),
    ("read_timestamp", "bigint"),
    ("source_timestamp", "bigint"),
    ("object", "string"),
    ("read_method", "string"),
    ("stream_name", "string"),
    ("schema_key", "string"),
    ("sort_keys", "array<struct<member0:string,member1:bigint>>"),
    (
        "source_metadata",
        "struct<table:string,database:string,primary_keys:array<string>,"
        "log_file:string,log_position:bigint,change_type:string,"
        "is_deleted:boolean>",
    ),
    (
        "payload",
        "struct<pk_id:int,name:string,value:int,"
        "updated_at:timestamp_ntz,created_at:timestamp_ntz>",
    ),
]


def _event(pk: int, name: str, value: int, change_type: str,
           is_deleted: bool, ts: str) -> str:
    return json.dumps(
        {
            "uuid": f"uuid-{pk}",
            "read_timestamp": ts,
            "source_timestamp": ts,
            "object": "hudi_delta_test",
            "read_method": "mysql-cdc-binlog",
            "stream_name": "projects/demo/streams/mysql-stream",
            "schema_key": "schema-key",
            "sort_keys": [{"member0": "ordering", "member1": pk}],
            "source_metadata": {
                "table": "hudi_delta_test",
                "database": "db",
                "primary_keys": ["pk_id"],
                "log_file": "mysql-bin.000001",
                "log_position": 1000 + pk,
                "change_type": change_type,
                "is_deleted": is_deleted,
            },
            "payload": {
                "pk_id": pk,
                "name": name,
                "value": value,
                "updated_at": ts,
                "created_at": "2023-01-12 04:00:00",
            },
        }
    )


def test_envelope_json_flatten_matches_reference_ddl(spark):
    lines = [
        _event(1, "apple", 10, "INSERT", False, "2023-01-12 04:01:00"),
        _event(2, "samsung", 20, "UPDATE-INSERT", False, "2023-01-12 05:30:01"),
        _event(3, "dell", 30, "DELETE", True, "2023-01-12 05:30:02"),
    ]
    env = envelope_from_json(spark, lines)
    flat = normalize_timestamps(flatten_envelope(env), _TS_COLS)

    got = [(f.name, f.dataType.simpleString()) for f in flat.schema.fields]
    assert got == _EXPECTED

    rows = {r.pk_id: r for r in flat.collect()}
    assert set(rows) == {1, 2, 3}
    # epoch seconds, NTZ arithmetic: 2023-01-12 04:01:00 UTC = 1673496060
    assert rows[1].updated_at == 1673496060
    assert rows[1].created_at == 1673496000
    assert rows[2].value == 20
    assert rows[3].source_metadata.is_deleted is True
    assert rows[3].source_metadata.change_type == "DELETE"
    # the nested payload survives un-normalized (timestamp_ntz)
    assert rows[2].payload.value == 20
