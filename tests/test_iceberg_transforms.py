"""Iceberg partition transforms (r11): the spec hash + transform
functions against the published Appendix B test vectors, inclusive
predicate projection, and end-to-end transform-partitioned trees
written by ``write_iceberg_dataset`` and pruned by
``read_iceberg_table`` — ``days(ts)`` and ``bucket(N, id)`` being the
dominant real-world foreign Iceberg layouts the r10 verdict called out
as served stats-only."""

from __future__ import annotations

import struct
from datetime import date, datetime, timezone

import pytest

from hudi_and_delta_showcase_spark.tables.iceberg_transforms import (
    bucket_value,
    murmur3_32,
    normalize_partition_value,
    parse_transform,
    project_predicate,
    temporal_value,
    transform_column,
    truncate_value,
)


def _signed(h: int) -> int:
    return h - (1 << 32) if h >= (1 << 31) else h


# ---------------------------------------------------------------------------
# spec Appendix B hash vectors (published expected values)
# ---------------------------------------------------------------------------


def test_murmur3_spec_vectors():
    assert _signed(murmur3_32(struct.pack("<q", 34))) == 2017239379
    assert _signed(murmur3_32(struct.pack("<q", 17486))) == -653330422
    assert _signed(murmur3_32(b"iceberg")) == 1210000089
    assert (
        _signed(murmur3_32(struct.pack("<q", 1510871468000000)))
        == -2047944441
    )


def test_bucket_value_types():
    # int and long hash identically (spec: ints hash as longs)
    assert bucket_value(34, 16, "int") == bucket_value(34, 16, "long")
    assert bucket_value("iceberg", 16, "string") == 1210000089 % 16
    assert (
        bucket_value(date(2017, 11, 16), 100, "date")
        == (-653330422 & 0x7FFFFFFF) % 100
    )
    # unhashable types refuse (-> conservative scan), never raise
    assert bucket_value(1.5, 16, "double") is None
    assert bucket_value(True, 16, "boolean") is None


def test_truncate_value():
    assert truncate_value(1, 10) == 0
    assert truncate_value(-1, 10) == -10  # spec floor example
    assert truncate_value(10, 10) == 10
    assert truncate_value("iceberg", 3) == "ice"
    assert truncate_value(1.5, 10) is None


def test_temporal_values():
    assert temporal_value(datetime(2024, 1, 15, 8), "day", "timestamp") == (
        date(2024, 1, 15) - date(1970, 1, 1)
    ).days
    assert temporal_value("2024-01-15", "month", "timestamp") == 648
    assert temporal_value(date(1969, 12, 31), "year", "date") == -1
    assert (
        temporal_value(datetime(1970, 1, 1, 5, 30), "hour", "timestamp")
        == 5
    )
    # tz-aware literals normalize to UTC before flooring
    assert (
        temporal_value(
            datetime(2024, 1, 15, 1, 0, tzinfo=timezone.utc),
            "day",
            "timestamptz",
        )
        == (date(2024, 1, 15) - date(1970, 1, 1)).days
    )
    # int literal: micros for timestamp sources, days for date sources
    assert temporal_value(86_400_000_000, "day", "timestamp") == 1
    assert temporal_value(3, "day", "date") == 3
    assert temporal_value("not a time", "day", "timestamp") is None


def test_parse_transform():
    assert parse_transform("identity") == ("identity", None)
    assert parse_transform("bucket[16]") == ("bucket", 16)
    assert parse_transform("truncate[4]") == ("truncate", 4)
    assert parse_transform("day") == ("day", None)
    assert parse_transform("void") is None
    assert parse_transform("bucket[0]") is None
    assert parse_transform("") is None


# ---------------------------------------------------------------------------
# inclusive projection
# ---------------------------------------------------------------------------


def test_project_equality_through_bucket():
    op, v = project_predicate("bucket[4]", "=", 42, "long")
    assert op == "=" and v == bucket_value(42, 4, "long")
    op, vs = project_predicate("bucket[4]", "in", [1, 2], "long")
    assert op == "in" and vs == [
        bucket_value(1, 4, "long"), bucket_value(2, 4, "long")
    ]
    # range through bucket proves nothing
    assert project_predicate("bucket[4]", "<", 42, "long") is None
    # an unhashable member poisons the whole IN projection
    assert project_predicate("bucket[4]", "in", [1, 2.5], "long") is None


def test_project_range_through_monotonic():
    # < at an exact day boundary excludes the whole boundary day
    assert project_predicate(
        "day", "<", datetime(2024, 1, 10), "timestamp"
    ) == ("<=", 19731)
    # < strictly inside a day keeps that day
    assert project_predicate(
        "day", "<", datetime(2024, 1, 10, 0, 0, 1), "timestamp"
    ) == ("<=", 19732)
    assert project_predicate(
        "day", ">=", datetime(2024, 1, 10), "timestamp"
    ) == (">=", 19732)
    assert project_predicate("truncate[10]", "<", 25, "long") == ("<=", 20)
    # < at an exact truncate boundary excludes the boundary partition
    assert project_predicate("truncate[10]", "<", 20, "long") == ("<=", 10)
    assert project_predicate("truncate[3]", "=", "iceberg", "string") == (
        "=", "ice"
    )
    # identity is exact — op passes through untouched
    assert project_predicate("identity", "<", 7, "long") == ("<", 7)


def test_project_unknown_conservative():
    assert project_predicate("void", "=", 1, "long") is None
    assert project_predicate("day", "=", object(), "timestamp") is None


def test_normalize_partition_value():
    assert normalize_partition_value(19732, "day") == 19732
    # an avro decoder honoring the date logical type surfaces date
    assert normalize_partition_value(date(2024, 1, 10), "day") == 19732
    assert normalize_partition_value("a", "identity") == "a"


# ---------------------------------------------------------------------------
# Spark-side transform columns agree with the scalar spec functions
# ---------------------------------------------------------------------------


def test_transform_columns_match_scalar(spark):
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StringType, TimestampType

    df = spark.createDataFrame(
        [
            (1, "alpha", datetime(2024, 1, 15, 8, 30)),
            (-1, "b", datetime(1969, 12, 31, 23, 0)),
            (34, "iceberg", datetime(2017, 11, 16, 22, 31, 8)),
            (None, None, None),
        ],
        "k long, s string, ts timestamp",
    )
    cols = {
        "b_k": transform_column("k", "bucket[16]"),
        "b_s": transform_column("s", "bucket[16]"),
        "t_k": transform_column("k", "truncate[10]"),
        "t_s": transform_column("s", "truncate[3]"),
        "d": transform_column("ts", "day"),
        "m": transform_column("ts", "month"),
        "y": transform_column("ts", "year"),
        "h": transform_column("ts", "hour"),
    }
    dtypes = {"k": LongType(), "s": StringType(), "ts": TimestampType()}
    sel = [F.col("k"), F.col("s"), F.col("ts")]
    for name, c in cols.items():
        src = {"b_k": "k", "b_s": "s", "t_k": "k", "t_s": "s"}.get(
            name, "ts"
        )
        from hudi_and_delta_showcase_spark.tables.iceberg_transforms import (
            _TypedCol,
        )

        expr = c.resolve(dtypes[src]) if isinstance(c, _TypedCol) else c
        sel.append(expr.alias(name))
    for r in df.select(*sel).collect():
        if r.k is None:
            assert r.b_k is None and r.t_k is None and r.d is None
            continue
        assert r.b_k == bucket_value(r.k, 16, "long")
        assert r.b_s == bucket_value(r.s, 16, "string")
        assert r.t_k == truncate_value(r.k, 10)
        assert r.t_s == truncate_value(r.s, 3)
        assert r.d == temporal_value(r.ts, "day", "timestamp")
        assert r.m == temporal_value(r.ts, "month", "timestamp")
        assert r.y == temporal_value(r.ts, "year", "timestamp")
        assert r.h == temporal_value(r.ts, "hour", "timestamp")


# ---------------------------------------------------------------------------
# end-to-end: write_iceberg_dataset + transform-aware pruned reads
# ---------------------------------------------------------------------------


def _events(spark):
    rows = [
        (i, datetime(2024, 1, 1 + i % 20, i % 24), i % 7, f"e{i % 3}")
        for i in range(200)
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, kind string"
    )


def test_day_tree_prunes_range(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    df = _events(spark)
    root = str(tmp_path / "day_tree")
    write_iceberg_dataset(spark, df, root, partition_by=[("ts", "day")])
    full = read_iceberg_table(spark, root)
    assert len(full.inputFiles()) == 20
    pruned = read_iceberg_table(
        spark,
        root,
        predicate="ts >= TIMESTAMP '2024-01-05' AND "
        "ts < TIMESTAMP '2024-01-08'",
    )
    # the files-shrank pin: 3 of 20 day partitions survive
    assert len(pruned.inputFiles()) == 3
    expect = sorted(
        r.event_id
        for r in df.filter(
            "ts >= '2024-01-05' and ts < '2024-01-08'"
        ).collect()
    )
    assert sorted(r.event_id for r in pruned.collect()) == expect


def test_bucket_tree_prunes_equality(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    df = _events(spark)
    root = str(tmp_path / "bkt_tree")
    write_iceberg_dataset(
        spark, df, root,
        partition_by=[("user_id", "bucket[4]")], with_bounds=False,
    )
    full = read_iceberg_table(spark, root)
    pruned = read_iceberg_table(
        spark, root, predicate=[("user_id", "=", 3)]
    )
    assert len(pruned.inputFiles()) == 1 < len(full.inputFiles())
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in df.filter("user_id = 3").collect()
    )
    # a RANGE predicate must NOT prune through bucket (not monotonic):
    # with bounds disabled every file survives
    ranged = read_iceberg_table(
        spark, root, predicate=[("user_id", ">=", 3)]
    )
    assert len(ranged.inputFiles()) == len(full.inputFiles())
    assert ranged.count() == df.filter("user_id >= 3").count()


def test_multi_transform_tree(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    df = _events(spark)
    root = str(tmp_path / "multi_tree")
    write_iceberg_dataset(
        spark, df, root,
        partition_by=[("ts", "month"), ("user_id", "bucket[2]")],
    )
    pruned = read_iceberg_table(
        spark,
        root,
        predicate="user_id = 5 AND ts >= TIMESTAMP '2024-01-01'",
    )
    full = read_iceberg_table(spark, root)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in df.filter("user_id = 5").collect()
    )


def test_truncate_tree_prunes(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    from pyspark.sql import functions as F

    df = _events(spark).withColumn("user_id", F.col("event_id"))
    root = str(tmp_path / "tr_tree")
    write_iceberg_dataset(
        spark, df, root,
        partition_by=[("user_id", "truncate[50]")], with_bounds=False,
    )
    pruned = read_iceberg_table(
        spark, root, predicate=[("user_id", ">=", 150)]
    )
    full = read_iceberg_table(spark, root)
    assert len(pruned.inputFiles()) == 1 < len(full.inputFiles())
    assert pruned.count() == 50


def test_write_refuses_existing_tree(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        write_iceberg_dataset,
    )

    df = _events(spark)
    root = str(tmp_path / "dup_tree")
    write_iceberg_dataset(spark, df, root, partition_by=[("ts", "day")])
    with pytest.raises(ValueError, match="already exists"):
        write_iceberg_dataset(spark, df, root)


def test_timestamp_literal_in_predicate_sql():
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        parse_predicate_sql,
    )

    out = parse_predicate_sql(
        "ts >= TIMESTAMP '2024-01-10' AND d = DATE '2024-01-11' "
        "AND g = 'TIMESTAMP ''x'''"
    )
    assert out[0] == ("ts", ">=", datetime(2024, 1, 10))
    assert out[1] == ("d", "=", date(2024, 1, 11))
    # a quoted string that merely CONTAINS the keyword stays a string
    assert out[2] == ("g", "=", "TIMESTAMP 'x'")


def test_identity_temporal_literal_prunes():
    """r11 review fix: an identity DATE/TIMESTAMP partition compares
    after BOTH sides normalize to the epoch-int domain — previously the
    projected literal stayed a date and TypeError'd into a full scan."""
    from datetime import date as _date

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        _entry_can_match,
    )

    fields = {"d": {"id": 1, "name": "d", "type": "date"}}
    parts = {"d": [("d", "identity", "date")]}
    hit = {"partition": {"d": _date(2024, 1, 10)}}
    miss = {"partition": {"d": _date(2024, 1, 11)}}
    pred = [("d", "=", _date(2024, 1, 10))]
    assert _entry_can_match(hit, pred, fields, parts)
    assert not _entry_can_match(miss, pred, fields, parts)
    # int-days storage (the manifest's native form) prunes too
    assert not _entry_can_match(
        {"partition": {"d": 19733}}, pred, fields, parts
    )
    assert _entry_can_match(
        {"partition": {"d": 19732}}, pred, fields, parts
    )


def test_bucket_out_of_range_literal_conservative():
    """r11 review fix: a literal outside int64 never crashes the
    projection — it proves nothing and scans conservatively."""
    assert bucket_value(2 ** 63, 16, "long") is None
    assert project_predicate("bucket[4]", "=", 2 ** 63, "long") is None


def test_project_monotonic_shared_discipline():
    from datetime import datetime

    from hudi_and_delta_showcase_spark.tables.iceberg_transforms import (
        project_monotonic,
    )

    iso_day = lambda dt: dt.date().isoformat()  # noqa: E731
    assert project_monotonic("<", datetime(2024, 1, 10), iso_day) == (
        "<=", "2024-01-09"
    )
    assert project_monotonic(
        "in", [datetime(2024, 1, 10), datetime(2024, 1, 11)], iso_day
    ) == ("in", ["2024-01-10", "2024-01-11"])
    assert project_monotonic("=", object(), iso_day) is None


def test_append_snapshot_carries_manifests(spark, tmp_path):
    """r11: mode='append' adds a snapshot the Iceberg way — one new
    manifest at the next sequence number, parent manifest-list rows
    carried untouched, parent lineage + snapshot-log intact."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        iceberg_snapshots,
        read_iceberg_incremental,
        read_iceberg_table,
        write_iceberg_dataset,
    )

    df = _events(spark)
    b1 = df.filter("ts < '2024-01-11'")
    b2 = df.filter("ts >= '2024-01-11'")
    root = str(tmp_path / "app_tree")
    write_iceberg_dataset(spark, b1, root, partition_by=[("ts", "day")])
    write_iceberg_dataset(
        spark, b2, root, partition_by=[("ts", "day")], mode="append"
    )
    snaps = iceberg_snapshots(root)
    assert len(snaps) == 2
    assert snaps[1]["parent-snapshot-id"] == snaps[0]["snapshot-id"]
    full = read_iceberg_table(spark, root)
    assert full.count() == df.count()
    # time travel sees only the first batch
    tt = read_iceberg_table(
        spark, root, snapshot_id=snaps[0]["snapshot-id"]
    )
    assert tt.count() == b1.count()
    # incremental tail = exactly the appended batch, pruned on demand
    inc = read_iceberg_incremental(
        spark, root, from_snapshot_id=snaps[0]["snapshot-id"]
    )
    assert inc.count() == b2.count()
    pruned = read_iceberg_incremental(
        spark, root, from_snapshot_id=snaps[0]["snapshot-id"],
        predicate="ts >= TIMESTAMP '2024-01-15'",
    )
    assert len(pruned.inputFiles()) < len(inc.inputFiles())
    assert pruned.count() == df.filter("ts >= '2024-01-15'").count()


def test_append_refuses_mismatches(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        write_iceberg_dataset,
    )

    df = _events(spark)
    root = str(tmp_path / "ref_tree")
    write_iceberg_dataset(spark, df, root, partition_by=[("ts", "day")])
    with pytest.raises(ValueError, match="already exists"):
        write_iceberg_dataset(spark, df, root,
                              partition_by=[("ts", "day")])
    with pytest.raises(ValueError, match="schema"):
        write_iceberg_dataset(
            spark, df.drop("kind"), root,
            partition_by=[("ts", "day")], mode="append",
        )
    with pytest.raises(ValueError, match="spec"):
        write_iceberg_dataset(
            spark, df, root,
            partition_by=[("user_id", "bucket[2]")], mode="append",
        )


def test_bucket_ltz_agrees_with_spec_under_non_utc_session(spark):
    """r12 advice fix (low): the spec buckets timestamptz as micros
    since the UTC epoch; the write-side bucket column must compute the
    SAME value whatever spark.sql.session.timeZone says (Arrow hands a
    pandas UDF session-zone wall time for LTZ — the column now hashes
    JVM-side unix_micros instead)."""
    from datetime import datetime, timezone as _tz

    from pyspark.sql.types import TimestampType

    from hudi_and_delta_showcase_spark.tables.iceberg_transforms import (
        _TypedCol,
        bucket_value,
        transform_column,
    )

    instants = [
        datetime(2017, 11, 16, 22, 31, 8),
        datetime(2024, 6, 1, 0, 0, 0),
        datetime(1969, 12, 31, 23, 0, 0),
    ]
    df = spark.createDataFrame([(t,) for t in instants], "ts timestamp")
    col = transform_column("ts", "bucket[16]")
    if isinstance(col, _TypedCol):
        col = col.resolve(TimestampType())
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        got = {}
        for tz in ("UTC", "America/Los_Angeles", "Asia/Kolkata"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            got[tz] = [
                r.b for r in df.select(col.alias("b")).collect()
            ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)
    # identical under every session zone...
    assert got["UTC"] == got["America/Los_Angeles"] == got["Asia/Kolkata"]
    # ...and equal to the scalar spec hash of the UTC-epoch micros
    # (createDataFrame under the engine's UTC session stored these
    # naive datetimes as UTC instants)
    expect = [
        bucket_value(
            int(t.replace(tzinfo=_tz.utc).timestamp() * 1_000_000),
            16,
            "long",
        )
        for t in instants
    ]
    assert got["UTC"] == expect


def test_append_additive_schema_evolution(spark, tmp_path):
    """r12 (verdict #5): an append whose batch carries a NEW primitive
    column lands under a new schema-id — existing columns keep their
    field ids, the new column reads null from pre-evolution files, and
    day pruning still works across the schema boundary. Drops and
    type changes still refuse."""
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_metadata,
        read_iceberg_table,
        write_iceberg_dataset,
    )

    df = _events(spark)
    root = str(tmp_path / "evo_tree")
    write_iceberg_dataset(spark, df, root, partition_by=[("ts", "day")])
    evolved = spark.createDataFrame(
        [
            (10_000 + i, datetime(2024, 2, 1 + i % 3, 0), i % 7,
             f"e{i % 3}", f"src{i % 2}")
            for i in range(30)
        ],
        "event_id long, ts timestamp, user_id long, kind string, "
        "origin string",
    )
    write_iceberg_dataset(
        spark, evolved, root, partition_by=[("ts", "day")], mode="append"
    )
    meta = read_iceberg_metadata(root)
    assert len(meta["schemas"]) == 2
    assert meta["current-schema-id"] == 1
    s0 = {f["name"]: f["id"] for f in meta["schemas"][0]["fields"]}
    s1 = {f["name"]: f["id"] for f in meta["schemas"][1]["fields"]}
    for name, fid in s0.items():
        assert s1[name] == fid  # existing ids stable
    assert s1["origin"] == meta["last-column-id"] > max(s0.values())
    new_field = next(
        f for f in meta["schemas"][1]["fields"] if f["name"] == "origin"
    )
    assert new_field["required"] is False

    got = read_iceberg_table(spark, root)
    assert "origin" in got.columns
    rows = got.collect()
    assert len(rows) == 230
    old = [r for r in rows if r.event_id < 10_000]
    new = [r for r in rows if r.event_id >= 10_000]
    assert all(r.origin is None for r in old) and len(old) == 200
    assert all(r.origin is not None for r in new) and len(new) == 30

    # day pruning spans the boundary: a February-only predicate scans
    # only the evolved batch's files
    pruned = read_iceberg_table(
        spark, root,
        predicate="ts >= TIMESTAMP '2024-02-01' AND "
        "ts < TIMESTAMP '2024-02-02'",
    )
    assert 0 < len(pruned.inputFiles()) < len(got.inputFiles())
    assert all(r.origin is not None for r in pruned.collect())

    # non-additive shapes still refuse (type change on user_id)
    with pytest.raises(ValueError, match="additive"):
        write_iceberg_dataset(
            spark,
            spark.createDataFrame(
                [(1, datetime(2024, 3, 1), "7", "x", "y")],
                "event_id long, ts timestamp, user_id string, "
                "kind string, origin string",
            ),
            root, partition_by=[("ts", "day")], mode="append",
        )


def test_evolved_tree_reads_back_via_pyiceberg(spark, tmp_path):
    """Conditional foreign-reader cross-check of the evolved tree."""
    pytest.importorskip("pyiceberg")
    from pyiceberg.table import StaticTable

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        write_iceberg_dataset,
    )

    root = str(tmp_path / "evo_tree")
    write_iceberg_dataset(
        spark, _events(spark), root, partition_by=[("ts", "day")]
    )
    evolved = spark.createDataFrame(
        [(10_000, datetime(2024, 2, 1), 1, "e0", "s0")],
        "event_id long, ts timestamp, user_id long, kind string, "
        "origin string",
    )
    write_iceberg_dataset(
        spark, evolved, root, partition_by=[("ts", "day")], mode="append"
    )
    t = StaticTable.from_metadata(
        str(tmp_path / "evo_tree" / "metadata" / "v2.metadata.json")
    )
    pf = t.scan().to_pandas()
    assert len(pf) == 201
    assert pf["origin"].notna().sum() == 1


def test_append_type_widening_promotions(spark, tmp_path):
    """r13 (verdict #7): appends carrying the spec's promotion set —
    int->long here — land under a new schema-id with the field id
    KEPT and the wider type taken; old narrow files upcast at scan
    under the pinned read schema; value_counts-free bound pruning
    still decodes the old 4-byte bounds; disallowed changes
    (long->int, string->int) still refuse."""
    from datetime import datetime

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_metadata,
        read_iceberg_table,
        read_iceberg_where,
        write_iceberg_dataset,
    )

    root = str(tmp_path / "widen_tree")
    narrow = spark.createDataFrame(
        [(i, datetime(2024, 1, 1 + i % 3, 0), float(i)) for i in range(30)],
        "event_id int, ts timestamp, score float",
    )
    write_iceberg_dataset(spark, narrow, root, partition_by=[("ts", "day")])
    wide = spark.createDataFrame(
        [
            (10_000_000_000 + i, datetime(2024, 2, 1, 0), float(100 + i))
            for i in range(10)
        ],
        "event_id long, ts timestamp, score double",
    )
    write_iceberg_dataset(
        spark, wide, root, partition_by=[("ts", "day")], mode="append"
    )
    meta = read_iceberg_metadata(root)
    assert len(meta["schemas"]) == 2
    s0 = {f["name"]: f for f in meta["schemas"][0]["fields"]}
    s1 = {f["name"]: f for f in meta["schemas"][1]["fields"]}
    assert s0["event_id"]["type"] == "int"
    assert s1["event_id"]["type"] == "long"
    assert s1["event_id"]["id"] == s0["event_id"]["id"]  # id kept
    assert s1["score"]["type"] == "double"

    got = read_iceberg_table(spark, root)
    assert dict(got.dtypes)["event_id"] == "bigint"
    assert dict(got.dtypes)["score"] == "double"
    vals = sorted(r.event_id for r in got.collect())
    assert len(vals) == 40
    assert vals[0] == 0 and vals[-1] == 10_000_000_009

    # bound pruning decodes the OLD 4-byte int bounds under the
    # widened long schema (length-tolerant unpack)
    hit = read_iceberg_where(
        spark, root, "event_id", lo=10_000_000_000
    )
    assert sorted(r.event_id for r in hit.collect()) == [
        10_000_000_000 + i for i in range(10)
    ]
    assert len(hit.inputFiles()) < len(got.inputFiles())

    # NARROWING still refuses (long -> int on a widened tree)
    with pytest.raises(ValueError, match="additive"):
        write_iceberg_dataset(
            spark,
            spark.createDataFrame(
                [(1, datetime(2024, 3, 1, 0), 1.0)],
                "event_id int, ts timestamp, score double",
            ),
            root, partition_by=[("ts", "day")], mode="append",
        )


def test_widened_tree_reads_back_via_pyiceberg(spark, tmp_path):
    """Conditional foreign-reader cross-check of the widened tree."""
    pytest.importorskip("pyiceberg")
    from datetime import datetime

    from pyiceberg.table import StaticTable

    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        write_iceberg_dataset,
    )

    root = str(tmp_path / "widen_py")
    write_iceberg_dataset(
        spark,
        spark.createDataFrame(
            [(i, datetime(2024, 1, 1, 0)) for i in range(5)],
            "k int, ts timestamp",
        ),
        root,
    )
    write_iceberg_dataset(
        spark,
        spark.createDataFrame(
            [(7_000_000_000, datetime(2024, 1, 2, 0))],
            "k long, ts timestamp",
        ),
        root,
        mode="append",
    )
    import glob
    import os

    hint = os.path.join(root, "metadata", "version-hint.text")
    v = int(open(hint).read().strip())
    st = StaticTable.from_metadata(
        os.path.join(root, "metadata", f"v{v}.metadata.json")
    )
    got = st.scan().to_arrow().to_pydict()
    assert sorted(got["k"]) == [0, 1, 2, 3, 4, 7_000_000_000]
