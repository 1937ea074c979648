"""Delta manifest-level file pruning + exported add.stats (r10): the
``_delta_log`` twin of the Iceberg pruning — ``read_delta_table``'s
``predicate`` prunes add actions on partitionValues and stats
minValues/maxValues before the file list is built (files-read count
pinned), and ``export_delta_log`` stamps real stats from the commit's
own row-count/col-stats indexes so foreign Delta readers data-skip."""

from __future__ import annotations

import json
import os

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.delta_log import (
    _add_can_match,
    export_delta_log,
    read_delta_table,
)

_SCHEMA_STRING = json.dumps({
    "type": "struct",
    "fields": [
        {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
        {"name": "v", "type": "string", "nullable": True, "metadata": {}},
    ],
})


def _write_parquet(path, ks, vs):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"k": pa.array(ks, pa.int32()), "v": pa.array(vs)}), path
    )


def _foreign_stats_log(root: str, partitioned: bool = False) -> None:
    """A foreign _delta_log with two adds carrying delta-spark-shaped
    stats (numRecords/minValues/maxValues), optionally partitioned."""
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    f0, f1 = "part-00000-a-c000.snappy.parquet", "part-00001-b-c000.snappy.parquet"
    _write_parquet(os.path.join(root, f0), [1, 2, 3], ["aa", "ab", "ac"])
    _write_parquet(os.path.join(root, f1), [100, 200], ["ma", "mb"])
    schema = _SCHEMA_STRING
    part_cols = []
    pv0, pv1 = {}, {}
    if partitioned:
        schema = json.dumps({
            "type": "struct",
            "fields": json.loads(_SCHEMA_STRING)["fields"] + [
                {"name": "g", "type": "string", "nullable": True,
                 "metadata": {}},
            ],
        })
        part_cols = ["g"]
        pv0, pv1 = {"g": "a"}, {"g": "b"}
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {
            "id": "7f9a2cdc-2bb1-4a8c-8e5d-2f4a1e82d7f0",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": part_cols,
            "configuration": {}, "createdTime": 1700000000000}},
        {"add": {
            "path": f0, "partitionValues": pv0, "size": 900,
            "modificationTime": 1700000000000, "dataChange": True,
            "stats": json.dumps({
                "numRecords": 3,
                "minValues": {"k": 1, "v": "aa"},
                "maxValues": {"k": 3, "v": "ac"}})}},
        {"add": {
            "path": f1, "partitionValues": pv1, "size": 900,
            "modificationTime": 1700000000000, "dataChange": True,
            "stats": json.dumps({
                "numRecords": 2,
                "minValues": {"k": 100, "v": "ma"},
                "maxValues": {"k": 200, "v": "mb"}})}},
    ]
    with open(os.path.join(log, "00000000000000000000.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def test_stats_pruning_foreign_log(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_stats_log(root)
    full = read_delta_table(spark, root)
    assert len(full.inputFiles()) == 2
    pruned = read_delta_table(spark, root, predicate=[("k", "<=", 50)])
    assert len(pruned.inputFiles()) == 1  # THE PIN
    assert sorted(r.k for r in pruned.collect()) == [1, 2, 3]
    # string bounds prune too
    pruned = read_delta_table(spark, root, predicate=[("v", ">=", "m")])
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.v for r in pruned.collect()) == ["ma", "mb"]


def test_partition_value_pruning_foreign_log(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_stats_log(root, partitioned=True)
    pruned = read_delta_table(spark, root, predicate=[("g", "=", "b")])
    assert len(pruned.inputFiles()) == 1
    assert sorted((r.k, r.g) for r in pruned.collect()) == [
        (100, "b"), (200, "b")]


def test_all_files_pruned_keeps_schema(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_stats_log(root)
    out = read_delta_table(spark, root, predicate=[("k", ">", 10_000)])
    assert out.count() == 0
    assert out.columns == ["k", "v"]


def test_missing_stats_scan_conservatively():
    add = {"partitionValues": {}, "stats": None}
    assert _add_can_match(add, [("k", "=", 7)], [], {})
    # corrupt stats JSON must not crash or prune
    assert _add_can_match(
        {"partitionValues": {}, "stats": "{broken"}, [("k", "=", 7)], [], {}
    )
    # type-mismatched bounds (string stats vs int conjunct) never prune
    add = {"partitionValues": {}, "stats": json.dumps(
        {"minValues": {"k": "a"}, "maxValues": {"k": "z"}})}
    assert _add_can_match(add, [("k", "=", 7)], [], {})


def test_null_partition_value_prunes():
    add = {"partitionValues": {"g": "__HIVE_DEFAULT_PARTITION__"}}
    assert not _add_can_match(add, [("g", "=", "a")], ["g"], {})
    assert _add_can_match(
        {"partitionValues": {}}, [("g", "=", "a")], ["g"], {}
    )


def test_export_stamps_stats_and_foreign_prune_roundtrip(spark, tmp_path):
    """The engine's own export carries numRecords + min/max from the
    manifest's indexes — and its own reader prunes on them."""
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k int, v string"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"]
    )
    export_delta_log(t)
    log = os.path.join(t.path, "_delta_log", "00000000000000000000.json")
    adds = [
        json.loads(line)["add"]
        for line in open(log)
        if '"add"' in line
    ]
    assert adds and all("stats" in a for a in adds)
    st = json.loads(adds[0]["stats"])
    assert st["numRecords"] > 0
    assert "k" in st["minValues"] and "k" in st["maxValues"]
    full = read_delta_table(spark, t.path)
    lo_file_max = min(
        json.loads(a["stats"])["maxValues"]["k"] for a in adds
    )
    pruned = read_delta_table(
        spark, t.path, predicate=[("k", ">", lo_file_max)]
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert sorted(r.k for r in pruned.collect()) == list(
        range(lo_file_max + 1, 40)
    )


def test_pruning_composes_with_deletion_vectors(spark, tmp_path):
    """Pruned reads still apply DVs on surviving files; DV descriptors
    of pruned-away files are never decoded."""
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k int, v string"
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3,), (25,)], "k int"))
    export_delta_log(t)
    got = read_delta_table(spark, t.path, predicate=[("k", ">=", 20)])
    ks = sorted(r.k for r in got.collect())
    assert ks == [k for k in range(20, 40) if k != 25]


def test_bad_predicate_refuses(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_stats_log(root)
    with pytest.raises(ValueError, match="unsupported predicate op"):
        read_delta_table(spark, root, predicate=[("k", "!=", 3)])


# ---------------------------------------------------------------------------
# r11: generated-column partition pruning (delta.generationExpression)
# ---------------------------------------------------------------------------


def _write_ts_parquet(path, ids, days):
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    ts = [dt.datetime(2024, 1, d, 12, 0) for d in days]
    pq.write_table(
        pa.table({"k": pa.array(ids, pa.int64()),
                  "ts": pa.array(ts, pa.timestamp("us"))}), path
    )


def _foreign_generated_log(root: str, expr: str, pvals: list[str]) -> None:
    """A foreign _delta_log partitioned by a GENERATED column `d`
    derived from ts — the delta-spark daily-partition layout."""
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    f0, f1 = "part-00000-a-c000.snappy.parquet", "part-00001-b-c000.snappy.parquet"
    _write_ts_parquet(os.path.join(root, f0), [1, 2], [5, 5])
    _write_ts_parquet(os.path.join(root, f1), [3, 4], [20, 20])
    dtype = "date" if "DATE)" in expr else (
        "integer" if expr.upper().startswith(
            ("YEAR", "MONTH", "DAY", "HOUR")) else "string")
    schema = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "ts", "type": "timestamp", "nullable": True,
             "metadata": {}},
            {"name": "d", "type": dtype, "nullable": True,
             "metadata": {"delta.generationExpression": expr}},
        ],
    })
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
        {"metaData": {
            "id": "7f9a2cdc-2bb1-4a8c-8e5d-2f4a1e82d7f1",
            "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": ["d"],
            "configuration": {}, "createdTime": 1700000000000}},
        {"add": {"path": f0, "partitionValues": {"d": pvals[0]},
                 "size": 900, "modificationTime": 1700000000000,
                 "dataChange": True}},
        {"add": {"path": f1, "partitionValues": {"d": pvals[1]},
                 "size": 900, "modificationTime": 1700000000000,
                 "dataChange": True}},
    ]
    with open(os.path.join(log, "00000000000000000000.json"), "w") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def test_generated_date_partition_prunes_ts_range(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_generated_log(root, "CAST(ts AS DATE)",
                           ["2024-01-05", "2024-01-20"])
    full = read_delta_table(spark, root)
    assert len(full.inputFiles()) == 2
    pruned = read_delta_table(
        spark, root,
        predicate="ts >= TIMESTAMP '2024-01-10' AND "
        "ts < TIMESTAMP '2024-02-01'",
    )
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [3, 4]
    # strict < at an exact midnight boundary excludes the boundary day
    lt = read_delta_table(
        spark, root, predicate="ts < TIMESTAMP '2024-01-20'"
    )
    assert len(lt.inputFiles()) == 1
    assert sorted(r.k for r in lt.collect()) == [1, 2]


def test_generated_month_partition_prunes_equality_only(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_generated_log(root, "MONTH(ts)", ["1", "1"])
    import datetime as dt

    # equality on ts projects MONTH(ts) = 3 -> both January files prune
    pruned = read_delta_table(
        spark, root,
        predicate=[("ts", "=", dt.datetime(2024, 3, 5))],
    )
    assert pruned.count() == 0
    # a RANGE predicate must NOT prune through a cyclic calendar value
    ranged = read_delta_table(
        spark, root, predicate=[("ts", ">=", dt.datetime(2020, 1, 1))]
    )
    assert len(ranged.inputFiles()) == 2


def test_generated_date_format_partition_prunes(spark, tmp_path):
    root = str(tmp_path / "dl")
    _foreign_generated_log(root, "DATE_FORMAT(ts, 'yyyy-MM-dd')",
                           ["2024-01-05", "2024-01-20"])
    pruned = read_delta_table(
        spark, root, predicate="ts >= TIMESTAMP '2024-01-10'"
    )
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [3, 4]


def test_export_stamps_generation_expression(spark, tmp_path):
    """r11 export side: a table with generated columns exports
    delta.generationExpression in the schemaString and writer v4+ —
    the metadata foreign delta-spark readers (and this engine's own
    generated-column pruning) derive partition filters from."""
    df = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00"), (2, "2024-01-20 10:00:00")],
        "k int, ts_s string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        generated_columns={"d": "CAST(ts AS DATE)"},
    )
    export_delta_log(t)
    log = os.path.join(t.path, "_delta_log")
    meta_fields = prot = None
    for fn in sorted(os.listdir(log)):
        if not fn.endswith(".json"):
            continue
        for line in open(os.path.join(log, fn)):
            a = json.loads(line)
            if "metaData" in a:
                meta_fields = json.loads(
                    a["metaData"]["schemaString"])["fields"]
            if "protocol" in a:
                prot = a["protocol"]
    d = next(f for f in meta_fields if f["name"] == "d")
    assert d["metadata"]["delta.generationExpression"] == "CAST(ts AS DATE)"
    assert prot["minWriterVersion"] >= 4


def test_lowercase_date_format_expression_projects(spark, tmp_path):
    """r11 review fix: the common lowercase spelling
    date_format(ts, 'yyyy-MM-dd') produces a projector too (the format
    string itself stays case-sensitive)."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        _generated_projectors,
    )

    meta = {
        "partitionColumns": ["d"],
        "schemaString": json.dumps({
            "type": "struct",
            "fields": [{
                "name": "d", "type": "string", "nullable": True,
                "metadata": {"delta.generationExpression":
                             "date_format(ts, 'yyyy-MM-dd')"},
            }],
        }),
    }
    assert _generated_projectors(meta) == {
        "ts": [("d", "date_format", "yyyy-MM-dd")]
    }
    # a case-mangled FORMAT must not match (YYYY means week-year)
    meta2 = json.loads(json.dumps(meta))
    meta2["schemaString"] = meta["schemaString"].replace(
        "yyyy-MM-dd", "YYYY-MM-DD"
    )
    assert _generated_projectors(meta2) == {}


def test_v7_protocol_lists_generated_columns_feature(spark, tmp_path):
    """r11 review fix: a DV-bearing export of a generated-column table
    must NAME generatedColumns in writerFeatures — v7 writers only
    enforce listed features."""
    df = spark.createDataFrame(
        [(1, "2024-01-05 10:00:00"), (2, "2024-01-20 10:00:00")],
        "k int, ts_s string",
    ).selectExpr("k", "CAST(ts_s AS TIMESTAMP) AS ts")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        generated_columns={"d": "CAST(ts AS DATE)"},
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(1,)], "k int"))
    export_delta_log(t)
    prot = None
    log = os.path.join(t.path, "_delta_log")
    for fn in sorted(os.listdir(log)):
        if fn.endswith(".json"):
            for line in open(os.path.join(log, fn)):
                a = json.loads(line)
                if "protocol" in a:
                    prot = a["protocol"]
    assert prot["minWriterVersion"] == 7
    assert "generatedColumns" in prot["writerFeatures"]


def test_mixed_writer_table_serves_real_partition_values(spark, tmp_path):
    """r12 advice fix (medium): the partitionValues reconstruction
    join is skipped only when EVERY live add is tagged by this
    engine's exporter as physically carrying the partition columns.
    A mixed table — engine-exported files (column in data) plus a
    foreign delta-spark-style add (column NOT in data) — keeps the
    join and serves real values for both; the old single-footer probe
    generalized one engine file to the whole scan and served NULLs
    from the foreign file."""
    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 3 else "b") for k in range(6)],
        "k int, v string, g string",
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], partition_by="g"
    )
    export_delta_log(t)
    log = os.path.join(t.path, "_delta_log")
    versions = sorted(
        int(f.split(".")[0]) for f in os.listdir(log) if f.endswith(".json")
    )
    adds = []
    for v in versions:
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            adds += [
                json.loads(line)["add"] for line in fh if '"add"' in line
            ]
    # every engine add is tagged
    assert adds and all(
        (a.get("tags") or {}).get("partitionColumnsInFile") == "true"
        for a in adds
    )
    # pure-export read: the join is skipped (no reconstruction alias
    # in the executed plan), values are real
    pure = read_delta_table(spark, t.path)
    assert "__pv_file" not in pure._jdf.queryExecution().executedPlan().toString()
    assert sorted((r.k, r.g) for r in pure.collect()) == [
        (k, "a" if k < 3 else "b") for k in range(6)
    ]
    # foreign append: data file WITHOUT g, untagged add with
    # partitionValues — delta-spark's layout
    foreign = "part-00000-foreign-c000.snappy.parquet"
    _write_parquet(os.path.join(t.path, foreign), [100, 200], ["fa", "fb"])
    actions = [
        {"add": {
            "path": foreign, "partitionValues": {"g": "z"}, "size": 900,
            "modificationTime": 1700000000000, "dataChange": True}},
        {"commitInfo": {"timestamp": 1700000000000,
                        "operation": "WRITE"}},
    ]
    with open(
        os.path.join(log, f"{versions[-1] + 1:020d}.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))
    mixed = read_delta_table(spark, t.path)
    got = sorted((r.k, r.g) for r in mixed.collect())
    assert got == [
        (k, "a" if k < 3 else "b") for k in range(6)
    ] + [(100, "z"), (200, "z")]
    # no NULL partition values anywhere
    assert all(g is not None for _, g in got)
