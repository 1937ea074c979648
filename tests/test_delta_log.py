"""Delta _delta_log protocol tests: commit-file shape matches the public
PROTOCOL.md (version-padded JSON action files, protocol/metaData first
commit, add/remove with dataChange), snapshot replay, overwrite
semantics, and time travel."""

from __future__ import annotations

import json
import os
import tempfile

import pytest

from hudi_and_delta_showcase_spark.tables.delta_log import (
    delta_history,
    read_delta_table,
    write_delta_table,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _final(df):
    return sorted(tuple(r) for r in df.collect())


def test_log_layout_matches_protocol(spark):
    path = tempfile.mkdtemp(prefix="delta_proto_")
    assert write_delta_table(_df(spark, [(1, "a")]), path) == 0
    log = os.path.join(path, "_delta_log")
    assert sorted(os.listdir(log)) == ["00000000000000000000.json"]
    actions = [
        json.loads(line)
        for line in open(os.path.join(log, "00000000000000000000.json"))
        if line.strip()
    ]
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol" and kinds[1] == "metaData"
    assert "add" in kinds and kinds[-1] == "commitInfo"
    proto = actions[0]["protocol"]
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}
    meta = actions[1]["metaData"]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    # schemaString is a Spark schema JSON string, as the protocol requires
    assert json.loads(meta["schemaString"])["type"] == "struct"
    add = next(a["add"] for a in actions if "add" in a)
    assert add["dataChange"] is True and add["size"] > 0
    # data files live in the table root, named like delta's parts
    assert any(f.endswith(".snappy.parquet") for f in os.listdir(path))


def test_append_overwrite_and_time_travel(spark):
    path = tempfile.mkdtemp(prefix="delta_tt_")
    write_delta_table(_df(spark, [(1, "a"), (2, "b")]), path)
    write_delta_table(_df(spark, [(3, "c")]), path, mode="append")
    assert _final(read_delta_table(spark, path)) == [(1, "a"), (2, "b"), (3, "c")]
    # overwrite removes all previously live files
    write_delta_table(_df(spark, [(9, "z")]), path, mode="overwrite")
    assert _final(read_delta_table(spark, path)) == [(9, "z")]
    # time travel to every prior version
    assert _final(read_delta_table(spark, path, version=0)) == [(1, "a"), (2, "b")]
    assert _final(read_delta_table(spark, path, version=1)) == [
        (1, "a"), (2, "b"), (3, "c"),
    ]
    hist = delta_history(path)
    assert [h["version"] for h in hist] == [0, 1, 2]
    assert hist[2]["operationParameters"]["mode"] == "OVERWRITE"


def test_schema_pinned_from_log(spark):
    """The scan uses the log's schemaString, not parquet inference."""
    path = tempfile.mkdtemp(prefix="delta_schema_")
    write_delta_table(_df(spark, [(1, "a")]), path)
    got = read_delta_table(spark, path)
    assert [(f.name, f.dataType.simpleString()) for f in got.schema.fields] == [
        ("k", "int"), ("v", "string"),
    ]


def test_checkpoint_replay(spark, sf_dir, tmp_path):
    """Protocol checkpoint: after write_checkpoint, snapshot resolution
    starts from the checkpoint (commit files before it are not needed),
    and time travel BEFORE the checkpoint still replays the full log."""
    import os

    from hudi_and_delta_showcase_spark.io import load_table
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_table,
        write_checkpoint,
        write_delta_table,
    )

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "value"
    )
    path = str(tmp_path / "dl")
    write_delta_table(events.filter("event_id % 3 = 0"), path)
    write_delta_table(events.filter("event_id % 3 = 1"), path)
    cp_v = write_checkpoint(spark, path)
    write_delta_table(events.filter("event_id % 3 = 2"), path)

    assert os.path.exists(
        os.path.join(path, "_delta_log", "_last_checkpoint")
    )
    assert os.path.exists(
        os.path.join(path, "_delta_log", f"{cp_v:020d}.checkpoint.parquet")
    )
    # full snapshot correct through the checkpointed replay
    assert read_delta_table(spark, path).count() == events.count()
    # time travel to v0 (pre-checkpoint) still works
    n0 = events.filter("event_id % 3 = 0").count()
    assert read_delta_table(spark, path, version=0).count() == n0
    # deleting the pre-checkpoint commit JSONs: snapshot still resolves
    # (checkpoint replaces them), proving replay starts at the checkpoint
    os.remove(os.path.join(path, "_delta_log", f"{0:020d}.json"))
    assert read_delta_table(spark, path).count() == events.count()


def test_export_lakehouse_timeline_as_delta_log(spark, tmp_path):
    """UniForm-style interop: exporting a lakehouse table's manifest
    produces a _delta_log over the SAME parquet files; the Delta-protocol
    reader then serves every version with state equal to the native
    reads, and an incremental re-export appends only new versions."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        delta_history,
        export_delta_log,
        read_delta_table,
    )
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1)], "k int, v int, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.upsert(spark.createDataFrame([(2, 22, 2), (3, 30, 2)],
                                   "k int, v int, sq int"))
    assert export_delta_log(t) == 1
    for v in (0, 1):
        native = {
            (r.k, r.v)
            for r in t.read(version=v).select("k", "v").collect()
        }
        via_delta = {
            (r.k, r.v)
            for r in read_delta_table(spark, t.path, version=v)
            .select("k", "v")
            .collect()
        }
        assert native == via_delta, f"version {v} drifted"
    # incremental: another commit, re-export appends exactly one version
    t.upsert(spark.createDataFrame([(4, 40, 3)], "k int, v int, sq int"))
    assert export_delta_log(t) == 2
    assert len(delta_history(t.path)) == 3
    assert {
        r.k for r in read_delta_table(spark, t.path).select("k").collect()
    } == {1, 2, 3, 4}


def test_export_refuses_unrepresentable_state(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.delta_log import export_delta_log
    from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable

    df = spark.createDataFrame([(1, 10, 1)], "k int, v int, sq int")
    t = LakehouseTable.create(
        spark, str(tmp_path / "m"), df, key_cols=["k"], precombine="sq",
        table_type="mor",
    )
    t.upsert(spark.createDataFrame([(1, 11, 2)], "k int, v int, sq int"))
    with pytest.raises(RuntimeError, match="compact"):
        export_delta_log(t)
    t.compact()
    assert export_delta_log(t) >= 0


def test_reads_foreign_parquet_checkpoint_with_expired_json(spark, tmp_path):
    """The long-lived real-Delta state: a delta-spark-authored table
    whose early JSON commits EXPIRED, leaving only the classic parquet
    checkpoint (struct-typed action columns, multi-part naming) plus
    newer JSON commits. Our reader must start from the foreign
    checkpoint, replay the remaining JSON, and derive the hive
    partition columns the data files do not carry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "t")
    log = os.path.join(root, "_delta_log")
    os.makedirs(log)
    # data files in hive layout, WITHOUT the partition column in the
    # file (delta-spark never stores partition columns in data files)
    for part, ks in [("a", [1, 2]), ("b", [3])]:
        os.makedirs(os.path.join(root, f"p={part}"), exist_ok=True)
        pq.write_table(
            pa.table({"k": pa.array(ks, pa.int64()),
                      "v": pa.array([k * 10 for k in ks], pa.int64())}),
            os.path.join(root, f"p={part}", "part-000.snappy.parquet"),
        )
    schema_string = json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "long", "nullable": True, "metadata": {}},
            {"name": "p", "type": "string", "nullable": True, "metadata": {}},
        ],
    })
    meta_struct = {
        "id": "11111111-2222-3333-4444-555555555555",
        "name": None, "description": None,
        "format": {"provider": "parquet", "options": {}},
        "schemaString": schema_string,
        "partitionColumns": ["p"],
        "configuration": {},
        "createdTime": 1700000000000,
    }
    # classic MULTI-PART checkpoint at version 10: struct-typed action
    # columns, one action per row, nulls elsewhere (delta-spark shape)
    add_type = pa.struct([
        ("path", pa.string()),
        ("partitionValues", pa.map_(pa.string(), pa.string())),
        ("size", pa.int64()),
        ("modificationTime", pa.int64()),
        ("dataChange", pa.bool_()),
    ])
    meta_type = pa.struct([
        ("id", pa.string()), ("name", pa.string()),
        ("description", pa.string()),
        ("format", pa.struct([("provider", pa.string()),
                              ("options", pa.map_(pa.string(), pa.string()))])),
        ("schemaString", pa.string()),
        ("partitionColumns", pa.list_(pa.string())),
        ("configuration", pa.map_(pa.string(), pa.string())),
        ("createdTime", pa.int64()),
    ])
    proto_type = pa.struct([("minReaderVersion", pa.int32()),
                            ("minWriterVersion", pa.int32())])

    def cp_table(rows_add, row_meta, row_proto):
        n = len(rows_add) + (1 if row_meta else 0) + (1 if row_proto else 0)
        adds, metas, protos = [], [], []
        if row_proto:
            adds.append(None); metas.append(None)
            protos.append({"minReaderVersion": 1, "minWriterVersion": 2})
        if row_meta:
            adds.append(None); metas.append(row_meta); protos.append(None)
        for a in rows_add:
            adds.append(a); metas.append(None); protos.append(None)
        assert len(adds) == n
        return pa.table({
            "add": pa.array(adds, add_type),
            "metaData": pa.array(metas, meta_type),
            "protocol": pa.array(protos, proto_type),
        })

    def add_row(path):
        part = path.split("=", 1)[1].split("/", 1)[0]
        return {"path": path, "partitionValues": [("p", part)],
                "size": 100, "modificationTime": 1700000000000,
                "dataChange": True}

    pq.write_table(
        cp_table([add_row("p=a/part-000.snappy.parquet")], meta_struct,
                 True),
        os.path.join(log, "00000000000000000010.checkpoint."
                          "0000000001.0000000002.parquet"),
    )
    pq.write_table(
        cp_table([add_row("p=b/part-000.snappy.parquet")], None, None),
        os.path.join(log, "00000000000000000010.checkpoint."
                          "0000000002.0000000002.parquet"),
    )
    with open(os.path.join(log, "_last_checkpoint"), "w") as fh:
        json.dump({"version": 10, "size": 5, "parts": 2}, fh)
    # JSON commits 0..10 EXPIRED (absent); one newer commit adds a row
    os.makedirs(os.path.join(root, "p=c"), exist_ok=True)
    pq.write_table(
        pa.table({"k": pa.array([4], pa.int64()),
                  "v": pa.array([40], pa.int64())}),
        os.path.join(root, "p=c", "part-000.snappy.parquet"),
    )
    with open(os.path.join(log, "00000000000000000011.json"), "w") as fh:
        fh.write(json.dumps({"add": {
            "path": "p=c/part-000.snappy.parquet",
            "partitionValues": {"p": "c"}, "size": 100,
            "modificationTime": 1700000001000, "dataChange": True,
        }}) + "\n")

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        delta_history,
        read_delta_table,
    )

    got = sorted(
        (r.k, r.v, r.p) for r in read_delta_table(spark, root).collect()
    )
    assert got == [(1, 10, "a"), (2, 20, "a"), (3, 30, "b"), (4, 40, "c")]
    # time travel to the checkpoint version itself (no JSON there)
    got10 = sorted(
        (r.k, r.p)
        for r in read_delta_table(spark, root, version=10).collect()
    )
    assert got10 == [(1, "a"), (2, "a"), (3, "b")]
    # a pre-checkpoint version is genuinely unreadable: clear error
    with pytest.raises(ValueError, match="not in log"):
        read_delta_table(spark, root, version=3)


def test_export_carries_table_properties(spark, tmp_path):
    """Constraints export as delta.constraints.* and CDF as
    delta.enableChangeDataFeed, with the writer version raised so a
    foreign delta writer is REQUIRED to understand them (reader stays
    1: neither changes how files read). Feature-free tables keep the
    byte-identical protocol-1/2 export the goldens pin."""
    import json as _json
    import os as _os

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
    )

    df = spark.createDataFrame([(1, 10, 1)], "k int, v int, sq int")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq",
        cdc_enabled=True, constraints={"v_pos": "v >= 0"},
    )
    export_delta_log(t)
    actions = [
        _json.loads(line)
        for line in open(
            _os.path.join(t.path, "_delta_log", f"{0:020d}.json")
        ).read().splitlines()
        if line.strip()
    ]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 4}
    assert meta["configuration"] == {
        "delta.constraints.v_pos": "v >= 0",
        "delta.enableChangeDataFeed": "true",
    }

    # feature-free export unchanged (protocol 1/2, empty configuration)
    t2 = LakehouseTable.create(
        spark, str(tmp_path / "t2"), df, key_cols=["k"], precombine="sq"
    )
    export_delta_log(t2)
    actions2 = [
        _json.loads(line)
        for line in open(
            _os.path.join(t2.path, "_delta_log", f"{0:020d}.json")
        ).read().splitlines()
        if line.strip()
    ]
    assert next(a["protocol"] for a in actions2 if "protocol" in a) == {
        "minReaderVersion": 1, "minWriterVersion": 2,
    }
    assert next(a["metaData"] for a in actions2 if "metaData" in a)[
        "configuration"
    ] == {}


def test_read_delta_changes_foreign_log(spark, tmp_path):
    """read_delta_changes against a hand-authored foreign log: commit 0
    add-only (inserts synthesized), commit 1 with a cdc action (used
    ALONE), commit 2 a compaction re-org (dataChange=false, silent),
    commit 3 a remove without change files (refuses loudly)."""
    import json as _json
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import pytest as _pytest

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_changes,
    )

    root = str(tmp_path / "dl")
    log = _os.path.join(root, "_delta_log")
    _os.makedirs(log)
    _os.makedirs(_os.path.join(root, "_change_data"))
    schema = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
        ],
    })
    f0 = "part-00000-aaaa-c000.snappy.parquet"
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int32()),
                  "v": pa.array(["a", "b"])}),
        _os.path.join(root, f0),
    )
    cdc1 = "_change_data/cdc-00000-bbbb.c000.snappy.parquet"
    pq.write_table(
        pa.table({"k": pa.array([2, 2], pa.int32()),
                  "v": pa.array(["b", "b2"]),
                  "_change_type": pa.array(
                      ["update_preimage", "update_postimage"])}),
        _os.path.join(root, cdc1),
    )
    f1 = "part-00001-cccc-c000.snappy.parquet"
    pq.write_table(
        pa.table({"k": pa.array([1, 2], pa.int32()),
                  "v": pa.array(["a", "b2"])}),
        _os.path.join(root, f1),
    )
    commits = [
        [  # v0: add-only
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 4}},
            {"metaData": {
                "id": "x", "format": {"provider": "parquet", "options": {}},
                "schemaString": schema, "partitionColumns": [],
                "configuration": {"delta.enableChangeDataFeed": "true"}}},
            {"add": {"path": f0, "partitionValues": {}, "size": 1,
                     "modificationTime": 1, "dataChange": True}},
            {"commitInfo": {"timestamp": 1700000000000,
                            "operation": "WRITE"}},
        ],
        [  # v1: UPDATE with a cdc action — changes come from it ALONE
            {"remove": {"path": f0, "deletionTimestamp": 2,
                        "dataChange": True}},
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 2, "dataChange": True}},
            {"cdc": {"path": cdc1, "partitionValues": {}, "size": 1,
                     "dataChange": False}},
            {"commitInfo": {"timestamp": 1700000100000,
                            "operation": "UPDATE"}},
        ],
        [  # v2: re-org, dataChange=false everywhere -> no changes
            {"remove": {"path": f1, "deletionTimestamp": 3,
                        "dataChange": False}},
            {"add": {"path": f1, "partitionValues": {}, "size": 1,
                     "modificationTime": 3, "dataChange": False}},
            {"commitInfo": {"timestamp": 1700000200000,
                            "operation": "OPTIMIZE"}},
        ],
        [  # v3: data removed without change files -> unknowable
            {"remove": {"path": f1, "deletionTimestamp": 4,
                        "dataChange": True}},
            {"commitInfo": {"timestamp": 1700000300000,
                            "operation": "DELETE"}},
        ],
    ]
    for v, actions in enumerate(commits):
        with open(_os.path.join(log, f"{v:020d}.json"), "w") as fh:
            fh.write("\n".join(_json.dumps(a) for a in actions) + "\n")

    feed = read_delta_changes(spark, root, 0, 2)
    got = sorted(
        (r._commit_version, r._change_type, r.k, r.v)
        for r in feed.collect()
    )
    assert got == [
        (0, "insert", 1, "a"),
        (0, "insert", 2, "b"),
        (1, "update_postimage", 2, "b2"),
        (1, "update_preimage", 2, "b"),
    ]
    with _pytest.raises(ValueError, match="unknowable"):
        read_delta_changes(spark, root, 3, 3).collect()


def test_timestamp_as_of_foreign_log(spark, tmp_path):
    """TIMESTAMP AS OF against a raw _delta_log: last version whose
    commitInfo timestamp <= the instant; pre-first-commit errors."""
    import json as _json
    import os as _os

    import pytest as _pytest

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_table,
        version_as_of_timestamp,
        write_delta_table,
    )

    root = str(tmp_path / "dl")
    write_delta_table(
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1),
        root,
    )
    write_delta_table(
        spark.createDataFrame([(2, "b")], "k int, v string").coalesce(1),
        root,
    )
    # pin deterministic commitInfo timestamps
    log = _os.path.join(root, "_delta_log")
    for v, ts in ((0, 1_700_000_000_000), (1, 1_700_000_100_000)):
        p = _os.path.join(log, f"{v:020d}.json")
        lines = []
        for line in open(p).read().splitlines():
            a = _json.loads(line)
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = ts
            lines.append(_json.dumps(a))
        open(p, "w").write("\n".join(lines))
    assert version_as_of_timestamp(root, 1_700_000_050_000) == 0
    assert version_as_of_timestamp(root, 1_700_000_100_000) == 1
    got = read_delta_table(spark, root, timestamp_ms=1_700_000_050_000)
    assert [r.k for r in got.collect()] == [1]
    with _pytest.raises(ValueError, match="predates"):
        version_as_of_timestamp(root, 1)
    with _pytest.raises(ValueError, match="not both"):
        read_delta_table(spark, root, version=1, timestamp_ms=5)


def test_cdf_read_serves_logical_names_under_column_mapping(spark, tmp_path):
    """read_delta_changes on a column-mapped log serves LOGICAL names,
    like the snapshot read — change files store physical columns."""
    import json as _json
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_changes,
    )

    root = str(tmp_path / "dl")
    log = _os.path.join(root, "_delta_log")
    _os.makedirs(log)
    schema = _json.dumps({
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True,
             "metadata": {"delta.columnMapping.id": 1,
                          "delta.columnMapping.physicalName": "col-x1"}},
        ],
    })
    f0 = "part-00000-aaaa-c000.snappy.parquet"
    pq.write_table(
        pa.table({"col-x1": pa.array([1, 2], pa.int32())}),
        _os.path.join(root, f0),
    )
    actions = [
        {"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}},
        {"metaData": {
            "id": "x", "format": {"provider": "parquet", "options": {}},
            "schemaString": schema, "partitionColumns": [],
            "configuration": {"delta.columnMapping.mode": "name",
                              "delta.enableChangeDataFeed": "true"}}},
        {"add": {"path": f0, "partitionValues": {}, "size": 1,
                 "modificationTime": 1, "dataChange": True}},
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
    ]
    with open(_os.path.join(log, "00000000000000000000.json"), "w") as fh:
        fh.write("\n".join(_json.dumps(a) for a in actions))
    feed = read_delta_changes(spark, root, 0, 0)
    assert "k" in feed.columns and "col-x1" not in feed.columns
    assert sorted(r.k for r in feed.collect()) == [1, 2]


def test_timestamp_as_of_reverse_scan_read_count(spark, tmp_path, monkeypatch):
    """r8 (verdict r7 #7): resolution walks newest->oldest and stops at
    the first qualifying commit — a recent timestamp costs O(1) commit
    reads, not O(commits)."""
    from hudi_and_delta_showcase_spark.tables import delta_log as dl
    from hudi_and_delta_showcase_spark.tables import fsio

    root = str(tmp_path / "dl")
    for i in range(6):
        dl.write_delta_table(
            spark.createDataFrame([(i, "x")], "k int, v string").coalesce(1),
            root,
        )
    # pin commit timestamps deterministically: version v at t0 + v*1000
    t0 = 1_700_000_000_000
    for v in range(6):
        cf = dl._commit_file(root, v)
        lines = []
        for line in fsio.read_text(cf).splitlines():
            a = json.loads(line)
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = t0 + v * 1000
            lines.append(json.dumps(a))
        fsio.write_atomic(cf, "\n".join(lines) + "\n")

    reads = []
    real = fsio.read_text

    def counting(p, *a, **k):
        if p.endswith(".json"):
            reads.append(p)
        return real(p, *a, **k)

    monkeypatch.setattr(dl.fsio, "read_text", counting)
    assert dl.version_as_of_timestamp(root, t0 + 5 * 1000 + 1) == 5
    assert len(reads) == 1  # newest commit qualifies immediately
    reads.clear()
    assert dl.version_as_of_timestamp(root, t0 + 2 * 1000 + 1) == 2
    assert len(reads) == 4  # 5,4,3 skipped, stop at 2
    reads.clear()
    with pytest.raises(ValueError, match="predates"):
        dl.version_as_of_timestamp(root, t0 - 1)


def test_write_v2_checkpoint_roundtrip(spark, tmp_path):
    """r8: the engine WRITES the V2 checkpoint spec too — UUID manifest
    + sidecar adds + checkpointMetadata + upgraded protocol — and its
    own reader (the same code path that accepts Databricks-authored V2
    checkpoints) serves the snapshot from it alone after the JSON
    commits expire."""
    import glob as _glob

    from hudi_and_delta_showcase_spark.tables import delta_log as dl

    root = str(tmp_path / "dl")
    dl.write_delta_table(
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
        .coalesce(1), root)
    dl.write_delta_table(
        spark.createDataFrame([(3, "c")], "k int, v string").coalesce(1),
        root)
    v = dl.write_checkpoint(spark, root, v2=True)
    assert v == 1
    log = os.path.join(root, "_delta_log")
    manifests = _glob.glob(
        os.path.join(log, "00000000000000000001.checkpoint.*.parquet"))
    assert len(manifests) == 1
    assert _glob.glob(os.path.join(log, "_sidecars", "*.parquet"))
    # expire the JSON commits: the V2 checkpoint is the only source
    for j in _glob.glob(os.path.join(log, "*.json")):
        os.remove(j)
    got = sorted(tuple(r)
                 for r in dl.read_delta_table(spark, root).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    cp = dl._read_checkpoint(root)
    assert "v2Checkpoint" in (cp[3] or {}).get("readerFeatures", [])
    # a rewritten checkpoint keeps the feature protocol (no downgrade)
    dl.write_delta_table(
        spark.createDataFrame([(4, "d")], "k int, v string").coalesce(1),
        root)
    dl.write_checkpoint(spark, root)  # classic rewrite on top
    cp2 = dl._read_checkpoint(root)
    assert cp2[0] == 2
    assert "v2Checkpoint" in (cp2[3] or {}).get("readerFeatures", [])
    got = sorted(tuple(r)
                 for r in dl.read_delta_table(spark, root).collect())
    assert got == [(1, "a"), (2, "b"), (3, "c"), (4, "d")]


def test_read_path_guards_reader_protocol(spark, tmp_path):
    """r8: the PLAIN READ path refuses unknown reader features too —
    previously only adoption guarded, so read_delta_table could
    silently mis-serve e.g. a variant-typed table."""
    from hudi_and_delta_showcase_spark.tables import delta_log as dl

    root = str(tmp_path / "dl")
    dl.write_delta_table(
        spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1),
        root)
    with open(os.path.join(root, "_delta_log",
                           "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["checkpointProtection"]}}) + "\n")
    with pytest.raises(RuntimeError, match="reader features"):
        dl.read_delta_table(spark, root).collect()
    # time travel BEFORE the upgrade still serves
    got = dl.read_delta_table(spark, root, version=0).collect()
    assert [tuple(r) for r in got] == [(1, "a")]


def test_read_delta_history_relation(spark, tmp_path):
    """r10: DESCRIBE HISTORY over a raw foreign log — per-commit
    operation and action tallies from the commit JSONs alone."""
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_history,
        write_delta_table,
    )

    root = str(tmp_path / "dl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    write_delta_table(df.coalesce(1), root)
    write_delta_table(
        spark.createDataFrame([(3, "c")], "k long, v string").coalesce(1),
        root, mode="overwrite",
    )
    rows = read_delta_history(spark, root).collect()
    assert [r.version for r in rows] == [0, 1]
    assert rows[0].num_added_files == 1 and rows[0].num_removed_files == 0
    assert rows[1].num_removed_files == 1  # the overwrite's removes
    assert all(
        r.num_data_change_added_files == r.num_added_files for r in rows
    )


def test_clustering_exports_domain_metadata(spark, tmp_path):
    """r11 (the Delta twin of the Iceberg sort-order export): an
    optimize(cluster_by=...) generation exports delta-spark's
    delta.clustering domain metadata under the clustering +
    domainMetadata writer features (writer-only: reader version
    untouched), and delta_clustering_columns reads it back."""
    import json as _json
    import os as _os

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        delta_clustering_columns,
        export_delta_log,
        read_delta_table,
    )

    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k int, v string"
    ).coalesce(2)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df,
                              key_cols=["k"])
    t.optimize(cluster_by=["k"], target_files=2)
    export_delta_log(t)
    assert delta_clustering_columns(t.path) == [["k"]]
    prot = None
    log = _os.path.join(t.path, "_delta_log")
    for fn in sorted(_os.listdir(log)):
        if fn.endswith(".json"):
            for line in open(_os.path.join(log, fn)):
                a = _json.loads(line)
                if "protocol" in a:
                    prot = a["protocol"]
    assert prot["minWriterVersion"] == 7
    assert {"clustering", "domainMetadata"} <= set(prot["writerFeatures"])
    assert prot["minReaderVersion"] == 1  # writer-only features
    # the log still reads fine (domainMetadata is replay-inert)
    assert read_delta_table(spark, t.path).count() == 40
    # unclustered tables declare nothing
    t2 = LakehouseTable.create(
        spark, str(tmp_path / "t2"),
        spark.createDataFrame([(1, "a")], "k int, v string"),
        key_cols=["k"],
    )
    export_delta_log(t2)
    assert delta_clustering_columns(t2.path) is None
