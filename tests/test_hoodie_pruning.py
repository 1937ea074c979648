"""Col-stats file pruning for foreign Hudi reads (r10, the Hudi leg of
the pruning triad — verdict r8/r9 #7's deferred half):
``export_hoodie_metadata`` materializes the engine manifest's col-stats
and row-count indexes as a real ``.hoodie/metadata`` table (``files`` +
``column_stats`` partitions), and ``read_hoodie_table(predicate=...)`` /
``read_hoodie_table_rt(predicate=...)`` prune base files / file groups
on those stats before the scan — files-read counts pinned pruned vs
unpruned, conservativeness pinned where stats are missing."""

from __future__ import annotations

import os

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable, fsio
from hudi_and_delta_showcase_spark.tables import hoodie_log as hl
from hudi_and_delta_showcase_spark.tables import hoodie_metadata as hm
from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
    append_log_commit,
    export_hoodie_timeline,
    latest_file_slices_rt,
    read_hoodie_table,
    read_hoodie_table_rt,
    write_hoodie_table,
)


def _engine_table(spark, path):
    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 20 else "b") for k in range(40)],
        "k int, v string, g string",
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, path, df, key_cols=["k"], partition_by="g"
    )
    export_hoodie_timeline(t)
    assert hm.export_hoodie_metadata(t) is not None
    return t


def _ktuples(df):
    return sorted((r.k, r.g) for r in df.select("k", "g").collect())


# ---------------------------------------------------------------------------
# engine export: metadata-table state
# ---------------------------------------------------------------------------


def test_export_writes_files_and_col_stats_state(spark, tmp_path):
    t = _engine_table(spark, str(tmp_path / "t"))
    c = t._commit(None)
    state = hm.read_hoodie_metadata_files(t.path)
    assert state is not None
    listed = {
        f"{p}/{n}" if p else n for p, fs in state.items() for n in fs
    }
    assert listed == set(c.files)
    # sizes come from the real files
    for p, fs in state.items():
        for n, size in fs.items():
            rel = f"{p}/{n}" if p else n
            assert size == fsio.file_size(fsio.join(t.path, rel))
    stats = hm.read_hoodie_metadata_col_stats(t.path)
    assert stats is not None
    for f in c.files:
        # engine exports key stats by RELATIVE path (partitioned
        # layouts can repeat a base name across partition dirs)
        assert stats[f]["k"]["min"] == c.col_stats[f]["k"][0]
        assert stats[f]["k"]["max"] == c.col_stats[f]["k"][1]
        assert stats[f]["g"]["min"] == c.col_stats[f]["g"][0]
        assert stats[f]["k"]["value_count"] == c.row_counts[f]
        # the write-sequence column's bounds are never exported
        assert "_hoodie_commit_seqno" not in stats[f]


def test_export_idempotent_and_tracks_upserts(spark, tmp_path):
    t = _engine_table(spark, str(tmp_path / "t"))
    assert hm.export_hoodie_metadata(t) is None  # unchanged: no-op
    t.upsert(spark.createDataFrame([(1, "v1x", "a")],
                                   "k int, v string, g string"))
    export_hoodie_timeline(t)
    assert hm.export_hoodie_metadata(t) is not None
    c = t._commit(None)
    state = hm.read_hoodie_metadata_files(t.path)
    listed = {
        f"{p}/{n}" if p else n for p, fs in state.items() for n in fs
    }
    assert listed == set(c.files)  # rewritten file gone, new file in
    # dropped files' stats tombstoned away too
    stats = hm.read_hoodie_metadata_col_stats(t.path)
    assert set(stats) == set(c.files)


# ---------------------------------------------------------------------------
# pruned reads: file-count pins + value equivalence
# ---------------------------------------------------------------------------


def test_pruned_read_scans_fewer_files(spark, tmp_path):
    t = _engine_table(spark, str(tmp_path / "t"))
    full = read_hoodie_table(spark, t.path)
    pruned = read_hoodie_table(
        spark, t.path, predicate=[("g", "=", "a")]
    )
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    assert _ktuples(pruned) == [(k, "a") for k in range(20)]
    assert _ktuples(pruned) == _ktuples(full.filter("g = 'a'"))
    # bounds pruning on a non-partition column
    pruned_k = read_hoodie_table(
        spark, t.path, predicate=[("k", ">=", 25)]
    )
    assert len(pruned_k.inputFiles()) < len(full.inputFiles())
    assert _ktuples(pruned_k) == [(k, "b") for k in range(25, 40)]


def test_pruned_to_empty_is_schema_stable(spark, tmp_path):
    t = _engine_table(spark, str(tmp_path / "t"))
    full = read_hoodie_table(spark, t.path)
    empty = read_hoodie_table(
        spark, t.path, predicate=[("k", ">", 10_000)]
    )
    assert empty.count() == 0
    assert empty.schema == full.schema


def test_predicate_without_metadata_table_scans_all(spark, tmp_path):
    """No metadata table -> no pruning, but the row filter still
    applies (conservative fallback, never an error)."""
    root = str(tmp_path / "ht")
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "k long, v string"
    )
    write_hoodie_table(df.coalesce(1), root)
    out = read_hoodie_table(spark, root, predicate=[("k", "=", 2)])
    assert [(r.k, r.v) for r in out.collect()] == [(2, "b")]


# ---------------------------------------------------------------------------
# foreign golden: Hudi wrapper unions, all-null columns, isDeleted merge
# ---------------------------------------------------------------------------


def _write_cs_commit(root, instant, records, version=1):
    md = os.path.join(root, ".hoodie", "metadata")
    cs = os.path.join(md, "column_stats")
    os.makedirs(cs, exist_ok=True)
    os.makedirs(os.path.join(md, ".hoodie"), exist_ok=True)
    blob = hl.avro_data_block(records, hm.COL_STATS_SCHEMA, instant)
    hl.write_log_file(
        os.path.join(cs, hl.log_file_name(
            "col-stats-0000", "00000000000000", version=version)),
        [blob],
    )
    open(os.path.join(md, ".hoodie", f"{instant}.deltacommit"),
         "w").close()


def _cs(fname, col, mn, mx, vc=None, nc=None, deleted=False):
    return {
        "key": f"{col}/{fname}", "type": 3,
        "ColumnStatsMetadata": {
            "fileName": fname, "columnName": col,
            "minValue": None if mn is None else {"value": mn},
            "maxValue": None if mx is None else {"value": mx},
            "valueCount": vc, "nullCount": nc, "isDeleted": deleted,
        },
    }


def test_foreign_wrapper_decode_all_null_and_tombstone(tmp_path):
    root = str(tmp_path / "ht")
    _write_cs_commit(root, "001", [
        _cs("f1.parquet", "k", 1, 9, vc=10, nc=0),
        _cs("f1.parquet", "name", "alpha", "omega"),
        _cs("f1.parquet", "score", 0.5, 2.5),
        _cs("f1.parquet", "dead_col", None, None, vc=10, nc=10),
    ], version=1)
    # a later commit tombstones one column's stats and tightens another
    _write_cs_commit(root, "002", [
        _cs("f1.parquet", "score", None, None, deleted=True),
        _cs("f1.parquet", "k", 2, 8, vc=10, nc=0),
    ], version=2)
    stats = hm.read_hoodie_metadata_col_stats(root)
    assert stats["f1.parquet"]["k"] == {
        "min": 2, "max": 8, "null_count": 0, "value_count": 10,
    }
    assert stats["f1.parquet"]["name"]["min"] == "alpha"
    assert "score" not in stats["f1.parquet"]
    # interval logic: int bounds prune, string bounds prune, the
    # all-null column refutes every comparison
    assert not hm.file_can_match("f1.parquet", stats, [("k", ">", 8)])
    assert hm.file_can_match("f1.parquet", stats, [("k", "=", 5)])
    assert not hm.file_can_match(
        "f1.parquet", stats, [("name", "<", "aa")]
    )
    assert not hm.file_can_match(
        "f1.parquet", stats, [("dead_col", "=", 1)]
    )
    # type-mismatched comparison proves nothing -> conservative
    assert hm.file_can_match("f1.parquet", stats, [("k", "=", "x")])
    # unknown file -> conservative
    assert hm.file_can_match("other.parquet", stats, [("k", ">", 99)])


def test_wrapper_union_keeps_width(tmp_path):
    """Regression (r10 review finding): the wrapper-union encoder must
    prefer double over float and long over int — a float64 bound
    squeezed through FloatWrapper loses precision and then MIS-PRUNES
    (16777217.0 round-trips as 16777216.0 via float32), and a >int32
    long in IntWrapper is schema-invalid Avro."""
    import io

    from hudi_and_delta_showcase_spark import avro_ocf

    def roundtrip(val):
        rec = {"key": "k", "type": 3, "ColumnStatsMetadata": {
            "fileName": "f", "columnName": "c",
            "minValue": {"value": val}, "maxValue": {"value": val},
            "valueCount": None, "nullCount": None, "isDeleted": False}}
        buf = io.BytesIO()
        avro_ocf._encode(hm.COL_STATS_SCHEMA, rec, buf)
        out = avro_ocf._decode(
            hm.COL_STATS_SCHEMA, avro_ocf._Reader(buf.getvalue())
        )
        return hm._unwrap(out["ColumnStatsMetadata"]["minValue"])

    for v in (16777217.0, 2**40, 1.5, 7, "x", True, b"\x01"):
        got = roundtrip(v)
        assert got == v and type(got) is type(v), (v, got)


def test_hfile_compacted_col_stats_fall_back(tmp_path):
    root = str(tmp_path / "ht")
    _write_cs_commit(root, "001", [_cs("f1.parquet", "k", 1, 9)])
    cs = os.path.join(root, ".hoodie", "metadata", "column_stats")
    open(os.path.join(
        cs, "col-stats-0000_0-0-0_001.hfile"), "wb").write(b"HF")
    assert hm.read_hoodie_metadata_col_stats(root) is None


# ---------------------------------------------------------------------------
# hive-style partition-path pruning (no col-stats index needed)
# ---------------------------------------------------------------------------


def test_partition_path_values_and_interval_logic():
    vals = hm.partition_path_values(
        "g=a/n=7/2024/01/x%20y=sp%20ace/fid_0-0-0_1.parquet"
    )
    assert vals == {"g": "a", "n": "7", "x y": "sp ace"}
    assert hm.partition_path_values("fid_0-0-0_1.parquet") == {}
    # the hive null marker refutes every comparison on that column
    nulls = hm.partition_path_values(
        "g=__HIVE_DEFAULT_PARTITION__/f.parquet"
    )
    assert nulls == {"g": None}
    assert not hm.path_can_match(
        "g=__HIVE_DEFAULT_PARTITION__/f.parquet", [("g", "=", "a")]
    )
    # typed comparison: int predicate vs string segment
    assert not hm.path_can_match("n=7/f.parquet", [("n", ">", 10)])
    assert hm.path_can_match("n=7/f.parquet", [("n", "<=", 10)])
    # unparseable segment for the predicate's type proves nothing
    assert hm.path_can_match("n=abc/f.parquet", [("n", ">", 10)])
    # bool predicate values never prune (casing ambiguity)
    assert hm.path_can_match("b=true/f.parquet", [("b", "=", False)])
    # 'in' op uses the element type
    assert not hm.path_can_match("n=7/f.parquet", [("n", "in", [1, 2])])
    assert hm.path_can_match("n=2/f.parquet", [("n", "in", [1, 2])])


def _hive_foreign_tree(tmp_path, keygen=
                       "org.apache.hudi.keygen.SimpleKeyGenerator"):
    """Hand-authored hive-partitioned foreign CoW tree: two partitions,
    one base file each, one completed commit."""
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ht")
    i1 = "20240101000000001"
    os.makedirs(os.path.join(root, ".hoodie"))
    stats = {}
    for part, ks in (("g=a", [1, 2]), ("g=b", [11, 12])):
        os.makedirs(os.path.join(root, part))
        rel = f"{part}/fid{part[-1]}_0-0-0_{i1}.parquet"
        pq.write_table(
            pa.table({
                "k": pa.array(ks, pa.int64()),
                "v": pa.array([f"v{k}" for k in ks]),
                "g": pa.array([part[-1]] * len(ks)),
            }),
            os.path.join(root, rel),
        )
        stats[part] = [{"fileId": f"fid{part[-1]}", "path": rel,
                        "prevCommit": "null", "numWrites": len(ks),
                        "fileSizeInBytes": 1}]
    meta = {"partitionToWriteStats": stats, "compacted": False,
            "extraMetadata": {}, "operationType": "INSERT"}
    with open(os.path.join(root, ".hoodie", f"{i1}.commit"), "w") as fh:
        json.dump(meta, fh)
    props = {
        "hoodie.table.name": "ht",
        "hoodie.table.type": "COPY_ON_WRITE",
        "hoodie.table.keygenerator.class": keygen,
    }
    with open(os.path.join(root, ".hoodie", "hoodie.properties"),
              "w") as fh:
        fh.write("".join(f"{k}={v}\n" for k, v in props.items()))
    return root


def test_hive_path_pruning_identity_keygen(spark, tmp_path):
    root = _hive_foreign_tree(tmp_path)
    full = read_hoodie_table(spark, root)
    pruned = read_hoodie_table(spark, root, predicate=[("g", "=", "a")])
    assert len(pruned.inputFiles()) == 1 < len(full.inputFiles())
    assert sorted((r.k, r.v) for r in pruned.collect()) == [
        (1, "v1"), (2, "v2")
    ]


def test_hive_path_pruning_gated_on_keygen(spark, tmp_path):
    """A timestamp key generator TRANSFORMS the column into the path —
    its segments must never prune (the row filter still applies)."""
    root = _hive_foreign_tree(
        tmp_path,
        keygen="org.apache.hudi.keygen.TimestampBasedKeyGenerator",
    )
    pruned = read_hoodie_table(spark, root, predicate=[("g", "=", "a")])
    assert len(pruned.inputFiles()) == 2  # unpruned scan
    assert sorted((r.k, r.v) for r in pruned.collect()) == [
        (1, "v1"), (2, "v2")
    ]


# ---------------------------------------------------------------------------
# MoR realtime view: file-group granularity, conservative with logs
# ---------------------------------------------------------------------------


def _foreign_mor_tree(spark, root):
    """Two base file groups; group A gets a log update raising one
    row's sq to 150. Col stats cover both bases; the log file's stats
    arrive (or not) per test."""
    from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro

    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (11, "x", 100), (12, "y", 100)],
        "k long, v string, sq long",
    ).repartitionByRange(2, "k")
    write_hoodie_table(base, root)
    slices = latest_file_slices_rt(root)
    by_min = {}
    for fid, s in slices.items():
        ks = [
            r.k for r in spark.read.parquet(
                fsio.join(root, s["base"])).collect()
        ]
        by_min[min(ks)] = (fid, s)
    fid_a, s_a = by_min[1]
    schema = spark_schema_to_avro(base.schema)
    append_log_commit(
        root, fid_a, s_a["base_instant"],
        [{"k": 2, "v": "b2", "sq": 150}], schema,
    )
    slices = latest_file_slices_rt(root)
    log_a = slices[fid_a]["logs"][0].rpartition("/")[2]
    base_a = s_a["base"].rpartition("/")[2]
    base_b = by_min[11][1]["base"].rpartition("/")[2]
    return base_a, log_a, base_b


def test_rt_group_pruning_conservative_then_pruned(spark, tmp_path):
    root = str(tmp_path / "ht")
    base_a, log_a, base_b = _foreign_mor_tree(spark, root)
    # stats for both bases only: group A's log has NO stats, so a
    # predicate disjoint with base A must still scan group A
    _write_cs_commit(root, "0md1", [
        _cs(base_a, "sq", 100, 100, vc=2, nc=0),
        _cs(base_b, "sq", 100, 100, vc=2, nc=0),
    ], version=1)
    rt = read_hoodie_table_rt(
        spark, root, key_fields=["k"], precombine="sq",
        predicate=[("sq", ">", 120)],
    )
    got = sorted((r.k, r.v, r.sq) for r in rt.collect())
    assert got == [(2, "b2", 150)]  # the log row survives the filter
    assert any(base_a in f for f in rt.inputFiles())
    # now the log file's stats land too: group B (base-only, disjoint)
    # prunes; group A stays because its log CAN match
    _write_cs_commit(root, "0md2", [
        _cs(log_a, "sq", 150, 150, vc=1, nc=0),
    ], version=2)
    rt2 = read_hoodie_table_rt(
        spark, root, key_fields=["k"], precombine="sq",
        predicate=[("sq", ">", 120)],
    )
    got2 = sorted((r.k, r.v, r.sq) for r in rt2.collect())
    assert got2 == [(2, "b2", 150)]
    assert not any(base_b in f for f in rt2.inputFiles())
    # fully disjoint predicate: every group prunes, one base survives
    # as the schema anchor, result is empty but schema-stable
    rt3 = read_hoodie_table_rt(
        spark, root, key_fields=["k"], precombine="sq",
        predicate=[("sq", ">", 9000)],
    )
    assert rt3.count() == 0
    assert rt3.schema == rt2.schema


def test_rt_post_merge_filter_not_pre_merge(spark, tmp_path):
    """A log update that moves a row OUT of the predicate range must
    shadow the in-range base row — pinned by filtering post-merge."""
    from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro

    root = str(tmp_path / "ht")
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100)], "k long, v string, sq long"
    )
    write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = latest_file_slices_rt(root).items()
    schema = spark_schema_to_avro(base.schema)
    append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 1, "v": "moved", "sq": 500}], schema,
    )
    out = read_hoodie_table_rt(
        spark, root, key_fields=["k"], precombine="sq",
        predicate=[("sq", "<=", 100)],
    )
    got = sorted((r.k, r.v) for r in out.collect())
    # k=1's latest version has sq=500: excluded; the stale base row
    # (sq=100) must NOT resurrect
    assert got == [(2, "b")]


# ---------------------------------------------------------------------------
# r11: timestamp-keygen date-tree partition-path pruning
# ---------------------------------------------------------------------------


def _date_tree_foreign(tmp_path, fmt="yyyy/MM/dd", declare_fmt=True):
    """Hand-authored TimestampBasedKeyGenerator CoW tree: the classic
    Hudi date-tree layout — partition path = formatted ts."""
    import datetime as dt
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    root = str(tmp_path / "ht")
    i1 = "20240101000000001"
    os.makedirs(os.path.join(root, ".hoodie"))
    stats = {}
    days = {"2024/01/05": [1, 2], "2024/01/20": [11, 12]}
    if fmt == "yyyy-MM-dd":
        days = {"2024-01-05": [1, 2], "2024-01-20": [11, 12]}
    for part, ks in days.items():
        os.makedirs(os.path.join(root, part))
        fid = f"fid{ks[0]}"
        rel = f"{part}/{fid}_0-0-0_{i1}.parquet"
        day = int(part.replace("/", "-")[8:10])
        pq.write_table(
            pa.table({
                "k": pa.array(ks, pa.int64()),
                "ts": pa.array(
                    [dt.datetime(2024, 1, day, 12, 0)] * len(ks),
                    pa.timestamp("us"),
                ),
            }),
            os.path.join(root, rel),
        )
        stats[part] = [{"fileId": fid, "path": rel,
                        "prevCommit": "null", "numWrites": len(ks),
                        "fileSizeInBytes": 1}]
    meta = {"partitionToWriteStats": stats, "compacted": False,
            "extraMetadata": {}, "operationType": "INSERT"}
    with open(os.path.join(root, ".hoodie", f"{i1}.commit"), "w") as fh:
        json.dump(meta, fh)
    props = {
        "hoodie.table.name": "ht",
        "hoodie.table.type": "COPY_ON_WRITE",
        "hoodie.table.keygenerator.class":
            "org.apache.hudi.keygen.TimestampBasedKeyGenerator",
        "hoodie.table.partition.fields": "ts",
    }
    if declare_fmt:
        props["hoodie.keygen.timebased.output.dateformat"] = fmt
    with open(os.path.join(root, ".hoodie", "hoodie.properties"),
              "w") as fh:
        fh.write("".join(f"{k}={v}\n" for k, v in props.items()))
    return root


def test_timestamp_keygen_date_tree_prunes(spark, tmp_path):
    """r11: a declared TimestampBasedKeyGenerator output format makes
    the date-tree path prunable — a ts range projects through strftime
    and compares lexicographically."""
    root = _date_tree_foreign(tmp_path)
    full = read_hoodie_table(spark, root)
    assert len(full.inputFiles()) == 2
    pruned = read_hoodie_table(
        spark, root, predicate="ts >= TIMESTAMP '2024-01-10'"
    )
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [11, 12]
    # strict < at an exact day boundary excludes the boundary day
    lt = read_hoodie_table(
        spark, root, predicate="ts < TIMESTAMP '2024-01-20'"
    )
    assert len(lt.inputFiles()) == 1
    assert sorted(r.k for r in lt.collect()) == [1, 2]


def test_timestamp_keygen_dashed_format_prunes(spark, tmp_path):
    root = _date_tree_foreign(tmp_path, fmt="yyyy-MM-dd")
    pruned = read_hoodie_table(
        spark, root, predicate="ts >= TIMESTAMP '2024-01-10'"
    )
    assert len(pruned.inputFiles()) == 1
    assert sorted(r.k for r in pruned.collect()) == [11, 12]


def test_timestamp_keygen_without_format_never_prunes(spark, tmp_path):
    """No declared output format -> the path value is unattributable:
    scan everything, row filter still exact."""
    root = _date_tree_foreign(tmp_path, declare_fmt=False)
    pruned = read_hoodie_table(
        spark, root, predicate="ts >= TIMESTAMP '2024-01-10'"
    )
    assert len(pruned.inputFiles()) == 2
    assert sorted(r.k for r in pruned.collect()) == [11, 12]


def test_keygen_type_enum_gates(tmp_path):
    """0.14+ tables declare hoodie.table.keygenerator.type instead of
    (or alongside) the class — both spellings gate path pruning."""
    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        hive_path_pruning_ok,
        timestamp_path_pruner,
    )

    assert hive_path_pruning_ok({"hoodie.table.keygenerator.type": "SIMPLE"})
    assert not hive_path_pruning_ok(
        {"hoodie.table.keygenerator.type": "TIMESTAMP"}
    )
    assert not hive_path_pruning_ok({})
    assert timestamp_path_pruner({
        "hoodie.table.keygenerator.type": "TIMESTAMP",
        "hoodie.keygen.timebased.output.dateformat": "yyyy-MM-dd",
        "hoodie.table.partition.fields": "ts",
    }) == ("ts", "%Y-%m-%d", None)
    # epoch-numeric / unknown output formats never prune
    assert timestamp_path_pruner({
        "hoodie.table.keygenerator.type": "TIMESTAMP",
        "hoodie.keygen.timebased.output.dateformat": "unix",
        "hoodie.table.partition.fields": "ts",
    }) is None
    # a declared non-UTC output timezone disables path pruning: the
    # tree's wall dates are shifted from what the reader projects
    assert timestamp_path_pruner({
        "hoodie.table.keygenerator.type": "TIMESTAMP",
        "hoodie.keygen.timebased.output.dateformat": "yyyy-MM-dd",
        "hoodie.keygen.timebased.output.timezone": "America/Los_Angeles",
        "hoodie.table.partition.fields": "ts",
    }) is None
    # ...but UTC spellings keep it, and the declared epoch unit rides
    # along for integer-literal projection
    assert timestamp_path_pruner({
        "hoodie.table.keygenerator.type": "TIMESTAMP",
        "hoodie.keygen.timebased.output.dateformat": "yyyy-MM-dd",
        "hoodie.keygen.timebased.output.timezone": "UTC",
        "hoodie.keygen.timebased.timestamp.type": "EPOCHMILLISECONDS",
        "hoodie.table.partition.fields": "ts",
    }) == ("ts", "%Y-%m-%d", "EPOCHMILLISECONDS")


def test_ts_path_int_literals_respect_timestamp_type():
    """r12 advice fix (high): an integer literal's epoch unit comes
    from hoodie.keygen.timebased.timestamp.type — NOT an assumed
    micros. With no declared type, integer literals prove nothing
    (scan); with EPOCHMILLISECONDS, 2024-01-10T00:00Z millis keeps the
    2024/01/10 partition and prunes a disjoint one; assuming micros
    would have projected the same literal to 1970 and wrongly pruned
    the matching partition."""
    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        ts_path_can_match,
    )

    millis = 1704844800000  # 2024-01-10T00:00:00Z in epoch millis
    conj = [("ts", "=", millis)]
    # undeclared unit: prove nothing either way
    pruner = ("ts", "%Y/%m/%d", None)
    assert ts_path_can_match("2024/01/10/f.parquet", conj, pruner)
    assert ts_path_can_match("2024/01/11/f.parquet", conj, pruner)
    # declared millis: keep the matching day, prune the disjoint one
    pruner = ("ts", "%Y/%m/%d", "EPOCHMILLISECONDS")
    assert ts_path_can_match("2024/01/10/f.parquet", conj, pruner)
    assert not ts_path_can_match("2024/01/11/f.parquet", conj, pruner)
    # UNIX_TIMESTAMP is epoch SECONDS in Hudi's vocabulary
    pruner = ("ts", "%Y/%m/%d", "UNIX_TIMESTAMP")
    conj_s = [("ts", "=", millis // 1000)]
    assert ts_path_can_match("2024/01/10/f.parquet", conj_s, pruner)
    assert not ts_path_can_match("2024/01/11/f.parquet", conj_s, pruner)
    # SCALAR / DATE_STRING units are table-config-relative: scan
    pruner = ("ts", "%Y/%m/%d", "SCALAR")
    assert ts_path_can_match("2024/01/11/f.parquet", conj, pruner)
    # non-integer literals project under ANY declared type
    from datetime import datetime

    conj_dt = [("ts", "=", datetime(2024, 1, 10))]
    pruner = ("ts", "%Y/%m/%d", None)
    assert ts_path_can_match("2024/01/10/f.parquet", conj_dt, pruner)
    assert not ts_path_can_match("2024/01/11/f.parquet", conj_dt, pruner)


def test_ts_path_shape_gate_never_prunes_foreign_dirs():
    """r12 advice fix (high): partition directories not shaped like
    the declared output format — hive-style ``ts=...`` dirs, foreign
    layouts — are scanned, never pruned. Before the fix,
    'ts=2024-01-10' compared lexicographically against '2024-01-10'
    and =/<=/< predicates pruned EVERY file."""
    from datetime import datetime

    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        ts_path_can_match,
    )

    pruner = ("ts", "%Y-%m-%d", None)
    conj = [("ts", "=", datetime(2024, 1, 10))]
    # hive-style dir: shape mismatch -> scan (True), even though the
    # lexicographic comparison would claim disjoint
    assert ts_path_can_match("ts=2024-01-10/f.parquet", conj, pruner)
    assert ts_path_can_match("ts=2024-01-11/f.parquet", conj, pruner)
    # arbitrary foreign dir names: scan
    assert ts_path_can_match("batch_007/f.parquet", conj, pruner)
    assert ts_path_can_match("2024-1-9/f.parquet", conj, pruner)
    # correctly-shaped dirs still prune on range ops
    conj_le = [("ts", "<", datetime(2024, 1, 10))]
    assert ts_path_can_match("2024-01-09/f.parquet", conj_le, pruner)
    assert not ts_path_can_match("2024-01-10/f.parquet", conj_le, pruner)
    assert not ts_path_can_match("2024-01-11/f.parquet", conj_le, pruner)
