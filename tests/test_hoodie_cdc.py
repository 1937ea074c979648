"""Hudi CHANGE DATA CAPTURE read (r10): CDC_DATA log blocks (RFC-51
``hoodie.table.cdc.enabled`` supplemental logging, DATA_BEFORE_AFTER
mode) serve as a real change feed — Delta CDF's exact taxonomy
(insert / update_preimage / update_postimage / delete), executor-side
decode, O(changes) IO, rollback/validity rules shared with the data
merge."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.avro_ocf import spark_schema_to_avro
from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables import hoodie_log as hl
from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
    append_log_commit,
    latest_file_slices_rt,
    read_hoodie_changes,
    read_hoodie_table_rt,
    write_hoodie_table,
)


def _tree(spark, root):
    """Foreign MoR table with one CDC-logged delta commit: k=2 updated,
    k=4 inserted, k=3 deleted."""
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "c", 100)],
        "k long, v string, sq long",
    )
    write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = latest_file_slices_rt(root).items()
    schema = spark_schema_to_avro(base.schema)
    instant = append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 2, "v": "b2", "sq": 101}, {"k": 4, "v": "d", "sq": 100}],
        schema,
        deletes=[{"recordKey": "k:3"}],
        cdc_records=[
            {"op": "u", "ts_ms": "1",
             "before": {"k": 2, "v": "b", "sq": 100},
             "after": {"k": 2, "v": "b2", "sq": 101}},
            {"op": "i", "ts_ms": "1", "before": None,
             "after": {"k": 4, "v": "d", "sq": 100}},
            {"op": "d", "ts_ms": "1",
             "before": {"k": 3, "v": "c", "sq": 100}, "after": None},
        ],
    )
    return fid, s, schema, instant


def test_cdc_changes_match_delta_cdf_taxonomy(spark, tmp_path):
    root = str(tmp_path / "ht")
    _tree(spark, root)
    ch = read_hoodie_changes(spark, root)
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in ch.select("k", "v", "_change_type").collect()
    )
    assert got == [
        (2, "b", "update_preimage"),
        (2, "b2", "update_postimage"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]
    # the CDC block does not disturb the data merge (RT view exact)
    rt = read_hoodie_table_rt(spark, root, key_fields=["k"],
                              precombine="sq")
    assert sorted((r.k, r.v) for r in rt.collect()) == [
        (1, "a"), (2, "b2"), (4, "d")
    ]


def test_cdc_instant_range_filters(spark, tmp_path):
    root = str(tmp_path / "ht")
    fid, s, schema, i1 = _tree(spark, root)
    i2 = append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 5, "v": "e", "sq": 100}], schema,
        cdc_records=[{"op": "i", "ts_ms": "2", "before": None,
                      "after": {"k": 5, "v": "e", "sq": 100}}],
    )
    tail = read_hoodie_changes(spark, root, begin_instant=i1)
    assert [(r.k, r._change_type, r._commit_instant)
            for r in tail.collect()] == [(5, "insert", i2)]
    upto = read_hoodie_changes(spark, root, end_instant=i1)
    assert sorted(r.k for r in upto.collect()) == [2, 2, 3, 4]


def test_cdc_uncommitted_instant_invisible(spark, tmp_path):
    """A CDC block from an instant that never completed is skipped —
    the same validity rule as the data merge."""
    root = str(tmp_path / "ht")
    fid, s, schema, _ = _tree(spark, root)
    slices = latest_file_slices_rt(root)
    log_rel = slices[fid]["logs"][-1]
    blob = fsio.read_bytes(fsio.join(root, log_rel))
    torn = hl.cdc_data_block(
        [{"op": "i", "ts_ms": "9", "before": None,
          "after": {"k": 99, "v": "torn", "sq": 1}}],
        hl.cdc_avro_schema(schema),
        "20990101000000000",  # no completed instant file
    )
    fsio.write_bytes_atomic(fsio.join(root, log_rel), blob + torn)
    ch = read_hoodie_changes(spark, root)
    assert 99 not in {r.k for r in ch.collect()}


def test_cdc_unknown_op_refuses(spark, tmp_path):
    root = str(tmp_path / "ht")
    fid, s, schema, _ = _tree(spark, root)
    append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 6, "v": "f", "sq": 100}], schema,
        cdc_records=[{"op": "x", "ts_ms": "3", "before": None,
                      "after": {"k": 6, "v": "f", "sq": 100}}],
    )
    with pytest.raises(Exception, match="unknown cdc op"):
        read_hoodie_changes(spark, root).collect()


def test_no_log_commits_in_range_refuses(spark, tmp_path):
    root = str(tmp_path / "ht")
    base = spark.createDataFrame([(1, "a")], "k long, v string")
    write_hoodie_table(base.coalesce(1), root)
    with pytest.raises(ValueError, match="no log-bearing commits"):
        read_hoodie_changes(spark, root)


def _mode_tree(spark, root, mode):
    """Foreign MoR table whose CDC commit logs in a KEY-ONLY RFC-51
    mode: k=2 updated, k=4 inserted, k=3 deleted — same logical change
    set as `_tree`, so every mode must serve the same taxonomy."""
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "b", 100), (3, "c", 100)],
        "k long, v string, sq long",
    )
    write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = latest_file_slices_rt(root).items()
    schema = spark_schema_to_avro(base.schema)
    if mode == "OP_KEY_ONLY":
        cdc_schema = hl.cdc_avro_schema_key_only()
        recs = [
            {"op": "u", "recordKey": "2"},
            {"op": "i", "recordKey": "4"},
            {"op": "d", "recordKey": "3"},
        ]
    else:  # DATA_BEFORE
        cdc_schema = hl.cdc_avro_schema_data_before(schema)
        recs = [
            {"op": "u", "recordKey": "2",
             "before": {"k": 2, "v": "b", "sq": 100}},
            {"op": "i", "recordKey": "4", "before": None},
            {"op": "d", "recordKey": "3",
             "before": {"k": 3, "v": "c", "sq": 100}},
        ]
    instant = append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 2, "v": "b2", "sq": 101}, {"k": 4, "v": "d", "sq": 100}],
        schema,
        deletes=[{"recordKey": "k:3"}],
        cdc_records=recs, cdc_schema=cdc_schema,
    )
    return instant


@pytest.mark.parametrize("mode", ["OP_KEY_ONLY", "DATA_BEFORE"])
def test_key_only_modes_synthesize_images(spark, tmp_path, mode):
    """r11 (verdict #4): OP_KEY_ONLY / DATA_BEFORE supplemental logging
    serves the SAME Delta-CDF taxonomy as DATA_BEFORE_AFTER — missing
    images synthesize by semi-joining record keys against the pre-/
    post-instant snapshots."""
    root = str(tmp_path / "ht")
    _mode_tree(spark, root, mode)
    ch = read_hoodie_changes(spark, root, key_fields=["k"])
    got = sorted(
        (r.k, r.v, r._change_type)
        for r in ch.select("k", "v", "_change_type").collect()
    )
    assert got == [
        (2, "b", "update_preimage"),
        (2, "b2", "update_postimage"),
        (3, "c", "delete"),
        (4, "d", "insert"),
    ]


def test_key_only_first_instant_delete_refuses(spark, tmp_path):
    """A before-image synthesis with no prior snapshot is inconsistent
    CDC state — refuse loudly rather than serve an empty image."""
    import os

    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        _completed_instants,
    )

    root = str(tmp_path / "ht")
    _mode_tree(spark, root, "OP_KEY_ONLY")
    # erase the base commit's completed instant marker so the CDC
    # commit becomes the first completed instant
    first = _completed_instants(root)[0][0]
    hdir = os.path.join(root, ".hoodie")
    for f in sorted(os.listdir(hdir)):
        if f.startswith(first + ".") and "inflight" not in f \
                and "requested" not in f:
            os.remove(os.path.join(hdir, f))
    with pytest.raises(Exception, match="no prior snapshot|no base"):
        read_hoodie_changes(spark, root, key_fields=["k"]).collect()


def test_cdc_predicate_filters_rows(spark, tmp_path):
    """r11 (verdict #5): read_hoodie_changes takes the shared tuple/SQL
    predicate — the row filter applies to both change sides."""
    root = str(tmp_path / "ht")
    _tree(spark, root)
    ch = read_hoodie_changes(spark, root, predicate="k <= 3")
    got = sorted(
        (r.k, r._change_type)
        for r in ch.select("k", "_change_type").collect()
    )
    assert got == [
        (2, "update_postimage"), (2, "update_preimage"), (3, "delete")
    ]


def test_key_only_batched_synthesis_multi_instant(spark, tmp_path, monkeypatch):
    """r12 (verdict #2): key-only image synthesis is BATCHED — one
    multi-version plan resolves every (instant, side), never a
    read_hoodie_table_rt snapshot per group — and stays exact across
    instants: the preimage of the THIRD commit is the SECOND commit's
    value (an intermediate version no final snapshot contains)."""
    from hudi_and_delta_showcase_spark.tables import hoodie_timeline as ht

    root = str(tmp_path / "ht")
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "x", 100)], "k long, v string, sq long"
    )
    write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = latest_file_slices_rt(root).items()
    schema = spark_schema_to_avro(base.schema)
    ko = hl.cdc_avro_schema_key_only()
    i2 = append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 1, "v": "b", "sq": 101}], schema,
        cdc_records=[{"op": "u", "recordKey": "1"}], cdc_schema=ko,
    )
    i3 = append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 1, "v": "c", "sq": 102}], schema,
        cdc_records=[{"op": "u", "recordKey": "1"}], cdc_schema=ko,
    )

    calls = []
    orig = ht.read_hoodie_table_rt

    def spy(*a, **kw):
        calls.append(1)
        return orig(*a, **kw)

    monkeypatch.setattr(ht, "read_hoodie_table_rt", spy)
    ch = ht.read_hoodie_changes(spark, root, key_fields=["k"])
    got = sorted(
        (r._commit_instant, r._change_type, r.v)
        for r in ch.select("_commit_instant", "_change_type", "v")
        .collect()
    )
    assert got == [
        (i2, "update_postimage", "b"),
        (i2, "update_preimage", "a"),
        (i3, "update_postimage", "c"),
        (i3, "update_preimage", "b"),  # the INTERMEDIATE version
    ]
    # the plan-count pin: zero per-(instant, side) snapshot builds
    assert calls == []


def _compact_file_group(spark, root, fid, rows, schema_ddl):
    """Author a foreign COMPACTION for ``fid``: a new base parquet at a
    fresh instant (closes every open log/base version of the group in
    slice resolution) plus its completed ``.commit`` instant."""
    import json
    import os

    from hudi_and_delta_showcase_spark.tables import manifest as mf

    instant = mf.make_commit_time()
    staging = os.path.join(root, ".staging-compact")
    spark.createDataFrame(rows, schema_ddl).coalesce(1).write.parquet(
        staging
    )
    (part,) = [f for f in os.listdir(staging) if f.endswith(".parquet")]
    new_name = f"{fid}_0-1-0_{instant}.parquet"
    os.replace(os.path.join(staging, part), os.path.join(root, new_name))
    meta = {
        "partitionToWriteStats": {
            "": [{
                "fileId": fid, "path": new_name, "prevCommit": "null",
                "numWrites": len(rows),
                "fileSizeInBytes": os.path.getsize(
                    os.path.join(root, new_name)
                ),
            }]
        },
        "compacted": True,
        "extraMetadata": {},
        "operationType": "COMPACT",
    }
    hdir = os.path.join(root, ".hoodie")
    with open(os.path.join(hdir, f"{instant}.commit"), "w") as fh:
        json.dump(meta, fh)
    return instant


def test_key_only_logs_across_compaction(spark, tmp_path):
    """Regression (r13 ADVICE high): the multi-version key-only
    synthesis passes ONE shared data_schema into read_log_records_df
    once per validity group; StructType.add used to mutate it in
    place, so a table with log-bearing groups BOTH before and after a
    compaction appended _hl_* fields twice and the whole read failed
    with duplicate columns. Two log groups + exact intermediate
    images is the pin."""
    root = str(tmp_path / "ht")
    base = spark.createDataFrame(
        [(1, "a", 100)], "k long, v string, sq long"
    )
    write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = latest_file_slices_rt(root).items()
    schema = spark_schema_to_avro(base.schema)
    ko = hl.cdc_avro_schema_key_only()
    i2 = append_log_commit(
        root, fid, s["base_instant"],
        [{"k": 1, "v": "b", "sq": 101}], schema,
        cdc_records=[{"op": "u", "recordKey": "1"}], cdc_schema=ko,
    )
    _compact_file_group(
        spark, root, fid, [(1, "b", 101)], "k long, v string, sq long"
    )
    ((fid2, s2),) = latest_file_slices_rt(root).items()
    assert s2["logs"] == []  # the compaction really closed the logs
    i4 = append_log_commit(
        root, fid2, s2["base_instant"],
        [{"k": 1, "v": "c", "sq": 102}], schema,
        cdc_records=[{"op": "u", "recordKey": "1"}], cdc_schema=ko,
    )
    ch = read_hoodie_changes(spark, root, key_fields=["k"])
    got = sorted(
        (r._commit_instant, r._change_type, r.v)
        for r in ch.select("_commit_instant", "_change_type", "v")
        .collect()
    )
    assert got == [
        (i2, "update_postimage", "b"),
        (i2, "update_preimage", "a"),
        (i4, "update_postimage", "c"),
        (i4, "update_preimage", "b"),
    ]


def test_key_only_foreign_base_naming_fallback(spark, tmp_path):
    """Regression (r13 ADVICE low): base files whose names carry NO
    instant token (foreign naming, populate.meta.fields=false) used to
    get a NULL _hl_instant in the multi-version image join and were
    silently dropped; the fallback is the file version's validity-
    window OPENING instant from _file_versions_rt."""
    import json
    import os

    root = str(tmp_path / "ht")
    base = spark.createDataFrame(
        [(1, "a", 100), (2, "x", 100)], "k long, v string, sq long"
    )
    write_hoodie_table(base.coalesce(1), root)
    ((fid, s),) = latest_file_slices_rt(root).items()
    # strip the instant token from the base file name + rewrite the
    # commit's write-stats path (a foreign writer's naming)
    old_rel = s["base"]
    new_rel = f"{fid}.parquet"
    os.replace(os.path.join(root, old_rel), os.path.join(root, new_rel))
    hdir = os.path.join(root, ".hoodie")
    for f in os.listdir(hdir):
        if f.endswith(".commit"):
            p = os.path.join(hdir, f)
            with open(p) as fh:
                meta = json.load(fh)
            for stats in meta["partitionToWriteStats"].values():
                for st in stats:
                    if st["path"] == old_rel:
                        st["path"] = new_rel
            with open(p, "w") as fh:
                json.dump(meta, fh)
    ((fid2, s2),) = latest_file_slices_rt(root).items()
    assert s2["base"] == new_rel
    schema = spark_schema_to_avro(base.schema)
    ko = hl.cdc_avro_schema_key_only()
    i2 = append_log_commit(
        root, fid2, s2["base_instant"],
        [{"k": 1, "v": "b", "sq": 101}], schema,
        cdc_records=[{"op": "u", "recordKey": "1"}], cdc_schema=ko,
    )
    ch = read_hoodie_changes(spark, root, key_fields=["k"])
    got = sorted(
        (r._change_type, r.v)
        for r in ch.select("_change_type", "v").collect()
    )
    # the preimage "a" lives ONLY in the renamed base file — before the
    # fallback this row was dropped and the preimage came back empty
    assert got == [("update_postimage", "b"), ("update_preimage", "a")]
