"""SQL MERGE INTO surface (reference README.md:1213-1224): parse the
Delta notebook's statement shape, route source rows to first-satisfied
clause, commit through the table's pruned upsert/delete paths."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.merge_sql import (
    execute_merge,
    parse_merge,
)

REF_MERGE = """
MERGE INTO target t USING updates s
ON t.pk_id = s.pk_id
WHEN MATCHED THEN UPDATE SET *
WHEN NOT MATCHED THEN INSERT *
"""


def test_parse_reference_statement():
    spec = parse_merge(REF_MERGE)
    assert (spec.target, spec.source) == ("target", "updates")
    assert (spec.target_alias, spec.source_alias) == ("t", "s")
    assert spec.on == "t.pk_id = s.pk_id"
    assert [(c.matched, c.action) for c in spec.clauses] == [
        (True, "update"),
        (False, "insert"),
    ]


def test_parse_conditional_and_delete():
    spec = parse_merge(
        "MERGE INTO a USING b ON a.k = b.k "
        "WHEN MATCHED AND b.is_deleted = true THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED AND b.is_deleted = false THEN INSERT *"
    )
    assert [c.action for c in spec.clauses] == ["delete", "update", "insert"]
    assert spec.clauses[0].condition == "b.is_deleted = true"
    assert spec.clauses[1].condition is None


@pytest.mark.parametrize(
    "bad",
    [
        "MERGE INTO a USING b ON a.k = b.k WHEN NOT MATCHED THEN DELETE",
        "MERGE INTO a USING b ON a.k = b.k WHEN MATCHED THEN INSERT *",
        "MERGE INTO a USING b ON a.k = b.k",
        "SELECT 1",
    ],
)
def test_parse_rejects_invalid(bad):
    with pytest.raises(ValueError):
        parse_merge(bad)


def _table(spark, tmp_path):
    base = spark.createDataFrame(
        [(1, "apple", 10), (2, "samsung", 20), (3, "dell", 30),
         (4, "motorola", 40)],
        "pk_id long, name string, value long",
    )
    return LakehouseTable.create(
        spark, str(tmp_path / "m"), base, key_cols=["pk_id"]
    )


def test_reference_merge_scenario(spark, tmp_path):
    """The golden CDC batch through literal MERGE SQL: update samsung
    20->201, soft-tombstone dell via DELETE clause, insert htc."""
    t = _table(spark, tmp_path)
    spark.createDataFrame(
        [(5, "htc", 50, False), (2, "samsung", 201, False),
         (3, "dell", 30, True)],
        "pk_id long, name string, value long, is_deleted boolean",
    ).createOrReplaceTempView("cdc_batch")
    stats = execute_merge(
        spark,
        """MERGE INTO m t USING cdc_batch s ON t.pk_id = s.pk_id
           WHEN MATCHED AND s.is_deleted = true THEN DELETE
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED AND s.is_deleted = false THEN INSERT *""",
        {"m": t},
    )
    assert (stats["updated"], stats["inserted"], stats["deleted"]) == (1, 1, 1)
    got = {
        r.pk_id: (r.name, r.value)
        for r in t.read().select("pk_id", "name", "value").collect()
    }
    assert got == {
        1: ("apple", 10),
        2: ("samsung", 201),
        4: ("motorola", 40),
        5: ("htc", 50),
    }


def test_unmatched_tombstone_skipped(spark, tmp_path):
    """A DELETE for a key the table never had routes to no clause."""
    t = _table(spark, tmp_path)
    spark.createDataFrame(
        [(99, "ghost", 0, True)],
        "pk_id long, name string, value long, is_deleted boolean",
    ).createOrReplaceTempView("ghost_batch")
    stats = execute_merge(
        spark,
        """MERGE INTO m USING ghost_batch s ON m.pk_id = s.pk_id
           WHEN MATCHED AND s.is_deleted = true THEN DELETE
           WHEN NOT MATCHED AND s.is_deleted = false THEN INSERT *""",
        {"m": t},
    )
    assert stats == {
        "deleted_by_source": 0, "updated_by_source": 0,
        "updated": 0, "inserted": 0, "deleted": 0, "skipped": 1,
        "commits": [],
    }
    assert t.read().count() == 4


def test_on_must_cover_keys(spark, tmp_path):
    t = _table(spark, tmp_path)
    spark.range(1).withColumnRenamed("id", "pk_id").createOrReplaceTempView(
        "v_keys"
    )
    with pytest.raises(ValueError, match="key columns"):
        execute_merge(
            spark,
            "MERGE INTO m USING v_keys s ON m.name = s.name "
            "WHEN MATCHED THEN UPDATE SET *",
            {"m": t},
        )


def test_clause_order_first_wins(spark, tmp_path):
    """Delta evaluates WHEN MATCHED clauses in order: with UPDATE listed
    before a conditional DELETE, tombstones still update (soft delete —
    exactly the reference's merge, which has no DELETE clause at all)."""
    t = _table(spark, tmp_path)
    spark.createDataFrame(
        [(3, "dell-tomb", 0, True)],
        "pk_id long, name string, value long, is_deleted boolean",
    ).createOrReplaceTempView("tomb_batch")
    stats = execute_merge(
        spark,
        """MERGE INTO m USING tomb_batch s ON m.pk_id = s.pk_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN MATCHED AND s.is_deleted = true THEN DELETE""",
        {"m": t},
    )
    assert (stats["updated"], stats["deleted"]) == (1, 0)
    row = t.read().filter("pk_id = 3").select("name").collect()[0]
    assert row.name == "dell-tomb"


def test_sql_update_statement(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_update

    df = spark.createDataFrame(
        [(1, "a", 10, 1), (2, "b", 20, 1), (3, "c", 30, 1)],
        "pk_id int, name string, value int, sq int",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"], precombine="sq"
    )
    res = execute_update(
        spark, "UPDATE t SET value = 201 WHERE pk_id = 2", {"t": t}
    )
    assert res["updated"] == 1 and len(res["commits"]) == 1
    assert {r.pk_id: r.value for r in t.read().collect()} == {
        1: 10, 2: 201, 3: 30
    }
    # multi-assignment + expression over existing columns
    execute_update(
        spark,
        "UPDATE t SET value = value + 1, name = upper(name) WHERE pk_id < 3",
        {"t": t},
    )
    rows = {r.pk_id: (r.name, r.value) for r in t.read().collect()}
    assert rows == {1: ("A", 11), 2: ("B", 202), 3: ("c", 30)}


def test_sql_delete_statement(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_delete

    df = spark.createDataFrame(
        [(1, 10, 1), (2, 20, 1), (3, 30, 1)], "pk_id int, value int, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"], precombine="sq"
    )
    res = execute_delete(spark, "DELETE FROM t WHERE pk_id = 3", {"t": t})
    assert res["deleted"] == 1
    assert sorted(r.pk_id for r in t.read().collect()) == [1, 2]
    # no-match delete is a no-op with no commit
    res = execute_delete(spark, "DELETE FROM t WHERE pk_id = 99", {"t": t})
    assert res == {"deleted": 0, "commits": []}


def test_sql_delete_on_partitioned_table(spark, tmp_path):
    """DELETE routes resolution columns including the partition — a
    keys-only projection would fail delete()'s (key, partition)
    resolution on non-global partitioned tables."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_delete

    df = spark.createDataFrame(
        [(1, "A", 10, 1), (2, "B", 20, 1), (3, "B", 30, 1)],
        "pk_id int, part string, value int, sq int",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"],
        precombine="sq", partition_by="part",
    )
    res = execute_delete(spark, "DELETE FROM t WHERE value >= 20", {"t": t})
    assert res["deleted"] == 2
    assert sorted(r.pk_id for r in t.read().collect()) == [1]


def test_sql_update_quoted_literals(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_update

    df = spark.createDataFrame(
        [(1, "a", 10, 1)], "pk_id int, name string, value int, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"], precombine="sq"
    )
    execute_update(
        spark,
        "UPDATE t SET name = 'x,y(z', value = value + 1 WHERE pk_id = 1",
        {"t": t},
    )
    r = t.read().collect()[0]
    assert (r.name, r.value) == ("x,y(z", 11)


def test_execute_ddl_statements(spark, tmp_path):
    """r6: the Delta utility DDL surface as literal SQL strings — the
    notebook statements a reference user would paste, resolved against
    the same registry MERGE uses."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    df = spark.range(40).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v"),
        F.expr(
            "cast('2024-01-01' as timestamp_ntz)"
            " + make_interval(0,0,0,0,0,0,id)"
        ).alias("ts"),
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="ts"
    )
    tables = {"events_tbl": t}
    run = lambda s: execute_ddl(spark, s, tables)  # noqa: E731

    assert run("ALTER TABLE events_tbl ADD CONSTRAINT pos CHECK (v >= 0)")[
        "name"
    ] == "pos"
    assert "pos" in LakehouseTable(spark, t.path).constraints
    assert run("OPTIMIZE events_tbl")["statement"] == "optimize"
    t.upsert(df.limit(3).withColumn("v", F.col("v") + 1))
    hist = run("DESCRIBE HISTORY events_tbl")["history"]
    assert hist[0]["operation"] == "upsert" and hist[-1]["version"] == 0
    assert run("RESTORE TABLE events_tbl TO VERSION AS OF 0")["statement"] \
        == "restore"
    dry = run("VACUUM events_tbl RETAIN 2 VERSIONS DRY RUN")
    assert dry["statement"] == "vacuum" and "would_remove_files" in dry
    clone_path = str(tmp_path / "c")
    assert run(
        f"CREATE TABLE delta.`{clone_path}` SHALLOW CLONE events_tbl"
    )["path"] == clone_path
    assert LakehouseTable(spark, clone_path).read().count() == 40
    assert run("ALTER TABLE events_tbl RENAME COLUMN v TO val")[
        "statement"
    ] == "rename_column"
    assert "val" in LakehouseTable(spark, t.path).read().columns
    assert run("ALTER TABLE events_tbl DROP CONSTRAINT pos")["name"] == "pos"
    fsck = run("FSCK REPAIR TABLE events_tbl DRY RUN")
    assert fsck["statement"] == "fsck" and fsck["repaired"] is False
    assert fsck["missing"]["files"] == []
    with pytest.raises(ValueError, match="unsupported DDL"):
        run("TRUNCATE TABLE events_tbl")
    with pytest.raises(KeyError):
        run("OPTIMIZE nosuch")


def test_not_matched_by_source_delete(spark, tmp_path):
    """Delta's third clause group: target rows whose key is absent from
    the source are deleted (sync semantics), optionally condition-
    filtered, in the SAME delete commit as matched deletes."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    t = LakehouseTable.create(
        spark,
        str(tmp_path / "m"),
        spark.createDataFrame(
            [(1, "a", 1), (2, "b", 1), (3, "c", 1), (4, "d", 1)],
            "pk_id int, v string, sq int",
        ),
        key_cols=["pk_id"], precombine="sq",
    )
    spark.createDataFrame(
        [(2, "b2", 2, False), (5, "e", 2, False)],
        "pk_id int, v string, sq int, is_deleted boolean",
    ).createOrReplaceTempView("sync_batch")
    stats = execute_merge(
        spark,
        """MERGE INTO m USING sync_batch s ON m.pk_id = s.pk_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE AND m.pk_id > 1 THEN DELETE""",
        {"m": t},
    )
    assert stats["updated"] == 1 and stats["inserted"] == 1
    assert stats["deleted_by_source"] == 2  # pk 3,4 gone; pk 1 kept by cond
    got = sorted((r.pk_id, r.v) for r in t.read().select("pk_id", "v").collect())
    assert got == [(1, "a"), (2, "b2"), (5, "e")]
    # unconditional variant mirrors a full sync
    spark.createDataFrame(
        [(2, "b3", 3, False)], "pk_id int, v string, sq int, is_deleted boolean"
    ).createOrReplaceTempView("sync_batch2")
    stats = execute_merge(
        spark,
        """MERGE INTO m USING sync_batch2 s ON m.pk_id = s.pk_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED BY SOURCE THEN DELETE""",
        {"m": t},
    )
    assert stats["deleted_by_source"] == 2
    assert [r.pk_id for r in t.read().select("pk_id").collect()] == [2]


def test_not_matched_by_source_rejects_star_update(spark):
    """UPDATE SET * stays invalid by-source (no source row to expand
    from); explicit assignments are the supported shape (r12)."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import parse_merge

    with pytest.raises(ValueError, match="explicit SET"):
        parse_merge(
            """MERGE INTO m USING s ON m.k = s.k
               WHEN NOT MATCHED BY SOURCE THEN UPDATE SET *"""
        )
    with pytest.raises(ValueError, match="INSERT has no source row"):
        parse_merge(
            """MERGE INTO m USING s ON m.k = s.k
               WHEN NOT MATCHED BY SOURCE THEN INSERT *"""
        )


def test_not_matched_by_source_update_marks_stale(spark, tmp_path):
    """r12 (verdict #3): WHEN NOT MATCHED BY SOURCE THEN UPDATE SET —
    Delta's 'mark stale rows' full-sync idiom. Target rows absent from
    the source update IN PLACE from expressions over target columns;
    clause order routes first-satisfied (UPDATE before DELETE here);
    the updated rows land in the SAME upsert commit as the source
    group's writes."""
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    t = LakehouseTable.create(
        spark,
        str(tmp_path / "m"),
        spark.createDataFrame(
            [(1, "a", "live", 1), (2, "b", "live", 1),
             (3, "c", "live", 1), (4, "d", "live", 1)],
            "pk_id int, v string, status string, sq int",
        ),
        key_cols=["pk_id"], precombine="sq",
    )
    spark.createDataFrame(
        [(2, "b2", "live", 2), (5, "e", "live", 2)],
        "pk_id int, v string, status string, sq int",
    ).createOrReplaceTempView("sync_src")
    stats = execute_merge(
        spark,
        """MERGE INTO m USING sync_src s ON m.pk_id = s.pk_id
           WHEN MATCHED THEN UPDATE SET *
           WHEN NOT MATCHED THEN INSERT *
           WHEN NOT MATCHED BY SOURCE AND m.pk_id > 3
               THEN DELETE
           WHEN NOT MATCHED BY SOURCE
               THEN UPDATE SET status = 'stale', sq = m.sq + 1""",
        {"m": t},
    )
    assert stats["updated"] == 1 and stats["inserted"] == 1
    assert stats["deleted_by_source"] == 1  # pk 4
    assert stats["updated_by_source"] == 2  # pk 1, 3 marked stale
    got = sorted(
        (r.pk_id, r.v, r.status)
        for r in t.read().select("pk_id", "v", "status").collect()
    )
    assert got == [
        (1, "a", "stale"),
        (2, "b2", "live"),
        (3, "c", "stale"),
        (5, "e", "live"),
    ]
    # one delete commit + one upsert commit, all clause groups folded
    assert len(stats["commits"]) == 2


def test_ddl_replace_partition_field(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    df = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(1, "US", "a", 1), (2, "EU", "b", 1)], 1
        ),
        "k int, region string, category string, sq int",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df,
        key_cols=["k"], precombine="sq", partition_by="region",
    )
    out = execute_ddl(
        spark,
        "ALTER TABLE t REPLACE PARTITION FIELD WITH category",
        {"t": t},
    )
    assert out == {
        "statement": "evolve_partition", "partition_by": "category",
    }
    assert t.partition_by == "category"
    out = execute_ddl(spark, "ALTER TABLE t DROP PARTITION FIELD", {"t": t})
    assert out["partition_by"] is None
    assert t.partition_specs == ["region", "category", None]


def test_vacuum_retain_hours(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    df = spark.createDataFrame(
        spark.sparkContext.parallelize([(1, 1, 1), (2, 2, 1)], 1),
        "k int, v int, sq int",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.upsert(
        spark.createDataFrame(
            spark.sparkContext.parallelize([(1, 99, 2)], 1),
            "k int, v int, sq int",
        )
    )
    # recent commits are all inside the 1-hour window: nothing removable
    out = execute_ddl(spark, "VACUUM t RETAIN 1 HOURS DRY RUN", {"t": t})
    assert out["would_remove_files"] == []
    assert set(out["retained_versions"]) == {0, 1}
    # zero-hour window falls back to version retention (newest only)
    out = execute_ddl(spark, "VACUUM t RETAIN 0 HOURS DRY RUN", {"t": t})
    assert out["retained_versions"] == [1]
    assert out["would_remove_files"], "v0's rewritten file not listed"
    # time travel to v1 still intact after the real vacuum
    execute_ddl(spark, "VACUUM t RETAIN 0 HOURS", {"t": t})
    assert t.read().count() == 2


def test_execute_query_read_sql(spark, tmp_path):
    """The literal read-SQL forms: time travel by version and by
    instant agree, the CDF TVF bounds default to latest, and unknown
    shapes raise."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_query

    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "pk_id int, v string, sq int"
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"],
        precombine="sq", cdc_enabled=True,
    )
    t.upsert(spark.createDataFrame([(2, "b2", 2)], "pk_id int, v string, sq int"))
    tables = {"t": t}
    q = lambda s: execute_query(spark, s, tables)  # noqa: E731

    v0 = sorted((r.pk_id, r.v) for r in q("SELECT * FROM t VERSION AS OF 0").collect())
    assert v0 == [(1, "a"), (2, "b")]
    ts = t.history()[0].commit_time
    assert sorted(
        (r.pk_id, r.v)
        for r in q(f"SELECT * FROM t TIMESTAMP AS OF '{ts}'").collect()
    ) == v0
    chg = q("SELECT * FROM table_changes('t', 1)")  # end defaults to latest
    assert {r._change_type for r in chg.collect()} == {
        "update_preimage", "update_postimage"
    }
    with pytest.raises(ValueError, match="unsupported query"):
        q("SELECT pk_id FROM t VERSION AS OF 0")
    with pytest.raises(KeyError):
        q("SELECT * FROM nosuch VERSION AS OF 0")


def test_describe_detail(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    df = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "pk_id int, part string, sq int"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["pk_id"],
        precombine="sq", partition_by="part", cdc_enabled=True,
    )
    d = execute_ddl(spark, "DESCRIBE DETAIL t", {"t": t})
    assert d["statement"] == "detail"
    assert d["table_type"] == "cow" and d["version"] == 0
    assert d["num_files"] == 2 and d["num_rows"] == 2  # one file/partition
    assert d["partition_columns"] == ["part"]
    assert d["features"] == ["cdc"]


def test_merge_with_schema_evolution(spark, tmp_path):
    """MERGE WITH SCHEMA EVOLUTION INTO: star clauses ADD the source's
    new columns to the target (additive evolution inside the upsert);
    pre-existing rows read the new column as null. Without the clause,
    extras keep dropping (Delta's default)."""
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    t = LakehouseTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"),
        key_cols=["k"],
    )
    spark.createDataFrame(
        [(2, "b2", "eu"), (3, "c", "us")], "k int, v string, region string"
    ).createOrReplaceTempView("src_ev")

    # default: extras drop
    out = execute_merge(
        spark,
        "MERGE INTO t USING src_ev s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": t},
    )
    assert out["updated"] == 1 and out["inserted"] == 1
    assert "region" not in t.read().columns

    spark.createDataFrame(
        [(3, "c3", "us"), (4, "d", "ap")], "k int, v string, region string"
    ).createOrReplaceTempView("src_ev2")
    out = execute_merge(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING src_ev2 s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": t},
    )
    assert out["updated"] == 1 and out["inserted"] == 1
    got = {
        r.k: (r.v, r.region)
        for r in t.read().select("k", "v", "region").collect()
    }
    assert got == {
        1: ("a", None),       # untouched row: new column backfills null
        2: ("b2", None),      # updated BEFORE evolution: no region
        3: ("c3", "us"),
        4: ("d", "ap"),
    }


def test_schema_evolution_never_leaks_engine_internals(spark, tmp_path):
    """A source view built from another LakehouseTable.read() carries
    _hoodie_* meta columns; WITH SCHEMA EVOLUTION must not persist
    them (or partition/bucket tokens) as target data columns."""
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_merge

    src_t = LakehouseTable.create(
        spark,
        str(tmp_path / "src"),
        spark.createDataFrame(
            [(5, "e", 1.0)], "k int, v string, score double"
        ),
        key_cols=["k"],
    )
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame([(1, "a")], "k int, v string"),
        key_cols=["k"],
    )
    src_t.read().createOrReplaceTempView("src_medallion")
    assert any(
        c.startswith("_hoodie_")
        for c in spark.table("src_medallion").columns
    )
    execute_merge(
        spark,
        "MERGE WITH SCHEMA EVOLUTION INTO t USING src_medallion s "
        "ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *",
        {"t": t},
    )
    cols = t.read().columns
    data_cols = [c for c in cols if not c.startswith("_hoodie_")]
    # score evolved in; no double _hoodie_* columns, no tokens
    assert "score" in data_cols
    assert not any(c.startswith("__") for c in cols)
    assert len([c for c in cols if c == "_hoodie_commit_time"]) == 1


def test_matched_update_explicit_sets_parse(spark):
    """r13: matched-clause UPDATE SET col = expr parses (the most
    common real-world MERGE shape); NOT MATCHED UPDATE still refuses."""
    spec = parse_merge(
        """MERGE INTO m t USING s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET v = s.v, cnt = t.cnt + 1"""
    )
    (c,) = spec.clauses
    assert c.action == "update" and c.matched
    assert c.assignments == (("v", "s.v"), ("cnt", "t.cnt + 1"))
    with pytest.raises(ValueError, match="NOT MATCHED THEN UPDATE"):
        parse_merge(
            """MERGE INTO m USING s ON m.k = s.k
               WHEN NOT MATCHED THEN UPDATE SET v = 1"""
        )


def test_matched_case_when_assignment_parses():
    """r13 ADVICE: the clause terminator must anchor to a real clause
    boundary — a CASE WHEN inside a SET expression used to truncate
    the action at the inner WHEN."""
    spec = parse_merge(
        """MERGE INTO m t USING s ON t.k = s.k
           WHEN MATCHED THEN UPDATE SET
               v = CASE WHEN s.v > 0 THEN s.v ELSE 0 END
           WHEN NOT MATCHED THEN INSERT *"""
    )
    assert [c.action for c in spec.clauses] == ["update", "insert"]
    assert spec.clauses[0].assignments == (
        ("v", "CASE WHEN s.v > 0 THEN s.v ELSE 0 END"),
    )


def test_insert_cols_values_parse():
    spec = parse_merge(
        """MERGE INTO m t USING s ON t.k = s.k
           WHEN NOT MATCHED THEN
               INSERT (k, v) VALUES (s.k, concat(s.v, '!'))"""
    )
    (c,) = spec.clauses
    assert c.action == "insert"
    assert c.assignments == (("k", "s.k"), ("v", "concat(s.v, '!')"))
    with pytest.raises(ValueError, match="count mismatch"):
        parse_merge(
            """MERGE INTO m t USING s ON t.k = s.k
               WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k)"""
        )
    with pytest.raises(ValueError, match="MATCHED THEN INSERT"):
        parse_merge(
            """MERGE INTO m t USING s ON t.k = s.k
               WHEN MATCHED THEN INSERT (k) VALUES (s.k)"""
        )


def test_matched_assignments_execute(spark, tmp_path):
    """Matched assignments evaluate over BOTH aliases (source value,
    target-derived counter); unassigned target columns carry through;
    star and assignment clauses coexist first-satisfied."""
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "m"),
        spark.createDataFrame(
            [(1, "a", 10, 0), (2, "b", 20, 5)],
            "pk_id long, name string, value long, hits long",
        ),
        key_cols=["pk_id"],
    )
    spark.createDataFrame(
        [(2, "b2", 201), (3, "c", 30)],
        "pk_id long, name string, value long",
    ).createOrReplaceTempView("m_src")
    stats = execute_merge(
        spark,
        """MERGE INTO m t USING m_src s ON t.pk_id = s.pk_id
           WHEN MATCHED THEN UPDATE SET
               value = s.value, hits = t.hits + 1
           WHEN NOT MATCHED THEN
               INSERT (pk_id, name, value) VALUES (s.pk_id, s.name, s.value)""",
        {"m": t},
    )
    assert (stats["updated"], stats["inserted"]) == (1, 1)
    got = {
        r.pk_id: (r.name, r.value, r.hits)
        for r in t.read().select("pk_id", "name", "value", "hits").collect()
    }
    assert got == {
        1: ("a", 10, 0),       # untouched
        2: ("b", 201, 6),      # name NOT assigned -> target value kept
        3: ("c", 30, None),    # hits unlisted in INSERT -> NULL
    }


def test_bysource_set_alias_inside_string_literal(spark, tmp_path):
    """r13 (verdict wrong #4): alias stripping must not run inside
    string literals — SET note = 'tgt.stale' keeps the alias text."""
    t = LakehouseTable.create(
        spark,
        str(tmp_path / "m"),
        spark.createDataFrame(
            [(1, "x"), (2, "y")], "pk_id long, note string"
        ),
        key_cols=["pk_id"],
    )
    spark.createDataFrame(
        [(2,)], "pk_id long"
    ).createOrReplaceTempView("alias_src")
    execute_merge(
        spark,
        """MERGE INTO m tgt USING alias_src s ON tgt.pk_id = s.pk_id
           WHEN NOT MATCHED BY SOURCE THEN UPDATE SET note = 'tgt.stale'""",
        {"m": t},
    )
    got = {r.pk_id: r.note for r in t.read().select("pk_id", "note").collect()}
    assert got == {1: "tgt.stale", 2: "y"}
