"""Incremental (liquid-style) clustering: optimize(incremental=True)
restacks only files written since the last clustering commit with the
same spec — O(new data) maintenance — while carried files keep their
names, skipping indexes, and deletion vectors."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable


def _table(spark, path, n=200):
    # 4-digit ids: record keys are strings, so key ranges must stay
    # lexicographically disjoint between the base and later batches
    df = spark.range(1000, 1000 + n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("v"),
        F.lit(1).alias("sq"),
    )
    return LakehouseTable.create(
        spark, path, df, key_cols=["k"], precombine="sq"
    )


def test_incremental_restacks_only_new_files(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    t.optimize(target_files=4, cluster_by=["k"])
    base = t._commit(None)
    assert base.stats["clustered_output"] == base.files

    # new arrivals (fresh keys -> pure inserts, no rewrite of clustered)
    newbie = spark.range(2000, 2060).select(
        F.col("id").alias("k"),
        F.lit(99).cast("bigint").alias("v"),
        F.lit(2).alias("sq"),
    )
    t.upsert(newbie)
    after_upsert = t._commit(None)
    new_files = [f for f in after_upsert.files if f not in base.files]
    assert new_files, "upsert must have added files"

    inc = t.optimize(target_files=2, cluster_by=["k"], incremental=True)
    assert inc.stats["mode"] == "incremental"
    assert inc.stats["restacked_files"] == len(new_files)
    # every clustered file carried over untouched, by name
    assert set(base.files) < set(inc.files)
    assert set(inc.stats["clustered_output"]).isdisjoint(base.files)
    # data unchanged
    assert t.read().count() == 260
    assert {r.k for r in t.read().select("k").collect()} == set(
        range(1000, 1200)
    ) | set(range(2000, 2060))
    # carried files keep their skipping index entries
    for f in base.files:
        assert f in inc.key_ranges and f in inc.col_stats

    # nothing new since -> zero-IO no-op returning the same commit
    again = t.optimize(target_files=2, cluster_by=["k"], incremental=True)
    assert again.version == inc.version


def test_incremental_generations_prune_reads(spark, tmp_path):
    """Each generation is internally disjoint on the cluster key, so a
    point read touches ~1 file per generation, not the whole table."""
    t = _table(spark, str(tmp_path / "t"))
    t.optimize(target_files=4, cluster_by=["k"])
    t.upsert(
        spark.range(2000, 2200).select(
            F.col("id").alias("k"),
            F.lit(1).cast("bigint").alias("v"),
            F.lit(2).alias("sq"),
        )
    )
    t.optimize(target_files=4, cluster_by=["k"], incremental=True)
    commit = t._commit(None)
    assert len(commit.files) == 8  # 2 generations x 4
    hit = t.read_where("k", 1042, 1042)
    assert hit.count() == 1
    # stats pruning: at most one file per generation can contain k=42
    surviving = [
        f
        for f in commit.files
        if commit.col_stats[f]["k"][0] <= 1042 <= commit.col_stats[f]["k"][1]
    ]
    assert len(surviving) <= 2


def test_incremental_requires_cluster_by(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    with pytest.raises(ValueError, match="cluster_by"):
        t.optimize(incremental=True)


def test_incremental_zorder_reuses_boundaries(spark, tmp_path):
    """Incremental z-order restacks only post-clustering arrivals using
    the boundaries pinned by the last full z-order commit, so every
    generation buckets on the same Morton curve and read_where prunes
    on BOTH dimensions."""
    df = spark.range(1000, 1400).select(
        F.col("id").alias("k"),
        (F.col("id") % 50).cast("double").alias("x"),
        ((F.col("id") * 7) % 31).cast("double").alias("y"),
        F.lit(1).alias("sq"),
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq"
    )
    t.optimize(target_files=4, zorder_by=["x", "y"])
    base = t._commit(None)
    assert base.stats["zorder_spec"] == "x,y"
    assert base.stats["zorder_bounds"]["x"]

    t.upsert(
        spark.range(2000, 2200).select(
            F.col("id").alias("k"),
            (F.col("id") % 50).cast("double").alias("x"),
            ((F.col("id") * 7) % 31).cast("double").alias("y"),
            F.lit(2).alias("sq"),
        )
    )
    # z-ordered files are NOT key-clustered, so the upsert may rewrite
    # some of them; the incremental run must carry whatever survived
    survivors = [f for f in t._commit(None).files if f in base.files]
    inc = t.optimize(target_files=4, zorder_by=["x", "y"], incremental=True)
    assert inc.stats["mode"] == "incremental"
    assert inc.stats["zorder_bounds"] == base.stats["zorder_bounds"]
    assert all(f in inc.files for f in survivors)
    assert t.read().count() == 600
    # selective reads on each z-dimension prune to a strict file subset
    for col, val in (("x", 7.0), ("y", 13.0)):
        hit = t.read_where(col, val, val)
        assert 0 < len(hit.inputFiles()) < len(inc.files)


def test_incremental_zorder_requires_prior_full(spark, tmp_path):
    t = _table(spark, str(tmp_path / "t"))
    with pytest.raises(RuntimeError, match="prior full"):
        t.optimize(zorder_by=["v"], incremental=True)


def test_maintenance_advisor_full_cycle(spark, tmp_path):
    """The table-services advisor recommends exactly the actions the
    table state warrants, and run_maintenance executes them in
    compaction -> clustering -> vacuum order."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import (
        maintenance_plan,
        run_maintenance,
    )

    t = _table(spark, str(tmp_path / "t"))
    # fresh CoW table with no clustering history: nothing to do
    assert maintenance_plan(t) == {
        "compact": False, "cluster": None, "vacuum": False
    }
    t.optimize(target_files=4, cluster_by=["k"])
    t.upsert(
        spark.range(2000, 2400).select(
            F.col("id").alias("k"),
            F.lit(5).cast("bigint").alias("v"),
            F.lit(2).alias("sq"),
        )
    )
    plan = maintenance_plan(t, max_unclustered_fraction=0.1)
    assert plan["cluster"]["cluster_by"] == ["k"]
    assert plan["cluster"]["stale_files"] > 0
    ran = run_maintenance(t, plan)
    assert "cluster" in ran
    # clustering is now current again
    assert maintenance_plan(t, max_unclustered_fraction=0.1)["cluster"] is None
    assert t.read().count() == 600


def test_maintenance_advisor_mor_compaction(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables.lakehouse import (
        LakehouseTable,
        maintenance_plan,
        run_maintenance,
    )

    df = spark.createDataFrame([(1, 10, 1)], "k int, v int, sq int")
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], precombine="sq",
        table_type="mor",
    )
    for i in range(2, 6):
        t.upsert(spark.createDataFrame([(1, i * 10, i)], "k int, v int, sq int"))
    plan = maintenance_plan(t, max_log_files=3, retain_versions=3)
    assert plan["compact"] is True and plan["vacuum"] is True
    ran = run_maintenance(t, plan, retain_versions=3)
    assert "compact" in ran and "vacuum" in ran
    assert not t._commit(None).log_files
    assert [r.v for r in t.read_ro().collect()] == [50]


def test_maintenance_plan_survives_column_rename(spark, tmp_path):
    """optimize() records its clustering spec under PHYSICAL names; the
    advisor must resolve them to CURRENT logical names so that after a
    rename — even one that makes another column's logical name collide
    with the spec's physical name — run_maintenance clusters the
    original column, not an impostor."""
    from hudi_and_delta_showcase_spark.tables.lakehouse import (
        maintenance_plan,
        run_maintenance,
    )

    t = _table(spark, str(tmp_path / "t"))
    t.optimize(target_files=4, cluster_by=["v"])
    # physical 'v' is now logically 'metric'; a plan speaking physical
    # names would tell run_maintenance to cluster logical 'v' — a
    # column that no longer exists (or worse, a future impostor)
    t.rename_column("v", "metric")
    t.upsert(
        spark.range(2000, 2400).select(
            F.col("id").alias("k"),
            F.lit(5).cast("bigint").alias("metric"),
            F.lit(2).alias("sq"),
        )
    )
    plan = maintenance_plan(t, max_unclustered_fraction=0.1)
    assert plan["cluster"]["cluster_by"] == ["metric"]  # logical, post-rename
    ran = run_maintenance(t, plan)
    assert "cluster" in ran
    # restack really clustered the original column (spec unchanged)
    last = max(t.history(), key=lambda c: c.version)
    assert last.stats.get("cluster_spec") == "v"  # physical spelling
    assert t.read().count() == 600


def test_optimize_where_partition_scoped(spark, sf_dir, tmp_path):
    """OPTIMIZE ... WHERE rewrites ONE partition and carries the rest
    with their skipping indexes; deletion vectors on carried files stay
    live and rewritten files materialize theirs."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.io import load_table
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    ev = load_table(spark, sf_dir, "events").limit(300).withColumn(
        "pp", (F.col("user_id") % 3).cast("string")
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), ev, key_cols=["event_id"],
        partition_by="pp", deletion_vectors=True,
    )
    # fragment partition pp=1 with two more commits, and DV-delete one
    # row in pp=0 (a CARRIED partition) and one in pp=1 (REWRITTEN)
    extra = ev.filter(F.col("pp") == "1").limit(40).withColumn(
        "event_id", F.col("event_id") + 1_000_000
    )
    t.upsert(extra)
    victims = [
        r.event_id
        for r in ev.filter(F.col("pp") == "0").limit(1).collect()
    ] + [r.event_id for r in ev.filter(F.col("pp") == "1").limit(1).collect()]
    t.delete(spark.createDataFrame([(v,) for v in victims], "event_id long")
             .join(t.read().select("event_id", "pp"), "event_id"))
    before = t._commit(None)
    n_before = t.read().count()
    p1_files = [f for f in before.files if "__pp=1" in f]
    other_files = [f for f in before.files if "__pp=1" not in f]
    assert len(p1_files) >= 2

    c = t.optimize(where_partition="1")
    assert c.stats["optimize_where"] == "pp=1"
    assert c.stats["rewritten_files"] == len(p1_files)
    # untouched partitions carried byte-identically, with their indexes
    assert set(other_files) <= set(c.files)
    for f in other_files:
        assert c.row_counts.get(f) == before.row_counts.get(f)
    # one output file for the scoped partition, fewer total files
    assert len([f for f in c.files if "__pp=1" in f]) == 1
    # value-identical table (both DV deletes still honored)
    assert t.read().count() == n_before
    assert not t.read().filter(F.col("event_id").isin(victims)).count()


def test_optimize_where_sql_and_guards(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F
    import pytest as _pytest

    from hudi_and_delta_showcase_spark.io import load_table
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    ev = load_table(spark, sf_dir, "events").limit(100).withColumn(
        "pp", (F.col("user_id") % 2).cast("string")
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), ev, key_cols=["event_id"],
        partition_by="pp",
    )
    t.upsert(ev.limit(30).withColumn("value", F.col("value") + 1))
    out = execute_ddl(spark, "OPTIMIZE t WHERE pp = '1'", {"t": t})
    assert out["statement"] == "optimize"
    assert t._commit(None).stats["optimize_where"] == "pp=1"
    with _pytest.raises(ValueError, match="partition column"):
        execute_ddl(spark, "OPTIMIZE t WHERE value = 3", {"t": t})
    with _pytest.raises(ValueError, match="exclusive"):
        t.optimize(where_partition="1", incremental=True)


def test_optimize_where_with_clustering(spark, sf_dir, tmp_path):
    """cluster_by inside a scoped optimize range-partitions the
    partition's rows so the new files carry disjoint key ranges."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.io import load_table
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    ev = load_table(spark, sf_dir, "events").limit(200).withColumn(
        "pp", (F.col("user_id") % 2).cast("string")
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), ev, key_cols=["event_id"],
        partition_by="pp",
    )
    c = t.optimize(where_partition="1", target_files=2, cluster_by=["value"])
    new = [f for f in c.files if "__pp=1" in f]
    assert len(new) == 2
    ranges = sorted(
        tuple(c.col_stats[f]["value"]) for f in new if f in c.col_stats
    )
    assert len(ranges) == 2 and ranges[0][1] <= ranges[1][0]
    assert t.read().count() == 200


def test_optimize_where_quoted_value_with_space(spark, tmp_path):
    """WHERE region = 'US East' — a quoted partition value containing
    a space must parse (ADVICE r6: the bare-token regex refused it)."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.merge_sql import execute_ddl

    df = spark.createDataFrame(
        [(i, "US East" if i % 2 else "EU West", i * 10)
         for i in range(1, 21)],
        "k int, region string, v int",
    )
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        partition_by="region",
    )
    t.upsert(df.filter(F.col("region") == "US East").limit(3)
             .withColumn("v", F.col("v") + 1))
    out = execute_ddl(spark, "OPTIMIZE t WHERE region = 'US East'", {"t": t})
    assert out["statement"] == "optimize"
    assert t._commit(None).stats["optimize_where"] == "region=US East"
    assert t.read().count() == 20
