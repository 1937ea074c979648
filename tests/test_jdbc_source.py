"""S10 integration: JDBC snapshot → Datastream envelopes → CDC apply.

Runs against an in-process Apache Derby database through Spark's real
JDBC source (the embedded Derby driver ships in Spark's jars), so the
reference's MySQL→Datastream→lakehouse loop is exercised end-to-end
with a genuine JDBC read standing in for the Datastream backfill dump.
"""

from __future__ import annotations

import tempfile

import pytest

from hudi_and_delta_showcase_spark.jdbc_source import (
    jdbc_backfill_to_drop_dir,
    read_jdbc_snapshot,
    snapshot_to_envelopes,
)

GOLDEN_ROWS = [
    (1, "apple", 10),
    (2, "samsung", 20),
    (3, "dell", 30),
    (4, "motorola", 40),
]


@pytest.fixture(scope="module")
def derby_url(spark):
    """An embedded Derby database holding the reference's golden 4-row
    source table, created through real JDBC (java.sql via the JVM)."""
    db = tempfile.mkdtemp(prefix="derby_src_") + "/srcdb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST ("
        "pk_id INT PRIMARY KEY, name VARCHAR(64), value INT, "
        "updated_at TIMESTAMP, created_at TIMESTAMP)"
    )
    ps = conn.prepareStatement(
        "INSERT INTO HUDI_DELTA_TEST VALUES (?, ?, ?, "
        "TIMESTAMP('2023-01-12 04:01:00'), TIMESTAMP('2023-01-12 04:00:00'))"
    )
    for pk, name, value in GOLDEN_ROWS:
        ps.setInt(1, pk)
        ps.setString(2, name)
        ps.setInt(3, value)
        ps.executeUpdate()
    st.close()
    conn.close()
    return url


def test_partitioned_jdbc_snapshot(spark, derby_url):
    """The scale shape: partitionColumn bounds split the source into
    parallel range queries; the union equals the table."""
    snap = read_jdbc_snapshot(
        spark,
        derby_url,
        "HUDI_DELTA_TEST",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        partition_column="pk_id",
        lower_bound=1,
        upper_bound=5,
        num_partitions=3,
    )
    assert snap.rdd.getNumPartitions() == 3
    got = sorted((r.PK_ID, r.NAME, r.VALUE) for r in snap.collect())
    assert got == GOLDEN_ROWS


def test_snapshot_to_envelopes_schema_and_content(spark, derby_url):
    from hudi_and_delta_showcase_spark.operators.cdc import (
        ENVELOPE_SCHEMA,
        flatten_envelope,
        normalize_timestamps,
    )

    snap = read_jdbc_snapshot(
        spark, derby_url, "HUDI_DELTA_TEST",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    # Derby uppercases identifiers; rename to the envelope payload names
    for c in snap.columns:
        snap = snap.withColumnRenamed(c, c.lower())
    env = snapshot_to_envelopes(
        snap, "hudi_delta_test", "db", ["pk_id"],
        read_timestamp="2023-01-12 04:05:00",
    )
    # byte-compatible with Avro drops (nullability flags may tighten —
    # literals are non-null — which any reader accepts)
    assert env.schema.simpleString() == ENVELOPE_SCHEMA.simpleString()
    rows = env.collect()
    assert len(rows) == 4
    assert {r.read_method for r in rows} == {"mysql-backfill-fulldump"}
    assert {r.source_metadata.change_type for r in rows} == {"INSERT"}
    # the existing downstream operators consume it unchanged
    flat = normalize_timestamps(
        flatten_envelope(env), ["updated_at", "created_at"]
    )
    got = sorted(
        (r.pk_id, r.name, r.value) for r in flat.collect()
    )
    assert got == GOLDEN_ROWS


def test_jdbc_backfill_feeds_cdc_apply_stream(spark, derby_url, tmp_path):
    """Full loop: JDBC snapshot lands as an envelope file batch in the
    drop dir; apply_cdc_stream ingests it; a subsequent golden CDC batch
    (binlog stand-in) lands and upserts — final state matches the
    reference scenario (insert pk5, update pk2 -> 201, soft-delete pk3)."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.operators.cdc import golden_cdc_batch
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        apply_cdc_stream,
    )

    drop = str(tmp_path / "drop")
    n = jdbc_backfill_to_drop_dir(
        spark,
        derby_url,
        "HUDI_DELTA_TEST",
        drop,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert n == 4

    table_path = str(tmp_path / "tbl")
    t = apply_cdc_stream(
        spark, drop, table_path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    assert t.read().count() == 4

    # binlog stand-in: the golden 3-change CDC batch lands in the drop
    golden_cdc_batch(spark).write.mode("append").parquet(drop)
    t = apply_cdc_stream(
        spark, drop, table_path, checkpoint_dir=str(tmp_path / "ckpt")
    )
    state = {
        r.pk_id: (r.name, r.value, r.is_deleted)
        for r in t.read().select("pk_id", "name", "value", "is_deleted").collect()
    }
    assert state[2] == ("samsung", 201, False)  # update applied
    assert state[5] == ("htc", 50, False)       # insert applied
    assert state[3][2] is True                  # soft delete marked
    assert state[1] == ("apple", 10, False)
    live = t.read().filter(~F.col("is_deleted"))
    assert live.count() == 4


def test_snapshot_diff_envelopes_classifies_changes(spark):
    """Diffing two keyed snapshots yields exactly the Datastream change
    classes: INSERT (new only), UPDATE-INSERT (payload changed), DELETE
    (old only, is_deleted + last image); unchanged rows emit nothing."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        snapshot_diff_envelopes,
    )

    schema = (
        "pk_id int, name string, value int, "
        "updated_at timestamp_ntz, created_at timestamp_ntz"
    )
    import datetime as dt

    t0 = dt.datetime(2023, 1, 12, 4, 1)
    c0 = dt.datetime(2023, 1, 12, 4, 0)
    t1 = dt.datetime(2023, 1, 12, 5, 30)
    old = spark.createDataFrame(
        [(1, "apple", 10, t0, c0), (2, "samsung", 20, t0, c0),
         (3, "dell", 30, t0, c0)],
        schema,
    )
    new = spark.createDataFrame(
        [(1, "apple", 10, t0, c0),          # unchanged
         (2, "samsung", 201, t1, c0),       # updated
         (5, "htc", 50, t1, c0)],           # inserted; 3 deleted
        schema,
    )
    env = snapshot_diff_envelopes(old, new, ["pk_id"], "t")
    rows = {
        r.payload.pk_id: (
            r.source_metadata.change_type,
            r.source_metadata.is_deleted,
            r.payload.value,
        )
        for r in env.collect()
    }
    assert rows == {
        2: ("UPDATE-INSERT", False, 201),
        3: ("DELETE", True, 30),
        5: ("INSERT", False, 50),
    }
    from hudi_and_delta_showcase_spark.operators.cdc import ENVELOPE_SCHEMA

    assert env.schema.simpleString() == ENVELOPE_SCHEMA.simpleString()


# --------------------------------------------------------------------- #
# r6: watermark-incremental tail (O(changes) per sync)
# --------------------------------------------------------------------- #


@pytest.fixture()
def churn_db(spark):
    """A mutable copy of the golden table for watermark-tail tests
    (function-scoped: each test gets fresh churn)."""
    db = tempfile.mkdtemp(prefix="derby_wm_") + "/srcdb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE HUDI_DELTA_TEST ("
        "pk_id INT PRIMARY KEY, name VARCHAR(64), value INT, "
        "updated_at TIMESTAMP, created_at TIMESTAMP)"
    )
    for pk, name, value in GOLDEN_ROWS:
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, '{name}', {value}, "
            "TIMESTAMP('2023-01-12 04:01:00'), "
            "TIMESTAMP('2023-01-12 04:00:00'))"
        )
    yield url, conn
    conn.close()


DRV = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


def test_watermark_predicate_is_pushed_to_source(spark, churn_db):
    """The whole keyset predicate (wm > W OR (wm = W AND pk > K)) must
    reach the remote JDBC query — the '*' prefix in PushedFilters marks
    source-side evaluation; without it each sync re-scans the source
    and the O(changes) claim is void."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        read_jdbc_watermark_increment,
    )

    url, _ = churn_db
    inc = read_jdbc_watermark_increment(
        spark, url, "HUDI_DELTA_TEST", "updated_at", "pk_id",
        last_watermark="2023-01-12 04:01:00", last_key=2, **DRV,
    )
    jvm = spark._jvm
    plan = inc._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PushedFilters: [*Or(GreaterThan(UPDATED_AT" in plan, plan
    assert "GreaterThan(PK_ID,2)" in plan, plan


def test_watermark_tail_is_o_changes_and_exact(spark, churn_db):
    """After churn, the pull returns EXACTLY the changed rows (keyset
    cursor: boundary-timestamp rows neither lost nor re-read), and the
    envelopes classify INSERT vs UPDATE-INSERT via created/updated."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        increment_watermark,
        read_jdbc_snapshot,
        read_jdbc_watermark_increment,
        watermark_tail_envelopes,
    )

    url, conn = churn_db
    snap0 = read_jdbc_snapshot(spark, url, "HUDI_DELTA_TEST", **DRV)
    wm, key = increment_watermark(snap0, "updated_at", "pk_id")
    assert str(wm).startswith("2023-01-12 04:01") and key == 4

    st = conn.createStatement()
    st.executeUpdate(
        "INSERT INTO HUDI_DELTA_TEST VALUES (5, 'htc', 50, "
        "TIMESTAMP('2023-01-12 05:30:00'), TIMESTAMP('2023-01-12 05:30:00'))"
    )
    st.executeUpdate(
        "UPDATE HUDI_DELTA_TEST SET value = 201, "
        "updated_at = TIMESTAMP('2023-01-12 05:30:01') WHERE pk_id = 2"
    )
    st.executeUpdate("DELETE FROM HUDI_DELTA_TEST WHERE pk_id = 3")
    st.close()

    inc = read_jdbc_watermark_increment(
        spark, url, "HUDI_DELTA_TEST", "updated_at", "pk_id",
        last_watermark=wm, last_key=key, **DRV,
    )
    rows = {r.PK_ID: r for r in inc.collect()}
    assert set(rows) == {2, 5}  # O(changes): only the churned rows
    env = watermark_tail_envelopes(
        inc, "hudi_delta_test", "db", ["pk_id"],
        created_column="created_at", updated_column="updated_at",
    )
    kinds = {
        r["payload"]["pk_id"]: r["source_metadata"]["change_type"]
        for r in env.collect()
    }
    assert kinds == {5: "INSERT", 2: "UPDATE-INSERT"}
    # the advanced cursor re-pulls nothing (no lost, no re-read)
    wm2, key2 = increment_watermark(inc, "updated_at", "pk_id")
    again = read_jdbc_watermark_increment(
        spark, url, "HUDI_DELTA_TEST", "updated_at", "pk_id",
        last_watermark=wm2, last_key=key2, **DRV,
    )
    assert again.count() == 0


def test_watermark_boundary_key_tiebreak(spark, churn_db):
    """Two rows sharing the boundary timestamp: a cursor mid-timestamp
    (wm, key) pulls only the higher key — the classic keyset-pagination
    edge a bare 'wm > W' predicate gets wrong (it would re-read or
    drop boundary rows)."""
    from hudi_and_delta_showcase_spark.jdbc_source import (
        read_jdbc_watermark_increment,
    )

    url, conn = churn_db
    st = conn.createStatement()
    for pk in (6, 7):
        st.executeUpdate(
            f"INSERT INTO HUDI_DELTA_TEST VALUES ({pk}, 'pad', 0, "
            "TIMESTAMP('2023-01-12 06:00:00'), "
            "TIMESTAMP('2023-01-12 06:00:00'))"
        )
    st.close()
    inc = read_jdbc_watermark_increment(
        spark, url, "HUDI_DELTA_TEST", "updated_at", "pk_id",
        last_watermark="2023-01-12 06:00:00", last_key=6, **DRV,
    )
    assert [r.PK_ID for r in inc.collect()] == [7]


def test_sync_jdbc_source_cycles_and_crash_replay(spark, churn_db, tmp_path):
    """Full sync cycles: backfill creates the table with the cursor in
    commit 0; churn; incremental cycle applies O(changes); an empty
    cycle commits nothing. Crash atomicity: replaying the increment
    against a table whose cursor did NOT advance (simulated crash
    before commit) converges to the same state — the precombine upsert
    absorbs the replay."""
    from hudi_and_delta_showcase_spark.jdbc_source import sync_jdbc_source
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    url, conn = churn_db
    target = str(tmp_path / "t")
    r = sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **DRV)
    assert r["mode"] == "backfill" and r["rows"] == 4
    t = LakehouseTable.load(spark, target)
    assert "jdbc_sync_cursor" in t.history()[0].stats

    st = conn.createStatement()
    st.executeUpdate(
        "UPDATE HUDI_DELTA_TEST SET value = 999, "
        "updated_at = TIMESTAMP('2023-01-12 05:00:00') WHERE pk_id = 1"
    )
    st.close()
    r2 = sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **DRV)
    assert r2["mode"] == "incremental" and r2["rows"] == 1
    versions_after = LakehouseTable.load(spark, target)._commit(None).version

    # no churn: empty increment -> NO new commit (cursor unchanged)
    r3 = sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **DRV)
    assert r3["rows"] == 0 and r3["cursor"] == r2["cursor"]
    assert (
        LakehouseTable.load(spark, target)._commit(None).version
        == versions_after
    )

    # crash simulation: re-apply the SAME increment as if the previous
    # cycle's commit had not landed — the state must converge, not
    # double-apply
    from hudi_and_delta_showcase_spark.jdbc_source import (
        read_jdbc_watermark_increment,
        watermark_tail_envelopes,
    )
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        normalize_cdc_batch,
    )

    inc = read_jdbc_watermark_increment(
        spark, url, "HUDI_DELTA_TEST", "updated_at", "pk_id",
        last_watermark="2023-01-12 04:01:00", last_key=4, **DRV,
    )
    env = watermark_tail_envelopes(
        inc, "hudi_delta_test", "db", ["pk_id"],
        created_column="created_at", updated_column="updated_at",
    )
    LakehouseTable.load(spark, target).upsert(normalize_cdc_batch(env))
    final = {
        (r.pk_id, r.value)
        for r in LakehouseTable.load(spark, target).read().collect()
    }
    assert final == {(1, 999), (2, 20), (3, 30), (4, 40)}


def test_sync_generic_source_schema(spark, tmp_path):
    """r6: the sync loop is payload-schema-GENERIC — a source table
    with a completely different shape (products: sku/price/qty) rides
    the same envelope pipeline: auto-derived payload struct, timestamp
    normalization over ITS timestamp columns, watermark on modified_at,
    composite state preserved across cycles."""
    from hudi_and_delta_showcase_spark.jdbc_source import sync_jdbc_source
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    db = tempfile.mkdtemp(prefix="derby_gen_") + "/srcdb"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName("org.apache.derby.jdbc.EmbeddedDriver")
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE PRODUCTS (id INT PRIMARY KEY, sku VARCHAR(32), "
        "price DOUBLE, qty INT, modified_at TIMESTAMP, "
        "created_at TIMESTAMP)"
    )
    for i, sku, price, qty in [
        (1, "A-1", 9.5, 3), (2, "B-2", 19.0, 7), (3, "C-3", 5.25, 0),
    ]:
        st.executeUpdate(
            f"INSERT INTO PRODUCTS VALUES ({i}, '{sku}', {price}, {qty}, "
            "TIMESTAMP('2024-06-01 10:00:00'), "
            "TIMESTAMP('2024-06-01 10:00:00'))"
        )
    target = str(tmp_path / "products")
    r = sync_jdbc_source(
        spark, url, "PRODUCTS", target,
        watermark_column="modified_at", key_column="id",
        primary_keys=["id"],
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert r["mode"] == "backfill" and r["rows"] == 3
    t = LakehouseTable.load(spark, target)
    assert t.key_cols == ["id"] and t.precombine == "modified_at"
    cols = set(t.read().columns)
    assert {"id", "sku", "price", "qty", "modified_at",
            "created_at", "change_type", "is_deleted"} <= cols

    st.executeUpdate(
        "UPDATE PRODUCTS SET price = 21.0, "
        "modified_at = TIMESTAMP('2024-06-02 08:00:00') WHERE id = 2"
    )
    st.executeUpdate(
        "INSERT INTO PRODUCTS VALUES (4, 'D-4', 1.0, 9, "
        "TIMESTAMP('2024-06-02 09:00:00'), TIMESTAMP('2024-06-02 09:00:00'))"
    )
    st.close(); conn.close()
    r2 = sync_jdbc_source(
        spark, url, "PRODUCTS", target,
        watermark_column="modified_at", key_column="id",
        primary_keys=["id"],
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert r2["mode"] == "incremental" and r2["rows"] == 2
    state = {
        r.id: (r.sku, r.price, r.qty, r.change_type)
        for r in t.read().collect()
    }
    assert state[2] == ("B-2", 21.0, 7, "UPDATE-INSERT")
    assert state[4] == ("D-4", 1.0, 9, "INSERT")
    assert state[1][3] == "INSERT" and len(state) == 4
    # modified_at normalized to epoch seconds like the golden loop
    assert t.read().filter("id = 4").first().modified_at == 1717318800


def test_sync_reconcile_deletes(spark, churn_db, tmp_path):
    """The delete sweep: after the source loses pk3, a reconciling
    cycle soft-deletes it in the target with its last-seen image —
    closing the watermark tail's delete blindness. The source read is
    key-only (projection pushed): pinned via the executed plan's
    ReadSchema."""
    from hudi_and_delta_showcase_spark.jdbc_source import sync_jdbc_source
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    url, conn = churn_db
    target = str(tmp_path / "t")
    sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **DRV)
    st = conn.createStatement()
    st.executeUpdate("DELETE FROM HUDI_DELTA_TEST WHERE pk_id = 3")
    st.close()
    # plain cycle: delete invisible
    r = sync_jdbc_source(spark, url, "HUDI_DELTA_TEST", target, **DRV)
    assert r["rows"] == 0 and "deletes" not in r
    t = LakehouseTable.load(spark, target)
    assert t.read().filter("pk_id = 3").first().is_deleted is False
    # reconciling cycle: key-only sweep finds and soft-deletes pk3
    r2 = sync_jdbc_source(
        spark, url, "HUDI_DELTA_TEST", target, reconcile_deletes=True, **DRV
    )
    assert r2["deletes"] == 1
    row = t.read().filter("pk_id = 3").first()
    assert row.is_deleted is True and row.name == "dell" and row.value == 30
    assert row.change_type == "DELETE"
    # live rows untouched
    assert t.read().filter("NOT is_deleted").count() == 3
    # idempotent: a second sweep deletes nothing
    r3 = sync_jdbc_source(
        spark, url, "HUDI_DELTA_TEST", target, reconcile_deletes=True, **DRV
    )
    assert r3["deletes"] == 0
