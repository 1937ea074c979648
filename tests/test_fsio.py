"""fsio: the table layer's filesystem abstraction (VERDICT r4 #2).

Covers (a) pure path helpers, (b) the put-if-absent commit publish —
including a REAL multi-process race, the lost-commit window the
in-process staged-race tests could not exercise, and (c) an end-to-end
LakehouseTable lifecycle over a ``file://`` URI, which routes every
metadata call through the Hadoop FileSystem path (the same code path a
``gs://``/``s3a://``/``hdfs://`` table root takes).
"""

import json
import multiprocessing as mp
import os
import re
import tempfile

import pytest

from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables import manifest as mf

# --------------------------------------------------------------------- #
# path helpers (no Spark needed)
# --------------------------------------------------------------------- #


def test_is_remote_forms():
    assert fsio.is_remote("gs://bucket/t")
    assert fsio.is_remote("s3a://bucket/t")
    assert fsio.is_remote("file:///tmp/t")
    assert fsio.is_remote("file:/tmp/t")  # Hadoop's normalized form
    assert not fsio.is_remote("/tmp/t")
    assert not fsio.is_remote("relative/path")


def test_join_and_relpath_uri():
    base = "gs://bucket/tbl"
    child = fsio.join(base, "data", "f.parquet")
    assert child == "gs://bucket/tbl/data/f.parquet"
    assert fsio.relpath(child, base) == "data/f.parquet"
    # scheme-form drift: listing returned file:/ while base is file:///
    assert (
        fsio.relpath("file:/tmp/t/data/f.parquet", "file:///tmp/t")
        == "data/f.parquet"
    )
    with pytest.raises(ValueError):
        fsio.relpath("gs://other/x", base)


def test_absolutize_keeps_uris():
    assert fsio.absolutize("gs://b/t") == "gs://b/t"
    assert os.path.isabs(fsio.absolutize("rel/path"))


def test_uri_path():
    assert fsio.uri_path("file:///tmp/t") == "/tmp/t"
    assert fsio.uri_path("file:/tmp/t") == "/tmp/t"
    assert fsio.uri_path("gs://bucket/tbl") == "/tbl"
    assert fsio.uri_path("/plain/path") == "/plain/path"


# --------------------------------------------------------------------- #
# put-if-absent publish
# --------------------------------------------------------------------- #


def test_publish_exclusive_local_refuses_existing(tmp_path):
    target = str(tmp_path / "00000001.json")
    fsio.publish_exclusive(target, '{"v": 1}')
    with pytest.raises(FileExistsError):
        fsio.publish_exclusive(target, '{"v": "loser"}')
    # the winner's bytes are intact and no temp litter remains
    assert json.loads(fsio.read_text(target)) == {"v": 1}
    assert [p.name for p in tmp_path.iterdir()] == ["00000001.json"]


def _race_worker(target: str, payload: str, barrier, results):
    barrier.wait()  # maximize overlap
    try:
        fsio.publish_exclusive(target, payload)
        results.put(("win", payload))
    except FileExistsError:
        results.put(("lose", payload))


def test_publish_exclusive_true_process_race(tmp_path):
    """N processes racing the SAME commit path: exactly one winner, and
    the surviving file holds the winner's complete payload (no
    interleaved/corrupt bytes — each writer stages a UNIQUE temp)."""
    target = str(tmp_path / "00000007.json")
    n = 8
    ctx = mp.get_context("fork")
    barrier = ctx.Barrier(n)
    results = ctx.Queue()
    payloads = [json.dumps({"writer": i, "pad": "x" * 4096}) for i in range(n)]
    procs = [
        ctx.Process(target=_race_worker, args=(target, p, barrier, results))
        for p in payloads
    ]
    for p in procs:
        p.start()
    outcomes = [results.get(timeout=30) for _ in range(n)]
    for p in procs:
        p.join(timeout=30)
    wins = [pl for tag, pl in outcomes if tag == "win"]
    assert len(wins) == 1, f"expected exactly 1 winner, got {len(wins)}"
    assert fsio.read_text(target) == wins[0]  # complete, uncorrupted
    assert sorted(os.listdir(tmp_path)) == ["00000007.json"]  # no litter


def test_append_commit_race_maps_to_concurrent_error(tmp_path):
    """Two Commit objects prepared at the same version: the second
    append fails with the OCC-visible 'concurrent write detected', even
    though both passed any earlier exists() pre-check."""
    table = str(tmp_path / "tbl")
    c = mf.Commit(version=0, action="insert", commit_time=mf.make_commit_time())
    mf.append_commit(table, c)
    with pytest.raises(RuntimeError, match="concurrent write detected"):
        mf.append_commit(table, c)


# --------------------------------------------------------------------- #
# static guard: table metadata IO goes through fsio only
# --------------------------------------------------------------------- #

_POSIX_CALLS = re.compile(
    r"(?<!fsio\.)(?:\bos\.(?:listdir|walk|replace|remove|stat|makedirs|rename|link)\b"
    r"|\bshutil\.(?:rmtree|move|copy)\b"
    r"|(?<![\w.])open\()"
)


def test_table_metadata_modules_use_fsio_only():
    """No direct POSIX file calls in the table-format modules — every
    metadata touch must route through fsio so object-store table roots
    work (fsio itself is the one sanctioned implementation site)."""
    import hudi_and_delta_showcase_spark.tables as pkg

    root = os.path.dirname(pkg.__file__)
    offenders = []
    for mod in ("manifest.py", "lakehouse.py", "delta_log.py", "hoodie_timeline.py"):
        src = open(os.path.join(root, mod)).read()
        for i, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if _POSIX_CALLS.search(code):
                offenders.append(f"{mod}:{i}: {line.strip()}")
    assert not offenders, "direct POSIX IO in table modules:\n" + "\n".join(
        offenders
    )


# --------------------------------------------------------------------- #
# file:// URI lifecycle through the Hadoop FileSystem path
# --------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def spark():
    from hudi_and_delta_showcase_spark.session import get_spark

    return get_spark()


@pytest.fixture()
def uri_table(spark):
    import pyspark.sql.functions as F

    df = spark.range(60).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).alias("v"),
        F.expr(
            "cast('2024-01-01 00:00:00' as timestamp_ntz)"
            " + make_interval(0,0,0,0,0,0,id)"
        ).alias("ts"),
    )
    root = tempfile.mkdtemp(prefix="fsio_uri_")
    return df, f"file://{root}/tbl"


def test_lakehouse_lifecycle_over_file_uri(spark, uri_table):
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    df, uri = uri_table
    t = LakehouseTable.create(
        spark, uri, df, key_cols=["k"], precombine="ts", cdc_enabled=True
    )
    assert t._commit(None).files  # manifest written via Hadoop FS
    up = df.withColumn("v", F.col("v") + 100).filter(F.col("k") < 10)
    t.upsert(up)
    assert t.read().count() == 60
    assert t.read(version=0).count() == 60  # time travel
    assert (
        t.read().filter(F.col("k") < 10).agg(F.min("v")).first()[0] >= 100
    )
    assert t.read_changes(1, 1).count() == 20  # CDF pre+post images
    # savepoint + vacuum + reopen all through the URI
    t.savepoint(0, "pin")
    dry = t.vacuum(retain_versions=1, dry_run=True)
    assert dry["retained_versions"] == [0, 1]
    t2 = LakehouseTable(spark, uri)
    assert t2.read().count() == 60
    # deletes (DV-less path) round-trip too
    t.delete(t.read().filter(F.col("k") >= 50))
    assert t.read().count() == 50


def test_delta_export_over_file_uri(spark, uri_table):
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )

    df, uri = uri_table
    t = LakehouseTable.create(spark, uri, df, key_cols=["k"], precombine="ts")
    assert export_delta_log(t) == 0
    assert read_delta_table(spark, uri).count() == 60


def test_hoodie_export_over_file_uri(spark, uri_table):
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )

    df, uri = uri_table
    t = LakehouseTable.create(spark, uri, df, key_cols=["k"], precombine="ts")
    assert export_hoodie_timeline(t)
    assert read_hoodie_table(spark, uri).count() == 60


def test_publish_exclusive_hadoop_path(spark, tmp_path):
    """create(overwrite=false) through the Hadoop FileSystem route
    (file:// URI) is exclusive too: second publish raises, winner bytes
    survive."""
    target = f"file://{tmp_path}/commit.json"
    fsio.publish_exclusive(target, '{"v": "winner"}')
    with pytest.raises(FileExistsError):
        fsio.publish_exclusive(target, '{"v": "loser"}')
    assert json.loads(fsio.read_text(target)) == {"v": "winner"}


def test_occ_rebase_through_file_uri(spark, tmp_path):
    """Two writers prepared at the same version on a file:// table:
    the loser's blind insert rebases onto the winner (disjoint append),
    yielding contiguous versions — the OCC loop working through the
    Hadoop metadata path end to end."""
    t = f"file://{tmp_path}/tbl"
    base = mf.Commit(version=0, action="insert",
                     commit_time=mf.make_commit_time(), files=["a.parquet"])
    mf.append_commit(t, base)
    w1 = mf.Commit(version=1, action="insert",
                   commit_time=mf.make_commit_time(),
                   files=["a.parquet", "b.parquet"])
    w2 = mf.Commit(version=1, action="insert",
                   commit_time=mf.make_commit_time(),
                   files=["a.parquet", "c.parquet"])
    mf.append_commit_rebase(t, w1)
    rebased = mf.append_commit_rebase(t, w2)  # loses v1, rebases to v2
    assert rebased.version == 2
    assert sorted(rebased.files) == ["a.parquet", "b.parquet", "c.parquet"]


def test_apply_cdc_stream_over_file_uri_table(spark, tmp_path):
    """The streaming CDC apply creates/loads its target table through
    fsio, so a scheme:// table path works end to end."""
    from hudi_and_delta_showcase_spark.operators.cdc import (
        golden_backfill,
        golden_cdc_batch,
    )
    from hudi_and_delta_showcase_spark.streaming.cdc_stream import (
        apply_cdc_stream,
    )

    drop = str(tmp_path / "drop")
    golden_backfill(spark).coalesce(1).write.parquet(f"{drop}/b0")
    golden_cdc_batch(spark).coalesce(1).write.parquet(f"{drop}/b1")
    uri = f"file://{tmp_path}/tbl"
    t = apply_cdc_stream(
        spark, f"{drop}/*/", uri, checkpoint_dir=str(tmp_path / "ckpt")
    )
    state = {r.pk_id: (r.value, r.is_deleted)
             for r in t.read().select("pk_id", "value", "is_deleted").collect()}
    assert state[2] == (201, False) and state[3][1] is True
    assert len(state) == 5


# --------------------------------------------------------------------- #
# commit coordinators (r6: pluggable publish + torn-commit recovery)
# --------------------------------------------------------------------- #


def test_lock_table_coordinator_thread_race(tmp_path):
    """The external-coordination reference implementation: N threads
    racing publish through the lock table get exactly one winner, and
    the winner's bytes survive intact."""
    import threading

    coord = fsio.LockTableCoordinator()
    target = str(tmp_path / "00000003.json")
    outcomes = []
    barrier = threading.Barrier(8)

    def worker(i):
        barrier.wait()
        try:
            coord.publish(target, json.dumps({"writer": i}))
            outcomes.append(("win", i))
        except FileExistsError:
            outcomes.append(("lose", i))

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    wins = [i for tag, i in outcomes if tag == "win"]
    assert len(wins) == 1
    assert json.loads(fsio.read_text(target)) == {"writer": wins[0]}


def test_hadoop_rename_coordinator_file_uri(spark, tmp_path):
    """The HDFS-style publish (unique temp + exclusive FileContext
    rename): fully-written bytes become visible atomically, a second
    publish raises, and the loser's temp is cleaned up."""
    coord = fsio.HadoopRenameCoordinator()
    target = f"file://{tmp_path}/00000005.json"
    coord.publish(target, '{"v": "winner"}')
    with pytest.raises(FileExistsError):
        coord.publish(target, '{"v": "loser"}')
    assert json.loads(fsio.read_text(target)) == {"v": "winner"}
    # no .tmp litter (checksum-FS .crc sidecars are expected)
    left = [f for f in os.listdir(tmp_path) if not f.endswith(".crc")]
    assert sorted(left) == ["00000005.json"]


def test_coordinator_prefix_routing(tmp_path):
    """set_commit_coordinator routes publishes by longest prefix; the
    default (POSIX link) serves everything else."""

    class Recording(fsio.CommitCoordinator):
        def __init__(self):
            self.calls = []

        def publish(self, path, text):
            self.calls.append(path)
            fsio.write_atomic(path, text)

    rec = Recording()
    os.makedirs(tmp_path / "special")
    try:
        fsio.set_commit_coordinator(str(tmp_path / "special"), rec)
        fsio.publish_exclusive(str(tmp_path / "special" / "c.json"), "{}")
        fsio.publish_exclusive(str(tmp_path / "plain.json"), "{}")
        assert rec.calls == [str(tmp_path / "special" / "c.json")]
        assert isinstance(
            fsio.coordinator_for("hdfs://nn/t/c.json"),
            fsio.HadoopRenameCoordinator,
        )
        assert isinstance(
            fsio.coordinator_for("gs://b/t/c.json"),
            fsio.HadoopCreateCoordinator,
        )
    finally:
        fsio.clear_commit_coordinators()


def test_write_atomic_remote_readers_never_see_absent(spark, tmp_path):
    """Hammer the pointer-file contract over the Hadoop path: one
    writer rewriting _meta.json-style content while readers poll via
    read_pointer_text — every read returns complete, parseable JSON
    (stale or new, never torn, never FileNotFoundError)."""
    import threading

    target = f"file://{tmp_path}/_meta.json"
    fsio.write_atomic(target, json.dumps({"gen": 0}))
    stop = threading.Event()
    errors = []

    def reader():
        while not stop.is_set():
            try:
                # generous budget: the CONTRACT is that a sufficient
                # retry budget always covers the swap window (on file://
                # Hadoop's overwrite-rename is internally delete+rename,
                # and under heavy host load the writer can sit
                # descheduled mid-swap for hundreds of ms)
                doc = json.loads(
                    fsio.read_pointer_text(target, attempts=40, delay=0.1)
                )
                assert "gen" in doc
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))
                return

    t = threading.Thread(target=reader)
    t.start()
    for gen in range(1, 40):
        fsio.write_atomic(target, json.dumps({"gen": gen}))
    stop.set()
    t.join(timeout=30)
    assert not errors, errors
    assert json.loads(fsio.read_text(target)) == {"gen": 39}


# --------------------------------------------------------------------- #
# torn-commit quarantine (crashed writer on a non-atomic backend)
# --------------------------------------------------------------------- #


def test_torn_commit_quarantined_and_version_reclaimed(tmp_path, monkeypatch):
    """A zero-length commit file (writer crashed mid-publish on a
    backend without an atomic publish) must not wedge the version
    forever: once stale, the next writer quarantines it and claims the
    version."""
    table = str(tmp_path / "tbl")
    mf.append_commit(
        table, mf.Commit(version=0, action="insert",
                         commit_time=mf.make_commit_time())
    )
    torn = os.path.join(table, "_commits", "00000001.json")
    open(torn, "w").close()  # zero bytes: the torn artifact
    # fresh wreckage is within the grace window: still a conflict
    with pytest.raises(RuntimeError, match="concurrent write detected"):
        mf.append_commit(
            table, mf.Commit(version=1, action="insert",
                             commit_time=mf.make_commit_time())
        )
    monkeypatch.setattr(mf, "TORN_COMMIT_GRACE_SECONDS", 0.0)
    c1 = mf.Commit(version=1, action="insert",
                   commit_time=mf.make_commit_time(), files=["a.parquet"])
    mf.append_commit(table, c1)  # quarantine + reclaim
    assert mf.read_commit(table, 1).files == ["a.parquet"]
    corrupt = [
        f for f in os.listdir(os.path.join(table, "_commits"))
        if ".corrupt-" in f
    ]
    assert len(corrupt) == 1  # wreckage preserved for forensics


def test_read_commit_torn_file_raises_informative(tmp_path):
    table = str(tmp_path / "tbl")
    mf.append_commit(
        table, mf.Commit(version=0, action="insert",
                         commit_time=mf.make_commit_time())
    )
    with open(os.path.join(table, "_commits", "00000000.json"), "w") as fh:
        fh.write('{"version": 0, "act')  # partial write
    mf._snapshot_cache.clear()
    with pytest.raises(RuntimeError, match="torn commit"):
        mf.read_commit(table, 0)


# --------------------------------------------------------------------- #
# _meta.json DDL: serialized updates + fresh-handle enforcement
# --------------------------------------------------------------------- #


def test_concurrent_ddls_compose(spark, tmp_path):
    """Two handles adding DIFFERENT constraints concurrently: both land
    (the lock-bracketed read-modify-write cannot lose one)."""
    import threading

    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    path = str(tmp_path / "tbl")
    LakehouseTable.create(spark, path, df, key_cols=["k"])
    h1 = LakehouseTable(spark, path)
    h2 = LakehouseTable(spark, path)
    barrier = threading.Barrier(2)
    errors = []

    def ddl(handle, name):
        barrier.wait()
        try:
            handle.add_constraint(name, "v IS NOT NULL")
        except Exception as exc:  # noqa: BLE001
            errors.append(repr(exc))

    t1 = threading.Thread(target=ddl, args=(h1, "c1"))
    t2 = threading.Thread(target=ddl, args=(h2, "c2"))
    t1.start(); t2.start(); t1.join(30); t2.join(30)
    assert not errors, errors
    fresh = LakehouseTable(spark, path)
    assert set(fresh.constraints) == {"c1", "c2"}


def test_stale_handle_enforces_new_constraint(spark, tmp_path):
    """A handle opened BEFORE a concurrent ADD CONSTRAINT still
    enforces it on its next write (metadata is resolved per-write, not
    per-handle)."""
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    path = str(tmp_path / "tbl")
    LakehouseTable.create(spark, path, df, key_cols=["k"])
    stale = LakehouseTable(spark, path)           # opened first
    LakehouseTable(spark, path).add_constraint("pos", "v >= 0")
    bad = spark.range(1).select(
        F.col("id").alias("k"), F.lit(-5).alias("v")
    )
    with pytest.raises(ValueError, match="CHECK constraint violation"):
        stale.upsert(bad)


def test_occ_rebase_through_lock_table_coordinator(tmp_path):
    """The FULL OCC loop driven through a registered coordinator: the
    commit publish routes by prefix into the lock-table backend (the
    plain-S3 strategy), threads race real append_commit_rebase calls,
    and every blind insert lands at a distinct contiguous version with
    all files merged — proving the coordinator interface carries the
    engine's commit protocol, not just raw publishes."""
    import threading

    class Counting(fsio.LockTableCoordinator):
        def __init__(self):
            self.published = []

        def publish(self, path, text):
            super().publish(path, text)
            self.published.append(path)

    coord = Counting()
    table = str(tmp_path / "tbl")
    try:
        fsio.set_commit_coordinator(str(tmp_path), coord)
        mf.append_commit(
            table, mf.Commit(version=0, action="insert",
                             commit_time=mf.make_commit_time(),
                             files=["base.parquet"]),
        )
        barrier = threading.Barrier(6)
        errors = []

        def writer(i):
            barrier.wait()
            try:
                mf.append_commit_rebase(
                    table,
                    mf.Commit(version=1, action="insert",
                              commit_time=mf.make_commit_time(),
                              files=["base.parquet", f"w{i}.parquet"]),
                )
            except Exception as exc:  # noqa: BLE001
                errors.append(repr(exc))

        threads = [
            threading.Thread(target=writer, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=60)
        assert not errors, errors
        latest = mf.latest_commit(table)
        assert latest.version == 6  # contiguous: every writer landed
        assert sorted(latest.files) == sorted(
            ["base.parquet"] + [f"w{i}.parquet" for i in range(6)]
        )
        assert coord.published  # commits actually flowed through it
    finally:
        fsio.clear_commit_coordinators()
