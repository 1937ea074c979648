"""Streaming-engine tests (M7): batch ≡ stream equivalence for the window
operators, watermark late-data eviction, and checkpointed incremental CDC
apply (the exactly-once file-arrival loop)."""

from __future__ import annotations

import datetime
import os
import tempfile

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators.cdc import (
    golden_backfill,
    golden_cdc_batch,
)
from hudi_and_delta_showcase_spark.streaming import (
    apply_cdc_stream,
    read_events_stream,
    run_to_memory,
)
from hudi_and_delta_showcase_spark.streaming.windows import (
    batch_user_stats,
    session_stats,
    sliding_avg,
    stateful_user_stats,
    tumbling_counts,
)


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


# --------------------------------------------------------------------- #
# stream ≡ batch: the same transformation body on both engines
# --------------------------------------------------------------------- #


@pytest.mark.parametrize(
    "op",
    [
        lambda d: tumbling_counts(d, window="1 hour"),
        lambda d: sliding_avg(d, window="1 hour", slide="30 minutes"),
        lambda d: session_stats(d, gap="30 minutes"),
    ],
    ids=["tumbling", "sliding", "session"],
)
def test_stream_equals_batch(spark, sf_dir, op):
    batch = op(load_table(spark, sf_dir, "events"))
    stream = run_to_memory(op(read_events_stream(spark, sf_dir)), "complete")
    assert _rows(stream) == _rows(batch)


def test_stream_batch_ts_unit_canary(spark, sf_dir):
    """Canary: the streamed ``ts`` must be bit-identical to the batch
    path's, whatever parquet timestamp unit the fixture ships with
    (TIMESTAMP(NANOS) in older driver envs, TIMESTAMP(MICROS) now).
    Round 3's only red rows came from the stream source assuming nanos
    and dividing micros by 1000 — every streamed timestamp landed in
    January 1970. This trips on the NEXT unit/Spark change instead of
    the driver artifact."""
    batch = load_table(spark, sf_dir, "events")
    stream = run_to_memory(
        read_events_stream(spark, sf_dir).agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ),
        "complete",
    )
    b = batch.agg(F.min("ts").alias("lo"), F.max("ts").alias("hi")).first()
    s = stream.first()
    assert dict(stream.dtypes)["lo"] == dict(
        batch.agg(F.min("ts").alias("lo")).dtypes
    )["lo"]
    assert (s.lo, s.hi) == (b.lo, b.hi)


def test_stateful_equals_batch_agg(spark, sf_dir):
    batch = batch_user_stats(load_table(spark, sf_dir, "events"))
    stream = run_to_memory(
        stateful_user_stats(read_events_stream(spark, sf_dir)), "update"
    )
    assert _rows(stream) == _rows(batch)


def test_watermarked_query_withholds_open_window(spark, sf_dir):
    """The registered watermarked append-mode query (stream_watermarked_counts)
    must emit exactly the windows the watermark has closed: every window
    whose end <= max(ts) - delay, and NOT the trailing still-open
    window(s) — i.e. state eviction gates emission, it isn't a batch agg
    in disguise."""
    from hudi_and_delta_showcase_spark.queries.streaming_queries import (
        stream_watermarked_counts,
    )
    from hudi_and_delta_showcase_spark.streaming.windows import (
        ntz_epoch_instant,
    )

    out = stream_watermarked_counts(spark, sf_dir)
    ev = load_table(spark, sf_dir, "events")
    all_windows = (
        ev.select(F.unix_micros(
            F.window(ntz_epoch_instant("ts"), "1 hour").getField("start")
        ).alias("ws")).distinct().count()
    )
    emitted = out.count()
    assert 0 < emitted < all_windows  # trailing open window(s) withheld
    # cutoff contract: emitted == windows with end <= max(ts) - 30min
    mx = ev.agg(F.max(ntz_epoch_instant("ts"))).first()[0]
    import datetime

    cutoff = mx - datetime.timedelta(minutes=30)
    closed = (
        ev.select(
            F.window(ntz_epoch_instant("ts"), "1 hour")
            .getField("end")
            .alias("we")
        )
        .distinct()
        .filter(F.col("we") <= F.lit(cutoff))
        .count()
    )
    assert emitted == closed


# --------------------------------------------------------------------- #
# watermark semantics: late rows beyond the delay are dropped, closed
# windows are emitted (append mode). Event time must be LTZ for
# withWatermark; session tz is UTC so the instants are deterministic.
# --------------------------------------------------------------------- #


def test_watermark_drops_late_data(spark):
    root = tempfile.mkdtemp(prefix="wm_test_")
    drop = f"{root}/drop"
    os.makedirs(drop)

    def write_file(idx, rows):
        df = spark.createDataFrame(rows, "ts timestamp, user_id long, value double")
        df.coalesce(1).write.parquet(f"{drop}/f{idx}")

    t = lambda s: datetime.datetime.fromisoformat(s)
    # f0: two events in the 10:00 window
    write_file(0, [(t("2024-01-01 10:00:10"), 1, 1.0), (t("2024-01-01 10:20:00"), 2, 1.0)])
    # f1: event at 12:30 -> watermark advances to 11:30 (delay 1h) after
    # this batch; the 10:00 window is evicted+emitted during the NEXT batch
    write_file(1, [(t("2024-01-01 12:30:00"), 1, 1.0)])
    # f2: keeps the stream moving (the late-event filter lags eviction by
    # one batch — Spark's lateEvents vs eviction watermark split)
    write_file(2, [(t("2024-01-01 12:40:00"), 2, 1.0)])
    # f3: LATE event in the closed 10:00 window, two batches after the
    # watermark passed it -> dropped by the late-row filter
    write_file(3, [(t("2024-01-01 10:40:00"), 3, 1.0)])

    sdf = (
        spark.readStream.schema("ts timestamp, user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )
    result = run_to_memory(sdf, mode="append", state_partitions=2)
    got = {(r.wstart.isoformat(sep=" "), r.n) for r in result.collect()}
    # the 10:00 window closed with ONLY the two on-time events (late row
    # dropped); the 12:00 window never crossed the watermark -> unemitted
    assert got == {("2024-01-01 10:00:00", 2)}


def test_watermarked_stream_join_bounds_state(spark):
    """Stream-stream inner join with watermarks on BOTH sides and a
    time-bound condition: the state store holds only rows within the
    join window + watermark delay, so a match arriving after the
    watermark passed its partner's eviction horizon is NOT produced —
    the bounded-state behavior that makes stream joins viable at scale
    (an unwatermarked join buffers both streams forever)."""
    root = tempfile.mkdtemp(prefix="wm_join_")
    left_d, right_d = f"{root}/l", f"{root}/r"
    os.makedirs(left_d)
    os.makedirs(right_d)
    t = lambda s: datetime.datetime.fromisoformat(s)

    def write(d, idx, rows):
        spark.createDataFrame(rows, "ts timestamp, k long").coalesce(
            1
        ).write.parquet(f"{d}/f{idx}")

    # left k=1 at 10:00; right k=1 at 10:10 -> in-window match
    write(left_d, 0, [(t("2024-01-01 10:00:00"), 1)])
    write(right_d, 0, [(t("2024-01-01 10:10:00"), 1)])
    # advance both watermarks far past 10:00 (delay 30m, window 1h)
    write(left_d, 1, [(t("2024-01-01 15:00:00"), 2)])
    write(right_d, 1, [(t("2024-01-01 15:05:00"), 2)])
    # spacer batch: join-state eviction runs at the end of the batch
    # AFTER the watermark advance (the same one-batch lag the dedup and
    # window tests pin down), so the stream must move once more before
    # the late row arrives
    write(right_d, 2, [(t("2024-01-01 15:10:00"), 9)])
    # VERY late right row for k=1 at 10:20: its left partner's state
    # was evicted (watermark ~14:30 >> 10:00 + 1h) -> no match emitted
    write(right_d, 3, [(t("2024-01-01 10:20:00"), 1)])

    left = (
        spark.readStream.schema("ts timestamp, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{left_d}/*")
        .withWatermark("ts", "30 minutes")
        .select(F.col("k"), F.col("ts").alias("lts"))
    )
    right = (
        spark.readStream.schema("ts timestamp, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{right_d}/*")
        .withWatermark("ts", "30 minutes")
        .select(F.col("k").alias("rk"), F.col("ts").alias("rts"))
    )
    joined = left.join(
        right,
        (F.col("k") == F.col("rk"))
        & (F.col("rts") >= F.col("lts"))
        & (F.col("rts") <= F.col("lts") + F.expr("INTERVAL 1 HOUR")),
    ).select("k", "lts", "rts")
    out = run_to_memory(joined, mode="append", state_partitions=2)
    got = {(r.k, r.rts.isoformat(sep=" ")) for r in out.collect()}
    assert (1, "2024-01-01 10:10:00") in got          # in-window match
    assert (2, "2024-01-01 15:05:00") in got          # in-window match
    assert (1, "2024-01-01 10:20:00") not in got      # evicted partner


# --------------------------------------------------------------------- #
# incremental CDC apply with checkpoint resume (exactly-once files)
# --------------------------------------------------------------------- #


def test_cdc_stream_incremental_restart(spark):
    root = tempfile.mkdtemp(prefix="cdc_restart_")
    drop, table, ckpt = f"{root}/drop", f"{root}/table", f"{root}/ckpt"
    os.makedirs(drop)

    golden_backfill(spark).coalesce(1).write.parquet(f"{drop}/b0")
    t1 = apply_cdc_stream(spark, f"{drop}/*", table, ckpt)
    state1 = {(r.pk_id, r.value) for r in t1.read().select("pk_id", "value").collect()}
    assert state1 == {(1, 10), (2, 20), (3, 30), (4, 40)}
    v1 = t1.history()[-1].version

    # second drop; SAME checkpoint -> only the new file is processed
    golden_cdc_batch(spark).coalesce(1).write.parquet(f"{drop}/b1")
    t2 = apply_cdc_stream(spark, f"{drop}/*", table, ckpt)
    state2 = {(r.pk_id, r.value) for r in t2.read().select("pk_id", "value").collect()}
    assert state2 == {(1, 10), (2, 201), (3, 30), (4, 40), (5, 50)}
    # exactly ONE new commit (the b1 batch); b0 was not re-applied
    assert t2.history()[-1].version == v1 + 1

    # re-running with nothing new is a no-op (checkpoint holds offsets)
    t3 = apply_cdc_stream(spark, f"{drop}/*", table, ckpt)
    assert t3.history()[-1].version == v1 + 1


def test_cdc_stream_golden_soft_delete(spark):
    """The streamed merge keeps the tombstone row with markers
    (README.md:511-531 semantics)."""
    root = tempfile.mkdtemp(prefix="cdc_soft_")
    drop = f"{root}/drop"
    os.makedirs(drop)
    golden_backfill(spark).coalesce(1).write.parquet(f"{drop}/b0")
    golden_cdc_batch(spark).coalesce(1).write.parquet(f"{drop}/b1")
    t = apply_cdc_stream(spark, f"{drop}/*", f"{root}/table", f"{root}/ckpt")
    row = t.read().filter(F.col("pk_id") == 3).collect()
    assert len(row) == 1
    assert row[0].is_deleted is True and row[0].change_type == "DELETE"


def test_cdc_stream_mor_ro_stale_rt_fresh(spark):
    """The reference's central MoR claim (README.md:920) through the
    STREAMING path: after the streamed CDC batch, `_ro` still serves the
    backfill values (samsung 20, no htc) while `_rt` serves the merged
    state (samsung 201, htc present); compaction reconciles them."""
    root = tempfile.mkdtemp(prefix="cdc_mor_stream_")
    drop = f"{root}/drop"
    os.makedirs(drop)
    golden_backfill(spark).coalesce(1).write.parquet(f"{drop}/b0")
    golden_cdc_batch(spark).coalesce(1).write.parquet(f"{drop}/b1")
    t = apply_cdc_stream(
        spark, f"{drop}/*", f"{root}/table", f"{root}/ckpt", table_type="mor"
    )
    ro = {(r.pk_id, r.value) for r in t.read_ro().select("pk_id", "value").collect()}
    rt = {(r.pk_id, r.value) for r in t.read_rt().select("pk_id", "value").collect()}
    assert ro == {(1, 10), (2, 20), (3, 30), (4, 40)}          # stale base
    assert rt == {(1, 10), (2, 201), (3, 30), (4, 40), (5, 50)}  # merged
    t.compact()
    ro2 = {(r.pk_id, r.value) for r in t.read_ro().select("pk_id", "value").collect()}
    assert ro2 == rt


def test_dedup_within_watermark_bounds_state(spark):
    """dropDuplicatesWithinWatermark: duplicates arriving within the
    watermark delay are suppressed; the seen-keys state is evicted once
    the watermark passes, so a duplicate arriving AFTER eviction is
    emitted again — the bounded-state behavior that makes streaming
    dedup viable at scale (vs dropDuplicates' unbounded seen-set)."""
    root = tempfile.mkdtemp(prefix="wm_dedup_")
    drop = f"{root}/drop"
    os.makedirs(drop)

    def write_file(idx, rows):
        df = spark.createDataFrame(rows, "ts timestamp, k long")
        df.coalesce(1).write.parquet(f"{drop}/f{idx}")

    t = lambda s: datetime.datetime.fromisoformat(s)
    # f0: key 1 first seen; f1: duplicate of key 1 within the delay ->
    # suppressed; f2: advance watermark far past key 1's state expiry
    # (state eviction runs at the END of the batch that sees the new
    # watermark, so the re-arrival must come one batch later); f3 keeps
    # the stream moving; f4: key 1 after eviction -> re-emitted
    write_file(0, [(t("2024-01-01 10:00:00"), 1)])
    write_file(1, [(t("2024-01-01 10:05:00"), 1)])
    write_file(2, [(t("2024-01-01 15:00:00"), 2)])
    write_file(3, [(t("2024-01-01 15:10:00"), 3)])
    write_file(4, [(t("2024-01-01 15:20:00"), 1)])

    sdf = (
        spark.readStream.schema("ts timestamp, k long")
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{drop}/*")
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
    )
    out = run_to_memory(sdf, mode="append", state_partitions=2)
    ks = [r.k for r in out.collect()]
    assert sorted(ks) == [1, 1, 2, 3]  # key 1 twice (post-eviction)


def test_table_changes_stream_mor_exactly_once(spark, sf_dir, tmp_path):
    """read_table_changes_stream on a MoR table: log commits stream as
    they land, compaction emits nothing, every (key, instant) change is
    delivered exactly once, and latest-per-key over the streamed
    changes equals the _rt snapshot."""
    from pyspark.sql import Window

    from hudi_and_delta_showcase_spark.streaming import (
        read_table_changes_stream,
        run_to_memory,
    )
    from hudi_and_delta_showcase_spark.tables import LakehouseTable

    events = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "value"
    )
    base = events.filter("user_id <= 8")
    incr = events.filter("user_id > 8")
    t = LakehouseTable.create(
        spark, str(tmp_path / "m"), base,
        key_cols=["user_id"], precombine="ts", tiebreakers=["event_id"],
        table_type="mor",
    )
    t.upsert(incr)  # -> log commit
    t.compact()     # -> re-org only, must be silent
    changes = run_to_memory(
        read_table_changes_stream(spark, str(tmp_path / "m")),
        mode="append",
    ).cache()
    # exactly-once: one delivery per (key, instant)
    assert (
        changes.select("_hoodie_record_key", "_hoodie_commit_time")
        .distinct()
        .count()
        == changes.count()
    )
    # exactly the 2 change-bearing instants (create + log upsert)
    instants = sorted(
        r[0]
        for r in changes.select("_hoodie_commit_time").distinct().collect()
    )
    hist = {c.version: c.commit_time for c in t.history()}
    assert instants == [hist[0], hist[1]]
    # streamed tail reconstructs the _rt snapshot
    w = Window.partitionBy("user_id").orderBy(
        F.desc("_hoodie_commit_time"), F.desc("ts"), F.desc("event_id")
    )
    tail = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter("__rn = 1")
    )
    got = {(r.user_id, r.event_id) for r in tail.collect()}
    want = {
        (r.user_id, r.event_id)
        for r in t.read_rt().select("user_id", "event_id").collect()
    }
    assert got == want
