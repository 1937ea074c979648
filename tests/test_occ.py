"""Optimistic concurrency control (Delta OCC / Hudi multi-writer):
version races rebase when the transactions commute (partition-disjoint
writes, blind inserts) and raise ConcurrentWriteConflict when they
don't (same-file rewrites, same partitions, same txn app, renames).

Manifest-level tests drive the rules directly; the table-level test
stages a REAL race by injecting a competing upsert between a writer's
snapshot read and its commit attempt.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import manifest as mf
from hudi_and_delta_showcase_spark.tables.lakehouse import LakehouseTable


def _mk(version, files, action="upsert", **kw):
    return mf.Commit(
        version=version,
        action=action,
        commit_time=mf.make_commit_time(),
        files=files,
        **kw,
    )


P_A = "data/c1/__pp=A/f1.parquet"
P_A2 = "data/c2/__pp=A/f2.parquet"
P_B = "data/c2/__pp=B/f3.parquet"
P_B2 = "data/c3/__pp=B/f4.parquet"


def test_partition_disjoint_upserts_rebase(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A, P_B], action="insert"))
    # winner rewrites partition B
    mf.append_commit(p, _mk(1, [P_A, P_B2]))
    # loser prepared version 1 against base 0, rewriting partition A
    rebased = mf.append_commit_rebase(p, _mk(1, [P_A2, P_B]))
    assert rebased.version == 2
    assert sorted(rebased.files) == sorted([P_A2, P_B2])


def test_blind_insert_always_rebases(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A], action="insert"))
    mf.append_commit(p, _mk(1, [P_A2]))  # winner rewrote partition A
    new = "data/c9/__pp=A/f9.parquet"  # blind append INTO partition A
    rebased = mf.append_commit_rebase(p, _mk(1, [P_A, new], action="insert"))
    assert rebased.version == 2
    assert sorted(rebased.files) == sorted([P_A2, new])


def test_same_file_rewrite_conflicts(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A, P_B], action="insert"))
    mf.append_commit(p, _mk(1, [P_A2, P_B]))  # winner rewrote A's file
    with pytest.raises(mf.ConcurrentWriteConflict, match="delete/rewrite"):
        mf.append_commit_rebase(p, _mk(1, [P_B, "data/cx/__pp=A/fx.parquet"]))


def test_same_partition_append_conflicts(tmp_path):
    """Winner only ADDED files in partition A; a losing upsert that
    read-modified A must conflict (its merge decisions are stale)."""
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A, P_B], action="insert"))
    mf.append_commit(p, _mk(1, [P_A, P_A2, P_B], action="insert"))
    with pytest.raises(mf.ConcurrentWriteConflict, match="partitions"):
        mf.append_commit_rebase(p, _mk(1, [P_A2.replace("c2", "cz"), P_B]))


def test_restore_never_rebases(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A], action="insert"))
    mf.append_commit(p, _mk(1, [P_A, P_B], action="insert"))
    with pytest.raises(mf.ConcurrentWriteConflict, match="table-replacing"):
        mf.append_commit_rebase(p, _mk(1, [P_A], action="restore"))


def test_same_txn_app_conflicts(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A], action="insert"))
    mf.append_commit(p, _mk(1, [P_A, P_B], action="insert", txn={"app": 7}))
    with pytest.raises(mf.ConcurrentWriteConflict, match="writer app"):
        mf.append_commit_rebase(
            p, _mk(1, [P_A, P_B2], action="insert", txn={"app": 7})
        )


def test_concurrent_renames_conflict(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A], action="insert"))
    mf.append_commit(
        p, _mk(1, [P_A], action="rename", column_mapping={"x": "y"})
    )
    with pytest.raises(mf.ConcurrentWriteConflict, match="renames"):
        mf.append_commit_rebase(
            p, _mk(1, [P_A], action="rename", column_mapping={"x": "z"})
        )


def test_unpartitioned_writers_conflict(tmp_path):
    """Without hive-style partition dirs, disjointness can't be proven:
    two non-blind writers must conflict."""
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, ["data/c1/f1.parquet"], action="insert"))
    mf.append_commit(p, _mk(1, ["data/c1/f1.parquet", "data/c2/f2.parquet"]))
    with pytest.raises(mf.ConcurrentWriteConflict):
        mf.append_commit_rebase(
            p, _mk(1, ["data/c1/f1.parquet", "data/c3/f3.parquet"])
        )


def _staged_race(spark, path, monkeypatch, winner_batch, loser_batch):
    """Run loser.upsert(loser_batch); just before its commit lands, a
    second handle commits winner_batch — a real snapshot-read-to-commit
    race, not a mock."""
    df = spark.createDataFrame(
        [(1, "A", 10, 1), (2, "B", 20, 1)], "k int, part string, v int, sq int"
    )
    t = LakehouseTable.create(
        spark, path, df, key_cols=["k"], precombine="sq", partition_by="part"
    )
    state = {"fired": False}
    orig = mf.append_commit

    def inject(table_path, commit):
        if not state["fired"]:
            state["fired"] = True
            LakehouseTable(spark, path).upsert(winner_batch)
        return orig(table_path, commit)

    monkeypatch.setattr(mf, "append_commit", inject)
    try:
        loser_commit = t.upsert(loser_batch)
    finally:
        monkeypatch.setattr(mf, "append_commit", orig)
    return t, loser_commit


def test_table_level_race_disjoint_partitions_both_land(
    spark, tmp_path, monkeypatch
):
    winner = spark.createDataFrame(
        [(2, "B", 99, 2)], "k int, part string, v int, sq int"
    )
    loser = spark.createDataFrame(
        [(1, "A", 77, 2)], "k int, part string, v int, sq int"
    )
    t, commit = _staged_race(spark, str(tmp_path / "t"), monkeypatch, winner, loser)
    assert commit.version == 2  # rebased past the winner
    rows = {r.k: r.v for r in t.read().select("k", "v").collect()}
    assert rows == {1: 77, 2: 99}  # both writers' effects visible
    assert [c.action for c in t.history()] == ["insert", "upsert", "upsert"]


def test_table_level_race_same_partition_conflicts(
    spark, tmp_path, monkeypatch
):
    winner = spark.createDataFrame(
        [(1, "A", 99, 2)], "k int, part string, v int, sq int"
    )
    loser = spark.createDataFrame(
        [(1, "A", 77, 3)], "k int, part string, v int, sq int"
    )
    with pytest.raises(mf.ConcurrentWriteConflict):
        _staged_race(spark, str(tmp_path / "t"), monkeypatch, winner, loser)
    # the failed writer left no commit: winner's state is intact
    t = LakehouseTable(spark, str(tmp_path / "t"))
    assert {r.k: r.v for r in t.read().select("k", "v").collect()}[1] == 99


def test_rebase_inherits_winner_schema_widening(tmp_path):
    """A winner's type-widening must survive a loser's rebase: the
    loser (which never touched the schema) inherits the widened schema
    instead of silently regressing it to its base snapshot's."""
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A], action="insert"))
    mf.append_commit(
        p, _mk(1, [P_A, P_B], action="insert", table_schema="WIDE")
    )
    rebased = mf.append_commit_rebase(
        p, _mk(1, [P_A, P_B2], action="insert")
    )
    assert rebased.table_schema == "WIDE"
    assert mf.read_commit(p, 2).table_schema == "WIDE"


def test_concurrent_schema_changes_conflict(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A], action="insert"))
    mf.append_commit(
        p, _mk(1, [P_A, P_B], action="insert", table_schema="WIDE-A")
    )
    with pytest.raises(mf.ConcurrentWriteConflict, match="schema"):
        mf.append_commit_rebase(
            p, _mk(1, [P_A, P_B2], action="insert", table_schema="WIDE-B")
        )


def test_dv_delete_conflicts_with_concurrent_rewrite(tmp_path):
    """A deletion-vector delete must NOT rebase over a winner that
    changed data files: its vectors point at row positions in files the
    winner may have rewritten — the committed DELETE would silently
    delete nothing (Delta's ConcurrentDeleteRead case)."""
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, [P_A, P_B], action="insert"))
    mf.append_commit(p, _mk(1, [P_A2, P_B]))  # winner rewrote A's file
    with pytest.raises(mf.ConcurrentWriteConflict, match="deletion vectors"):
        mf.append_commit_rebase(
            p,
            _mk(1, [P_A, P_B], action="delete",
                dv_files=["dv/d1.parquet"]),
        )


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B", "C", "D"]),  # partition touched
            st.booleans(),  # blind insert vs rewrite
        ),
        min_size=2,
        max_size=6,
    ),
    st.data(),
)
def test_occ_race_converges_to_serial(tmp_path_factory, ops, data):
    """Property: a batch of writers that all prepared against the SAME
    base either rebase cleanly or conflict — and every writer that
    lands preserves the winners' effects exactly (final state = serial
    application of the landed writers, in landed order)."""
    import tempfile

    p = tempfile.mkdtemp(prefix="occprop_")
    # base: one file per partition
    base_files = [f"data/c0/__pp={part}/f-{part}.parquet" for part in "ABCD"]
    mf.append_commit(p, _mk(0, list(base_files), action="insert"))

    landed: list[tuple[str, bool, list[str], list[str]]] = []
    for i, (part, blind) in enumerate(ops):
        old = f"data/c0/__pp={part}/f-{part}.parquet"
        new = f"data/c{i + 1}/__pp={part}/f{i + 1}.parquet"
        if blind:
            commit_files = list(base_files) + [new]  # prepared vs BASE
            action = "insert"
        else:
            commit_files = [f for f in base_files if f != old] + [new]
            action = "upsert"
        attempt = _mk(1, commit_files, action=action)
        try:
            mf.append_commit_rebase(p, attempt)
            landed.append((part, blind, [new], [] if blind else [old]))
        except mf.ConcurrentWriteConflict:
            pass
    # replay the landed effects serially over the base
    expect = list(base_files)
    for part, blind, adds, removes in landed:
        expect = [f for f in expect if f not in removes] + adds
    final = mf.latest_commit(p)
    assert sorted(final.files) == sorted(expect)
    assert final.version == len(landed)
