"""The incremental-manifest contract (Delta-style actions + checkpoints).

Pure-Python: exercises ``tables/manifest.py`` directly — commit deltas,
checkpoint cadence, replay equivalence, order preservation, and
backward-compat reads of pre-checkpointing full-snapshot logs. The whole
lakehouse suite is the integration cover (every table op goes through
this module); these tests pin the on-disk format itself.
"""

import json
import os

import pytest

from hudi_and_delta_showcase_spark.tables import manifest as mf


def _mk(version, files, action="upsert", **kw):
    return mf.Commit(
        version=version,
        action=action,
        commit_time=mf.make_commit_time(),
        files=files,
        **kw,
    )


def _sim_commits(n, path):
    """n commits over a churning file population; returns the in-memory
    full snapshots append_commit was handed (ground truth)."""
    truth = []
    files: list[str] = []
    for v in range(n):
        # each commit adds 2 files, drops the oldest one from v>=3 on
        files = (files[1:] if v >= 3 else files) + [
            f"part-{v:04d}-a.parquet",
            f"part-{v:04d}-b.parquet",
        ]
        c = _mk(
            v,
            list(files),
            key_ranges={f: [f"k{v}", f"k{v+9}"] for f in files},
            txn={"app": v},
            stats={"rows": v * 10},
            cdc_files=[f"cdc/{v}.parquet"] if v % 2 else [],
            dv_files=[f"dv/{d}.parquet" for d in range(v % 3)],
            column_mapping={"phys_a": "logical_a"} if v >= 5 else {},
        )
        mf.append_commit(path, c)
        truth.append(c)
    return truth


def test_replay_equals_ground_truth(tmp_path):
    p = str(tmp_path / "t")
    truth = _sim_commits(25, p)
    for c in truth:
        got = mf.read_commit(p, c.version)
        assert got == c, f"version {c.version} snapshot drifted"
    assert mf.latest_commit(p) == truth[-1]
    assert mf.list_versions(p) == list(range(25))


def test_deltas_are_o_of_change_and_checkpoints_exist(tmp_path):
    p = str(tmp_path / "t")
    _sim_commits(25, p)
    d = mf.commits_dir(p)
    # steady-state commit records carry only the changed files
    rec = json.load(open(os.path.join(d, "00000015.json")))
    assert rec["delta"] is True
    assert len(rec["files_add"]) == 2 and len(rec["files_remove"]) == 1
    # unchanged key_ranges entries are NOT re-stored; removed file's is unset
    assert set(rec["key_ranges_unset"]) == set(rec["files_remove"])
    # checkpoints at the cadence, plus the Delta _last_checkpoint pointer
    for v in (10, 20):
        ck = os.path.join(d, f"{v:08d}.checkpoint.json")
        assert os.path.exists(ck)
        assert json.load(open(ck))["files"] == mf.read_commit(p, v).files
    assert json.load(open(os.path.join(d, "_last_checkpoint")))["version"] == 20
    # checkpoint files don't pollute the version listing
    assert mf.list_versions(p) == list(range(25))


def test_order_preserved_through_delta_roundtrip(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, ["c.parquet", "a.parquet", "b.parquet"]))
    mf.append_commit(
        p, _mk(1, ["c.parquet", "b.parquet", "d.parquet"])
    )  # drop a, add d
    assert mf.read_commit(p, 1).files == ["c.parquet", "b.parquet", "d.parquet"]


def test_backward_compat_full_snapshot_log(tmp_path):
    """A pre-checkpointing table (full snapshot per commit, no 'delta'
    key) reads back unchanged, and new commits append as deltas on top."""
    p = str(tmp_path / "t")
    d = mf.commits_dir(p)
    os.makedirs(d)
    for v in range(2):
        rec = {
            "version": v,
            "action": "insert",
            "commit_time": mf.make_commit_time(),
            "files": [f"old-{i}.parquet" for i in range(v + 1)],
        }
        with open(os.path.join(d, f"{v:08d}.json"), "w") as fh:
            json.dump({**mf.asdict(mf.Commit(**rec)), **rec}, fh)
    assert mf.read_commit(p, 1).files == ["old-0.parquet", "old-1.parquet"]
    nxt = _mk(2, ["old-0.parquet", "old-1.parquet", "new.parquet"])
    mf.append_commit(p, nxt)
    assert json.load(open(os.path.join(d, "00000002.json")))["delta"] is True
    assert mf.read_commit(p, 2) == nxt


def test_concurrent_append_still_refused(tmp_path):
    p = str(tmp_path / "t")
    mf.append_commit(p, _mk(0, ["a.parquet"]))
    with pytest.raises(RuntimeError, match="concurrent"):
        mf.append_commit(p, _mk(0, ["b.parquet"]))


def test_cache_returns_isolated_copies(tmp_path):
    p = str(tmp_path / "t")
    _sim_commits(3, p)
    a = mf.read_commit(p, 2)
    a.files.append("mutated.parquet")
    a.txn["rogue"] = 99
    b = mf.read_commit(p, 2)
    assert "mutated.parquet" not in b.files and "rogue" not in b.txn


def test_latest_version_probes_from_checkpoint(tmp_path):
    """latest_version resolves without a directory listing once a
    checkpoint exists: pointer + forward probes; correct below, at, and
    beyond the checkpoint cadence, and after further commits."""
    from hudi_and_delta_showcase_spark.tables import manifest as mf

    t = str(tmp_path / "t")
    assert mf.latest_version(t) is None
    for v in range(0, 7):  # below checkpoint cadence: listing fallback
        mf.append_commit(
            t, mf.Commit(version=v, action="insert",
                         commit_time=mf.make_commit_time(),
                         files=[f"f{v}.parquet"])
        )
    assert mf.latest_version(t) == 6
    for v in range(7, 14):  # crosses the v10 checkpoint
        mf.append_commit(
            t, mf.Commit(version=v, action="upsert",
                         commit_time=mf.make_commit_time(),
                         files=[f"f{v}.parquet"])
        )
    assert mf.latest_version(t) == 13  # pointer=10, 3 forward probes
    assert mf.latest_commit(t).files == ["f13.parquet"]
    # exactly at the checkpoint: zero forward probes
    import json

    lc = json.loads(
        open(f"{mf.commits_dir(t)}/_last_checkpoint").read()
    )
    assert lc["version"] == 10
