"""Engine-table multi-conjunct predicate reads (r10):
``read_matching(predicate)`` — the engine's own leg of the predicate
API every foreign reader takes — prunes files on the manifest's
col-stats (any provably-disjoint conjunct skips the file), probes
per-column blooms on equality conjuncts, and applies exact filters on
the surviving scan (post-merge on MoR)."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable


def _mk(spark, path, **kw):
    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 20 else "b", k * 10) for k in range(40)],
        "k int, v string, g string, ts long",
    ).coalesce(2)
    return LakehouseTable.create(
        spark, path, df, key_cols=["k"], precombine="ts", **kw
    )


def test_conjuncts_prune_files_and_match_filter(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), partition_by="g")
    full = t.read()
    out = t.read_matching([("g", "=", "a"), ("k", ">=", 5)])
    assert len(out.inputFiles()) < len(full.inputFiles())
    got = sorted((r.k, r.g) for r in out.select("k", "g").collect())
    assert got == [(k, "a") for k in range(5, 20)]
    assert got == sorted(
        (r.k, r.g)
        for r in full.filter("g = 'a' AND k >= 5").select("k", "g").collect()
    )


def test_sql_string_and_in_op(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    out = t.read_matching("k IN (3, 25) AND v > 'v'")
    assert sorted(r.k for r in out.collect()) == [3, 25]


def test_empty_result_schema_stable(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"))
    out = t.read_matching([("k", ">", 10_000)])
    assert out.count() == 0
    assert out.schema == t.read().schema


def test_mor_filters_post_merge(spark, tmp_path):
    """An update that moves a row OUT of the predicate range must
    shadow its in-range base version — MoR logs are never pruned and
    the filter applies after the merge."""
    t = _mk(spark, str(tmp_path / "t"), table_type="mor")
    t.upsert(spark.createDataFrame(
        [(3, "moved", "a", 900)], "k int, v string, g string, ts long"
    ))
    out = t.read_matching([("ts", "<=", 400)])
    ks = sorted(r.k for r in out.collect())
    assert 3 not in ks  # latest version of k=3 has ts=900
    assert ks == [k for k in range(40) if k * 10 <= 400 and k != 3]


def test_bloom_equality_probe_prunes(spark, tmp_path):
    t = _mk(spark, str(tmp_path / "t"), bloom_columns=["v"])
    c = t._commit(None)
    assert all("v" in c.column_blooms.get(f, {}) for f in c.files)
    out = t.read_matching([("v", "=", "v7")])
    assert [r.k for r in out.collect()] == [7]
    # v-values are unique per file half; the bloom kills the other file
    assert len(out.inputFiles()) <= 1
