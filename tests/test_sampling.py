"""Deterministic-sampling invariants (operators/sampling.py): the
properties a training pipeline relies on — reproducibility, stability
under corpus growth (no train/test contamination on refresh), exact
per-stratum counts, and approximate uniformity of the hash buckets."""

from __future__ import annotations

import pyspark.sql.functions as F

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators import sampling as SA


def test_hash_sample_deterministic_and_stable(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    a = {r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.2, "s1").collect()}
    b = {r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.2, "s1").collect()}
    assert a == b and a  # reproducible, non-empty
    # monotone in fraction: a 10% sample is a subset of the 20% sample
    small = {
        r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.1, "s1").collect()
    }
    assert small <= a
    # different seed -> different membership
    c = {r.doc_id for r in SA.hash_sample(docs, "doc_id", 0.2, "s2").collect()}
    assert a != c
    # roughly the right size (48-bit uniform hash; generous 3-sigma-ish)
    n = docs.count()
    assert 0.1 * n < len(a) < 0.32 * n


def test_train_split_stable_under_growth(spark, sf_dir):
    """A doc's split assignment must not change when the corpus grows —
    the anti-contamination property."""
    docs = load_table(spark, sf_dir, "documents")
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    half = docs.filter(F.col("doc_id") % 2 == 0)
    full_map = {
        r.doc_id: r.split
        for r in SA.train_split(docs, "doc_id", weights, "sv").collect()
    }
    half_map = {
        r.doc_id: r.split
        for r in SA.train_split(half, "doc_id", weights, "sv").collect()
    }
    assert half_map == {k: v for k, v in full_map.items() if k % 2 == 0}
    assert set(full_map.values()) == {"train", "val", "test"}
    # split fractions in the right ballpark
    n = len(full_map)
    n_train = sum(1 for v in full_map.values() if v == "train")
    assert 0.7 * n < n_train < 0.9 * n


def test_stratified_take_exact_counts(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    sizes = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    out = SA.stratified_take(docs, ["lang"], 20, key="doc_id", seed="s7")
    got = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert got == {k: min(20, v) for k, v in sizes.items()}
    # deterministic pick
    again = SA.stratified_take(docs, ["lang"], 20, key="doc_id", seed="s7")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_hash_sample_no_shuffle(spark, sf_dir):
    """Map-only contract: the sample filter must not introduce an
    exchange, and the predicate pipeline stays scan-side."""
    docs = load_table(spark, sf_dir, "documents")
    plan = SA.hash_sample(docs, "doc_id", 0.1).select(
        "doc_id"
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_temperature_mix_flattens_shares(spark, sf_dir):
    """alpha=0.5 must move group shares toward equal: the dominant
    language is downsampled, low-resource groups are kept WHOLE (no
    replication), totals = sum of per-group targets, and membership is
    deterministic."""
    docs = load_table(spark, sf_dir, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    out = SA.temperature_mix(docs, "lang", key="doc_id", alpha=0.5, seed="m")
    after = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    total = sum(before.values())
    wsum = sum(v**0.5 for v in before.values())
    expect = {
        k: min(v, int(total * (v**0.5) / wsum)) for k, v in before.items()
    }
    assert after == expect
    top = max(before, key=before.get)
    assert after[top] < before[top]  # dominant group downsampled
    small = min(before, key=before.get)
    assert after[small] == before[small]  # low-resource kept whole
    # share distance to uniform strictly shrinks
    def dist(d):
        t = sum(d.values())
        return sum(abs(v / t - 1 / len(d)) for v in d.values())
    assert dist(after) < dist(before)
    again = SA.temperature_mix(docs, "lang", key="doc_id", alpha=0.5, seed="m")
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in again.collect()
    )


def test_temperature_mix_alpha_one_keeps_nearly_all(spark, sf_dir):
    """alpha=1 is proportional sampling at full target size: every group's
    target equals its population up to floor rounding."""
    docs = load_table(spark, sf_dir, "documents")
    before = {r.lang: r.n for r in docs.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    out = SA.temperature_mix(docs, "lang", key="doc_id", alpha=1.0, seed="m")
    after = {r.lang: r.n for r in out.groupBy("lang").agg(
        F.count("*").alias("n")).collect()}
    assert all(before[k] - after.get(k, 0) <= 1 for k in before)
