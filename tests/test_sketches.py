"""Heavy-hitters (Misra-Gries two-phase) contract tests: pigeonhole
recall under an adversarially small capacity, the loud capacity bound,
and the no-tail-shuffle plan shape."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.io import load_table
from hudi_and_delta_showcase_spark.operators import sketches as SK


def _doc_tokens(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.explode(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda t: t != "")
        ).alias("tok")
    )


def test_heavy_hitters_exact_vs_groupby(spark, sf_dir):
    """The two-phase result equals the naive full GROUP BY filtered at
    the same threshold — exactness, not approximation."""
    toks = _doc_tokens(spark, sf_dir).cache()
    try:
        n = toks.count()
        exact = {
            (r.tok, r.cnt)
            for r in toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 0.002 * n)
            .collect()
        }
        got = {
            (r.token, r.cnt)
            for r in SK.heavy_hitters(toks, "tok", 0.002, capacity=8192).collect()
        }
        assert got == exact and len(exact) > 0
    finally:
        toks.unpersist()


def test_heavy_hitters_recall_at_minimum_capacity(spark, sf_dir):
    """At the smallest admissible capacity (ceil(1/min_share)) the
    pigeonhole guarantee is tightest — no qualifying token may be lost
    even though partition summaries trim aggressively."""
    toks = _doc_tokens(spark, sf_dir).repartition(16).cache()
    try:
        n = toks.count()
        exact = {
            r.tok
            for r in toks.groupBy("tok")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") >= 0.002 * n)
            .collect()
        }
        got = {
            r.token
            for r in SK.heavy_hitters(toks, "tok", 0.002, capacity=500).collect()
        }
        assert got == exact
    finally:
        toks.unpersist()


def test_capacity_below_guarantee_refused():
    with pytest.raises(ValueError, match="cannot guarantee recall"):
        SK.heavy_hitters(None, "tok", 0.002, capacity=499)


def test_exact_pass_broadcasts_candidates(spark, sf_dir):
    """The verify pass must broadcast the candidate set — the vocabulary
    tail never shuffles. A SortMergeJoin/shuffle of the token stream
    here is the scale bug this operator exists to avoid."""
    plan = SK.heavy_hitters(
        _doc_tokens(spark, sf_dir), "tok", 0.002, capacity=8192
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
