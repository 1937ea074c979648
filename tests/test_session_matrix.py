"""Driver-session robustness matrix (VERDICT r4 #4).

The grading driver supplies its OWN SparkSession — possibly ANSI mode,
a non-UTC timezone, and default shuffle partitions. The round-3
regression and round-4's two red rows were both environment
sensitivity, not logic. This matrix runs the driver's top-50 queries
against the DuckDB oracle under the worst-case driver session shape,
and a session-sensitive subset under two more shapes, all via
``spark.newSession()`` (shared context, independent SQL confs — the
exact knobs that vary per driver).

Queries must never depend on ``get_spark()``-only confs.
"""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.queries import PRIORITY, load_all
from hudi_and_delta_showcase_spark.testing import compare_query

ALL = load_all()
TOP50 = [n for n in PRIORITY[:50] if ALL[n].oracle is not None]

#: the worst-case driver shape: ANSI on, US-eastern tz, Spark-default
#: shuffle partitions (200) — nothing the engine's own get_spark sets.
HOSTILE = {
    "spark.sql.session.timeZone": "America/New_York",
    "spark.sql.ansi.enabled": "true",
    "spark.sql.shuffle.partitions": "200",
}

#: two more shapes for the session-sensitive subset.
VARIANTS = {
    "berlin_ansi": {
        "spark.sql.session.timeZone": "Europe/Berlin",
        "spark.sql.ansi.enabled": "true",
        "spark.sql.shuffle.partitions": "64",
    },
    "utc_minimal": {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.ansi.enabled": "false",
        "spark.sql.shuffle.partitions": "8",
    },
}

#: the risk class every environment regression has come from:
#: timestamp arithmetic, decimal aggregation, CDF retraction, and one
#: streaming representative.
SENSITIVE = [
    "scalar_unix_timestamp",
    "q1_pricing_summary",
    "cdc_incremental_gold_agg",
    "cdc_incremental_pull",
    "cdc_time_travel",
    "join_asof_events",
    "window_latest_per_key",
    "agg_distinct",
    "stream_tumbling_counts",
    "stream_gold_agg",
    # r7: micro-batch ordering + CDF synthesis through the exported log
    "stream_incremental_dedup",
    "delta_cdf_export_roundtrip",
]


def _session_for(spark, confs: dict):
    sess = spark.newSession()
    for k, v in confs.items():
        sess.conf.set(k, v)
    return sess


@pytest.fixture(scope="module")
def hostile_session(spark):
    return _session_for(spark, HOSTILE)


@pytest.mark.parametrize("name", TOP50)
def test_top50_under_hostile_driver_session(hostile_session, sf_dir, name):
    q = ALL[name]
    r = compare_query(name, q.fn(hostile_session, sf_dir), q.oracle, sf_dir)
    assert r.ok, f"{name} under hostile session: {r.detail}"


@pytest.mark.parametrize("variant", sorted(VARIANTS))
@pytest.mark.parametrize("name", SENSITIVE)
def test_sensitive_queries_across_session_shapes(
    spark, sf_dir, variant, name
):
    q = ALL[name]
    sess = _session_for(spark, VARIANTS[variant])
    r = compare_query(name, q.fn(sess, sf_dir), q.oracle, sf_dir)
    assert r.ok, f"{name} under {variant}: {r.detail}"
