"""Driver contract for the spark-graft builder (PySpark target).

Thin view over ``hudi_and_delta_showcase_spark.queries.registry`` — every
operator from SURVEY.md §2 (plus the north-star extensions) is registered
there with its Spark implementation and, where ANSI-expressible, a DuckDB
oracle SQL string.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hudi_and_delta_showcase_spark.queries import load_all

_SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (reference MERGE-source shape,
    /root/reference/README.md:1215-1221) at sf0.001."""
    all_queries = load_all()
    return all_queries["latest_change_per_key"].fn(spark, _SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in load_all().items() if q.oracle is not None
    }
