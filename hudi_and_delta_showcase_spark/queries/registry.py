"""Query registry: one place where (spark implementation, DuckDB oracle)
pairs are declared. ``__spark_entry__.py`` and ``bench.py`` are thin views
over this.

Contract (from ``/root/repo/__spark_entry__.py`` driver stub): each query is
``fn(spark, sf_dir) -> DataFrame``; ``oracle`` is equivalent ANSI SQL DuckDB
runs against the same parquet tables (views pre-registered by the driver).
Column names must match exactly — alias everything on both sides.
``oracle=None`` marks genuinely non-SQL-expressible ops (rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # part of the bench.py headline set


ALL: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query implementation under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in ALL:
            raise ValueError(f"duplicate query name: {name}")
        ALL[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco
