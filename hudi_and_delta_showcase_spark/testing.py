"""Local replica of the driver's correctness gate: run a registered query
on Spark and its oracle SQL on DuckDB over the same parquet tables, then
compare row count, column names, and order-insensitive values.

Strictness: values are compared EXACTLY (no float tolerance) — queries are
designed so both engines produce bit-identical doubles (decimal-exact
aggregation, deterministic per-row IEEE arithmetic). A tolerance fallback
would mask design mistakes the real driver hash would catch.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, datetime
from decimal import Decimal

import duckdb
from pyspark.sql import DataFrame


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def _normalize(v):
    """Map engine-specific cell values onto a common comparable form."""
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_normalize(x) for x in v)
    # numpy scalars -> python
    item = getattr(v, "item", None)
    if item is not None and type(v).__module__ == "numpy":
        return _normalize(v.item())
    return v


def _sorted_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    projected = [tuple(_normalize(r[i]) for i in order) for r in rows]
    return sorted(projected, key=repr)


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the fixture tables as DuckDB views, as the driver does."""
    from hudi_and_delta_showcase_spark.io import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def write_full_correctness_artifact(
    sf_dir: str = "/root/testdata/sf0.01",
    out_path: str = "CORRECTNESS_FULL_LOCAL.json",
) -> dict:
    """Run the driver-equivalent correctness check over EVERY registered
    query (the graded driver caps its artifact at the first 50) and
    write the full record — oracle-bearing queries get rows/schema/value
    verdicts, rows-only queries a row count. Invoke:
    ``python -m hudi_and_delta_showcase_spark.testing``."""
    import json

    from hudi_and_delta_showcase_spark.queries import load_all
    from hudi_and_delta_showcase_spark.session import get_spark

    spark = get_spark()
    record: dict[str, dict] = {}
    for name, q in load_all().items():
        try:
            if q.oracle is None:
                n = q.fn(spark, sf_dir).count()
                record[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": n,
                    "oracle_rows": None, "err": "no_oracle",
                }
            else:
                r = compare_query(name, q.fn(spark, sf_dir), q.oracle, sf_dir)
                record[name] = {
                    "rows_match": r.ok, "schema_match": r.ok,
                    "hash_match": r.ok, "spark_rows": r.spark_rows,
                    "oracle_rows": r.oracle_rows,
                    "err": None if r.ok else r.detail[:500],
                }
        except Exception as exc:  # pragma: no cover - defensive sweep
            record[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"{type(exc).__name__}: {exc}"[:500],
            }
    with open(out_path, "w") as fh:
        json.dump(record, fh, indent=1)
    return record


def compare_query(name: str, df: DataFrame, oracle: str, sf_dir: str) -> CompareResult:
    spark_rows = df.collect()
    spark_cols = df.columns

    con = duckdb_connection(sf_dir)
    cur = con.execute(oracle)
    oracle_cols = [d[0] for d in cur.description]
    oracle_rows = cur.fetchall()
    con.close()

    if sorted(spark_cols) != sorted(oracle_cols):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows),
            f"column mismatch: spark={sorted(spark_cols)} oracle={sorted(oracle_cols)}",
        )
    if len(spark_rows) != len(oracle_rows):
        return CompareResult(
            name, False, len(spark_rows), len(oracle_rows), "row count mismatch"
        )

    s = _sorted_rows(spark_cols, [tuple(r) for r in spark_rows])
    o = _sorted_rows(oracle_cols, oracle_rows)
    if s != o:
        diff = next(
            (f"first diff @row {i}:\n  spark : {a}\n  oracle: {b}"
             for i, (a, b) in enumerate(zip(s, o)) if a != b),
            "rows differ",
        )
        return CompareResult(name, False, len(spark_rows), len(oracle_rows), diff)
    return CompareResult(name, True, len(spark_rows), len(oracle_rows))


if __name__ == "__main__":
    import sys as _sys

    rec = write_full_correctness_artifact(
        *(_sys.argv[1:2] or ["/root/testdata/sf0.01"])
    )
    ok = sum(1 for v in rec.values() if v["hash_match"])
    rows_only = sum(1 for v in rec.values() if v["err"] == "no_oracle")
    bad = {k: v["err"] for k, v in rec.items()
           if not v["hash_match"] and v["err"] != "no_oracle"}
    print(f"green={ok} rows_only={rows_only} failed={len(bad)}")
    for k, e in bad.items():
        print(f"  FAIL {k}: {e[:200]}")
