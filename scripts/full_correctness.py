"""Full-registry correctness sweep: every registered query at sf0.01
against its DuckDB oracle (rows + schema + order-insensitive values),
rows-only queries recorded with a null oracle. Writes the
CORRECTNESS_FULL_LOCAL.json record the judge reads next to the
driver's top-50 artifact. Run:
``python scripts/full_correctness.py [CORRECTNESS_FULL_LOCAL.json]``.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from hudi_and_delta_showcase_spark.queries import load_all
    from hudi_and_delta_showcase_spark.session import get_spark
    from hudi_and_delta_showcase_spark.testing import compare_query

    spark = get_spark()
    out: dict[str, dict] = {}
    t_start = time.time()
    for name, q in load_all().items():
        t0 = time.time()
        try:
            if q.oracle is None:
                n = q.fn(spark, SF).count()
                out[name] = {
                    "rows_match": None, "schema_match": None,
                    "hash_match": None, "spark_rows": n,
                    "oracle_rows": None, "err": None,
                }
            else:
                r = compare_query(name, q.fn(spark, SF), q.oracle, SF)
                out[name] = {
                    "rows_match": r.spark_rows == r.oracle_rows,
                    "schema_match": r.ok or "column" not in (r.detail or ""),
                    "hash_match": r.ok,
                    "spark_rows": r.spark_rows,
                    "oracle_rows": r.oracle_rows,
                    "err": None if r.ok else (r.detail or "")[:400],
                }
        except Exception as exc:  # record, don't abort the sweep
            out[name] = {
                "rows_match": False, "schema_match": False,
                "hash_match": False, "spark_rows": None,
                "oracle_rows": None, "err": repr(exc)[:400],
            }
        status = "ok" if out[name]["hash_match"] else (
            "rows-only" if out[name]["hash_match"] is None else "FAIL"
        )
        print(
            f"# {name}: {status} ({time.time() - t0:.2f}s)",
            file=sys.stderr,
        )
    dst = sys.argv[1] if len(sys.argv) > 1 else "CORRECTNESS_FULL_LOCAL.json"
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    ok = sum(1 for v in out.values() if v["hash_match"])
    ro = sum(1 for v in out.values() if v["hash_match"] is None)
    bad = [k for k, v in out.items() if v["hash_match"] is False]
    print(json.dumps({
        "queries": len(out), "oracle_green": ok, "rows_only": ro,
        "failed": bad, "wall_sec": round(time.time() - t_start, 1),
        "load_avg_1m_pre": None,
    }))


if __name__ == "__main__":
    main()
