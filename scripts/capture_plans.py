"""Capture ``explain("formatted")`` for named registered queries.

Usage::

    python scripts/capture_plans.py <outdir> <suffix> [query ...]

Writes ``<outdir>/<query>_<suffix>.txt`` for each named query (default:
the headline set). The query function runs its harness (table builds)
as usual; only the RETURNED DataFrame's physical plan is captured —
the same plan the noop-sink bench materializes.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    outdir = sys.argv[1]
    suffix = sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from hudi_and_delta_showcase_spark.queries import load_all
    from hudi_and_delta_showcase_spark.session import get_spark

    spark = get_spark()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    all_queries = load_all()
    if not names:
        names = [n for n, q in all_queries.items() if q.bench]
    for name in names:
        q = all_queries[name]
        df = q.fn(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        dst = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(dst, "w") as fh:
            fh.write(plan)
        print(f"# wrote {dst}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
