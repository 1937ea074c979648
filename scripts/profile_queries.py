"""Per-query wall profiler: run named queries N times each in one
session (noop sink, same protocol as bench.py) and print per-pass
walls — separates first-touch cost (pass 1) from steady state.

Usage::

    python scripts/profile_queries.py [-n PASSES] [query ...]

With no names, profiles the headline set. Honors $SPARK_GRAFT_SF_DIR
and $SPARK_GRAFT_CPUS like bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    args = sys.argv[1:]
    passes = 2
    if args and args[0] == "-n":
        passes = int(args[1])
        args = args[2:]
    names = args

    from hudi_and_delta_showcase_spark.queries import load_all
    from hudi_and_delta_showcase_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    all_queries = load_all()
    if not names:
        names = [n for n, q in all_queries.items() if q.bench]

    out: dict[str, dict] = {}
    for name in names:
        q = all_queries[name]
        walls, jobs = [], []
        for i in range(passes):
            group = f"profile:{name}:{i}"
            spark.sparkContext.setJobGroup(group, group)
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            jobs.append(
                len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
            )
        out[name] = {"walls": walls, "jobs": jobs}
        print(f"# {name}: walls={walls} jobs={jobs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
