"""A/B bench: time the headline queries on TWO git trees in
alternating sessions and report per-query ratios.

The host's hypervisor steal arrives in multi-minute bursts and can
inflate any single record 2-3x (r12 finding: an r11-tree re-run under
the same window matched the r12 tree within noise, proving a noisy
sweep was pressure, not regression). Alternating A/B/A/B sessions put
both trees under the SAME pressure distribution, so the per-query
RATIO is the honest round-over-round signal even when absolute walls
are inflated. Run:
``python scripts/ab_bench.py <treeA_path> <treeB_path> [out.json]``.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

PASSES = 3  # A B A B A B

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {tree!r})
from hudi_and_delta_showcase_spark.session import get_spark
from hudi_and_delta_showcase_spark.queries import load_all
spark = get_spark(master="local[{cpus}]", shuffle_partitions={cpus})
qs = load_all()
sf = {sf!r}
names = [n for n, q in qs.items() if getattr(q, "bench", False)]
qs["latest_change_per_key"].fn(spark, sf).write.format("noop").mode(
    "overwrite").save()  # warm JVM + footers
out = {{}}
for n in sorted(names):
    t0 = time.perf_counter()
    qs[n].fn(spark, sf).write.format("noop").mode("overwrite").save()
    out[n] = round(time.perf_counter() - t0, 4)
print("ABRESULT " + json.dumps(out))
"""


def _run(tree: str, sf: str, cpus: int) -> dict:
    code = _CHILD.format(tree=tree, cpus=cpus, sf=sf)
    p = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, cwd=tree,
        env={**os.environ, "SPARK_LOCAL_IP": "127.0.0.1"},
    )
    for line in p.stdout.splitlines():
        if line.startswith("ABRESULT "):
            return json.loads(line[len("ABRESULT "):])
    raise RuntimeError(
        f"child on {tree} produced no result: {p.stderr[-800:]}"
    )


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    runs: dict[str, list[dict]] = {"a": [], "b": []}
    for i in range(PASSES):
        order = (("a", tree_a), ("b", tree_b))
        if i % 2:  # alternate who runs first: pressure ramps within a
            order = order[::-1]  # pass must not always hit one tree
        for tag, tree in order:
            t = _run(tree, sf, cpus)
            runs[tag].append(t)
            print(f"# pass {i} tree {tag}: total "
                  f"{round(sum(t.values()), 2)}s "
                  f"(load {os.getloadavg()[0]:.2f})", file=sys.stderr)
    med = {
        tag: {
            n: statistics.median(r[n] for r in rs)
            for n in rs[0]
            if all(n in r for r in rs)
        }
        for tag, rs in runs.items()
    }
    common = sorted(set(med["a"]) & set(med["b"]))
    ratios = {n: round(med["a"][n] / med["b"][n], 3) for n in common}
    doc = {
        "tree_a": tree_a, "tree_b": tree_b, "passes": PASSES,
        "median_a": med["a"], "median_b": med["b"],
        "ratio_a_over_b": ratios,
        "median_ratio": round(
            statistics.median(ratios.values()), 3
        ),
        "total_a": round(sum(med["a"].values()), 3),
        "total_b": round(sum(med["b"].values()), 3),
    }
    print(json.dumps(doc))
    if len(sys.argv) > 3:
        with open(sys.argv[3], "w") as fh:
            json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
