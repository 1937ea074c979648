"""Benchmark harness: times the headline queries (registry entries with
``bench=True``) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line. Each headline query
runs three times in the same session and reports the per-query MEDIAN,
plus the [min, max] spread per query — the host shows intermittent
hypervisor contention (round-1 finding; the r5 committed-vs-refreshed
1.6s drift was pure noise), and a median with a published spread makes
round-over-round deltas attributable instead of noise-limited.

Each query is materialized via a count-style full evaluation
(``df.write.format("noop")``) so timings include the complete plan without
driver-side collect overhead dominating.

``SPARK_GRAFT_BENCH_ALL=1`` additionally times EVERY registered query and
writes the per-query secondary record to ``BENCH_FULL_LOCAL.json`` (same
session, after the headline set — headline numbers stay comparable across
rounds while regressions in non-headline queries remain attributable).
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)


def _steal_snap() -> tuple[int, int]:
    """(total_jiffies, steal_jiffies) from the aggregate /proc/stat row.

    r13: the host's contention is HYPERVISOR steal arriving in
    multi-minute bursts. loadavg cannot separate that from our own
    Spark load mid-sweep (a 32-thread query keeps the 1-minute average
    near 1 even on an otherwise idle box), but the kernel's steal
    counter (field 8 of /proc/stat, time the hypervisor ran someone
    else while this VM had runnable work) measures EXACTLY the
    external pressure and nothing of our own — verified live on this
    host: +14 jiffies over a 3 s idle window during residual steal,
    flat when genuinely quiet."""
    with open("/proc/stat") as fh:
        parts = fh.readline().split()
    vals = [int(v) for v in parts[1:]]
    return sum(vals), (vals[7] if len(vals) > 7 else 0)


def _steal_frac(window_s: float = 0.5) -> float:
    """Fraction of total cpu jiffies stolen over a short probe window."""
    t0, s0 = _steal_snap()
    time.sleep(window_s)
    t1, s1 = _steal_snap()
    dt = t1 - t0
    return (s1 - s0) / dt if dt > 0 else 0.0


def _await_quiet_window() -> tuple[float, bool]:
    """Quiet-window enforcement (r11, verdict #3): the r10 committed
    headline was a noisy-window artifact (uniform 1.25-1.84x at
    load_avg 4.62). Before ANY measurement, probe the 1-minute load —
    external pressure, since no Spark session exists yet — and wait it
    out (up to SPARK_GRAFT_QUIET_RETRIES sleeps of 30 s). If the host
    never quiets, the record still prints (the driver contract is one
    JSON line, always) but carries ``quiet: false`` +
    ``load_avg_1m_pre`` so a noisy number is self-disqualifying under
    the BASELINE.md bar instead of masquerading as a regression."""
    # threshold 1.0, measured on this host (r11): pre-load 1.49 still
    # inflated the headline +52% (19.2s) while pre-load 0.68 landed
    # 12.1s — the box's chronic external load sits ~1.5-3, so "under 2"
    # is NOT quiet here
    threshold = float(os.environ.get("SPARK_GRAFT_QUIET_LOAD", "1.0"))
    # r12 (verdict #7): the r11 ladder measured 0.67 pre-load costing
    # +31% vs 0.01 on identical code — "under the 1.0 bar" is not the
    # same window the full sweep records at. Wait FIRST for a truly
    # idle box (<= QUIET_TARGET, default 0.1); only once the target
    # retries run out does the looser threshold bar take over.
    target = float(os.environ.get("SPARK_GRAFT_QUIET_TARGET", "0.1"))
    retries = int(os.environ.get("SPARK_GRAFT_QUIET_RETRIES", "10"))
    pre = os.getloadavg()[0]
    while pre > target and retries > 0:
        print(
            f"# host busy pre-run (load_avg_1m {pre:.2f} > "
            f"target {target}), waiting 30s",
            file=sys.stderr,
        )
        time.sleep(30)
        retries -= 1
        pre = os.getloadavg()[0]
    return round(pre, 2), pre <= threshold


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8)))
    load_pre, quiet = _await_quiet_window()

    from hudi_and_delta_showcase_spark import get_spark
    from hudi_and_delta_showcase_spark.queries import load_all

    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)

    all_queries = load_all()
    headline = {n: q for n, q in all_queries.items() if q.bench}

    # Warm the JVM + parquet footers with one pass of the flagship query,
    # and the Python/Arrow workers with a trivial pandas_udf — so no
    # measured query pays one-time process-spawn costs.
    warm = all_queries["latest_change_per_key"]
    warm.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F

    @F.pandas_udf("long")
    def _warm_udf(s: pd.Series) -> pd.Series:
        return s

    spark.range(1000).select(_warm_udf("id")).write.format("noop").mode(
        "overwrite"
    ).save()

    # Median-of-3 per query: this host shows intermittent hypervisor
    # contention (documented in round 1: identical code fluctuating
    # 30-80s total). The median ignores one contention spike per query
    # while staying an honest central estimate (a minimum over-rewards
    # lucky runs); the published [min, max] spread shows whether a
    # round-over-round delta exceeds the noise band. All passes share
    # one session so JVM/codegen warmup cancels out.
    runs: dict[str, list[float]] = {n: [] for n in headline}
    _hj0, _hs0 = _steal_snap()
    for _pass in range(3):
        for name, q in sorted(headline.items()):
            t0 = time.perf_counter()
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs[name].append(round(time.perf_counter() - t0, 4))
    _hj1, _hs1 = _steal_snap()
    headline_steal_pct = round(
        100 * (_hs1 - _hs0) / (_hj1 - _hj0), 3
    ) if _hj1 > _hj0 else 0.0

    timings = {n: sorted(ts)[len(ts) // 2] for n, ts in runs.items()}
    spread = {n: [min(ts), max(ts)] for n, ts in runs.items()}
    total = round(sum(timings.values()), 4)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if os.environ.get("SPARK_GRAFT_BENCH_ALL"):
        # per-query quiet gate (r12): the host's pressure is
        # HYPERVISOR steal arriving in multi-minute bursts (no in-VM
        # process shows it — only loadavg and inflated walls). A
        # pre-run probe cannot protect a 5-minute sweep, so with
        # SPARK_GRAFT_SWEEP_GATE set each query WAITS (bounded) for
        # the 1-minute load to dip under the gate before measuring —
        # every recorded wall lands in a quiet slice, which is the
        # honest measurement of THIS code rather than the neighbors.
        gate = float(os.environ.get("SPARK_GRAFT_SWEEP_GATE", "0"))
        # r13: steal-aware measurement. The r12 loadavg gate could not
        # protect the sweep — our OWN 32-thread queries keep the
        # 1-minute load near the gate, so external steal bursts walked
        # straight through it (two r13 attempts: median inflation
        # 1.18-1.33x on UNTOUCHED sub-second queries). Each query now
        # (a) waits — bounded — for the steal fraction to dip under
        # SPARK_GRAFT_STEAL_GATE before measuring, (b) snapshots the
        # steal counter across its own wall, and (c) if the slice was
        # contaminated anyway (burst onset mid-query), re-measures up
        # to SPARK_GRAFT_STEAL_RETRIES times, keeping the attempt with
        # the LOWEST steal fraction — a retry criterion independent of
        # the wall itself, so it cannot cherry-pick lucky runs of a
        # genuinely slow query, only shed the neighbors' cycles.
        steal_gate = float(os.environ.get("SPARK_GRAFT_STEAL_GATE", "0"))
        steal_retries = int(os.environ.get("SPARK_GRAFT_STEAL_RETRIES", "2"))
        full: dict[str, float] = {}
        steal_seen: list[float] = []
        requeried: list[str] = []
        for name, q in all_queries.items():  # PRIORITY order
            if gate:
                for _ in range(30):
                    if os.getloadavg()[0] <= gate:
                        break
                    time.sleep(10)
            best_wall, best_steal = None, None
            for attempt in range(1 + max(0, steal_retries)):
                if steal_gate:
                    for _ in range(36):
                        if _steal_frac(0.5) <= steal_gate:
                            break
                        time.sleep(10)
                j0, s0 = _steal_snap()
                t0 = time.perf_counter()
                try:
                    q.fn(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    wall = round(time.perf_counter() - t0, 4)
                except Exception as exc:  # record, don't abort the sweep
                    if best_wall is not None:
                        break  # keep the earlier good measurement
                    best_wall, best_steal = -1.0, 0.0
                    print(
                        f"# bench-all error {name}: {exc}", file=sys.stderr
                    )
                    break
                j1, s1 = _steal_snap()
                frac = (s1 - s0) / (j1 - j0) if j1 > j0 else 0.0
                if best_steal is None or frac < best_steal:
                    best_wall, best_steal = wall, frac
                if not steal_gate or best_steal <= steal_gate:
                    break
                if attempt == 0:
                    requeried.append(name)
            full[name] = best_wall
            if best_steal is not None and best_wall is not None and best_wall > 0:
                steal_seen.append(best_steal)
        with open(os.path.join(REPO, "BENCH_FULL_LOCAL.json"), "w") as fh:
            json.dump(
                {
                    "metric": "all_queries_wall",
                    "value": round(sum(v for v in full.values() if v > 0), 4),
                    "unit": "sec",
                    "queries": full,
                    "sf": float(sf) if sf else sf_dir,
                    "cpus": cpus,
                    # external host pressure at measurement time: the
                    # quiet-window bar (BASELINE.md) is only binding
                    # when this is genuinely low — r10 saw idle-load
                    # 1.8-3.3 inflate single-pass rows ~25% uniformly
                    "load_avg_1m": round(os.getloadavg()[0], 2),
                    "load_avg_1m_pre": load_pre,
                    "quiet": quiet,
                    "sweep_gate": gate or None,
                    # steal-aware stamps (r13): the honest-quietness
                    # evidence — fraction of cpu stolen by the
                    # hypervisor DURING each kept measurement
                    "steal_gate": steal_gate or None,
                    "steal_pct_mean": (
                        round(100 * sum(steal_seen) / len(steal_seen), 3)
                        if steal_seen
                        else None
                    ),
                    "steal_pct_max": (
                        round(100 * max(steal_seen), 3)
                        if steal_seen
                        else None
                    ),
                    "requeried": sorted(requeried),
                },
                fh,
                indent=1,
            )

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "n": 3,
                "sf": float(sf) if sf else sf_dir,
                "cpus": cpus,
                "load_avg_1m": round(os.getloadavg()[0], 2),
                "load_avg_1m_pre": load_pre,
                "quiet": quiet,
                # hypervisor steal across the whole 3-pass block: the
                # direct external-pressure evidence (r13) — a headline
                # total is only bar-eligible when this is ~0
                "steal_pct": headline_steal_pct,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
