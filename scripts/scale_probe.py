"""Measured scaling evidence (SCALE.md; round-8 verdict task 5).

Self-generates a ~10x blowup of the sf0.1 fixtures (salted copies —
ids offset per copy, document texts salted with a copy token so
cross-copy rows are not accidental near-duplicates, embeddings
perturbed in one component) and times the five scale-sensitive
headline queries at 1x and 10x, twice each (the second run is the
steady-state number recorded). Output: one JSON line per query with
t1/t10 and the wall-time ratio; a family whose plan is linear should
land near 10, sub-linear below it, and anything far above flags a
scale-killer. Run: ``python scripts/scale_probe.py [out.json]``.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

SF1 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10
QUERIES = [
    "dedup_minhash_lsh",
    "similarity_topk_lsh",
    "cdc_upsert_cow_roundtrip",
    "stream_incremental_dedup",
    "q5_regional_revenue",
    # r10 (verdict r8/r9 task 6): the interop READ families at 10x
    # deleted-row counts — each query authors its foreign tree from the
    # events fixture and deletes a fixed fraction, so the 10x run holds
    # 10x the deletion-vector/tombstone volume
    "cdc_convert_delta_dv",       # foreign Delta DV read
    "iceberg_v3_dv_read",         # Iceberg v3 Puffin DV read
    "cdc_convert_hoodie_delete",  # foreign Hudi MoR _rt + delete blocks
    # late r10: the pruning + incremental-pull legs at 10x row counts —
    # each builds its foreign tree from events, so the 10x run holds
    # 10x the files/stats/added-rows the metadata paths must handle
    "hoodie_pruned_read",         # col-stats + metadata-table pruning
    "iceberg_incremental_read",   # incremental append scan
    "delta_incremental_read",     # version-range add-diff read
    # r11 (verdict r10 task 7): the change-feed triad at 10x change
    # volume — each query authors its foreign tree/log from events and
    # serves the full change set, so the 10x run decodes 10x the
    # CDC blocks / changelog entries / CDF rows
    "hoodie_cdc_changes",         # RFC-51 CDC_DATA block decode
    "iceberg_changelog_read",     # changelog scan + update collapse
    "cdc_delta_changes_tail",     # Delta CDF version-range tail
]


def build_10x(spark, out_dir: str) -> None:
    import pyspark.sql.functions as F

    def save(df, name):
        df.coalesce(max(1, COPIES)).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet"
        )

    copies = F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("__c")

    docs = spark.read.parquet(f"{SF1}/documents.parquet")
    max_doc = docs.agg(F.max("doc_id")).head()[0] + 1
    save(
        docs.select("*", copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("__c") * max_doc)
        # salt the text so copies are NOT near-duplicates of each other:
        # the within-copy near-dup structure is what must scale 10x
        .withColumn(
            "text", F.concat_ws(" ", "text", F.format_string("cpy%d", "__c"))
        )
        .drop("__c"),
        "documents",
    )

    emb = spark.read.parquet(f"{SF1}/embeddings.parquet")
    max_vec = emb.agg(F.max("vec_id")).head()[0] + 1
    save(
        emb.select("*", copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("__c") * max_vec)
        .withColumn(
            "embedding",
            F.concat(
                F.array(
                    (F.element_at("embedding", 1)
                     + F.col("__c").cast("float") / 1000.0).cast("float")
                ),
                F.slice("embedding", 2, 10_000),
            ),
        )
        .drop("__c"),
        "embeddings",
    )

    ev = spark.read.parquet(f"{SF1}/events.parquet")
    max_eid = ev.agg(F.max("event_id")).head()[0] + 1
    max_uid = ev.agg(F.max("user_id")).head()[0] + 1
    save(
        ev.select("*", copies)
        .withColumn("event_id", F.col("event_id") + F.col("__c") * max_eid)
        .withColumn("user_id", F.col("user_id") + F.col("__c") * max_uid)
        .drop("__c"),
        "events",
    )

    orders = spark.read.parquet(f"{SF1}/orders.parquet")
    max_ok = orders.agg(F.max("o_orderkey")).head()[0] + 1
    save(
        orders.select("*", copies)
        .withColumn("o_orderkey", F.col("o_orderkey") + F.col("__c") * max_ok)
        .drop("__c"),
        "orders",
    )
    li = spark.read.parquet(f"{SF1}/lineitem.parquet")
    save(
        li.select("*", copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("__c") * max_ok)
        .drop("__c"),
        "lineitem",
    )

    # dims ride along unchanged (the realistic shape: facts grow,
    # dimensions don't)
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(f"{SF1}/{t}.parquet").write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from hudi_and_delta_showcase_spark.queries import load_all
    from hudi_and_delta_showcase_spark.session import get_spark

    # --only a,b,c: probe just the named families and MERGE their rows
    # into an existing out file (newly added families ride one probe
    # run without re-measuring the unchanged ones)
    names = QUERIES
    args = [a for a in sys.argv[1:]]
    if args and args[0] == "--only":
        names = [n for n in args[1].split(",") if n]
        args = args[2:]
    sys.argv[1:] = args

    spark = get_spark()
    qs = load_all()
    big = tempfile.mkdtemp(prefix="sf1x10_")
    t0 = time.time()
    build_10x(spark, big)
    print(f"# built 10x fixtures in {time.time() - t0:.1f}s -> {big}",
          file=sys.stderr)

    out = {}
    for name in names:
        times = {}
        for tag, sf in (("t1", SF1), ("t10", big)):
            best = None
            for _ in range(2):  # second run = steady state
                t0 = time.time()
                qs[name].fn(spark, sf).count()
                best = time.time() - t0
            times[tag] = round(best, 3)
        times["ratio"] = round(times["t10"] / times["t1"], 2)
        out[name] = times
        print(f"# {name}: {times}", file=sys.stderr)
    print(json.dumps({"copies": COPIES, "base_sf_dir": SF1, "results": out}))
    if len(sys.argv) > 1:
        merged = out
        if os.path.exists(sys.argv[1]):
            with open(sys.argv[1]) as fh:
                prior = json.load(fh).get("results", {})
            merged = {**prior, **out}
        with open(sys.argv[1], "w") as fh:
            json.dump(
                {"copies": COPIES, "base_sf_dir": SF1, "results": merged},
                fh, indent=1,
            )


if __name__ == "__main__":
    main()
