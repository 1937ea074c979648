"""File-count pruning probe (r12; round-11 verdict task 6).

The 10x probe in ``scale_probe.py`` grows ROWS on fixed file counts;
the 100 TB pruning claim is about FILE counts — a snapshot scan must
cost O(matching files), not O(total files). This probe builds one
many-file tree (>= 2,000 data files via ``maxRecordsPerFile``) per
pruning leg — Iceberg ``days(ts)``, Delta generated ``event_date``,
Hudi col-stats — and times the FULL scan against a wide (10-day) and
a narrow (1-day) pruned read on the same tree. The evidence of
O(matching files) behavior: wall time orders as
``t_narrow < t_wide << t_full`` and tracks the matching-file count,
while all three reads share the identical total file count.

Run: ``python scripts/file_scale_probe.py [SCALE_PROBE.json]`` —
rows merge into the existing probe file under ``@files`` keys.
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

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
TARGET_FILES = 2000

NARROW = (
    "ts >= TIMESTAMP '2024-01-05 00:00:00' AND "
    "ts < TIMESTAMP '2024-01-06 00:00:00'"
)
WIDE = (
    "ts >= TIMESTAMP '2024-01-05 00:00:00' AND "
    "ts < TIMESTAMP '2024-01-15 00:00:00'"
)


def _timed(read):
    """(files, best-of-2 wall): first run warms, second is recorded —
    the read callable builds the plan AND counts, so the wall covers
    metadata pruning + scan, the user-visible cost."""
    best = None
    files = 0
    for _ in range(2):
        t0 = time.time()
        df = read()
        df.count()
        best = time.time() - t0
        files = len(df.inputFiles())
    return files, round(best, 3)


def probe_iceberg(spark, events) -> dict:
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        read_iceberg_table,
        write_iceberg_dataset,
    )

    root = tempfile.mkdtemp(prefix="fscale_ice_") + "/tree"
    write_iceberg_dataset(spark, events, root, partition_by=[("ts", "day")])
    full_f, full_t = _timed(lambda: read_iceberg_table(spark, root))
    wide_f, wide_t = _timed(
        lambda: read_iceberg_table(spark, root, predicate=WIDE)
    )
    narrow_f, narrow_t = _timed(
        lambda: read_iceberg_table(spark, root, predicate=NARROW)
    )
    return {
        "files_total": full_f, "t_full": full_t,
        "files_wide": wide_f, "t_wide": wide_t,
        "files_narrow": narrow_f, "t_narrow": narrow_t,
    }


def probe_delta(spark, events) -> dict:
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hudi_and_delta_showcase_spark.tables.lakehouse import (
        LakehouseTable,
    )

    path = tempfile.mkdtemp(prefix="fscale_dl_") + "/tree"
    t = LakehouseTable.create(
        spark, path, events,
        key_cols=["event_id"], precombine="ts",
        partition_by="event_date",
        generated_columns={"event_date": "CAST(ts AS DATE)"},
    )
    export_delta_log(t)
    full_f, full_t = _timed(lambda: read_delta_table(spark, path))
    wide_f, wide_t = _timed(
        lambda: read_delta_table(spark, path, predicate=WIDE)
    )
    narrow_f, narrow_t = _timed(
        lambda: read_delta_table(spark, path, predicate=NARROW)
    )
    return {
        "files_total": full_f, "t_full": full_t,
        "files_wide": wide_f, "t_wide": wide_t,
        "files_narrow": narrow_f, "t_narrow": narrow_t,
    }


def probe_hoodie(spark, events) -> dict:
    import pyspark.sql.functions as F

    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        export_hoodie_metadata,
    )
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )
    from hudi_and_delta_showcase_spark.tables.lakehouse import (
        LakehouseTable,
    )

    path = tempfile.mkdtemp(prefix="fscale_ht_") + "/tree"
    # range-cluster by ts so each small file covers a narrow ts band —
    # the layout a time-keyed ingest naturally produces, and the one
    # col-stats pruning exists for
    t = LakehouseTable.create(
        spark, path, events.repartitionByRange(8, F.col("ts")),
        key_cols=["event_id"], precombine="ts",
    )
    export_hoodie_timeline(t)
    export_hoodie_metadata(t)
    full_f, full_t = _timed(lambda: read_hoodie_table(spark, path))
    wide_f, wide_t = _timed(
        lambda: read_hoodie_table(spark, path, predicate=WIDE)
    )
    narrow_f, narrow_t = _timed(
        lambda: read_hoodie_table(spark, path, predicate=NARROW)
    )
    return {
        "files_total": full_f, "t_full": full_t,
        "files_wide": wide_f, "t_wide": wide_t,
        "files_narrow": narrow_f, "t_narrow": narrow_t,
    }


def main() -> None:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    from hudi_and_delta_showcase_spark.session import get_spark

    spark = get_spark()
    events = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )
    n = events.count()
    per_file = max(1, n // TARGET_FILES)
    spark.conf.set("spark.sql.files.maxRecordsPerFile", str(per_file))
    print(f"# {n} rows, maxRecordsPerFile={per_file} -> ~{TARGET_FILES} "
          "files per tree", file=sys.stderr)
    out = {}
    for name, fn in (
        ("iceberg_day_pruned_read@files", probe_iceberg),
        ("delta_generated_pruned_read@files", probe_delta),
        ("hoodie_pruned_read@files", probe_hoodie),
    ):
        t0 = time.time()
        out[name] = fn(spark, events)
        print(f"# {name}: {out[name]} (built+probed in "
              f"{time.time() - t0:.1f}s)", file=sys.stderr)
    print(json.dumps(out))
    if len(sys.argv) > 1:
        merged = out
        if os.path.exists(sys.argv[1]):
            with open(sys.argv[1]) as fh:
                doc = json.load(fh)
            merged = {**doc.get("results", {}), **out}
            doc["results"] = merged
        else:
            doc = {"results": merged}
        with open(sys.argv[1], "w") as fh:
            json.dump(doc, fh, indent=1)


if __name__ == "__main__":
    main()
