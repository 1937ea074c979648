"""The dataset writer's footer-harvested metadata plane (r13 opt) must
be byte-identical to the distributed-aggregation fallback: same record
counts, same packed lower/upper bounds, same partition values — for
every bound-eligible type, nulls and all-null columns included.

r14: float/double columns record NO bounds at all (parquet footer
min/max exclude NaN while a distributed max would return NaN, so the
planes disagree on NaN data — and a NaN-blind bound can mis-prune);
the fixture carries NaN rows to pin that rule, and the footer branch
is asserted to have actually run (the agg fallback is monkeypatched to
raise) so the equivalence test can never pass vacuously.
"""

from __future__ import annotations

import math
from datetime import date, datetime

import pytest

from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables import iceberg_meta as im
from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    _dataset_file_entries,
    _dataset_file_entries_agg,
    read_iceberg_metadata,
    read_iceberg_table,
    write_iceberg_dataset,
)


def _mixed_df(spark):
    rows = [
        (
            i,
            # NaN rows (r14): parquet stats exclude NaN from min/max;
            # the writer must not record bounds for this column at all
            float("nan") if i % 7 == 0 else float(i) * 1.5,
            datetime(2024, 1, 1 + i % 3, i % 24, 30),
            date(2024, 2, 1 + i % 3),
            i % 2 == 0,
            f"s{i:03d}",
            None if i % 2 else i * 10,
            None,  # all-null column: no bounds either way
        )
        for i in range(40)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, value double, ts timestamp, d date, flag boolean,"
        " name string, half_null long, all_null double",
    ).coalesce(2)


def test_footer_entries_match_distributed_agg(spark, tmp_path, monkeypatch):
    root = str(tmp_path / "tree")
    df = _mixed_df(spark)
    write_iceberg_dataset(spark, df, root, partition_by=[("ts", "day")])

    meta = read_iceberg_metadata(root)
    ice_schema = meta["schema"]
    spec_fields = [
        {**sf, "result-type": "int"}
        for sf in meta["partition-specs"][0]["fields"]
    ]
    data_dir = fsio.join(root, "data")
    # the writer's own bound-eligible set: fixed-width primitives MINUS
    # float/double (the r14 NaN rule)
    bound_fields = [
        f
        for f in ice_schema["fields"]
        if isinstance(f["type"], str)
        and f["type"]
        in ("int", "long", "boolean", "timestamp", "timestamptz", "date")
    ]
    via_agg = _dataset_file_entries_agg(
        spark, fsio.absolutize(root),
        sorted(fsio.walk_files(data_dir, suffix=".parquet")),
        spec_fields, bound_fields, 111, 1,
    )
    # non-vacuity (r14, advice): if the footer branch silently fell
    # back, this test would compare the agg path to itself — make the
    # fallback an ERROR inside the _dataset_file_entries call
    def _boom(*a, **k):
        raise AssertionError("footer branch did not run")

    monkeypatch.setattr(im, "_dataset_file_entries_agg", _boom)
    via_footer = _dataset_file_entries(
        spark, fsio.absolutize(root), data_dir, spec_fields, ice_schema,
        True, 111, 1,
    )

    def canon(entries):
        out = []
        for e in entries:
            d = dict(e["data_file"])
            d["lower_bounds"] = sorted(
                (b["key"], b["value"]) for b in (d["lower_bounds"] or [])
            )
            d["upper_bounds"] = sorted(
                (b["key"], b["value"]) for b in (d["upper_bounds"] or [])
            )
            out.append((e["status"], e["sequence_number"], d))
        return sorted(out, key=lambda t: t[2]["file_path"])

    assert canon(via_footer) == canon(via_agg)
    # sanity: bounds exist for the value-bearing typed columns; the
    # all-null column AND the NaN-bearing double column carry none
    by_name = {f["name"]: f["id"] for f in ice_schema["fields"]}
    lo_keys = {
        b["key"] for e in via_footer for b in e["data_file"]["lower_bounds"]
    }
    for col in ("event_id", "ts", "d", "flag"):
        assert by_name[col] in lo_keys
    assert by_name["all_null"] not in lo_keys
    assert by_name["value"] not in lo_keys  # double: never bounded


def test_float_bounds_never_prune(spark, tmp_path):
    """A float/double predicate must scan conservatively even when a
    (foreign) manifest carries bounds for the column: a NaN row
    compares greater than every literal, and bounds exclude NaN."""
    fields_by_name = {
        "x": {"id": 7, "name": "x", "type": "double"},
    }
    entry = {
        "partition": {},
        "lower_bounds": [{"key": 7, "value": im._BOUND_PACK["double"](0.5)}],
        "upper_bounds": [{"key": 7, "value": im._BOUND_PACK["double"](2.5)}],
    }
    # upper bound 2.5 < literal 10: a NaN-blind reader would prune,
    # losing any NaN rows (NaN > 10 under Spark ordering)
    assert im._entry_can_match(
        entry, [("x", ">", 10.0)], fields_by_name, {}
    )


def test_written_tree_reads_back_and_prunes(spark, tmp_path):
    root = str(tmp_path / "tree2")
    df = _mixed_df(spark)
    write_iceberg_dataset(spark, df, root, partition_by=[("ts", "day")])
    back = read_iceberg_table(spark, root)
    assert back.count() == 40
    full = len(back.inputFiles())
    pruned = read_iceberg_table(
        spark, root, predicate=[("event_id", "<", 2)]
    )
    assert len(pruned.inputFiles()) < full
    assert sorted(
        r.event_id for r in pruned.select("event_id").collect()
    ) == [0, 1]


def test_nan_rows_roundtrip(spark, tmp_path):
    """The NaN rows themselves survive the write+read cycle."""
    root = str(tmp_path / "tree3")
    write_iceberg_dataset(
        spark, _mixed_df(spark), root, partition_by=[("ts", "day")]
    )
    vals = [
        r.value
        for r in read_iceberg_table(spark, root).select("value").collect()
    ]
    assert sum(1 for v in vals if v is not None and math.isnan(v)) == 6
