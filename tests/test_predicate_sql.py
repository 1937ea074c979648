"""SQL-string predicates (r10): every predicate-taking reader
(Iceberg / Delta / Hudi, snapshot + incremental) accepts a
conjunct-only WHERE fragment — parsed strictly; anything beyond
`col <op> literal [AND ...]` raises rather than silently mis-pruning."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
    parse_predicate_sql,
)


def test_parse_comparisons_and_in():
    assert parse_predicate_sql("g = 'a'") == [("g", "=", "a")]
    assert parse_predicate_sql("k <= 5 AND k > -2") == [
        ("k", "<=", 5), ("k", ">", -2)
    ]
    assert parse_predicate_sql("x >= 1.5") == [("x", ">=", 1.5)]
    assert parse_predicate_sql("t IN ('x', 'y') and k in (1, 2)") == [
        ("t", "in", ["x", "y"]), ("k", "in", [1, 2])
    ]
    # quoted '' escape, AND inside a literal is not a separator
    assert parse_predicate_sql("v = 'o''brien AND co'") == [
        ("v", "=", "o'brien AND co")
    ]


@pytest.mark.parametrize("bad", [
    "g != 'a'",            # unsupported op
    "g = 'a' OR k = 1",    # OR
    "upper(g) = 'A'",      # function
    "g = k",               # column-vs-column
    "",                    # empty
    "k BETWEEN 1 AND 5",   # between
])
def test_parse_rejects_loudly(bad):
    with pytest.raises(ValueError):
        parse_predicate_sql(bad)


def test_string_predicate_reads_all_three(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
    )
    from hudi_and_delta_showcase_spark.tables.hoodie_metadata import (
        export_hoodie_metadata,
    )
    from hudi_and_delta_showcase_spark.tables.hoodie_timeline import (
        export_hoodie_timeline,
        read_hoodie_table,
    )
    from hudi_and_delta_showcase_spark.tables.iceberg_meta import (
        export_iceberg_metadata,
        read_iceberg_table,
    )

    df = spark.createDataFrame(
        [(k, f"v{k}", "a" if k < 20 else "b") for k in range(40)],
        "k int, v string, g string",
    ).coalesce(2)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"], partition_by="g"
    )
    export_delta_log(t)
    export_iceberg_metadata(t)
    export_hoodie_timeline(t)
    export_hoodie_metadata(t)
    expect = [(k, "a") for k in range(5, 20)]
    pred = "g = 'a' AND k >= 5"
    for reader in (read_delta_table, read_iceberg_table, read_hoodie_table):
        out = reader(spark, t.path, predicate=pred)
        assert sorted(
            (r.k, r.g) for r in out.select("k", "g").collect()
        ) == expect, reader.__name__
