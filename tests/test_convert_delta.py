"""CONVERT FROM DELTA: metadata-only adoption of a _delta_log snapshot
— orphans excluded, partitions derived from paths, and everything a
metadata-only adoption cannot represent refused loudly."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
import pytest

from hudi_and_delta_showcase_spark.tables import LakehouseTable
from hudi_and_delta_showcase_spark.tables.delta_log import (
    read_delta_table,
    write_delta_table,
)

_SCHEMA = json.dumps(
    {
        "type": "struct",
        "fields": [
            {"name": "k", "type": "integer", "nullable": True, "metadata": {}},
            {"name": "v", "type": "string", "nullable": True, "metadata": {}},
            {"name": "g", "type": "integer", "nullable": True, "metadata": {}},
        ],
    }
)


def _rows(df):
    return sorted((r.k, r.v) for r in df.select("k", "v").collect())


def test_convert_adopts_live_snapshot_not_orphans(spark, tmp_path):
    """Overwritten files stay on disk awaiting VACUUM; adoption must
    take the LOG's live set, not a directory walk."""
    root = str(tmp_path / "dl")
    df1 = spark.createDataFrame([(1, "a", 0), (2, "b", 0)], "k int, v string, g int")
    df2 = spark.createDataFrame([(3, "c", 0), (4, "d", 0)], "k int, v string, g int")
    write_delta_table(df1.coalesce(1), root)
    write_delta_table(df2.coalesce(1), root, mode="overwrite")
    want = _rows(read_delta_table(spark, root))
    assert want == [(3, "c"), (4, "d")]

    t = LakehouseTable.convert_delta(spark, root, key_cols=["k"])
    assert _rows(t.read()) == want
    assert t._commit(None).stats["source_format"] == "delta"

    # the adopted table is a full citizen: upsert on top works
    t.upsert(spark.createDataFrame([(3, "c2", 0)], "k int, v string, g int"))
    assert _rows(t.read()) == [(3, "c2"), (4, "d")]
    # and the orphaned v0 files were never resurrected
    assert 1 not in {r.k for r in t.read().collect()}


def _foreign_partitioned_delta(spark, root: str) -> None:
    """A partitioned _delta_log the way delta-spark lays it out:
    col=value dirs, partition column ABSENT from the data files."""
    os.makedirs(os.path.join(root, "_delta_log"))
    import pyarrow as pa
    import pyarrow.parquet as pq

    files = {}
    for g, ks in ((0, [1, 2]), (1, [3])):
        rel = f"g={g}/part-00000-0000000{g}-c000.snappy.parquet"
        os.makedirs(os.path.join(root, f"g={g}"), exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "k": pa.array(ks, pa.int32()),
                    "v": pa.array([f"v{k}" for k in ks]),
                }
            ),
            os.path.join(root, rel),
        )
        files[rel] = g
    actions = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {
            "metaData": {
                "id": "0f000000-0000-4000-8000-000000000001",
                "format": {"provider": "parquet", "options": {}},
                "schemaString": _SCHEMA,
                "partitionColumns": ["g"],
                "configuration": {},
            }
        },
    ] + [
        {
            "add": {
                "path": rel,
                "partitionValues": {"g": str(g)},
                "size": 500,
                "modificationTime": 1700000000000,
                "dataChange": True,
            }
        }
        for rel, g in files.items()
    ]
    with open(
        os.path.join(root, "_delta_log", "00000000000000000000.json"), "w"
    ) as fh:
        fh.write("\n".join(json.dumps(a) for a in actions))


def test_convert_partitioned_delta_derives_column(spark, tmp_path):
    root = str(tmp_path / "dlp")
    _foreign_partitioned_delta(spark, root)
    t = LakehouseTable.convert_delta(spark, root, key_cols=["k"])
    got = sorted((r.k, r.v, r.g) for r in t.read().select("k", "v", "g").collect())
    assert got == [(1, "v1", 0), (2, "v2", 0), (3, "v3", 1)]
    # partition pruning works from version 0 via the seeded col_stats
    pruned = t.read_where("g", lo=1, hi=1)
    assert sorted(r.k for r in pruned.collect()) == [3]


def test_refuses_deletion_vectors(spark, tmp_path):
    root = str(tmp_path / "dl")
    write_delta_table(
        spark.createDataFrame([(1, "a", 0)], "k int, v string, g int").coalesce(1),
        root,
    )
    # forge a DV-bearing add on the live file
    log = os.path.join(root, "_delta_log")
    v0 = open(os.path.join(log, "00000000000000000000.json")).read().splitlines()
    add = next(json.loads(l) for l in v0 if "add" in l)["add"]
    dv_add = dict(add)
    dv_add["deletionVector"] = {
        "storageType": "u", "pathOrInlineDv": "ab", "offset": 1,
        "sizeInBytes": 40, "cardinality": 1,
    }
    with open(os.path.join(log, "00000000000000000001.json"), "w") as fh:
        fh.write(json.dumps({"add": dv_add}))
    with pytest.raises(RuntimeError, match="deletion vectors"):
        LakehouseTable.convert_delta(spark, root, key_cols=["k"])


def test_refuses_column_mapping_and_advanced_protocol(spark, tmp_path):
    for i, (patch, msg) in enumerate(
        [
            (
                {"metaData": {
                    "id": "x", "format": {"provider": "parquet", "options": {}},
                    "schemaString": _SCHEMA, "partitionColumns": [],
                    "configuration": {"delta.columnMapping.mode": "name"},
                }},
                "column mapping",
            ),
            (
                {"protocol": {"minReaderVersion": 3, "minWriterVersion": 7}},
                "protocol",
            ),
        ]
    ):
        root = str(tmp_path / f"dl{i}")
        write_delta_table(
            spark.createDataFrame(
                [(1, "a", 0)], "k int, v string, g int"
            ).coalesce(1),
            root,
        )
        with open(
            os.path.join(root, "_delta_log", "00000000000000000001.json"), "w"
        ) as fh:
            fh.write(json.dumps(patch))
        with pytest.raises(RuntimeError, match=msg):
            LakehouseTable.convert_delta(spark, root, key_cols=["k"])
