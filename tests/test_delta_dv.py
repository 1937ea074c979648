"""Delta deletion-vector codec: Z85, RoaringBitmapArray portable
(de)serialization, CRC framing, descriptor resolution — all pure
Python, pinned against the public specs' own test vectors."""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hudi_and_delta_showcase_spark.tables import delta_dv as dv


def test_z85_spec_vector():
    # the ZeroMQ RFC 32 reference vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert dv.z85_encode(raw) == "HelloWorld"
    assert dv.z85_decode("HelloWorld") == raw


@given(st.binary(min_size=0, max_size=64).filter(lambda b: len(b) % 4 == 0))
def test_z85_roundtrip(raw):
    assert dv.z85_decode(dv.z85_encode(raw)) == raw


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=(1 << 33)),
        max_size=300,
        unique=True,
    )
)
def test_roaring_array_roundtrip(positions):
    data = dv.serialize_dv_data(positions)
    assert dv.deserialize_dv_data(data) == sorted(positions)


def test_roaring_bitset_container_roundtrip():
    # > 4096 values in one 16-bit key forces a bitset container
    vals = sorted(set(range(0, 60000, 7)))
    assert len(vals) > 4096
    assert dv.deserialize_dv_data(dv.serialize_dv_data(vals)) == vals


def test_roaring_run_container_parses():
    """Foreign writers may emit run containers (cookie 12347): build
    one by hand per the RoaringFormatSpec and check the reader."""
    # one run container, key 0, values 10..20 (card 11), plus run 40..40
    cookie = dv._SERIAL_COOKIE | ((1 - 1) << 16)
    blob = struct.pack("<i", cookie)
    blob += bytes([0b1])  # container 0 is a run container
    blob += struct.pack("<HH", 0, 12 - 1)  # key 0, cardinality 12
    # < NO_OFFSET_THRESHOLD containers with runs -> no offset header
    blob += struct.pack("<H", 2)  # two runs
    blob += struct.pack("<HHHH", 10, 10, 40, 0)  # [10,20], [40,40]
    data = struct.pack("<iq", dv.MAGIC, 1) + blob
    assert dv.deserialize_dv_data(data) == list(range(10, 21)) + [40]


def test_dv_file_roundtrip_and_crc(tmp_path):
    desc = dv.write_dv_file(str(tmp_path), [0, 5, 9], prefix="ab")
    assert desc["storageType"] == "u"
    assert desc["cardinality"] == 3
    assert dv.read_dv_positions(desc, str(tmp_path)) == [0, 5, 9]
    # corrupt one payload byte -> CRC must fail loudly
    rel = dv.dv_relative_path(desc["pathOrInlineDv"])
    full = tmp_path / rel
    blob = bytearray(full.read_bytes())
    blob[6] ^= 0xFF
    full.write_bytes(bytes(blob))
    with pytest.raises(ValueError, match="checksum"):
        dv.read_dv_positions(desc, str(tmp_path))


def test_inline_descriptor_roundtrip(tmp_path):
    desc = dv.inline_dv_descriptor([2, 3, 1000])
    assert desc["storageType"] == "i"
    assert dv.read_dv_positions(desc, str(tmp_path)) == [2, 3, 1000]


def test_uuid_path_derivation_roundtrips_prefix():
    import uuid

    u = uuid.uuid4()
    enc = "xy" + dv.z85_encode(u.bytes)
    assert dv.dv_relative_path(enc) == f"xy/deletion_vector_{u}.bin"
    enc = dv.z85_encode(u.bytes)
    assert dv.dv_relative_path(enc) == f"deletion_vector_{u}.bin"


def test_dv_rows_df_decodes_executor_side(spark, tmp_path):
    """The read path's descriptor -> (file, pos) explode: one output
    row per deleted position, decoded in tasks (mapInPandas), engine
    sidecar shape."""
    d1 = dv.write_dv_file(str(tmp_path), [1, 3])
    d2 = dv.inline_dv_descriptor([0])
    out = dv.dv_rows_df(
        spark, str(tmp_path), {"f1.parquet": d1, "f2.parquet": d2}
    )
    assert sorted(tuple(r) for r in out.collect()) == [
        ("f1.parquet", 1),
        ("f1.parquet", 3),
        ("f2.parquet", 0),
    ]


def test_export_delta_log_with_deletion_vectors(spark, tmp_path):
    """r7: DV state exports WITHOUT materialization — the engine
    sidecar becomes a real Delta DV bin, the file re-adds with a
    descriptor, the protocol upgrades to 3/7 with readerFeatures, and
    our own foreign-reader path round-trips the values."""
    import json as _json
    import os as _os

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        read_delta_table,
        export_delta_log,
    )

    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(1, 9)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(2,), (5,)], "k int"))
    assert t._commit(None).dv_files  # still merge-on-read state
    export_delta_log(t)
    # the exported log round-trips through the Delta-protocol reader
    got = sorted(
        (r.k, r.v)
        for r in read_delta_table(spark, t.path).select("k", "v").collect()
    )
    assert got == [(k, f"v{k}") for k in range(1, 9) if k not in (2, 5)]
    # time travel to the pre-delete version sees all rows
    tt = sorted(
        r.k for r in read_delta_table(spark, t.path, version=0).collect()
    )
    assert tt == list(range(1, 9))
    # protocol carries the feature form; the DV add is a remove+add
    log0 = open(
        _os.path.join(t.path, "_delta_log", "00000000000000000000.json")
    ).read()
    proto = next(
        _json.loads(l)["protocol"]
        for l in log0.splitlines()
        if '"protocol"' in l
    )
    assert proto["minReaderVersion"] == 3
    assert "deletionVectors" in proto["readerFeatures"]
    log1 = [
        _json.loads(l)
        for l in open(
            _os.path.join(t.path, "_delta_log", "00000000000000000001.json")
        ).read().splitlines()
    ]
    adds = [a["add"] for a in log1 if "add" in a]
    assert len(adds) == 1 and adds[0]["deletionVector"]["cardinality"] == 2
    assert any("remove" in a for a in log1)
    # incremental: a later DV delete exports its own re-add
    t.delete(spark.createDataFrame([(7,)], "k int"))
    export_delta_log(t)
    got2 = sorted(
        r.k for r in read_delta_table(spark, t.path).collect()
    )
    assert got2 == [1, 3, 4, 6, 8]


def test_export_feature_free_table_stays_protocol_12(spark, tmp_path):
    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
    )
    import json as _json
    import os as _os

    df = spark.createDataFrame([(1, "a")], "k int, v string").coalesce(1)
    t = LakehouseTable.create(spark, str(tmp_path / "t"), df, key_cols=["k"])
    export_delta_log(t)
    log0 = open(
        _os.path.join(t.path, "_delta_log", "00000000000000000000.json")
    ).read()
    proto = next(
        _json.loads(l)["protocol"]
        for l in log0.splitlines()
        if '"protocol"' in l
    )
    assert proto == {"minReaderVersion": 1, "minWriterVersion": 2}


def test_checkpoint_carries_dvs_and_protocol(spark, tmp_path):
    """A checkpoint of a DV-bearing export must carry the 3/7 protocol
    and every live add's descriptor — a reader starting from the
    checkpoint alone (expired JSON commits) must not resurrect rows."""
    import os as _os

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
        read_delta_table,
        write_checkpoint,
    )

    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(1, 7)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(4,)], "k int"))
    export_delta_log(t)
    write_checkpoint(spark, t.path)
    # expire the JSON commits: replay must start from the checkpoint
    for f in _os.listdir(_os.path.join(t.path, "_delta_log")):
        if f.endswith(".json") and f[:-5].isdigit():
            _os.remove(_os.path.join(t.path, "_delta_log", f))
    got = sorted(
        r.k for r in read_delta_table(spark, t.path).collect()
    )
    assert got == [1, 2, 3, 5, 6]


def test_dv_full_circle_export_then_adopt(spark, tmp_path):
    """Full circle: an engine DV table exports a real DV-bearing
    _delta_log; stripping the engine metadata and ADOPTING the export
    as a foreign table must reproduce the identical state — the
    descriptor written by the exporter round-trips through the
    adopter's decoder bit-for-bit."""
    import os as _os
    import shutil as _shutil

    from hudi_and_delta_showcase_spark.tables import LakehouseTable
    from hudi_and_delta_showcase_spark.tables.delta_log import (
        export_delta_log,
    )

    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(1, 20)], "k int, v string"
    ).coalesce(1)
    t = LakehouseTable.create(
        spark, str(tmp_path / "t"), df, key_cols=["k"],
        deletion_vectors=True,
    )
    t.delete(spark.createDataFrame([(3,), (9,), (15,)], "k int"))
    export_delta_log(t)
    want = sorted((r.k, r.v) for r in t.read().select("k", "v").collect())

    foreign = str(tmp_path / "foreign")
    _shutil.copytree(t.path, foreign)
    _os.remove(_os.path.join(foreign, "_meta.json"))
    _shutil.rmtree(_os.path.join(foreign, "_commits"))
    _shutil.rmtree(_os.path.join(foreign, "dv"))  # engine sidecars gone
    a = LakehouseTable.convert_delta(spark, foreign, key_cols=["k"])
    got = sorted((r.k, r.v) for r in a.read().select("k", "v").collect())
    assert got == want
    assert a._commit(None).dv_files  # re-materialized as engine sidecars
