"""Avro OCF codec tests: byte-level golden anchors against the public
spec (so encoder and decoder can't agree on a shared mistake), full
envelope round-trips, and the distributed Spark read path."""

from __future__ import annotations

import datetime
import tempfile

from hudi_and_delta_showcase_spark import avro_ocf as A
from hudi_and_delta_showcase_spark.operators.cdc import (
    ENVELOPE_SCHEMA,
    golden_backfill,
    golden_cdc_batch,
)


def test_binary_encoding_matches_spec_bytes():
    """Spec anchors: zigzag(1)=2, zigzag(-1)=1, zigzag(64)=128 (2-byte
    varint), strings/bytes are length-prefixed, unions index-prefixed."""
    import io

    out = io.BytesIO()
    A._encode("long", 1, out)
    assert out.getvalue() == b"\x02"
    out = io.BytesIO()
    A._encode("long", -1, out)
    assert out.getvalue() == b"\x01"
    out = io.BytesIO()
    A._encode("long", 64, out)
    assert out.getvalue() == b"\x80\x01"
    out = io.BytesIO()
    A._encode("string", "hi", out)
    assert out.getvalue() == b"\x04hi"
    out = io.BytesIO()
    A._encode(["null", "int"], None, out)
    assert out.getvalue() == b"\x00"
    out = io.BytesIO()
    A._encode(["null", "int"], 7, out)
    assert out.getvalue() == b"\x02\x0e"
    # record of (int 1, string "hi") is the field concatenation
    rec_schema = {
        "type": "record", "name": "r",
        "fields": [{"name": "a", "type": "int"},
                   {"name": "b", "type": "string"}],
    }
    out = io.BytesIO()
    A._encode(rec_schema, {"a": 1, "b": "hi"}, out)
    assert out.getvalue() == b"\x02\x04hi"
    # decode round-trips the same bytes
    assert A._decode(rec_schema, A._Reader(b"\x02\x04hi")) == {"a": 1, "b": "hi"}


def test_ocf_roundtrip_both_codecs():
    schema = {
        "type": "record", "name": "t",
        "fields": [
            {"name": "k", "type": "long"},
            {"name": "s", "type": ["null", "string"]},
            {"name": "ts", "type": {"type": "long",
                                    "logicalType": "timestamp-micros"}},
            {"name": "xs", "type": {"type": "array", "items": "int"}},
        ],
    }
    records = [
        {"k": i, "s": None if i % 3 == 0 else f"s{i}",
         "ts": datetime.datetime(2023, 1, 12, 4, 1, i),
         "xs": list(range(i % 5))}
        for i in range(50)
    ]
    for codec in ("null", "deflate"):
        blob = A.ocf_encode(schema, records, codec=codec)
        got_schema, got = A.ocf_decode(blob)
        assert got_schema == schema
        assert got == records


def _envelope_rows(df):
    """Spark envelope rows -> python dicts shaped for the avro encoder."""
    rows = []
    for r in df.collect():
        d = r.asDict(recursive=True)
        d["sort_keys"] = [dict(sk) for sk in d["sort_keys"]]
        rows.append(d)
    return rows


def test_spark_reads_avro_envelope_files(spark):
    """The full S1 path: golden envelope batches written as real Avro OCF
    files, read back DISTRIBUTED (binaryFile + mapInPandas), compared
    field-for-field against the in-memory originals."""
    avro_schema = A.spark_schema_to_avro(ENVELOPE_SCHEMA, "envelope")
    root = tempfile.mkdtemp(prefix="avro_s1_")
    for i, batch in enumerate([golden_backfill(spark), golden_cdc_batch(spark)]):
        with open(f"{root}/batch{i}.avro", "wb") as fh:
            fh.write(A.ocf_encode(avro_schema, _envelope_rows(batch)))

    got = A.read_avro_ocf(spark, f"{root}/*.avro", ENVELOPE_SCHEMA)
    assert got.schema == ENVELOPE_SCHEMA
    expected = golden_backfill(spark).unionByName(golden_cdc_batch(spark))
    g = sorted([tuple(r) for r in got.collect()], key=repr)
    e = sorted([tuple(r) for r in expected.collect()], key=repr)
    assert g == e
