"""HoodieLogFormat block codec: framing, Avro data blocks, rollback
command blocks, timeline-validity filtering, file naming."""

from __future__ import annotations

import pytest

from hudi_and_delta_showcase_spark.tables import hoodie_log as hl

_SCHEMA = {
    "type": "record",
    "name": "r",
    "fields": [
        {"name": "k", "type": ["null", "long"]},
        {"name": "v", "type": ["null", "string"]},
    ],
}


def test_block_framing_roundtrip():
    recs = [{"k": 1, "v": "a"}, {"k": 2, "v": None}]
    blob = hl.avro_data_block(recs, _SCHEMA, "20240101000000000")
    (block,) = hl.parse_log_blob(blob)
    assert block["type"] == hl.AVRO_DATA_BLOCK
    assert block["header"][hl.INSTANT_TIME] == "20240101000000000"
    assert block["records"] == recs


def test_multi_block_file_and_rollback():
    b1 = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    b2 = hl.avro_data_block([{"k": 2, "v": "b"}], _SCHEMA, "002")
    rb = hl.rollback_block("001", "003")
    out = hl.resolve_log_blocks([b1 + b2 + rb])
    assert out == [("002", [{"k": 2, "v": "b"}])]
    # rollback reaches across FILES of the same group
    out = hl.resolve_log_blocks([b1, b2, rb])
    assert out == [("002", [{"k": 2, "v": "b"}])]


def test_uncommitted_instant_blocks_skipped():
    b1 = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    b2 = hl.avro_data_block([{"k": 2, "v": "b"}], _SCHEMA, "002")
    out = hl.resolve_log_blocks([b1 + b2], valid_instants=frozenset({"001"}))
    assert out == [("001", [{"k": 1, "v": "a"}])]


def test_refuses_delete_and_hfile_blocks():
    fake = hl._frame_block(hl.DELETE_BLOCK, {hl.INSTANT_TIME: "001"}, b"x")
    with pytest.raises(ValueError, match="beyond this reader"):
        hl.parse_log_blob(fake)


def test_bad_magic_and_length_fail_loudly():
    good = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    with pytest.raises(ValueError, match="magic"):
        hl.parse_log_blob(b"NOTHUD" + good[6:])
    corrupt = bytearray(good)
    corrupt[7] ^= 0x01  # flip a block-length byte
    with pytest.raises(ValueError):
        hl.parse_log_blob(bytes(corrupt))


def test_log_file_name_roundtrip():
    name = hl.log_file_name("abc-1", "20240101000000000", 12, "0-7-3")
    info = hl.parse_log_file_name(name)
    assert info == {
        "file_id": "abc-1",
        "base_instant": "20240101000000000",
        "version": 12,
        "token": "0-7-3",
    }
    assert hl.parse_log_file_name("part-0000.parquet") is None
