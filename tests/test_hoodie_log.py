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
    assert out == [("002", [{"k": 2, "v": "b"}], [])]
    # rollback reaches across FILES of the same group
    out = hl.resolve_log_blocks([b1, b2, rb])
    assert out == [("002", [{"k": 2, "v": "b"}], [])]


def test_uncommitted_instant_blocks_skipped():
    b1 = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    b2 = hl.avro_data_block([{"k": 2, "v": "b"}], _SCHEMA, "002")
    out = hl.resolve_log_blocks([b1 + b2], valid_instants=frozenset({"001"}))
    assert out == [("001", [{"k": 1, "v": "a"}], [])]


def test_delete_block_roundtrip():
    """r8: HoodieDeleteBlock (Avro HoodieDeleteRecordList, content
    version 3 — Hudi >= 0.14) encodes and decodes; tombstones fold in
    log order through resolve_log_blocks."""
    dels = [
        {"recordKey": "7", "partitionPath": "", "orderingVal": 42},
        {"recordKey": "id:9,region:eu", "partitionPath": None,
         "orderingVal": None},
    ]
    blob = hl.delete_block(dels, "002")
    (block,) = hl.parse_log_blob(blob)
    assert block["type"] == hl.DELETE_BLOCK
    assert block["deletes"] == dels
    b1 = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    out = hl.resolve_log_blocks([b1 + blob])
    assert out == [("001", [{"k": 1, "v": "a"}], []), ("002", [], dels)]
    # rollback of the delete's instant drops the tombstones too
    out = hl.resolve_log_blocks([b1 + blob + hl.rollback_block("002", "003")])
    assert out == [("001", [{"k": 1, "v": "a"}], [])]


def test_refuses_legacy_kryo_delete_and_hfile_blocks():
    import struct

    legacy = hl._frame_block(
        hl.DELETE_BLOCK, {hl.INSTANT_TIME: "001"},
        struct.pack(">ii", 2, 1) + b"x",  # version 2 = kryo DeleteRecord[]
    )
    with pytest.raises(ValueError, match="kryo"):
        hl.parse_log_blob(legacy)
    hfile = hl._frame_block(hl.HFILE_DATA_BLOCK, {hl.INSTANT_TIME: "001"},
                            b"x")
    with pytest.raises(ValueError, match="beyond this reader"):
        hl.parse_log_blob(hfile)


def test_bad_leading_magic_fails_loudly():
    good = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    # a file that doesn't START with the magic isn't a log file at all
    with pytest.raises(ValueError, match="magic"):
        hl.parse_log_blob(b"NOTHUD" + good[6:])


def test_torn_tail_and_corrupt_block_recovery():
    """Hudi's crash discipline: a torn APPEND (truncated tail) ends the
    scan; a corrupt block mid-file becomes a CORRUPT marker and the
    reader resumes at the next magic — later intact blocks still
    serve."""
    b1 = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    b2 = hl.avro_data_block([{"k": 2, "v": "b"}], _SCHEMA, "002")
    # torn tail: the writer crashed mid-append of b2
    torn = b1 + b2[: len(b2) // 2]
    blocks = hl.parse_log_blob(torn)
    assert [b["type"] for b in blocks] == [hl.AVRO_DATA_BLOCK,
                                           hl.CORRUPT_BLOCK]
    assert hl.resolve_log_blocks([torn]) == [
        ("001", [{"k": 1, "v": "a"}], [])]
    # corrupt middle: flipped length byte in b1, intact b2 after it
    corrupt = bytearray(b1 + b2)
    corrupt[7] ^= 0x01
    out = hl.resolve_log_blocks([bytes(corrupt)])
    assert out == [("002", [{"k": 2, "v": "b"}], [])]


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


def test_block_roundtrip_property():
    """Hypothesis: any record batch survives the Avro-block framing."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    rec = st.fixed_dictionaries({
        "k": st.one_of(st.none(), st.integers(-2**40, 2**40)),
        "v": st.one_of(st.none(), st.text(max_size=12)),
    })

    @settings(max_examples=50, deadline=None)
    @given(st.lists(rec, min_size=0, max_size=8),
           st.lists(rec, min_size=1, max_size=4))
    def _roundtrip(r1, r2):
        b1 = hl.avro_data_block(r1, _SCHEMA, "001")
        b2 = hl.avro_data_block(r2, _SCHEMA, "002")
        out = hl.resolve_log_blocks([b1, b2])
        want = ([("001", r1)] if r1 else []) + [("002", r2)]
        # empty batches still frame/parse; records match field-for-field
        assert [(i, rs) for i, rs, _d in out if rs] == [
            (i, rs) for i, rs in want if rs]

    _roundtrip()


def test_parquet_data_block_roundtrip():
    """r8: hoodie.logfile.data.block.format=parquet — the block content
    is one in-memory parquet file; records fold into the replay just
    like Avro blocks."""
    recs = [{"k": 1, "v": "a"}, {"k": 2, "v": None}]
    blob = hl.parquet_data_block(recs, "004")
    (block,) = hl.parse_log_blob(blob)
    assert block["type"] == hl.PARQUET_DATA_BLOCK
    assert block["records"] == recs
    b1 = hl.avro_data_block([{"k": 9, "v": "z"}], _SCHEMA, "003")
    out = hl.resolve_log_blocks([b1 + blob])
    assert out == [("003", [{"k": 9, "v": "z"}], []), ("004", recs, [])]
    # a torn parquet block refuses loudly rather than mis-decoding
    import struct

    bad = hl._frame_block(hl.PARQUET_DATA_BLOCK, {hl.INSTANT_TIME: "005"},
                          b"NOTP" + b"x" * 16)
    with pytest.raises(ValueError, match="PAR1"):
        hl.parse_log_blob(bad)


def test_cdc_data_block_tolerated_not_merged():
    """r8: CDC_DATA blocks (hoodie.table.cdc.enabled supplemental
    logging; same content layout as Avro data blocks) decode instead
    of refusing, but their change images do NOT fold into the data
    merge."""
    import struct

    data = hl.avro_data_block([{"k": 1, "v": "a"}], _SCHEMA, "001")
    # reframe an avro payload under the CDC ordinal
    cdc_rec = [{"k": 1, "v": "op=u"}]
    inner = hl.avro_data_block(cdc_rec, _SCHEMA, "002")
    _h, _t, content, _e = hl._frame_one(inner, 0)
    cdc = hl._frame_block(
        hl.CDC_DATA_BLOCK,
        {hl.INSTANT_TIME: "002", hl.SCHEMA: __import__("json").dumps(_SCHEMA)},
        content,
    )
    blocks = hl.parse_log_blob(data + cdc)
    assert [b["type"] for b in blocks] == [hl.AVRO_DATA_BLOCK,
                                           hl.CDC_DATA_BLOCK]
    assert blocks[1]["records"] == cdc_rec
    out = hl.resolve_log_blocks([data + cdc])
    assert out == [("001", [{"k": 1, "v": "a"}], [])]
