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


def test_refuses_unknown_delete_version_and_torn_hfile_blocks():
    import struct

    v0 = hl._frame_block(
        hl.DELETE_BLOCK, {hl.INSTANT_TIME: "001"},
        struct.pack(">ii", 0, 1) + b"x",
    )
    with pytest.raises(ValueError, match="beyond this reader"):
        hl.parse_log_blob(v0)
    # an HFILE block whose content is not a real HFile refuses loudly
    # (r11: well-formed HFile content now DECODES — see below)
    hfile = hl._frame_block(hl.HFILE_DATA_BLOCK, {hl.INSTANT_TIME: "001"},
                            b"x")
    with pytest.raises(ValueError, match="trailer"):
        hl.parse_log_blob(hfile)


def test_hfile_data_block_decodes(spark_noop_placeholder=None):
    """r11: hoodie.logfile.data.block.format=hfile — the block content
    is a complete in-memory HFile v3; cell values avro-decode with the
    block SCHEMA header, and the records ride the same merge as avro/
    parquet blocks."""
    import io as _io
    import json as _json

    from hudi_and_delta_showcase_spark import avro_ocf
    from hudi_and_delta_showcase_spark.tables import hfile as hf

    recs = [{"k": 1, "v": "a"}, {"k": 2, "v": "b"}]
    cells = []
    for r in recs:
        buf = _io.BytesIO()
        avro_ocf._encode(_SCHEMA, r, buf)
        cells.append((str(r["k"]).encode(), buf.getvalue()))
    content = hf.write_hfile(cells)
    blob = hl._frame_block(
        hl.HFILE_DATA_BLOCK,
        {hl.INSTANT_TIME: "001", hl.SCHEMA: _json.dumps(_SCHEMA)},
        content,
    )
    out = hl.resolve_log_blocks([blob])
    assert out == [("001", recs, [])]
    # schema can also ride the HFile file info when the header lacks it
    content2 = hf.write_hfile(
        cells, {b"schema": _json.dumps(_SCHEMA).encode()}
    )
    blob2 = hl._frame_block(
        hl.HFILE_DATA_BLOCK, {hl.INSTANT_TIME: "001"}, content2
    )
    assert hl.resolve_log_blocks([blob2]) == [("001", recs, [])]


# --------------------------------------------------------------------- #
# legacy kryo delete payloads (content v1/v2, Hudi < 0.14) — goldens
# authored here by a test-side Kryo 4 writer mirroring the public wire
# format (varints, ascii/utf8 strings, NAME class records, reference
# markers), decoded by hoodie_log._kryo_delete_records
# --------------------------------------------------------------------- #

import struct as _struct  # noqa: E402


class _KryoWriter:
    def __init__(self):
        self.out = bytearray()
        self.names: dict[str, int] = {}
        self.next_ref = 0

    def varint(self, v: int):
        while True:
            b = v & 0x7F
            v >>= 7
            if v:
                self.out.append(b | 0x80)
            else:
                self.out.append(b)
                return

    def zigzag(self, v: int):
        self.varint((v << 1) ^ (v >> 63) if v < 0 else v << 1)

    def string(self, s: str):
        # Output.writeString: ascii fast path for 1 < len < 64, else
        # utf8 with a (charCount+1) length whose first byte sets 0x80
        if 1 < len(s) < 64 and all(ord(c) < 0x80 for c in s):
            b = bytearray(s.encode("ascii"))
            b[-1] |= 0x80
            self.out += b
            return
        # Java strings count UTF-16 code units; Kryo CESU-8-encodes
        # each unit separately (surrogate pairs = two 3-byte seqs)
        units = s.encode("utf-16-be", "surrogatepass")
        n = len(units) // 2 + 1
        if n >> 6 == 0:
            self.out.append(n | 0x80)
        elif n >> 13 == 0:
            self.out.append((n & 0x3F) | 0x40 | 0x80)
            self.out.append(n >> 6)
        else:
            raise AssertionError("golden strings stay short")
        for i in range(0, len(units), 2):
            cu = int.from_bytes(units[i:i + 2], "big")
            self.out += chr(cu).encode("utf-8", "surrogatepass")

    def clazz(self, name: str):
        self.varint(1)  # NAME record
        if name in self.names:
            self.varint(self.names[name])
            return
        nid = len(self.names)
        self.names[name] = nid
        self.varint(nid)
        self.string(name)

    def new_ref(self) -> int:
        """NOT_NULL marker for a new tracked object; returns its id."""
        self.varint(1)
        rid = self.next_ref
        self.next_ref += 1
        return rid

    def back_ref(self, rid: int):
        self.varint(rid + 2)

    def tracked_string(self, s: str | None):
        if s is None:
            self.varint(0)
            return None
        rid = self.new_ref()
        self.string(s)
        return rid


_HK = "org.apache.hudi.common.model.HoodieKey"
_DR = "org.apache.hudi.common.model.DeleteRecord"


def _kryo_v1_payload(keys, back_ref_last=False) -> bytes:
    w = _KryoWriter()
    w.clazz(f"[L{_HK};")
    w.new_ref()  # the array itself
    w.varint(len(keys) + (2 if back_ref_last else 1))
    first_rid = None
    for pp, rk in keys:
        w.clazz(_HK)
        rid = w.new_ref()
        if first_rid is None:
            first_rid = rid
        w.tracked_string(pp)  # FieldSerializer: partitionPath first
        w.tracked_string(rk)
    if back_ref_last:  # a repeated element arrives as a back-reference
        w.clazz(_HK)
        w.back_ref(first_rid)
    return bytes(w.out)


def _kryo_v2_payload(records) -> bytes:
    """records: (pp, rk, ordering_val) with int/long/double/str/None."""
    w = _KryoWriter()
    w.clazz(f"[L{_DR};")
    w.new_ref()
    w.varint(len(records) + 1)
    for pp, rk, ov in records:
        w.clazz(_DR)
        w.new_ref()
        # field hoodieKey (declared non-final -> class rides the wire)
        w.clazz(_HK)
        w.new_ref()
        w.tracked_string(pp)
        w.tracked_string(rk)
        # field orderingVal (Comparable -> concrete class rides)
        if ov is None:
            w.varint(0)  # null class
        elif isinstance(ov, bool):
            w.varint(3 + 2)  # registered boolean
            w.out.append(1 if ov else 0)
        elif isinstance(ov, int) and -(2**31) <= ov < 2**31:
            w.varint(0 + 2)  # registered int
            w.zigzag(ov)
        elif isinstance(ov, int):
            w.varint(7 + 2)  # registered long
            w.zigzag(ov)
        elif isinstance(ov, float):
            w.varint(8 + 2)  # registered double
            w.out += _struct.pack("<d", ov)
        else:
            w.varint(1 + 2)  # registered String
            w.new_ref()
            w.string(ov)
    return bytes(w.out)


def _delete_block_legacy(payload: bytes, version: int, instant: str) -> bytes:
    content = _struct.pack(">ii", version, len(payload)) + payload
    return hl._frame_block(
        hl.DELETE_BLOCK, {hl.INSTANT_TIME: instant}, content
    )


def test_kryo_v1_hoodie_keys_decode():
    payload = _kryo_v1_payload(
        [("2024/01/01", "k1"), ("2024/01/01", "id:9,region:eu"),
         (None, "ké-unicode"), ("", "x")]
    )
    blob = _delete_block_legacy(payload, 1, "001")
    (block,) = hl.parse_log_blob(blob)
    assert block["type"] == hl.DELETE_BLOCK
    assert block["deletes"] == [
        {"recordKey": "k1", "partitionPath": "2024/01/01",
         "orderingVal": None},
        {"recordKey": "id:9,region:eu", "partitionPath": "2024/01/01",
         "orderingVal": None},
        {"recordKey": "ké-unicode", "partitionPath": None,
         "orderingVal": None},
        {"recordKey": "x", "partitionPath": "", "orderingVal": None},
    ]


def test_kryo_non_bmp_record_key_decodes():
    """r10 review finding: Kryo writes Java chars CESU-8 style —
    a supplementary-plane character (two surrogate code units, two
    3-byte sequences) must decode back to the real character, not
    crash strict utf-8."""
    key = "user-\U0001F600-42"  # emoji record key
    payload = _kryo_v1_payload([("2024", key)])
    blob = _delete_block_legacy(payload, 1, "001")
    (b,) = hl.parse_log_blob(blob)
    assert [d["recordKey"] for d in b["deletes"]] == [key]


def test_kryo_v1_back_reference_element():
    payload = _kryo_v1_payload([("p", "k1")], back_ref_last=True)
    blob = _delete_block_legacy(payload, 1, "001")
    (block,) = hl.parse_log_blob(blob)
    assert [d["recordKey"] for d in block["deletes"]] == ["k1", "k1"]


def test_kryo_v2_delete_records_decode():
    payload = _kryo_v2_payload([
        ("p", "k1", 42),            # int orderingVal
        ("p", "k2", 2**40),         # long
        (None, "k3", 1.5),          # double
        ("p", "k4", "2024-01-02"),  # string
        ("p", "k5", None),          # absent
        ("p", "k6", -7),            # negative int (zigzag)
    ])
    blob = _delete_block_legacy(payload, 2, "002")
    (block,) = hl.parse_log_blob(blob)
    assert block["deletes"] == [
        {"recordKey": "k1", "partitionPath": "p", "orderingVal": 42},
        {"recordKey": "k2", "partitionPath": "p", "orderingVal": 2**40},
        {"recordKey": "k3", "partitionPath": None, "orderingVal": 1.5},
        {"recordKey": "k4", "partitionPath": "p",
         "orderingVal": "2024-01-02"},
        {"recordKey": "k5", "partitionPath": "p", "orderingVal": None},
        {"recordKey": "k6", "partitionPath": "p", "orderingVal": -7},
    ]


def test_kryo_unknown_shapes_still_refuse():
    # wrong array class
    w = _KryoWriter()
    w.clazz("[Lcom.example.Other;")
    with pytest.raises(ValueError, match="compact with Hudi"):
        hl._kryo_delete_records(bytes(w.out) + b"\x01\x02", 1)
    # exotic orderingVal class refuses instead of mis-decoding
    w = _KryoWriter()
    w.clazz(f"[L{_DR};")
    w.new_ref()
    w.varint(2)
    w.clazz(_DR)
    w.new_ref()
    w.clazz(_HK)
    w.new_ref()
    w.tracked_string("p")
    w.tracked_string("k")
    w.clazz("org.apache.avro.util.Utf8")
    with pytest.raises(ValueError, match="orderingVal"):
        hl._kryo_delete_records(bytes(w.out), 2)
    # truncated payload surfaces as a loud error, not wrong keys
    good = _kryo_v1_payload([("p", "k1")])
    with pytest.raises((ValueError, IndexError)):
        hl._kryo_delete_records(good[: len(good) - 2], 1)


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
