"""Minimal HBase **HFile v3** reader/writer — the base-file format of
the Hudi metadata table's compacted partitions (r11, verdict #6).

Hudi 0.14+ compacts ``.hoodie/metadata/*`` partitions into HFile base
files (``HFILE`` is the metadata table's default base format), so a
mature table loses the O(partitions) listing path exactly when it is
biggest unless the reader speaks this format. The format is fixed and
public (HBase ``hbase-server`` HFile v3: HFileBlock / FixedFileTrailer /
HFileBlockIndex / HFileInfo; protos in ``HFile.proto``):

* file = a sequence of BLOCKS, each with a 33-byte header
  (8-byte type magic, on-disk/uncompressed sizes, prev-block offset,
  checksum type + chunk size, on-disk-data-size-with-header), payload
  (optionally compressed), then CRC chunk checksums;
* a load-on-open section: ROOT INDEX block (``IDXROOT2``: per entry a
  long offset, int on-disk size, and a Hadoop-vint-prefixed first
  key), FILE INFO block (``FILEINF2``: ``PBUF`` magic + a delimited
  ``FileInfoProto`` of bytes->bytes pairs);
* a FIXED 4096-byte trailer: ``TRABLK"$`` magic + ``PBUF`` + delimited
  ``FileTrailerProto``, zero padding, and the version int
  ``(major & 0xFFFFFF) | (minor << 24)`` as the last 4 bytes;
* DATA block payload = KeyValue cells: int32 key length, int32 value
  length, key (int16 row length, row, int8 family length, family,
  qualifier, int64 timestamp, int8 type), value, then optional tags
  and an optional memstore-timestamp vlong when the file info says so.

The reader is deliberately conservative: anything it cannot prove it
decodes correctly (non-v3 major version, unsupported compression
codec, encrypted files, encoded data blocks) raises ``ValueError`` so
callers fall back loudly. Scale shape: an HFile is read ONCE into
memory per metadata partition (these files are O(partitions) metadata,
not data), decoded driver- or executor-side by whoever holds the
bytes; no Spark dependency in this module.

Only the plain protobuf wire format is implemented inline (varint +
length-delimited fields) — no protobuf library dependency.

Reference anchor: the ``.hoodie`` internals the showcase's MoR
demonstration relies on (reference README.md:556-1154); the metadata
table itself per the public Hudi RFC-15 spec, whose compacted base
format is HFile.
"""

from __future__ import annotations

import gzip
import struct
import zlib

TRAILER_MAGIC = b'TRABLK"$'
PB_MAGIC = b"PBUF"
TRAILER_SIZE = 4096
HEADER_SIZE = 33

DATA_MAGIC = b"DATABLK*"
ENCODED_DATA_MAGIC = b"DATABLKE"
ROOT_INDEX_MAGIC = b"IDXROOT2"
INTERMEDIATE_INDEX_MAGIC = b"IDXINTE2"
LEAF_INDEX_MAGIC = b"IDXLEAF2"
FILE_INFO_MAGIC = b"FILEINF2"

#: HBase Compression.Algorithm ordinals (trailer field 12)
CODEC_LZO, CODEC_GZ, CODEC_NONE, CODEC_SNAPPY, CODEC_LZ4 = 0, 1, 2, 3, 4

#: KeyValue.Type.Put
CELL_TYPE_PUT = 4

#: reserved FileInfo keys that change cell layout
_MAX_MEMSTORE_TS_KEY = b"hfile.MAX_MEMSTORE_TS_KEY"
_MAX_TAGS_LEN = b"hfile.MAX_TAGS_LEN"


# --------------------------------------------------------------------------
# protobuf wire format (varint + length-delimited only — all HFile
# protos use field types within that subset)
# --------------------------------------------------------------------------


def _pb_read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    acc = shift = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not b & 0x80:
            return acc, pos
        shift += 7


def _pb_fields(buf: bytes) -> dict[int, list]:
    """Decode one protobuf message into {field number: [values]} —
    varint fields as ints, length-delimited as bytes. Unknown wire
    types refuse (nothing in HFile protos uses them)."""
    out: dict[int, list] = {}
    pos = 0
    while pos < len(buf):
        tag, pos = _pb_read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _pb_read_varint(buf, pos)
        elif wire == 2:
            n, pos = _pb_read_varint(buf, pos)
            v = buf[pos:pos + n]
            if len(v) != n:
                raise ValueError("truncated protobuf field")
            pos += n
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _pb_varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _pb_field(field: int, value) -> bytes:
    if isinstance(value, int):
        return _pb_varint(field << 3) + _pb_varint(value)
    return _pb_varint((field << 3) | 2) + _pb_varint(len(value)) + value


def _pb_delimited(msg: bytes) -> bytes:
    return _pb_varint(len(msg)) + msg


def _pb_read_delimited(buf: bytes, pos: int) -> tuple[bytes, int]:
    n, pos = _pb_read_varint(buf, pos)
    return buf[pos:pos + n], pos + n


# --------------------------------------------------------------------------
# Hadoop WritableUtils vint (root-index keys use Bytes.writeByteArray)
# --------------------------------------------------------------------------


def _hadoop_vint_write(v: int) -> bytes:
    if -112 <= v <= 127:
        return struct.pack("b", v)
    length = -112
    if v < 0:
        v = ~v
        length = -120
    tmp = v
    while tmp:
        tmp >>= 8
        length -= 1
    out = bytearray(struct.pack("b", length))
    size = -(length + 112) if length >= -120 else -(length + 120)
    for i in range(size - 1, -1, -1):
        out.append((v >> (8 * i)) & 0xFF)
    return bytes(out)


def _hadoop_vint_read(buf: bytes, pos: int) -> tuple[int, int]:
    first = struct.unpack_from("b", buf, pos)[0]
    pos += 1
    if first >= -112:
        return first, pos
    negative = first <= -120
    size = -(first + 112) if not negative else -(first + 120)
    v = 0
    for _ in range(size):
        v = (v << 8) | buf[pos]
        pos += 1
    return (~v if negative else v), pos


# --------------------------------------------------------------------------
# cells
# --------------------------------------------------------------------------


def cell_key(row: bytes, timestamp: int = 0,
             cell_type: int = CELL_TYPE_PUT) -> bytes:
    """A KeyValue KEY with empty family/qualifier — the shape Hudi's
    HFile writers use (row = the Hudi record key)."""
    return (
        struct.pack(">H", len(row)) + row + b"\x00"
        + struct.pack(">q", timestamp) + struct.pack("B", cell_type)
    )


def cell_row(key: bytes) -> bytes:
    """The row portion of a KeyValue KEY."""
    (rl,) = struct.unpack_from(">H", key, 0)
    return key[2:2 + rl]


def _parse_cells(
    payload: bytes, includes_mvcc: bool, includes_tags: bool
) -> list[tuple[bytes, bytes]]:
    """DATA block payload -> [(key bytes, value bytes)]."""
    cells = []
    pos = 0
    n = len(payload)
    while pos < n:
        klen, vlen = struct.unpack_from(">ii", payload, pos)
        pos += 8
        key = payload[pos:pos + klen]
        pos += klen
        value = payload[pos:pos + vlen]
        pos += vlen
        if includes_tags:
            (tlen,) = struct.unpack_from(">H", payload, pos)
            pos += 2 + tlen
        if includes_mvcc:
            # the memstore timestamp is a Hadoop WritableUtils vlong
            # (r11 review finding: NOT a protobuf varint — a multi-byte
            # sequence id would desync the whole cell stream)
            _, pos = _hadoop_vint_read(payload, pos)
        if len(key) != klen or len(value) != vlen:
            raise ValueError("truncated HFile cell")
        cells.append((key, value))
    return cells


# --------------------------------------------------------------------------
# blocks
# --------------------------------------------------------------------------


def _decompress(payload: bytes, codec: int, uncompressed_size: int) -> bytes:
    if codec == CODEC_NONE:
        return payload
    if codec == CODEC_GZ:
        out = gzip.decompress(payload)
        if len(out) != uncompressed_size:
            raise ValueError(
                f"HFile GZ block decompressed to {len(out)} bytes, "
                f"header says {uncompressed_size}"
            )
        return out
    raise ValueError(
        f"unsupported HFile compression codec ordinal {codec} "
        "(only NONE and GZ are implemented)"
    )


def _read_block(blob: bytes, offset: int, codec: int) -> tuple[bytes, bytes]:
    """One block at ``offset`` -> (type magic, uncompressed payload)."""
    header = blob[offset:offset + HEADER_SIZE]
    if len(header) != HEADER_SIZE:
        raise ValueError(f"truncated HFile block header at {offset}")
    magic = header[:8]
    on_disk_wo_header, uncompressed_wo_header = struct.unpack_from(
        ">ii", header, 8
    )
    on_disk_data_with_header = struct.unpack_from(">i", header, 29)[0]
    payload = blob[
        offset + HEADER_SIZE:offset + on_disk_data_with_header
    ]
    if len(payload) != on_disk_data_with_header - HEADER_SIZE:
        raise ValueError(f"truncated HFile block payload at {offset}")
    return magic, _decompress(payload, codec, uncompressed_wo_header)


def _root_index_entries(payload: bytes, count: int) -> list[tuple[int, int]]:
    """ROOT index payload -> [(block offset, on-disk size)] — first
    keys are skipped (full scans don't need them)."""
    out = []
    pos = 0
    for _ in range(count):
        offset, size = struct.unpack_from(">qi", payload, pos)
        pos += 12
        klen, pos = _hadoop_vint_read(payload, pos)
        pos += klen
        out.append((offset, size))
    return out


def _nonroot_index_entries(payload: bytes) -> list[tuple[int, int]]:
    """LEAF/INTERMEDIATE index payload: int32 entry count, int32
    secondary offsets[count+1], then (long offset, int size, key)."""
    (count,) = struct.unpack_from(">i", payload, 0)
    sec = struct.unpack_from(f">{count + 1}i", payload, 4)
    base = 4 + 4 * (count + 1)
    out = []
    for i in range(count):
        offset, size = struct.unpack_from(">qi", payload, base + sec[i])
        out.append((offset, size))
    return out


# --------------------------------------------------------------------------
# read
# --------------------------------------------------------------------------


def read_hfile(blob: bytes) -> dict:
    """Parse a whole HFile v3 -> ``{"cells": [(row, value)], "keys":
    [(full key, value)], "file_info": {bytes: bytes}, "entry_count":
    int}``. Raises ``ValueError`` on anything it cannot prove it
    decodes correctly (the callers' fallback contract) — including
    truncated/corrupt structures, whose struct/index errors are
    normalized to ValueError here so the contract holds."""
    try:
        return _read_hfile(blob)
    except (struct.error, IndexError) as exc:
        raise ValueError(f"corrupt or truncated HFile: {exc}") from exc


def _read_hfile(blob: bytes) -> dict:
    if len(blob) < TRAILER_SIZE:
        raise ValueError("file shorter than an HFile trailer")
    trailer = blob[-TRAILER_SIZE:]
    if trailer[:8] != TRAILER_MAGIC:
        raise ValueError("missing HFile trailer magic")
    (version_int,) = struct.unpack(">i", blob[-4:])
    major = version_int & 0x00FFFFFF
    minor = (version_int >> 24) & 0xFF
    if major != 3:
        raise ValueError(
            f"HFile major version {major} unsupported (v3 only)"
        )
    if minor < 1:
        # pre-checksum minor versions use 24-byte block headers — a
        # different layout than the 33-byte one parsed here
        raise ValueError(
            f"HFile v3 minor version {minor} (pre-checksum headers) "
            "unsupported"
        )
    if trailer[8:12] != PB_MAGIC:
        raise ValueError("HFile v3 trailer is not protobuf-framed")
    msg, _ = _pb_read_delimited(trailer, 12)
    t = _pb_fields(msg)

    def one(field: int, default=None):
        vals = t.get(field)
        return vals[0] if vals else default

    file_info_offset = one(1)
    load_on_open = one(2)
    data_index_count = one(5, 0)
    num_levels = one(8, 1)
    codec = one(12, CODEC_NONE)
    if one(13):
        raise ValueError("encrypted HFiles are unsupported")
    if file_info_offset is None or load_on_open is None:
        raise ValueError("HFile trailer lacks offsets")

    # file info: cell-layout flags + user metadata (e.g. Hudi's schema)
    fi_magic, fi_payload = _read_block(blob, file_info_offset, codec)
    if fi_magic != FILE_INFO_MAGIC:
        raise ValueError(f"expected FILEINF2 block, got {fi_magic!r}")
    if fi_payload[:4] != PB_MAGIC:
        raise ValueError("HFile v3 file info is not protobuf-framed")
    fi_msg, _ = _pb_read_delimited(fi_payload, 4)
    file_info: dict[bytes, bytes] = {}
    for pair in _pb_fields(fi_msg).get(1, []):
        kv = _pb_fields(pair)
        file_info[bytes(kv[1][0])] = bytes(kv[2][0])
    includes_mvcc = _MAX_MEMSTORE_TS_KEY in file_info
    includes_tags = _MAX_TAGS_LEN in file_info

    # index tree -> data block offsets
    ri_magic, ri_payload = _read_block(blob, load_on_open, codec)
    if ri_magic != ROOT_INDEX_MAGIC:
        raise ValueError(f"expected IDXROOT2 block, got {ri_magic!r}")
    offsets = _root_index_entries(ri_payload, data_index_count)
    for _level in range(num_levels - 1):
        nxt: list[tuple[int, int]] = []
        for off, _size in offsets:
            magic, payload = _read_block(blob, off, codec)
            if magic not in (LEAF_INDEX_MAGIC, INTERMEDIATE_INDEX_MAGIC):
                raise ValueError(
                    f"expected index block at {off}, got {magic!r}"
                )
            nxt.extend(_nonroot_index_entries(payload))
        offsets = nxt

    keys: list[tuple[bytes, bytes]] = []
    for off, _size in offsets:
        magic, payload = _read_block(blob, off, codec)
        if magic == ENCODED_DATA_MAGIC:
            raise ValueError(
                "encoded HFile data blocks (DATA_BLOCK_ENCODING) are "
                "unsupported"
            )
        if magic != DATA_MAGIC:
            raise ValueError(f"expected DATABLK* at {off}, got {magic!r}")
        keys.extend(_parse_cells(payload, includes_mvcc, includes_tags))
    return {
        "cells": [(cell_row(k), v) for k, v in keys],
        "keys": keys,
        "file_info": file_info,
        "entry_count": one(7, len(keys)),
    }


# --------------------------------------------------------------------------
# write
# --------------------------------------------------------------------------


def _checksum_len(on_disk_data_with_header: int, chunk: int) -> int:
    return 4 * ((on_disk_data_with_header + chunk - 1) // chunk)


def _make_block(
    magic: bytes,
    payload: bytes,
    prev_offset: int,
    codec: int,
    chunk: int = 16384,
) -> bytes:
    comp = gzip.compress(payload) if codec == CODEC_GZ else payload
    on_disk_data_with_header = HEADER_SIZE + len(comp)
    n_checksums = _checksum_len(on_disk_data_with_header, chunk)
    header = (
        magic
        + struct.pack(
            ">ii", len(comp) + n_checksums, len(payload)
        )
        + struct.pack(">q", prev_offset)
        + struct.pack("B", 1)  # checksum type CRC32
        + struct.pack(">i", chunk)
        + struct.pack(">i", on_disk_data_with_header)
    )
    body = header + comp
    sums = bytearray()
    for i in range(0, len(body), chunk):
        sums += struct.pack(">I", zlib.crc32(body[i:i + chunk]) & 0xFFFFFFFF)
    return body + bytes(sums)


def write_hfile(
    cells: list[tuple[bytes, bytes]],
    file_info: dict[bytes, bytes] | None = None,
    compression: str = "gz",
    block_size: int = 65536,
) -> bytes:
    """Author an HFile v3 from ``[(row, value)]`` cells (sorted by row
    bytes — enforced), single-level root index, CRC32 chunk checksums —
    the shape Hudi's metadata-table compaction writes. ``file_info``
    carries user metadata (Hudi stamps the Avro ``schema`` there)."""
    codec = {"gz": CODEC_GZ, "none": CODEC_NONE}.get(compression)
    if codec is None:
        raise ValueError(f"unsupported compression {compression!r}")
    if not cells:
        raise ValueError("an HFile needs at least one cell")
    rows = [r for r, _v in cells]
    if rows != sorted(rows):
        raise ValueError("HFile cells must be sorted by row key")

    out = bytearray()
    prev = -1
    index: list[tuple[int, int, bytes]] = []  # (offset, size, first key)
    buf = bytearray()
    first_key: bytes | None = None

    def flush() -> None:
        nonlocal buf, prev, first_key
        if not buf:
            return
        offset = len(out)
        block = _make_block(DATA_MAGIC, bytes(buf), prev, codec)
        out.extend(block)
        index.append((offset, len(block), first_key))
        prev = offset
        buf = bytearray()
        first_key = None

    for row, value in cells:
        key = cell_key(row)
        if first_key is None:
            first_key = key
        buf += struct.pack(">ii", len(key), len(value)) + key + value
        if len(buf) >= block_size:
            flush()
    flush()

    first_data = index[0][0]
    last_data = index[-1][0]

    # load-on-open: root index, then file info
    load_on_open = len(out)
    ri = bytearray()
    for offset, size, key in index:
        ri += struct.pack(">qi", offset, size)
        ri += _hadoop_vint_write(len(key)) + key
    out.extend(_make_block(ROOT_INDEX_MAGIC, bytes(ri), prev, codec))

    file_info_offset = len(out)
    fi_msg = bytearray()
    for k, v in sorted((file_info or {}).items()):
        pair = _pb_field(1, k) + _pb_field(2, v)
        fi_msg += _pb_field(1, pair)
    out.extend(
        _make_block(
            FILE_INFO_MAGIC,
            PB_MAGIC + _pb_delimited(bytes(fi_msg)),
            prev,
            codec,
        )
    )

    trailer_msg = (
        _pb_field(1, file_info_offset)
        + _pb_field(2, load_on_open)
        + _pb_field(4, sum(len(c[0]) + len(c[1]) + 8 for c in cells))
        + _pb_field(5, len(index))
        + _pb_field(6, 0)
        + _pb_field(7, len(cells))
        + _pb_field(8, 1)
        + _pb_field(9, first_data)
        + _pb_field(10, last_data)
        + _pb_field(
            11, b"org.apache.hadoop.hbase.CellComparatorImpl"
        )
        + _pb_field(12, codec)
    )
    trailer = TRAILER_MAGIC + PB_MAGIC + _pb_delimited(trailer_msg)
    if len(trailer) > TRAILER_SIZE - 4:
        raise ValueError("HFile trailer overflow")
    trailer += b"\x00" * (TRAILER_SIZE - 4 - len(trailer))
    # major 3, minor 3: minor >= 1 declares checksum-bearing 33-byte
    # block headers (r11 review finding — minor 0 would make real
    # HBase readers parse the pre-checksum 24-byte header layout)
    trailer += struct.pack(">i", (3 & 0x00FFFFFF) | (3 << 24))
    out.extend(trailer)
    return bytes(out)
