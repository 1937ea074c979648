"""Puffin files and Iceberg v3 deletion vectors (PUBLIC specs only).

Iceberg format-version 3 replaces position-delete PARQUET files with
**deletion vectors**: per-data-file RoaringBitmaps of deleted row
positions, stored as ``deletion-vector-v1`` blobs inside a **Puffin**
container. A v3 snapshot's delete manifests still carry ``content=1``
entries, but each entry names the Puffin file (``file_format:
"puffin"``) plus the blob's byte range (``content_offset`` /
``content_size_in_bytes``, manifest fields 144/145) and the single data
file it applies to (``referenced_data_file``, field 143) — so a reader
fetches exactly one blob per data file, never the whole Puffin file.

Everything here follows the public specs:

* **Puffin container** (iceberg.apache.org/puffin-spec): ``PFA1``
  magic, concatenated blobs, then a footer = magic + UTF-8 JSON payload
  (``{"blobs": [...], "properties": {...}}``) + payload size (int32 LE)
  + flags (int32; bit 0 = payload lz4-compressed — never set by this
  writer, refused by this reader) + magic.
* **deletion-vector-v1 blob** (iceberg spec "Deletion vectors"):
  int32 BE length of (magic + vector), the 4-byte magic sequence
  ``D1 D3 39 64``, the vector as the *standard keyed* 64-bit
  RoaringBitmap portable serialization — int64 LE bitmap count, then
  per bitmap **in key order: int32 LE key + 32-bit roaring bitmap** —
  and an int32 BE CRC-32 of (magic + vector). The framing and magic
  are deliberately Delta-compatible, but the vector body differs from
  Delta's RoaringBitmapArray (which is DENSE — no keys; see
  ``delta_dv.py``): the 32-bit container codecs are shared, the 64-bit
  wrapper is not.

Scale shape: one DV is O(deleted rows in one file) and the manifest
carries its exact byte range, so the read path ships ``(puffin path,
offset, size, referenced file)`` rows to executors and decodes there
(``dv_rows_df`` mirror of the Delta DV reader) — a snapshot with
millions of deleted rows never funnels bytes through the driver.
"""

from __future__ import annotations

import json
import struct
import zlib

from hudi_and_delta_showcase_spark.tables import fsio
from hudi_and_delta_showcase_spark.tables.delta_dv import (
    _deserialize_roaring32,
    _serialize_roaring32,
)

MAGIC = b"PFA1"
#: the DV blob's magic sequence D1 D3 39 64 (== Delta's int32 LE magic)
DV_MAGIC = bytes((0xD1, 0xD3, 0x39, 0x64))
DV_BLOB_TYPE = "deletion-vector-v1"


# --------------------------------------------------------------------- #
# keyed 64-bit roaring portable (the STANDARD flavor; Delta's is dense)
# --------------------------------------------------------------------- #


def serialize_dv_vector(positions: list[int]) -> bytes:
    """Sorted 64-bit row positions -> keyed portable Roaring64 bytes."""
    by_high: dict[int, list[int]] = {}
    for p in sorted(positions):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    out = bytearray(struct.pack("<q", len(by_high)))
    for high in sorted(by_high):
        out += struct.pack("<I", high)
        out += _serialize_roaring32(by_high[high])
    return bytes(out)


def deserialize_dv_vector(data: bytes) -> list[int]:
    (n,) = struct.unpack_from("<q", data, 0)
    pos = 8
    out: list[int] = []
    for _ in range(n):
        (high,) = struct.unpack_from("<I", data, pos)
        vals, pos = _deserialize_roaring32(data, pos + 4)
        out.extend((high << 32) | v for v in vals)
    return out


# --------------------------------------------------------------------- #
# blob framing
# --------------------------------------------------------------------- #


def encode_dv_blob(positions: list[int]) -> bytes:
    body = DV_MAGIC + serialize_dv_vector(positions)
    crc = zlib.crc32(body) & 0xFFFFFFFF
    return struct.pack(">i", len(body)) + body + struct.pack(">I", crc)


def decode_dv_blob(blob: bytes) -> list[int]:
    """One ``deletion-vector-v1`` blob (as delimited by the manifest's
    content_offset/content_size) -> sorted deleted row positions, CRC
    and magic verified."""
    (body_len,) = struct.unpack_from(">i", blob, 0)
    body = blob[4 : 4 + body_len]
    if body[:4] != DV_MAGIC:
        raise ValueError(f"bad deletion-vector magic {body[:4]!r}")
    (crc,) = struct.unpack_from(">I", blob, 4 + body_len)
    if crc != (zlib.crc32(body) & 0xFFFFFFFF):
        raise ValueError("deletion-vector CRC mismatch")
    return deserialize_dv_vector(body[4:])


# --------------------------------------------------------------------- #
# container
# --------------------------------------------------------------------- #


def write_puffin_dvs(
    path: str,
    dvs: dict[str, list[int]],
    snapshot_id: int,
    sequence_number: int,
) -> dict[str, tuple[int, int, int]]:
    """Write one Puffin file holding a ``deletion-vector-v1`` blob per
    referenced data file. Returns ``{referenced data file -> (offset,
    size, cardinality)}`` — exactly what the caller records in the
    delete manifest (content_offset / content_size_in_bytes /
    record_count)."""
    out = bytearray(MAGIC)
    blobs: list[dict] = []
    ranges: dict[str, tuple[int, int, int]] = {}
    for ref, positions in sorted(dvs.items()):
        blob = encode_dv_blob(positions)
        off = len(out)
        out += blob
        ranges[ref] = (off, len(blob), len(set(positions)))
        blobs.append(
            {
                "type": DV_BLOB_TYPE,
                "fields": [],
                "snapshot-id": snapshot_id,
                "sequence-number": sequence_number,
                "offset": off,
                "length": len(blob),
                "properties": {
                    "referenced-data-file": ref,
                    "cardinality": str(len(set(positions))),
                },
            }
        )
    payload = json.dumps({"blobs": blobs, "properties": {}}).encode()
    out += MAGIC + payload
    out += struct.pack("<i", len(payload))
    out += struct.pack("<i", 0)  # flags: payload uncompressed
    out += MAGIC
    fsio.write_bytes_atomic(path, bytes(out))
    return ranges


def read_puffin_footer(path: str) -> dict:
    """Parse a Puffin file's footer into its JSON payload (the blob
    index). Reads the tail only — two positioned reads, O(footer)."""
    size = fsio.file_size(path)
    tail = fsio.read_byte_range(path, max(0, size - 12), min(12, size))
    if len(tail) < 12 or tail[-4:] != MAGIC:
        raise ValueError(f"not a Puffin file: {path}")
    (payload_size,) = struct.unpack_from("<i", tail, 0)
    (flags,) = struct.unpack_from("<i", tail, 4)
    if flags & 1:
        raise ValueError(
            "lz4-compressed Puffin footer payloads are not supported"
        )
    start = size - 12 - payload_size
    block = fsio.read_byte_range(path, start - 4, payload_size + 4)
    if block[:4] != MAGIC:
        raise ValueError(f"corrupt Puffin footer in {path}")
    return json.loads(block[4:].decode("utf-8"))


def read_dv_positions(path: str, offset: int, size: int) -> list[int]:
    """Fetch + decode one DV blob by the byte range the manifest entry
    recorded — the v3 reader's per-data-file access path."""
    return decode_dv_blob(fsio.read_byte_range(path, offset, size))


def dv_rows_df(spark, entries: list[tuple[str, int, int, str]]):
    """``(puffin path, offset, size, referenced data file)`` rows ->
    DataFrame of ``(file_path, pos)`` deleted-row rows, decoded
    EXECUTOR-side via mapInPandas (the Delta ``dv_rows_df`` shape):
    blob bytes never transit the driver, and the output joins exactly
    like a v2 position-delete parquet scan."""
    import pandas as pd

    if not entries:
        raise ValueError("no deletion-vector entries")
    src = spark.createDataFrame(
        spark.sparkContext.parallelize(sorted(entries), min(len(entries), 32)),
        "puffin string, off long, size long, file_path string",
    )

    def _explode(batches):
        for pdf in batches:
            for puffin, off, sz, ref in zip(
                pdf["puffin"], pdf["off"], pdf["size"], pdf["file_path"]
            ):
                pos = read_dv_positions(puffin, int(off), int(sz))
                yield pd.DataFrame({"file_path": ref, "pos": pos})

    return src.mapInPandas(_explode, "file_path string, pos long")
