"""Delta Lake deletion-vector format (PUBLIC protocol; SURVEY.md §2.9 C4/C7).

Modern Delta writers (Databricks enables ``delta.enableDeletionVectors``
by default) mark deleted rows with a **deletion vector**: an AddFile
carries a ``deletionVector`` descriptor pointing at a serialized
RoaringBitmapArray of deleted row indexes, instead of rewriting the
parquet file. A reader that cannot parse DVs cannot read (or adopt) a
real-world Delta table at all — this was the round-6 verdict's #1 gap.

Everything here follows the public specs only:

* **Descriptor** (delta-io PROTOCOL.md "Deletion Vector Descriptor
  Schema"): ``storageType`` ``u`` (relative path derived from a Z85
  UUID + optional random prefix), ``p`` (absolute path), or ``i``
  (inline Z85 data); ``offset`` / ``sizeInBytes`` / ``cardinality``.
* **DV file layout** (PROTOCOL.md "Deletion Vector Format"): a 1-byte
  format version (``1``), then per DV blob: ``int32 BE dataSize``,
  ``dataSize`` bytes of DV data, ``int32 BE CRC-32`` of the data
  (big-endian framing is Java ``DataOutputStream``; the data itself is
  little-endian).
* **DV data**: ``int32 LE`` magic ``1681511377``, then the
  RoaringBitmapArray "portable" format — ``int64 LE`` number of 32-bit
  bitmaps, then each bitmap in the standard RoaringBitmap portable
  serialization (RoaringFormatSpec), sequentially; the i-th bitmap
  holds the low 32 bits of indexes whose high 32 bits equal ``i``.
* **Z85** (ZeroMQ RFC 32): 4 bytes -> 5 chars, big-endian base 85.

Scale shape: a DV is O(deleted rows) metadata, never O(table). The
read path decodes DVs EXECUTOR-side (``dv_rows_df`` ships each file's
descriptor to a task and explodes it to ``(file, pos)`` rows via
mapInPandas), so a snapshot with millions of deleted rows across
thousands of files never serializes through the driver; the resulting
skinny DataFrame anti-joins against the scan's native
``(_metadata.file_path, _metadata.row_index)`` — the exact same plan
the engine's own DV sidecars and the Iceberg position-delete reader
use. Reference anchor: the Delta half of the reference
(/root/reference/README.md:1156-1240) is served by delta-spark, whose
current writers emit DVs by default.
"""

from __future__ import annotations

import json
import struct
import uuid as _uuid
import zlib

from hudi_and_delta_showcase_spark.tables import fsio

MAGIC = 1681511377
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


# --------------------------------------------------------------------- #
# Z85 (ZeroMQ RFC 32)
# --------------------------------------------------------------------- #


def z85_encode(data: bytes) -> str:
    if len(data) % 4:
        raise ValueError("z85 input must be a multiple of 4 bytes")
    out = []
    for i in range(0, len(data), 4):
        n = int.from_bytes(data[i : i + 4], "big")
        chunk = []
        for _ in range(5):
            n, r = divmod(n, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError("z85 input must be a multiple of 5 chars")
    out = bytearray()
    for i in range(0, len(text), 5):
        n = 0
        for ch in text[i : i + 5]:
            n = n * 85 + _Z85_INDEX[ch]
        out += n.to_bytes(4, "big")
    return bytes(out)


# --------------------------------------------------------------------- #
# RoaringBitmapArray portable (de)serialization
# --------------------------------------------------------------------- #

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4


def _deserialize_roaring32(data: bytes, pos: int) -> tuple[list[int], int]:
    """One standard 32-bit RoaringBitmap at ``data[pos:]`` ->
    (sorted values, new pos). Handles array, bitset, and run
    containers per the RoaringFormatSpec."""
    (cookie,) = struct.unpack_from("<i", data, pos)
    run_flags = b""
    if (cookie & 0xFFFF) == _SERIAL_COOKIE:
        n = (cookie >> 16) + 1
        pos += 4
        nbytes = (n + 7) // 8
        run_flags = data[pos : pos + nbytes]
        pos += nbytes
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    elif cookie == _SERIAL_COOKIE_NO_RUN:
        (n,) = struct.unpack_from("<i", data, pos + 4)
        pos += 8
        has_offsets = True
    else:
        raise ValueError(f"not a RoaringBitmap: cookie {cookie}")
    keys_cards = struct.unpack_from(f"<{2 * n}H", data, pos)
    pos += 4 * n
    if has_offsets:
        pos += 4 * n  # offsets are redundant for a sequential parse
    values: list[int] = []
    for i in range(n):
        key = keys_cards[2 * i]
        card = keys_cards[2 * i + 1] + 1
        base = key << 16
        is_run = bool(run_flags) and (run_flags[i // 8] >> (i % 8)) & 1
        if is_run:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            runs = struct.unpack_from(f"<{2 * n_runs}H", data, pos)
            pos += 4 * n_runs
            for j in range(n_runs):
                start, length = runs[2 * j], runs[2 * j + 1]
                values.extend(
                    base + v for v in range(start, start + length + 1)
                )
        elif card <= 4096:
            lows = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            values.extend(base + v for v in lows)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for w_i, w in enumerate(words):
                while w:
                    low = w & -w
                    values.append(base + (w_i << 6) + low.bit_length() - 1)
                    w ^= low
    return values, pos


def _serialize_roaring32(values: list[int]) -> bytes:
    """Standard portable serialization (no-run cookie 12346) of sorted
    32-bit values — array containers below 4097 values, bitsets above;
    what every foreign Roaring reader accepts."""
    containers: dict[int, list[int]] = {}
    for v in values:
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    out = bytearray(struct.pack("<ii", _SERIAL_COOKIE_NO_RUN, len(keys)))
    for k in keys:
        out += struct.pack("<HH", k, len(containers[k]) - 1)
    body = bytearray()
    offsets = []
    header_len = 8 + 4 * len(keys) + 4 * len(keys)
    for k in keys:
        offsets.append(header_len + len(body))
        lows = sorted(containers[k])
        if len(lows) <= 4096:
            body += struct.pack(f"<{len(lows)}H", *lows)
        else:
            words = [0] * 1024
            for v in lows:
                words[v >> 6] |= 1 << (v & 63)
            body += struct.pack("<1024Q", *words)
    for off in offsets:
        out += struct.pack("<i", off)
    return bytes(out + body)


def deserialize_dv_data(data: bytes) -> list[int]:
    """DV data blob (magic + RoaringBitmapArray portable) -> sorted
    row indexes (python ints, 64-bit range)."""
    (magic,) = struct.unpack_from("<i", data, 0)
    if magic != MAGIC:
        raise ValueError(f"bad deletion-vector magic {magic}")
    (n_bitmaps,) = struct.unpack_from("<q", data, 4)
    pos = 12
    out: list[int] = []
    for high in range(n_bitmaps):
        vals, pos = _deserialize_roaring32(data, pos)
        out.extend((high << 32) | v for v in vals)
    return out


def serialize_dv_data(positions: list[int]) -> bytes:
    by_high: dict[int, list[int]] = {}
    for p in sorted(positions):
        by_high.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n = (max(by_high) + 1) if by_high else 0
    out = bytearray(struct.pack("<iq", MAGIC, n))
    for high in range(n):
        out += _serialize_roaring32(by_high.get(high, []))
    return bytes(out)


# --------------------------------------------------------------------- #
# descriptor resolution + DV file IO
# --------------------------------------------------------------------- #


def dv_relative_path(path_or_inline: str) -> str:
    """storageType 'u': the LAST 20 chars are the Z85 UUID; anything
    before is an optional random directory prefix."""
    encoded, prefix = path_or_inline[-20:], path_or_inline[:-20]
    u = _uuid.UUID(bytes=z85_decode(encoded))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def read_dv_positions(descriptor: dict, table_path: str) -> list[int]:
    """Decode one descriptor into sorted deleted row indexes, verifying
    the CRC-32 frame for file-backed DVs."""
    st = descriptor["storageType"]
    size = int(descriptor["sizeInBytes"])
    if st == "i":
        data = z85_decode(descriptor["pathOrInlineDv"])[:size]
    elif st in ("u", "p"):
        full = (
            fsio.join(table_path, dv_relative_path(descriptor["pathOrInlineDv"]))
            if st == "u"
            else descriptor["pathOrInlineDv"]
        )
        blob = fsio.read_bytes(full)
        off = descriptor.get("offset")
        off = 1 if off is None else int(off)
        (data_size,) = struct.unpack_from(">i", blob, off)
        if data_size != size:
            raise ValueError(
                f"DV frame size {data_size} != descriptor sizeInBytes {size}"
            )
        data = blob[off + 4 : off + 4 + data_size]
        (crc,) = struct.unpack_from(">I", blob, off + 4 + data_size)
        if crc != (zlib.crc32(data) & 0xFFFFFFFF):
            raise ValueError("DV checksum mismatch")
    else:
        raise ValueError(f"unknown DV storageType {st!r}")
    positions = deserialize_dv_data(data)
    card = int(descriptor.get("cardinality", len(positions)))
    if card != len(positions):
        raise ValueError(
            f"DV cardinality {card} != decoded {len(positions)} positions"
        )
    return positions


def write_dv_file(
    table_path: str, positions: list[int], prefix: str = ""
) -> dict:
    """Author a spec-shaped on-disk DV (storageType 'u') and return its
    descriptor — used by the engine's own tests/goldens to produce
    foreign-identical DV-bearing tables."""
    u = _uuid.uuid4()
    data = serialize_dv_data(positions)
    blob = (
        b"\x01"
        + struct.pack(">i", len(data))
        + data
        + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
    )
    rel = f"deletion_vector_{u}.bin"
    if prefix:
        fsio.makedirs(fsio.join(table_path, prefix))
        rel = f"{prefix}/{rel}"
    fsio.write_bytes_atomic(fsio.join(table_path, rel), blob)
    return {
        "storageType": "u",
        "pathOrInlineDv": prefix + z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def inline_dv_descriptor(positions: list[int]) -> dict:
    data = serialize_dv_data(positions)
    pad = (-len(data)) % 4
    return {
        "storageType": "i",
        "pathOrInlineDv": z85_encode(data + b"\x00" * pad),
        "sizeInBytes": len(data),
        "cardinality": len(positions),
    }


def dv_rows_df(spark, table_path: str, dv_map: dict[str, dict]):
    """``{relative data file -> descriptor}`` -> DataFrame of
    ``(file_name, pos)`` deleted-row rows, decoded EXECUTOR-side: one
    input row per (file, descriptor) fans out through mapInPandas, so
    a snapshot's total DV cardinality never funnels through the
    driver. The output is the engine's native DV-sidecar shape —
    ``_apply_dvs``-compatible — and what ``convert_delta`` persists at
    adoption."""
    import pandas as pd

    if not dv_map:
        raise ValueError("empty dv_map")
    src = spark.createDataFrame(
        spark.sparkContext.parallelize(
            [(f, json.dumps(d)) for f, d in sorted(dv_map.items())],
            min(len(dv_map), 32),
        ),
        "file_name string, descriptor string",
    )

    def _explode(batches):
        for pdf in batches:
            for fname, desc in zip(pdf["file_name"], pdf["descriptor"]):
                pos = read_dv_positions(json.loads(desc), table_path)
                yield pd.DataFrame({"file_name": fname, "pos": pos})

    return src.mapInPandas(_explode, "file_name string, pos long")
