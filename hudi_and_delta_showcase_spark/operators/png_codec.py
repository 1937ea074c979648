"""Minimal pure-stdlib PNG codec (RFC 2083 / PNG spec, public domain
format): IHDR header parse, full scanline-unfilter decode, filter-0
encode, nearest-neighbor resample.

This exists so the engine's multimodal ``fake=False`` branches execute in
codec-less containers: the decode contract of ``decode_image`` is
(width, height, channels), which a real IHDR parse fully provides, and
resize needs raw pixels, which the unfilter loop provides. PIL remains
preferred when importable (multimodal.py chooses at runtime); this module
handles the common web subset — 8-bit depth, grayscale / RGB / RGBA /
gray+alpha, non-interlaced — and raises ``ValueError`` beyond it.

Scale notes: these run INSIDE Arrow batches on executors (mapInPandas in
multimodal.py) — per-row pure-Python byte work, the same cost shape as
any codec UDF. zlib does the heavy inflate/deflate in C.
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: PNG color type -> sample channels
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def png_info(payload: bytes) -> tuple[int, int, int]:
    """Parse IHDR: (width, height, channels). Raises ValueError unless
    ``payload`` is a PNG."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    length, ctype = struct.unpack(">I4s", payload[8:16])
    if ctype != b"IHDR" or length != 13:
        raise ValueError("corrupt PNG (first chunk is not IHDR)")
    w, h, depth, color = struct.unpack(">IIBB", payload[16:26])
    if color not in _CHANNELS:
        raise ValueError(f"unknown PNG color type {color}")
    return w, h, _CHANNELS[color]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(payload: bytes) -> tuple[int, int, int, bytearray]:
    """Decode to raw interleaved pixels: (w, h, channels, pixel bytes).
    Supports 8-bit non-interlaced gray/RGB/RGBA/gray+alpha (color type 3
    palettes and 16-bit depths raise)."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, idat = 8, bytearray()
    w = h = depth = color = interlace = None
    while pos + 8 <= len(payload):
        length, ctype = struct.unpack(">I4s", payload[pos : pos + 8])
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("corrupt PNG (no IHDR)")
    if depth != 8 or color not in (0, 2, 4, 6) or interlace != 0:
        raise ValueError(
            f"unsupported PNG (depth={depth} color={color} "
            f"interlace={interlace}); need 8-bit non-interlaced truecolor/gray"
        )
    ch = _CHANNELS[color]
    raw = zlib.decompress(bytes(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("corrupt PNG (IDAT size mismatch)")
    out = bytearray(h * stride)
    prior = bytearray(stride)
    for y in range(h):
        base = y * (stride + 1)
        filt = raw[base]
        line = bytearray(raw[base + 1 : base + 1 + stride])
        if filt == 1:  # Sub
            for x in range(ch, stride):
                line[x] = (line[x] + line[x - ch]) & 0xFF
        elif filt == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prior[x]) & 0xFF
        elif filt == 3:  # Average
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                line[x] = (line[x] + ((left + prior[x]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            for x in range(stride):
                left = line[x - ch] if x >= ch else 0
                ul = prior[x - ch] if x >= ch else 0
                line[x] = (line[x] + _paeth(left, prior[x], ul)) & 0xFF
        elif filt != 0:
            raise ValueError(f"bad PNG filter type {filt}")
        out[y * stride : (y + 1) * stride] = line
        prior = line
    return w, h, ch, out


def png_encode(w: int, h: int, channels: int, pixels: bytes) -> bytes:
    """Encode raw interleaved 8-bit pixels as a valid PNG (filter 0,
    single IDAT). channels: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = w * channels
    if len(pixels) != h * stride:
        raise ValueError("pixel buffer does not match dimensions")
    scanlines = bytearray()
    for y in range(h):
        scanlines.append(0)
        scanlines += pixels[y * stride : (y + 1) * stride]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(scanlines), 6))
        + chunk(b"IEND", b"")
    )


def png_resize_nearest(payload: bytes, dst_w: int, dst_h: int) -> bytes:
    """Decode -> nearest-neighbor resample -> re-encode. The source pixel
    for output (x, y) is floor(x * src/dst) — the standard
    nearest-neighbor mapping, deterministic and oracle-checkable."""
    w, h, ch, pix = png_decode(payload)
    out = bytearray(dst_w * dst_h * ch)
    for y in range(dst_h):
        sy = y * h // dst_h
        src_row = sy * w * ch
        dst_row = y * dst_w * ch
        for x in range(dst_w):
            sx = x * w // dst_w
            out[dst_row + x * ch : dst_row + (x + 1) * ch] = pix[
                src_row + sx * ch : src_row + (sx + 1) * ch
            ]
    return png_encode(dst_w, dst_h, ch, bytes(out))
