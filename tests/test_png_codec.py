"""Unit tests for the vendored pure-stdlib PNG codec: encode/decode
round-trips, all five scanline filter types on decode, info parsing, and
nearest-neighbor resize — no Spark, no PIL."""

from __future__ import annotations

import struct
import zlib

import pytest

from hudi_and_delta_showcase_spark.operators.png_codec import (
    png_decode,
    png_encode,
    png_info,
    png_resize_nearest,
)


def _gradient(w, h, ch):
    return bytes((x * 31 + 7) % 256 for x in range(w * h * ch))


@pytest.mark.parametrize("ch", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(ch):
    w, h = 7, 5
    pixels = _gradient(w, h, ch)
    blob = png_encode(w, h, ch, pixels)
    assert png_info(blob) == (w, h, ch)
    rw, rh, rch, rpix = png_decode(blob)
    assert (rw, rh, rch) == (w, h, ch)
    assert bytes(rpix) == pixels


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_line(ftype, line, prior, bpp):
    """Apply a PNG filter (encoder side, per spec) to a raw scanline."""
    out = bytearray()
    for x, v in enumerate(line):
        left = line[x - bpp] if x >= bpp else 0
        up = prior[x]
        ul = prior[x - bpp] if x >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = left
        elif ftype == 2:
            pred = up
        elif ftype == 3:
            pred = (left + up) >> 1
        else:
            pred = _paeth(left, up, ul)
        out.append((v - pred) & 0xFF)
    return out


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_decode_each_filter_type(ftype):
    """Hand-assemble a PNG whose every scanline uses ``ftype`` and check
    the unfilter loop reconstructs the exact pixels."""
    w, h, ch = 5, 4, 3
    pixels = _gradient(w, h, ch)
    stride = w * ch
    scanlines = bytearray()
    prior = bytearray(stride)
    for y in range(h):
        line = pixels[y * stride : (y + 1) * stride]
        scanlines.append(ftype)
        scanlines += _filter_line(ftype, line, prior, ch)
        prior = bytearray(line)
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    blob = (
        sig
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scanlines)))
        + _chunk(b"IEND", b"")
    )
    rw, rh, rch, rpix = png_decode(blob)
    assert (rw, rh, rch) == (w, h, ch)
    assert bytes(rpix) == pixels


def test_info_rejects_non_png():
    with pytest.raises(ValueError, match="PNG"):
        png_info(b"definitely not an image")


def test_decode_rejects_16bit():
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    blob = sig + _chunk(b"IHDR", ihdr) + _chunk(b"IEND", b"")
    with pytest.raises(ValueError, match="unsupported"):
        png_decode(blob)


def test_resize_identity_and_downscale():
    w, h, ch = 6, 4, 3
    pixels = _gradient(w, h, ch)
    blob = png_encode(w, h, ch, pixels)
    # identity resize preserves pixels exactly
    same = png_resize_nearest(blob, w, h)
    assert png_decode(same)[3] == bytearray(pixels)
    # 2x downscale picks every other pixel (floor mapping)
    half = png_resize_nearest(blob, 3, 2)
    hw, hh, hch, hpix = png_decode(half)
    assert (hw, hh, hch) == (3, 2, 3)
    expected = bytearray()
    for y in range(2):
        for x in range(3):
            base = ((y * 2) * w + x * 2) * ch
            expected += pixels[base : base + ch]
    assert hpix == expected
